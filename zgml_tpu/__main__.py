from zgml_tpu.utils.cli import main

main()
