from zgml_tpu.io.gguf import GGUFFile, GGUFWriter, GGMLType  # noqa: F401
