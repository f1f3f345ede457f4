from zgml_tpu.models.llama import LlamaConfig, LlamaModel  # noqa: F401
