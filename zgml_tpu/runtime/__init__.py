from zgml_tpu.runtime.profile import global_profile, RuntimeProfile  # noqa: F401
