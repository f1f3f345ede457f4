"""Test configuration: force CPU with 8 virtual devices so kernels (interpret
mode) and sharding/multi-chip logic are testable without TPU hardware
(SURVEY.md §4: the TPU analog of the reference-executor oracle).

NOTE: the environment pre-sets JAX_PLATFORMS=axon (the real tunneled TPU); tests
must override it unconditionally — interpret-mode Pallas through the tunnel is
pathologically slow.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["ZGML_TPU_INTERPRET"] = "1"  # Pallas interpret mode on CPU

# The axon TPU plugin overrides JAX_PLATFORMS; the config flag wins over it.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
