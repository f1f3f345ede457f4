"""zgml_tpu — a TPU-native quantized ML framework (capability target: candrewlee14/zgml).

Built from scratch on JAX/XLA/Pallas/pjit. The reference (zgml) is a single-host
Zig/CPU/Metal framework; this package re-designs its capability set TPU-first:

- ``zgml_tpu.quant``   — ggml-style block quantization (Q4_0/Q8_0) codecs, TPU repack,
                         quantized KV cache. (ref: src/quant.zig, src/models/gguf_loader.zig)
- ``zgml_tpu.io``      — GGUF parse/write, safetensors, checkpoints, GPT-2 BPE tokenizer.
                         (ref: src/gguf.zig, src/safetensors.zig, src/tokenizer.zig)
- ``zgml_tpu.ops``     — Pallas TPU kernels (fused dequant-matmul, flash attention,
                         rmsnorm, rope) + pure-jnp reference oracles for conformance.
                         (ref: src/tensor/forward.zig, src/backend/*)
- ``zgml_tpu.graph``   — small primitive-op graph IR with a fusion pass, lowered to
                         jitted JAX. (ref: src/op.zig, src/graph.zig, src/fusion.zig)
- ``zgml_tpu.models``  — llama-family, GPT-2, Whisper, demo models as functional
                         param-pytree modules. (ref: src/models/*)
- ``zgml_tpu.nn``      — layers, losses, initializers. (ref: src/nn.zig, src/loss.zig)
- ``zgml_tpu.optim``   — SGD/Adam/AdamW. (ref: src/optim/*)
- ``zgml_tpu.runtime`` — inference engine (prefill/decode plans, sampling, continuous
                         batching), profiling. (ref: src/llama_inference.zig, src/llm.zig)
- ``zgml_tpu.parallel``— mesh/sharding/collectives: the multi-chip dimension the
                         reference does not have (SURVEY.md §2.7).
- ``zgml_tpu.data``    — MNIST/dataloader. (ref: src/data/*)
"""

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Persistent XLA compilation cache (VERDICT r2: 290s warmup/compile per
    process at 7B). Mosaic/XLA executables are content-addressed on disk, so
    a second process skips straight to execution. ZGML_TPU_CACHE_DIR=''
    disables; errors (read-only fs, version skew) are non-fatal."""
    from zgml_tpu import config
    path = config.cache_dir()
    if not path:
        return
    try:
        import os
        import jax
        # TPU executables only: XLA:CPU AOT artifacts bake in the build
        # host's exact CPU features, and a cache written on one machine
        # loads-with-SIGILL-risk warnings on another. The CPU tier (tests)
        # compiles fast anyway; the 7B Mosaic compiles are what the cache
        # is for. The backend isn't known at import, so key the decision on
        # the requested platform env instead.
        plats = os.environ.get("JAX_PLATFORMS", "")
        if plats and "cpu" in plats.lower():
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


_enable_compilation_cache()

from zgml_tpu import quant, io, ops  # noqa: F401,E402
