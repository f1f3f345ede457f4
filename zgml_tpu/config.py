"""Central runtime configuration — the one audited surface for every
ZGML_TPU_* toggle (the analog of the reference's `Capabilities` object,
src/backend.zig:14-111: one place declares what the backend does; callers
never probe ad hoc).

Every environment read in the package goes through this module (enforced by
test_graph.test_env_reads_centralized). Flags are read live rather than
frozen at import because the interleaved A/B harnesses (runtime/ktime.time_ab)
flip env vars mid-process by design; consolidation here is about a single
documented, greppable surface — `snapshot()` returns the fully resolved dict
so benches print the exact configuration they ran under (reproducibility,
ref perf-targets.md:157-161).

Toggle inventory (env var -> accessor -> effect):
  ZGML_TPU_KERNELS=ref           kernels_ref()      route ALL ops to the jnp oracle
  ZGML_TPU_KERNELS_DISABLE=a,b   kernels_disabled() per-op oracle routing (A/B)
  ZGML_TPU_KERNELS_FORCE=a,b     kernels_forced()   opt-in Pallas for default-XLA ops
  ZGML_TPU_INTERPRET=1           interpret()        Pallas interpret mode (CPU tests)
  ZGML_TPU_ATTN_BLOCK=0          attn_block()       disable the fused layer kernels
  ZGML_TPU_LAYER_FFN=1           layer_ffn()        merge the FFN into the layer kernel
  ZGML_TPU_STACK_DECODE=1        stack_decode()     all-layers stacked decode megacall
  ZGML_TPU_TAPE_DECODE=1         tape_decode()      tape-streamed decode megacall (measured slower)
  ZGML_TPU_TAPE_BF16=0           tape_bf16()        f32 dequant-dots in the tape megacall
  ZGML_TPU_ATTN_I8A=0/1          attn_i8a(dp)       int8 A-phase (default: on iff dp>=4096)
  ZGML_TPU_FFN_I8A=0/1           ffn_i8a(dp)        int8 FFN gate/up phase (default: on iff dp>=4096)
  ZGML_TPU_SCALES=bf16|f16|f32   scale_mode()       block-scale storage (bf16 default: half the scale traffic, 1-op upcast)
  ZGML_TPU_ATTN_I8PV=1           attn_i8pv()        int8 P.V dot in q8 decode attention
  ZGML_TPU_I8DOT=0               i8dot()            disable int8-dot qmatmul tier
  ZGML_TPU_PREFILL_BF16=0        prefill_bf16()     full-f32 prefill numerics (A/B)
  ZGML_TPU_DYNGRID=0             dyngrid()          static (full-max_seq) KV grids
  ZGML_TPU_NATIVE=0              native()           disable the C++ host library
  ZGML_TPU_CACHE_DIR=path        cache_dir()        persistent XLA compilation cache
  ZGML_TPU_TP_BARRIER=1          tp_barrier()       serialize TP collectives (overlap A/B)
  ZGML_TPU_LAYER_TUNE=a,b,c,d,e  layer_tune()       fused-layer block geometry (A/B)
  ZGML_TPU_LK_CACHEWRITE=1       lk_cachewrite()    in-kernel aliased KV-cache writes (measured slower)
  ZGML_TPU_KV_STACK=1            kv_stack()         stacked [L,...] KV cache + 2-DUS batched writes
  ZGML_TPU_FFN_TUNE=bf,mb        ffn_tune()         FFN megakernel F-tile override (A/B)
  ZGML_TPU_LK_DEBUG=1            lk_debug()         print chosen layer-kernel geometry
"""
from __future__ import annotations

import os


def _get(name: str, default: str) -> str:
    return os.environ.get(name, default)


def _flag(name: str, default: str) -> bool:
    return _get(name, default) != "0"


def _names(name: str) -> frozenset[str]:
    raw = _get(name, "")
    return frozenset(s.strip() for s in raw.split(",") if s.strip())


# -- kernel tier routing ------------------------------------------------------

def kernels_ref() -> bool:
    """True: every op dispatches to the jnp oracle tier."""
    return _get("ZGML_TPU_KERNELS", "pallas") == "ref"


def kernels_disabled() -> frozenset[str]:
    return _names("ZGML_TPU_KERNELS_DISABLE")


def kernels_forced() -> frozenset[str]:
    return _names("ZGML_TPU_KERNELS_FORCE")


def force_kernels(names: str):
    """Context manager: temporarily opt ops into the Pallas tier (the
    ZGML_TPU_KERNELS_FORCE list) for a scoped block — the conformance
    harness uses it to exercise default-XLA ops' kernels."""
    import contextlib

    @contextlib.contextmanager
    def _ctx():
        saved = os.environ.get("ZGML_TPU_KERNELS_FORCE")
        os.environ["ZGML_TPU_KERNELS_FORCE"] = names
        try:
            yield
        finally:
            if saved is None:
                os.environ.pop("ZGML_TPU_KERNELS_FORCE", None)
            else:
                os.environ["ZGML_TPU_KERNELS_FORCE"] = saved
    return _ctx()


def interpret() -> bool:
    """Run every Pallas kernel in interpret mode (CPU CI; exact semantics,
    no Mosaic)."""
    return _get("ZGML_TPU_INTERPRET", "0") == "1"


def attn_block() -> bool:
    return _flag("ZGML_TPU_ATTN_BLOCK", "1")


def layer_ffn() -> bool:
    """Whole-layer merge: FFN phases inside the fused attention kernel."""
    return _get("ZGML_TPU_LAYER_FFN", "0") == "1"


def tape_decode() -> bool:
    """Tape-streamed whole-stack decode megacall (ops/tapekernel.py): all
    layers' weights stream through one manually-DMA'd VMEM window, one
    Pallas call per token. Default OFF: the round-3 driver run measured it
    at 62.4% of roofline vs the per-layer fused path's 82.9% (BENCH_r03 vs
    BENCH_r02) — and merely having the tape attached switches init_cache to
    the stacked [L,...] layout, which bypasses the fused attn_block/ffn
    kernels on every path. Opt-in for experiments only."""
    return _flag("ZGML_TPU_TAPE_DECODE", "0")


def tape_bf16() -> bool:
    """bf16 MXU operands in the tape megacall's dequant-dots. Q4 levels are
    exact in bf16; only the scale product rounds (<=2^-9 rel)."""
    return _flag("ZGML_TPU_TAPE_BF16", "1")


def stack_decode() -> bool:
    """All-layers decode megacall (ops/stackkernel.py): one Pallas call per
    token for the entire layer stack. Default OFF: measured slower than the
    per-layer fused path at 7B (75.8% vs 82.9% of roofline — per-phase
    operands share one VMEM window, crunching tile sizes; PARITY.md)."""
    return _flag("ZGML_TPU_STACK_DECODE", "0")


def attn_i8a(dp: int) -> bool:
    """int8 A-phase in the layer kernel; default auto: on where the QKV
    weight is big enough that f32 dequant VPU work shows (dp >= 4096)."""
    default = "1" if dp >= 4096 else "0"
    return _flag("ZGML_TPU_ATTN_I8A", default) and dp % 32 == 0


def ffn_i8a(dp: int) -> bool:
    """int8 gate/up phase in the N-packed Q4 FFN megakernel; default auto:
    on where the f32 dequant VPU work exceeds the tile DMA window (dp >=
    4096, the same threshold the attention A phase uses)."""
    default = "1" if dp >= 4096 else "0"
    return _flag("ZGML_TPU_FFN_I8A", default) and dp % 32 == 0


def scale_mode() -> str:
    """Per-block weight-scale storage: 'bf16' (default), 'f16', or 'f32'.

    f32 scales are 20 bytes per 32 weights at Q4_0 vs ggml's 18
    (src/quant.zig:18: f16 scale + nibbles) — ~10% of ALL decode weight
    traffic at 7B. Round-5 A/B on v5e:
      bf16: native Mosaic upcast (1 op) — attn 87.6->76.6us, ffn 150->143,
            lm_head 132->114 per call; scale values round by <=2^-8 rel
            (~15x below the Q4 quantization error; same-context argmax
            stable, cosine 0.997 at 7B).
      f16:  bit-EXACT vs the GGUF source (int16 bit patterns + in-kernel
            integer decode, ops/scalecodec.py) but the ~8-op decode eats
            the DMA saving on this VPU: net +0.5-7us per kernel. Kept for
            exactness-sensitive runs.
      f32:  legacy exact storage (the round-1..4 layout).
    Accepts legacy ZGML_TPU_SCALE_F16=1 as 'f16'."""
    legacy = _get("ZGML_TPU_SCALE_F16", "")
    default = "f16" if legacy == "1" else ("f32" if legacy == "0" else "bf16")
    mode = _get("ZGML_TPU_SCALES", default)
    if mode not in ("bf16", "f16", "f32"):
        raise ValueError(f"ZGML_TPU_SCALES={mode!r}: want bf16|f16|f32")
    return mode


def scale_f16() -> bool:
    """Back-compat shim: any compact (non-f32) storage mode."""
    return scale_mode() != "f32"


def attn_i8pv() -> bool:
    """int8 P.V dot in q8 decode attention. Default OFF: the in-kernel
    f32->int8 round legalizes poorly on Mosaic (measured 18-56us vs 3-10us);
    folding per-position V scales into p wins on speed AND accuracy."""
    return _get("ZGML_TPU_ATTN_I8PV", "0") == "1"


def i8dot() -> bool:
    return _flag("ZGML_TPU_I8DOT", "1")


def prefill_bf16() -> bool:
    """bf16 MXU operands on the prefill path (dequant-matmul bf16 tier AND
    the flash kernels' score/PV dots). =0 restores full-f32 numerics."""
    return _flag("ZGML_TPU_PREFILL_BF16", "1")


def dyngrid() -> bool:
    return _flag("ZGML_TPU_DYNGRID", "1")


def native() -> bool:
    return _flag("ZGML_TPU_NATIVE", "1")


def tp_barrier() -> bool:
    """Pin every TP collective behind optimization_barriers (A/B measurement
    of collective/compute overlap, tools/bench_overlap.py). Default off:
    XLA's latency-hiding scheduler is free to overlap psum/all_gather with
    independent compute/DMA."""
    return _get("ZGML_TPU_TP_BARRIER", "0") == "1"


def layer_tune() -> tuple:
    """Experimental block-geometry overrides for the fused layer kernel
    (ops/layerkernel.py): 'bkA_cap,ncA,bkB,hg,budget_MB' comma ints, 0 =
    keep the default for that slot. Read at trace time and part of the jit
    key (passed as a static arg), so the A/B harnesses can flip it per
    variant. Empty (default) = fully auto."""
    raw = _get("ZGML_TPU_LAYER_TUNE", "")
    if not raw:
        return ()
    vals = tuple(int(v or 0) for v in raw.split(","))
    if len(vals) >= 5 and vals[4]:
        vals = vals[:4] + (vals[4] << 20,) + vals[5:]
    return vals


def ffn_tune() -> tuple:
    """Experimental F-tile override for the N-packed Q4 FFN megakernel
    (ops/ffn.py fused_ffn_norm_q4n): 'bf,budget_MB' comma ints, 0 = default.
    Trace-time read, part of the jit key via the static bf argument."""
    raw = _get("ZGML_TPU_FFN_TUNE", "")
    if not raw:
        return ()
    vals = tuple(int(v or 0) for v in raw.split(","))
    if len(vals) >= 2 and vals[1]:
        vals = vals[:1] + (vals[1] << 20,) + vals[2:]
    return vals


def lk_cachewrite() -> bool:
    """In-kernel KV-cache writes in the fused layer kernel (aliased output
    blocks; the current token's rope'd K/V lands at row `pos` inside the
    kernel). Default OFF: interleaved scan+carry A/B (tools/exp_cw.py)
    measured it ~1-2% SLOWER at both 7B (8.11 vs 8.02 ms/tok) and 1B
    (1.430 vs 1.402) — the XLA dynamic_update_slice fuses into the step
    graph for less than the 16-row aliased-window flush costs. It also
    forces full-cache copies in any harness that discards the returned
    cache (the aliased outputs can't be donated there). Kept as a measured
    experiment: =1 enables."""
    return _flag("ZGML_TPU_LK_CACHEWRITE", "0")


def kv_stack() -> bool:
    """Stacked [L, ...] bf16 KV cache for the fused decode path: kernels
    read their layer's slab via scalar-prefetch index maps and the step
    batches every layer's K/V write into TWO dynamic_update_slices (the
    2-per-layer unrolled writes measured ~386us/token at 7B,
    tools/exp_scan.py). Default ON since round 5: engine-level A/B at 7B
    measured 7.70 (stacked) vs 7.80 ms/token (unrolled), both geometries
    (tools/exp_server 07_scanab). =0 restores the per-layer list cache."""
    return _flag("ZGML_TPU_KV_STACK", "1")


def lk_debug() -> bool:
    """Print the fused layer kernel's chosen block geometry at trace time."""
    return _get("ZGML_TPU_LK_DEBUG", "0") == "1"


def cache_dir() -> str:
    """Persistent XLA compilation cache directory ('' disables)."""
    return _get("ZGML_TPU_CACHE_DIR", os.path.expanduser(
        "~/.cache/zgml_tpu/xla"))


def snapshot(dp_hint: int = 4096) -> dict:
    """Fully resolved flag values for bench headers / reproducibility."""
    return {
        "kernels": "ref" if kernels_ref() else "pallas",
        "kernels_disable": sorted(kernels_disabled()),
        "kernels_force": sorted(kernels_forced()),
        "interpret": interpret(),
        "attn_block": attn_block(),
        "layer_ffn": layer_ffn(),
        "stack_decode": stack_decode(),
        "tape_decode": tape_decode(),
        "tape_bf16": tape_bf16(),
        "attn_i8a(dp=%d)" % dp_hint: attn_i8a(dp_hint),
        "ffn_i8a(dp=%d)" % dp_hint: ffn_i8a(dp_hint),
        "scales": scale_mode(),
        "attn_i8pv": attn_i8pv(),
        "lk_cachewrite": lk_cachewrite(),
        "kv_stack": kv_stack(),
        "i8dot": i8dot(),
        "prefill_bf16": prefill_bf16(),
        "dyngrid": dyngrid(),
        "native": native(),
        "cache_dir": cache_dir(),
    }
