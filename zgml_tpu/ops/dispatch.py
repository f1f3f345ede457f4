"""Op dispatch: route each op to its Pallas kernel or the jnp reference.

The analog of the reference's backend vtable + capabilities gating
(src/backend.zig:330-382): callers use one API; the implementation is selected by
platform and the ZGML_TPU_KERNELS env toggle. The "no silent fallback" rule
(perf-targets.md:52-54) is kept via zgml_tpu.runtime.profile counters: every call
records which tier served it.
"""
from __future__ import annotations

import contextlib
import contextvars
import os
from typing import Any

import jax
import jax.numpy as jnp

from zgml_tpu.ops import refs
from zgml_tpu.quant.repack import PackedWeight

from zgml_tpu import config

_force_ref: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "zgml_force_ref", default=False)


@contextlib.contextmanager
def force_ref():
    """Route all ops to the jnp oracle tier inside this trace context.

    Training no longer needs this (every Pallas op carries a custom VJP);
    it remains as an A/B and oracle-comparison tool (conformance tests)."""
    tok = _force_ref.set(True)
    try:
        yield
    finally:
        _force_ref.reset(tok)


def use_pallas(op: str | None = None) -> bool:
    """Pallas kernels are on by default; ZGML_TPU_KERNELS=ref forces the jnp
    oracle everywhere; ZGML_TPU_KERNELS_DISABLE=attention,rmsnorm disables
    specific ops (A/B profiling). In interpret mode (tests) Pallas still runs,
    interpreted."""
    if _force_ref.get():
        return False
    if config.kernels_ref():
        return False
    if op is not None and op in config.kernels_disabled():
        return False
    return True


def _count(name: str, tier: str):
    from zgml_tpu.runtime.profile import global_profile
    global_profile.count_op(name, tier)


# -- quantized matmul ---------------------------------------------------------

def qmatmul(x: jax.Array, w: Any, out_dtype=jnp.float32) -> jax.Array:
    """x [..., K] @ W -> [..., N].

    W is a PackedWeight (fused dequant kernel) or a plain [K, N] jax array.
    """
    if isinstance(w, PackedWeight):
        if use_pallas("qmatmul"):
            from zgml_tpu.ops.qmatmul import qmatmul_pallas
            _count("qmatmul", "pallas")
            return qmatmul_pallas(x, w, out_dtype=out_dtype)
        _count("qmatmul", "ref")
        lead = x.shape[:-1]
        out = refs.qmatmul_ref(x.reshape(-1, x.shape[-1]), w.qvals, w.scales, w.kind)
        return out[:, : w.n].reshape(*lead, w.n).astype(out_dtype)
    _count("matmul", "xla")
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(out_dtype)


def qmatmul_greedy(x: jax.Array, w: Any):
    """Fused GEMV + in-kernel argmax for the greedy decode tail: returns the
    int32 [1] token id of argmax_n(x @ dequant(W)), or None when the fused
    kernel doesn't apply (caller falls back to qmatmul + argmax). Token ids
    match argmax(qmatmul(x, w)) exactly (same tiles, same accumulation
    order, first-occurrence ties)."""
    if isinstance(w, PackedWeight) and use_pallas("qmatmul"):
        from zgml_tpu.ops.qmatmul import qmatmul_greedy_pallas
        tok = qmatmul_greedy_pallas(x, w)
        if tok is not None:
            _count("qmatmul_greedy", "pallas")
            return tok
    return None


def fused_ffn(x: jax.Array, gu: Any, wd: Any):
    """down(silu(gate(x)) * up(x)) as one kernel when the layout allows;
    returns None if the caller should use the separate-projection path.

    Decode-only (small M): one launch beats three when per-call overhead
    dominates; at prefill M the separate kernels tile better (measured)."""
    m = 1
    for dim in x.shape[:-1]:
        m *= dim
    if m > 32:
        return None
    from zgml_tpu.ops.ffn import ffn_compatible, fused_ffn_pallas
    if not use_pallas("fused_ffn") or not ffn_compatible(gu, wd):
        return None
    _count("fused_ffn", "pallas")
    return fused_ffn_pallas(x, gu, wd)


def fused_ffn_norm_q4n(x: jax.Array, gamma: jax.Array, pack: dict,
                       d_logical: int, eps: float):
    """N-packed Q4 FFN megakernel (wide DMA runs); None when gated off."""
    m = 1
    for dim in x.shape[:-1]:
        m *= dim
    if m > 32 or not use_pallas("fused_ffn"):
        return None
    from zgml_tpu.ops.ffn import fused_ffn_norm_q4n as impl
    _count("fused_ffn_norm", "pallas")
    return impl(x, gamma, pack, d_logical, eps)


def fused_ffn_norm(x: jax.Array, gamma: jax.Array, gu: Any, wd: Any,
                   eps: float):
    """rmsnorm + FFN + residual in one launch (decode fast path); None if
    the layout is incompatible — caller then norms/projects separately."""
    m = 1
    for dim in x.shape[:-1]:
        m *= dim
    if m > 32:
        return None
    from zgml_tpu.ops.ffn import ffn_compatible, fused_ffn_norm_pallas
    if not use_pallas("fused_ffn") or not ffn_compatible(gu, wd):
        return None
    _count("fused_ffn_norm", "pallas")
    return fused_ffn_norm_pallas(x, gamma, gu, wd, eps)


# -- normalization / rope / attention ----------------------------------------

def rmsnorm(x: jax.Array, gamma: jax.Array, eps: float = 1e-5) -> jax.Array:
    # Default tier is XLA: a model-width row is a few KB and XLA fuses the
    # norm into its elementwise neighbours, so a separate Pallas launch is
    # pure dispatch overhead (measured: decode 1223->1304 tok/s, prefill
    # 15.4k->19.5k on SmolLM-shape by switching). The Pallas kernel stays
    # available via ZGML_TPU_KERNELS_FORCE=rmsnorm for standalone/huge rows.
    if "rmsnorm" in config.kernels_forced() and use_pallas("rmsnorm"):
        from zgml_tpu.ops.rmsnorm import rmsnorm_pallas
        _count("rmsnorm", "pallas")
        return rmsnorm_pallas(x, gamma, eps)
    _count("rmsnorm", "xla")
    return refs.rmsnorm_ref(x, gamma, eps)


def rope_apply(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    # pure elementwise — XLA fuses this optimally into neighbors; a dedicated
    # kernel only pays off fused into the cache store (see ops/attention.py).
    _count("rope", "xla")
    return refs.rope_apply_ref(x, cos, sin)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    kv_len=None, q_offset=0, kv_row=None) -> jax.Array:
    """Prefill attention, GQA-aware and causal: q [B,Hq,Tq,d], k/v [B,Hkv,S,d].

    Query row i has absolute position q_offset + i; keys with absolute position
    < kv_len and <= the query's position contribute. kv_row: read batch entry
    kv_row of a larger cache (serving prefill-into-slot; q must be batch 1).
    """
    if use_pallas("attention"):
        from zgml_tpu.ops.attention import flash_attention_pallas
        _count("attention", "pallas")
        return flash_attention_pallas(q, k, v, kv_len, q_offset, kv_row=kv_row)
    _count("attention", "ref")
    if kv_row is not None:
        k = jax.lax.dynamic_slice_in_dim(k, kv_row, 1, axis=0)
        v = jax.lax.dynamic_slice_in_dim(v, kv_row, 1, axis=0)
    s = k.shape[2]
    tq = q.shape[2]
    if kv_len is None:
        kv_len = s
    ki = jnp.arange(s)[None, :]
    qi = jnp.arange(tq)[:, None] + q_offset
    mask = (ki < kv_len) & (ki <= qi)                   # [Tq, S]
    return refs.gqa_attention_ref(q, k, v, mask[None, None])


def flash_attention_q8(q: jax.Array, kq, ks, vq, vs, kv_len=None,
                       q_offset=0, kv_row=None) -> jax.Array:
    """Prefill flash attention DIRECTLY over the int8 d-major KV cache —
    no full-cache f32 dequant transient (ref: attentionQuantized,
    quant.zig:925-1091). q [B,Hq,Tq,d]; kq/vq int8 [B',Hkv,d,S]."""
    if use_pallas("attention"):
        from zgml_tpu.ops.attention import flash_attention_q8_pallas
        _count("flash_attention_q8", "pallas")
        return flash_attention_q8_pallas(q, kq, ks, vq, vs, kv_len,
                                         q_offset, kv_row=kv_row)
    _count("flash_attention_q8", "ref")
    from zgml_tpu.quant.kv_cache import dequantize_cache
    k = dequantize_cache(kq, ks)
    v = dequantize_cache(vq, vs)
    return flash_attention(q, k, v, kv_len=kv_len, q_offset=q_offset,
                           kv_row=kv_row)


def decode_attention_q8(q: jax.Array, kq, ks, vq, vs, kv_len) -> jax.Array:
    """Decode attention directly over the int8 KV cache (d-major layout,
    see zgml_tpu/quant/kv_cache.py). ref: attentionQuantized, quant.zig:925."""
    if use_pallas("decode_attention"):
        from zgml_tpu.ops.attention import decode_attention_q8_pallas
        _count("decode_attention_q8", "pallas")
        return decode_attention_q8_pallas(q, kq, ks, vq, vs, kv_len)
    _count("decode_attention_q8", "ref")
    from zgml_tpu.quant.kv_cache import dequantize_cache
    k = dequantize_cache(kq, ks)
    v = dequantize_cache(vq, vs)
    return decode_attention(q, k, v, kv_len)


def decode_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     kv_len: jax.Array, kv_row=None) -> jax.Array:
    """Single-step attention over a KV cache prefix.

    q: [B, Hq, 1, d]; k/v: [B, Hkv, S, d] (S = max_seq); kv_len: [] or [B]
    number of valid cache positions (ref: seq_kv patching,
    src/device_inference.zig:252-256 — kernels never scan invalid cache).
    kv_row: k/v are a larger [B',Hkv,S,d] cache; queries read batch rows
    kv_row..kv_row+B-1 (stacked-cache per-layer decode, serving slots).
    """
    if use_pallas("decode_attention"):
        from zgml_tpu.ops.attention import decode_attention_pallas
        _count("decode_attention", "pallas")
        return decode_attention_pallas(q, k, v, kv_len, kv_row=kv_row)
    _count("decode_attention", "ref")
    if kv_row is not None:
        b = q.shape[0]
        k = jax.lax.dynamic_slice_in_dim(k, kv_row, b, axis=0)
        v = jax.lax.dynamic_slice_in_dim(v, kv_row, b, axis=0)
    s = k.shape[2]
    pos = jnp.arange(s)[None, :]
    valid = pos < jnp.reshape(kv_len, (-1, 1))          # [B, S]
    mask = valid[:, None, None, :]                      # [B, 1, 1, S]
    return refs.gqa_attention_ref(q, k, v, mask)
