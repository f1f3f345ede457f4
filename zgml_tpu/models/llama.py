"""Llama-family decoder-only model: functional, pytree params, scan over layers.

Capability parity with the reference's LLaMA (src/models/llama.zig,
src/models/llama_transformer.zig): GQA (n_kv_heads <= n_heads), RMSNorm-gamma,
separate Q/K/V projections, RoPE with HF half-split pairing, SwiGLU FFN
(silu(x Wg) * (x Wu)) Wd, optional tied LM head — re-designed TPU-first:

  - layers are a *stacked* pytree ([L, ...] leaves) consumed by lax.scan, so the
    whole forward is one compiled loop instead of L inlined blocks;
  - the KV cache is a fixed-shape [L, B, Hkv, S, d] pair threaded through the
    scan and updated in place via dynamic_update_slice (the analog of the
    reference's per-layer KV slabs with storage_offset patching,
    llama_transformer.zig:211-220);
  - every projection dispatches through zgml_tpu.ops (Pallas fused
    dequant-matmul when the weight is a PackedWeight, XLA matmul when dense).

Weights in a projection position are either a dense [K, N] jax array (K-major so
the matmul is x @ w) or a zgml_tpu.quant.PackedWeight.
"""
from __future__ import annotations

import dataclasses
import enum
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from zgml_tpu.ops import dispatch as ops
from zgml_tpu.ops import refs


class CacheLayout(enum.Enum):
    """The four KV-cache layouts (decision table: ARCHITECTURE.md).

    UNROLLED      bf16/f32 per-layer list of [B, Hkv, S, d] (inference
                  default: donation aliases each leaf, weights feed the
                  Pallas kernels with no per-step gather)
    STACKED       bf16 [L, B, Hkv, S, d] array (scan-layout params, the
                  opt-in megacalls, or ZGML_TPU_KV_STACK fused decode:
                  all layers' writes batch into 2 DUS/step)
    UNROLLED_INT8 per-layer list of (q [B,Hkv,d,S] i8, scales [B,Hkv,S])
    STACKED_INT8  ([L,B,Hkv,d,S] i8, [L,B,Hkv,S]) leaf pair (scan params)
    """
    UNROLLED = "unrolled"
    STACKED = "stacked"
    UNROLLED_INT8 = "unrolled_int8"
    STACKED_INT8 = "stacked_int8"


def cache_layout_of(cache: dict) -> CacheLayout:
    """Classify an existing cache dict (the inverse of init_cache)."""
    ck = cache["k"]
    if isinstance(ck, list):
        return (CacheLayout.UNROLLED_INT8 if isinstance(ck[0], tuple)
                else CacheLayout.UNROLLED)
    if isinstance(ck, tuple):
        return CacheLayout.STACKED_INT8
    return CacheLayout.STACKED


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """ref: src/models/llama.zig:34-45."""
    vocab_size: int
    d_model: int
    n_heads: int
    n_kv_heads: int
    d_ff: int
    n_layers: int
    max_seq_len: int = 2048
    rope_base: float = 10000.0
    rms_norm_eps: float = 1e-5
    tied_lm_head: bool = False

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @property
    def n_rep(self) -> int:
        return self.n_heads // self.n_kv_heads


# Per-layer params (leaves stacked along axis 0 = layer):
#   attn_norm [L, D], wq [L, D, Hq*dh], wk/wv [L, D, Hkv*dh], wo [L, Hq*dh, D],
#   ffn_norm [L, D], w_gate/w_up [L, D, F], w_down [L, F, D]
# (or PackedWeight with [L, ...] qvals/scales for the matmul positions)


def init_params(cfg: LlamaConfig, seed: int = 0, dtype=jnp.float32,
                scale: float = 0.02) -> dict:
    """Random-init params (synthetic models for tests/benches)."""
    rng = np.random.default_rng(seed)
    d, hd = cfg.d_model, cfg.head_dim
    nq, nkv, f, L = cfg.n_heads * hd, cfg.n_kv_heads * hd, cfg.d_ff, cfg.n_layers

    def w(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale,
                           dtype=dtype)

    params = {
        "tok_embd": w(cfg.vocab_size, d),
        "out_norm": jnp.ones((d,), dtype),
        "layers": {
            "attn_norm": jnp.ones((L, d), dtype),
            "ffn_norm": jnp.ones((L, d), dtype),
            "wq": w(L, d, nq),
            "wk": w(L, d, nkv),
            "wv": w(L, d, nkv),
            "wo": w(L, nq, d),
            "w_gate": w(L, d, f),
            "w_up": w(L, d, f),
            "w_down": w(L, f, d),
        },
    }
    if not cfg.tied_lm_head:
        params["lm_head"] = w(d, cfg.vocab_size)
    return params


def _project(x, w):
    """x [..., K] @ w -> [..., N]; w dense [K, N] or [.., K, N]-sliced PackedWeight."""
    return ops.qmatmul(x, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _tp_copy(x, axis_name):
    """Megatron 'f' operator: identity forward, psum backward.

    Placed at the input of every column-parallel projection so the replicated
    residual-stream cotangent stays replicated and TP gradients are exact
    (each device otherwise backpropagates only its shard's partial cotangent).
    """
    return x


def _tp_copy_fwd(x, axis_name):
    return x, None


def _tp_copy_bwd(axis_name, _, g):
    return (jax.lax.psum(g, axis_name),)


_tp_copy.defvjp(_tp_copy_fwd, _tp_copy_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _tp_reduce(x, axis_name):
    """Megatron 'g' operator: psum forward, identity backward.

    A raw lax.psum under shard_map(check_rep=False) transposes to another psum,
    which double-counts the (replicated) cotangent; the correct backward for a
    row-parallel projection output is the identity."""
    return _psum_maybe_barrier(x, axis_name)


def _psum_maybe_barrier(x, axis_name):
    """psum, optionally fenced by optimization_barriers (ZGML_TPU_TP_BARRIER)
    so the collective cannot overlap surrounding compute — the serialized
    side of the collective/compute-overlap A/B (tools/bench_overlap.py)."""
    from zgml_tpu import config
    if config.tp_barrier():
        x = jax.lax.optimization_barrier(x)
        return jax.lax.optimization_barrier(jax.lax.psum(x, axis_name))
    return jax.lax.psum(x, axis_name)


def _tp_reduce_fwd(x, axis_name):
    return _psum_maybe_barrier(x, axis_name), None


def _tp_reduce_bwd(axis_name, _, g):
    return (g,)


_tp_reduce.defvjp(_tp_reduce_fwd, _tp_reduce_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _tp_gather(x, axis_name):
    """all_gather along the last axis with the replicated-cotangent-correct
    backward: each device takes its own slice (the default transpose,
    psum_scatter, overcounts a replicated cotangent by tp under
    check_rep=False)."""
    return jax.lax.all_gather(x, axis_name, axis=x.ndim - 1, tiled=True)


def _tp_gather_fwd(x, axis_name):
    return _tp_gather(x, axis_name), x.shape[-1]


def _tp_gather_bwd(axis_name, shard, g):
    idx = jax.lax.axis_index(axis_name) * shard
    return (jax.lax.dynamic_slice_in_dim(g, idx, shard, axis=g.ndim - 1),)


_tp_gather.defvjp(_tp_gather_fwd, _tp_gather_bwd)


@dataclasses.dataclass(frozen=True)
class _LocalCfgView:
    """Shard-local config view for the fused kernels under TP: local head
    counts with the FULL model width (norms see all of d; heads are the
    shard's own). LlamaConfig derives head_dim from d_model/n_heads, which
    would be wrong for a shard, hence the explicit field."""
    n_heads: int
    n_kv_heads: int
    head_dim: int
    d_model: int
    rms_norm_eps: float


def _ffn_after_attn(cfg: LlamaConfig, layer, x, tp_axis):
    """FFN half of a layer, after a fused attention block already produced
    the post-attention residual stream x. Picks the fastest attached form
    (N-packed Q4 megakernel > fused norm+FFN > composed ops)."""
    d = cfg.d_model

    def _ffn_res(x_new):
        # fused kernels return x + ffn_partial; under TP psum the partial
        # before it joins the replicated stream
        if tp_axis is not None:
            x_new = x + _tp_reduce(x_new - x, tp_axis)
        return x_new.astype(x.dtype)

    if "ffn_q4n" in layer:
        # N-packed Q4 FFN: wide DMA runs + fused norm/residual
        x_new = ops.fused_ffn_norm_q4n(x, layer["ffn_norm"],
                                       layer["ffn_q4n"], d,
                                       cfg.rms_norm_eps)
        if x_new is not None:
            return _ffn_res(x_new)
    if "w_gate_up" in layer:
        # norm + FFN + residual fused into the one FFN launch
        x_new = ops.fused_ffn_norm(x, layer["ffn_norm"],
                                   layer["w_gate_up"], layer["w_down"],
                                   cfg.rms_norm_eps)
        if x_new is not None:
            return _ffn_res(x_new)
    h = ops.rmsnorm(x, layer["ffn_norm"], cfg.rms_norm_eps)
    ff_out = None
    if "w_gate_up" in layer:
        ff_out = ops.fused_ffn(h, layer["w_gate_up"], layer["w_down"])
    if ff_out is None:
        if "w_gate_up" in layer:
            gu = _project(h, layer["w_gate_up"])
            f = gu.shape[-1] // 2
            gate, up = gu[..., :f], gu[..., f:]
        else:
            gate = _project(h, layer["w_gate"])
            up = _project(h, layer["w_up"])
        ff = refs.swiglu_ref(gate, up)
        ff_out = _project(ff, layer["w_down"])
    if tp_axis is not None:
        ff_out = _tp_reduce(ff_out, tp_axis)
    return x + ff_out.astype(x.dtype)


def _layer_step(cfg: LlamaConfig, x, layer, cache_k, cache_v, pos, kv_len,
                cos, sin, decode: bool, tp_axis: str | None = None,
                tp_size: int = 1, cache_row=None, write_pos=None,
                kv_layer: int | None = None):
    """One transformer block. x: [B, T, D]; cache_k/v: [B, Hkv_local, S, dh]
    — or, with kv_layer set, the FULL stacked cache [L, B, Hkv, S, dh]: K/V
    write at (kv_layer, 0, 0, pos, 0) (static-index in-place update) and the
    flash kernel reads batch row kv_layer*B through its kv_row offset.

    Returns (x_out, new_cache_k, new_cache_v).
    ref: llama_transformer.zig:139-253 (training + cached forward).

    Tensor parallelism (Megatron-style, a new capability vs the reference —
    SURVEY.md §2.7): when `tp_axis` is set, this runs inside shard_map with
    wq/wk/wv/w_gate/w_up column-sharded (local out-features), wo/w_down
    row-sharded (local in-features), and the attention-output / FFN-down
    projections partial-summed over the axis (psum rides the ICI).
    """
    b, t, d = x.shape
    hd = cfg.head_dim
    hq, hkv = cfg.n_heads // tp_size, cfg.n_kv_heads // tp_size

    per_row_pos = getattr(pos, "ndim", 0) == 1
    if kv_layer is not None:
        # stacked-cache per-layer path (prefill / non-megacall decode)
        L, bb, hkv_c, s_c, hd_c = cache_k.shape
        h = ops.rmsnorm(x, layer["attn_norm"], cfg.rms_norm_eps)
        if "wqkv" in layer:
            nq, nkv = hq * hd, hkv * hd
            qkv = _project(h, layer["wqkv"])
            q = qkv[..., :nq].reshape(b, t, hq, hd).transpose(0, 2, 1, 3)
            k = qkv[..., nq:nq + nkv].reshape(b, t, hkv, hd
                                              ).transpose(0, 2, 1, 3)
            v = qkv[..., nq + nkv:nq + 2 * nkv].reshape(
                b, t, hkv, hd).transpose(0, 2, 1, 3)
        else:
            q = _project(h, layer["wq"]).reshape(b, t, hq, hd
                                                 ).transpose(0, 2, 1, 3)
            k = _project(h, layer["wk"]).reshape(b, t, hkv, hd
                                                 ).transpose(0, 2, 1, 3)
            v = _project(h, layer["wv"]).reshape(b, t, hkv, hd
                                                 ).transpose(0, 2, 1, 3)
        q = ops.rope_apply(q, cos, sin)
        k = ops.rope_apply(k, cos, sin)
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k[None].astype(cache_k.dtype), (kv_layer, 0, 0, pos, 0))
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v[None].astype(cache_v.dtype), (kv_layer, 0, 0, pos, 0))
        if decode:
            # same kernel as the unrolled decode path (numerically identical
            # tokens across layouts), reading the layer's rows via kv_row
            att = ops.decode_attention(
                q, cache_k.reshape(L * bb, hkv_c, s_c, hd_c),
                cache_v.reshape(L * bb, hkv_c, s_c, hd_c),
                kv_len, kv_row=kv_layer * bb)
        else:
            att = ops.flash_attention(
                q, cache_k.reshape(L * bb, hkv_c, s_c, hd_c),
                cache_v.reshape(L * bb, hkv_c, s_c, hd_c),
                kv_len=kv_len, q_offset=pos, kv_row=kv_layer * bb)
        att = att.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, t, hq * hd)
        attn_out = _project(att, layer["wo"])
        x = x + attn_out.astype(x.dtype)
        h = ops.rmsnorm(x, layer["ffn_norm"], cfg.rms_norm_eps)
        ff_out = None
        if "w_gate_up" in layer:
            ff_out = ops.fused_ffn(h, layer["w_gate_up"], layer["w_down"])
        if ff_out is None:
            if "w_gate_up" in layer:
                gu = _project(h, layer["w_gate_up"])
                f = gu.shape[-1] // 2
                gate, up = gu[..., :f], gu[..., f:]
            else:
                gate = _project(h, layer["w_gate"])
                up = _project(h, layer["w_up"])
            ff = refs.swiglu_ref(gate, up)
            ff_out = _project(ff, layer["w_down"])
        x = x + ff_out.astype(x.dtype)
        return x, cache_k, cache_v

    if (decode and b == 1 and t == 1
            and cache_row is None and write_pos is None and not per_row_pos
            and "wo3" in layer):
        from zgml_tpu.ops.layerkernel import (attn_block_compatible,
                                              attn_block_enabled,
                                              attn_block_step)
        # Under TP the kernels run unmodified on the shard's LOCAL head
        # counts (weights/views per-shard re-derived, parallel/tp.py
        # shard_layer_fused); only the residual adds move outside so the
        # row-sharded projections psum before they join the stream.
        kcfg = cfg if tp_size == 1 else _LocalCfgView(
            n_heads=hq, n_kv_heads=hkv, head_dim=hd, d_model=d,
            rms_norm_eps=cfg.rms_norm_eps)
        if (attn_block_enabled() and ops.use_pallas("attn_block")
                and attn_block_compatible(layer, kcfg, cache_k)):
            # fused attention block: norm+qkv+rope+attention+wo+residual in
            # ONE kernel; the current token's K/V attend from registers (the
            # cache write below happens logically in parallel)
            from zgml_tpu.runtime.profile import global_profile
            global_profile.count_op("attn_block", "pallas")
            half = cos.shape[-1]
            c2 = jnp.concatenate([cos, cos], -1).reshape(1, 2 * half)
            s2 = jnp.concatenate([-sin, sin], -1).reshape(1, 2 * half)
            x2, k_cur, v_cur, did_ffn, new_ck, new_cv = attn_block_step(
                kcfg, layer, x, cache_k, cache_v, pos, c2, s2,
                allow_ffn=tp_axis is None)
            if tp_axis is not None:
                # kernel returned x + wo_partial (local heads); psum the
                # partial, then re-add the replicated residual
                x2 = x + _tp_reduce(x2 - x, tp_axis)
            if new_ck is not None:
                # bf16 cache: K/V written at `pos` INSIDE the kernel
                # (aliased output blocks) — no XLA update needed
                cache_k, cache_v = new_ck, new_cv
            elif isinstance(cache_k, tuple):
                from zgml_tpu.quant.kv_cache import (quantize_columns,
                                                     write_columns)
                kq_n, ks_n = quantize_columns(k_cur)
                vq_n, vs_n = quantize_columns(v_cur)
                cache_k = write_columns(cache_k[0], cache_k[1],
                                        kq_n, ks_n, pos)
                cache_v = write_columns(cache_v[0], cache_v[1],
                                        vq_n, vs_n, pos)
            else:
                cache_k = jax.lax.dynamic_update_slice(
                    cache_k, k_cur.astype(cache_k.dtype), (0, 0, pos, 0))
                cache_v = jax.lax.dynamic_update_slice(
                    cache_v, v_cur.astype(cache_v.dtype), (0, 0, pos, 0))
            x = x2.astype(x.dtype)
            if did_ffn:      # whole layer ran inside the one kernel
                return x, cache_k, cache_v
            return (_ffn_after_attn(cfg, layer, x, tp_axis),
                    cache_k, cache_v)

    h = ops.rmsnorm(x, layer["attn_norm"], cfg.rms_norm_eps)
    if tp_axis is not None:
        h = _tp_copy(h, tp_axis)
    if "wqkv" in layer:
        # fused single-launch QKV projection (ref: GPT packed w_qkv,
        # src/models/gpt.zig; Metal projection groups, program.zig:980-1485)
        nq, nkv = hq * hd, hkv * hd
        qkv = _project(h, layer["wqkv"])
        q = qkv[..., :nq].reshape(b, t, hq, hd).transpose(0, 2, 1, 3)
        k = qkv[..., nq:nq + nkv].reshape(b, t, hkv, hd).transpose(0, 2, 1, 3)
        v = qkv[..., nq + nkv:nq + 2 * nkv].reshape(b, t, hkv, hd
                                                    ).transpose(0, 2, 1, 3)
    else:
        q = _project(h, layer["wq"]).reshape(b, t, hq, hd).transpose(0, 2, 1, 3)
        k = _project(h, layer["wk"]).reshape(b, t, hkv, hd).transpose(0, 2, 1, 3)
        v = _project(h, layer["wv"]).reshape(b, t, hkv, hd).transpose(0, 2, 1, 3)

    q = ops.rope_apply(q, cos, sin)
    k = ops.rope_apply(k, cos, sin)

    per_row = getattr(pos, "ndim", 0) == 1   # [B] positions (continuous batching)
    # where K/V land in the cache; serving decouples this from `pos` so an
    # inactive slot's garbage decode write goes to the dead last position
    # instead of clobbering a mid-prefill slot's row (position max_seq-1 is
    # never live: requests finish at pos+1 >= max_seq)
    wp = pos if write_pos is None else write_pos

    if isinstance(cache_k, tuple):
        # int8 quantized KV cache: (k_q, k_s) / (v_q, v_s) d-major slabs
        from zgml_tpu.quant.kv_cache import quantize_columns, write_columns
        kq_new, ks_new = quantize_columns(k)
        vq_new, vs_new = quantize_columns(v)
        if cache_row is not None:
            # serving prefill-into-slot over the int8 cache: write this
            # batch-1 chunk's quantized columns at (slot, pos), then run
            # flash over the slot's dequantized row (the int8 row slice is
            # 3.6x smaller than the f32 transient it expands to)
            dus4 = lambda c, u: jax.lax.dynamic_update_slice(   # noqa: E731
                c, u, (cache_row, 0, 0, pos) if u.ndim == 4
                else (cache_row, 0, pos))     # scales are [B, H, S]
            cache_k = (dus4(cache_k[0], kq_new), dus4(cache_k[1], ks_new))
            cache_v = (dus4(cache_v[0], vq_new), dus4(cache_v[1], vs_new))
            att = ops.flash_attention_q8(q, cache_k[0], cache_k[1],
                                         cache_v[0], cache_v[1],
                                         kv_len=kv_len, q_offset=pos,
                                         kv_row=cache_row)
        elif per_row:
            dus = jax.vmap(lambda c, u, p: jax.lax.dynamic_update_slice(
                c, u, (0, 0, p) if u.ndim == 3 else (0, p)))
            cache_k = (dus(cache_k[0], kq_new, wp), dus(cache_k[1], ks_new, wp))
            cache_v = (dus(cache_v[0], vq_new, wp), dus(cache_v[1], vs_new, wp))
        else:
            cache_k = write_columns(cache_k[0], cache_k[1], kq_new, ks_new, pos)
            cache_v = write_columns(cache_v[0], cache_v[1], vq_new, vs_new, pos)
        if decode:
            att = ops.decode_attention_q8(q, cache_k[0], cache_k[1],
                                          cache_v[0], cache_v[1], kv_len)
        else:
            # prefill: flash DIRECTLY over the int8 cache (both MXU dots
            # consume the d-major layout natively; no f32 cache transient)
            att = ops.flash_attention_q8(q, cache_k[0], cache_k[1],
                                         cache_v[0], cache_v[1],
                                         kv_len=kv_len, q_offset=pos)
    elif cache_row is not None:
        # serving prefill-into-slot: x is batch-1 but the cache is the full
        # [B', Hkv, S, d] shared slab; write this request's K/V at its slot
        # row and read attention through the kernel's kv_row offset —
        # zero-copy, no staging cache (VERDICT 6)
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k.astype(cache_k.dtype), (cache_row, 0, pos, 0))
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v.astype(cache_v.dtype), (cache_row, 0, pos, 0))
        att = ops.flash_attention(q, cache_k, cache_v, kv_len=kv_len,
                                  q_offset=pos, kv_row=cache_row)
    else:
        # write K/V into the cache at position `pos` (analog of sliceAssign
        # with storage_offset patching, llama_inference.zig:450-453)
        if per_row:
            dus = jax.vmap(lambda c, u, p: jax.lax.dynamic_update_slice(
                c, u, (0, p, 0)))
            cache_k = dus(cache_k, k.astype(cache_k.dtype), wp)
            cache_v = dus(cache_v, v.astype(cache_v.dtype), wp)
        else:
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, k.astype(cache_k.dtype), (0, 0, pos, 0))
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, v.astype(cache_v.dtype), (0, 0, pos, 0))
        if decode:
            att = ops.decode_attention(q, cache_k, cache_v, kv_len)
        else:
            att = ops.flash_attention(q, cache_k, cache_v, kv_len=kv_len,
                                      q_offset=pos)
    att = att.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, t, hq * hd)
    attn_out = _project(att, layer["wo"])
    if tp_axis is not None:
        attn_out = _tp_reduce(attn_out, tp_axis)
    x = x + attn_out.astype(x.dtype)

    h = ops.rmsnorm(x, layer["ffn_norm"], cfg.rms_norm_eps)
    if tp_axis is not None:
        h = _tp_copy(h, tp_axis)
    ff_out = None
    if "w_gate_up" in layer:
        ff_out = ops.fused_ffn(h, layer["w_gate_up"], layer["w_down"])
    if ff_out is None:
        if "w_gate_up" in layer:
            gu = _project(h, layer["w_gate_up"])
            f = gu.shape[-1] // 2
            gate, up = gu[..., :f], gu[..., f:]
        else:
            gate = _project(h, layer["w_gate"])
            up = _project(h, layer["w_up"])
        ff = refs.swiglu_ref(gate, up)
        ff_out = _project(ff, layer["w_down"])
    if tp_axis is not None:
        ff_out = _tp_reduce(ff_out, tp_axis)
    x = x + ff_out.astype(x.dtype)
    return x, cache_k, cache_v


def _head_out(cfg, params, x, tp_axis, greedy):
    """Decode tail: out_norm + lm_head. greedy=True returns next-token ids
    [B] int32 instead of logits — via the fused GEMV+argmax kernel
    (ops.qmatmul_greedy) when it applies, else argmax over the logits.
    The fused path removes the logits materialization + separate argmax
    from the fully-serialized decode critical path (round-5: the logits ->
    token dependency costs ~313us/token at 7B; nothing overlaps it)."""
    x = ops.rmsnorm(x, params["out_norm"], cfg.rms_norm_eps)
    if tp_axis is not None:
        x = _tp_copy(x, tp_axis)
    lm_head = params.get("lm_head")
    if greedy and tp_axis is None and lm_head is not None:
        tok = ops.qmatmul_greedy(x[:, -1], lm_head)
        if tok is not None:
            return tok
    if lm_head is None:   # tied embeddings: logits = x @ embd.T
        logits = jnp.einsum("btd,vd->btv", x.astype(jnp.float32),
                            params["tok_embd"].astype(jnp.float32))
    else:
        logits = _project(x, lm_head)
    if tp_axis is not None and lm_head is not None:
        # lm_head is column(vocab)-sharded: gather shards -> full vocab
        logits = _tp_gather(logits, tp_axis)
    logits = logits.astype(jnp.float32)
    if greedy:
        return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    return logits


class LlamaModel:
    """Functional model wrapper: holds config + params, exposes pure forward fns.

    The "plan" discipline of the reference (frozen graph + patched inputs,
    llama_inference.zig:51-149) maps to jit-compiled `forward` with static
    (B, T) shapes and donated caches — compiled once per shape bucket.
    """

    def __init__(self, cfg: LlamaConfig, params: dict):
        self.cfg = cfg
        self.params = params

    def quantize(self, kind: str = "q8_0") -> "LlamaModel":
        """Post-hoc weight quantization in place (the reference's
        `session.quantize(block)`, llama_inference.zig:189-231): every dense
        matmul weight becomes a planar PackedWeight; norms/embeddings stay
        f32. Re-derives the fused-kernel weight views. Returns self."""
        from zgml_tpu.io.llama_loader import quantize_llama_params
        from zgml_tpu.ops.layerkernel import attn_block_enabled
        from zgml_tpu.quant.headmajor import attach_head_major
        self.params = quantize_llama_params(self.params, kind)
        if attn_block_enabled():
            for layer in self.params["layers"]:
                attach_head_major(layer, self.cfg.n_heads,
                                  self.cfg.n_kv_heads, self.cfg.head_dim)
        return self

    def attach_derived(self) -> "LlamaModel":
        """Derive + attach the decode weight views (wo3 head-major, ffn_q4n
        N-packed) ON DEVICE via jnp bit-shuffles (quant/headmajor.py) —
        milliseconds on TPU vs ~70s of host numpy at 7B, and the planar
        weights upload only once. No-op for layers already carrying views or
        incompatible with the fused kernels. Returns self."""
        from zgml_tpu.ops.layerkernel import attn_block_enabled
        from zgml_tpu.quant.headmajor import attach_head_major_jnp
        layers = self.params.get("layers")
        if attn_block_enabled() and isinstance(layers, (list, tuple)):
            for layer in layers:
                # idempotent per view: attaches whichever of wo3/ffn_q4n is
                # missing, keeps the ones already present
                attach_head_major_jnp(layer, self.cfg.n_heads,
                                      self.cfg.n_kv_heads,
                                      self.cfg.head_dim)
        return self

    def enable_stacked_decode(self) -> bool:
        """Build the stacked [L, ...] weight views for the all-layers decode
        megacall (zgml_tpu/ops/stackkernel.py) and switch the KV cache layout
        to stacked [L, B, Hkv, S, d]. Returns False (no-op) when the layers
        are incompatible (non-q4_0, missing derived views). Opt-in: decode
        then runs ONE Pallas call per token for the whole stack; prefill runs
        the per-layer kernels against the stacked cache via kv_row=layer
        index maps (no cache copies)."""
        from zgml_tpu.ops.stackkernel import stack_llama_layers
        stacked = stack_llama_layers(self.params, self.cfg)
        if stacked is None:
            return False
        self.params["layers_stacked"] = stacked
        return True

    def enable_tape_decode(self) -> bool:
        """Build the flat weight/scale tapes for the tape-streamed decode
        megacall (zgml_tpu/ops/tapekernel.py) and switch the KV cache layout
        to stacked [L, B, Hkv, S, d]. Returns False (no-op) when the layers
        are incompatible (non-q4_0, dims not lane-aligned). Decode then runs
        ONE Pallas call per token with every layer's weights streaming
        through a single manually-DMA'd VMEM window; prefill runs the
        per-layer kernels against the stacked cache via kv_row=layer index
        maps (no cache copies)."""
        from zgml_tpu.ops.tapekernel import build_tape
        tape = build_tape(self.params, self.cfg)
        if tape is None:
            return False
        self.params["layers_tape"] = tape
        return True

    # -- cache --------------------------------------------------------------
    def cache_layout(self, dtype=jnp.bfloat16,
                     layout: str | None = None) -> "CacheLayout":
        """THE cache-layout decision — the one place the layout matrix is
        resolved (decision table: ARCHITECTURE.md "KV-cache layouts").

        Signals, in order: an explicit `layout` override ("unrolled" /
        "stacked") wins; int8 dtype picks the quantized variant of the
        params-implied layout; otherwise scan-layout (stacked-dict) params
        and the opt-in megacalls (layers_stacked/layers_tape, only when
        their config flag is ON — mere presence in a checkpoint no longer
        flips the layout) imply STACKED, unrolled list params imply UNROLLED
        unless ZGML_TPU_KV_STACK opts into the stacked fused-decode layout.
        """
        from zgml_tpu import config as _config
        int8 = dtype == "int8" or dtype is jnp.int8
        if layout == "unrolled":
            return CacheLayout.UNROLLED_INT8 if int8 else CacheLayout.UNROLLED
        if layout == "stacked":
            if int8:
                raise ValueError("stacked layout override is bf16-only")
            return CacheLayout.STACKED
        if layout is not None:
            raise ValueError(f"unknown cache layout {layout!r}")
        unrolled_params = isinstance(self.params.get("layers"), (list, tuple))
        megacall = (("layers_stacked" in self.params
                     and _config.stack_decode())
                    or ("layers_tape" in self.params
                        and _config.tape_decode()))
        if int8:
            # megacalls are bf16-cache-only; int8 follows the params layout
            return (CacheLayout.UNROLLED_INT8 if unrolled_params
                    else CacheLayout.STACKED_INT8)
        if megacall or not unrolled_params or _config.kv_stack():
            return CacheLayout.STACKED
        return CacheLayout.UNROLLED

    def init_cache(self, batch: int, dtype=jnp.bfloat16,
                   layout: str | None = None) -> dict:
        """KV cache in the layout chosen by `cache_layout` (the single
        chooser; see ARCHITECTURE.md decision table).

        dtype="int8" builds the block-quantized cache (~3.6x smaller;
        ref: QuantizedKVCache, quant.zig:645-910). layout overrides:
        "unrolled" forces the per-layer list (serving/cp paths), "stacked"
        forces the [L, ...] array (bf16 only; the fused decode path then
        batches all layers' writes into 2 DUS/step).
        """
        c = self.cfg
        lay = self.cache_layout(dtype, layout)
        if lay is CacheLayout.STACKED:
            full = (c.n_layers, batch, c.n_kv_heads, c.max_seq_len,
                    c.head_dim)
            dt = jnp.bfloat16 if dtype in ("int8", jnp.int8) else dtype
            return {"k": jnp.zeros(full, dt), "v": jnp.zeros(full, dt)}
        if lay is CacheLayout.UNROLLED:
            shape = (batch, c.n_kv_heads, c.max_seq_len, c.head_dim)
            return {"k": [jnp.zeros(shape, dtype) for _ in range(c.n_layers)],
                    "v": [jnp.zeros(shape, dtype) for _ in range(c.n_layers)]}
        if lay is CacheLayout.STACKED_INT8:
            # one stacked [L, ...] leaf pair per cache; the lax.scan over
            # layers slices each layer's (q, scales) tuple
            qs = (c.n_layers, batch, c.n_kv_heads, c.head_dim, c.max_seq_len)
            ss = (c.n_layers, batch, c.n_kv_heads, c.max_seq_len)
            return {"k": (jnp.zeros(qs, jnp.int8), jnp.ones(ss, jnp.float32)),
                    "v": (jnp.zeros(qs, jnp.int8), jnp.ones(ss, jnp.float32))}
        from zgml_tpu.quant.kv_cache import init_quant_cache
        qc = init_quant_cache(c.n_layers, batch, c.n_kv_heads,
                              c.max_seq_len, c.head_dim)
        return {"k": [(kq, ks) for kq, ks in zip(qc["k_q"], qc["k_s"])],
                "v": [(vq, vs) for vq, vs in zip(qc["v_q"], qc["v_s"])]}

    # -- forward ------------------------------------------------------------
    def forward(self, params, tokens, cache, pos, tp_axis: str | None = None,
                tp_size: int = 1, cache_row=None, write_pos=None,
                greedy_head: bool = False):
        """tokens [B, T] int32, pos: scalar int32 start position.

        Returns (logits [B, T, V] f32, new_cache). kv_len = pos + T.
        With tp_axis set (inside shard_map) params' projection weights and the
        cache hold per-device shards; logits come back full (lm_head
        column-sharded + all_gather over vocab shards).
        cache_row: tokens are batch-1 but `cache` is a larger shared slab;
        read/write only batch entry cache_row (serving prefill-into-slot).
        greedy_head: return (next_token [B] int32, cache) instead of logits
        — the greedy decode tail fused into the lm_head kernel (_head_out).
        """
        cfg = self.cfg
        b, t = tokens.shape
        # layout compatibility gate (clear error instead of a shape crash
        # deep inside scan/DUS — the round-4 regression class)
        lay = cache_layout_of(cache)
        unrolled_params = isinstance(params.get("layers"), (list, tuple))
        if (lay in (CacheLayout.UNROLLED, CacheLayout.UNROLLED_INT8)
                and not unrolled_params):
            raise ValueError(
                f"cache layout {lay.value} requires unrolled (per-layer "
                "list) params, but params use the stacked scan layout; "
                "rebuild with model.init_cache() (see ARCHITECTURE.md "
                "'KV-cache layouts')")
        if lay is CacheLayout.STACKED_INT8 and unrolled_params:
            raise ValueError(
                "stacked int8 cache requires scan-layout params; unrolled "
                "models use the per-layer int8 list — rebuild with "
                "model.init_cache(batch, 'int8') (see ARCHITECTURE.md)")
        x = jnp.take(params["tok_embd"], tokens, axis=0)   # [B, T, D]
        if getattr(pos, "ndim", 0) == 1:
            # per-row positions (continuous batching; decode only, T == 1)
            assert t == 1, "per-row pos requires single-token decode"
            cos, sin = refs.rope_cos_sin(pos, cfg.head_dim, cfg.rope_base)
            cos = cos[:, None, None, :]     # [B,1,1,half] vs q [B,H,1,d]
            sin = sin[:, None, None, :]
        else:
            positions = pos + jnp.arange(t)
            cos, sin = refs.rope_cos_sin(positions, cfg.head_dim, cfg.rope_base)
        kv_len = pos + t
        decode = t == 1

        stacked = params.get("layers_stacked")
        tape = params.get("layers_tape")
        # a stacked-ARRAY cache with unrolled per-layer weights (the
        # ZGML_TPU_KV_STACK fused-decode layout) also routes here
        stacked_cache = (not isinstance(cache["k"], (list, tuple))
                         and getattr(cache["k"], "ndim", 0) == 5
                         and isinstance(params.get("layers"), (list, tuple)))
        if ((stacked is not None or tape is not None or stacked_cache)
                and tp_axis is None and cache_row is None
                and write_pos is None and getattr(pos, "ndim", 0) == 0
                and not isinstance(cache["k"], (list, tuple))):
            from zgml_tpu import config as _config
            ck, cv = cache["k"], cache["v"]          # [L, B, Hkv, S, d]
            if (decode and b == 1 and tape is not None
                    and _config.tape_decode()
                    and ops.use_pallas("tape_decode")
                    and not isinstance(ck, tuple)):
                # whole stack in ONE Pallas call: all weights stream through
                # one manually-DMA'd VMEM window (ops/tapekernel.py)
                from zgml_tpu.ops.tapekernel import tape_decode_step
                from zgml_tpu.runtime.profile import global_profile
                global_profile.count_op("tape_decode", "pallas")
                x, ck, cv = tape_decode_step(cfg, tape, x, ck, cv,
                                             pos, cos, sin)
            elif (decode and b == 1 and stacked is not None
                    and _config.stack_decode()
                    and ops.use_pallas("stack_decode")
                    and not isinstance(ck, tuple)):
                # the whole layer stack in ONE Pallas call per token
                from zgml_tpu.ops.stackkernel import stacked_decode_step
                x, ck, cv = stacked_decode_step(cfg, stacked, x, ck, cv,
                                                pos, cos, sin)
            else:
                from zgml_tpu.ops.layerkernel import (attn_block_compatible,
                                                      attn_block_enabled,
                                                      attn_block_step)
                layers_u = params["layers"]
                fused = (decode and b == 1 and not isinstance(ck, tuple)
                         and isinstance(layers_u, (list, tuple))
                         and attn_block_enabled()
                         and ops.use_pallas("attn_block")
                         and all(attn_block_compatible(l, cfg, ck)
                                 for l in layers_u))
                if fused:
                    # fused per-layer kernels READING the stacked cache
                    # through scalar-prefetch slab index maps (no per-layer
                    # slice: a slice feeding a custom call materializes);
                    # all layers' K/V then batch into TWO
                    # dynamic_update_slices per step — the 2-per-layer
                    # unrolled writes measured ~386us/token at 7B
                    # (tools/exp_scan.py fit/no-carry/carry decomposition)
                    from zgml_tpu.runtime.profile import global_profile
                    half = cos.shape[-1]
                    c2 = jnp.concatenate([cos, cos], -1).reshape(1, 2 * half)
                    s2 = jnp.concatenate([-sin, sin], -1).reshape(1, 2 * half)
                    kcurs, vcurs = [], []
                    for li, layer in enumerate(layers_u):
                        global_profile.count_op("attn_block", "pallas")
                        x2, k_cur, v_cur, did_ffn, _, _ = attn_block_step(
                            cfg, layer, x, ck, cv, pos, c2, s2, kv_layer=li)
                        x = x2.astype(x.dtype)
                        kcurs.append(k_cur)
                        vcurs.append(v_cur)
                        if not did_ffn:
                            x = _ffn_after_attn(cfg, layer, x, None
                                                ).astype(x.dtype)
                    kst = jnp.stack(kcurs)           # [L, 1, hkv, 1, hd]
                    vst = jnp.stack(vcurs)
                    ck = jax.lax.dynamic_update_slice(
                        ck, kst.astype(ck.dtype), (0, 0, 0, pos, 0))
                    cv = jax.lax.dynamic_update_slice(
                        cv, vst.astype(cv.dtype), (0, 0, 0, pos, 0))
                else:
                    # per-layer kernels against the stacked cache: flash
                    # reads batch row kv_row = layer (the serving slot
                    # mechanism reused as a layer index), writes are
                    # static-index in-place updates
                    for li, layer in enumerate(params["layers"]):
                        x, ck, cv = _layer_step(cfg, x, layer, ck, cv, pos,
                                                kv_len, cos, sin, decode,
                                                kv_layer=li)
            out = _head_out(cfg, params, x, None, greedy_head)
            return out, {"k": ck, "v": cv}

        layers = params["layers"]
        if isinstance(layers, (list, tuple)):
            # unrolled: weights feed the Pallas kernels directly with no
            # per-step gather/copy (a scan would dynamic-slice each layer's
            # weights, and slices feeding a custom call must materialize —
            # tripling weight traffic). Cache is per-layer lists so donation
            # aliases each leaf with no re-stack copies. Inference default.
            ks, vs = [], []
            for i, layer in enumerate(layers):
                x, ck, cv = _layer_step(cfg, x, layer, cache["k"][i],
                                        cache["v"][i], pos, kv_len, cos, sin,
                                        decode, tp_axis, tp_size, cache_row,
                                        write_pos)
                ks.append(ck)
                vs.append(cv)
            new_k, new_v = ks, vs
        else:
            # stacked + lax.scan: one compiled block regardless of depth.
            # Training/dryrun default (compile time over per-step perf).
            def body(x_carry, layer_and_cache):
                layer, ck, cv = layer_and_cache
                x_out, ck, cv = _layer_step(cfg, x_carry, layer, ck, cv, pos,
                                            kv_len, cos, sin, decode,
                                            tp_axis, tp_size, cache_row,
                                            write_pos)
                return x_out, (ck, cv)

            x, (new_k, new_v) = jax.lax.scan(
                body, x, (layers, cache["k"], cache["v"]))

        out = _head_out(cfg, params, x, tp_axis, greedy_head)
        return out, {"k": new_k, "v": new_v}
