"""Fused dequant + matmul Pallas kernels for Q8_0 / Q4_0 planar K-major weights.

The north-star kernel (BASELINE.json): packed integer blocks stream from HBM into
VMEM, dequantize in-register on the VPU, and feed the MXU — the weight matrix is
never materialized in f32 in HBM. Semantics match zgml's quantized matmul
(src/quant.zig:475-578 int8 matmul, :347-440 SDOT GEMV) with the layout redesigned
for TPU (see zgml_tpu/quant/repack.py).

Grid: (N//BN, K//BK) with K innermost so each [M, BN] output tile accumulates
across K steps in VMEM (revisiting pattern). Scales broadcast along the sublane
(K) axis only — never across the 128-wide lane axis.

For Q4_0 the packed array holds K-halves (lo nibble = k, hi nibble = k + K/2), so
the activation is fed twice per K-step with two index maps (x_lo at k, x_hi at
k + K/2), keeping the unpack branch-free elementwise bit math.
"""
from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zgml_tpu.quant.blocks import QK
from zgml_tpu.quant.repack import PackedWeight

from zgml_tpu import config
from zgml_tpu.ops.scalecodec import kscale_f32


def _interpret() -> bool:
    return config.interpret()


def _expand_scales(s, block=QK):
    """[BK//32, BN] -> [BK, BN] f32 by sublane-axis repeat (cheap relayout on
    TPU); decodes f16-bit (int16) scale storage first (ops/scalecodec.py)."""
    return jnp.repeat(kscale_f32(s), block, axis=0)


# -- Q8_0 ---------------------------------------------------------------------

def _q8_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_k: int, out_dtype,
               dot_bf16: bool = False):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = q_ref[:].astype(jnp.float32) * _expand_scales(s_ref[:])
    if dot_bf16:
        # prefill (large M) is MXU-bound: f32 x f32 runs the MXU at 1/4 rate;
        # bf16 operands with f32 accumulation are the native fast path (the
        # rounding is far below the Q4/Q8 quantization error)
        acc_ref[:] += jnp.dot(x_ref[:].astype(jnp.bfloat16),
                              w.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
    else:
        acc_ref[:] += jnp.dot(x_ref[:], w,
                              preferred_element_type=jnp.float32)

    @pl.when(kb == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "out_dtype",
                                             "dot_bf16"))
def _q8_matmul(x, qvals, scales, *, bm: int, bn: int, bk: int, out_dtype,
               dot_bf16: bool = False):
    m, k_pad = x.shape
    _, n_pad = qvals.shape
    n_k = k_pad // bk
    grid = (m // bm, n_pad // bn, n_k)
    return pl.pallas_call(
        functools.partial(_q8_kernel, n_k=n_k, out_dtype=out_dtype,
                          dot_bf16=dot_bf16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda mb, nb, kb: (mb, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda mb, nb, kb: (kb, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // QK, bn), lambda mb, nb, kb: (kb, nb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mb, nb, kb: (mb, nb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=_interpret(),
    )(x, qvals, scales)


# -- Q4_0 ---------------------------------------------------------------------

def _q4_kernel(xlo_ref, xhi_ref, q_ref, slo_ref, shi_ref, o_ref, acc_ref,
               *, n_k: int, out_dtype, dot_bf16: bool = False):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    v = q_ref[:].astype(jnp.int32)
    wlo = ((v & 15) - 8).astype(jnp.float32) * _expand_scales(slo_ref[:])
    whi = (((v >> 4) & 15) - 8).astype(jnp.float32) * _expand_scales(shi_ref[:])
    if dot_bf16:
        acc_ref[:] += (
            jnp.dot(xlo_ref[:].astype(jnp.bfloat16),
                    wlo.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
            + jnp.dot(xhi_ref[:].astype(jnp.bfloat16),
                      whi.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32))
    else:
        acc_ref[:] += (
            jnp.dot(xlo_ref[:], wlo, preferred_element_type=jnp.float32)
            + jnp.dot(xhi_ref[:], whi, preferred_element_type=jnp.float32))

    @pl.when(kb == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "out_dtype",
                                             "dot_bf16"))
def _q4_matmul(x, qvals, scales, *, bm: int, bn: int, bk: int, out_dtype,
               dot_bf16: bool = False):
    """bk is the *packed* K tile (covers 2*bk logical K per step)."""
    m, k_pad = x.shape
    kh, n_pad = qvals.shape          # kh = k_pad // 2
    n_k = kh // bk
    grid = (m // bm, n_pad // bn, n_k)
    return pl.pallas_call(
        functools.partial(_q4_kernel, n_k=n_k, out_dtype=out_dtype,
                          dot_bf16=dot_bf16),
        grid=grid,
        in_specs=[
            # x low half: k in [kb*bk, kb*bk+bk)
            pl.BlockSpec((bm, bk), lambda mb, nb, kb: (mb, kb),
                         memory_space=pltpu.VMEM),
            # x high half: k in [k_pad/2 + kb*bk, ...)
            pl.BlockSpec((bm, bk), lambda mb, nb, kb: (mb, kb + n_k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda mb, nb, kb: (kb, nb),
                         memory_space=pltpu.VMEM),
            # scales, low half rows then high half rows
            pl.BlockSpec((bk // QK, bn), lambda mb, nb, kb: (kb, nb),
                         memory_space=pltpu.VMEM),
            # high-half scale rows start at block index n_k (= kh/bk blocks in)
            pl.BlockSpec((bk // QK, bn), lambda mb, nb, kb: (kb + n_k, nb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mb, nb, kb: (mb, nb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=_interpret(),
    )(x, x, qvals, scales, scales)


# -- int8-dot tier (the ggml vec_dot_q*_0_q8 analog, on the MXU) --------------
#
# Decode GEMV is bottlenecked by the per-element VPU dequant, not HBM
# (measured: a 4-projection 7B layer chain sustains ~220 GB/s against a
# 614 GB/s stream ceiling, consistent with ~2 Tops of VPU unpack work).
# Fix = ggml's fix (ggml vec_dot_q4_0_q8_0; ref quant.zig:358-440 SDOT):
# quantize the activations per 32-block to int8 once per token, contract
# int8 x int8 in per-block segments on the MXU (batched dots, K=32), and
# apply the per-block scale product to the int32 partials — per-element VPU
# work drops from ~6 ops (convert+sub+scale) to <1 (one fused
# multiply-reduce over the 32x-smaller partials tensor).

def _quantize_act(x):
    """[m, k] f32 -> (int8 [m, k], scales f32 [m, k//QK]); Q8_1-style
    per-32-block absmax (runs outside the kernel; XLA fuses it)."""
    m, k = x.shape
    xb = x.reshape(m, k // QK, QK)
    amax = jnp.max(jnp.abs(xb), axis=-1)
    s = amax / 127.0
    inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    q = jnp.clip(jnp.round(xb * inv[..., None]), -127, 127).astype(jnp.int8)
    return q.reshape(m, k), s


def _block_dot(xqb, xs_t, wqb, ws):
    """Segmented int8 dot: xqb [nbk, bm, 32] i8 (pre-blocked activations),
    xs_t [nbk, bm] f32, wqb [nbk, 32, bn] i8 (pre-blocked weights),
    ws [nbk, bn] f32 -> [bm, bn] f32 partial.

    All blocking happens OUTSIDE the kernel (free layout-preserving reshapes
    at the jnp level) — Mosaic cannot shape-cast int8 vectors in-kernel."""
    p = jax.lax.dot_general(
        xqb, wqb, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)                # [nbk, bm, bn]
    scale = xs_t[:, :, None] * kscale_f32(ws)[:, None, :]   # [nbk, bm, bn]
    return jnp.sum(p.astype(jnp.float32) * scale, axis=0)


def _q8_i8_kernel(xq_ref, xs_ref, q_ref, s_ref, o_ref, acc_ref,
                  *, n_k: int, out_dtype):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += _block_dot(xq_ref[:], xs_ref[:], q_ref[:], s_ref[:])

    @pl.when(kb == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "out_dtype"))
def _q8_matmul_i8(x, qvals, scales, *, bm: int, bn: int, bk: int, out_dtype):
    m, k_pad = x.shape
    _, n_pad = qvals.shape
    n_k = k_pad // bk
    nbk = bk // QK
    xq, xs = _quantize_act(x)
    xq_t = xq.reshape(m, k_pad // QK, QK).transpose(1, 0, 2)  # [K/32, m, 32]
    xs_t = xs.T                                               # [K/32, m]
    wq3 = qvals.reshape(k_pad // QK, QK, n_pad)     # layout-preserving view
    grid = (m // bm, n_pad // bn, n_k)
    return pl.pallas_call(
        functools.partial(_q8_i8_kernel, n_k=n_k, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nbk, bm, QK), lambda mb, nb, kb: (kb, mb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, m), lambda mb, nb, kb: (kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, QK, bn), lambda mb, nb, kb: (kb, 0, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, bn), lambda mb, nb, kb: (kb, nb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mb, nb, kb: (mb, nb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=_interpret(),
    )(xq_t, xs_t, wq3, scales)


def _q4_i8_kernel(xqlo_ref, xqhi_ref, xslo_ref, xshi_ref,
                  sumlo_ref, sumhi_ref, q_ref,
                  slo_ref, shi_ref, o_ref, acc_ref, *, n_k: int, out_dtype):
    """Nibble -8 offset is FOLDED OUT: sum_j (q_j - 8)*x_j =
    (sum_j q_j*x_j) - 8*(sum_j x_j), with the per-block activation sums
    precomputed outside — Mosaic has no int8 vector subtract, and this also
    removes a per-element op. The 8*xsum correction is one tiny MXU matmul
    [bm, nbk] @ [nbk, bn] per chunk."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # SWAR nibble unpack: int8 vector arith is not legalizable on Mosaic, so
    # bitcast 4 packed bytes into one i32 lane and do ONE shift+mask per 4
    # bytes (~0.4 VPU ops per packed byte); bitcast back restores positions
    v32 = pltpu.bitcast(q_ref[:], jnp.int32)
    mask = jnp.full(v32.shape, 0x0F0F0F0F, jnp.int32)
    wlo = pltpu.bitcast(v32 & mask, jnp.int8)           # unsigned nibbles
    whi = pltpu.bitcast(
        jax.lax.shift_right_logical(v32, jnp.full(v32.shape, 4, jnp.int32))
        & mask, jnp.int8)
    part = (_block_dot(xqlo_ref[:], xslo_ref[:], wlo, slo_ref[:])
            + _block_dot(xqhi_ref[:], xshi_ref[:], whi, shi_ref[:]))
    # -8 correction: [bm, nbk] @ [nbk, bn] over (8 * xs * xblocksum) vs ws
    alo = (xslo_ref[:] * sumlo_ref[:].astype(jnp.float32) * 8.0).T
    ahi = (xshi_ref[:] * sumhi_ref[:].astype(jnp.float32) * 8.0).T
    corr = (jnp.dot(alo, kscale_f32(slo_ref[:]),
                    preferred_element_type=jnp.float32)
            + jnp.dot(ahi, kscale_f32(shi_ref[:]),
                      preferred_element_type=jnp.float32))
    acc_ref[:] += part - corr

    @pl.when(kb == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "out_dtype"))
def _q4_matmul_i8(x, qvals, scales, *, bm: int, bn: int, bk: int, out_dtype):
    """bk is the *packed* K tile (covers 2*bk logical K per step)."""
    m, k_pad = x.shape
    kh, n_pad = qvals.shape          # kh = k_pad // 2
    n_k = kh // bk
    nbk = bk // QK
    xq, xs = _quantize_act(x)
    xq_t = xq.reshape(m, k_pad // QK, QK).transpose(1, 0, 2)  # [K/32, m, 32]
    xs_t = xs.T                                               # [K/32, m]
    xsum_t = jnp.sum(xq_t.astype(jnp.int32), axis=2)          # [K/32, m]
    wq3 = qvals.reshape(kh // QK, QK, n_pad)        # layout-preserving view
    grid = (m // bm, n_pad // bn, n_k)
    return pl.pallas_call(
        functools.partial(_q4_i8_kernel, n_k=n_k, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nbk, bm, QK), lambda mb, nb, kb: (kb, mb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, bm, QK), lambda mb, nb, kb: (kb + n_k, mb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, m), lambda mb, nb, kb: (kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, m), lambda mb, nb, kb: (kb + n_k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, m), lambda mb, nb, kb: (kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, m), lambda mb, nb, kb: (kb + n_k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, QK, bn), lambda mb, nb, kb: (kb, 0, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, bn), lambda mb, nb, kb: (kb, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, bn), lambda mb, nb, kb: (kb + n_k, nb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mb, nb, kb: (mb, nb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=_interpret(),
    )(xq_t, xq_t, xs_t, xs_t, xsum_t, xsum_t, wq3, scales, scales)


def _i8dot_enabled() -> bool:
    """ggml-parity int8-activation dots; ZGML_TPU_I8DOT=0 restores the
    f32-dequant kernels (A/B + accuracy comparisons)."""
    return config.i8dot()


# -- fused greedy head: GEMV + in-kernel running argmax -----------------------
#
# The decode tail (out_norm -> lm_head -> logits [1, V] -> argmax -> next
# token) is fully serialized against the next step's first layer — nothing
# can overlap it (round-5 measurement: cutting the logits dependency saved
# 313us/token at 7B). This kernel removes the logits materialization + the
# separate XLA argmax pass + one kernel launch from that critical path: the
# same int8-dot GEMV keeps a running (max, argmax) pair in VMEM across N
# tiles and emits ONE int32 token id. Accumulation order matches the plain
# i8 GEMV bit-for-bit (same _block_dot, same tiles), so the token equals
# argmax(qmatmul(x, w)) exactly, first-occurrence ties included.

def _argmax_epilogue(acc_ref, mx_ref, ix_ref, o_ref, *, nb, kb, n_k, n_n,
                     bn, n_valid):
    @pl.when((nb == 0) & (kb == 0))
    def _():
        mx_ref[:] = jnp.full_like(mx_ref, -jnp.inf)
        ix_ref[:] = jnp.zeros_like(ix_ref)

    @pl.when(kb == n_k - 1)
    def _():
        t = acc_ref[0:1, :]                                    # row 0 live
        col = jax.lax.broadcasted_iota(jnp.int32, (1, bn), 1) + nb * bn
        t = jnp.where(col < n_valid, t, -jnp.inf)              # mask pad cols
        m_t = jnp.max(t, axis=1, keepdims=True)                # [1, 1]
        i_t = jnp.min(jnp.where(t >= m_t, col, jnp.int32(2 ** 30)),
                      axis=1, keepdims=True)
        run_m = mx_ref[:1, :1]
        better = m_t > run_m                                   # strict: ties
        new_m = jnp.where(better, m_t, run_m)                  # keep earliest
        new_i = jnp.where(better, i_t, ix_ref[:1, :1])
        mx_ref[:] = jnp.broadcast_to(new_m, mx_ref.shape)
        ix_ref[:] = jnp.broadcast_to(new_i, ix_ref.shape)

    @pl.when((nb == n_n - 1) & (kb == n_k - 1))
    def _():
        o_ref[:] = ix_ref[:]


def _q8_i8_argmax_kernel(xq_ref, xs_ref, q_ref, s_ref, o_ref,
                         acc_ref, mx_ref, ix_ref, *, n_k, n_n, bn, n_valid):
    nb, kb = pl.program_id(1), pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += _block_dot(xq_ref[:], xs_ref[:], q_ref[:], s_ref[:])
    _argmax_epilogue(acc_ref, mx_ref, ix_ref, o_ref, nb=nb, kb=kb, n_k=n_k,
                     n_n=n_n, bn=bn, n_valid=n_valid)


def _q4_i8_argmax_kernel(xqlo_ref, xqhi_ref, xslo_ref, xshi_ref,
                         sumlo_ref, sumhi_ref, q_ref, slo_ref, shi_ref,
                         o_ref, acc_ref, mx_ref, ix_ref,
                         *, n_k, n_n, bn, n_valid):
    nb, kb = pl.program_id(1), pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    v32 = pltpu.bitcast(q_ref[:], jnp.int32)
    mask = jnp.full(v32.shape, 0x0F0F0F0F, jnp.int32)
    wlo = pltpu.bitcast(v32 & mask, jnp.int8)
    whi = pltpu.bitcast(
        jax.lax.shift_right_logical(v32, jnp.full(v32.shape, 4, jnp.int32))
        & mask, jnp.int8)
    part = (_block_dot(xqlo_ref[:], xslo_ref[:], wlo, slo_ref[:])
            + _block_dot(xqhi_ref[:], xshi_ref[:], whi, shi_ref[:]))
    alo = (xslo_ref[:] * sumlo_ref[:].astype(jnp.float32) * 8.0).T
    ahi = (xshi_ref[:] * sumhi_ref[:].astype(jnp.float32) * 8.0).T
    corr = (jnp.dot(alo, kscale_f32(slo_ref[:]),
                    preferred_element_type=jnp.float32)
            + jnp.dot(ahi, kscale_f32(shi_ref[:]),
                      preferred_element_type=jnp.float32))
    acc_ref[:] += part - corr
    _argmax_epilogue(acc_ref, mx_ref, ix_ref, o_ref, nb=nb, kb=kb, n_k=n_k,
                     n_n=n_n, bn=bn, n_valid=n_valid)


@functools.partial(jax.jit, static_argnames=("kind", "bn", "bk", "n_valid"))
def _qmatmul_i8_argmax(x, qvals, scales, *, kind, bn, bk, n_valid):
    """x [m_pad, k_pad] f32 (row 0 live) -> int32 [1, 128] (argmax id,
    replicated across lanes)."""
    m, k_pad = x.shape
    kh, n_pad = qvals.shape
    n_k = kh // bk
    n_n = n_pad // bn
    nbk = bk // QK
    xq, xs = _quantize_act(x)
    xq_t = xq.reshape(m, k_pad // QK, QK).transpose(1, 0, 2)
    xs_t = xs.T
    wq3 = qvals.reshape(kh // QK, QK, n_pad)
    scratch = [pltpu.VMEM((m, bn), jnp.float32),
               pltpu.VMEM((1, 128), jnp.float32),
               pltpu.VMEM((1, 128), jnp.int32)]
    out_specs = pl.BlockSpec((1, 128), lambda mb, nb, kb: (0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((1, 128), jnp.int32)
    if kind == "q8_0":
        return pl.pallas_call(
            functools.partial(_q8_i8_argmax_kernel, n_k=n_k, n_n=n_n,
                              bn=bn, n_valid=n_valid),
            grid=(1, n_n, n_k),
            in_specs=[
                pl.BlockSpec((nbk, m, QK), lambda mb, nb, kb: (kb, mb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nbk, m), lambda mb, nb, kb: (kb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nbk, QK, bn), lambda mb, nb, kb: (kb, 0, nb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nbk, bn), lambda mb, nb, kb: (kb, nb),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs, out_shape=out_shape,
            scratch_shapes=scratch, interpret=_interpret(),
        )(xq_t, xs_t, wq3, scales)
    xsum_t = jnp.sum(xq_t.astype(jnp.int32), axis=2)
    return pl.pallas_call(
        functools.partial(_q4_i8_argmax_kernel, n_k=n_k, n_n=n_n,
                          bn=bn, n_valid=n_valid),
        grid=(1, n_n, n_k),
        in_specs=[
            pl.BlockSpec((nbk, m, QK), lambda mb, nb, kb: (kb, mb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, m, QK), lambda mb, nb, kb: (kb + n_k, mb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, m), lambda mb, nb, kb: (kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, m), lambda mb, nb, kb: (kb + n_k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, m), lambda mb, nb, kb: (kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, m), lambda mb, nb, kb: (kb + n_k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, QK, bn), lambda mb, nb, kb: (kb, 0, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, bn), lambda mb, nb, kb: (kb, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, bn), lambda mb, nb, kb: (kb + n_k, nb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=scratch, interpret=_interpret(),
    )(xq_t, xq_t, xs_t, xs_t, xsum_t, xsum_t, wq3, scales, scales)


def qmatmul_greedy_pallas(x: jax.Array, pw: PackedWeight):
    """argmax_n(x @ dequant(W)) for a single live row — the fused decode
    tail. x [..., K] with prod(leading) == 1. Returns int32 [1] (token id),
    or None when the fused path doesn't apply (caller falls back to
    qmatmul + argmax)."""
    lead = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
    if lead != 1 or pw.kind not in ("q8_0", "q4_0") or not _i8dot_enabled():
        return None
    k = x.shape[-1]
    x2 = x.reshape(1, k).astype(jnp.float32)
    x2 = jnp.pad(x2, ((0, 7), (0, pw.k_pad - k)))
    k_eff = pw.k_pad if pw.kind == "q8_0" else pw.k_pad // 2
    bn, bk = _i8_tiles(pw.kind, 8, k_eff, pw.n_pad)
    out = _qmatmul_i8_argmax(x2, pw.qvals, pw.scales, kind=pw.kind,
                             bn=bn, bk=bk, n_valid=pw.n)
    return out[0, :1]


# -- backward (transposed dequant-matmul) kernels -----------------------------
#
# dx = dy @ dequant(W)^T, with the weight still streamed packed from HBM and
# dequantized in VMEM — training never materializes the f32 weight either.
# The quantized weight itself is frozen (zero cotangent), matching the
# reference where quantized tensors are inference-side constants
# (ref: src/quant.zig:200-630 — no backward exists for quantized mats).

def _q8_bwd_kernel(g_ref, q_ref, s_ref, dx_ref, acc_ref, *, n_n: int):
    nb = pl.program_id(2)

    @pl.when(nb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = q_ref[:].astype(jnp.float32) * _expand_scales(s_ref[:])   # [bk, bn]
    # dy [bm, bn] contract lanes with w [bk, bn] -> [bm, bk]
    acc_ref[:] += jax.lax.dot_general(
        g_ref[:], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(nb == n_n - 1)
    def _():
        dx_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def _q8_matmul_bwd(g, qvals, scales, *, bm: int, bn: int, bk: int):
    m, n_pad = g.shape
    k_pad, _ = qvals.shape
    n_n = n_pad // bn
    grid = (m // bm, k_pad // bk, n_n)
    return pl.pallas_call(
        functools.partial(_q8_bwd_kernel, n_n=n_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bn), lambda mb, kb, nb: (mb, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda mb, kb, nb: (kb, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // QK, bn), lambda mb, kb, nb: (kb, nb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bk), lambda mb, kb, nb: (mb, kb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, k_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bk), jnp.float32)],
        interpret=_interpret(),
    )(g, qvals, scales)


def _q4_bwd_kernel(g_ref, q_ref, slo_ref, shi_ref, dlo_ref, dhi_ref,
                   alo_ref, ahi_ref, *, n_n: int):
    nb = pl.program_id(2)

    @pl.when(nb == 0)
    def _():
        alo_ref[:] = jnp.zeros_like(alo_ref)
        ahi_ref[:] = jnp.zeros_like(ahi_ref)

    v = q_ref[:].astype(jnp.int32)
    wlo = ((v & 15) - 8).astype(jnp.float32) * _expand_scales(slo_ref[:])
    whi = (((v >> 4) & 15) - 8).astype(jnp.float32) * _expand_scales(shi_ref[:])
    dn = (((1,), (1,)), ((), ()))
    alo_ref[:] += jax.lax.dot_general(g_ref[:], wlo, dn,
                                      preferred_element_type=jnp.float32)
    ahi_ref[:] += jax.lax.dot_general(g_ref[:], whi, dn,
                                      preferred_element_type=jnp.float32)

    @pl.when(nb == n_n - 1)
    def _():
        dlo_ref[:] = alo_ref[:]
        dhi_ref[:] = ahi_ref[:]


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def _q4_matmul_bwd(g, qvals, scales, *, bm: int, bn: int, bk: int):
    """Returns dx [m, k_pad] (lo-half columns then hi-half, matching the
    planar half-split logical order k = [0, kh) ++ [kh, 2kh))."""
    m, n_pad = g.shape
    kh, _ = qvals.shape
    n_n = n_pad // bn
    n_k = kh // bk
    grid = (m // bm, n_k, n_n)
    dlo, dhi = pl.pallas_call(
        functools.partial(_q4_bwd_kernel, n_n=n_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bn), lambda mb, kb, nb: (mb, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda mb, kb, nb: (kb, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // QK, bn), lambda mb, kb, nb: (kb, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // QK, bn), lambda mb, kb, nb: (kb + n_k, nb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, bk), lambda mb, kb, nb: (mb, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk), lambda mb, kb, nb: (mb, kb),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((m, kh), jnp.float32),
                   jax.ShapeDtypeStruct((m, kh), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((bm, bk), jnp.float32),
                        pltpu.VMEM((bm, bk), jnp.float32)],
        interpret=_interpret(),
    )(g, qvals, scales, scales)
    return jnp.concatenate([dlo, dhi], axis=1)


# -- differentiable wrapper ----------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _qmm_diff(meta, x2, qvals, scales):
    """Padded quantized matmul with a Pallas backward for dx.

    meta = (kind, bm, bn, bk, out_dtype_name). The weight leaves get zero
    cotangents: quantized weights are frozen constants in any training
    configuration (QLoRA-style); differentiating through the rounding is
    meaningless.
    """
    kind, bm, bn, bk, out_dtype = meta
    # the int8-dot tier runs when the whole M fits one small tile (decode /
    # small serving batch — exactly where per-element dequant is the
    # bottleneck). Its [nbk, bm, bn] int32 partials live in VMEM (16 MB), so
    # bm is capped at 32; large-M prefill amortizes dequant over rows and
    # runs the dequant tier with bf16 MXU operands (f32 runs at 1/4 rate;
    # ZGML_TPU_PREFILL_BF16=0 restores f32 dots).
    use_i8 = _i8dot_enabled() and bm == x2.shape[0] and bm <= 32
    if use_i8:
        f = _q8_matmul_i8 if kind == "q8_0" else _q4_matmul_i8
        return f(x2, qvals, scales, bm=bm, bn=bn, bk=bk,
                 out_dtype=np.dtype(out_dtype))
    bf16_ok = (bm >= 32
               and config.prefill_bf16())
    f = _q8_matmul if kind == "q8_0" else _q4_matmul
    return f(x2, qvals, scales, bm=bm, bn=bn, bk=bk,
             out_dtype=np.dtype(out_dtype), dot_bf16=bf16_ok)


def _qmm_diff_fwd(meta, x2, qvals, scales):
    return _qmm_diff(meta, x2, qvals, scales), (qvals, scales)


def _qmm_diff_bwd(meta, res, g):
    kind, bm, bn, bk, _ = meta
    qvals, scales = res
    g = g.astype(jnp.float32)
    m, n_pad = g.shape
    bm_eff = m if m <= 512 else _choose_tile(m, 256, mult=8)
    bn_eff = _choose_tile(n_pad, 512, mult=256)
    if kind == "q8_0":
        bk_eff = _choose_tile(qvals.shape[0], 512, mult=256)
        dx = _q8_matmul_bwd(g, qvals, scales, bm=bm_eff, bn=bn_eff, bk=bk_eff)
    else:
        bk_eff = _choose_tile(qvals.shape[0], 512, mult=256)
        dx = _q4_matmul_bwd(g, qvals, scales, bm=bm_eff, bn=bn_eff, bk=bk_eff)
    return (dx,
            np.zeros(qvals.shape, jax.dtypes.float0),
            jnp.zeros_like(scales))


_qmm_diff.defvjp(_qmm_diff_fwd, _qmm_diff_bwd)


# -- public wrapper -----------------------------------------------------------

def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _i8_tiles(kind: str, m_pad: int, k_eff: int, n_pad: int,
              budget: int = 8 << 20) -> tuple[int, int]:
    """(bn, bk) for the int8-dot tier: PREFER WIDE column blocks.

    The weight array is K-major [k, n]; a [bk, bn] block DMAs as k rows of
    bn-byte runs, so bn IS the HBM run length — and each grid step pays a
    fixed ~0.5-2us (measured: a [2048x2560] wqkv at bn=640 ran at 107 GB/s
    vs ~600 for wide-block weights). Maximize bn (full row = one contiguous
    run) subject to VMEM: double-buffered weight block + the int32 partials
    tensor [bk/32, bm, bn] (x2 for the q4 half-split's two partial sets)."""
    halves = 2 if kind == "q4_0" else 1
    bn = n_pad
    while bn >= 128:
        bn = _choose_tile(n_pad, bn, 128)
        for bk_lim in (1024, 512, 256):
            bk = _choose_tile(k_eff, bk_lim, 256)
            cost = (2 * bk * bn                     # weight double-buffer
                    + (bk // QK) * m_pad * bn * 4 * halves   # i32 partials
                    + 3 * m_pad * bn * 4)           # acc + out
            if cost <= budget:
                return bn, bk
        bn -= 128
    return _choose_tile(n_pad, 1024, 128), _choose_tile(k_eff, 256, 256)


def qmatmul_pallas(x: jax.Array, pw: PackedWeight,
                   bn: int = 1024, bk: int = 512,
                   out_dtype=jnp.float32) -> jax.Array:
    """x [..., K] @ dequant(W)[K, N] -> [..., N] via the fused Pallas kernel.

    Pads M to a sublane multiple and K to the weight's padded K; slices the
    logical N back out.
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k).astype(jnp.float32)
    m = x2.shape[0]
    m_pad = max(8, _round_up(m, 8))
    if k < pw.k_pad or m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, pw.k_pad - k)))
    # choose tile sizes that divide the padded dims and satisfy Mosaic's
    # block constraints (scales sublane dim bk/32 must be 8-divisible or full)
    k_eff = pw.k_pad if pw.kind == "q8_0" else pw.k_pad // 2
    if pw.kind not in ("q8_0", "q4_0"):
        raise ValueError(pw.kind)
    bm = m_pad if m_pad <= 512 else _choose_tile(m_pad, 256, mult=8)
    if _i8dot_enabled() and bm == m_pad and bm <= 32:
        bn_eff, bk_eff = _i8_tiles(pw.kind, m_pad, k_eff, pw.n_pad)
    else:
        bn_eff = _choose_tile(pw.n_pad, bn, mult=128)
        bk_eff = _choose_tile(k_eff, bk, mult=256)
    # routed through the custom_vjp wrapper so jax.grad reaches the Pallas
    # transposed-dequant backward; zero overhead when not differentiating
    out = _qmm_diff((pw.kind, bm, bn_eff, bk_eff, np.dtype(out_dtype).name),
                    x2, pw.qvals, pw.scales)
    return out[:m, : pw.n].reshape(*lead, pw.n)


def _choose_tile(total: int, limit: int, mult: int) -> int:
    """Largest multiple-of-`mult` divisor of `total` that is <= limit; falls
    back to the full dim (always legal: block == array dim)."""
    for cand in range(min(limit, total) // mult * mult, 0, -mult):
        if total % cand == 0:
            return cand
    return total
