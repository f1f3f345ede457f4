"""Fused decode attention-block megakernel: rmsnorm + QKV projection + RoPE +
flash attention (cache + current token) + output projection + residual, in ONE
Pallas call per layer.

Why: decode at small batch is bounded by per-call fixed cost (~3.6us/call
measured, tools/exp_ramp.py) plus the XLA glue between kernels — at 1B shapes
the projections alone ran at ~430 GB/s in-step vs ~650 isolated. One call per
block keeps the whole weight stream inside a single pipelined grid.

Structure (flat phase grid, one pass):
  phase A (nA static steps)   : per K-tile batched-by-head dequant dot
                                accq[Htot, 8, hd] += xn_tile @ wqkv3_tile
                                (xn = rmsnorm(x)*g applied per tile; the row
                                inverse-rms is computed once at step 0)
  A epilogue                  : RoPE(q, k_cur) via lane roll; emit k_cur/v_cur
  phase B (dyn ceil(pos/bkB)) : online-softmax flash over the cache prefix
  B epilogue (first C step)   : self-attention column (current token's K/V
                                straight from registers — the cache write
                                happens OUTSIDE, in parallel), normalize
  phase C (nC static steps)   : att @ wo3 per output tile + residual -> x2

Head-major weights (quant/headmajor.py) make the projections batched MXU dots
so q lands as [heads, m, hd] directly — Mosaic cannot unfold a flat [1, H*hd]
row into [H, hd] in-kernel (verified unsupported on hardware).

Q4_0: wqkv3 keeps the per-column K-half-split (two x feeds per tile); wo3
packs the nibble pair along the OUTPUT axis (two output column groups per
C step) because a K-split would mix heads inside one byte.

ref: the whole block replaces the reference's per-layer decode sequence
(llama_transformer.zig:192-253) and its Metal projection-group/attention
batching (program.zig:980-3185) at the kernel level.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zgml_tpu.quant.blocks import QK
from zgml_tpu.quant.headmajor import HeadPacked

NEG_INF = -1e30


def _interpret() -> bool:
    return os.environ.get("ZGML_TPU_INTERPRET", "0") == "1"


def attn_block_enabled() -> bool:
    """ZGML_TPU_ATTN_BLOCK=0 disables the fused attention-block kernel."""
    return os.environ.get("ZGML_TPU_ATTN_BLOCK", "1") != "0"


def _dequant(w_ref, s_lo_ref, s_hi_ref, kind):
    """Dequantize one [*, bk, n] int8/packed tile (sublane-broadcast scales).

    Returns (w_lo, w_hi) f32; w_hi is None for q8_0."""
    if kind == "q8_0":
        s = jnp.repeat(s_lo_ref[:], QK, axis=-2)
        return w_ref[:].astype(jnp.float32) * s, None
    v = w_ref[:].astype(jnp.int32)
    slo = jnp.repeat(s_lo_ref[:], QK, axis=-2)
    shi = jnp.repeat(s_hi_ref[:], QK, axis=-2)
    wlo = ((v & 15) - 8).astype(jnp.float32) * slo
    whi = (((v >> 4) & 15) - 8).astype(jnp.float32) * shi
    return wlo, whi


def _attn_block_kernel(
        sref,                                     # [2] i32: pos, n_b
        xfull_ref, g1full_ref,                    # [8, dp], [1, dp]
        xlo_ref, xhi_ref, g1lo_ref, g1hi_ref,     # A-phase tiles
        qkv_ref, qslo_ref, qshi_ref,              # head-major wqkv
        cos_ref, sin_ref,                         # [1, hd] rope consts
        ck_ref, cv_ref,                           # cache blocks [hkv, bkB, hd]
        wo_ref, woslo_ref, woshi_ref,             # head-major wo
        xreslo_ref, xreshi_ref,                   # C-phase residual tiles
        x2lo_ref, x2hi_ref, kcur_ref, vcur_ref,   # outputs
        inv_scr, accq_scr, m_scr, l_scr, acc_scr, att_scr,
        *, kind: str, hq: int, hkv: int, hd: int, d_logical: int,
        nA: int, nC: int, bkA: int, bkB: int, bnC: int,
        eps: float, scale: float):
    i = pl.program_id(0)
    pos = sref[0]
    n_b = sref[1]
    a_end = nA
    b_end = nA + n_b
    nr = hq // hkv
    htot = hq + 2 * hkv

    @pl.when(i == 0)
    def _():
        x = xfull_ref[:]
        ms = jnp.sum(x * x, axis=1, keepdims=True) * (1.0 / d_logical)
        inv_scr[:, :1] = jax.lax.rsqrt(ms + eps)
        accq_scr[:] = jnp.zeros_like(accq_scr)
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # -- phase A: batched-by-head QKV projection ----------------------------
    @pl.when(i < a_end)
    def _():
        inv = inv_scr[:, :1]                         # [8, 1]
        wlo, whi = _dequant(qkv_ref, qslo_ref, qshi_ref, kind)
        xlo = xlo_ref[:] * inv * g1lo_ref[:]         # [8, bkA]
        xb = jnp.broadcast_to(xlo[None], (htot, 8, bkA))
        part = jax.lax.dot_general(
            xb, wlo, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # [Htot, 8, hd]
        if whi is not None:
            xhi = xhi_ref[:] * inv * g1hi_ref[:]
            xbh = jnp.broadcast_to(xhi[None], (htot, 8, bkA))
            part = part + jax.lax.dot_general(
                xbh, whi, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        accq_scr[:] += part

    # -- A epilogue: rope, emit current K/V ---------------------------------
    @pl.when(i == a_end - 1)
    def _():
        cos = cos_ref[:]                             # [1, hd] = [c, c]
        sin = sin_ref[:]                             # [1, hd] = [-s, s]
        q = accq_scr[:hq, 0, :]                      # [hq, hd]
        q = q * cos + pltpu.roll(q, hd // 2, 1) * sin
        accq_scr[:hq, 0, :] = q
        kc = accq_scr[hq:hq + hkv, 0, :]             # [hkv, hd]
        kc = kc * cos + pltpu.roll(kc, hd // 2, 1) * sin
        kcur_ref[:] = kc
        vcur_ref[:] = accq_scr[hq + hkv:, 0, :]

    # -- phase B: flash attention over the cache prefix ---------------------
    @pl.when((i >= a_end) & (i < b_end))
    def _():
        kb = i - a_end
        q3 = accq_scr[:hq, 0, :].reshape(hkv, nr, hd)
        k = ck_ref[:].astype(jnp.float32)            # [hkv, bkB, hd]
        s = jax.lax.dot_general(q3, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        ki = jax.lax.broadcasted_iota(jnp.int32, (hkv, nr, bkB), 2) + kb * bkB
        s = jnp.where(ki < pos, s, NEG_INF)
        m_prev = m_scr[:, :, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_scr[:, :, :1] = l_scr[:, :, :1] * alpha + jnp.sum(
            p, axis=2, keepdims=True)
        m_scr[:, :, :1] = m_new
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p, cv_ref[:].astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    # -- B epilogue (first C step): self column + normalize -----------------
    @pl.when(i == b_end)
    def _():
        q3 = accq_scr[:hq, 0, :].reshape(hkv, nr, hd)
        kc = kcur_ref[:]                             # rope'd [hkv, hd]
        s_self = jnp.sum(q3 * kc[:, None, :], axis=2,
                         keepdims=True) * scale      # [hkv, nr, 1]
        m_prev = m_scr[:, :, :1]
        m_new = jnp.maximum(m_prev, s_self)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s_self - m_new)                  # [hkv, nr, 1]
        l = l_scr[:, :, :1] * alpha + p
        acc = acc_scr[:] * alpha + p * vcur_ref[:][:, None, :]
        safe = jnp.where(l > 0, l, 1.0)
        att = acc / safe                             # [hkv, nr, hd]
        att_scr[:] = att.reshape(hq, 1, hd)

    # -- phase C: output projection + residual ------------------------------
    @pl.when(i >= b_end)
    def _():
        att = att_scr[:]                             # [hq, 1, hd]
        wlo, whi = _dequant(wo_ref, woslo_ref, woshi_ref, kind)
        out_lo = jnp.sum(jax.lax.dot_general(
            att, wlo, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32), axis=0)   # [1, bnC]
        x2lo_ref[:] = xreslo_ref[:] + out_lo             # rows broadcast
        if whi is not None:
            out_hi = jnp.sum(jax.lax.dot_general(
                att, whi, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32), axis=0)
            x2hi_ref[:] = xreshi_ref[:] + out_hi


def _choose(total: int, limit: int, mult: int) -> int:
    for cand in range(min(limit, total) // mult * mult, 0, -mult):
        if total % cand == 0:
            return cand
    return total


@functools.partial(
    jax.jit,
    static_argnames=("kind", "hq", "hkv", "hd", "d_logical", "s_len",
                     "eps", "dp"))
def _attn_block(x, g1, qkv_q, qkv_s, cos2, sin2, ck, cv, wo_q, wo_s, pos,
                *, kind: str, hq: int, hkv: int, hd: int, d_logical: int,
                s_len: int, eps: float, dp: int):
    """x [8, dp] f32 (row 0 live); head-major weights; ck/cv [hkv, S, hd].

    Returns (x2 [8, dp], kcur [hkv, hd], vcur [hkv, hd])."""
    htot = hq + 2 * hkv
    kq = qkv_q.shape[1]                  # packed K rows (Kp or Kp/2)
    dw = wo_q.shape[2]                   # Dp (q8) or Dp/2 (q4)
    wk_rows = wo_q.shape[1]

    def vmem_est(bka, bkb, bnc):
        # every tiled input/output is double-buffered; scratches single
        qkv = htot * bka * hd + 2 * htot * max(bka // QK, 8) * hd * 4
        cache = 2 * hkv * bkb * hd * 2
        wo = hq * wk_rows * bnc + 2 * hq * (hd // QK) * bnc * 4
        xviews = 8 * dp * 4 + dp * 4 + 2 * 8 * bka * 4 + 2 * bka * 4 \
            + 2 * 8 * bnc * 4
        outs = 2 * 8 * bnc * 4 + 2 * hkv * hd * 4
        scr = (htot * 8 * hd + hq * hd + 3 * hkv * (hq // hkv) * 128
               + 8 * 128) * 4
        return 2 * (qkv + cache + wo + xviews + outs) + scr

    # bkA floor 256: the A-phase scale tile needs >= 8 sublane rows (Mosaic
    # block constraint); VMEM pressure is relieved via bkB/bnC instead
    bkA_e = _choose(kq, 256, 256) if kq >= 256 else kq
    bkB, bnC = 256, 512
    for _ in range(10):                  # shrink larger of B/C until it fits
        bkB_e = _choose(s_len, bkB, 8)
        bnC_e = _choose(dw, bnC, 128)
        if vmem_est(bkA_e, bkB_e, bnC_e) <= 12 << 20:
            break
        if 4 * hkv * bkB_e * hd >= hq * wk_rows * bnC_e and bkB_e > 64:
            bkB = bkB_e // 2
        elif bnC_e > 128:
            bnC = bnC_e // 2
        elif bkB_e > 64:
            bkB = bkB_e // 2
        else:
            break
    bkB, bnC = bkB_e, bnC_e
    bkA = bkA_e
    nA = kq // bkA
    nC = dw // bnC
    scale = 1.0 / (hd ** 0.5)
    n_b = jnp.clip((jnp.maximum(pos, 1) + bkB - 1) // bkB,
                   1, s_len // bkB).astype(jnp.int32)
    grid = nA + n_b + nC
    sarr = jnp.stack([jnp.asarray(pos, jnp.int32).reshape(()), n_b])

    nsA = bkA // QK                      # scale rows per A tile
    is_q4 = kind == "q4_0"

    def xa_lo(i, s):
        return (0, jnp.minimum(i, nA - 1))

    def xa_hi(i, s):
        return (0, jnp.minimum(i, nA - 1) + (nA if is_q4 else 0))

    def kvm(i, s):
        return (0, jnp.clip(i - nA, 0, s[1] - 1), 0)

    def cm(i, s):
        return jnp.clip(i - nA - s[1], 0, nC - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, dp), lambda i, s: (0, 0)),          # xfull
            pl.BlockSpec((1, dp), lambda i, s: (0, 0)),          # g1 full
            pl.BlockSpec((8, bkA), xa_lo),                       # x A lo
            pl.BlockSpec((8, bkA), xa_hi),                       # x A hi
            pl.BlockSpec((1, bkA), xa_lo),                       # g1 A lo
            pl.BlockSpec((1, bkA), xa_hi),                       # g1 A hi
            pl.BlockSpec((htot, bkA, hd),
                         lambda i, s: (0, jnp.minimum(i, nA - 1), 0)),
            pl.BlockSpec((htot, nsA, hd),
                         lambda i, s: (0, jnp.minimum(i, nA - 1), 0)),
            pl.BlockSpec((htot, nsA, hd),
                         lambda i, s: (0, jnp.minimum(i, nA - 1)
                                       + (nA if is_q4 else 0), 0)),
            pl.BlockSpec((1, hd), lambda i, s: (0, 0)),          # cos2
            pl.BlockSpec((1, hd), lambda i, s: (0, 0)),          # sin2
            pl.BlockSpec((hkv, bkB, hd), kvm),                   # ck
            pl.BlockSpec((hkv, bkB, hd), kvm),                   # cv
            pl.BlockSpec((hq, wo_q.shape[1], bnC),
                         lambda i, s: (0, 0, cm(i, s))),         # wo
            pl.BlockSpec((hq, hd // QK, bnC),
                         lambda i, s: (0, 0, cm(i, s))),         # wo s lo
            pl.BlockSpec((hq, hd // QK, bnC),
                         lambda i, s: (0, 0, cm(i, s)
                                       + (nC if is_q4 else 0))),  # wo s hi
            pl.BlockSpec((8, bnC), lambda i, s: (0, cm(i, s))),  # xres lo
            pl.BlockSpec((8, bnC),
                         lambda i, s: (0, cm(i, s)
                                       + (nC if is_q4 else 0))),  # xres hi
        ],
        out_specs=[
            pl.BlockSpec((8, bnC), lambda i, s: (0, cm(i, s))),  # x2 lo
            pl.BlockSpec((8, bnC), lambda i, s: (0, cm(i, s))),  # x2 hi
            pl.BlockSpec((hkv, hd), lambda i, s: (0, 0)),        # kcur
            pl.BlockSpec((hkv, hd), lambda i, s: (0, 0)),        # vcur
        ],
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),                   # inv rms
            pltpu.VMEM((htot, 8, hd), jnp.float32),              # acc qkv
            pltpu.VMEM((hkv, hq // hkv, 128), jnp.float32),      # m
            pltpu.VMEM((hkv, hq // hkv, 128), jnp.float32),      # l
            pltpu.VMEM((hkv, hq // hkv, hd), jnp.float32),       # acc att
            pltpu.VMEM((hq, 1, hd), jnp.float32),                # att
        ],
    )
    dwidth = dw                          # per-half width written by C steps
    x2lo, x2hi, kcur, vcur = pl.pallas_call(
        functools.partial(
            _attn_block_kernel, kind=kind, hq=hq, hkv=hkv, hd=hd,
            d_logical=d_logical, nA=nA, nC=nC, bkA=bkA, bkB=bkB, bnC=bnC,
            eps=eps, scale=scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, dwidth), jnp.float32),
            jax.ShapeDtypeStruct((8, dwidth), jnp.float32),
            jax.ShapeDtypeStruct((hkv, hd), jnp.float32),
            jax.ShapeDtypeStruct((hkv, hd), jnp.float32),
        ],
        interpret=_interpret(),
    )(sarr, x, g1, x, x, g1, g1, qkv_q, qkv_s, qkv_s, cos2, sin2, ck, cv,
      wo_q, wo_s, wo_s, x, x)
    if is_q4:
        x2 = jnp.concatenate([x2lo, x2hi], axis=1)
    else:
        x2 = x2lo
    return x2, kcur, vcur


def attn_block_compatible(layer: dict, cfg, cache_k) -> bool:
    """Fast-path eligibility for one decode step (B == 1, bf16 cache)."""
    if "qkv3" not in layer or "wo3" not in layer:
        return False
    if isinstance(cache_k, tuple):       # int8 cache: not yet fused
        return False
    qkv3: HeadPacked = layer["qkv3"]
    wo3: HeadPacked = layer["wo3"]
    if qkv3.kind != wo3.kind or qkv3.kind not in ("q4_0", "q8_0"):
        return False
    if cfg.head_dim % QK or cfg.head_dim < QK:
        return False
    return True


def attn_block_step(cfg, layer, x, cache_k, cache_v, pos, cos2, sin2):
    """One fused attention block. x [1, 1, d] f32; cache [1, hkv, S, hd].

    Returns (x2 [1, 1, d], k_cur [1, hkv, 1, hd], v_cur like k_cur)."""
    qkv3: HeadPacked = layer["qkv3"]
    wo3: HeadPacked = layer["wo3"]
    hq, hkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    d = cfg.d_model
    dp = qkv3.qvals.shape[1] * (2 if qkv3.kind == "q4_0" else 1)
    x2d = x.reshape(1, d).astype(jnp.float32)
    xp = jnp.pad(x2d, ((0, 7), (0, dp - d)))
    g1 = jnp.pad(layer["attn_norm"].reshape(1, d).astype(jnp.float32),
                 ((0, 0), (0, dp - d)))
    s_len = cache_k.shape[2]
    x2, kcur, vcur = _attn_block(
        xp, g1, qkv3.qvals, qkv3.scales, cos2, sin2,
        cache_k.reshape(hkv, s_len, hd), cache_v.reshape(hkv, s_len, hd),
        wo3.qvals, wo3.scales, pos,
        kind=qkv3.kind, hq=hq, hkv=hkv, hd=hd, d_logical=d,
        s_len=s_len, eps=cfg.rms_norm_eps, dp=dp)
    x_out = x2[0:1, :d].reshape(1, 1, d).astype(x.dtype)
    return (x_out,
            kcur.reshape(1, hkv, 1, hd),
            vcur.reshape(1, hkv, 1, hd))
