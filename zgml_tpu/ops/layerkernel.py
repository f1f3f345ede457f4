"""Fused decode layer megakernel: rmsnorm + QKV + RoPE + flash attention +
output projection (+ optionally the whole SwiGLU FFN) in ONE Pallas call.

Why: decode at small batch is bounded by per-call fixed cost (~3.6us/call
measured, tools/exp_ramp.py) plus pipeline ramp between kernels — at 1B
shapes the projections alone ran at ~430 GB/s in-step vs ~650 isolated. One
call per layer keeps the whole weight stream inside a single pipelined grid.

Structure (flat phase grid, one pass):
  phase A (ncA*nA static steps): PLANAR per-K-tile dequant dot into a flat
                                accumulator accq[8, n_qkv] (rmsnorm applied
                                per tile via a step-0 row inverse-rms). For
                                large models the A phase runs int8 x int8
                                segmented MXU dots instead (a_i8: the norm +
                                per-32-block activation quantization happen
                                OUTSIDE, ggml vec-dot discipline). ncA > 1
                                splits output columns into static sub-phases
                                to fit VMEM at MHA scale.
  A epilogue                  : regroup heads via static sub-128-lane slices
                                (Mosaic can slice lanes statically but cannot
                                unfold [1, H*hd] -> [H, hd]; both verified on
                                hardware), RoPE via lane roll, emit k/v_cur
  phase B (dyn ceil(pos/bkB)) : online-softmax flash over the cache prefix
                                (bf16 cache, or int8 with Q pre-quantized at
                                the A epilogue and per-position scales
                                factored out of both integer dots)
  B epilogue (first C step)   : self-attention column (current token's K/V
                                straight from registers — the cache write
                                happens OUTSIDE, in parallel), normalize
  phase C (nC static steps)   : per HEAD-GROUP att @ wo3 partials into a
                                full-width accumulator (tiling the
                                contraction, not the output, keeps every
                                in-kernel slice static)
  phase E (nE static steps)   : optional N-packed Q4 FFN (x2 = x + wo_out;
                                xn2 = rmsnorm(x2)*g2 at the transition; per
                                F-tile gate|up dots + SwiGLU + down partials)
  final epilogue              : x_out = x2 (+ ffn accumulator)

Q4_0: the planar wqkv keeps its global K-half-split (two x feeds per tile);
wo3 and the FFN's down pack the nibble pair along the OUTPUT axis (two static
half-width accumulator updates) because a K-split would mix heads inside one
byte; the FFN's gate|up pair shares one byte (quant/headmajor.ffn_npack).

ref: the whole layer replaces the reference's per-layer decode sequence
(llama_transformer.zig:192-253) and its Metal projection-group/attention
batching (program.zig:980-3185) at the kernel level.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zgml_tpu.quant.blocks import QK
from zgml_tpu.quant.headmajor import HeadPacked

from zgml_tpu import config
from zgml_tpu.ops.scalecodec import kscale_f32

NEG_INF = -1e30


def _interpret() -> bool:
    return config.interpret()


def attn_block_enabled() -> bool:
    """ZGML_TPU_ATTN_BLOCK=0 disables the fused layer/attention kernels."""
    return config.attn_block()


def _dequant(w_ref, s_lo_ref, s_hi_ref, kind):
    """Dequantize one [*, bk, n] int8/packed tile (sublane-broadcast scales).

    Returns (w_lo, w_hi) f32; w_hi is None for q8_0."""
    if kind == "q8_0":
        s = jnp.repeat(kscale_f32(s_lo_ref[:]), QK, axis=-2)
        return w_ref[:].astype(jnp.float32) * s, None
    v = w_ref[:].astype(jnp.int32)
    slo = jnp.repeat(kscale_f32(s_lo_ref[:]), QK, axis=-2)
    shi = jnp.repeat(kscale_f32(s_hi_ref[:]), QK, axis=-2)
    wlo = ((v & 15) - 8).astype(jnp.float32) * slo
    whi = (((v >> 4) & 15) - 8).astype(jnp.float32) * shi
    return wlo, whi


def _layer_kernel(
        sref,                                     # [3] i32: pos, n_b, li
        xfull_ref, g1full_ref,                    # [8, dp], [1, dp]
        a1_ref, a2_ref, a3_ref, a4_ref, a5_ref, a6_ref,   # A-phase tiles
        qkv_ref, qslo_ref, qshi_ref,              # planar wqkv (2D or i8 3D)
        cos_ref, sin_ref,                         # [1, hd] rope consts
        ck_ref, cks_ref, cv_ref, cvs_ref,         # cache blocks (+int8 scales)
        wo_ref, wos_ref,                          # head-group wo3 blocks
        g2_ref, gu_ref, gs_ref, us_ref,           # FFN (dummies if !has_ffn)
        dn_ref, ds_ref,
        *rest_refs,
        kind: str, hq: int, hkv: int, hd: int, d_logical: int,
        nA: int, ncA: int, nC: int, nE: int, hg: int, bkA: int, bkB: int,
        ckE: int, cdE: int, eps: float, scale: float, has_ffn: bool,
        kv_i8: bool, a_i8: bool, write_cache: bool = False):
    if write_cache:
        # +2 aliased cache outputs (the 16-row window holding row `pos`)
        (xout_ref, kcur_ref, vcur_ref, cko_ref, cvo_ref) = rest_refs[:5]
        scratch = rest_refs[5:]
    else:
        cko_ref = cvo_ref = None
        xout_ref, kcur_ref, vcur_ref = rest_refs[:3]
        scratch = rest_refs[3:]
    (inv_scr, accq_scr, q2_scr, kv2_scr, qq_scr, qs_scr,
     m_scr, l_scr, acc_scr,
     att_scr, accwo_scr, x2_scr, xn2_scr) = scratch
    i = pl.program_id(0)
    pos = sref[0]
    n_b = sref[1]
    a_end = nA * ncA
    b_end = a_end + n_b
    c_end = b_end + nC
    total = c_end + (nE if has_ffn else 0)
    nr = hq // hkv
    htot = hq + 2 * hkv
    is_q4 = kind == "q4_0"

    @pl.when(i == 0)
    def _():
        if not a_i8:
            x = xfull_ref[:]
            ms = jnp.sum(x * x, axis=1, keepdims=True) * (1.0 / d_logical)
            inv_scr[:, :1] = jax.lax.rsqrt(ms + eps)
        accq_scr[:] = jnp.zeros_like(accq_scr)
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        accwo_scr[:] = jnp.zeros_like(accwo_scr)

    # -- phase A: planar QKV projection (flat accumulator) ------------------
    # ncA > 1 splits the weight's output columns into static sub-phases
    # (col group `col` runs steps [col*nA, (col+1)*nA)) so the accumulator
    # slice stays static while the per-step block shrinks ncA-fold (VMEM)
    ncw = qkv_ref.shape[-1]                          # n_qkv // ncA
    for col in range(ncA):
        @pl.when((i >= col * nA) & (i < (col + 1) * nA))
        def _(col=col):
            if a_i8:
                # ggml vec-dot discipline on the MXU: activations quantized
                # per-32-block OUTSIDE (with the rmsnorm folded in), int8
                # segmented dots, per-block scale fixup on int32 partials
                dn = (((2,), (1,)), ((0,), (0,)))
                if is_q4:
                    v32 = pltpu.bitcast(qkv_ref[:], jnp.int32)
                    msk = jnp.full(v32.shape, 0x0F0F0F0F, jnp.int32)
                    wlo = pltpu.bitcast(v32 & msk, jnp.int8)
                    whi = pltpu.bitcast(
                        jax.lax.shift_right_logical(
                            v32, jnp.full(v32.shape, 4, jnp.int32)) & msk,
                        jnp.int8)
                    plo = jax.lax.dot_general(
                        a1_ref[:], wlo, dn,
                        preferred_element_type=jnp.int32)
                    phi = jax.lax.dot_general(
                        a2_ref[:], whi, dn,
                        preferred_element_type=jnp.int32)
                    slo = kscale_f32(qslo_ref[:])           # [nbkA, ncw]
                    shi = kscale_f32(qshi_ref[:])
                    part = (jnp.sum(plo.astype(jnp.float32)
                                    * (a3_ref[:][:, :, None]
                                       * slo[:, None, :]), axis=0)
                            + jnp.sum(phi.astype(jnp.float32)
                                      * (a4_ref[:][:, :, None]
                                         * shi[:, None, :]), axis=0))
                    # fold out the nibble -8 offset via activation block sums
                    alo = (a3_ref[:] * a5_ref[:].astype(jnp.float32) * 8.0).T
                    ahi = (a4_ref[:] * a6_ref[:].astype(jnp.float32) * 8.0).T
                    part = part - (
                        jnp.dot(alo, slo, preferred_element_type=jnp.float32)
                        + jnp.dot(ahi, shi,
                                  preferred_element_type=jnp.float32))
                else:
                    pq = jax.lax.dot_general(
                        a1_ref[:], qkv_ref[:], dn,
                        preferred_element_type=jnp.int32)
                    part = jnp.sum(
                        pq.astype(jnp.float32)
                        * (a3_ref[:][:, :, None]
                           * kscale_f32(qslo_ref[:])[:, None, :]),
                        axis=0)
            else:
                inv = inv_scr[:, :1]                 # [8, 1]
                wlo, whi = _dequant(qkv_ref, qslo_ref, qshi_ref, kind)
                xlo = a1_ref[:] * inv * a3_ref[:]    # [8, bkA]
                part = jnp.dot(xlo, wlo,
                               preferred_element_type=jnp.float32)
                if whi is not None:
                    xhi = a2_ref[:] * inv * a4_ref[:]
                    part = part + jnp.dot(
                        xhi, whi, preferred_element_type=jnp.float32)
            accq_scr[:, col * ncw:(col + 1) * ncw] += part

    # -- A epilogue: regroup heads (static sub-lane slices), rope, emit K/V -
    @pl.when(i == a_end - 1)
    def _():
        nq = hq * hd
        nkv = hkv * hd
        # (full-step A/B vs a zero-fill stand-in measured this 96-row regroup
        # at ~0 cost — 7.464 vs 7.483 ms at 7B — so no need to avoid it)
        for h in range(hq):
            q2_scr[h:h + 1, :] = accq_scr[0:1, h * hd:(h + 1) * hd]
        for h in range(hkv):
            kv2_scr[h:h + 1, :] = accq_scr[0:1, nq + h * hd: nq + (h + 1) * hd]
            kv2_scr[hkv + h:hkv + h + 1, :] = \
                accq_scr[0:1, nq + nkv + h * hd: nq + nkv + (h + 1) * hd]
        cos = cos_ref[:]                             # [1, hd] = [c, c]
        sin = sin_ref[:]                             # [1, hd] = [-s, s]
        q = q2_scr[:]
        q2_scr[:] = q * cos + pltpu.roll(q, hd // 2, 1) * sin
        kc = kv2_scr[:hkv, :]
        kcur_ref[:] = kc * cos + pltpu.roll(kc, hd // 2, 1) * sin
        vcur_ref[:] = kv2_scr[hkv:, :]
        if kv_i8:
            # pre-quantize Q once (ggml attentionQuantized discipline) so
            # the B phase runs int8 x int8 on the MXU; per-(head) scale
            qf = q2_scr[:]
            amax = jnp.max(jnp.abs(qf), axis=1, keepdims=True)
            qsc = amax / 127.0
            qinv = jnp.where(qsc > 0, 1.0 / jnp.where(qsc > 0, qsc, 1.0), 0.0)
            qs_scr[:, :1] = qsc
            qq_scr[:] = jnp.clip(jnp.round(qf * qinv), -127,
                                 127).astype(jnp.int8)

    # -- phase B: flash attention over the cache prefix ---------------------
    @pl.when((i >= a_end) & (i < b_end))
    def _():
        kb = i - a_end
        if kv_i8:
            # scores in the integer domain: per-position scales factor out
            qq3 = qq_scr[:].reshape(hkv, nr, hd)
            qs3 = qs_scr[:, :1].reshape(hkv, nr, 1)
            p_i32 = jax.lax.dot_general(
                qq3, ck_ref[:], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)    # [hkv, nr, bkB]
            ks = cks_ref[0]                          # [hkv, bkB]
            s = p_i32.astype(jnp.float32) * (qs3 * ks[:, None, :]) * scale
        else:
            q3 = q2_scr[:].reshape(hkv, nr, hd)
            k = ck_ref[:].astype(jnp.float32)        # [hkv, bkB, hd]
            s = jax.lax.dot_general(
                q3, k, (((2,), (2,)), ((0,), (0,))),
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
        if kv_i8:
            # fold the per-position V scales into p, promote int8 V in-dot
            pv = p * cvs_ref[0][:, None, :]
            upd = jax.lax.dot_general(
                pv, cv_ref[:].astype(jnp.float32), (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        else:
            upd = jax.lax.dot_general(
                p, cv_ref[:].astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        acc_scr[:] = acc_scr[:] * alpha + upd

    # -- B epilogue (first C step): self column + normalize -----------------
    @pl.when(i == b_end)
    def _():
        q3 = q2_scr[:].reshape(hkv, nr, hd)
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
        if write_cache:
            # In-place cache write through the aliased 16-row output window
            # holding row `pos` — replaces the 2-per-layer XLA
            # dynamic_update_slices (~0.39 ms/token at 7B, tools/exp_scan.py).
            # Live rows (< pos) of the window always sit inside the LAST
            # B-phase cache block (bkB % 16 == 0, woff >= (n_b-1)*bkB when
            # any window row < pos), which is still resident here because
            # the kv index maps clamp at block n_b-1; dead rows (>= pos)
            # get kcur/vcur — deterministic filler, overwritten before read.
            woff = (pos // 16) * 16
            # every term is a multiple of 16 but Mosaic can't prove it
            # through the clip — assert the alignment for the dynamic
            # sublane load
            off = pl.multiple_of(
                jnp.clip(woff - (n_b - 1) * bkB, 0, bkB - 16), 16)
            grow = woff + jax.lax.broadcasted_iota(
                jnp.int32, (hkv, 16, hd), 1)
            nbk = ck_ref[:, pl.ds(off, 16), :].astype(jnp.float32)
            nbv = cv_ref[:, pl.ds(off, 16), :].astype(jnp.float32)
            cko_ref[:] = jnp.where(
                grow < pos, nbk,
                kcur_ref[:][:, None, :]).astype(cko_ref.dtype)
            cvo_ref[:] = jnp.where(
                grow < pos, nbv,
                vcur_ref[:][:, None, :]).astype(cvo_ref.dtype)

    # -- phase C: output projection per head group --------------------------
    @pl.when((i >= b_end) & (i < c_end))
    def _():
        cg = i - b_end
        att_g = att_scr[pl.ds(cg * hg, hg), :, :]    # [hg, 1, hd]
        dwp = wo_ref.shape[2]
        w = wo_ref[:]
        s = kscale_f32(wos_ref[:])                   # [hg, hd/QK, dp]
        if is_q4:
            v = w.astype(jnp.int32)
            slo = jnp.repeat(s[:, :, :dwp], QK, axis=1)
            shi = jnp.repeat(s[:, :, dwp:2 * dwp], QK, axis=1)
            wlo = ((v & 15) - 8).astype(jnp.float32) * slo
            whi = (((v >> 4) & 15) - 8).astype(jnp.float32) * shi
        else:
            wlo = w.astype(jnp.float32) * jnp.repeat(s, QK, axis=1)
            whi = None
        plo = jnp.sum(jax.lax.dot_general(
            att_g, wlo, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32), axis=0)   # [1, dwp]
        accwo_scr[:, :dwp] += plo                    # rows broadcast
        if whi is not None:
            phi = jnp.sum(jax.lax.dot_general(
                att_g, whi, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32), axis=0)
            accwo_scr[:, dwp:2 * dwp] += phi

    if has_ffn:
        # -- E transition: attention residual + second norm -----------------
        @pl.when(i == c_end)
        def _():
            x2 = xfull_ref[:] + accwo_scr[:]
            x2_scr[:] = x2
            ms = jnp.sum(x2 * x2, axis=1, keepdims=True) * (1.0 / d_logical)
            xn2_scr[:] = x2 * jax.lax.rsqrt(ms + eps) * g2_ref[:]
            accwo_scr[:] = jnp.zeros_like(accwo_scr)   # reused as FFN acc

        # -- phase E: N-packed Q4 FFN per F-tile ----------------------------
        @pl.when(i >= c_end)
        def _():
            xn = xn2_scr
            m8, dp = xn.shape
            hw = dp // 2
            bf = gu_ref.shape[1]
            nsb = ckE // QK
            accg = jnp.zeros((m8, bf), jnp.float32)
            accu = jnp.zeros((m8, bf), jnp.float32)
            for c in range(dp // ckE):
                v = gu_ref[c * ckE:(c + 1) * ckE, :].astype(jnp.int32)
                xs = xn[:, c * ckE:(c + 1) * ckE]
                sg = jnp.repeat(kscale_f32(gs_ref[c * nsb:(c + 1) * nsb, :]),
                                QK, axis=0)
                su = jnp.repeat(kscale_f32(us_ref[c * nsb:(c + 1) * nsb, :]),
                                QK, axis=0)
                wg = ((v & 15) - 8).astype(jnp.float32) * sg
                wu = (((v >> 4) & 15) - 8).astype(jnp.float32) * su
                accg += jnp.dot(xs, wg, preferred_element_type=jnp.float32)
                accu += jnp.dot(xs, wu, preferred_element_type=jnp.float32)
            act = accu * (accg * jax.nn.sigmoid(accg))
            for c in range(hw // cdE):
                dv = dn_ref[:, c * cdE:(c + 1) * cdE].astype(jnp.int32)
                sl = jnp.repeat(kscale_f32(ds_ref[:, c * cdE:(c + 1) * cdE]),
                                QK, axis=0)
                sh = jnp.repeat(
                    kscale_f32(ds_ref[:, hw + c * cdE: hw + (c + 1) * cdE]),
                    QK, axis=0)
                wl = ((dv & 15) - 8).astype(jnp.float32) * sl
                wh = (((dv >> 4) & 15) - 8).astype(jnp.float32) * sh
                accwo_scr[:, c * cdE:(c + 1) * cdE] += jnp.dot(
                    act, wl, preferred_element_type=jnp.float32)
                accwo_scr[:, hw + c * cdE: hw + (c + 1) * cdE] += jnp.dot(
                    act, wh, preferred_element_type=jnp.float32)

    # -- final epilogue ------------------------------------------------------
    @pl.when(i == total - 1)
    def _():
        if has_ffn:
            xout_ref[:] = x2_scr[:] + accwo_scr[:]
        else:
            xout_ref[:] = xfull_ref[:] + accwo_scr[:]


def _dummy_a2(nsa: int):
    return jnp.zeros((nsa, 8), jnp.float32)


def _choose(total: int, limit: int, mult: int) -> int:
    for cand in range(min(limit, total) // mult * mult, 0, -mult):
        if total % cand == 0:
            return cand
    return total


@functools.partial(
    jax.jit,
    static_argnames=("kind", "hq", "hkv", "hd", "d_logical", "s_len",
                     "eps", "dp", "has_ffn", "kv_i8", "a_i8", "tune",
                     "cache_write"))
def _layer_call(x, g1, xq_t, xs_t, xsum_t, qkv_q, qkv_s, cos2, sin2,
                ck, cks, cv, cvs,
                wo_q, wo_s, g2, gu_q, gs, us, dn_q, ds, pos, li=0,
                *, kind: str, hq: int, hkv: int, hd: int, d_logical: int,
                s_len: int, eps: float, dp: int, has_ffn: bool,
                kv_i8: bool = False, a_i8: bool = False,
                tune: tuple = (), cache_write: bool = True):
    """x [8, dp] f32 (row 0 live); PLANAR wqkv, head-major wo3, N-packed FFN;
    ck/cv [hkv, S, hd]. Returns (x_out [8, dp], kcur, vcur [hkv, hd]) plus,
    on the bf16-cache path, the in-place-updated (ck, cv) — the current
    token's rope'd K/V written at row `pos` via aliased output blocks."""
    htot = hq + 2 * hkv
    # planar packed K rows (Kp or Kp/2); a_i8 passes a [rows/32, 32, n] view
    kq = qkv_q.shape[0] * (QK if qkv_q.ndim == 3 else 1)
    n_qkv = qkv_q.shape[-1]              # padded out cols
    wk_rows = wo_q.shape[1]              # hd
    dwp = wo_q.shape[2]                  # dp (q8) or dp/2 (q4)
    is_q4 = kind == "q4_0"

    # tuning overrides (static; see layer_tune() in attn_block_step):
    # (bkA_cap, ncA_start, bkB_start, hg_start, budget_bytes) — 0 = default
    t_bka, t_nca, t_bkb, t_hg, t_budget = (tune + (0,) * 5)[:5]

    # bkA floor 256: the A-phase scale tile needs >= 8 sublane rows
    bka_cap = t_bka or 256
    bkA = _choose(kq, bka_cap, 256) if kq >= 256 else kq
    fp = dn_q.shape[0] if has_ffn else 0

    # weight-scale element size: bf16 scale storage (the round-5 default)
    # halves the scale blocks' VMEM share, admitting larger tiles
    ssz = qkv_s.dtype.itemsize

    def vmem_est(bkb, hg, bfE, nca, bka=None):
        bkA_ = bka or bkA
        qkv = (bkA_ * n_qkv + 2 * max(bkA_ // QK, 8) * n_qkv * ssz) // nca
        cache = 2 * hkv * bkb * hd * (1 if kv_i8 else 2) \
            + (2 * hkv * bkb * 4 if kv_i8 else 0)
        wo = hg * wk_rows * dwp + hg * (hd // QK) * dp * ssz
        ffn = (dp * bfE + bfE * (dp // 2) + 2 * (dp // QK) * bfE * ssz
               + max(bfE // QK, 8) * dp * ssz) if has_ffn else 0
        xviews = 8 * dp * 4 * 2 + dp * 4 * 2 + 4 * 8 * bkA_ * 4
        outs = 8 * dp * 4 + 2 * hkv * hd * 4
        scr = (8 * n_qkv + (hq + 2 * hkv) * hd + hq * hd
               + 3 * hkv * (hq // hkv) * 128
               + 3 * 8 * dp + 8 * 128) * 4
        return 2 * (qkv + cache + wo + ffn + xviews + outs) + scr

    bkB_floor = 128 if kv_i8 else 64    # int8 cache: S is the LANE axis
    if tune:
        # explicit experiment overrides: legacy shrink loop from the given
        # starting points (the A/B harnesses drive this; tools/exp_step2.py)
        budget = t_budget or (6 << 20)
        bkB, hg, bfE, ncA = t_bkb or 256, t_hg or hq, 512, t_nca or 1
        for _ in range(14):
            bkB_e = _choose(s_len, bkB, 128 if kv_i8 else 8)
            hg_e = hg
            while hq % hg_e:
                hg_e -= 1
            bfE_e = _choose(fp, bfE, 256) if has_ffn else 0
            if vmem_est(bkB_e, hg_e, bfE_e, ncA) <= budget:
                break
            if ncA < 4 and (n_qkv // (2 * ncA)) % 128 == 0:
                ncA *= 2
            elif hg_e > max(1, hq // 8):
                hg = max(1, hg_e // 2)
            elif has_ffn and bfE_e > 256:
                bfE = bfE_e // 2
            elif bkB_e > bkB_floor:
                bkB = bkB_e // 2
            elif hg_e > 1:
                hg = max(1, hg_e // 2)
            else:
                break
        bkB, hg = bkB_e, hg_e
        bfE = bfE_e if has_ffn else 128
    else:
        # default: preference-scored candidate search. Grid-step count is the
        # fixed-cost proxy (measured ~0.3-1us/step pipeline overhead); score =
        # expected steps at a short-context decode (the headline regime), with
        # B steps weighted at kv~256. Round-5 engine-level decode_n A/B at 7B
        # MHA (tools/exp_server 08_stacktune): bkA=512/ncA=4/bkB=64/hg=4
        # (est 10MB, Mosaic-compiled) 7.654 ms/token vs the round-4 pick
        # bkA=256/ncA=2/hg=2 at 7.703 — bigger A tiles + half the C steps;
        # budget raised 9.5 -> 11 MB to admit it (est 10MB known-compiling;
        # est-13.2MB class never tried, A1024's est-16 class FAILS Mosaic).
        budget = 11 << 20
        best = None
        for bka_c in ((bkA, 2 * bkA) if kq % (2 * bkA or 1) == 0
                      and not t_bka else (bkA,)):
            for nca in (1, 2, 4, 8):
                if n_qkv % (nca * 128):
                    continue
                for hg_c in (hh for hh in (2, 4, 8, 16, 32, 64, 1)
                             if hh <= hq and hq % hh == 0):
                    for bkb_c in (bkB_floor, 2 * bkB_floor, 4 * bkB_floor):
                        bkb_e = _choose(s_len, bkb_c, 128 if kv_i8 else 8)
                        for bfe_c in ((512, 256) if has_ffn else (0,)):
                            bfe_e = _choose(fp, bfe_c, 256) if has_ffn else 0
                            if vmem_est(bkb_e, hg_c, bfe_e, nca,
                                        bka=bka_c) > budget:
                                continue
                            steps = ((kq // bka_c) * nca
                                     + max(1, 256 // bkb_e)
                                     + hq // hg_c
                                     + (fp // bfe_e if has_ffn else 0))
                            key = (steps, -bka_c, -bkb_e, -(bfe_e or 0))
                            if best is None or key < best[0]:
                                best = (key, (bka_c, nca, hg_c, bkb_e, bfe_e))
        if best is None:       # degenerate tiny shapes: one step per phase
            ncA, hg, bkB = 1, 1, _choose(s_len, bkB_floor,
                                         128 if kv_i8 else 8)
            bfE = _choose(fp, 256, 256) if has_ffn else 128
        else:
            bkA, ncA, hg, bkB, bfE = best[1]
            bfE = bfE if has_ffn else 128
    # in-kernel cache write needs 16-row (bf16-tile) aligned windows that
    # provably sit inside the last B block; otherwise the caller falls back
    # to the XLA dynamic_update_slice
    write_cache = (cache_write and not kv_i8
                   and bkB % 16 == 0 and s_len % 16 == 0)
    if config.lk_debug():
        print(f"[layerkernel] bkA={bkA} ncA={ncA} bkB={bkB} hg={hg} "
              f"bfE={bfE if has_ffn else 0} est={vmem_est(bkB, hg, bfE if has_ffn else 0, ncA)>>20}MB "
              f"kq={kq} n_qkv={n_qkv} a_i8={a_i8} kv_i8={kv_i8}")
    nA = kq // bkA
    ncw = n_qkv // ncA
    nC = hq // hg
    nE = (fp // bfE) if has_ffn else 0
    ckE = _choose(dp, 1024, 256) if has_ffn else 256
    cdE = _choose(dp // 2, 1024, 256) if has_ffn else 256
    scale = 1.0 / (hd ** 0.5)
    n_b = jnp.clip((jnp.maximum(pos, 1) + bkB - 1) // bkB,
                   1, s_len // bkB).astype(jnp.int32)
    a_steps = nA * ncA
    grid = a_steps + n_b + nC + nE
    sarr = jnp.stack([jnp.asarray(pos, jnp.int32).reshape(()), n_b,
                      jnp.asarray(li, jnp.int32).reshape(())])
    nsA = max(bkA // QK, 1)

    def _rowcol(i):
        ka = jnp.minimum(i, a_steps - 1)
        col = ka // nA
        return ka - col * nA, col

    def xa_lo(i, s):
        return (0, _rowcol(i)[0])

    def xa_hi(i, s):
        return (0, _rowcol(i)[0] + (nA if is_q4 else 0))

    def xa3_lo(i, s):
        return (_rowcol(i)[0], 0, 0)

    def xa3_hi(i, s):
        return (_rowcol(i)[0] + (nA if is_q4 else 0), 0, 0)

    def xa2_lo(i, s):
        return (_rowcol(i)[0], 0)

    def xa2_hi(i, s):
        return (_rowcol(i)[0] + (nA if is_q4 else 0), 0)

    def wqm(i, s):
        row, col = _rowcol(i)
        return (row, col)

    def wqs_lo(i, s):
        row, col = _rowcol(i)
        return (row, col)

    def wqs_hi(i, s):
        row, col = _rowcol(i)
        return (row + (nA if is_q4 else 0), col)

    def kvm(i, s):
        # s[2] = layer slab of a STACKED [L*hkv, S, hd] cache (0 when the
        # cache is this layer's own [hkv, S, hd] array)
        return (s[2], jnp.clip(i - a_steps, 0, s[1] - 1), 0)

    def kvm8(i, s):
        return (0, 0, jnp.clip(i - a_steps, 0, s[1] - 1))

    def ksm8(i, s):
        return (0, 0, jnp.clip(i - a_steps, 0, s[1] - 1))

    def cgm(i, s):
        return jnp.clip(i - a_steps - s[1], 0, nC - 1)

    def ffm(i, s):
        return jnp.clip(i - a_steps - s[1] - nC, 0, max(nE - 1, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, dp), lambda i, s: (0, 0)),          # xfull
            pl.BlockSpec((1, dp), lambda i, s: (0, 0)),          # g1 full
        ] + ([
            pl.BlockSpec((nsA, 8, QK), xa3_lo),                  # xq lo
            pl.BlockSpec((nsA, 8, QK), xa3_hi),                  # xq hi
            pl.BlockSpec((nsA, 8), xa2_lo),                      # xs lo
            pl.BlockSpec((nsA, 8), xa2_hi),                      # xs hi
            pl.BlockSpec((nsA, 8), xa2_lo),                      # xsum lo
            pl.BlockSpec((nsA, 8), xa2_hi),                      # xsum hi
            pl.BlockSpec((nsA, QK, ncw),
                         lambda i, s: (_rowcol(i)[0], 0,
                                       _rowcol(i)[1])),          # w3 blocked
        ] if a_i8 else [
            pl.BlockSpec((8, bkA), xa_lo),                       # x A lo
            pl.BlockSpec((8, bkA), xa_hi),                       # x A hi
            pl.BlockSpec((1, bkA), xa_lo),                       # g1 A lo
            pl.BlockSpec((1, bkA), xa_hi),                       # g1 A hi
            pl.BlockSpec((nsA, 8), lambda i, s: (0, 0)),         # dummy
            pl.BlockSpec((nsA, 8), lambda i, s: (0, 0)),         # dummy
            pl.BlockSpec((bkA, ncw), wqm),
        ]) + [
            pl.BlockSpec((nsA, ncw), wqs_lo),
            pl.BlockSpec((nsA, ncw), wqs_hi),
            pl.BlockSpec((1, hd), lambda i, s: (0, 0)),          # cos2
            pl.BlockSpec((1, hd), lambda i, s: (0, 0)),          # sin2
        ] + ([
            pl.BlockSpec((hkv, hd, bkB), kvm8),                  # ck int8
            pl.BlockSpec((1, hkv, bkB), ksm8),                   # k scales
            pl.BlockSpec((hkv, hd, bkB), kvm8),                  # cv int8
            pl.BlockSpec((1, hkv, bkB), ksm8),                   # v scales
        ] if kv_i8 else [
            pl.BlockSpec((hkv, bkB, hd), kvm),                   # ck
            pl.BlockSpec((1, hkv, 128), lambda i, s: (0, 0, 0)),
            pl.BlockSpec((hkv, bkB, hd), kvm),                   # cv
            pl.BlockSpec((1, hkv, 128), lambda i, s: (0, 0, 0)),
        ]) + [
            pl.BlockSpec((hg, wk_rows, dwp),
                         lambda i, s: (cgm(i, s), 0, 0)),        # wo3
            pl.BlockSpec((hg, hd // QK, wo_s.shape[2]),
                         lambda i, s: (cgm(i, s), 0, 0)),        # wo3 scales
            pl.BlockSpec((1, dp), lambda i, s: (0, 0)),          # g2
            pl.BlockSpec((dp, bfE), lambda i, s: (0, ffm(i, s))),
            pl.BlockSpec((dp // QK, bfE), lambda i, s: (0, ffm(i, s))),
            pl.BlockSpec((dp // QK, bfE), lambda i, s: (0, ffm(i, s))),
            pl.BlockSpec((bfE, dp // 2), lambda i, s: (ffm(i, s), 0)),
            pl.BlockSpec((max(bfE // QK, 1), dp),
                         lambda i, s: (ffm(i, s), 0)),
        ],
        out_specs=[
            pl.BlockSpec((8, dp), lambda i, s: (0, 0)),          # x_out
            pl.BlockSpec((hkv, hd), lambda i, s: (0, 0)),        # kcur
            pl.BlockSpec((hkv, hd), lambda i, s: (0, 0)),        # vcur
        ] + ([
            # aliased in-place cache updates: the 16-row window holding row
            # `pos`, flushed once at grid end — every other byte of the
            # cache stays the aliased input's (no copy: ck/cv are donated
            # to these outputs and have no other uses in the layer step)
            pl.BlockSpec((hkv, 16, hd), lambda i, s: (s[2], s[0] // 16, 0)),
            pl.BlockSpec((hkv, 16, hd), lambda i, s: (s[2], s[0] // 16, 0)),
        ] if write_cache else []),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),                   # inv rms
            pltpu.VMEM((8, n_qkv), jnp.float32),                 # acc qkv flat
            pltpu.VMEM((hq, hd), jnp.float32),                   # q heads
            pltpu.VMEM((2 * hkv, hd), jnp.float32),              # k/v cur
            pltpu.VMEM((hq, hd), jnp.int8),                      # q int8
            pltpu.VMEM((hq, 128), jnp.float32),                  # q scales
            pltpu.VMEM((hkv, hq // hkv, 128), jnp.float32),      # m
            pltpu.VMEM((hkv, hq // hkv, 128), jnp.float32),      # l
            pltpu.VMEM((hkv, hq // hkv, hd), jnp.float32),       # acc att
            pltpu.VMEM((hq, 1, hd), jnp.float32),                # att
            pltpu.VMEM((8, dp), jnp.float32),                    # acc wo/ffn
            pltpu.VMEM((8, dp), jnp.float32),                    # x2
            pltpu.VMEM((8, dp), jnp.float32),                    # xn2
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _layer_kernel, kind=kind, hq=hq, hkv=hkv, hd=hd,
            d_logical=d_logical, nA=nA, ncA=ncA, nC=nC, nE=nE, hg=hg,
            bkA=bkA, bkB=bkB, ckE=ckE, cdE=cdE, eps=eps, scale=scale,
            has_ffn=has_ffn, kv_i8=kv_i8, a_i8=a_i8,
            write_cache=write_cache),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, dp), jnp.float32),
            jax.ShapeDtypeStruct((hkv, hd), jnp.float32),
            jax.ShapeDtypeStruct((hkv, hd), jnp.float32),
        ] + ([
            jax.ShapeDtypeStruct(ck.shape, ck.dtype),
            jax.ShapeDtypeStruct(cv.shape, cv.dtype),
        ] if write_cache else []),
        # flattened-input indices INCLUDE the scalar-prefetch operand
        # (convention per jax pallas gmm): sarr=0, x=1, g1=2, acts 3-8,
        # qkv 9-11, rope 12-13, ck=14, cks=15, cv=16, cvs=17, ...
        input_output_aliases={14: 3, 16: 4} if write_cache else {},
        interpret=_interpret(),
    )(sarr, x, g1,
      *((xq_t, xq_t, xs_t, xs_t, xsum_t, xsum_t, qkv_q) if a_i8
        else (x, x, g1, g1, _dummy_a2(nsA), _dummy_a2(nsA), qkv_q)),
      qkv_s, qkv_s, cos2, sin2,
      ck, cks, cv, cvs, wo_q, wo_s, g2, gu_q, gs, us, dn_q, ds)


def attn_block_compatible(layer: dict, cfg, cache_k) -> bool:
    """Fast-path eligibility for one decode step (B == 1, bf16 cache)."""
    from zgml_tpu.quant.repack import PackedWeight
    if "wo3" not in layer or not isinstance(layer.get("wqkv"), PackedWeight):
        return False
    if isinstance(cache_k, tuple):
        # int8 cache: fused path needs the d-major whole-head-scale layout
        if cache_k[0].shape[2] != cfg.head_dim:
            return False
    wqkv: PackedWeight = layer["wqkv"]
    wo3: HeadPacked = layer["wo3"]
    if wqkv.kind != wo3.kind or wqkv.kind not in ("q4_0", "q8_0"):
        return False
    if cfg.head_dim % QK or cfg.head_dim < QK:
        return False
    htot = cfg.n_heads + 2 * cfg.n_kv_heads
    if wqkv.n_pad < htot * cfg.head_dim:
        return False
    dp = wqkv.k_pad
    wo_w = wo3.qvals.shape[2] * (2 if wo3.kind == "q4_0" else 1)
    if wo_w > dp:                # wo accumulator lives in [8, dp] scratch
        return False
    return True


def attn_block_step(cfg, layer, x, cache_k, cache_v, pos, cos2, sin2,
                    allow_ffn: bool = True, kv_layer=None):
    """One fused layer (or attention block). x [1, 1, d] f32; cache
    [1, hkv, S, hd] — or, with kv_layer set, the FULL STACKED cache
    [L, 1, hkv, S, hd]: the kernel reads layer slab `kv_layer` through its
    scalar-prefetch index maps (no per-layer slice, which would materialize
    a copy in front of the custom call), and the CALLER batches all layers'
    k_cur/v_cur into 2 dynamic_update_slices per step (the per-layer writes
    measured ~386us/token at 7B, tools/exp_scan.py).

    Returns (x_out [1, 1, d], k_cur [1, hkv, 1, hd], v_cur, did_ffn,
    new_cache_k, new_cache_v): with ZGML_TPU_LK_CACHEWRITE=1 on the
    unrolled bf16-cache path new_cache_k/v are the IN-PLACE-updated caches
    (aliased output blocks); otherwise None and the caller writes."""
    from zgml_tpu.quant.repack import PackedWeight
    wqkv: PackedWeight = layer["wqkv"]
    wo3: HeadPacked = layer["wo3"]
    hq, hkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    d = cfg.d_model
    dp = wqkv.k_pad
    # Whole-layer merge (FFN phases inside this kernel) is OFF by default:
    # measured slower than the attn-block + separate-FFN split at 1B
    # (1.62 vs 1.52 ms/step) — one kernel with every phase's inputs prefetches
    # ~4.5MB of later-phase block-0s before phase A can start.
    pack = layer.get("ffn_q4n")
    has_ffn = (allow_ffn and pack is not None and wqkv.kind == "q4_0"
               and pack["gu_q"].shape[0] == dp
               and config.layer_ffn())
    x2d = x.reshape(1, d).astype(jnp.float32)
    xp = jnp.pad(x2d, ((0, 7), (0, dp - d)))
    g1 = jnp.pad(layer["attn_norm"].reshape(1, d).astype(jnp.float32),
                 ((0, 0), (0, dp - d)))
    g2_raw = layer.get("ffn_norm")
    g2 = (jnp.pad(g2_raw.reshape(1, d).astype(jnp.float32),
                  ((0, 0), (0, dp - d)))
          if g2_raw is not None else jnp.zeros((1, dp), jnp.float32))
    # int8 A phase wins where the QKV weight is big enough that the f32
    # dequant VPU work shows (7B-class: +2.5% step; 1B: noise-level loss)
    a_i8 = config.attn_i8a(dp)
    if a_i8:
        # rmsnorm + per-32-block activation quantization OUTSIDE the kernel
        # (the int8 A phase is the ggml vec-dot tier; trading the norm
        # fusion for MXU-int8 projections wins at every measured scale)
        from zgml_tpu.ops.qmatmul import _quantize_act
        ms = jnp.sum(x2d * x2d, axis=1, keepdims=True) * (1.0 / d)
        xn = x2d * jax.lax.rsqrt(ms + cfg.rms_norm_eps) \
            * layer["attn_norm"].reshape(1, d).astype(jnp.float32)
        xn_p = jnp.pad(xn, ((0, 7), (0, dp - d)))
        xq, xs = _quantize_act(xn_p)
        nbk = dp // QK
        xq_t = xq.reshape(8, nbk, QK).transpose(1, 0, 2)
        xs_t = xs.T.astype(jnp.float32)
        xsum_t = jnp.sum(xq_t.astype(jnp.int32), axis=2)
        qkv_pass = wqkv.qvals.reshape(
            wqkv.qvals.shape[0] // QK, QK, wqkv.qvals.shape[1])
    else:
        nbk = dp // QK
        xq_t = jnp.zeros((nbk, 8, QK), jnp.int8)
        xs_t = jnp.zeros((nbk, 8), jnp.float32)
        xsum_t = jnp.zeros((nbk, 8), jnp.int32)
        qkv_pass = wqkv.qvals
    kv_i8 = isinstance(cache_k, tuple)
    if kv_i8:
        assert kv_layer is None, "int8 cache is unrolled-layout only"
        kq, ksc = cache_k
        vq, vsc = cache_v
        s_len = kq.shape[3]
        ck = kq.reshape(hkv, hd, s_len)
        cks = ksc.reshape(1, hkv, s_len)
        cv = vq.reshape(hkv, hd, s_len)
        cvs = vsc.reshape(1, hkv, s_len)
    elif kv_layer is not None:
        # stacked [L, 1, hkv, S, hd] cache viewed as [L*hkv, S, hd]; the
        # kernel's kv index maps pick slab kv_layer (scalar prefetch)
        L = cache_k.shape[0]
        s_len = cache_k.shape[3]
        ck = cache_k.reshape(L * hkv, s_len, hd)
        cks = jnp.zeros((1, hkv, 128), jnp.float32)
        cv = cache_v.reshape(L * hkv, s_len, hd)
        cvs = cks
    else:
        s_len = cache_k.shape[2]
        ck = cache_k.reshape(hkv, s_len, hd)
        cks = jnp.zeros((1, hkv, 128), jnp.float32)
        cv = cache_v.reshape(hkv, s_len, hd)
        cvs = cks
    if has_ffn:
        gu_q, gs, us = pack["gu_q"], pack["gs"], pack["us"]
        dn_q, ds = pack["dn_q"], pack["ds"]
    else:
        # dummy minimal FFN inputs (nE == 0; blocks still need legal shapes)
        gu_q = jnp.zeros((dp, 128), jnp.int8)
        gs = us = jnp.zeros((dp // QK, 128), jnp.float32)
        dn_q = jnp.zeros((128, dp // 2), jnp.int8)
        ds = jnp.zeros((max(128 // QK, 1), dp), jnp.float32)
    outs = _layer_call(
        xp, g1, xq_t, xs_t, xsum_t, qkv_pass, wqkv.scales, cos2, sin2,
        ck, cks, cv, cvs,
        wo3.qvals, wo3.scales, g2, gu_q, gs, us, dn_q, ds, pos,
        0 if kv_layer is None else kv_layer,
        kind=wqkv.kind, hq=hq, hkv=hkv, hd=hd, d_logical=d,
        s_len=s_len, eps=cfg.rms_norm_eps, dp=dp, has_ffn=has_ffn,
        kv_i8=kv_i8, a_i8=a_i8, tune=config.layer_tune(),
        cache_write=config.lk_cachewrite() and kv_layer is None)
    x_out, kcur, vcur = outs[:3]
    if len(outs) == 5:
        new_ck = outs[3].reshape(cache_k.shape)
        new_cv = outs[4].reshape(cache_v.shape)
    else:       # int8 tuple cache, or window-alignment fallback
        new_ck = new_cv = None
    x_out = x_out[0:1, :d].reshape(1, 1, d).astype(x.dtype)
    return (x_out,
            kcur.reshape(1, hkv, 1, hd),
            vcur.reshape(1, hkv, 1, hd),
            has_ffn, new_ck, new_cv)
