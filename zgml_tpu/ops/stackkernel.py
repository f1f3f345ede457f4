"""Stacked all-layers decode megacall: the ENTIRE transformer stack's decode
step (rmsnorm + QKV + RoPE + flash attention + output projection + rmsnorm +
SwiGLU FFN + residuals, for every layer) in ONE Pallas call.

Why: round-2 decode ran 2 fused kernels per layer + 2 XLA cache writes per
layer — 64 kernel launches + 64 XLA ops per token at 7B. Each launch pays
~3.6us fixed cost plus a pipeline ramp (first-block DMA latency while the
weight stream restarts), measured as kernels streaming 560-700 GB/s against a
634 GB/s probe. Folding the layer loop INTO the grid makes the whole 4.2 GB
weight stream one continuous pipelined DMA sequence: the per-layer ramp and
fixed costs are paid once per TOKEN, not once per layer.

Structure: flat grid of L * sp steps, sp = nA*ncA + n_b + nC + nE (n_b
dynamic, ceil(pos/bkB)). Step i serves layer l = i // sp, phase step
j = i - l*sp:

  j == 0 (layer prologue)   : finalize the previous layer's residual from
                              scratch (x += FFN acc), rmsnorm*gamma1, and
                              copy the normed row into K-major tiles
                              xt_scr[t] = xn[:, t*bkA:(t+1)*bkA] (STATIC lane
                              slices — the A phase then reads tiles by
                              dynamic SUBLANE index, which Mosaic supports;
                              dynamic LANE offsets would not legalize)
  A phase (nA*ncA steps)    : planar per-K-tile dequant dot into accq
  A epilogue                : regroup heads (static sub-lane slices), RoPE,
                              emit this layer's k/v rows to the kcur/vcur
                              [L, hkv, hd] outputs (cache write is ONE pair
                              of XLA dynamic_update_slices per TOKEN outside)
  B phase (dyn n_b steps)   : online-softmax flash over the cache prefix
  B epilogue                : self-attention column from registers, normalize
  C phase (nC steps)        : att @ wo3 head-group partials
  E transition              : x2 = x + attn_out; xn2 = rmsnorm(x2)*gamma2
  E phase (nE steps)        : N-packed Q4 FFN F-tiles
  last step of the grid     : x_out = x2 + ffn_acc

The per-layer "block-0 prefetch of all phases" cost that made the single-layer
whole-merge SLOWER (docs/perf-targets.md) is structural here: it is paid once
at grid start; at every layer boundary the next layer's first blocks prefetch
while the previous layer's phases still execute.

v1 scope: q4_0 weights (ffn_q4n pack attached), bf16 KV cache, batch 1,
f32 dequant A phase. Everything else falls back to the per-layer path.

ref: replaces the reference's per-layer decode sequence + command-stream
batching (llama_transformer.zig:192-253, program.zig:980-3185) with a single
device program per token — the logical endpoint of its 1,654-ops-to-242-
dispatches fusion war (docs perf-targets.md:56).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zgml_tpu import config
from zgml_tpu.ops.layerkernel import NEG_INF, _choose
from zgml_tpu.quant.blocks import QK


def _stack_kernel(
        sref,                                    # [4] i32: pos, sp, total, n_b
        x0_ref, g1_ref, g2_ref,                  # [8,dp], [L,1,dp] x2
        qkv_ref, qslo_ref, qshi_ref,             # planar wqkv stacked
        cos_ref, sin_ref,                        # [1, hd]
        ck_ref, cv_ref,                          # cache blocks
        wo_ref, wos_ref,                         # head-major wo3 blocks
        gu_ref, gs_ref, us_ref, dn_ref, ds_ref,  # N-packed FFN
        xout_ref, kcur_ref, vcur_ref,            # outputs
        x_scr, xt_scr, accq_scr, q2_scr, kv2_scr,
        m_scr, l_scr, acc_scr, att_scr, accwo_scr, x2_scr, xn2_scr,
        *, hq: int, hkv: int, hd: int, d_logical: int,
        nA: int, ncA: int, nC: int, nE: int, hg: int, bkA: int, bkB: int,
        ckE: int, cdE: int, eps: float, scale: float, n_tiles: int):
    i = pl.program_id(0)
    pos = sref[0]
    sp = sref[1]
    total = sref[2]
    n_b = sref[3]
    l_idx = i // sp
    j = i - l_idx * sp
    a_steps = nA * ncA
    b_end = a_steps + n_b
    c_end = b_end + nC
    nr = hq // hkv
    dp = x_scr.shape[1]

    # -- layer prologue ------------------------------------------------------
    @pl.when(j == 0)
    def _():
        @pl.when(i == 0)
        def _():
            x_scr[:] = x0_ref[:]

        @pl.when(i > 0)
        def _():
            x_scr[:] = x2_scr[:] + accwo_scr[:]   # prev layer: x2 + FFN acc

        x = x_scr[:]
        ms = jnp.sum(x * x, axis=1, keepdims=True) * (1.0 / d_logical)
        xn = x * jax.lax.rsqrt(ms + eps) * g1_ref[0]
        for t in range(n_tiles):                  # static lane slices
            xt_scr[t] = xn[:, t * bkA:(t + 1) * bkA]
        accq_scr[:] = jnp.zeros_like(accq_scr)
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        accwo_scr[:] = jnp.zeros_like(accwo_scr)

    # -- phase A: planar QKV projection --------------------------------------
    ncw = qkv_ref.shape[-1]
    for col in range(ncA):
        @pl.when((j >= col * nA) & (j < (col + 1) * nA))
        def _(col=col):
            row = j - col * nA
            v = pltpu.bitcast(qkv_ref[0], jnp.int32)
            msk = jnp.full(v.shape, 0x0F0F0F0F, jnp.int32)
            slo = jnp.repeat(qslo_ref[0], QK, axis=-2)
            shi = jnp.repeat(qshi_ref[0], QK, axis=-2)
            wlo = (pltpu.bitcast(v & msk, jnp.int8).astype(jnp.float32)
                   - 8.0) * slo
            whi = (pltpu.bitcast(
                jax.lax.shift_right_logical(
                    v, jnp.full(v.shape, 4, jnp.int32)) & msk,
                jnp.int8).astype(jnp.float32) - 8.0) * shi
            xlo = xt_scr[pl.ds(row, 1)][0]        # [8, bkA]
            xhi = xt_scr[pl.ds(nA + row, 1)][0]
            part = (jnp.dot(xlo, wlo, preferred_element_type=jnp.float32)
                    + jnp.dot(xhi, whi, preferred_element_type=jnp.float32))
            accq_scr[:, col * ncw:(col + 1) * ncw] += part

    # -- A epilogue: regroup heads, rope, emit K/V ---------------------------
    @pl.when(j == a_steps - 1)
    def _():
        nq = hq * hd
        nkv = hkv * hd
        for h in range(hq):
            q2_scr[h:h + 1, :] = accq_scr[0:1, h * hd:(h + 1) * hd]
        for h in range(hkv):
            kv2_scr[h:h + 1, :] = accq_scr[0:1, nq + h * hd: nq + (h + 1) * hd]
            kv2_scr[hkv + h:hkv + h + 1, :] = \
                accq_scr[0:1, nq + nkv + h * hd: nq + nkv + (h + 1) * hd]
        cos = cos_ref[:]                          # [1, hd] = [c, c]
        sin = sin_ref[:]                          # [1, hd] = [-s, s]
        q = q2_scr[:]
        q2_scr[:] = q * cos + pltpu.roll(q, hd // 2, 1) * sin
        kc = kv2_scr[:hkv, :]
        kcur_ref[0] = kc * cos + pltpu.roll(kc, hd // 2, 1) * sin
        vcur_ref[0] = kv2_scr[hkv:, :]

    # -- phase B: flash attention over the cache prefix ----------------------
    @pl.when((j >= a_steps) & (j < b_end))
    def _():
        kb = j - a_steps
        q3 = q2_scr[:].reshape(hkv, nr, hd)
        k = ck_ref[0].astype(jnp.float32)         # [hkv, bkB, hd]
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
        upd = jax.lax.dot_general(
            p, cv_ref[0].astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        acc_scr[:] = acc_scr[:] * alpha + upd

    # -- B epilogue: self column + normalize ---------------------------------
    @pl.when(j == b_end)
    def _():
        q3 = q2_scr[:].reshape(hkv, nr, hd)
        kc = kcur_ref[0]                          # rope'd [hkv, hd]
        s_self = jnp.sum(q3 * kc[:, None, :], axis=2,
                         keepdims=True) * scale
        m_prev = m_scr[:, :, :1]
        m_new = jnp.maximum(m_prev, s_self)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s_self - m_new)
        l = l_scr[:, :, :1] * alpha + p
        acc = acc_scr[:] * alpha + p * vcur_ref[0][:, None, :]
        safe = jnp.where(l > 0, l, 1.0)
        att_scr[:] = (acc / safe).reshape(hq, 1, hd)

    # -- phase C: output projection per head group ---------------------------
    @pl.when((j >= b_end) & (j < c_end))
    def _():
        cg = j - b_end
        att_g = att_scr[pl.ds(cg * hg, hg), :, :]  # [hg, 1, hd]
        dwp = wo_ref.shape[3]
        w = wo_ref[0]
        s = wos_ref[0]                             # [hg, hd/QK, dp]
        v = w.astype(jnp.int32)
        slo = jnp.repeat(s[:, :, :dwp], QK, axis=1)
        shi = jnp.repeat(s[:, :, dwp:2 * dwp], QK, axis=1)
        wlo = ((v & 15) - 8).astype(jnp.float32) * slo
        whi = (((v >> 4) & 15) - 8).astype(jnp.float32) * shi
        plo = jnp.sum(jax.lax.dot_general(
            att_g, wlo, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32), axis=0)   # [1, dwp]
        accwo_scr[:, :dwp] += plo
        phi = jnp.sum(jax.lax.dot_general(
            att_g, whi, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32), axis=0)
        accwo_scr[:, dwp:2 * dwp] += phi

    # -- E transition: attention residual + second norm ----------------------
    @pl.when(j == c_end)
    def _():
        x2 = x_scr[:] + accwo_scr[:]
        x2_scr[:] = x2
        ms = jnp.sum(x2 * x2, axis=1, keepdims=True) * (1.0 / d_logical)
        xn2_scr[:] = x2 * jax.lax.rsqrt(ms + eps) * g2_ref[0]
        accwo_scr[:] = jnp.zeros_like(accwo_scr)  # reused as FFN acc

    # -- phase E: N-packed Q4 FFN per F-tile ---------------------------------
    @pl.when(j >= c_end)
    def _():
        xn = xn2_scr
        m8 = xn.shape[0]
        hw = dp // 2
        bf = gu_ref.shape[2]
        nsb = ckE // QK
        accg = jnp.zeros((m8, bf), jnp.float32)
        accu = jnp.zeros((m8, bf), jnp.float32)
        for c in range(dp // ckE):
            v = gu_ref[0, c * ckE:(c + 1) * ckE, :].astype(jnp.int32)
            xs = xn[:, c * ckE:(c + 1) * ckE]
            sg = jnp.repeat(gs_ref[0, c * nsb:(c + 1) * nsb, :], QK, axis=0)
            su = jnp.repeat(us_ref[0, c * nsb:(c + 1) * nsb, :], QK, axis=0)
            wg = ((v & 15) - 8).astype(jnp.float32) * sg
            wu = (((v >> 4) & 15) - 8).astype(jnp.float32) * su
            accg += jnp.dot(xs, wg, preferred_element_type=jnp.float32)
            accu += jnp.dot(xs, wu, preferred_element_type=jnp.float32)
        act = accu * (accg * jax.nn.sigmoid(accg))
        for c in range(hw // cdE):
            dv = dn_ref[0, :, c * cdE:(c + 1) * cdE].astype(jnp.int32)
            sl = jnp.repeat(ds_ref[0, :, c * cdE:(c + 1) * cdE], QK, axis=0)
            sh = jnp.repeat(
                ds_ref[0, :, hw + c * cdE: hw + (c + 1) * cdE], QK, axis=0)
            wl = ((dv & 15) - 8).astype(jnp.float32) * sl
            wh = (((dv >> 4) & 15) - 8).astype(jnp.float32) * sh
            accwo_scr[:, c * cdE:(c + 1) * cdE] += jnp.dot(
                act, wl, preferred_element_type=jnp.float32)
            accwo_scr[:, hw + c * cdE: hw + (c + 1) * cdE] += jnp.dot(
                act, wh, preferred_element_type=jnp.float32)

    # -- final epilogue (last step of the whole grid) -------------------------
    @pl.when(i == total - 1)
    def _():
        xout_ref[:] = x2_scr[:] + accwo_scr[:]


@functools.partial(
    jax.jit,
    static_argnames=("hq", "hkv", "hd", "d_logical", "s_len", "eps",
                     "dp", "n_layers"))
def _stack_call(x, g1s, g2s, qkv_q, qkv_s, cos2, sin2, ck, cv,
                wo_q, wo_s, gu_q, gs, us, dn_q, ds, pos,
                *, hq: int, hkv: int, hd: int, d_logical: int,
                s_len: int, eps: float, dp: int, n_layers: int):
    """x [8, dp] f32 (row 0 live); every weight stacked [L, ...]; cache
    ck/cv [L, hkv, S, hd] bf16. Returns (x_out [8, dp],
    kcur [L, hkv, hd] f32, vcur [L, hkv, hd] f32)."""
    L = n_layers
    kq = qkv_q.shape[1]                  # packed K rows (Kp/2 for q4)
    n_qkv = qkv_q.shape[2]
    wk_rows = wo_q.shape[2]              # hd
    dwp = wo_q.shape[3]                  # dp/2 (q4 N-pair packed)
    fp = dn_q.shape[1]

    bkA = _choose(kq, 256, 256) if kq >= 256 else kq
    n_tiles_half = kq // bkA             # nA

    def vmem_est(bkb, hg, bfE, nca):
        qkv = (bkA * n_qkv + 2 * max(bkA // QK, 8) * n_qkv * 4) // nca
        cache = 2 * hkv * bkb * hd * 2
        wo = hg * wk_rows * dwp + hg * (hd // QK) * dp * 4
        ffn = (dp * bfE + bfE * (dp // 2) + 2 * (dp // QK) * bfE * 4
               + max(bfE // QK, 8) * dp * 4)
        xviews = 8 * dp * 4 + 2 * dp * 4
        outs = 8 * dp * 4 + 2 * hkv * hd * 4
        scr = (8 * dp + 2 * n_tiles_half * 8 * bkA + 8 * n_qkv
               + (hq + 2 * hkv) * hd
               + 3 * hkv * (hq // hkv) * 128 + hkv * (hq // hkv) * hd
               + hq * hd + 3 * 8 * dp) * 4
        return 2 * (qkv + cache + wo + ffn + xviews + outs) + scr

    budget = 6 << 20
    bkB, hg, bfE, ncA = 256, hq, 512, 1
    for _ in range(14):
        bkB_e = _choose(s_len, bkB, 8)
        hg_e = hg
        while hq % hg_e:
            hg_e -= 1
        bfE_e = _choose(fp, bfE, 256)
        if vmem_est(bkB_e, hg_e, bfE_e, ncA) <= budget:
            break
        if ncA < 4 and (n_qkv // (2 * ncA)) % 128 == 0:
            ncA *= 2
        elif hg_e > max(1, hq // 8):
            hg = max(1, hg_e // 2)
        elif bfE_e > 256:
            bfE = bfE_e // 2
        elif bkB_e > 64:
            bkB = bkB_e // 2
        elif hg_e > 1:
            hg = max(1, hg_e // 2)
        else:
            break
    bkB, hg, bfE = bkB_e, hg_e, bfE_e
    nA = kq // bkA
    ncw = n_qkv // ncA
    nC = hq // hg
    nE = fp // bfE
    ckE = _choose(dp, 1024, 256)
    cdE = _choose(dp // 2, 1024, 256)
    scale = 1.0 / (hd ** 0.5)
    n_b = jnp.clip((jnp.maximum(pos, 1) + bkB - 1) // bkB,
                   1, s_len // bkB).astype(jnp.int32)
    a_steps = nA * ncA
    sp = a_steps + n_b + nC + nE
    total = n_layers * sp
    sarr = jnp.stack([jnp.asarray(pos, jnp.int32).reshape(()),
                      sp.astype(jnp.int32), total.astype(jnp.int32), n_b])
    nsA = max(bkA // QK, 1)

    def _lj(i, s):
        l = i // s[1]
        return l, i - l * s[1]

    def _rowcol(i, s):
        _, j = _lj(i, s)
        ka = jnp.minimum(j, a_steps - 1)
        col = ka // nA
        return ka - col * nA, col

    def wqm(i, s):
        row, col = _rowcol(i, s)
        return (_lj(i, s)[0], row, col)

    def wqs_lo(i, s):
        row, col = _rowcol(i, s)
        return (_lj(i, s)[0], row, col)

    def wqs_hi(i, s):
        row, col = _rowcol(i, s)
        return (_lj(i, s)[0], row + nA, col)

    def kvm(i, s):
        l, j = _lj(i, s)
        return (l, 0, jnp.clip(j - a_steps, 0, s[3] - 1), 0)

    def cgm(i, s):
        l, j = _lj(i, s)
        return (l, jnp.clip(j - a_steps - s[3], 0, nC - 1), 0, 0)

    def ffm(i, s):
        l, j = _lj(i, s)
        return l, jnp.clip(j - a_steps - s[3] - nC, 0, nE - 1)

    def lmap(i, s):
        return (_lj(i, s)[0], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(total,),
        in_specs=[
            pl.BlockSpec((8, dp), lambda i, s: (0, 0)),            # x0
            pl.BlockSpec((1, 1, dp), lmap),                        # g1
            pl.BlockSpec((1, 1, dp), lmap),                        # g2
            pl.BlockSpec((1, bkA, ncw), wqm),                      # wqkv
            pl.BlockSpec((1, nsA, ncw), wqs_lo),
            pl.BlockSpec((1, nsA, ncw), wqs_hi),
            pl.BlockSpec((1, hd), lambda i, s: (0, 0)),            # cos2
            pl.BlockSpec((1, hd), lambda i, s: (0, 0)),            # sin2
            pl.BlockSpec((1, hkv, bkB, hd), kvm),                  # ck
            pl.BlockSpec((1, hkv, bkB, hd), kvm),                  # cv
            pl.BlockSpec((1, hg, wk_rows, dwp),
                         lambda i, s: cgm(i, s)),                  # wo3
            pl.BlockSpec((1, hg, hd // QK, wo_s.shape[3]),
                         lambda i, s: cgm(i, s)),                  # wo3 scales
            pl.BlockSpec((1, dp, bfE),
                         lambda i, s: (ffm(i, s)[0], 0, ffm(i, s)[1])),
            pl.BlockSpec((1, dp // QK, bfE),
                         lambda i, s: (ffm(i, s)[0], 0, ffm(i, s)[1])),
            pl.BlockSpec((1, dp // QK, bfE),
                         lambda i, s: (ffm(i, s)[0], 0, ffm(i, s)[1])),
            pl.BlockSpec((1, bfE, dp // 2),
                         lambda i, s: (ffm(i, s)[0], ffm(i, s)[1], 0)),
            pl.BlockSpec((1, max(bfE // QK, 1), dp),
                         lambda i, s: (ffm(i, s)[0], ffm(i, s)[1], 0)),
        ],
        out_specs=[
            pl.BlockSpec((8, dp), lambda i, s: (0, 0)),            # x_out
            pl.BlockSpec((1, hkv, hd), lmap),                      # kcur
            pl.BlockSpec((1, hkv, hd), lmap),                      # vcur
        ],
        scratch_shapes=[
            pltpu.VMEM((8, dp), jnp.float32),                      # x
            pltpu.VMEM((2 * nA, 8, bkA), jnp.float32),             # xn tiles
            pltpu.VMEM((8, n_qkv), jnp.float32),                   # acc qkv
            pltpu.VMEM((hq, hd), jnp.float32),                     # q heads
            pltpu.VMEM((2 * hkv, hd), jnp.float32),                # k/v cur
            pltpu.VMEM((hkv, hq // hkv, 128), jnp.float32),        # m
            pltpu.VMEM((hkv, hq // hkv, 128), jnp.float32),        # l
            pltpu.VMEM((hkv, hq // hkv, hd), jnp.float32),         # acc att
            pltpu.VMEM((hq, 1, hd), jnp.float32),                  # att
            pltpu.VMEM((8, dp), jnp.float32),                      # acc wo/ffn
            pltpu.VMEM((8, dp), jnp.float32),                      # x2
            pltpu.VMEM((8, dp), jnp.float32),                      # xn2
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _stack_kernel, hq=hq, hkv=hkv, hd=hd, d_logical=d_logical,
            nA=nA, ncA=ncA, nC=nC, nE=nE, hg=hg, bkA=bkA, bkB=bkB,
            ckE=ckE, cdE=cdE, eps=eps, scale=scale, n_tiles=2 * nA),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, dp), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, hkv, hd), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, hkv, hd), jnp.float32),
        ],
        interpret=config.interpret(),
    )(sarr, x, g1s, g2s, qkv_q, qkv_s, qkv_s, cos2, sin2,
      ck, cv, wo_q, wo_s, gu_q, gs, us, dn_q, ds)


# -- host-side stacking + dispatch --------------------------------------------

def stack_llama_layers(params: dict, cfg) -> dict | None:
    """Build the stacked [L, ...] weight dict for the megacall from unrolled
    per-layer dicts. Host-side numpy when leaves are numpy; device stack when
    they are jax arrays (one transient copy per leaf kind).

    Returns None when any layer is incompatible (non-q4_0, missing ffn_q4n /
    wo3 views, mismatched padding)."""
    from zgml_tpu.quant.headmajor import HeadPacked
    from zgml_tpu.quant.repack import PackedWeight

    layers = params.get("layers")
    if not isinstance(layers, (list, tuple)) or not layers:
        return None
    hq, hkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    d = cfg.d_model
    first = layers[0]
    wqkv0 = first.get("wqkv")
    if not isinstance(wqkv0, PackedWeight) or wqkv0.kind != "q4_0":
        return None
    dp = wqkv0.k_pad
    if dp % 512 or hd % QK or hd < QK:
        return None
    htot = hq + 2 * hkv
    if wqkv0.n_pad < htot * hd:
        return None
    for layer in layers:
        w = layer.get("wqkv")
        wo3 = layer.get("wo3")
        pack = layer.get("ffn_q4n")
        if (not isinstance(w, PackedWeight) or w.kind != "q4_0"
                or w.k_pad != dp or w.n_pad != wqkv0.n_pad
                or not isinstance(wo3, HeadPacked) or wo3.kind != "q4_0"
                or pack is None or pack["gu_q"].shape[0] != dp
                or wo3.qvals.shape[2] * 2 > dp):
            return None

    def stack(get):
        leaves = [np.asarray(get(layer)) for layer in layers]
        return jnp.asarray(np.stack(leaves))

    def stack_s(get):
        # this kernel family predates f16-bit scale storage: upcast to f32
        from zgml_tpu.quant.repack import scales_f32_np
        leaves = [scales_f32_np(get(layer)) for layer in layers]
        return jnp.asarray(np.stack(leaves))

    pad1 = lambda a: np.pad(np.asarray(a, np.float32).reshape(1, d),  # noqa
                            ((0, 0), (0, dp - d)))
    return {
        "g1s": stack(lambda la: pad1(la["attn_norm"])),
        "g2s": stack(lambda la: pad1(la["ffn_norm"])),
        "qkv_q": stack(lambda la: la["wqkv"].qvals),
        "qkv_s": stack_s(lambda la: la["wqkv"].scales),
        "wo_q": stack(lambda la: la["wo3"].qvals),
        "wo_s": stack_s(lambda la: la["wo3"].scales),
        "gu_q": stack(lambda la: la["ffn_q4n"]["gu_q"]),
        "gs": stack_s(lambda la: la["ffn_q4n"]["gs"]),
        "us": stack_s(lambda la: la["ffn_q4n"]["us"]),
        "dn_q": stack(lambda la: la["ffn_q4n"]["dn_q"]),
        "ds": stack_s(lambda la: la["ffn_q4n"]["ds"]),
    }


def stacked_decode_step(cfg, stacked: dict, x, cache_k, cache_v, pos,
                        cos, sin):
    """One full-stack decode step. x [1, 1, d] f32; cache [L, 1, hkv, S, hd]
    bf16 (stacked). Returns (x_out [1, 1, d], new_cache_k, new_cache_v).

    The KV write is ONE dynamic_update_slice per cache (vs 2 per LAYER on the
    per-layer path)."""
    from zgml_tpu.runtime.profile import global_profile
    global_profile.count_op("stack_decode", "pallas")
    hq, hkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    d = cfg.d_model
    dp = stacked["g1s"].shape[2]          # padded model width
    L = cfg.n_layers
    s_len = cache_k.shape[-2]
    half = cos.shape[-1]
    c2 = jnp.concatenate([cos, cos], -1).reshape(1, 2 * half)
    s2 = jnp.concatenate([-sin, sin], -1).reshape(1, 2 * half)
    xp = jnp.pad(x.reshape(1, d).astype(jnp.float32), ((0, 7), (0, dp - d)))
    x_out, kcur, vcur = _stack_call(
        xp, stacked["g1s"], stacked["g2s"], stacked["qkv_q"],
        stacked["qkv_s"], c2, s2,
        cache_k.reshape(L, hkv, s_len, hd), cache_v.reshape(L, hkv, s_len, hd),
        stacked["wo_q"], stacked["wo_s"], stacked["gu_q"], stacked["gs"],
        stacked["us"], stacked["dn_q"], stacked["ds"], pos,
        hq=hq, hkv=hkv, hd=hd, d_logical=d, s_len=s_len,
        eps=cfg.rms_norm_eps, dp=dp, n_layers=L)
    upd_k = kcur.reshape(L, 1, hkv, 1, hd).astype(cache_k.dtype)
    upd_v = vcur.reshape(L, 1, hkv, 1, hd).astype(cache_v.dtype)
    cache_k = jax.lax.dynamic_update_slice(cache_k, upd_k, (0, 0, 0, pos, 0))
    cache_v = jax.lax.dynamic_update_slice(cache_v, upd_v, (0, 0, 0, pos, 0))
    return (x_out[0:1, :d].reshape(1, 1, d).astype(x.dtype),
            cache_k, cache_v)
