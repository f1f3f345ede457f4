"""Fused SwiGLU FFN megakernel: gate/up dequant-matmuls + silu·mul + down
dequant-matmul in ONE Pallas launch.

Decode on small models is custom-call-overhead-bound (~1.7us per call on this
chip, measured); collapsing the FFN's three launches into one is the analog of
the reference's Metal projection-group batching (program.zig:980-1485) done at
the kernel level instead of the command-stream level.

Layout contract (enforced by the loader): w_gate_up is a part-padded fused
PackedWeight [Dp, 2*Fp] (columns [0,Fp)=gate+zeros, [Fp,2Fp)=up+zeros) and
w_down is [Fp, Dp] — so F-tiles of gate/up align 1:1 with K-tiles of down, and
zero-padded F columns contribute silu(0)*0 = 0. Q8_0 and Q4_0 (the Q4 variant
grids over PACKED down-row tiles; see the _ffn_q4_kernel block comment).

Grid: (M-tiles, F-tiles). Per step: K-chunked gate/up dots, SwiGLU on the VPU,
D-chunked down-projection accumulated into a [bm, Dp] VMEM scratch.
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
from zgml_tpu.quant.repack import PackedWeight

from zgml_tpu import config
from zgml_tpu.ops.scalecodec import kscale_f32


def _interpret() -> bool:
    return config.interpret()


def _ffn_kernel(x_ref, g_ref, gq_ref, gs_ref, uq_ref, us_ref, dq_ref, ds_ref,
                o_ref, acc_ref, xn_scr, *, nf: int, ck: int, cd: int,
                out_dtype, norm_eps, d_logical: int, residual: bool):
    ff = pl.program_id(1)

    @pl.when(ff == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if norm_eps is not None:
            # fused rmsnorm prologue (one less launch + roundtrip per layer)
            xr = x_ref[:]
            ms = jnp.sum(xr * xr, axis=1, keepdims=True) * (1.0 / d_logical)
            xn_scr[:] = xr * jax.lax.rsqrt(ms + norm_eps) * g_ref[:]
        else:
            xn_scr[:] = x_ref[:]

    xn = xn_scr
    m, dp = xn.shape
    bf = gq_ref.shape[1]
    accg = jnp.zeros((m, bf), jnp.float32)
    accu = jnp.zeros((m, bf), jnp.float32)
    for c in range(dp // ck):           # K-chunked gate/up dots (unrolled)
        xs = xn[:, c * ck:(c + 1) * ck]
        sg = jnp.repeat(kscale_f32(gs_ref[c * ck // QK:(c + 1) * ck // QK, :]),
                        QK, axis=0)
        wg = gq_ref[c * ck:(c + 1) * ck, :].astype(jnp.float32) * sg
        accg += jnp.dot(xs, wg, preferred_element_type=jnp.float32)
        su = jnp.repeat(kscale_f32(us_ref[c * ck // QK:(c + 1) * ck // QK, :]),
                        QK, axis=0)
        wu = uq_ref[c * ck:(c + 1) * ck, :].astype(jnp.float32) * su
        accu += jnp.dot(xs, wu, preferred_element_type=jnp.float32)

    act = accu * (accg * jax.nn.sigmoid(accg))      # silu(gate) * up

    for c in range(dp // cd):           # D-chunked down projection (unrolled)
        sd = jnp.repeat(kscale_f32(ds_ref[:, c * cd:(c + 1) * cd]), QK, axis=0)
        wd = dq_ref[:, c * cd:(c + 1) * cd].astype(jnp.float32) * sd
        acc_ref[:, c * cd:(c + 1) * cd] += jnp.dot(
            act, wd, preferred_element_type=jnp.float32)

    @pl.when(ff == nf - 1)
    def _():
        out = acc_ref[:]
        if residual:
            out = out + x_ref[:]            # raw (pre-norm) x
        o_ref[:] = out.astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("bm", "bf", "ck", "cd", "out_dtype",
                                    "norm_eps", "d_logical", "residual"))
def _ffn(x, g, gu_q, gu_s, d_q, d_s, *, bm: int, bf: int, ck: int, cd: int,
         out_dtype, norm_eps=None, d_logical: int = 1,
         residual: bool = False):
    """x [M, Dp]; g [1, Dp]; gu_q int8 [Dp, 2*Fp]; d_q int8 [Fp, Dp]."""
    m, dp = x.shape
    fp = d_q.shape[0]
    nf = fp // bf
    half_blocks = gu_q.shape[1] // 2 // bf   # up half starts nf blocks in

    return pl.pallas_call(
        functools.partial(_ffn_kernel, nf=nf, ck=ck, cd=cd,
                          out_dtype=out_dtype, norm_eps=norm_eps,
                          d_logical=d_logical, residual=residual),
        grid=(m // bm, nf),
        in_specs=[
            pl.BlockSpec((bm, dp), lambda mb, ff: (mb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dp), lambda mb, ff: (0, 0),
                         memory_space=pltpu.VMEM),       # norm gamma
            pl.BlockSpec((dp, bf), lambda mb, ff: (0, ff),
                         memory_space=pltpu.VMEM),       # gate qvals
            pl.BlockSpec((dp // QK, bf), lambda mb, ff: (0, ff),
                         memory_space=pltpu.VMEM),       # gate scales
            pl.BlockSpec((dp, bf), lambda mb, ff, hb=half_blocks: (0, ff + hb),
                         memory_space=pltpu.VMEM),       # up qvals
            pl.BlockSpec((dp // QK, bf), lambda mb, ff, hb=half_blocks:
                         (0, ff + hb), memory_space=pltpu.VMEM),  # up scales
            pl.BlockSpec((bf, dp), lambda mb, ff: (ff, 0),
                         memory_space=pltpu.VMEM),       # down qvals
            pl.BlockSpec((bf // QK, dp), lambda mb, ff: (ff, 0),
                         memory_space=pltpu.VMEM),       # down scales
        ],
        out_specs=pl.BlockSpec((bm, dp), lambda mb, ff: (mb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, dp), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, dp), jnp.float32),
                        pltpu.VMEM((bm, dp), jnp.float32)],
        interpret=_interpret(),
    )(x, g, gu_q, gu_s, gu_q, gu_s, d_q, d_s)


# -- Q4_0 megakernel ----------------------------------------------------------
#
# The Q4 planar layout half-splits along K globally (repack.py): a packed byte
# row j of a [Kp/2, N] weight covers k=j (lo nibble) and k=j+Kp/2 (hi). For
# w_down that K axis is F — so one packed row tile [bf, Dp] consumes act
# values from TWO F ranges, [ff*bf, ..) and [Fp/2 + ff*bf, ..). The kernel
# therefore computes gate/up for BOTH ranges per grid step (4 column tiles:
# gate-lo/gate-hi/up-lo/up-hi), applies SwiGLU to each, and feeds the two act
# halves to the down tile's lo/hi nibbles. Grid: (M-tiles, (Fp/2)//bf).

def _ffn_q4_kernel(x_ref, g_ref, glo_ref, ghi_ref, ulo_ref, uhi_ref,
                   gslo_ref, gshi_ref, uslo_ref, ushi_ref,
                   dq_ref, dslo_ref, dshi_ref, o_ref, acc_ref, xn_scr,
                   *, nf: int, ck: int, cd: int, out_dtype,
                   norm_eps, d_logical: int, residual: bool):
    ff = pl.program_id(1)

    @pl.when(ff == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if norm_eps is not None:
            xr = x_ref[:]
            ms = jnp.sum(xr * xr, axis=1, keepdims=True) * (1.0 / d_logical)
            xn_scr[:] = xr * jax.lax.rsqrt(ms + norm_eps) * g_ref[:]
        else:
            xn_scr[:] = x_ref[:]

    xn = xn_scr
    m, dp = xn.shape
    kh = dp // 2                     # packed K rows of gate/up
    bf = glo_ref.shape[1]

    def gu_dot(w_ref, s_ref):
        acc = jnp.zeros((m, bf), jnp.float32)
        nsb = ck // QK
        for c in range(kh // ck):
            xlo = xn[:, c * ck:(c + 1) * ck]
            xhi = xn[:, kh + c * ck: kh + (c + 1) * ck]
            v = w_ref[c * ck:(c + 1) * ck, :].astype(jnp.int32)
            sl = jnp.repeat(kscale_f32(s_ref[c * nsb:(c + 1) * nsb, :]),
                            QK, axis=0)
            sh = jnp.repeat(
                kscale_f32(s_ref[kh // QK + c * nsb: kh // QK + (c + 1) * nsb,
                                 :]), QK, axis=0)
            wl = ((v & 15) - 8).astype(jnp.float32) * sl
            wh = (((v >> 4) & 15) - 8).astype(jnp.float32) * sh
            acc += (jnp.dot(xlo, wl, preferred_element_type=jnp.float32)
                    + jnp.dot(xhi, wh, preferred_element_type=jnp.float32))
        return acc

    g_lo = gu_dot(glo_ref, gslo_ref)
    g_hi = gu_dot(ghi_ref, gshi_ref)
    u_lo = gu_dot(ulo_ref, uslo_ref)
    u_hi = gu_dot(uhi_ref, ushi_ref)
    act_lo = u_lo * (g_lo * jax.nn.sigmoid(g_lo))
    act_hi = u_hi * (g_hi * jax.nn.sigmoid(g_hi))

    for c in range(dp // cd):
        v = dq_ref[:, c * cd:(c + 1) * cd].astype(jnp.int32)
        sl = jnp.repeat(kscale_f32(dslo_ref[:, c * cd:(c + 1) * cd]),
                        QK, axis=0)
        sh = jnp.repeat(kscale_f32(dshi_ref[:, c * cd:(c + 1) * cd]),
                        QK, axis=0)
        wl = ((v & 15) - 8).astype(jnp.float32) * sl
        wh = (((v >> 4) & 15) - 8).astype(jnp.float32) * sh
        acc_ref[:, c * cd:(c + 1) * cd] += (
            jnp.dot(act_lo, wl, preferred_element_type=jnp.float32)
            + jnp.dot(act_hi, wh, preferred_element_type=jnp.float32))

    @pl.when(ff == nf - 1)
    def _():
        out = acc_ref[:]
        if residual:
            out = out + x_ref[:]            # raw (pre-norm) x
        o_ref[:] = out.astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("bm", "bf", "ck", "cd", "out_dtype",
                                    "norm_eps", "d_logical", "residual"))
def _ffn_q4(x, g, gu_q, gu_s, d_q, d_s, *, bm: int, bf: int, ck: int, cd: int,
            out_dtype, norm_eps=None, d_logical: int = 1,
            residual: bool = False):
    """x [M, Dp]; gu_q int8 [Dp/2, 2*Fp] (K-half-split packed); d_q int8
    [Fp/2, Dp] (F-half-split packed)."""
    m, dp = x.shape
    kh = dp // 2
    fp = d_q.shape[0] * 2
    nf = (fp // 2) // bf
    nfh = nf                          # blocks per F-half, in bf units

    gcol = lambda off: (lambda mb, ff, o=off: (0, ff + o))       # noqa: E731
    return pl.pallas_call(
        functools.partial(_ffn_q4_kernel, nf=nf, ck=ck, cd=cd,
                          out_dtype=out_dtype, norm_eps=norm_eps,
                          d_logical=d_logical, residual=residual),
        grid=(m // bm, nf),
        in_specs=[
            pl.BlockSpec((bm, dp), lambda mb, ff: (mb, 0),
                         memory_space=pltpu.VMEM),                # x
            pl.BlockSpec((1, dp), lambda mb, ff: (0, 0),
                         memory_space=pltpu.VMEM),                # gamma
            pl.BlockSpec((kh, bf), gcol(0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, bf), gcol(nfh), memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, bf), gcol(2 * nfh), memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, bf), gcol(3 * nfh), memory_space=pltpu.VMEM),
            pl.BlockSpec((dp // QK, bf), gcol(0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dp // QK, bf), gcol(nfh), memory_space=pltpu.VMEM),
            pl.BlockSpec((dp // QK, bf), gcol(2 * nfh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp // QK, bf), gcol(3 * nfh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bf, dp), lambda mb, ff: (ff, 0),
                         memory_space=pltpu.VMEM),                # down qvals
            pl.BlockSpec((bf // QK, dp), lambda mb, ff: (ff, 0),
                         memory_space=pltpu.VMEM),                # down s lo
            pl.BlockSpec((bf // QK, dp), lambda mb, ff, o=nfh: (ff + o, 0),
                         memory_space=pltpu.VMEM),                # down s hi
        ],
        out_specs=pl.BlockSpec((bm, dp), lambda mb, ff: (mb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, dp), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, dp), jnp.float32),
                        pltpu.VMEM((bm, dp), jnp.float32)],
        interpret=_interpret(),
    )(x, g, gu_q, gu_q, gu_q, gu_q, gu_s, gu_s, gu_s, gu_s, d_q, d_s, d_s)


# -- Q4_0 N-packed megakernel (decode) ----------------------------------------
#
# The planar K-half-split q4 kernel streams 4 narrow gate/up column tiles per
# F step (bf-byte HBM runs; ~550 GB/s at 7B). The N-packed layout
# (quant/headmajor.ffn_npack) pairs nibbles so one [Dp, bf] tile carries BOTH
# gate and up (runs = bf bytes but half as many tiles, double bf in the same
# VMEM), and down pairs along the OUTPUT axis ([Fp, Dp/2]: full-width
# contiguous rows, act feeds once, two output column groups).

def _ffn_q4n_kernel(x_ref, g_ref, gu_ref, gs_ref, us_ref, dn_ref, ds_ref,
                    o_ref, acc_ref, xn_scr, *, nf: int, ck: int, cd: int,
                    out_dtype, norm_eps, d_logical: int, residual: bool):
    ff = pl.program_id(1)

    @pl.when(ff == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if norm_eps is not None:
            xr = x_ref[:]
            ms = jnp.sum(xr * xr, axis=1, keepdims=True) * (1.0 / d_logical)
            xn_scr[:] = xr * jax.lax.rsqrt(ms + norm_eps) * g_ref[:]
        else:
            xn_scr[:] = x_ref[:]

    xn = xn_scr
    m, dp = xn.shape
    hw = dp // 2
    bf = gu_ref.shape[1]
    nsb = ck // QK
    accg = jnp.zeros((m, bf), jnp.float32)
    accu = jnp.zeros((m, bf), jnp.float32)
    for c in range(dp // ck):
        v = gu_ref[c * ck:(c + 1) * ck, :].astype(jnp.int32)
        xs = xn[:, c * ck:(c + 1) * ck]
        sg = jnp.repeat(kscale_f32(gs_ref[c * nsb:(c + 1) * nsb, :]),
                        QK, axis=0)
        su = jnp.repeat(kscale_f32(us_ref[c * nsb:(c + 1) * nsb, :]),
                        QK, axis=0)
        wg = ((v & 15) - 8).astype(jnp.float32) * sg
        wu = (((v >> 4) & 15) - 8).astype(jnp.float32) * su
        accg += jnp.dot(xs, wg, preferred_element_type=jnp.float32)
        accu += jnp.dot(xs, wu, preferred_element_type=jnp.float32)
    act = accu * (accg * jax.nn.sigmoid(accg))

    for c in range(hw // cd):
        dv = dn_ref[:, c * cd:(c + 1) * cd].astype(jnp.int32)
        sl = jnp.repeat(kscale_f32(ds_ref[:, c * cd:(c + 1) * cd]),
                        QK, axis=0)
        sh = jnp.repeat(kscale_f32(ds_ref[:, hw + c * cd: hw + (c + 1) * cd]),
                        QK, axis=0)
        wl = ((dv & 15) - 8).astype(jnp.float32) * sl
        wh = (((dv >> 4) & 15) - 8).astype(jnp.float32) * sh
        acc_ref[:, c * cd:(c + 1) * cd] += jnp.dot(
            act, wl, preferred_element_type=jnp.float32)
        acc_ref[:, hw + c * cd: hw + (c + 1) * cd] += jnp.dot(
            act, wh, preferred_element_type=jnp.float32)

    @pl.when(ff == nf - 1)
    def _():
        out = acc_ref[:]
        if residual:
            out = out + x_ref[:]
        o_ref[:] = out.astype(out_dtype)


# -- int8-activation gate/up phase (the ggml vec-dot tier, decode) ------------
#
# The f32-dequant gate/up loop above costs ~4-5 VPU ops per weight element;
# at 7B that VPU work marginally exceeds the tile DMA time, so the kernel
# streams at ~520 GB/s vs the attention kernel's ~600 (device-trace measured,
# round 5). Same fix as the layer kernel's A phase (layerkernel.py:148-186):
# activations quantized per-32-block OUTSIDE (rmsnorm folded in), int8
# segmented dots on the MXU, per-block scale fixup on the int32 partials —
# SWAR unpack is the only per-element VPU work left. The down projection
# keeps the f32 path: its unpack fits under its own DMA window.

def _ffn_q4n_i8_kernel(x_ref, xq_ref, xs_ref, xsum_ref, gu3_ref, gs_ref,
                       us_ref, dn_ref, ds_ref, o_ref, acc_ref,
                       *, nf: int, ck: int, cd: int, out_dtype,
                       residual: bool):
    ff = pl.program_id(1)

    @pl.when(ff == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    m = x_ref.shape[0]
    dp = x_ref.shape[1]
    hw = dp // 2
    bf = gs_ref.shape[1]
    nsb = ck // QK                       # 32-blocks per K chunk
    nbk = dp // QK
    accg = jnp.zeros((m, bf), jnp.float32)
    accu = jnp.zeros((m, bf), jnp.float32)
    dn = (((2,), (1,)), ((0,), (0,)))
    for c in range(nbk // nsb):
        vv = gu3_ref[c * nsb:(c + 1) * nsb]          # [nsb, QK, bf] packed
        v32 = pltpu.bitcast(vv, jnp.int32)
        msk = jnp.full(v32.shape, 0x0F0F0F0F, jnp.int32)
        wg = pltpu.bitcast(v32 & msk, jnp.int8)      # gate = lo nibble
        wu = pltpu.bitcast(
            jax.lax.shift_right_logical(
                v32, jnp.full(v32.shape, 4, jnp.int32)) & msk, jnp.int8)
        aq = xq_ref[c * nsb:(c + 1) * nsb]           # [nsb, m, QK] int8
        xsb = xs_ref[c * nsb:(c + 1) * nsb]          # [nsb, m] f32
        sg = kscale_f32(gs_ref[c * nsb:(c + 1) * nsb])   # [nsb, bf]
        su = kscale_f32(us_ref[c * nsb:(c + 1) * nsb])
        pg = jax.lax.dot_general(aq, wg, dn, preferred_element_type=jnp.int32)
        pu = jax.lax.dot_general(aq, wu, dn, preferred_element_type=jnp.int32)
        accg += jnp.sum(pg.astype(jnp.float32)
                        * (xsb[:, :, None] * sg[:, None, :]), axis=0)
        accu += jnp.sum(pu.astype(jnp.float32)
                        * (xsb[:, :, None] * su[:, None, :]), axis=0)
        # fold out the nibble -8 offset via activation block sums
        a8 = (xsb * xsum_ref[c * nsb:(c + 1) * nsb].astype(jnp.float32)
              * 8.0).T                               # [m, nsb]
        accg -= jnp.dot(a8, sg, preferred_element_type=jnp.float32)
        accu -= jnp.dot(a8, su, preferred_element_type=jnp.float32)

    act = accu * (accg * jax.nn.sigmoid(accg))       # silu(gate) * up

    for c in range(hw // cd):            # down projection: f32 dequant path
        dv = dn_ref[:, c * cd:(c + 1) * cd].astype(jnp.int32)
        sl = jnp.repeat(kscale_f32(ds_ref[:, c * cd:(c + 1) * cd]),
                        QK, axis=0)
        sh = jnp.repeat(kscale_f32(ds_ref[:, hw + c * cd: hw + (c + 1) * cd]),
                        QK, axis=0)
        wl = ((dv & 15) - 8).astype(jnp.float32) * sl
        wh = (((dv >> 4) & 15) - 8).astype(jnp.float32) * sh
        acc_ref[:, c * cd:(c + 1) * cd] += jnp.dot(
            act, wl, preferred_element_type=jnp.float32)
        acc_ref[:, hw + c * cd: hw + (c + 1) * cd] += jnp.dot(
            act, wh, preferred_element_type=jnp.float32)

    @pl.when(ff == nf - 1)
    def _():
        out = acc_ref[:]
        if residual:
            out = out + x_ref[:]
        o_ref[:] = out.astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("bm", "bf", "ck", "cd", "out_dtype",
                                    "residual"))
def _ffn_q4n_i8(x, xq_t, xs_t, xsum_t, gu3, gs, us, dn_q, ds, *, bm: int,
                bf: int, ck: int, cd: int, out_dtype,
                residual: bool = False):
    """x [M, Dp] raw (residual only); xq_t/xs_t/xsum_t pre-quantized
    NORMALIZED activation blocks ([Dp/32, M, 32] i8 / [Dp/32, M] f32 /
    [Dp/32, M] i32); gu3 int8 [Dp/32, 32, Fp] (pre-blocked gate|up nibble
    pairs); dn_q int8 [Fp, Dp/2]; gs/us [Dp/32, Fp]; ds [Fp/32, Dp]."""
    m, dp = x.shape
    nbk = dp // QK
    fp = dn_q.shape[0]
    nf = fp // bf
    return pl.pallas_call(
        functools.partial(_ffn_q4n_i8_kernel, nf=nf, ck=ck, cd=cd,
                          out_dtype=out_dtype, residual=residual),
        grid=(m // bm, nf),
        in_specs=[
            pl.BlockSpec((bm, dp), lambda mb, ff: (mb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, bm, QK), lambda mb, ff: (0, mb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, bm), lambda mb, ff: (0, mb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, bm), lambda mb, ff: (0, mb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, QK, bf), lambda mb, ff: (0, 0, ff),
                         memory_space=pltpu.VMEM),   # gate|up bytes (blocked)
            pl.BlockSpec((nbk, bf), lambda mb, ff: (0, ff),
                         memory_space=pltpu.VMEM),   # gate scales
            pl.BlockSpec((nbk, bf), lambda mb, ff: (0, ff),
                         memory_space=pltpu.VMEM),   # up scales
            pl.BlockSpec((bf, dp // 2), lambda mb, ff: (ff, 0),
                         memory_space=pltpu.VMEM),   # down bytes
            pl.BlockSpec((bf // QK, dp), lambda mb, ff: (ff, 0),
                         memory_space=pltpu.VMEM),   # down scales
        ],
        out_specs=pl.BlockSpec((bm, dp), lambda mb, ff: (mb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, dp), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, dp), jnp.float32)],
        interpret=_interpret(),
    )(x, xq_t, xs_t, xsum_t, gu3, gs, us, dn_q, ds)


@functools.partial(jax.jit,
                   static_argnames=("bm", "bf", "ck", "cd", "out_dtype",
                                    "norm_eps", "d_logical", "residual"))
def _ffn_q4n(x, g, gu_q, gs, us, dn_q, ds, *, bm: int, bf: int, ck: int,
             cd: int, out_dtype, norm_eps=None, d_logical: int = 1,
             residual: bool = False):
    """x [M, Dp]; gu_q int8 [Dp, Fp] (gate|up nibble pair); dn_q int8
    [Fp, Dp/2] (output-pair); gs/us [Dp/32, Fp]; ds [Fp/32, Dp]."""
    m, dp = x.shape
    fp = dn_q.shape[0]
    nf = fp // bf
    return pl.pallas_call(
        functools.partial(_ffn_q4n_kernel, nf=nf, ck=ck, cd=cd,
                          out_dtype=out_dtype, norm_eps=norm_eps,
                          d_logical=d_logical, residual=residual),
        grid=(m // bm, nf),
        in_specs=[
            pl.BlockSpec((bm, dp), lambda mb, ff: (mb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dp), lambda mb, ff: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, bf), lambda mb, ff: (0, ff),
                         memory_space=pltpu.VMEM),       # gate|up bytes
            pl.BlockSpec((dp // QK, bf), lambda mb, ff: (0, ff),
                         memory_space=pltpu.VMEM),       # gate scales
            pl.BlockSpec((dp // QK, bf), lambda mb, ff: (0, ff),
                         memory_space=pltpu.VMEM),       # up scales
            pl.BlockSpec((bf, dp // 2), lambda mb, ff: (ff, 0),
                         memory_space=pltpu.VMEM),       # down bytes
            pl.BlockSpec((bf // QK, dp), lambda mb, ff: (ff, 0),
                         memory_space=pltpu.VMEM),       # down scales
        ],
        out_specs=pl.BlockSpec((bm, dp), lambda mb, ff: (mb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, dp), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, dp), jnp.float32),
                        pltpu.VMEM((bm, dp), jnp.float32)],
        interpret=_interpret(),
    )(x, g, gu_q, gs, us, dn_q, ds)


def fused_ffn_norm_q4n(x: jax.Array, gamma: jax.Array, pack: dict,
                       d_logical: int, eps: float,
                       out_dtype=jnp.float32) -> jax.Array:
    """N-packed Q4 FFN with fused rmsnorm prologue + residual (decode)."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    dp = pack["gu_q"].shape[0]
    fp = pack["dn_q"].shape[0]
    x2 = x.reshape(-1, k).astype(jnp.float32)
    m = x2.shape[0]
    m_pad = max(8, (m + 7) // 8 * 8)
    if k < dp or m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, dp - k)))
    g = jnp.pad(gamma.reshape(1, -1).astype(jnp.float32),
                ((0, 0), (0, dp - k)))
    bm = m_pad if m_pad <= 256 else 256
    # widest F tile whose double-buffered blocks fit the budget
    t_bf, t_budget = (config.ffn_tune() + (0, 0))[:2]
    bf_cap, budget = t_bf or 2048, t_budget or (10 << 20)
    bf = 128
    for cand in range(min(bf_cap, fp) // 128 * 128, 127, -128):
        if fp % cand:
            continue
        ssz = getattr(pack["gs"], "dtype", np.float32).itemsize \
            if hasattr(pack["gs"], "dtype") else 4
        cost = 2 * (dp * cand + cand * (dp // 2)
                    + 2 * (dp // QK) * cand * ssz
                    + (cand // QK) * dp * ssz)
        if cost <= budget and (cand // QK) % 8 == 0:
            bf = cand
            break
    if t_bf and fp % t_bf == 0 and (t_bf // QK) % 8 == 0:
        bf = t_bf
    ck = _chunk(dp, 1024)
    cd = _chunk(dp // 2, 1024)
    if config.ffn_i8a(dp) and m_pad <= 32:
        # int8 gate/up tier: rmsnorm + per-32-block activation quantization
        # OUTSIDE the kernel (the layer kernel's A-phase discipline,
        # layerkernel.py:766-781) — the in-kernel f32 dequant VPU work was
        # the FFN kernel's binding constraint at 7B (round-5 device trace)
        from zgml_tpu.ops.qmatmul import _quantize_act
        ms = jnp.sum(x2 * x2, axis=1, keepdims=True) * (1.0 / d_logical)
        xn = x2 * jax.lax.rsqrt(ms + eps) * g
        xq, xs = _quantize_act(xn)
        nbk = dp // QK
        xq_t = xq.reshape(m_pad, nbk, QK).transpose(1, 0, 2)
        xs_t = xs.T.astype(jnp.float32)
        xsum_t = jnp.sum(xq_t.astype(jnp.int32), axis=2)
        gu3 = pack["gu_q"].reshape(nbk, QK, fp)      # layout-preserving view
        out = _ffn_q4n_i8(x2, xq_t, xs_t, xsum_t, gu3, pack["gs"],
                          pack["us"], pack["dn_q"], pack["ds"], bm=m_pad,
                          bf=bf, ck=ck, cd=cd,
                          out_dtype=jnp.dtype(out_dtype), residual=True)
        return out[:m, :d_logical].reshape(*lead, d_logical)
    out = _ffn_q4n(x2, g, pack["gu_q"], pack["gs"], pack["us"],
                   pack["dn_q"], pack["ds"], bm=bm, bf=bf, ck=ck, cd=cd,
                   out_dtype=jnp.dtype(out_dtype), norm_eps=eps,
                   d_logical=d_logical, residual=True)
    return out[:m, :d_logical].reshape(*lead, d_logical)


def ffn_compatible(gu: PackedWeight, wd: PackedWeight) -> bool:
    """Layout contract check (see module docstring)."""
    if not (isinstance(gu, PackedWeight) and isinstance(wd, PackedWeight)
            and gu.kind == wd.kind
            and gu.n_pad == 2 * wd.k_pad
            and wd.n_pad == gu.k_pad      # acc tile [bm, Dp] spans both
            and gu.k_pad % QK == 0 and gu.k_pad <= 8192):
        return False
    if gu.kind == "q8_0":
        return wd.k_pad % 256 == 0
    if gu.kind == "q4_0":
        # packed halves of both weights must tile into >=256 chunks
        return (wd.k_pad % 512 == 0 and (wd.k_pad // 2) % 256 == 0
                and gu.k_pad % 512 == 0 and (gu.k_pad // 2) % 256 == 0)
    return False


def fused_ffn_pallas(x: jax.Array, gu: PackedWeight, wd: PackedWeight,
                     out_dtype=jnp.float32) -> jax.Array:
    """x [..., D] -> [..., D]: down(silu(gate(x)) * up(x)), one launch.

    Differentiable: the backward recomputes via the separate-projection
    composition, whose qmatmul VJP streams the packed weights through the
    Pallas transposed-dequant kernels (weights frozen, zero cotangent)."""
    import numpy as _np
    gu_aux = (gu.kind, gu.n, gu.k, gu.n_pad, gu.k_pad)
    wd_aux = (wd.kind, wd.n, wd.k, wd.n_pad, wd.k_pad)
    return _ffn_diff((gu_aux, wd_aux, _np.dtype(out_dtype).name),
                     x, gu.qvals, gu.scales, wd.qvals, wd.scales)


def fused_ffn_norm_pallas(x: jax.Array, gamma: jax.Array, gu: PackedWeight,
                          wd: PackedWeight, eps: float,
                          out_dtype=jnp.float32) -> jax.Array:
    """x + down(silu(gate(n)) * up(n)) with n = rmsnorm(x)*gamma — norm
    prologue and residual fused into the one FFN launch (decode fast path;
    inference-only, no VJP)."""
    return _ffn_impl(x, gu, wd, jnp.dtype(out_dtype),
                     norm_gamma=gamma, eps=eps, residual=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ffn_diff(meta, x, gu_q, gu_s, d_q, d_s):
    gu_aux, wd_aux, out_dtype = meta
    gu = PackedWeight(*gu_aux, gu_q, gu_s)
    wd = PackedWeight(*wd_aux, d_q, d_s)
    return _ffn_impl(x, gu, wd, jnp.dtype(out_dtype))


def _ffn_diff_fwd(meta, x, gu_q, gu_s, d_q, d_s):
    return _ffn_diff(meta, x, gu_q, gu_s, d_q, d_s), (x, gu_q, gu_s, d_q, d_s)


def _ffn_diff_bwd(meta, res, g):
    import numpy as _np
    from zgml_tpu.ops.qmatmul import qmatmul_pallas
    gu_aux, wd_aux, out_dtype = meta
    x, gu_q, gu_s, d_q, d_s = res
    gu = PackedWeight(*gu_aux, gu_q, gu_s)
    wd = PackedWeight(*wd_aux, d_q, d_s)

    def comp(x):
        guo = qmatmul_pallas(x, gu, out_dtype=jnp.float32)
        f = guo.shape[-1] // 2
        gate, up = guo[..., :f], guo[..., f:]
        act = up * (gate * jax.nn.sigmoid(gate))
        return qmatmul_pallas(act, wd, out_dtype=jnp.dtype(out_dtype))

    _, vjp = jax.vjp(comp, x)
    (dx,) = vjp(g)
    zero_i8 = lambda a: _np.zeros(a.shape, jax.dtypes.float0)
    return (dx, zero_i8(gu_q), jnp.zeros_like(gu_s),
            zero_i8(d_q), jnp.zeros_like(d_s))


_ffn_diff.defvjp(_ffn_diff_fwd, _ffn_diff_bwd)


def _chunk(total: int, limit: int = 1024, mult: int = 256) -> int:
    """Largest multiple-of-`mult` divisor of total <= limit, else total."""
    for cand in range(limit, 0, -mult):
        if total % cand == 0:
            return cand
    return total


def _ffn_impl(x, gu: PackedWeight, wd: PackedWeight, out_dtype,
              norm_gamma=None, eps: float | None = None,
              residual: bool = False) -> jax.Array:
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k).astype(jnp.float32)
    m = x2.shape[0]
    m_pad = max(8, (m + 7) // 8 * 8)
    if k < gu.k_pad or m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, gu.k_pad - k)))
    if norm_gamma is not None:
        g = jnp.pad(norm_gamma.reshape(1, -1).astype(jnp.float32),
                    ((0, 0), (0, gu.k_pad - k)))
        norm_kw = dict(norm_eps=eps, d_logical=gu.k, residual=residual)
    else:
        g = jnp.zeros((1, gu.k_pad), jnp.float32)
        norm_kw = dict(norm_eps=None, d_logical=gu.k, residual=residual)
    bm = m_pad if m_pad <= 256 else 256
    while m_pad % bm:
        bm //= 2
    if gu.kind == "q4_0":
        # tiles over the PACKED halves (see _ffn_q4 docstring); bf=256 keeps
        # per-step VMEM (4 gate/up tiles + down tile, double-buffered) ~8MB
        fh = wd.k_pad // 2
        bf = 256
        while fh % bf:
            bf //= 2
        ck = _chunk(gu.k_pad // 2, 512)
        cd = _chunk(gu.k_pad, 1024)
        out = _ffn_q4(x2, g, gu.qvals, gu.scales, wd.qvals, wd.scales,
                      bm=bm, bf=bf, ck=ck, cd=cd, out_dtype=out_dtype,
                      **norm_kw)
        return out[:m, : wd.n].reshape(*lead, wd.n)
    fp = wd.k_pad
    bf = 512 if gu.k_pad <= 2048 else 256
    while fp % bf:
        bf //= 2
    # K-chunk: a multiple-of-256 divisor when one exists, else the whole K
    # (small models; keeps scale slices sublane-aligned either way)
    ck = _chunk(gu.k_pad, 1024)
    cd = ck
    out = _ffn(x2, g, gu.qvals, gu.scales, wd.qvals, wd.scales,
               bm=bm, bf=bf, ck=ck, cd=cd, out_dtype=out_dtype, **norm_kw)
    return out[:m, : wd.n].reshape(*lead, wd.n)