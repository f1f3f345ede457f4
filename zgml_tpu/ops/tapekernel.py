"""Tape-streamed whole-stack decode: every layer's weights flow through ONE
manually double-buffered VMEM window as a flat sequence of uniform contiguous
tiles ("the tape"), and the entire transformer stack's decode step is ONE
Pallas call per token.

Why (measured, tools/exp_tape.py + bench --kernel-profile at 7B):
  - A manual K-slot DMA stream of contiguous 1MB tiles sustains 750-850 GB/s
    on this chip; the automatic per-operand pipeline peaks ~720 and the
    production per-layer kernels achieve 360-715 GB/s because every operand
    (qkv / wo / gate-up / down, each with scales) gets its own double-buffered
    VMEM window, fragmenting VMEM and shrinking tiles.
  - The per-layer path launches 65 kernels/token; dispatch+glue measured
    879us/token at 7B (11% of the step).
One window + one launch removes both: the whole 4.2 GB weight stream is a
single pipelined DMA sequence, and per-call fixed costs are paid once per
TOKEN, not once per layer.

Tape layout (host-built, build_tape):
  weight tape  int8 [T, R/32, 32, 512]   R = dp/2 sublane rows per entry
  scale tape   f32  [T, R/16, 512]       one scale entry per weight entry
Entries per layer, in consumption order:
  A  (nAc = n_qkv/512): planar wqkv column tiles [R, 512] — full K per
     entry (the global q4 K-half-split: lo nibble = K j, hi = K j + dp/2);
     scale entry = [slo; shi] stacked.
  C  (nC = dp/512): planar wo column tiles, same structure (requires
     hq*hd == dp so wo's packed K rows == R).
  E-gu (2 per f-tile, nGU = fp/512 tiles): the N-packed gate|up byte tile
     [dp, 512] split into two R-row entries; scale entries are the
     K-half-matched [gs_half; us_half] stacks.
  E-dn (nDN = (dp/2)/512 * ceil(fp/R)): the output-packed down tiles
     [R, 512] (lo nibble = out col j, hi = out col j + dp/2), column-group
     outer / K-row-block inner; K rows zero-padded to an R multiple
     (zero weights x anything = 0); scale entry = [ds_lo; ds_hi].

All projections run ggml vec-dot discipline on the MXU (int8 x int8 with
per-32-block activation quantization done IN-kernel at phase transitions,
nibble -8 offsets folded via activation block sums) — weights see zero VPU
work, so compute hides under the tile DMA. Flash attention over the bf16
cache streams through a normal automatic BlockSpec window (its traffic is
cache-sized, not weight-sized).

ref: this replaces the reference's per-layer decode sequence and its
command-stream fusion (llama_transformer.zig:192-253, program.zig:980-3185);
the tape is the logical endpoint of its dispatch-count war (1,654 ops -> 242
dispatches -> here, 1 dispatch per N tokens with ONE kernel per token).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zgml_tpu import config
from zgml_tpu.quant.blocks import QK

NEG_INF = -1e30
LANES = 512          # tape entry lane width
K_SLOTS = 4          # in-flight tape entries (window = K_SLOTS entries)


@jax.tree_util.register_pytree_node_class
class Tape:
    """The flat weight/scale tapes + per-layer norms, with the static entry
    geometry carried as pytree aux data (survives device_put / jit)."""

    def __init__(self, wtape, stape, g1, g2, dims):
        self.wtape = wtape
        self.stape = stape
        self.g1 = g1
        self.g2 = g2
        self.dims = tuple(int(v) for v in dims)

    def tree_flatten(self):
        return (self.wtape, self.stape, self.g1, self.g2), self.dims

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux)


def _interpret() -> bool:
    return config.interpret()


# -- host-side tape builder ---------------------------------------------------

def build_tape(params: dict, cfg) -> dict | None:
    """Build the flat weight/scale tapes from the per-layer packed weights.

    Returns None when any layer is incompatible (non-q4_0, missing ffn_q4n,
    dims not LANES-aligned, hq*hd != dp). Host numpy only — the caller
    device_puts the result."""
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
    R = dp // 2
    n_qkv = (hq + 2 * hkv) * hd
    if (dp % (2 * LANES) or hd % 64 or LANES % hd or hq * hd != dp
            or n_qkv % LANES or R % 32):
        return None
    nAc = n_qkv // LANES
    nC = dp // LANES
    pack0 = first.get("ffn_q4n")
    if pack0 is None or pack0["gu_q"].shape[0] != dp:
        return None
    fp = pack0["gu_q"].shape[1]
    if fp % LANES or (dp // 2) % LANES:
        return None
    nGU = fp // LANES
    nrow = -(-fp // R)                    # dn K rows padded to R multiple
    fp_pad = nrow * R
    dpg = (dp // 2) // LANES
    nDN = dpg * nrow
    EPL = nAc + nC + 2 * nGU + nDN

    for layer in layers:
        w = layer.get("wqkv")
        wo = layer.get("wo")
        pack = layer.get("ffn_q4n")
        if (not isinstance(w, PackedWeight) or w.kind != "q4_0"
                or w.k_pad != dp or w.n_pad != n_qkv
                or not isinstance(wo, PackedWeight) or wo.kind != "q4_0"
                or wo.k_pad != dp or wo.n_pad != dp
                or pack is None or pack["gu_q"].shape != (dp, fp)
                or pack["dn_q"].shape[1] != dp // 2):
            return None

    L = len(layers)
    T = L * EPL
    wtape = np.zeros((T, R, LANES), np.int8)
    stape = np.zeros((T, R // 16, LANES), np.float32)
    g1 = np.zeros((L, 1, dp), np.float32)
    g2 = np.zeros((L, 1, dp), np.float32)
    nb2 = R // 32                          # scale rows per nibble plane

    def col_tiles(a, n_t):                 # [R, n] -> [n_t, R, LANES]
        a = np.ascontiguousarray(np.asarray(a))
        return np.transpose(a.reshape(R, n_t, LANES), (1, 0, 2))

    def sc_tiles(s, n_t):                  # [R/16, n] -> [n_t, R/16, LANES]
        from zgml_tpu.quant.repack import scales_f32_np
        s = np.ascontiguousarray(scales_f32_np(s))
        return np.transpose(s.reshape(R // 16, n_t, LANES), (1, 0, 2))

    t = 0
    for li, layer in enumerate(layers):
        w: PackedWeight = layer["wqkv"]
        wo: PackedWeight = layer["wo"]
        pack = layer["ffn_q4n"]
        g1[li, 0, :d] = np.asarray(layer["attn_norm"], np.float32).reshape(-1)
        g2[li, 0, :d] = np.asarray(layer["ffn_norm"], np.float32).reshape(-1)
        # A: planar wqkv column tiles (scales rows are already [slo; shi])
        wtape[t:t + nAc] = col_tiles(w.qvals, nAc)
        stape[t:t + nAc] = sc_tiles(w.scales, nAc)
        t += nAc
        # C: planar wo column tiles
        wtape[t:t + nC] = col_tiles(wo.qvals, nC)
        stape[t:t + nC] = sc_tiles(wo.scales, nC)
        t += nC
        # E-gu: [dp, fp] split into (c-outer, K-half-inner) entries
        gu_q = np.ascontiguousarray(np.asarray(pack["gu_q"]))
        wtape[t:t + 2 * nGU] = np.transpose(
            gu_q.reshape(2, R, nGU, LANES), (2, 0, 1, 3)).reshape(
                2 * nGU, R, LANES)
        gs = np.asarray(pack["gs"], np.float32).reshape(2, nb2, nGU, LANES)
        us = np.asarray(pack["us"], np.float32).reshape(2, nb2, nGU, LANES)
        sgu = np.empty((nGU, 2, R // 16, LANES), np.float32)
        for half in range(2):
            sgu[:, half, :nb2] = np.transpose(gs[half], (1, 0, 2))
            sgu[:, half, nb2:] = np.transpose(us[half], (1, 0, 2))
        stape[t:t + 2 * nGU] = sgu.reshape(2 * nGU, R // 16, LANES)
        t += 2 * nGU
        # E-dn: K rows zero-padded to an R multiple, col-group outer
        dn_pad = np.zeros((fp_pad, dp // 2), np.int8)
        dn_pad[:fp] = np.asarray(pack["dn_q"])
        wtape[t:t + nDN] = np.transpose(
            dn_pad.reshape(nrow, R, dpg, LANES), (2, 0, 1, 3)).reshape(
                nDN, R, LANES)
        ds_pad = np.zeros((fp_pad // 32, dp), np.float32)
        ds_pad[: fp // 32] = np.asarray(pack["ds"])
        sdn = np.empty((dpg, nrow, R // 16, LANES), np.float32)
        sdn[:, :, :nb2] = np.transpose(
            ds_pad[:, : dp // 2].reshape(nrow, nb2, dpg, LANES), (2, 0, 1, 3))
        sdn[:, :, nb2:] = np.transpose(
            ds_pad[:, dp // 2:].reshape(nrow, nb2, dpg, LANES), (2, 0, 1, 3))
        stape[t:t + nDN] = sdn.reshape(nDN, R // 16, LANES)
        t += nDN
    assert t == T
    return Tape(wtape, stape, g1, g2,
                (dp, n_qkv, fp, fp_pad, nAc, nC, nGU, nDN, nrow, dpg,
                 EPL, L))


# -- kernel helpers -----------------------------------------------------------

def _mxu_dtype():
    """bf16 MXU operands for the tape dots (default). Q4 integer levels
    (-8..7) are exact in bf16; only the scale product rounds (<=2^-9
    relative), the same numerics tier as the prefill bf16 path. =0 restores
    f32 (ZGML_TPU_TAPE_BF16)."""
    return jnp.bfloat16 if config.tape_bf16() else jnp.float32


def _deq_rows(w, s, R, r0, cn, dt):
    """Dequantize rows [r0, r0+cn) of one planar tape entry: w int8 [R, 512]
    (nibble pairs), s f32 [R/16, 512] = [slo; shi] -> (wlo, whi) dt
    [cn, 512].

    Chunked (cn ~ 512) so the temporaries stay small — dequantizing a whole
    7B entry at once needs ~12MB of scoped VMEM and OOMs Mosaic's stack.
    Elementwise int32 nibble math + sublane scale repeat only: no
    reshapes/transposes (Mosaic layout inference rejects lane shape casts).
    """
    v = w[r0:r0 + cn].astype(jnp.int32)
    nb = R // QK
    slo = jnp.repeat(s[r0 // QK:(r0 + cn) // QK].astype(dt), QK, axis=0)
    shi = jnp.repeat(s[nb + r0 // QK: nb + (r0 + cn) // QK].astype(dt),
                     QK, axis=0)
    wlo = ((v & 15) - 8).astype(dt) * slo
    whi = (((v >> 4) & 15) - 8).astype(dt) * shi
    return wlo, whi


# -- the kernel ---------------------------------------------------------------

def _tape_kernel(
        sref,                                     # [2] i32: pos, n_b
        xfull_ref, g1_ref, g2_ref,                # [8,dp], [L,1,dp] x2
        wtape_ref, stape_ref,                     # HBM tapes (ANY)
        cos_ref, sin_ref,                         # [1, hd]
        ck_ref, cv_ref,                           # cache blocks (auto)
        xout_ref, kcur_ref, vcur_ref,             # outputs
        win, swin, wsem, ssem,                    # manual stream window
        x_scr, xn_scr, x2_scr, att_scr,
        accq_scr, q2_scr, kv2_scr,
        m_scr, l_scr, acc_scr,
        accwo_scr, act_scr, accdn_scr,
        *, hq: int, hkv: int, hd: int, d_logical: int, dp: int,
        nAc: int, nC: int, nGU: int, nDN: int, nrow: int, dpg: int,
        EPL: int, L: int, bkB: int, eps: float, scale: float,
        n_total: int, mxu):
    i = pl.program_id(0)
    pos = sref[0]
    n_b = sref[1]
    SP = nAc + n_b + nC + nGU + nDN
    l_idx = i // SP
    j = i - l_idx * SP
    a_end = nAc
    b_end = nAc + n_b
    c_end = b_end + nC
    g_end = c_end + nGU
    nr = hq // hkv
    R = dp // 2

    # consumed-entry count before this step (stateless fetch index)
    cA = jnp.minimum(j, nAc)
    cC = jnp.clip(j - b_end, 0, nC)
    cG = jnp.clip(j - c_end, 0, nGU)
    cD = jnp.clip(j - g_end, 0, nDN)
    t0 = l_idx * EPL + cA + cC + 2 * cG + cD
    is_gu = (j >= c_end) & (j < g_end)
    n_cons = jnp.where((j >= a_end) & (j < b_end), 0,
                       jnp.where(is_gu, 2, 1))

    def wdma(t):
        slot = jax.lax.rem(t, K_SLOTS)
        return (pltpu.make_async_copy(wtape_ref.at[t], win.at[slot],
                                      wsem.at[slot]),
                pltpu.make_async_copy(stape_ref.at[t], swin.at[slot],
                                      ssem.at[slot]))

    @pl.when(i == 0)
    def _():                                      # prologue: prime the window
        for t in range(K_SLOTS):
            for dma in wdma(jnp.asarray(t, jnp.int32)):
                dma.start()
        x_scr[:] = xfull_ref[:]

    # -- layer prologue: first rmsnorm --------------------------------------
    @pl.when(j == 0)
    def _():
        x = x_scr[:]
        ms = jnp.sum(x * x, axis=1, keepdims=True) * (1.0 / d_logical)
        xn_scr[:] = x * jax.lax.rsqrt(ms + eps) * g1_ref[0]
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def consume(n):
        """Wait entries [t0, t0+n); return their window slots."""
        slots = []
        for k in range(n):
            t = t0 + k
            for dma in wdma(t):
                dma.wait()
            slots.append(jax.lax.rem(t, K_SLOTS))
        return slots

    def planar_cols(slot, x):
        """Full-K planar q4 dequant-dot of x [8, dp] for one 512-col entry."""
        w = win[pl.ds(slot, 1)][0]                # [R, 512]
        s = swin[pl.ds(slot, 1)][0]               # [R/16, 512]
        acc = jnp.zeros((8, LANES), jnp.float32)
        for q in range(R // LANES):
            wlo, whi = _deq_rows(w, s, R, q * LANES, LANES, mxu)
            acc += jnp.dot(x[:, q * LANES:(q + 1) * LANES].astype(mxu), wlo,
                           preferred_element_type=jnp.float32)
            acc += jnp.dot(
                x[:, R + q * LANES: R + (q + 1) * LANES].astype(mxu), whi,
                preferred_element_type=jnp.float32)
        return acc

    # -- phase A: QKV column tiles ------------------------------------------
    @pl.when(j < a_end)
    def _():
        (slot,) = consume(1)
        accq_scr[pl.ds(cA, 1)] = planar_cols(slot, xn_scr[:])[None]

    # -- A epilogue: head regroup, rope, K/V emit ---------------------------
    hpe = LANES // hd                             # heads per accq tile
    @pl.when(j == a_end - 1)
    def _():
        for h in range(hq):
            q2_scr[h:h + 1, :] = accq_scr[h // hpe, :1,
                                          (h % hpe) * hd:(h % hpe + 1) * hd]
        for h in range(hkv):
            hk = hq + h
            hv = hq + hkv + h
            kv2_scr[h:h + 1, :] = accq_scr[hk // hpe, :1,
                                           (hk % hpe) * hd:(hk % hpe + 1) * hd]
            kv2_scr[hkv + h:hkv + h + 1, :] = \
                accq_scr[hv // hpe, :1, (hv % hpe) * hd:(hv % hpe + 1) * hd]
        cos = cos_ref[:]
        sin = sin_ref[:]
        q = q2_scr[:]
        q2_scr[:] = q * cos + pltpu.roll(q, hd // 2, 1) * sin
        kc = kv2_scr[:hkv, :]
        kcur_ref[0] = kc * cos + pltpu.roll(kc, hd // 2, 1) * sin
        vcur_ref[0] = kv2_scr[hkv:, :]

    # -- phase B: flash attention over the cache prefix ---------------------
    @pl.when((j >= a_end) & (j < b_end))
    def _():
        kb = j - a_end
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

    # -- B epilogue (first C step): self column, normalize ------------------
    @pl.when(j == b_end)
    def _():
        q3 = q2_scr[:].reshape(hkv, nr, hd)
        kc = kcur_ref[0]
        s_self = jnp.sum(q3 * kc[:, None, :], axis=2,
                         keepdims=True) * scale
        m_prev = m_scr[:, :, :1]
        m_new = jnp.maximum(m_prev, s_self)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s_self - m_new)
        l = l_scr[:, :, :1] * alpha + p
        acc = acc_scr[:] * alpha + p * vcur_ref[0][:, None, :]
        safe = jnp.where(l > 0, l, 1.0)
        att = acc / safe                          # [hkv, nr, hd]
        # att -> row 0 of [8, dp] via static per-head lane slices
        att_scr[:] = jnp.zeros_like(att_scr)
        att2 = att.reshape(hq, hd)
        for h in range(hq):
            att_scr[0:1, h * hd:(h + 1) * hd] = att2[h:h + 1, :]

    # -- phase C: wo column tiles -------------------------------------------
    @pl.when((j >= b_end) & (j < c_end))
    def _():
        (slot,) = consume(1)
        accwo_scr[pl.ds(cC, 1)] = planar_cols(slot, att_scr[:])[None]

    # -- E transition (first gu step): residual, norm2 -----------------------
    @pl.when(j == c_end)
    def _():
        # Mosaic has no scatter-add: assemble the full-width wo output by
        # static concatenation of the per-tile accumulators instead
        wo_full = jnp.concatenate([accwo_scr[c] for c in range(nC)], axis=1)
        x2 = x_scr[:] + wo_full
        x2_scr[:] = x2
        ms = jnp.sum(x2 * x2, axis=1, keepdims=True) * (1.0 / d_logical)
        xn_scr[:] = x2 * jax.lax.rsqrt(ms + eps) * g2_ref[0]
        accdn_scr[:] = jnp.zeros_like(accdn_scr)

    # -- phase E-gu: gate|up f-tiles (2 entries per step) ---------------------
    @pl.when(is_gu)
    def _():
        s0, s1 = consume(2)
        xn2 = xn_scr[:]
        gacc = jnp.zeros((8, LANES), jnp.float32)
        uacc = jnp.zeros((8, LANES), jnp.float32)
        for half, slot in ((0, s0), (1, s1)):
            w = win[pl.ds(slot, 1)][0]
            s = swin[pl.ds(slot, 1)][0]
            for q in range(R // LANES):
                glo, uhi = _deq_rows(w, s, R, q * LANES, LANES, mxu)
                xh = xn2[:, half * R + q * LANES:
                         half * R + (q + 1) * LANES].astype(mxu)
                gacc += jnp.dot(xh, glo, preferred_element_type=jnp.float32)
                uacc += jnp.dot(xh, uhi, preferred_element_type=jnp.float32)
        act_scr[pl.ds(cG, 1)] = (
            uacc * (gacc * jax.nn.sigmoid(gacc)))[None]   # [1, 8, 512]

    # -- phase E-dn: down tiles (col-group outer, K-row-block inner) ---------
    tpr = R // LANES                              # gu act tiles per dn entry
    @pl.when((j >= g_end) & (j < g_end + nDN))
    def _():
        (slot,) = consume(1)
        s2 = cD                                   # dn step index
        g = s2 // nrow
        r = s2 - g * nrow
        w = win[pl.ds(slot, 1)][0]
        s = swin[pl.ds(slot, 1)][0]
        plo = jnp.zeros((8, LANES), jnp.float32)
        phi = jnp.zeros((8, LANES), jnp.float32)
        for q in range(tpr):
            # act tile index r*tpr+q may exceed nGU (zero-padded dn rows):
            # clamp the read; the matching weight rows are zeros
            a_idx = jnp.minimum(r * tpr + q, nGU - 1)
            xq = act_scr[pl.ds(a_idx, 1)][0].astype(mxu)   # [8, 512]
            dlo, dhi = _deq_rows(w, s, R, q * LANES, LANES, mxu)
            plo += jnp.dot(xq, dlo, preferred_element_type=jnp.float32)
            phi += jnp.dot(xq, dhi, preferred_element_type=jnp.float32)
        accdn_scr[pl.ds(g, 1)] += plo[None]
        accdn_scr[pl.ds(dpg + g, 1)] += phi[None]

    # -- layer epilogue (last dn step): residual + next-layer handoff --------
    @pl.when(j == SP - 1)
    def _():
        dn_full = jnp.concatenate(
            [accdn_scr[g] for g in range(2 * dpg)], axis=1)
        x = x2_scr[:] + dn_full
        x_scr[:] = x

        @pl.when(l_idx == L - 1)
        def _():
            xout_ref[:] = x

    # -- fetch: keep the window K_SLOTS entries deep --------------------------
    for k in range(2):                            # up to 2 entries consumed
        t = t0 + k + K_SLOTS

        @pl.when((k < n_cons) & (t < n_total))
        def _(t=t):
            for dma in wdma(t):
                dma.start()


@functools.partial(
    jax.jit,
    static_argnames=("hq", "hkv", "hd", "d_logical", "dp", "nAc", "nC",
                     "nGU", "nDN", "nrow", "dpg", "EPL", "L", "s_len",
                     "eps", "bkB"))
def _tape_call(x, g1, g2, wtape, stape, cos2, sin2, ck, cv, pos,
               *, hq: int, hkv: int, hd: int, d_logical: int, dp: int,
               nAc: int, nC: int, nGU: int, nDN: int, nrow: int, dpg: int,
               EPL: int, L: int, s_len: int, eps: float, bkB: int):
    """x [8, dp] f32 (row 0 live); ck/cv bf16 [L, hkv, S, hd].
    Returns (x_out [8, dp], kcur [L, hkv, hd], vcur [L, hkv, hd])."""
    R = dp // 2
    n_total = L * EPL
    scale = 1.0 / (hd ** 0.5)
    n_b = jnp.clip((jnp.maximum(pos, 1) + bkB - 1) // bkB,
                   1, s_len // bkB).astype(jnp.int32)
    sarr = jnp.stack([jnp.asarray(pos, jnp.int32).reshape(()), n_b])
    SPd = nAc + nC + nGU + nDN                    # static part of steps/layer
    grid = L * SPd + L * n_b                      # = L * (SPd + n_b)
    nr = hq // hkv

    def kvm(i, s):
        sp = SPd + s[1]
        l = i // sp
        j = i - l * sp
        kb = jnp.clip(j - nAc, 0, s[1] - 1)
        last = jnp.maximum(s[0] - 1, 0) // bkB
        return (l, 0, jnp.minimum(kb, last), 0)

    def lmap(i, s):
        return (i // (SPd + s[1]), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, dp), lambda i, s: (0, 0)),          # x
            pl.BlockSpec((1, 1, dp), lmap),                      # g1
            pl.BlockSpec((1, 1, dp), lmap),                      # g2
            pl.BlockSpec(memory_space=pl.ANY),                   # wtape
            pl.BlockSpec(memory_space=pl.ANY),                   # stape
            pl.BlockSpec((1, hd), lambda i, s: (0, 0)),          # cos2
            pl.BlockSpec((1, hd), lambda i, s: (0, 0)),          # sin2
            pl.BlockSpec((1, hkv, bkB, hd), kvm),                # ck
            pl.BlockSpec((1, hkv, bkB, hd), kvm),                # cv
        ],
        out_specs=[
            pl.BlockSpec((8, dp), lambda i, s: (0, 0)),          # x_out
            pl.BlockSpec((1, hkv, hd), lambda i, s:
                         (i // (SPd + s[1]), 0, 0)),             # kcur
            pl.BlockSpec((1, hkv, hd), lambda i, s:
                         (i // (SPd + s[1]), 0, 0)),             # vcur
        ],
        scratch_shapes=[
            pltpu.VMEM((K_SLOTS, R, LANES), jnp.int8),           # win
            pltpu.VMEM((K_SLOTS, R // 16, LANES), jnp.float32),  # swin
            pltpu.SemaphoreType.DMA((K_SLOTS,)),
            pltpu.SemaphoreType.DMA((K_SLOTS,)),
            pltpu.VMEM((8, dp), jnp.float32),                    # x
            pltpu.VMEM((8, dp), jnp.float32),                    # xn (shared)
            pltpu.VMEM((8, dp), jnp.float32),                    # x2
            pltpu.VMEM((8, dp), jnp.float32),                    # att row
            pltpu.VMEM((nAc, 8, LANES), jnp.float32),            # accq
            pltpu.VMEM((hq, hd), jnp.float32),                   # q2
            pltpu.VMEM((2 * hkv, hd), jnp.float32),              # kv cur
            pltpu.VMEM((hkv, nr, 128), jnp.float32),             # m
            pltpu.VMEM((hkv, nr, 128), jnp.float32),             # l
            pltpu.VMEM((hkv, nr, hd), jnp.float32),              # acc att
            pltpu.VMEM((nC, 8, LANES), jnp.float32),             # accwo
            pltpu.VMEM((nGU, 8, LANES), jnp.float32),            # gu act
            pltpu.VMEM((2 * dpg, 8, LANES), jnp.float32),        # accdn
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _tape_kernel, hq=hq, hkv=hkv, hd=hd, d_logical=d_logical, dp=dp,
            nAc=nAc, nC=nC, nGU=nGU, nDN=nDN, nrow=nrow, dpg=dpg,
            EPL=EPL, L=L, bkB=bkB, eps=eps, scale=scale, n_total=n_total,
            mxu=_mxu_dtype()),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, dp), jnp.float32),
            jax.ShapeDtypeStruct((L, hkv, hd), jnp.float32),
            jax.ShapeDtypeStruct((L, hkv, hd), jnp.float32),
        ],
        interpret=_interpret(),
    )(sarr, x, g1, g2, wtape, stape, cos2, sin2, ck, cv)


def tape_decode_step(cfg, tape: Tape, x, cache_k, cache_v, pos, cos, sin):
    """One whole-stack decode step. x [1, 1, d] f32; cache [L, 1, hkv, S, hd]
    bf16 (stacked layout). Returns (x_out [1,1,d], new_ck, new_cv)."""
    hq, hkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    d = cfg.d_model
    (dp, n_qkv, fp, fp_pad, nAc, nC, nGU, nDN, nrow, dpg, EPL, L) = \
        tape.dims
    s_len = cache_k.shape[3]
    half = cos.shape[-1]
    c2 = jnp.concatenate([cos, cos], -1).reshape(1, 2 * half)
    s2 = jnp.concatenate([-sin, sin], -1).reshape(1, 2 * half)
    xp = jnp.pad(x.reshape(1, d).astype(jnp.float32), ((0, 7), (0, dp - d)))
    bkB = 128
    x_out, kcur, vcur = _tape_call(
        xp, tape.g1, tape.g2, tape.wtape, tape.stape, c2, s2,
        cache_k.reshape(L, hkv, s_len, hd),
        cache_v.reshape(L, hkv, s_len, hd), pos,
        hq=hq, hkv=hkv, hd=hd, d_logical=d, dp=dp, nAc=nAc, nC=nC,
        nGU=nGU, nDN=nDN, nrow=nrow, dpg=dpg, EPL=EPL, L=L, s_len=s_len,
        eps=cfg.rms_norm_eps, bkB=bkB)
    new_k = jax.lax.dynamic_update_slice(
        cache_k, kcur.reshape(L, 1, hkv, 1, hd).astype(cache_k.dtype),
        (0, 0, 0, pos, 0))
    new_v = jax.lax.dynamic_update_slice(
        cache_v, vcur.reshape(L, 1, hkv, 1, hd).astype(cache_v.dtype),
        (0, 0, 0, pos, 0))
    return x_out[0:1, :d].reshape(1, 1, d).astype(x.dtype), new_k, new_v
