"""Head-major weight views for the fused attention-block kernel.

The attention-block megakernel (zgml_tpu/ops/layerkernel.py) needs Q/K/V
projection outputs in head-major form ([heads, m, hd]) because Mosaic cannot
re-layout a flat [1, H*hd] matmul output into [H, hd] in-kernel (lane ->
sublane unfold is not legalizable; verified on hardware). The fix is to do the
projection as an MXU *batched* dot with the weight pre-arranged head-major:

  qkv3: qvals int8 [Htot, KQ, hd]  (Htot = Hq + 2*Hkv; KQ = Kp or Kp/2 for
        q4_0's K-half-split, which is per-COLUMN and therefore survives the
        per-head column slicing unchanged)
        scales f32 [Htot, Kp/32, hd]

  wo3:  the output projection contracts per-head hd, so Q4_0's GLOBAL K-half
        split would mix heads inside one packed byte. wo is therefore
        re-packed with the nibble pair along the OUTPUT axis instead
        (byte[k, j] = w[k, j] | w[k, j + Dp/2] << 4): the kernel feeds att
        once and writes two output column groups — no sub-128 lane slicing.
        qvals int8 [Hq, hd, Dp/2] (q4) or [Hq, hd, Dp] (q8)
        scales f32 [Hq, hd/32, Dp]

These are derived on the host at load time from the planar PackedWeights
(exact nibble/scale shuffles, no requantization).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

from zgml_tpu.quant.blocks import QK
from zgml_tpu.quant.repack import PackedWeight


# layer-dict keys holding load-time-derived weight views (never serialized;
# excluded from weight-byte censuses since they duplicate the planar set)
DERIVED_KEYS = ("qkv3", "wo3", "ffn_q4n")


@dataclasses.dataclass
class HeadPacked:
    """Head-major quantized weight for batched-by-head kernels."""
    kind: str          # 'q4_0' | 'q8_0'
    heads: int
    hd: int            # per-head feature dim
    k: int             # logical contraction dim (d for qkv; hd for wo)
    n: int             # logical out cols per head (hd for qkv; d for wo)
    qvals: Any
    scales: Any

    @property
    def nbytes(self) -> int:
        return int(self.qvals.nbytes + self.scales.nbytes)


def _pw_flatten(hp: HeadPacked):
    return ((hp.qvals, hp.scales),
            (hp.kind, hp.heads, hp.hd, hp.k, hp.n))


def _pw_unflatten(aux, children):
    kind, heads, hd, k, n = aux
    qvals, scales = children
    return HeadPacked(kind, heads, hd, k, n, qvals, scales)


import jax  # noqa: E402

jax.tree_util.register_pytree_node(HeadPacked, _pw_flatten, _pw_unflatten)


def head_major_qkv(wqkv: PackedWeight, hq: int, hkv: int,
                   hd: int) -> HeadPacked:
    """Planar fused wqkv [Kp(/2), nq+2nkv(+pad)] -> [Htot, KQ, hd] head-major.

    Column order of the planar fusion is q heads, then k heads, then v heads
    (concat_packed keeps input order); the K-axis packing/scales are
    per-column and survive slicing.
    """
    htot = hq + 2 * hkv
    ncols = htot * hd
    q = np.asarray(wqkv.qvals)[:, :ncols]          # [KQ, Htot*hd]
    s = np.asarray(wqkv.scales)[:, :ncols]         # [Kp/32, Htot*hd]
    kq = q.shape[0]
    q3 = np.ascontiguousarray(
        q.reshape(kq, htot, hd).transpose(1, 0, 2))
    s3 = np.ascontiguousarray(
        s.reshape(s.shape[0], htot, hd).transpose(1, 0, 2))
    return HeadPacked(wqkv.kind, htot, hd, wqkv.k, hd, q3, s3)


def head_major_wo(wo: PackedWeight, hq: int, hd: int) -> HeadPacked:
    """Planar wo [Kp(/2), Dp] -> head-major [Hq, hd(/2 packed cols), Dp(/2)].

    q8_0: pure row regrouping. q4_0: unpack the global K-half-split, regroup
    rows per head, re-pack the nibble pair along the OUTPUT axis
    (byte[k, j] = w[k, j] | w[k, j + Dp/2] << 4). Scales rows are already in
    natural k-block order (lo rows then hi rows == blocks 0..Kp/32).
    """
    nq = hq * hd
    dp = np.asarray(wo.qvals).shape[1]
    if wo.kind == "q8_0":
        q = np.asarray(wo.qvals)[:nq]               # [nq, Dp]
        q3 = np.ascontiguousarray(q.reshape(hq, hd, dp))
        s = np.asarray(wo.scales)[: nq // QK]
        s3 = np.ascontiguousarray(s.reshape(hq, hd // QK, dp))
        return HeadPacked("q8_0", hq, hd, hd, wo.n, q3, s3)
    if wo.kind != "q4_0":
        raise ValueError(wo.kind)
    if dp % 2:
        raise ValueError("q4_0 wo head-major needs even padded D")
    kh = np.asarray(wo.qvals).shape[0]              # Kp/2 packed rows
    b = np.asarray(wo.qvals).view(np.uint8)
    lo = (b & 0x0F)                                  # rows k in [0, kh)
    hi = (b >> 4) & 0x0F                             # rows k in [kh, 2kh)
    full = np.concatenate([lo, hi], axis=0)[:nq]     # nibbles [nq, Dp], 0..15
    full3 = full.reshape(hq, hd, dp)
    # re-pack along the output axis: byte[k, j] = w[k, j] | w[k, j+Dp/2]<<4
    packed = (full3[:, :, : dp // 2]
              | (full3[:, :, dp // 2:] << 4)).astype(np.uint8)
    s = np.asarray(wo.scales)[: nq // QK]            # natural k-block order
    s3 = np.ascontiguousarray(s.reshape(hq, hd // QK, dp))
    return HeadPacked("q4_0", hq, hd, hd, wo.n,
                      np.ascontiguousarray(packed).view(np.int8), s3)


def _unpack_q4_rows(pw: PackedWeight) -> np.ndarray:
    """Planar q4 qvals [Kp/2, N] -> raw nibbles [Kp, N] (0..15), k order."""
    b = np.asarray(pw.qvals).view(np.uint8)
    return np.concatenate([b & 0x0F, (b >> 4) & 0x0F], axis=0)


def ffn_npack(gu: PackedWeight, wd: PackedWeight) -> dict:
    """Q4_0 FFN weights re-paired for wide DMA runs (decode FFN megakernel).

    The planar K-half-split gives the FFN kernel 4 narrow column tiles per
    F step (256-byte HBM runs, measured ~550 GB/s at 7B vs ~630 ceiling).
    Re-pairings that keep the unpack branch-free but double the run length:

      gate_up: byte (k, f) = gate[k, f] | up[k, f] << 4
               -> gu_q [Dp, Fp] (one byte covers BOTH gate and up)
      down:    byte (f, j) = w[f, j] | w[f, j + Dp/2] << 4   (OUTPUT-axis
               pair) -> dn_q [Fp, Dp/2]; act feeds once, two output column
               groups per step

    Scales keep the planar row order (natural k-block order).
    """
    assert gu.kind == "q4_0" and wd.kind == "q4_0"
    fp = wd.k_pad
    dp = gu.k_pad
    g_full = _unpack_q4_rows(gu)                  # [Dp, 2Fp] nibbles
    gate_n, up_n = g_full[:, :fp], g_full[:, fp:2 * fp]
    gu_q = (gate_n | (up_n << 4)).astype(np.uint8)
    gs = np.asarray(gu.scales)[:, :fp]            # [Dp/32, Fp]
    us = np.asarray(gu.scales)[:, fp:2 * fp]
    d_full = _unpack_q4_rows(wd)[:fp]             # [Fp, Dp] nibbles
    dn_q = (d_full[:, : dp // 2]
            | (d_full[:, dp // 2:] << 4)).astype(np.uint8)
    ds = np.asarray(wd.scales)[: fp // 32]        # [Fp/32, Dp]
    return {"gu_q": np.ascontiguousarray(gu_q).view(np.int8),
            "gs": np.ascontiguousarray(gs),
            "us": np.ascontiguousarray(us),
            "dn_q": np.ascontiguousarray(dn_q).view(np.int8),
            "ds": np.ascontiguousarray(ds)}


# -- on-device derivation (jnp) ----------------------------------------------
#
# The host numpy shuffles above cost ~70s at 7B (single-threaded byte ops over
# 4.2GB) and uploading pre-derived views would DOUBLE the host->device
# transfer. Instead the planar weights upload once and these jitted jnp
# mirrors derive the views on the TPU in milliseconds (pure bit/reshape ops).

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _u8(a):
    return jax.lax.bitcast_convert_type(a, jnp.uint8)


def _i8(a):
    return jax.lax.bitcast_convert_type(a, jnp.int8)


@functools.partial(jax.jit, static_argnames=("hq", "hd"))
def _wo3_q4_jnp(qvals, scales, hq: int, hd: int):
    nq = hq * hd
    kh, dp = qvals.shape
    b = _u8(qvals)
    full = jnp.concatenate([b & 0xF, (b >> 4) & 0xF], axis=0)[:nq]
    full3 = full.reshape(hq, hd, dp)
    packed = full3[:, :, : dp // 2] | (full3[:, :, dp // 2:] << 4)
    s3 = scales[: nq // QK].reshape(hq, hd // QK, dp)
    return _i8(packed), s3


@functools.partial(jax.jit, static_argnames=("hq", "hd"))
def _wo3_q8_jnp(qvals, scales, hq: int, hd: int):
    nq = hq * hd
    dp = qvals.shape[1]
    q3 = qvals[:nq].reshape(hq, hd, dp)
    s3 = scales[: nq // QK].reshape(hq, hd // QK, dp)
    return q3, s3


@jax.jit
def _ffn_npack_jnp(gu_q, gu_s, wd_q, wd_s):
    kh, n2 = gu_q.shape                      # kh = Dp/2 packed rows
    dp, fp = 2 * kh, n2 // 2
    b = _u8(gu_q)
    g_full = jnp.concatenate([b & 0xF, (b >> 4) & 0xF], axis=0)  # [Dp, 2Fp]
    gu2 = g_full[:, :fp] | (g_full[:, fp:2 * fp] << 4)
    gs, us = gu_s[:, :fp], gu_s[:, fp:2 * fp]
    db = _u8(wd_q)
    d_full = jnp.concatenate([db & 0xF, (db >> 4) & 0xF], axis=0)[:fp]
    dn = d_full[:, : dp // 2] | (d_full[:, dp // 2:] << 4)
    ds = wd_s[: fp // 32]
    return _i8(gu2), gs, us, _i8(dn), ds


def attach_head_major_jnp(layer: dict, hq: int, hkv: int, hd: int) -> bool:
    """attach_head_major, but derived ON DEVICE from already-uploaded planar
    PackedWeights (jnp bit-shuffles; one jit compile per shape, reused across
    layers). Exact same eligibility rules and byte-level results as the host
    version (conformance: tests/test_io_extra.py)."""
    wqkv, wo = layer.get("wqkv"), layer.get("wo")
    if not (isinstance(wqkv, PackedWeight) and isinstance(wo, PackedWeight)):
        return False
    if hd % QK or hd < QK:
        return False
    if wo.k != hq * hd:
        return False
    if wqkv.n_pad < (hq + 2 * hkv) * hd or wqkv.kind != wo.kind:
        return False
    # each view attaches independently and idempotently: a layer already
    # carrying wo3 but missing ffn_q4n still gets the FFN view (ADVICE r4)
    if "wo3" not in layer:
        if wo.kind == "q4_0":
            if np.asarray(wo.qvals).shape[1] % 2:
                return False
            q3, s3 = _wo3_q4_jnp(wo.qvals, wo.scales, hq=hq, hd=hd)
        elif wo.kind == "q8_0":
            q3, s3 = _wo3_q8_jnp(wo.qvals, wo.scales, hq=hq, hd=hd)
        else:
            return False
        layer["wo3"] = HeadPacked(wo.kind, hq, hd, hd, wo.n, q3, s3)
    if "ffn_q4n" in layer:
        return True
    gu, wd = layer.get("w_gate_up"), layer.get("w_down")
    if (isinstance(gu, PackedWeight) and isinstance(wd, PackedWeight)
            and gu.kind == "q4_0" and wd.kind == "q4_0"
            and gu.n_pad == 2 * wd.k_pad and wd.n_pad == gu.k_pad
            and gu.k_pad % 256 == 0 and wd.k_pad % 256 == 0
            and (gu.k_pad // 2) % 128 == 0):
        gu2, gs, us, dn, ds = _ffn_npack_jnp(gu.qvals, gu.scales,
                                             wd.qvals, wd.scales)
        layer["ffn_q4n"] = {"gu_q": gu2, "gs": gs, "us": us,
                            "dn_q": dn, "ds": ds}
    return True


def attach_head_major(layer: dict, hq: int, hkv: int, hd: int) -> bool:
    """Derive and attach head-major views for one layer dict (in place).

    Returns False (no-op) when the layer is incompatible with the fused
    attention-block kernel (unfused or dense weights, padded K rows that
    would mix heads, tiny head dims).
    """
    wqkv, wo = layer.get("wqkv"), layer.get("wo")
    if not (isinstance(wqkv, PackedWeight) and isinstance(wo, PackedWeight)):
        return False
    if hd % QK or hd < QK:
        return False
    if wo.k != hq * hd:              # logical K must be exactly the q heads
        return False
    if wqkv.n_pad < (hq + 2 * hkv) * hd or wqkv.kind != wo.kind:
        return False
    # wqkv stays PLANAR (the layer kernel regroups heads in-kernel via
    # static sub-lane slices — no duplicate needed); wo needs the head-major
    # view because its contraction is per-head
    layer["wo3"] = head_major_wo(wo, hq, hd)
    gu, wd = layer.get("w_gate_up"), layer.get("w_down")
    if (isinstance(gu, PackedWeight) and isinstance(wd, PackedWeight)
            and gu.kind == "q4_0" and wd.kind == "q4_0"
            and gu.n_pad == 2 * wd.k_pad and wd.n_pad == gu.k_pad
            and gu.k_pad % 256 == 0 and wd.k_pad % 256 == 0
            and (gu.k_pad // 2) % 128 == 0):
        layer["ffn_q4n"] = ffn_npack(gu, wd)
    return True
