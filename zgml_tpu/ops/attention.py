"""Flash attention Pallas kernels (prefill + decode) with GQA and KV-length masking.

Blockwise online-softmax attention — the TPU redesign of the reference's
streaming-softmax CPU kernel (src/tensor/forward.zig:1687-1818) and its
quantized-KV variant (src/quant.zig:925-1091). Scores are never materialized;
each KV block updates a running (max, sum, acc) triple in VMEM.

Both kernels take the *full* fixed-shape KV cache [B, Hkv, S, d] plus a dynamic
`kv_len` scalar; blocks beyond kv_len (and causally-invalid blocks) are skipped
on the compute side (the analog of seq_kv patching, device_inference.zig:252-256).

GQA (ref: llama_transformer.zig:49-51): Hq = n_rep * Hkv. Prefill maps each query
head to its KV head in the BlockSpec index maps; decode folds the n_rep query
heads of one KV head into the sublane (row) axis of the score matmul — rows are
query heads, which keeps the MXU busy even at batch 1.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zgml_tpu import config

NEG_INF = -1e30


def _interpret() -> bool:
    return config.interpret()


def _dyngrid() -> bool:
    """Dynamic KV grid dims (steps ∝ kv_len); ZGML_TPU_DYNGRID=0 restores
    static max_seq grids (compute-skipped dead steps, ~1us each)."""
    return config.dyngrid()


# -- prefill flash attention --------------------------------------------------

def _flash_kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, bq: int, bk: int, scale: float, n_rep: int,
                  bf16: bool = True):
    """One grid step = a GROUP of KV heads (ghk) over one (q-block, kv-block).

    The round-4 prefill profile showed the per-head grid (bhq, n_qb, n_kb)
    paying ~2us/step on 32KB KV DMAs — ~400us/layer at 7B pp256, HALF the
    chunk time (tools/exp_ppk.py). Folding heads into the block (the same
    fix _decode_kernel got in round 2) turns 192 steps of tiny dots into
    ~24 steps of MB-scale DMAs + one batched MXU dot per step. GQA merges
    each KV head's n_rep query heads into the sublane axis of one batched
    dot (layout-preserving reshape: bq % 8 == 0)."""
    qb = pl.program_id(1)
    kb = pl.program_id(2)
    n_kb = pl.num_programs(2)          # dynamic when the grid dim is traced
    kv_len = lens_ref[0]       # valid keys
    q_off = lens_ref[1]        # absolute position of query row 0
    ghk, bkk, d = k_ref.shape
    nrbq = n_rep * bq

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # causal + length block skip: block key range [kb*bk, kb*bk+bk) intersects
    # valid [0, min(kv_len, q_off + qb*bq + bq))
    q_abs_max = q_off + (qb + 1) * bq - 1
    block_live = (kb * bk <= q_abs_max) & (kb * bk < kv_len)

    @pl.when(block_live)
    def _():
        # bf16 MXU operands, f32 accumulate: prefill is MXU-bound and f32
        # dots run at 1/4 rate; softmax math stays f32. The cast honors the
        # ZGML_TPU_PREFILL_BF16 gate so one switch restores f32 numerics
        # across BOTH the dequant-matmul tier and the flash kernels
        mxu = jnp.bfloat16 if bf16 else jnp.float32
        # [ghk*n_rep*bq, ...] -> [ghk, n_rep*bq, d]: leading-dim regroup only
        q = q_ref[:].reshape(ghk, nrbq, d).astype(mxu)
        k = k_ref[:].astype(mxu)                  # [ghk, bk, d]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        # mask: key j (abs kb*bk+j) must be < kv_len and <= q_off + row pos;
        # row r of the merged axis is query row r % bq of its rep
        ki = jax.lax.broadcasted_iota(jnp.int32, (ghk, nrbq, bk), 2) + kb * bk
        # row r of the merged axis is query row r % bq of its rep — build it
        # as a 4D iota over (.., n_rep, bq, ..) and leading-regroup (no rem)
        qi = (jax.lax.broadcasted_iota(
            jnp.int32, (ghk, n_rep, bq, bk), 2).reshape(ghk, nrbq, bk)
            + qb * bq + q_off)
        valid = (ki < kv_len) & (ki <= qi)
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_ref[:, :, :1]                   # [ghk, nrbq, 1]
        m_cur = jnp.max(s, axis=2, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                     # [ghk, nrbq, bk]
        l_ref[:, :, :1] = (l_ref[:, :, :1] * alpha
                           + jnp.sum(p, axis=2, keepdims=True))
        m_ref[:, :, :1] = m_new
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(mxu), v_ref[:].astype(mxu),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    @pl.when(kb == n_kb - 1)
    def _():
        l = l_ref[:, :, :1]
        safe = jnp.where(l > 0, l, 1.0)
        o_ref[:] = (acc_ref[:] / safe).reshape(o_ref.shape).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("hq", "n_rep", "bq", "bk", "scale",
                                             "bf16", "dyn"))
def _flash(q, k, v, lens, *, hq: int, n_rep: int, bq: int, bk: int,
           scale: float, bf16: bool = True, dyn: bool = True):
    """q: [B*Hq, Tq, d], k/v: [B'*Hkv, S, d], lens: int32 [3] =
    (kv_len, q_off, kv_row).

    hq = query heads per batch element; flattened q-head index h maps to
    flattened kv-head index (kv_row + h // hq)*(hq // n_rep)... i.e. kv_row
    offsets into a LARGER batched cache (B' >= B): serving prefills a single
    request directly into its slot's rows of the shared cache, zero-copy
    (kv_row = slot; 0 when B' == B).

    KV index maps are clamped to the live frontier (min(kv_len, causal end))
    via scalar prefetch: dead blocks map to the last live block, so Pallas's
    consecutive-revisit elision skips their DMAs — HBM traffic scales with
    kv_len, not max_seq (the TPU analog of seq_kv patching,
    device_inference.zig:252-256).
    """
    bhq, tq, d = q.shape
    bhkv, s, _ = k.shape
    n_qb = tq // bq
    hkv = hq // n_rep
    b = bhq // hq
    # KV-head group size: the largest divisor of hkv whose per-step working
    # set fits VMEM. Bigger groups = fewer grid steps and MB-scale KV DMAs
    # (see _flash_kernel docstring).
    nrbq = n_rep * bq
    ghk = hkv
    while ghk > 1:
        est = (2 * ghk * nrbq * d * 4          # q block (x2 buffers)
               + 4 * ghk * bk * d * 2          # k+v blocks (x2 buffers)
               + 2 * ghk * nrbq * d * 4        # out block
               + ghk * nrbq * bk * 4           # scores temp
               + 2 * ghk * nrbq * 128 * 4      # m/l scratch
               + ghk * nrbq * d * 4)           # acc scratch
        if est <= (10 << 20) and hkv % ghk == 0:
            break
        ghk -= 1
    while hkv % ghk:
        ghk -= 1
    gq = ghk * n_rep
    # DYNAMIC KV grid dim: the causal mask zeroes every key >= q_off + tq and
    # >= kv_len, so only ceil(min(kv_len, q_off+tq)/bk) blocks can contribute.
    # Same compiled program for every length — the dim is a traced scalar.
    if dyn:
        live = jnp.minimum(jnp.asarray(s, jnp.int32),
                           jnp.minimum(lens[0], lens[1] + tq).astype(jnp.int32))
        n_kb = jnp.clip((live + bk - 1) // bk, 1, s // bk).astype(jnp.int32)
    else:
        n_kb = s // bk
    ngrp = hkv // ghk                  # kv-head groups per batch element

    def kv_index(g, qb_, kb_, lens_ref):
        live_end = jnp.minimum(lens_ref[0], lens_ref[1] + (qb_ + 1) * bq)
        last_kb = jnp.maximum(live_end - 1, 0) // bk
        return ((lens_ref[2] + g // ngrp) * ngrp + g % ngrp,
                jnp.minimum(kb_, last_kb), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * ngrp, n_qb, n_kb),
        in_specs=[
            pl.BlockSpec((gq, bq, d), lambda g, qb_, kb_, lens_ref:
                         (g, qb_, 0)),
            pl.BlockSpec((ghk, bk, d), kv_index),
            pl.BlockSpec((ghk, bk, d), kv_index),
        ],
        out_specs=pl.BlockSpec((gq, bq, d),
                               lambda g, qb_, kb_, lens_ref: (g, qb_, 0)),
        scratch_shapes=[
            pltpu.VMEM((ghk, nrbq, 128), jnp.float32),  # running max (col 0)
            pltpu.VMEM((ghk, nrbq, 128), jnp.float32),  # running sum
            pltpu.VMEM((ghk, nrbq, d), jnp.float32),    # output accumulator
        ],
    )
    return pl.pallas_call(
        functools.partial(_flash_kernel, bq=bq, bk=bk, scale=scale,
                          n_rep=n_rep, bf16=bf16),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bhq, tq, d), q.dtype),
        interpret=_interpret(),
    )(lens, q, k, v)


def flash_attention_pallas(q: jax.Array, k: jax.Array, v: jax.Array,
                           kv_len=None, q_offset=0,
                           bq: int = 128, bk: int = 128,
                           kv_row=None) -> jax.Array:
    """q [B,Hq,Tq,d], k/v [B,Hkv,S,d] -> [B,Hq,Tq,d]; causal with offset.

    Query row i has absolute position q_offset + i; only keys with absolute
    position < kv_len and <= query position contribute. kv_len defaults to S.

    kv_row: when set, k/v are a LARGER batched cache [B', Hkv, S, d] and this
    B==1 query reads rows of batch entry `kv_row` — the zero-copy
    prefill-into-slot path for the serving engine (inference only: the
    backward kernels assume kv_row == 0).
    """
    b, hq, tq, d = q.shape
    _, hkv, s, _ = k.shape
    n_rep = hq // hkv
    if kv_row is None:
        kv_row = 0
    else:
        assert b == 1, "kv_row requires a batch-1 query"
    if kv_len is None:
        kv_len = s
    # pad Tq to a tile-legal size (odd windows, e.g. ppl eval's W+1 tokens);
    # padded query rows compute garbage that is sliced away
    tq_pad = tq
    bq_eff = min(bq, tq)
    while tq_pad % bq_eff:
        if bq_eff % 2 == 0 and (bq_eff // 2) % 8 == 0 and tq % (bq_eff // 2) == 0:
            bq_eff //= 2
        else:
            tq_pad = (tq + bq_eff - 1) // bq_eff * bq_eff
    if n_rep > 1 and bq_eff % 8:
        # the head-folded kernel's (gq,bq,d)->(ghk,n_rep*bq,d) regroup is
        # layout-preserving only when bq is a sublane multiple; pad the query
        # window up to 8 rather than risk a Mosaic relayout (ADVICE r4)
        bq_eff = min(bq, -(-tq // 8) * 8)
        tq_pad = -(-tq // bq_eff) * bq_eff
    qp = q if tq_pad == tq else jnp.pad(
        q, ((0, 0), (0, 0), (0, tq_pad - tq), (0, 0)))
    # tile-legal KV block: halve while it divides S, but never below the
    # 8-sublane floor — odd S (ppl-eval windows, conformance stress shapes)
    # pads the cache up instead (ki < kv_len masks the padded keys; pad is
    # differentiable so training's dk/dv slice back automatically)
    bk_eff = min(bk, s)
    while bk_eff >= 16 and s % bk_eff:
        bk_eff //= 2
    s_pad = s
    if s % bk_eff:
        bk_eff = min(bk, 128)
        s_pad = -(-s // bk_eff) * bk_eff
        k = jnp.pad(k, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
    lens = jnp.stack([jnp.asarray(kv_len, jnp.int32).reshape(()),
                      jnp.asarray(q_offset, jnp.int32).reshape(()),
                      jnp.asarray(kv_row, jnp.int32).reshape(())])
    # route through the custom_vjp wrapper so jax.grad gets the Pallas
    # FlashAttention-2 backward (zgml_tpu/ops/flash_vjp.py) instead of
    # differentiating through the kernel (impossible) or the jnp ref
    # (materializes O(T^2) scores). Zero overhead when not differentiating.
    from zgml_tpu.ops.flash_vjp import make_flash_vjp
    f = make_flash_vjp(hq, n_rep, bq_eff, bk_eff, 1.0 / (d ** 0.5),
                       bf16=config.prefill_bf16(), dyn=_dyngrid())
    out = f(qp.reshape(b * hq, tq_pad, d), k.reshape(-1, s_pad, d),
            v.reshape(-1, s_pad, d), lens)
    return out.reshape(b, hq, tq_pad, d)[:, :, :tq]


# -- decode attention ---------------------------------------------------------

def _expand_lens(kv_len, b: int) -> jax.Array:
    """Scalar or per-batch [B] kv_len -> SMEM vector [B] (continuous
    batching gives each sequence its own length)."""
    lens = jnp.asarray(kv_len, jnp.int32)
    if lens.ndim == 0:
        lens = jnp.full((b,), lens, jnp.int32)
    return lens.reshape(b)


def _decode_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                   *, bk: int, scale: float, n_rep_pad: int):
    """One grid step = ALL KV heads of one batch element over one KV block.

    The round-1 grid (B*Hkv, S/bk) paid the fixed per-grid-step cost
    (DMA setup + semaphores + body dispatch) 256x per call at 7B shapes
    (32 heads x 8 blocks) — ~190us/call for 3MB of live KV, which made
    decode attention HALF the 7B decode step. Folding heads into the block
    (batched dots over the head dim) cuts the grid to (B, S/bk); the KV grid
    dim is DYNAMIC — ceil(max(kv_len)/bk) — so short contexts run 1-2 steps
    instead of S/bk compute-skipped ones (measured ~1us each)."""
    kb = pl.program_id(1)
    n_kb = pl.num_programs(1)
    kv_len = len_ref[pl.program_id(0)]   # per-batch-element valid length

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(kb * bk < kv_len)
    def _():
        h, nr, d = q_ref.shape
        q = q_ref[:].astype(jnp.float32)           # [H, nr, d] (rows = q heads)
        k = k_ref[:].astype(jnp.float32)           # [H, bk, d]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        ki = jax.lax.broadcasted_iota(jnp.int32, (h, nr, bk), 2) + kb * bk
        s = jnp.where(ki < kv_len, s, NEG_INF)     # [H, nr, bk]

        m_prev = m_ref[:, :, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:, :, :1] = (l_ref[:, :, :1] * alpha
                           + jnp.sum(p, axis=2, keepdims=True))
        m_ref[:, :, :1] = m_new
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v_ref[:].astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    @pl.when(kb == n_kb - 1)
    def _():
        l = l_ref[:, :, :1]
        safe = jnp.where(l > 0, l, 1.0)
        o_ref[:] = (acc_ref[:] / safe).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("hkv", "bk", "scale",
                                             "n_rep_pad", "dyn"))
def _decode(qg, k, v, lens, *, hkv: int, bk: int, scale: float,
            n_rep_pad: int, dyn: bool = True):
    """qg: [B*Hkv, n_rep_pad, d], k/v: [B'*Hkv, S, d], lens: int32 [B+1] —
    per-batch kv_len plus a trailing KV batch-row offset (0 when the cache
    batch B' == B; the stacked-cache/serving paths read rows offset+b_).

    KV blocks beyond each sequence's kv_len are clamped to the last live block
    in the index map (scalar prefetch), so their DMAs are elided: decode HBM
    traffic is proportional to kv_len, not max_seq.
    """
    bhkv, nr, d = qg.shape
    _, s, _ = k.shape
    nb = bhkv // hkv
    # dynamic KV grid dim: only ceil(max(kv_len)/bk) steps run (same compiled
    # program for every context length — no recompilation);
    # ZGML_TPU_DYNGRID=0 restores the static full grid
    if dyn:
        n_kb = jnp.clip(
            (jnp.max(lens[:nb]) + bk - 1) // bk, 1, s // bk).astype(jnp.int32)
    else:
        n_kb = s // bk

    def kv_map(b_, kb, lens_ref):
        last_kb = jnp.maximum(lens_ref[b_] - 1, 0) // bk
        return (lens_ref[nb] + b_, jnp.minimum(kb, last_kb), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, n_kb),
        in_specs=[
            pl.BlockSpec((hkv, nr, d), lambda b_, kb, lens_ref: (b_, 0, 0)),
            pl.BlockSpec((hkv, bk, d), kv_map),
            pl.BlockSpec((hkv, bk, d), kv_map),
        ],
        out_specs=pl.BlockSpec((hkv, nr, d),
                               lambda b_, kb, lens_ref: (b_, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hkv, nr, 128), jnp.float32),
            pltpu.VMEM((hkv, nr, 128), jnp.float32),
            pltpu.VMEM((hkv, nr, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_decode_kernel, bk=bk, scale=scale, n_rep_pad=nr),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bhkv, nr, d), qg.dtype),
        interpret=_interpret(),
    )(lens, qg, k, v)


# -- decode attention over int8 quantized KV ---------------------------------

def _pq_int8() -> bool:
    """Quantize the attention weights (p) to int8 for the value contraction
    (full ggml vec-dot discipline, both MXU dots int8). Default OFF: the
    in-kernel f32->int8 round/convert legalizes poorly on Mosaic (measured
    18-56us vs 3-10us for the f32-p variant at 7B shapes), so folding the
    per-position V scales into p and letting the dot promote int8 V wins on
    both speed AND accuracy (~0.7% vs ~3.5% max rel err)."""
    return config.attn_i8pv()


def _decode_q8_kernel(len_ref, qq_ref, qs_ref, kq_ref, ks_ref, vq_ref, vs_ref,
                      o_ref, m_ref, l_ref, acc_ref, *, bs: int, scale: float,
                      pq_i8: bool):
    """Flash decode over int8 KV with **int8 MXU dots** (ref:
    attentionQuantized, src/quant.zig:925-1091 — Q is pre-quantized once,
    K·Q and P·V run in the integer domain).

    Per-position scales factor OUT of both contractions:
      scores  = (q_i8 . k_i8)_i32 * q_scale[row] * k_scale[pos]
      out    += (pq_i8 . v_i8)_i32 * p_scale[row],  pq = quant(p * v_scale)
    so per-element VPU work is O(nr * bs) (score-sized), not O(d * bs)
    (cache-sized) like the round-1 dequant-in-VMEM kernel — which lost to
    bf16 below ~2k context. Heads folded into the block; KV grid dim dynamic
    (grid = (B, ceil(max(kv_len)/bs)), see _decode_kernel)."""
    kb = pl.program_id(1)
    n_kb = pl.num_programs(1)
    kv_len = len_ref[pl.program_id(0)]   # per-batch-element valid length

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(kb * bs < kv_len)
    def _():
        h, nr, d = qq_ref.shape
        p_i32 = jax.lax.dot_general(
            qq_ref[:], kq_ref[:], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)                   # [H, nr, bs]
        sc = qs_ref[0][:, :, None] * ks_ref[0][:, None, :] * scale
        s = p_i32.astype(jnp.float32) * sc
        ki = jax.lax.broadcasted_iota(jnp.int32, (h, nr, bs), 2) + kb * bs
        s = jnp.where(ki < kv_len, s, NEG_INF)                  # [H, nr, bs]

        m_prev = m_ref[:, :, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                                  # [H, nr, bs]
        l_ref[:, :, :1] = (l_ref[:, :, :1] * alpha
                           + jnp.sum(p, axis=2, keepdims=True))
        m_ref[:, :, :1] = m_new
        # fold the per-position V scales into p, then contract with raw int8
        # V; the alpha rescale keeps earlier blocks on the running-max scale
        pv = p * vs_ref[0][:, None, :]                          # [H, nr, bs]
        if pq_i8:
            pmax = jnp.max(pv, axis=2, keepdims=True)           # pv >= 0
            psc = pmax / 127.0
            pinv = jnp.where(psc > 0, 1.0 / jnp.where(psc > 0, psc, 1.0), 0.0)
            pq = jnp.round(pv * pinv).astype(jnp.int8)
            o_i32 = jax.lax.dot_general(
                pq, vq_ref[:], (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)               # [H, nr, d]
            upd = o_i32.astype(jnp.float32) * psc
        else:
            upd = jax.lax.dot_general(
                pv, vq_ref[:].astype(jnp.float32),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + upd

    @pl.when(kb == n_kb - 1)
    def _():
        l = l_ref[:, :, :1]
        safe = jnp.where(l > 0, l, 1.0)
        o_ref[:] = (acc_ref[:] / safe).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("hkv", "bs", "scale", "pq_i8",
                                             "dyn"))
def _decode_q8(qq, qs, kq, ks, vq, vs, kv_len, *, hkv: int, bs: int,
               scale: float, pq_i8: bool, dyn: bool = True):
    """qq: int8 [B*Hkv, nr, d]; qs: f32 [B, Hkv, nr]; kq/vq: int8
    [B*Hkv, d, S]; ks/vs: f32 [B, Hkv, S] (scales 3D so their last-two block
    dims are full/lane-aligned); kv_len: int32 [B] scalar-prefetch (clamped
    index maps — dead-block DMAs elided, traffic ∝ kv_len)."""
    bhkv, nr, d = qq.shape
    _, _, s_len = kq.shape
    if dyn:
        n_kb = jnp.clip(
            (jnp.max(kv_len) + bs - 1) // bs, 1, s_len // bs).astype(jnp.int32)
    else:
        n_kb = s_len // bs

    def kv_map(b_, kb, lens_ref):
        last_kb = jnp.maximum(lens_ref[b_] - 1, 0) // bs
        return (b_, 0, jnp.minimum(kb, last_kb))

    def sc_map(b_, kb, lens_ref):
        last_kb = jnp.maximum(lens_ref[b_] - 1, 0) // bs
        return (b_, 0, jnp.minimum(kb, last_kb))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bhkv // hkv, n_kb),
        in_specs=[
            pl.BlockSpec((hkv, nr, d), lambda b_, kb, lens_ref: (b_, 0, 0)),
            pl.BlockSpec((1, hkv, nr), lambda b_, kb, lens_ref: (b_, 0, 0)),
            pl.BlockSpec((hkv, d, bs), kv_map),
            pl.BlockSpec((1, hkv, bs), sc_map),
            pl.BlockSpec((hkv, d, bs), kv_map),
            pl.BlockSpec((1, hkv, bs), sc_map),
        ],
        out_specs=pl.BlockSpec((hkv, nr, d),
                               lambda b_, kb, lens_ref: (b_, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hkv, nr, 128), jnp.float32),
            pltpu.VMEM((hkv, nr, 128), jnp.float32),
            pltpu.VMEM((hkv, nr, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_decode_q8_kernel, bs=bs, scale=scale,
                          pq_i8=pq_i8),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bhkv, nr, d), jnp.float32),
        interpret=_interpret(),
    )(kv_len, qq, qs, kq, ks, vq, vs)


def decode_attention_q8_pallas(q: jax.Array, kq, ks, vq, vs, kv_len,
                               bs: int = 256,
                               pq_i8: bool | None = None) -> jax.Array:
    """q [B,Hq,1,d]; kq/vq int8 [B,Hkv,d,S]; ks/vs f32 [B,Hkv,S].

    pq_i8 overrides the ZGML_TPU_ATTN_I8PV default (per-call A/B)."""
    b, hq, _, d = q.shape
    _, hkv, _, s = kq.shape
    n_rep = hq // hkv
    nr_pad = max(8, n_rep)
    qg = q.reshape(b, hkv, n_rep, d).astype(jnp.float32)
    if nr_pad != n_rep:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, nr_pad - n_rep), (0, 0)))
    qg = qg.reshape(b * hkv, nr_pad, d)
    # pre-quantize Q once per call (ref: quant.zig:934-949); XLA fuses this
    qmax = jnp.max(jnp.abs(qg), axis=2)                       # [B*Hkv, nr]
    qsc = qmax / 127.0
    qinv = jnp.where(qsc > 0, 1.0 / jnp.where(qsc > 0, qsc, 1.0), 0.0)
    qq = jnp.clip(jnp.round(qg * qinv[:, :, None]), -127, 127).astype(jnp.int8)
    # S is the LANE axis of the d-major int8 cache (128 floor); odd S pads
    # the cache up — the in-kernel ki < kv_len mask covers padded keys
    bs_eff = min(bs, s)
    while bs_eff >= 256 and s % bs_eff:
        bs_eff //= 2
    if s % bs_eff:
        bs_eff = min(bs, 128)
        pad = -(-s // bs_eff) * bs_eff - s
        kq = jnp.pad(kq, ((0, 0), (0, 0), (0, 0), (0, pad)))
        vq = jnp.pad(vq, ((0, 0), (0, 0), (0, 0), (0, pad)))
        ks = jnp.pad(ks, ((0, 0), (0, 0), (0, pad)))
        vs = jnp.pad(vs, ((0, 0), (0, 0), (0, pad)))
        s += pad
    lens = _expand_lens(kv_len, b)
    out = _decode_q8(qq, qsc.reshape(b, hkv, nr_pad),
                     kq.reshape(b * hkv, d, s),
                     ks.reshape(b, hkv, s),
                     vq.reshape(b * hkv, d, s),
                     vs.reshape(b, hkv, s), lens,
                     hkv=hkv, bs=bs_eff, scale=1.0 / (d ** 0.5),
                     pq_i8=_pq_int8() if pq_i8 is None else pq_i8,
                     dyn=_dyngrid())
    out = out.reshape(b, hkv, nr_pad, d)[:, :, :n_rep]
    return out.reshape(b, hq, 1, d).astype(q.dtype)


def decode_attention_pallas(q: jax.Array, k: jax.Array, v: jax.Array,
                            kv_len, bk: int = 256,
                            kv_row=None) -> jax.Array:
    """q [B,Hq,1,d], k/v [B,Hkv,S,d], kv_len scalar -> [B,Hq,1,d].

    kv_row: when set, k/v are a LARGER batched cache [B',Hkv,S,d] and the
    B queries read cache batch rows kv_row..kv_row+B-1 — the stacked-cache
    per-layer decode path (kv_row = layer * B) and serving slots."""
    b, hq, _, d = q.shape
    bkv, hkv, s, _ = k.shape
    n_rep = hq // hkv
    nr_pad = max(8, n_rep)
    qg = q.reshape(b, hkv, n_rep, d)
    if nr_pad != n_rep:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, nr_pad - n_rep), (0, 0)))
    qg = qg.reshape(b * hkv, nr_pad, d)
    # tile-legal KV block (8-sublane floor); odd S (conformance stress,
    # ppl-eval windows) pads the cache up — ki < kv_len masks padded keys
    bk_eff = min(bk, s)
    while bk_eff >= 16 and s % bk_eff:
        bk_eff //= 2
    if s % bk_eff:
        bk_eff = min(bk, 128)
        pad = -(-s // bk_eff) * bk_eff - s
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        s += pad
    lens = _expand_lens(kv_len, b)
    row = jnp.asarray(0 if kv_row is None else kv_row, jnp.int32)
    lens = jnp.concatenate([lens, row.reshape(1)])
    out = _decode(qg, k.reshape(bkv * hkv, s, d), v.reshape(bkv * hkv, s, d),
                  lens, hkv=hkv, bk=bk_eff, scale=1.0 / (d ** 0.5),
                  n_rep_pad=nr_pad, dyn=_dyngrid())
    out = out.reshape(b, hkv, nr_pad, d)[:, :, :n_rep]
    return out.reshape(b, hq, 1, d)


# -- prefill flash attention DIRECTLY over int8 quantized KV ------------------

def _flash_q8_kernel(lens_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref,
                     o_ref, m_ref, l_ref, acc_ref,
                     *, bq: int, bk: int, scale: float,
                     bf16: bool = True):
    """Blockwise causal flash over the d-major int8 cache: both contractions
    consume the cache layout natively (scores contract d in sublanes, P.V
    contracts the position axis), so there is NO in-kernel transpose and the
    per-position scales factor out of the dots — per-element VPU work is
    score-sized O(bq*bk), not cache-sized O(d*bk). ref: attentionQuantized
    (src/quant.zig:925-1091) generalized to multi-query prefill."""
    qb = pl.program_id(1)
    kb = pl.program_id(2)
    n_kb = pl.num_programs(2)
    kv_len = lens_ref[0]
    q_off = lens_ref[1]

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q_abs_max = q_off + (qb + 1) * bq - 1
    block_live = (kb * bk <= q_abs_max) & (kb * bk < kv_len)

    @pl.when(block_live)
    def _():
        mxu = jnp.bfloat16 if bf16 else jnp.float32
        q = q_ref[0].astype(mxu)                    # [bq, d]
        kqb = kq_ref[0].astype(mxu)                 # [d, bk] (d-major!)
        s = jax.lax.dot_general(q, kqb, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * (ks_ref[0] * scale)                 # [1, bk] col scales
        ki = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + kb * bk
        qi = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + qb * bq + q_off
        s = jnp.where((ki < kv_len) & (ki <= qi), s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:, :1] = m_new
        pv = p * vs_ref[0]                          # fold V scales into p
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            pv.astype(mxu), vq_ref[0].astype(mxu),
            (((1,), (1,)), ((), ())),               # contract positions
            preferred_element_type=jnp.float32)     # -> [bq, d]

    @pl.when(kb == n_kb - 1)
    def _():
        l = l_ref[:, :1]
        safe = jnp.where(l > 0, l, 1.0)
        o_ref[0] = (acc_ref[:] / safe).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("hq", "n_rep", "bq", "bk",
                                             "scale", "bf16", "dyn"))
def _flash_q8(q, kq, ks, vq, vs, lens, *, hq: int, n_rep: int, bq: int,
              bk: int, scale: float, bf16: bool = True, dyn: bool = True):
    """q [B*Hq, Tq, d]; kq/vq int8 [B*Hkv, d, S]; ks/vs f32 [B*Hkv, 1, S]
    (scales row-flattened so the block's last-two dims (1, bk) match the
    array — Mosaic requires the second-to-last block dim be 8-divisible or
    full, and a (1, bk) block over [B, Hkv, S] is neither when Hkv > 1);
    lens = (kv_len, q_off, kv_row). Clamped KV maps: traffic ∝ kv_len."""
    bhq, tq, d = q.shape
    bhkv, _, s = kq.shape
    n_qb = tq // bq
    hkv = hq // n_rep
    if dyn:
        # min, not max: keys >= q_off + tq are causally dead for every query
        # row, and keys >= kv_len are masked — both bounds cut blocks
        live = jnp.minimum(
            jnp.asarray(s, jnp.int32),
            jnp.minimum(lens[0], lens[1] + tq).astype(jnp.int32))
        n_kb = jnp.clip((live + bk - 1) // bk, 1, s // bk).astype(jnp.int32)
    else:
        n_kb = s // bk

    def kv_index(h, qb_, kb_, lens_ref):
        live_end = jnp.minimum(lens_ref[0], lens_ref[1] + (qb_ + 1) * bq)
        last_kb = jnp.maximum(live_end - 1, 0) // bk
        return ((lens_ref[2] + h // hq) * hkv + (h % hq) // n_rep,
                0, jnp.minimum(kb_, last_kb))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bhq, n_qb, n_kb),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, qb_, kb_, lens_ref: (h, qb_, 0)),
            pl.BlockSpec((1, d, bk), kv_index),
            pl.BlockSpec((1, 1, bk), kv_index),
            pl.BlockSpec((1, d, bk), kv_index),
            pl.BlockSpec((1, 1, bk), kv_index),
        ],
        out_specs=pl.BlockSpec((1, bq, d),
                               lambda h, qb_, kb_, lens_ref: (h, qb_, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_flash_q8_kernel, bq=bq, bk=bk, scale=scale,
                          bf16=bf16),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bhq, tq, d), q.dtype),
        interpret=_interpret(),
    )(lens, q, kq, ks, vq, vs)


def flash_attention_q8_pallas(q: jax.Array, kq, ks, vq, vs,
                              kv_len=None, q_offset=0,
                              bq: int = 128, bk: int = 256,
                              kv_row=None) -> jax.Array:
    """Prefill flash attention over the int8 d-major KV cache.

    q [B,Hq,Tq,d] f32; kq/vq int8 [B',Hkv,d,S]; ks/vs f32 [B',Hkv,S].
    Causal with q_offset; kv_row selects a batch row of a larger cache
    (serving prefill-into-slot). Inference-only (no VJP: training uses the
    dense cache)."""
    b, hq, tq, d = q.shape
    _, hkv, _, s = kq.shape
    n_rep = hq // hkv
    if kv_row is None:
        kv_row = 0
    else:
        assert b == 1, "kv_row requires a batch-1 query"
    if kv_len is None:
        kv_len = s
    tq_pad = tq
    bq_eff = min(bq, tq)
    while tq_pad % bq_eff:
        if bq_eff % 2 == 0 and (bq_eff // 2) % 8 == 0 \
                and tq % (bq_eff // 2) == 0:
            bq_eff //= 2
        else:
            tq_pad = (tq + bq_eff - 1) // bq_eff * bq_eff
    qp = q if tq_pad == tq else jnp.pad(
        q, ((0, 0), (0, 0), (0, tq_pad - tq), (0, 0)))
    # S is the LANE axis of the d-major int8 cache, so blocks need bk % 128
    # (or bk == S); odd S pads the cache up (ki < kv_len masks padded keys)
    bk_eff = min(bk, s)
    while bk_eff >= 256 and s % bk_eff:
        bk_eff //= 2
    if s % bk_eff:
        bk_eff = min(bk, 128)
        pad = -(-s // bk_eff) * bk_eff - s
        kq = jnp.pad(kq, ((0, 0), (0, 0), (0, 0), (0, pad)))
        vq = jnp.pad(vq, ((0, 0), (0, 0), (0, 0), (0, pad)))
        ks = jnp.pad(ks, ((0, 0), (0, 0), (0, pad)))
        vs = jnp.pad(vs, ((0, 0), (0, 0), (0, pad)))
        s += pad
    lens = jnp.stack([jnp.asarray(kv_len, jnp.int32).reshape(()),
                      jnp.asarray(q_offset, jnp.int32).reshape(()),
                      jnp.asarray(kv_row, jnp.int32).reshape(())])
    out = _flash_q8(
        qp.reshape(b * hq, tq_pad, d).astype(jnp.float32),
        kq.reshape(-1, d, s), ks.reshape(-1, 1, s),
        vq.reshape(-1, d, s), vs.reshape(-1, 1, s), lens,
        hq=hq, n_rep=n_rep, bq=bq_eff, bk=bk_eff, scale=1.0 / (d ** 0.5),
        bf16=config.prefill_bf16(), dyn=_dyngrid())
    out = out.reshape(b, hq, tq_pad, d)[:, :, :tq]
    return out.astype(q.dtype)
