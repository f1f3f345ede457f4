"""Custom VJP for the flash-attention Pallas kernel (training path).

The reference cannot train attention at all — its backward panics
(src/tensor/backward.zig:393-404). Here training gets the full flash
treatment: the forward kernel additionally saves the per-row logsumexp
(LSE), and two Pallas backward kernels recompute probabilities blockwise
(the standard FlashAttention-2 backward), so scores are never materialized
in either direction:

    dV = P^T dO
    dP = dO V^T
    dS = P * (dP - rowsum(dO * O))
    dQ = dS K * scale        (accumulated over KV blocks)
    dK = dS^T Q * scale      (accumulated over Q blocks)

LSE is stored [B*Hq, Tq, 128] with the value replicated across the 128-lane
axis (the minimum TPU lane tile), so both the forward write and the backward
read are full-lane blocks — no lane<->sublane relayouts, at the cost of a
tiny 512 B/row sidecar.
GQA: dK/dV are produced per *query* head and the n_rep group is summed
outside the kernel (one cheap XLA reduction over a [B,Hkv,n_rep,S,d] view).

KV-block DMAs use the same kv_len-clamped scalar-prefetch index maps as the
inference kernels, so backward HBM traffic also scales with the live prefix.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zgml_tpu.ops.attention import NEG_INF, _flash, _interpret


# -- forward with LSE ---------------------------------------------------------

def _fwd_kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_ref, l_ref, acc_ref, *, bq, bk, scale,
                bf16=True):
    qb = pl.program_id(1)
    kb = pl.program_id(2)
    n_kb = pl.num_programs(2)          # dynamic when the grid dim is traced
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
        # MXU operand dtype matches the inference kernel bit-for-bit
        # (bf16 unless ZGML_TPU_PREFILL_BF16=0); softmax math stays f32
        mxu = jnp.bfloat16 if bf16 else jnp.float32
        q = q_ref[0].astype(mxu)
        k = k_ref[0].astype(mxu)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        ki = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + kb * bk
        qi = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + qb * bq + q_off
        valid = (ki < kv_len) & (ki <= qi)
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:, :1] = m_new
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(mxu), v_ref[0].astype(mxu),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kb == n_kb - 1)
    def _():
        l = l_ref[:, :1]
        safe = jnp.where(l > 0, l, 1.0)
        o_ref[0] = (acc_ref[:] / safe).astype(o_ref.dtype)
        # rows with no live keys get +inf LSE -> exp(s - lse) == 0 in backward
        lse = jnp.where(l > 0, m_ref[:, :1] + jnp.log(safe),
                        jnp.float32(jnp.inf))
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


@functools.partial(jax.jit, static_argnames=("hq", "n_rep", "bq", "bk",
                                             "scale", "bf16", "dyn"))
def _flash_fwd(q, k, v, lens, *, hq, n_rep, bq, bk, scale, bf16=True,
               dyn=True):
    """Like attention._flash but also returns LSE [tq, B*Hq] (transposed).

    lens [3] = (kv_len, q_off, kv_row); kv_row offsets into a larger batched
    cache (see attention._flash) — the backward kernels assume kv_row == 0."""
    bhq, tq, d = q.shape
    _, s, _ = k.shape
    n_qb = tq // bq
    hkv = hq // n_rep
    # dynamic KV grid dim (see attention._flash): the causal mask kills every
    # key >= min(kv_len, q_off + tq), so dead blocks need not even be steps
    if dyn:
        live = jnp.minimum(jnp.asarray(s, jnp.int32),
                           jnp.minimum(lens[0], lens[1] + tq).astype(jnp.int32))
        n_kb = jnp.clip((live + bk - 1) // bk, 1, s // bk).astype(jnp.int32)
    else:
        n_kb = s // bk

    def kv_index(h, qb_, kb_, lens_ref):
        live_end = jnp.minimum(lens_ref[0], lens_ref[1] + (qb_ + 1) * bq)
        last_kb = jnp.maximum(live_end - 1, 0) // bk
        return ((lens_ref[2] + h // hq) * hkv + (h % hq) // n_rep,
                jnp.minimum(kb_, last_kb), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bhq, n_qb, n_kb),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, qb_, kb_, lens_ref: (h, qb_, 0)),
            pl.BlockSpec((1, bk, d), kv_index),
            pl.BlockSpec((1, bk, d), kv_index),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda h, qb_, kb_, lens_ref: (h, qb_, 0)),
            pl.BlockSpec((1, bq, 128), lambda h, qb_, kb_, lens_ref: (h, qb_, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, bq=bq, bk=bk, scale=scale,
                          bf16=bf16),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bhq, tq, d), q.dtype),
                   jax.ShapeDtypeStruct((bhq, tq, 128), jnp.float32)],
        interpret=_interpret(),
    )(lens, q, k, v)


# -- backward: dQ -------------------------------------------------------------

def _dq_kernel(lens_ref, q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
               dq_ref, acc_ref, *, bq, bk, scale, n_kb, bf16=True):
    qb = pl.program_id(1)
    kb = pl.program_id(2)
    kv_len = lens_ref[0]
    q_off = lens_ref[1]

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q_abs_max = q_off + (qb + 1) * bq - 1
    block_live = (kb * bk <= q_abs_max) & (kb * bk < kv_len)

    @pl.when(block_live)
    def _():
        # bf16 MXU operands exactly as the forward kernel used them, so the
        # recomputed scores (and hence p = exp(s - lse)) match the stored
        # LSE bit-for-bit; without this p rows don't sum to 1 against o/delta
        # and the gradient carries a systematic bf16-scale bias
        mxu = jnp.bfloat16 if bf16 else jnp.float32
        q = q_ref[0].astype(mxu)
        k = k_ref[0].astype(mxu)
        do = do_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        ki = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + kb * bk
        qi = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + qb * bq + q_off
        s = jnp.where((ki < kv_len) & (ki <= qi), s, NEG_INF)
        p = jnp.exp(s - lse_ref[0, :, :1])                  # [bq, bk]
        dp = jax.lax.dot_general(do.astype(mxu),
                                 v_ref[0].astype(mxu),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        delta = jnp.sum(do * o_ref[0].astype(jnp.float32), axis=1,
                        keepdims=True)                      # [bq, 1]
        ds = p * (dp - delta) * scale
        acc_ref[:] += jax.lax.dot_general(
            ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kb == n_kb - 1)
    def _():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


@functools.partial(jax.jit, static_argnames=("hq", "n_rep", "bq", "bk",
                                             "scale", "bf16"))
def _flash_dq(q, k, v, do, o, lse, lens, *, hq, n_rep, bq, bk, scale,
              bf16=True):
    bhq, tq, d = q.shape
    _, s, _ = k.shape
    n_qb, n_kb = tq // bq, s // bk
    hkv = hq // n_rep

    def kv_index(h, qb_, kb_, lens_ref):
        live_end = jnp.minimum(lens_ref[0], lens_ref[1] + (qb_ + 1) * bq)
        last_kb = jnp.maximum(live_end - 1, 0) // bk
        return ((h // hq) * hkv + (h % hq) // n_rep,
                jnp.minimum(kb_, last_kb), 0)

    def q_index(h, qb_, kb_, lens_ref):
        return (h, qb_, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bhq, n_qb, n_kb),
        in_specs=[
            pl.BlockSpec((1, bq, d), q_index),
            pl.BlockSpec((1, bk, d), kv_index),
            pl.BlockSpec((1, bk, d), kv_index),
            pl.BlockSpec((1, bq, d), q_index),
            pl.BlockSpec((1, bq, d), q_index),
            pl.BlockSpec((1, bq, 128), q_index),
        ],
        out_specs=pl.BlockSpec((1, bq, d), q_index),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_dq_kernel, bq=bq, bk=bk, scale=scale, n_kb=n_kb,
                          bf16=bf16),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bhq, tq, d), q.dtype),
        interpret=_interpret(),
    )(lens, q, k, v, do, o, lse)


# -- backward: dK, dV (per query head; GQA group summed by the caller) --------

def _dkv_kernel(lens_ref, q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                dk_ref, dv_ref, acck_ref, accv_ref, *, bq, bk, scale, n_qb,
                bf16=True):
    kb = pl.program_id(1)
    qb = pl.program_id(2)
    kv_len = lens_ref[0]
    q_off = lens_ref[1]

    @pl.when(qb == 0)
    def _():
        acck_ref[:] = jnp.zeros_like(acck_ref)
        accv_ref[:] = jnp.zeros_like(accv_ref)

    q_abs_max = q_off + (qb + 1) * bq - 1
    block_live = (kb * bk <= q_abs_max) & (kb * bk < kv_len)

    @pl.when(block_live)
    def _():
        # score/dp operand dtype matching the forward kernel (see _dq_kernel)
        mxu = jnp.bfloat16 if bf16 else jnp.float32
        q = q_ref[0].astype(mxu)
        k = k_ref[0].astype(mxu)
        v = v_ref[0].astype(mxu)
        do = do_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        ki = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + kb * bk
        qi = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + qb * bq + q_off
        s = jnp.where((ki < kv_len) & (ki <= qi), s, NEG_INF)
        p = jnp.exp(s - lse_ref[0, :, :1])                  # [bq, bk]
        accv_ref[:] += jax.lax.dot_general(
            p.astype(mxu), do.astype(mxu),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [bk, d]
        dp = jax.lax.dot_general(do.astype(jnp.bfloat16), v,
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        delta = jnp.sum(do * o_ref[0].astype(jnp.float32), axis=1,
                        keepdims=True)
        ds = p * (dp - delta) * scale
        acck_ref[:] += jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [bk, d]

    @pl.when(qb == n_qb - 1)
    def _():
        dk_ref[0] = acck_ref[:].astype(dk_ref.dtype)
        dv_ref[0] = accv_ref[:].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("hq", "n_rep", "bq", "bk",
                                             "scale", "bf16"))
def _flash_dkv(q, k, v, do, o, lse, lens, *, hq, n_rep, bq, bk, scale,
               bf16=True):
    """Returns (dk, dv) per QUERY head: [B*Hq, S, d] each."""
    bhq, tq, d = q.shape
    _, s, _ = k.shape
    n_qb, n_kb = tq // bq, s // bk
    hkv = hq // n_rep

    def kv_index(h, kb_, qb_, lens_ref):
        last_kb = jnp.maximum(lens_ref[0] - 1, 0) // bk
        return ((h // hq) * hkv + (h % hq) // n_rep,
                jnp.minimum(kb_, last_kb), 0)

    def q_index(h, kb_, qb_, lens_ref):
        return (h, qb_, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bhq, n_kb, n_qb),
        in_specs=[
            pl.BlockSpec((1, bq, d), q_index),
            pl.BlockSpec((1, bk, d), kv_index),
            pl.BlockSpec((1, bk, d), kv_index),
            pl.BlockSpec((1, bq, d), q_index),
            pl.BlockSpec((1, bq, d), q_index),
            pl.BlockSpec((1, bq, 128), q_index),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda h, kb_, qb_, lens_ref: (h, kb_, 0)),
            pl.BlockSpec((1, bk, d), lambda h, kb_, qb_, lens_ref: (h, kb_, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((bk, d), jnp.float32),
                        pltpu.VMEM((bk, d), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_dkv_kernel, bq=bq, bk=bk, scale=scale, n_qb=n_qb,
                          bf16=bf16),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bhq, s, d), k.dtype),
                   jax.ShapeDtypeStruct((bhq, s, d), v.dtype)],
        interpret=_interpret(),
    )(lens, q, k, v, do, o, lse)


# -- custom_vjp assembly ------------------------------------------------------

@functools.lru_cache(maxsize=None)
def make_flash_vjp(hq: int, n_rep: int, bq: int, bk: int, scale: float,
                   bf16: bool = True, dyn: bool = True):
    """custom_vjp-wrapped flash attention for one static geometry.

    Signature: f(q [B*Hq, Tq, d], k [B*Hkv, S, d], v, lens int32 [2]) -> o.
    bf16 selects the MXU operand dtype in forward AND backward (they must
    match so the recomputed p agrees with the stored LSE). dyn enables the
    dynamic KV grid dim in the forward kernels (backward grids stay static)."""
    kw = dict(hq=hq, n_rep=n_rep, bq=bq, bk=bk, scale=scale, bf16=bf16)
    fkw = dict(kw, dyn=dyn)

    @jax.custom_vjp
    def f(q, k, v, lens):
        return _flash(q, k, v, lens, **fkw)

    def fwd(q, k, v, lens):
        o, lse = _flash_fwd(q, k, v, lens, **fkw)
        return o, (q, k, v, lens, o, lse)

    def bwd(res, g):
        q, k, v, lens, o, lse = res
        bhq = q.shape[0]
        b = bhq // hq
        hkv = hq // n_rep
        dq = _flash_dq(q, k, v, g, o, lse, lens, **kw)
        dkh, dvh = _flash_dkv(q, k, v, g, o, lse, lens, **kw)
        # GQA group-sum: query heads of one KV head are adjacent in the
        # flattened head axis (h // n_rep = kv head)
        s, d = dkh.shape[1:]
        dk = dkh.reshape(b, hkv, n_rep, s, d).sum(axis=2).reshape(b * hkv, s, d)
        dv = dvh.reshape(b, hkv, n_rep, s, d).sum(axis=2).reshape(b * hkv, s, d)
        dlens = np.zeros(lens.shape, jax.dtypes.float0)
        return dq, dk, dv, dlens

    f.defvjp(fwd, bwd)
    return f
