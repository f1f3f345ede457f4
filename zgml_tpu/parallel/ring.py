"""Ring attention: context-parallel causal attention over a sequence sharded
across the mesh.

No reference counterpart (SURVEY.md §5: sequence scaling on TPU "must come
from KV-cache sharding, blockwise flash attention, and optionally
ring-attention over the ICI mesh axis — new components"). This is the
blockwise-parallel ring formulation: each device owns a query block and its
KV shard; KV shards rotate around the ring via ppermute while each device
folds every visiting block into an online-softmax accumulator. Peak memory is
O(T/cp) per device and the KV transfer rides the ICI ring.

Two tiers, same ppermute ring (lax.ppermute inside shard_map, testable on the
virtual CPU mesh): the kernel tier folds each visiting KV block through the
blockwise flash kernel (ops/flash_vjp._flash_fwd returns per-row LSE, so hops
merge by the standard flash rescale — no O(t_loc^2) score transient, matching
the reference's streaming-softmax discipline, forward.zig:1675-1686); the jnp
einsum version below stays as the ref-tier oracle (ZGML_TPU_KERNELS=ref).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from zgml_tpu.parallel.tp import shard_map

NEG_INF = -1e30


def _flash_hop(q, k_cur, v_cur, q_off):
    """One ring hop through the blockwise flash kernel.

    q [B,Hq,t,d] attends the visiting KV block k/v [B,Hkv,s,d] whose keys
    have absolute positions owner*t + j; q_off = (idx - owner) * t (traced,
    negative for future blocks = fully masked). Returns (o [B,Hq,t,d] f32
    normalized within the hop, lse [B,Hq,t] f32, -inf where no live keys).
    """
    from zgml_tpu import config
    from zgml_tpu.ops.flash_vjp import _flash_fwd
    b, hq, t, d = q.shape
    _, hkv, s, _ = k_cur.shape
    n_rep = hq // hkv
    bq = min(128, -(-t // 8) * 8)
    t_pad = -(-t // bq) * bq
    bk = min(128, -(-s // 8) * 8)
    s_pad = -(-s // bk) * bk
    qp = q if t_pad == t else jnp.pad(
        q, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))
    kp = k_cur if s_pad == s else jnp.pad(
        k_cur, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
    vp = v_cur if s_pad == s else jnp.pad(
        v_cur, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
    lens = jnp.stack([jnp.asarray(s, jnp.int32).reshape(()),
                      jnp.asarray(q_off, jnp.int32).reshape(()),
                      jnp.zeros((), jnp.int32)])
    o, lse = _flash_fwd(qp.reshape(b * hq, t_pad, d),
                        kp.reshape(b * hkv, s_pad, d),
                        vp.reshape(b * hkv, s_pad, d), lens,
                        hq=hq, n_rep=n_rep, bq=bq, bk=bk,
                        scale=1.0 / (d ** 0.5),
                        bf16=config.prefill_bf16(), dyn=False)
    o = o.reshape(b, hq, t_pad, d)[:, :, :t].astype(jnp.float32)
    lse = lse.reshape(b, hq, t_pad, 128)[:, :, :t, 0]
    # the kernel marks empty rows with +inf LSE (backward convention); the
    # ring merge wants weight 0 for them, i.e. -inf
    lse = jnp.where(lse == jnp.inf, -jnp.inf, lse)
    return o, lse


def _ring_attention_flash(q, k, v, axis_name: str):
    """Kernel-tier causal ring attention: per-hop blockwise flash + LSE
    merge. Peak per-device transient is O(t_loc * d), never t_loc^2."""
    cp = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, hq, t_loc, d = q.shape

    out0 = jnp.zeros((b, hq, t_loc, d), jnp.float32)
    lse0 = jnp.full((b, hq, t_loc), -jnp.inf, jnp.float32)

    def body(i, carry):
        k_cur, v_cur, out, lse = carry
        owner = (idx - i) % cp
        o_i, lse_i = _flash_hop(q, k_cur, v_cur, (idx - owner) * t_loc)
        m = jnp.maximum(lse, lse_i)
        m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
        w1 = jnp.where(jnp.isneginf(lse), 0.0, jnp.exp(lse - m_safe))
        w2 = jnp.where(jnp.isneginf(lse_i), 0.0, jnp.exp(lse_i - m_safe))
        denom = w1 + w2
        safe_d = jnp.where(denom > 0, denom, 1.0)
        out = (out * w1[..., None] + o_i * w2[..., None]) / safe_d[..., None]
        lse = jnp.where(denom > 0, m_safe + jnp.log(safe_d), -jnp.inf)
        perm = [(j, (j + 1) % cp) for j in range(cp)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, out, lse)

    _, _, out, _ = jax.lax.fori_loop(0, cp, body, (k, v, out0, lse0))
    return out.astype(q.dtype)


def _ring_attention_local(q, k, v, axis_name: str, causal: bool = True):
    """Inside shard_map. q: [B, Hq, T_loc, d], k/v: [B, Hkv, T_loc, d] (this
    device's sequence shard); GQA-aware (Hq = n_rep * Hkv — the un-repeated
    KV rotates around the ring, so ICI traffic is Hkv-sized, not Hq-sized).
    Returns [B, Hq, T_loc, d]."""
    if causal:
        from zgml_tpu.ops import dispatch
        if dispatch.use_pallas("ring_attention"):
            from zgml_tpu.runtime.profile import global_profile
            global_profile.count_op("ring_attention", "pallas")
            return _ring_attention_flash(q, k, v, axis_name)
    cp = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, hq, t_loc, d = q.shape
    hkv = k.shape[1]
    n_rep = hq // hkv
    scale = 1.0 / (d ** 0.5)
    qf = q.astype(jnp.float32).reshape(b, hkv, n_rep, t_loc, d)

    m0 = jnp.full((b, hkv, n_rep, t_loc, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, hkv, n_rep, t_loc, 1), jnp.float32)
    acc0 = jnp.zeros((b, hkv, n_rep, t_loc, d), jnp.float32)

    def body(i, carry):
        k_cur, v_cur, m, l, acc = carry
        owner = (idx - i) % cp                       # whose KV block this is
        s = jnp.einsum("bhrqd,bhkd->bhrqk", qf,
                       k_cur.astype(jnp.float32)) * scale
        if causal:
            qi = jax.lax.broadcasted_iota(jnp.int32, (t_loc, t_loc), 0) \
                + idx * t_loc
            ki = jax.lax.broadcasted_iota(jnp.int32, (t_loc, t_loc), 1) \
                + owner * t_loc
            s = jnp.where((ki <= qi)[None, None, None], s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum("bhrqk,bhkd->bhrqd", p,
                                       v_cur.astype(jnp.float32))
        # rotate KV to the right neighbour (ring over ICI)
        perm = [(j, (j + 1) % cp) for j in range(cp)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, m_new, l, acc)

    k_c, v_c, m, l, acc = jax.lax.fori_loop(
        0, cp, body, (k, v, m0, l0, acc0))
    safe = jnp.where(l > 0, l, 1.0)
    return (acc / safe).reshape(b, hq, t_loc, d).astype(q.dtype)


def make_ring_attention(mesh: Mesh, axis: str = "tp", causal: bool = True):
    """jit(shard_map) ring attention over sequence-sharded q/k/v
    [B, H, T, d] with T sharded along `axis`."""
    spec = P(None, None, axis, None)

    def fn(q, k, v):
        return _ring_attention_local(q, k, v, axis, causal)

    sm = shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return jax.jit(sm)
