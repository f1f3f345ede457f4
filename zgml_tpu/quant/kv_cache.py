"""Int8 block-quantized KV cache (ref: QuantizedKVCache, src/quant.zig:645-910).

The reference stores column-major int8 K/V with one f32 scale per 32-element
block along d_head per cached position. This keeps that quantization scheme
(so accuracy parity holds) but re-lays it out d-major for TPU:

  k_q / v_q : int8 [B, Hkv, d, S]       (d on the sublane axis, S on lanes)
  k_s / v_s : f32  [B, Hkv, d//32, S]   (per-(position, 32-d-block) scales)

Why d-major: the decode kernel contracts q[nr, d] @ k_deq[d, bs] directly (no
transpose), and the per-block scales broadcast along the *sublane* axis —
32-row groups — which is a cheap relayout, never a 128-wide lane broadcast.
Writing one decoded position updates a single lane column (tile-local DUS).

~3.6x smaller than f32 cache, matching the reference's memory lever
(quant.zig:636-644).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from zgml_tpu.quant.blocks import QK


def kv_block(head_dim: int) -> int:
    """Quant block along d: 32 (the reference's block) when it divides
    head_dim, else the whole head (small demo models)."""
    return QK if head_dim % QK == 0 else head_dim


def init_quant_cache(n_layers: int, batch: int, n_kv_heads: int, max_seq: int,
                     head_dim: int) -> dict:
    blk = kv_block(head_dim)
    qs = (batch, n_kv_heads, head_dim, max_seq)
    ss = (batch, n_kv_heads, head_dim // blk, max_seq)
    mk = lambda: [jnp.zeros(qs, jnp.int8) for _ in range(n_layers)]  # noqa: E731
    ms = lambda: [jnp.ones(ss, jnp.float32) for _ in range(n_layers)]  # noqa: E731
    return {"k_q": mk(), "k_s": ms(), "v_q": mk(), "v_s": ms(), "int8": True}


def quantize_columns(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[B, H, T, d] -> (int8 [B, H, d, T], scales f32 [B, H, d//32, T]).

    Per-(position, 32-d-block) absmax/127 quantization — identical math to the
    reference's storeColumn (quant.zig:687-699)."""
    b, h, t, d = x.shape
    blk = kv_block(d)
    xf = x.astype(jnp.float32).reshape(b, h, t, d // blk, blk)
    amax = jnp.max(jnp.abs(xf), axis=-1)                    # [B,H,T,d/32]
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.clip(jnp.round(xf * inv[..., None]), -127, 127).astype(jnp.int8)
    q = q.reshape(b, h, t, d).transpose(0, 1, 3, 2)          # d-major
    s = scale.transpose(0, 1, 3, 2)                          # [B,H,d/32,T]
    return q, s


def write_columns(cache_q: jax.Array, cache_s: jax.Array, q: jax.Array,
                  s: jax.Array, pos) -> tuple[jax.Array, jax.Array]:
    """Insert T quantized columns at position pos (lane-axis DUS)."""
    cache_q = jax.lax.dynamic_update_slice(cache_q, q, (0, 0, 0, pos))
    cache_s = jax.lax.dynamic_update_slice(cache_s, s, (0, 0, 0, pos))
    return cache_q, cache_s


def dequantize_cache(cache_q: jax.Array, cache_s: jax.Array,
                     dtype=jnp.float32) -> jax.Array:
    """Oracle / prefill path: [B,H,d,S] int8 + scales -> [B,H,S,d] dtype."""
    blk = cache_q.shape[2] // cache_s.shape[2]
    s = jnp.repeat(cache_s, blk, axis=2)                      # [B,H,d,S]
    full = cache_q.astype(jnp.float32) * s
    return full.transpose(0, 1, 3, 2).astype(dtype)
