"""In-kernel decode of f16-bit-packed quantization scales.

Planar Q4_0/Q8_0 weights carry one scale per 32-element block. Stored f32
that is 4 bytes per block — 20 bytes/32 weights for Q4_0 vs ggml's 18
(src/quant.zig:18: f16 scale + nibbles). At 7B decode the f32 scales are
~10% of ALL weight HBM traffic. GGUF stores these scales as f16, so keeping
them f16 end-to-end is lossless vs the source; but this Mosaic toolchain
rejects f16 kernel operands outright (remote-compile 500), so the scales are
stored as their raw f16 BIT PATTERNS in int16 arrays and decoded to f32
in-kernel with integer ops + one bitcast.

The decode is exact for every finite f16 (normals via exponent rebias,
subnormals via integer convert — the magic-multiplier shortcut is one op
cheaper but this VPU flushes the subnormal intermediate to zero, measured).
Scale tensors are 32x smaller than the weights they describe, so the ~8 VPU
ops per element hide under the weight-tile DMA.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def kscale_f32(s: jax.Array) -> jax.Array:
    """Loaded scale block -> f32. int16 = f16 bit patterns (compact
    storage); f32 passes through (legacy layout); anything else upcasts."""
    if s.dtype == jnp.int16:
        h = s.astype(jnp.int32) & 0xFFFF
        ex = (h >> 10) & 0x1F
        man = h & 0x3FF
        bits = ((h >> 15) << 31) | ((ex + 112) << 23) | (man << 13)
        normal = pltpu.bitcast(bits, jnp.float32)
        sub = man.astype(jnp.float32) * jnp.float32(2.0 ** -24)
        sub = jnp.where((h >> 15) == 1, -sub, sub)
        return jnp.where(ex == 0, sub, normal)
    if s.dtype != jnp.float32:
        return s.astype(jnp.float32)
    return s


def xscale_f32(s: jax.Array) -> jax.Array:
    """XLA-tier (outside-kernel) variant: int16 f16-bits -> f32 via a
    bitcast (XLA handles f16 fine; only Mosaic rejects it)."""
    if s.dtype == jnp.int16:
        return jax.lax.bitcast_convert_type(s, jnp.float16).astype(
            jnp.float32)
    if s.dtype != jnp.float32:
        return s.astype(jnp.float32)
    return s
