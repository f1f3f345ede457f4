"""Fused RMSNorm(+scale) Pallas kernel.

One pass over rows resident in VMEM: mean-of-squares reduce on the VPU, rsqrt,
scale by gamma — the "rmsnorm-scale" fusion the reference's Metal command stream
builds specially (SURVEY.md §2.6, program.zig rmsnorm-scale chains). Semantics
match refs.rmsnorm_ref / src/tensor/forward.zig:1413-1509.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zgml_tpu import config


def _interpret() -> bool:
    return config.interpret()


def _rmsnorm_kernel(x_ref, g_ref, o_ref, *, eps: float, d_logical: int):
    x = x_ref[:].astype(jnp.float32)
    # mean over the *logical* feature dim (lane padding contributes zeros)
    ms = jnp.sum(x * x, axis=-1, keepdims=True) / d_logical
    o_ref[:] = (x * jax.lax.rsqrt(ms + eps) * g_ref[:].astype(jnp.float32)
                ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "bm", "d_logical"))
def _rmsnorm2d(x, gamma2d, eps: float, bm: int, d_logical: int):
    m, d = x.shape
    grid = (m // bm,)
    return pl.pallas_call(
        functools.partial(_rmsnorm_kernel, eps=eps, d_logical=d_logical),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        interpret=_interpret(),
    )(x, gamma2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def rmsnorm_pallas(x: jax.Array, gamma: jax.Array, eps: float = 1e-5) -> jax.Array:
    return _rmsnorm_impl(x, gamma, eps)


def _rmsnorm_fwd(x, gamma, eps):
    return _rmsnorm_impl(x, gamma, eps), (x, gamma)


def _rmsnorm_bwd(eps, res, g):
    # backward recomputes via the jnp composition — a norm row is a few KB, so
    # the recompute is XLA-fusion fodder, not a kernel's worth of work
    from zgml_tpu.ops import refs
    x, gamma = res
    _, vjp = jax.vjp(lambda x, gm: refs.rmsnorm_ref(x, gm, eps), x, gamma)
    return vjp(g)


rmsnorm_pallas.defvjp(_rmsnorm_fwd, _rmsnorm_bwd)


def _rmsnorm_impl(x: jax.Array, gamma: jax.Array, eps: float) -> jax.Array:
    lead = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    m = x2.shape[0]
    bm = 8
    m_pad = (m + bm - 1) // bm * bm
    d_pad = (d + 127) // 128 * 128  # explicit zero lane-padding keeps the
    g2 = gamma.reshape(1, d)        # mean-of-squares sum exact
    if m_pad != m or d_pad != d:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, d_pad - d)))
        g2 = jnp.pad(g2, ((0, 0), (0, d_pad - d)))
    out = _rmsnorm2d(x2, g2, float(eps), bm, d)
    return out[:m, :d].reshape(*lead, d)
