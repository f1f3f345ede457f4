"""Fused elementwise-chain Pallas kernel.

The analog of the reference's comptime-specialized FusedKernel
(src/tensor/fused.zig:469-500): a chain of elementwise ops runs as ONE pass
over the data in VMEM. The chain spec is a list of (op, side_input?) steps
closed over at trace time — the Python closure plays the role of Zig comptime
specialization (branch-free unrolled loop in the compiled kernel).
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


def fused_chain(x: jax.Array, steps, side_inputs: list[jax.Array],
                bm: int = 256):
    """Apply a chain of elementwise ops in one kernel pass.

    steps: list of callables; step i is called as fn(acc) or fn(acc, side)
    when it consumes the next side input (binary step). Side inputs must be
    broadcast-compatible with x (same shape after the caller broadcasts).
    Differentiable: the backward recomputes the chain with plain jnp ops
    (the steps are jnp callables), so jax.grad through a fused graph works.
    """
    return _chain_vjp(tuple(steps), bm, x, *side_inputs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _chain_vjp(steps, bm, x, *sides):
    return _chain_impl(x, steps, list(sides), bm)


def _chain_jnp(steps, x, *sides):
    acc = x
    si = 0
    for fn, takes_side in steps:
        if takes_side:
            acc = fn(acc, jnp.broadcast_to(sides[si], x.shape))
            si += 1
        else:
            acc = fn(acc)
    return acc


def _chain_fwd(steps, bm, x, *sides):
    return _chain_vjp(steps, bm, x, *sides), (x, sides)


def _chain_bwd(steps, bm, res, g):
    x, sides = res
    _, vjp = jax.vjp(lambda x, *s: _chain_jnp(steps, x, *s), x, *sides)
    return vjp(g)


_chain_vjp.defvjp(_chain_fwd, _chain_bwd)


def _chain_impl(x: jax.Array, steps, side_inputs: list[jax.Array], bm: int):
    shape = x.shape
    n = 1
    for d in shape:
        n *= d
    # flatten to [rows, 128-mult] for clean tiling
    lanes = 128
    rows = (n + lanes - 1) // lanes
    pad = rows * lanes - n

    def flat(a):
        a = jnp.broadcast_to(a, shape).reshape(-1)
        if pad:
            a = jnp.pad(a, (0, pad))
        return a.reshape(rows, lanes)

    xf = flat(x)
    sides = [flat(s) for s in side_inputs]
    bm_eff = min(bm, rows)
    while rows % bm_eff:
        bm_eff -= 1

    def kernel(x_ref, *refs):
        side_refs = refs[:-1]
        o_ref = refs[-1]
        acc = x_ref[:]
        si = 0
        for fn, takes_side in steps:
            if takes_side:
                acc = fn(acc, side_refs[si][:])
                si += 1
            else:
                acc = fn(acc)
        o_ref[:] = acc

    out = pl.pallas_call(
        kernel,
        grid=(rows // bm_eff,),
        in_specs=[pl.BlockSpec((bm_eff, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * (1 + len(sides)),
        out_specs=pl.BlockSpec((bm_eff, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, lanes), x.dtype),
        interpret=_interpret(),
    )(xf, *sides)
    return out.reshape(-1)[:n].reshape(shape)
