#!/usr/bin/env python
"""Contention-normalized kernel bandwidth probe.

The chip is time-shared (same kernel measured 33->258 GB/s across windows),
so absolute GB/s is meaningless unless normalized against a reference stream
measured in the SAME window. This interleaves each variant with a saxpy-style
read stream round-robin and reports bandwidth relative to the stream per
round (median over rounds).

Experiment: is the qmatmul DMA pattern (strided [bk, bn] tiles of a K-major
weight, inner burst = bn bytes) the reason decode sits at ~67% of roofline?
  wide_*:  weight [4096, 22528] -> bn-byte bursts at 22.5KB stride
  tall_*:  weight [90112, 1024], bn=1024 -> whole 512KB block contiguous
Same bytes, same tile bytes, same grid length. dma_* variants strip the
matmul (int8 tile -> one add into a tiny accumulator) to isolate pure DMA.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zgml_tpu.ops.qmatmul import _q8_matmul, _q8_matmul_i8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_call_2pt(f, x0, *rest, r1: int = 32, r2: int = 288,
                  trials: int = 3) -> float:
    """Marginal seconds/rep via a two-point fit: (t(r2) - t(r1)) / (r2 - r1).

    A single timed window includes the ~30ms host->device->host value-fetch
    RTT of the axon tunnel, which swamps sub-ms kernels at any fixed rep
    count (this poisoned every earlier probe in this repo: a 57MB-read
    kernel "measured" 21 GB/s that was 30ms RTT + 1.7ms of work). The
    two-point difference cancels ALL fixed per-dispatch cost exactly.
    f's output must be small (it is fetched as the barrier).
    """
    def make_loop(reps):
        @jax.jit
        def loop(x, *rest):
            def body(x, _):
                out = f(x, *rest)
                leaf = jax.tree.leaves(out)[0]
                dep = leaf.ravel()[0].astype(x.dtype) * 1e-30
                return x + dep, ()
            x, _ = jax.lax.scan(body, x, length=reps)
            return x
        return loop

    loop1, loop2 = make_loop(r1), make_loop(r2)
    for loop in (loop1, loop2):
        float(np.asarray(loop(x0, *rest)).ravel()[0])   # compile
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        float(np.asarray(loop1(x0, *rest)).ravel()[0])
        t1 = time.time()
        float(np.asarray(loop2(x0, *rest)).ravel()[0])
        t2 = time.time()
        slope = ((t2 - t1) - (t1 - t0)) / (r2 - r1)
        if slope > 0:
            best = min(best, slope)
    return best


def stream_fn():
    """Read-only 256MB stream; output is a [8] array (cheap fetch).

    The reduction must depend on the scan carry `x` in a NON-FACTORABLE way:
    sum(big * s) gets rewritten to s * sum(big) by the algebraic simplifier
    and hoisted as loop-invariant (measured "1078 GB/s" > HBM spec).
    max(big, x) cannot be factored."""
    n = 1 << 26
    big = jnp.zeros((n,), jnp.float32)
    x0 = jnp.zeros((8,), jnp.float32)

    def f(x, big):
        return x + jnp.max(jnp.maximum(big, x[0] * 1e-30 - 1.0)) * 1e-30

    return f, x0, (big,), 4 * n       # read-only bytes per call


def make_q8(k_pad, n_pad, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.integers(-127, 127, (k_pad, n_pad), dtype=np.int8)
    s = (rng.random((k_pad // 32, n_pad), dtype=np.float32) * 0.01).astype(
        np.float32)
    return jnp.asarray(q), jnp.asarray(s)


# -- DMA-only kernel: stream the weight blocks, one add per tile --------------

def _dma_kernel(x_ref, q_ref, o_ref, *, n_steps: int):
    step = pl.program_id(1) * pl.num_programs(2) + pl.program_id(2)

    @pl.when(step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    # touch the tile (one 8x128 corner) so the DMA can't be elided; fold in
    # the loop-carried x so the whole call is loop-variant (no hoisting)
    o_ref[:] += q_ref[:8, :128].astype(jnp.float32) + x_ref[0, 0]


@functools.partial(jax.jit, static_argnames=("bk", "bn"))
def dma_stream(x, q, *, bk: int, bn: int):
    """x: [1, 8] f32 loop-carried dependency; q: int8 weight to stream."""
    k_pad, n_pad = q.shape
    grid = (1, n_pad // bn, k_pad // bk)
    n_steps = (n_pad // bn) * (k_pad // bk)
    return pl.pallas_call(
        functools.partial(_dma_kernel, n_steps=n_steps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8), lambda mb, nb, kb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda mb, nb, kb: (kb, nb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda mb, nb, kb: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(x, q)


def main():
    variants = {}

    f_s, x_s, rest_s, sbytes = stream_fn()
    variants["stream"] = (f_s, x_s, rest_s, sbytes)

    m, bk = 8, 512
    for name, (k_pad, n_pad, bn_v) in {
        "wide_bn1024": (4096, 22528, 1024),
        "wide_bn2048": (4096, 22528, 2048),
        "tall_bn1024": (90112, 1024, 1024),
    }.items():
        q, s = make_q8(k_pad, n_pad)
        x = jnp.zeros((m, k_pad), jnp.float32)
        nbytes = q.nbytes + s.nbytes

        def kfun(x, q, s, bn_v=bn_v, bk=bk):
            out = _q8_matmul(x, q, s, bm=m, bn=bn_v, bk=bk,
                             out_dtype=np.dtype(np.float32))
            return out[:1, :8]        # cheap fetch

        variants[name] = (kfun, x, (q, s), nbytes)

        def kfun_i8(x, q, s, bn_v=bn_v, bk=bk):
            out = _q8_matmul_i8(x, q, s, bm=m, bn=bn_v, bk=bk,
                                out_dtype=np.dtype(np.float32))
            return out[:1, :8]

        variants["i8_" + name] = (kfun_i8, x, (q, s), nbytes)

        def dfun(x, q, s, bn_v=bn_v, bk=bk):
            return x + dma_stream(x, q, bk=bk, bn=bn_v)[:1, :8] * 1e-30

        variants["dma_" + name] = (dfun, jnp.zeros((1, 8), jnp.float32),
                                   (q, s), q.nbytes)

    for name, (f, x0, rest, nb) in variants.items():
        t0 = time.time()
        time_call_2pt(f, x0, *rest, r1=2, r2=4, trials=1)
        log(f"warm {name}: {time.time()-t0:.1f}s")

    ROUNDS = 6
    names = [n for n in variants if n != "stream"]
    ratios = {n: [] for n in names}
    for r in range(ROUNDS):
        f, x0, rest, nb = variants["stream"]
        dt = time_call_2pt(f, x0, *rest, r1=8, r2=72)
        ref_bw = sbytes / dt
        log(f"round {r} stream: {ref_bw/1e9:7.1f} GB/s")
        for n in names:
            f, x0, rest, nb = variants[n]
            dt = time_call_2pt(f, x0, *rest)
            bw = nb / dt
            ratios[n].append(bw / ref_bw)
            log(f"round {r} {n}: {bw/1e9:7.1f} GB/s  ratio {bw/ref_bw:.3f}")

    log("== medians (bw relative to stream-in-same-window) ==")
    for n in names:
        med = float(np.median(ratios[n]))
        log(f"{n:16s} ratio {med:.3f}")
    print("DONE")


if __name__ == "__main__":
    main()
