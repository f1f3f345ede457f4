"""Validate the tape-streamer decode design: manually double-buffered DMA of a
flat tile tape (HBM -> one shared VMEM window) with a dot per tile, vs the
streaming probe and vs an automatic-pipeline pallas_call at the same tile size.

The merged layer kernel loses to VMEM fragmentation (each phase's operands get
their own double-buffered window under automatic pipelining). If ONE manual
window can stream at probe bandwidth, every weight phase can share it and a
whole layer (or the whole stack) fits in one Pallas call with full-size tiles.

Usage: python tools/exp_tape.py [tape_mb] [tile_kb]
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from zgml_tpu.runtime.ktime import time_call                   # noqa: E402

tape_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
tile_kb = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

TILE = tile_kb << 10
N = (tape_mb << 20) // TILE
ROWS = TILE // 512                       # int8 tile [ROWS, 512]

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
tape = jnp.asarray(rng.integers(-127, 127, (N, ROWS, 512), dtype=np.int8))
x = jnp.asarray(rng.standard_normal((8, ROWS)), jnp.float32)


def _stream_kernel(tape_ref, x_ref, o_ref, win, acc, sem):
    n = tape_ref.shape[0]

    def dma(slot, t):
        return pltpu.make_async_copy(tape_ref.at[t], win.at[slot],
                                     sem.at[slot])

    dma(0, 0).start()
    acc[:] = jnp.zeros_like(acc)

    def body(t, _):
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        @pl.when(t + 1 < n)
        def _():
            dma(nxt, t + 1).start()

        dma(slot, t).wait()
        # one bf16 MXU dot per tile (decode-like compute intensity)
        w = win[slot].astype(jnp.bfloat16)          # [ROWS, 512]
        acc[:] += jax.lax.dot_general(
            x_ref[:].astype(jnp.bfloat16), w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, n, body, 0)
    o_ref[:] = acc[:]


@jax.jit
def stream(tape, x):
    return pl.pallas_call(
        _stream_kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, 512), jnp.int8),
            pltpu.VMEM((8, 512), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(tape, x)


# -- automatic-pipeline equivalent (one operand, same tile size) --------------
def _auto_kernel(tape_ref, x_ref, o_ref, acc):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    w = tape_ref[0].astype(jnp.bfloat16)
    acc[:] += jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = acc[:]


@jax.jit
def auto(tape, x):
    return pl.pallas_call(
        _auto_kernel,
        grid=(N,),
        in_specs=[pl.BlockSpec((1, ROWS, 512), lambda t: (t, 0, 0)),
                  pl.BlockSpec((8, ROWS), lambda t: (0, 0))],
        out_specs=pl.BlockSpec((8, 512), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 512), jnp.float32)],
    )(tape, x)


gb = N * TILE / 1e9
for name, fn in [("manual-stream", stream), ("auto-pipeline", auto)]:
    t0 = time.time()
    jax.block_until_ready(fn(tape, x))
    print(f"{name}: first call (compile) {time.time()-t0:.1f}s", flush=True)
    # time_call carries its first arg (float fold target) through a scan;
    # the tape goes through *rest so it stays a runtime arg (a closure
    # capture would bake the 1GB array into the jaxpr as a constant)
    sec = time_call(lambda xx, tp: fn(tp, xx), x, tape,
                    reps=3, reps2=10, trials=3)
    print(f"{name}: {gb/sec:.0f} GB/s  ({sec*1e3:.2f} ms for {gb:.2f} GB, "
          f"{N} tiles x {TILE>>10} KB)", flush=True)
