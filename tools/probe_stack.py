"""De-risk probe for the stacked all-layers decode megacall (ops/stackkernel).

Tests on the REAL TPU (and under ZGML_TPU_INTERPRET=1 on CPU):
 1. flat dynamic grid with l = i // sp, j = i - l*sp index-map arithmetic
    (division by a dynamic scalar-prefetch value);
 2. residual scratch carried across layer boundaries;
 3. per-layer output blocks ([L, 8, D] at (l, 0, 0)) written once per layer
    and flushed at layer-boundary block-index changes;
 4. dynamic-length per-layer phases (n_b from the scalar).
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERP = os.environ.get("ZGML_TPU_INTERPRET", "0") == "1"
L, S, D = 3, 16, 128


def kernel(sref, x_ref, cache_ref, xout_ref, kcur_ref, acc_scr):
    i = pl.program_id(0)
    sp = sref[1]
    l = i // sp
    j = i - l * sp
    n_b = sref[3]

    @pl.when(i == 0)
    def _():
        acc_scr[:] = x_ref[:]

    @pl.when(j == 0)
    def _():
        # per-layer "kcur" output: residual + layer id, one write per layer
        kcur_ref[0] = acc_scr[:] + l.astype(jnp.float32)

    @pl.when((j >= 1) & (j < 1 + n_b))
    def _():
        # dynamic-length phase: accumulate cache rows j-1 of this layer
        acc_scr[:] = acc_scr[:] + cache_ref[0, :8].astype(jnp.float32)

    @pl.when(i == sref[2] - 1)
    def _():
        xout_ref[:] = acc_scr[:]


def run(pos, n_b):
    x = jnp.ones((8, D), jnp.float32)
    cache = (jnp.arange(L * S * D, dtype=jnp.float32)
             .reshape(L, S, D) * 1e-3).astype(jnp.bfloat16)
    sp = 1 + n_b + 1                                 # j=0, B steps, tail
    total = L * sp
    sarr = jnp.asarray([pos, sp, total, n_b], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(total,),
        in_specs=[
            pl.BlockSpec((8, D), lambda i, s: (0, 0)),
            pl.BlockSpec((1, 8, D),
                         lambda i, s: (i // s[1],
                                       jnp.clip(i - (i // s[1]) * s[1] - 1,
                                                0, s[3] - 1), 0)),
        ],
        out_specs=[
            pl.BlockSpec((8, D), lambda i, s: (0, 0)),
            pl.BlockSpec((1, 8, D), lambda i, s: (i // s[1], 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((8, D), jnp.float32)],
    )
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((8, D), jnp.float32),
                   jax.ShapeDtypeStruct((L, 8, D), jnp.float32)],
        interpret=INTERP,
    )
    return jax.jit(f)(sarr, x, cache), cache


def main():
    pos, n_b = 5, 2
    (xout, kcur), cache = run(pos, n_b)
    c = np.asarray(cache, np.float32)
    ok = True
    acc = np.ones((8, D), np.float32)
    for l in range(L):
        want = acc + l
        got = np.asarray(kcur[l])
        if not np.allclose(got, want, atol=1e-2):
            print(f"FAIL kcur layer {l}: got {got[0, :3]} want {want[0, :3]}")
            ok = False
        # B phase: n_b blocks, block b = rows [8b? no: block (1,8,D) at
        # (l, clip(j-1, 0, n_b-1))] -> block index b covers rows 8b..8b+8
        for b in range(n_b):
            acc = acc + c[l, 8 * b: 8 * b + 8] if False else acc
        # kernel reads cache_ref[0, :8] of block at sublane-block index b:
        # block (1, 8, D) at block idx b -> rows [8b, 8b+8)
        for b in range(n_b):
            acc = acc + c[l, 8 * b: 8 * b + 8]
    if not np.allclose(np.asarray(xout), acc, atol=1e-1):
        print(f"FAIL xout: got {np.asarray(xout)[0, :3]} want {acc[0, :3]}")
        ok = False
    print("PROBE", "OK" if ok else "FAILED", f"(interpret={INTERP})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
