"""Micro: what does one dynamic_update_slice on a carried cache cost in a
decode-shaped scan? (7B decode carries 64 [1,32,2048,128] bf16 caches and
writes one row in each per token; exp_scan measured the writes at ~386us/tok
= ~6us per DUS — launch overhead, not bytes. This isolates it without a
model load and A/Bs batching strategies.)

Variants (per scan step):
  dus64     64 separate caches, 64 one-row DUS (the current engine shape)
  dus32lane 32 caches with K|V packed along the LANE axis, 32 DUS
  dus2stack 2 stacked [32,...] caches, 2 DUS (the lower bound)
  nowrite   64 caches carried, no writes (carry overhead floor)

Usage: python tools/exp_dus.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from zgml_tpu.runtime.ktime import time_ab                      # noqa: E402

L, H, S, D = 32, 32, 2048, 128
print("devices:", jax.devices(), flush=True)


def mk_caches(n, h, s, d, stack=0):
    rng = np.random.default_rng(0)
    if stack:
        return [jnp.zeros((stack, 1, h, s, d), jnp.bfloat16)
                for _ in range(n)]
    return [jnp.zeros((1, h, s, d), jnp.bfloat16) for _ in range(n)]


def make(variant):
    if variant == "dus64":
        caches = mk_caches(2 * L, H, S, D)
    elif variant == "dus32lane":
        caches = mk_caches(L, H, S, 2 * D)
    elif variant == "dus2stack":
        caches = mk_caches(2, H, S, D, stack=L)
    else:
        caches = mk_caches(2 * L, H, S, D)

    def run(x0, *caches):
        caches = list(caches)

        def body(carry, _):
            pos, caches = carry
            if variant == "dus64":
                row = jnp.full((1, H, 1, D), pos, jnp.bfloat16)
                caches = [jax.lax.dynamic_update_slice(c, row, (0, 0, pos, 0))
                          for c in caches]
            elif variant == "dus32lane":
                row = jnp.full((1, H, 1, 2 * D), pos, jnp.bfloat16)
                caches = [jax.lax.dynamic_update_slice(c, row, (0, 0, pos, 0))
                          for c in caches]
            elif variant == "dus2stack":
                row = jnp.full((L, 1, H, 1, D), pos, jnp.bfloat16)
                caches = [jax.lax.dynamic_update_slice(
                    c, row, (0, 0, 0, pos, 0)) for c in caches]
            return (pos + 1, caches), ()

        (pos, caches), _ = jax.lax.scan(body, (jnp.int32(8), caches),
                                        length=8)
        return x0 + caches[0].astype(jnp.float32).ravel()[0] * 1e-30

    return run, caches


x0 = jnp.zeros((1, 2), jnp.float32)
VARIANTS = {}
for v in ("dus64", "dus32lane", "dus2stack", "nowrite"):
    fn, caches = make(v)
    VARIANTS[v] = (fn, x0) + tuple(caches)

out = time_ab(VARIANTS, reps=8, reps2=40, rounds=4)
print("\nper-token write cost (8 inner steps/call):")
base = out.get("nowrite", 0.0)
for name, dt in out.items():
    print(f"  {name:10s} {dt/8*1e6:8.2f} us/tok   "
          f"(+{(dt-base)/8*1e6:7.2f} vs nowrite)", flush=True)
