"""Micro 2: reproduce the real decode-step write cost — a Pallas kernel
READS each carried cache, then a one-row DUS updates it (exp_dus showed bare
DUS is free; exp_scan showed the real step pays ~386us/tok for writes).

Variants (per scan step, 64 caches, kv_len=192):
  read+dus   decode_attention read on each cache, then one-row DUS
  read-only  same reads, writes discarded (cache carried unchanged)

Usage: python tools/exp_dus2.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from zgml_tpu.ops.attention import decode_attention_pallas      # noqa: E402
from zgml_tpu.runtime.ktime import time_ab                      # noqa: E402

L, H, S, D = 32, 32, 2048, 128
KV = 192
print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.standard_normal((1, H, 1, D)), jnp.float32)


def make(write: bool):
    caches = [jnp.zeros((1, H, S, D), jnp.bfloat16) for _ in range(2 * L)]

    def run(x0, q, *caches):
        caches = list(caches)

        def body(carry, _):
            pos, caches, acc = carry
            new = []
            for i in range(L):
                k, v = caches[2 * i], caches[2 * i + 1]
                att = decode_attention_pallas(q, k, v, pos)
                acc = acc + att.ravel()[0] * 1e-30
                if write:
                    row = (jnp.full((1, H, 1, D), pos, jnp.float32)
                           .astype(jnp.bfloat16))
                    k = jax.lax.dynamic_update_slice(k, row, (0, 0, pos, 0))
                    v = jax.lax.dynamic_update_slice(v, row, (0, 0, pos, 0))
                new += [k, v]
            return (pos + 1, new, acc), ()

        (pos, caches, acc), _ = jax.lax.scan(
            body, (jnp.int32(KV), caches, jnp.float32(0)), length=4)
        return x0 + acc * 1e-30

    return (run, jnp.zeros((1, 2), jnp.float32), q0) + tuple(caches)


out = time_ab({
    "read+dus": make(True),
    "read-only": make(False),
}, reps=4, reps2=16, rounds=4)
print("\nper-token cost (4 inner steps/call, 32 layers x read@kv=192):")
for name, dt in out.items():
    print(f"  {name:10s} {dt/4*1e3:8.3f} ms/tok", flush=True)
d = (out["read+dus"] - out["read-only"]) / 4
print(f"  write delta {d*1e6:8.1f} us/tok", flush=True)
