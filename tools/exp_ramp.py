"""Measure per-pallas-call ramp: same total weight bytes, varying call count.

Chains n sequential qmatmul calls (x-dependent) over n distinct weights of
total ~88 MB; slope of time vs n = per-call fixed cost (ramp + dispatch).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from zgml_tpu.quant.repack import quantize_weight              # noqa: E402
from zgml_tpu.ops.qmatmul import qmatmul_pallas                # noqa: E402
from zgml_tpu.runtime.ktime import time_ab                     # noqa: E402

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
K = 2048
TOTAL_N = 65536          # K x TOTAL_N q4 = 64 MB packed


def make_w(n):
    w = rng.standard_normal((n, K)).astype(np.float32) * 0.05
    return quantize_weight(w, "q4_0")


variants = {}
x0 = jnp.zeros((1, 1, K), jnp.float32)
for parts in (1, 4, 16, 64):
    n = TOTAL_N // parts
    ws = [make_w(n) for _ in range(parts)]
    ws = jax.device_put(ws)

    def chain(x, *flat, ws=ws, parts=parts):
        import dataclasses
        i = 0
        out = None
        for pw in ws:
            pw2 = dataclasses.replace(pw, qvals=flat[i], scales=flat[i + 1])
            i += 2
            y = qmatmul_pallas(x, pw2)
            # fold output back into x (keeps serial dependency, tiny cost)
            x = x + y[..., :1] * 1e-30
            out = y
        return out

    flat = []
    for pw in ws:
        flat += [pw.qvals, pw.scales]
    variants[f"calls_{parts}"] = (chain, x0, *flat)

r = time_ab(variants, reps=10, reps2=40, rounds=4)
base = r["calls_1"]
for k, v in r.items():
    parts = int(k.split("_")[1])
    extra = (v - base) / max(parts - 1, 1)
    print(f"{k:9s} {v*1e3:7.3f} ms   ramp/call ~{extra*1e6:6.2f} us",
          flush=True)
