#!/usr/bin/env python
"""Tile-size scaling A/B for the Q4_0 dequant-matmul (contention-normalized).

ab_ratio.py showed per-grid-step overhead (not DMA stride) caps Pallas
streaming at ~2/3 of the XLA stream rate. If so, bigger tiles amortize it:
0.5MB (current default) -> 1/2/4MB tiles should scale efficiency up.
Weight: gate_up-shaped q4_0 [k_pad=4096 -> kh=2048, n_pad=22528] (57.7MB).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from zgml_tpu.ops.qmatmul import _q4_matmul
from tools.ab_ratio import time_call_2pt, stream_fn, dma_stream


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    k_pad, n_pad = 4096, 22528
    kh = k_pad // 2
    q = jnp.asarray(rng.integers(-128, 127, (kh, n_pad)).astype(np.int8))
    s = jnp.asarray((rng.random((k_pad // 32, n_pad)) * 0.01).astype(np.float32))
    x = jnp.zeros((8, k_pad), jnp.float32)
    nbytes = q.nbytes + s.nbytes

    variants = {}
    f_s, x_s, rest_s, sbytes = stream_fn()
    variants["stream"] = (f_s, x_s, rest_s, sbytes)

    for bn, bk in [(1024, 512), (2048, 512), (2048, 1024), (2048, 2048),
                   (11264, 512)]:
        if n_pad % bn or kh % bk:
            continue
        name = f"q4_bn{bn}_bk{bk}"
        tiles_mb = bn * bk / 1e6

        def kfun(x, q, s, bn=bn, bk=bk):
            out = _q4_matmul(x, q, s, bm=8, bn=bn, bk=bk,
                             out_dtype=np.dtype(np.float32))
            return out[:1, :8]

        variants[name] = (kfun, x, (q, s), nbytes)

    def dfun(x, q, s):
        return x + dma_stream(x, q, bk=512, bn=2048)[:1, :8] * 1e-30

    variants["dma_1MB"] = (dfun, jnp.zeros((1, 8), jnp.float32), (q, s),
                             q.nbytes)

    for name, (f, x0, rest, nb) in variants.items():
        t0 = time.time()
        try:
            time_call_2pt(f, x0, *rest, r1=2, r2=4, trials=1)
            log(f"warm {name}: {time.time()-t0:.1f}s")
        except Exception as e:
            log(f"warm {name}: FAIL {str(e)[:160]}")
            variants[name] = None

    variants = {k: v for k, v in variants.items() if v is not None}
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

    log("== medians ==")
    for n in names:
        log(f"{n:18s} ratio {float(np.median(ratios[n])):.3f}")
    print("DONE")


if __name__ == "__main__":
    main()
