"""Isolate the tape kernel's per-entry cost: stream a synthetic tape with
progressively richer per-tile work and report GB/s for each variant.

Variants: nothing (pure DMA), dummy-dot, dequant-only (f32), dequant+dots
(the real planar_cols work, f32 and bf16), int8-direct bf16 dots (no scale).

Usage: python tools/exp_tape2.py [n_entries] [R]
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

QK = 32
LANES = 512
N = int(sys.argv[1]) if len(sys.argv) > 1 else 800
R = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
K_SLOTS = 4

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
wtape = jnp.asarray(rng.integers(-128, 127, (N, R, LANES), dtype=np.int8))
stape = jnp.asarray(
    rng.standard_normal((N, R // 16, LANES)).astype(np.float32) * 0.01)
x = jnp.asarray(rng.standard_normal((8, 2 * R)), jnp.float32)


def make_kernel(work: str):
    def kern(x_ref, w_ref, s_ref, o_ref, win, swin, wsem, ssem, acc, wdeq):
        def dma(t):
            slot = jax.lax.rem(t, K_SLOTS)
            return (pltpu.make_async_copy(w_ref.at[t], win.at[slot],
                                          wsem.at[slot]),
                    pltpu.make_async_copy(s_ref.at[t], swin.at[slot],
                                          ssem.at[slot]))

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for t in range(K_SLOTS):
                for d in dma(jnp.asarray(t, jnp.int32)):
                    d.start()
            acc[:] = jnp.zeros_like(acc)

        for d in dma(i):
            d.wait()
        slot = jax.lax.rem(i, K_SLOTS)
        w = win[pl.ds(slot, 1)][0]
        s = swin[pl.ds(slot, 1)][0]
        xx = x_ref[:]
        if work == "none":
            acc[:] += w[:1, :].astype(jnp.float32)
        elif work == "dummy":
            acc[:] += jax.lax.dot_general(
                xx[:, :R].astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif work in ("deq", "deq_dots", "deq_dots_bf16"):
            dt = jnp.bfloat16 if work.endswith("bf16") else jnp.float32
            a = jnp.zeros((8, LANES), jnp.float32)
            for q in range(R // LANES):
                v = w[q * LANES:(q + 1) * LANES].astype(jnp.int32)
                nb = R // QK
                q0 = q * LANES // QK
                q1 = (q + 1) * LANES // QK
                slo = jnp.repeat(s[q0:q1].astype(dt), QK, axis=0)
                shi = jnp.repeat(s[nb + q0: nb + q1].astype(dt), QK, axis=0)
                wlo = ((v & 15) - 8).astype(dt) * slo
                whi = (((v >> 4) & 15) - 8).astype(dt) * shi
                if work == "deq":
                    a += wlo[:8] + whi[:8]
                else:
                    a += jnp.dot(
                        xx[:, q * LANES:(q + 1) * LANES].astype(dt), wlo,
                        preferred_element_type=jnp.float32)
                    a += jnp.dot(
                        xx[:, R + q * LANES: R + (q + 1) * LANES].astype(dt),
                        whi, preferred_element_type=jnp.float32)
            acc[:] += a
        elif work == "i8_bf16":
            # no scales: single big bf16 dot straight from int8
            a = jnp.dot(xx[:, :R].astype(jnp.bfloat16),
                        w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            acc[:] += a
        elif work in ("deq_dots_1024", "deq_dots_1024_bothx"):
            CH = 1024
            a = jnp.zeros((8, LANES), jnp.float32)
            for q in range(R // CH):
                v = w[q * CH:(q + 1) * CH].astype(jnp.int32)
                nb = R // QK
                q0 = q * CH // QK
                q1 = (q + 1) * CH // QK
                slo = jnp.repeat(s[q0:q1], QK, axis=0)
                wlo = ((v & 15) - 8).astype(jnp.float32) * slo
                a += jnp.dot(xx[:, q * CH:(q + 1) * CH], wlo,
                             preferred_element_type=jnp.float32)
                if work.endswith("bothx"):
                    shi = jnp.repeat(s[nb + q0: nb + q1], QK, axis=0)
                    whi = (((v >> 4) & 15) - 8).astype(jnp.float32) * shi
                    a += jnp.dot(xx[:, R + q * CH: R + (q + 1) * CH], whi,
                                 preferred_element_type=jnp.float32)
            acc[:] += a
        elif work == "deq_dots_full2":
            # full-entry dequant, 2 big dots (both planes)
            nb = R // QK
            v = w.astype(jnp.int32)
            slo = jnp.repeat(s[:nb], QK, axis=0)
            wlo = ((v & 15) - 8).astype(jnp.float32) * slo
            a = jnp.dot(xx[:, :R], wlo, preferred_element_type=jnp.float32)
            shi = jnp.repeat(s[nb:], QK, axis=0)
            whi = (((v >> 4) & 15) - 8).astype(jnp.float32) * shi
            a += jnp.dot(xx[:, R:], whi, preferred_element_type=jnp.float32)
            acc[:] += a
        elif work == "deq_scratch_1dot":
            # dequant both planes into a persistent f32 scratch, then ONE
            # full-K dot per entry (dot-issue overhead paid once)
            nb = R // QK
            for q in range(R // 1024):
                v = w[q * 1024:(q + 1) * 1024].astype(jnp.int32)
                q0, q1 = q * 1024 // QK, (q + 1) * 1024 // QK
                slo = jnp.repeat(s[q0:q1], QK, axis=0)
                shi = jnp.repeat(s[nb + q0: nb + q1], QK, axis=0)
                wdeq[q * 1024:(q + 1) * 1024, :] = \
                    ((v & 15) - 8).astype(jnp.float32) * slo
                wdeq[R + q * 1024: R + (q + 1) * 1024, :] = \
                    (((v >> 4) & 15) - 8).astype(jnp.float32) * shi
            acc[:] += jnp.dot(xx, wdeq[:],
                              preferred_element_type=jnp.float32)
        elif work == "deq_scratch_2dot":
            nb = R // QK
            for q in range(R // 1024):
                v = w[q * 1024:(q + 1) * 1024].astype(jnp.int32)
                q0, q1 = q * 1024 // QK, (q + 1) * 1024 // QK
                slo = jnp.repeat(s[q0:q1], QK, axis=0)
                shi = jnp.repeat(s[nb + q0: nb + q1], QK, axis=0)
                wdeq[q * 1024:(q + 1) * 1024, :] = \
                    ((v & 15) - 8).astype(jnp.float32) * slo
                wdeq[R + q * 1024: R + (q + 1) * 1024, :] = \
                    (((v >> 4) & 15) - 8).astype(jnp.float32) * shi
            acc[:] += jnp.dot(xx[:, :R], wdeq[:R],
                              preferred_element_type=jnp.float32)
            acc[:] += jnp.dot(xx[:, R:], wdeq[R:],
                              preferred_element_type=jnp.float32)
        elif work in ("deq_dots_pipe512", "deq_dots_pipe1024"):
            # software-pipeline: dequant chunk q+1 (VPU) while the MXU dots
            # chunk q — the naive loop serializes deq->dot per chunk
            CH = 512 if work.endswith("512") else 1024
            nb = R // QK
            nch = R // CH

            def deq(q):
                v = w[q * CH:(q + 1) * CH].astype(jnp.int32)
                q0, q1 = q * CH // QK, (q + 1) * CH // QK
                slo = jnp.repeat(s[q0:q1], QK, axis=0)
                shi = jnp.repeat(s[nb + q0: nb + q1], QK, axis=0)
                return (((v & 15) - 8).astype(jnp.float32) * slo,
                        (((v >> 4) & 15) - 8).astype(jnp.float32) * shi)

            a = jnp.zeros((8, LANES), jnp.float32)
            wl, wh = deq(0)
            for q in range(nch):
                if q + 1 < nch:
                    wl2, wh2 = deq(q + 1)
                a += jnp.dot(xx[:, q * CH:(q + 1) * CH], wl,
                             preferred_element_type=jnp.float32)
                a += jnp.dot(xx[:, R + q * CH: R + (q + 1) * CH], wh,
                             preferred_element_type=jnp.float32)
                if q + 1 < nch:
                    wl, wh = wl2, wh2
            acc[:] += a
        elif work == "deq_dots_big":
            # f32 dequant, ONE dot per nibble plane over full R
            nb = R // QK
            v = w.astype(jnp.int32)
            slo = jnp.repeat(s[:nb], QK, axis=0)
            wlo = ((v & 15) - 8).astype(jnp.float32) * slo
            acc[:] += jnp.dot(xx[:, :R], wlo,
                              preferred_element_type=jnp.float32)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            o_ref[:] = acc[:]

        @pl.when(i + K_SLOTS < pl.num_programs(0))
        def _():
            for d in dma(i + K_SLOTS):
                d.start()

    return kern


def run(work):
    @jax.jit
    def go(x, wtape, stape):
        return pl.pallas_call(
            make_kernel(work),
            grid=(N,),
            in_specs=[pl.BlockSpec((8, 2 * R), lambda i: (0, 0)),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((8, LANES), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((K_SLOTS, R, LANES), jnp.int8),
                pltpu.VMEM((K_SLOTS, R // 16, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((K_SLOTS,)),
                pltpu.SemaphoreType.DMA((K_SLOTS,)),
                pltpu.VMEM((8, LANES), jnp.float32),
                pltpu.VMEM((2 * R, LANES), jnp.float32),
            ],
        )(x, wtape, stape)

    jax.block_until_ready(go(x, wtape, stape))
    sec = time_call(lambda xx, w, s: go(xx, w, s), x, wtape, stape,
                    reps=3, reps2=10, trials=3)
    gb = N * (R * LANES + (R // 16) * LANES * 4) / 1e9
    us = sec / N * 1e6
    print(f"{work:14s}: {gb/sec:5.0f} GB/s   {us:6.2f} us/entry", flush=True)


for work in ["deq_dots_pipe512", "deq_dots_pipe1024", "deq_dots_1024_bothx"]:
    run(work)
