"""Collective/compute overlap measurement (BASELINE config 4).

A/B: the TP-sharded step as scheduled by XLA's latency-hiding scheduler
(collectives free to overlap independent compute/DMA) vs the same step with
every TP collective fenced by optimization_barriers (ZGML_TPU_TP_BARRIER=1).
overlap_gain = 1 - t_free / t_fenced: the fraction of collective time the
scheduler hides. Runs on any mesh — virtual CPU devices here (structure
validation; absolute numbers are meaningless off-TPU), pod-slice ready.

Measures the three shapes where overlap matters: TP prefill (batch compute to
hide behind), TP decode (critical-path collectives — expect ~0 gain), and
the dp+tp train step (grad psums hide behind backward matmuls).

Usage: [ZGML_TPU_MESH=dp,tp] python tools/bench_overlap.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
if os.environ.get("JAX_PLATFORMS") in (None, "", "axon"):
    # single real TPU chip has no mesh; default to the 8-CPU virtual mesh
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax                                                     # noqa: E402
import jax.numpy as jnp                                        # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon plugin overrides the env var; the config flag wins over it
    jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("ZGML_TPU_INTERPRET", "1")   # Pallas on CPU

from zgml_tpu.models.llama import LlamaConfig, LlamaModel, init_params  # noqa: E402
from zgml_tpu.parallel import (make_mesh, make_sharded_forward,          # noqa: E402
                               make_sharded_train_step, shard_llama_params)

print("devices:", jax.devices(), flush=True)
n = len(jax.devices())
tp = int(os.environ.get("ZGML_TPU_TP", min(8, n)))
dp = n // tp
mesh = make_mesh(tp=tp, dp=dp)
cfg = LlamaConfig(vocab_size=512, d_model=256, n_heads=8, n_kv_heads=8,
                  d_ff=1024, n_layers=4, max_seq_len=256)
model = LlamaModel(cfg, init_params(cfg, seed=0))
params = shard_llama_params(model.params, mesh)
b = 2 * dp
rng = np.random.default_rng(0)
prefill_toks = jnp.asarray(rng.integers(0, 512, (b, 128)), jnp.int32)
decode_toks = jnp.asarray(rng.integers(0, 512, (b, 1)), jnp.int32)
train_toks = jnp.asarray(rng.integers(0, 512, (b, 65)), jnp.int32)


def timed(f, *args, reps=20):
    jax.block_until_ready(jax.tree.leaves(f(*args))[0])   # compile
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.time() - t0) / reps


results = {}
for fenced in (False, True):
    os.environ["ZGML_TPU_TP_BARRIER"] = "1" if fenced else "0"
    tag = "fenced" if fenced else "free"
    fwd = make_sharded_forward(LlamaModel(cfg, params), mesh)
    step = make_sharded_train_step(LlamaModel(cfg, params), mesh)
    results[("prefill", tag)] = timed(
        lambda: fwd(params, prefill_toks, model.init_cache(b), 0))
    results[("decode", tag)] = timed(
        lambda: fwd(params, decode_toks, model.init_cache(b), 0))
    results[("train", tag)] = timed(
        lambda: step(params, train_toks, model.init_cache(b), 1e-3))
os.environ["ZGML_TPU_TP_BARRIER"] = "0"

print(f"mesh: dp={dp} tp={tp}  (platform {jax.default_backend()})")
for phase in ("prefill", "decode", "train"):
    t_free = results[(phase, "free")]
    t_fen = results[(phase, "fenced")]
    gain = 1 - t_free / t_fen if t_fen > 0 else 0.0
    print(f"{phase:8s} free {t_free*1e3:8.2f} ms   fenced {t_fen*1e3:8.2f} ms"
          f"   overlap gain {100*gain:5.1f}%", flush=True)
