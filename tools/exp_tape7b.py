"""Compile + numerics + interleaved A/B of the tape-streamed whole-stack
decode vs the per-layer fused path, at 7B shapes on the real chip.

Usage: python tools/exp_tape7b.py [packed_ckpt] [kv_len] [max_seq]
"""
import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from zgml_tpu.io.packed_ckpt import load_packed_llama          # noqa: E402
from zgml_tpu.models.llama import LlamaModel                   # noqa: E402
from zgml_tpu.runtime.ktime import time_ab                     # noqa: E402

path = sys.argv[1] if len(sys.argv) > 1 else \
    ".bench_cache/llama2-7b_q4_0.gguf.packed.safetensors"
kv_len = int(sys.argv[2]) if len(sys.argv) > 2 else 192
max_seq = int(sys.argv[3]) if len(sys.argv) > 3 else 512
print("devices:", jax.devices(), flush=True)

t0 = time.time()
model = load_packed_llama(path)
model.cfg = dataclasses.replace(model.cfg, max_seq_len=max_seq)
cfg = model.cfg
ok = model.enable_tape_decode()          # host-side tape BEFORE device_put
print(f"tape views: {ok} (built in {time.time()-t0:.1f}s)", flush=True)
assert ok
t0 = time.time()
model.params = jax.device_put(model.params)
jax.block_until_ready(jax.tree.leaves(model.params)[0])
print(f"uploaded in {time.time()-t0:.1f}s", flush=True)

cache = model.init_cache(1)
pos = jnp.asarray(kv_len - 1, jnp.int32)
x0 = jnp.zeros((1, 1, cfg.d_model), jnp.float32)


def step_tape(x, params, cache):
    t = jnp.abs(x[:, :1, 0]).astype(jnp.int32) % cfg.vocab_size
    lg, _ = model.forward(params, t, cache, pos)
    return lg


params_nt = {k: v for k, v in model.params.items() if k != "layers_tape"}
m2 = LlamaModel(cfg, params_nt)
cache_un = m2.init_cache(1)


def step_classic(x, params, cache):
    t = jnp.abs(x[:, :1, 0]).astype(jnp.int32) % cfg.vocab_size
    lg, _ = m2.forward(params, t, cache, pos)
    return lg


t0 = time.time()
lg_tape = np.asarray(jax.jit(step_tape)(x0, model.params, cache))
print(f"tape step compiled+ran in {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
lg_cl = np.asarray(jax.jit(step_classic)(x0, params_nt, cache_un))
print(f"classic step compiled+ran in {time.time()-t0:.1f}s", flush=True)

a, b = lg_cl.ravel(), lg_tape.ravel()
cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
print(f"cos vs per-layer path: {cos:.6f}  argmax {a.argmax()} vs {b.argmax()}",
      flush=True)

res = time_ab({"tape": (step_tape, x0, model.params, cache),
               "classic": (step_classic, x0, params_nt, cache_un)},
              reps=8, reps2=32, rounds=3)
gb = 4.195
for k, v in res.items():
    print(f"{k}: {v*1e3:.3f} ms/step -> {1.0/v:.1f} tok/s "
          f"(~{gb/v:.0f} GB/s effective)", flush=True)
