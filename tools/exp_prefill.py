"""Prefill A/B: bf16 vs f32 MXU operands in the dequant-matmul tier.
Usage: python tools/exp_prefill.py [packed_ckpt]"""
import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, ".")
from zgml_tpu.io.packed_ckpt import load_packed_llama
from zgml_tpu.runtime.ktime import time_ab

path = sys.argv[1] if len(sys.argv) > 1 else \
    ".bench_cache/tinyllama_q4_0.gguf.packed.safetensors"
print("devices:", jax.devices(), flush=True)
model = load_packed_llama(path)
model.params = jax.device_put(model.params)
jax.block_until_ready(jax.tree.leaves(model.params)[0])
cfg = model.cfg
cache = model.init_cache(1)
x0 = jnp.zeros((1, 2), jnp.float32)

def mk():
    def fn(xf, params, cache):
        tok = (jnp.abs(xf[:, :1]).astype(jnp.int32)
               + jnp.zeros((1, 128), jnp.int32)) % cfg.vocab_size
        logits, _ = model.forward(params, tok, cache, 0)
        return logits
    return fn

r = time_ab({
    "pp_bf16": ((mk(), x0, model.params, cache),
                {"ZGML_TPU_PREFILL_BF16": "1"}),
    "pp_f32": ((mk(), x0, model.params, model.init_cache(1)),
               {"ZGML_TPU_PREFILL_BF16": "0"}),
}, reps=6, reps2=24, rounds=3)
for k, v in r.items():
    print(f"{k} {v*1e3:.2f}ms ({128/v:.0f} tok/s)", flush=True)
