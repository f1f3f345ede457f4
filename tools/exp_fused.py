"""Full-decode-step A/B: fused attention-block kernel on vs off (interleaved).
Usage: python tools/exp_fused.py [packed_ckpt] [kv_len]"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from zgml_tpu.io.packed_ckpt import load_packed_llama          # noqa: E402
from zgml_tpu.runtime.ktime import time_ab                     # noqa: E402

path = sys.argv[1] if len(sys.argv) > 1 else \
    ".bench_cache/tinyllama_q4_0.gguf.packed.safetensors"
kv_len = int(sys.argv[2]) if len(sys.argv) > 2 else 192
print("devices:", jax.devices(), flush=True)
t0 = time.time()
model = load_packed_llama(path)
model.params = jax.device_put(model.params)
jax.block_until_ready(jax.tree.leaves(model.params)[0])
print(f"uploaded in {time.time()-t0:.1f}s", flush=True)
cfg = model.cfg

x0 = jnp.zeros((1, 2), jnp.float32)


def make_step():
    cache = model.init_cache(1)

    def step_fn(xf, params, cache):
        tok = jnp.abs(xf[:, :1]).astype(jnp.int32) % cfg.vocab_size
        logits, _ = model.forward(params, tok, cache, kv_len)
        return logits
    return step_fn, cache

s1, c1 = make_step()
s2, c2 = make_step()
r = time_ab({
    "fused": ((s1, x0, model.params, c1), {"ZGML_TPU_ATTN_BLOCK": "1"}),
    "unfused": ((s2, x0, model.params, c2), {"ZGML_TPU_ATTN_BLOCK": "0"}),
}, reps=8, reps2=32, rounds=4)
print("  ".join(f"{k} {v*1e3:.3f}ms ({1/v:.0f} tok/s)"
                for k, v in r.items()), flush=True)
