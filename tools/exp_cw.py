"""A/B: in-kernel KV-cache writes (aliased output blocks in the fused layer
kernel) vs the XLA dynamic_update_slice path, on the REAL decode structure
(lax.scan with the cache carried, mirroring engine.decode_n — the fit-style
invariant-cache harness DCEs the DUS writes and so can't see this delta).

Usage: python tools/exp_cw.py [packed.safetensors] [kv_len]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from zgml_tpu.io.packed_ckpt import load_packed_llama           # noqa: E402
from zgml_tpu.runtime.ktime import time_ab                      # noqa: E402

path = sys.argv[1] if len(sys.argv) > 1 else \
    ".bench_cache/llama2-7b_q4_0.gguf.packed.safetensors"
kv_len = int(sys.argv[2]) if len(sys.argv) > 2 else 192
print("devices:", jax.devices(), flush=True)
t0 = time.time()
model = load_packed_llama(path, derive=False)
model.params = jax.device_put(model.params)
model.attach_derived()
jax.block_until_ready(jax.tree.leaves(model.params)[0])
print(f"ready in {time.time()-t0:.1f}s", flush=True)

cfg = model.cfg
N = 8


def make_scan(n):
    def run(x0, params, cache):
        def body(carry, _):
            tok, cache, pos = carry
            logits, cache2 = model.forward(params, tok[:, None], cache, pos)
            nxt = (jnp.abs(logits[0, -1, 0]).astype(jnp.int32)
                   % cfg.vocab_size)[None]
            return (nxt, cache2, pos + 1), nxt

        tok0 = (jnp.abs(x0[:, 0]).astype(jnp.int32) % cfg.vocab_size)
        (tok, cache, pos), toks = jax.lax.scan(
            body, (tok0, cache, kv_len), length=n)
        return toks[-1].astype(jnp.float32)[None]
    return run


x0 = jnp.zeros((1, 2), jnp.float32)
out = time_ab({
    "in-kernel write": ((make_scan(N), x0, model.params,
                         model.init_cache(1)),
                        {"ZGML_TPU_LK_CACHEWRITE": "1"}),
    "XLA dus write": ((make_scan(N), x0, model.params,
                       model.init_cache(1)),
                      {"ZGML_TPU_LK_CACHEWRITE": "0"}),
}, reps=4, reps2=16, rounds=4)
print(f"\nper-token decode cost (7B Q4_0, kv={kv_len}, scan+carry):")
for name, dt in out.items():
    print(f"  {name:18s} {dt/N*1e3:7.3f} ms/tok", flush=True)
