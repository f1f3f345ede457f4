"""A/B: stacked [L,...] KV cache + 2 batched DUS/step (ZGML_TPU_KV_STACK)
vs the per-layer list cache + 64 DUS/step, on the real decode structure
(scan with the cache carried). exp_scan's decomposition priced the unrolled
writes at ~386us/token at 7B; this measures how much the batched layout
recovers. Routing is cache-structure-driven, so the variants differ only in
the cache pytree passed in.

Usage: python tools/exp_kvstack.py [packed.safetensors] [kv_len]
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
    "stacked+2dus": (make_scan(N), x0, model.params,
                     model.init_cache(1, layout="stacked")),
    "unrolled+64dus": (make_scan(N), x0, model.params,
                       model.init_cache(1, layout="unrolled")),
}, reps=4, reps2=16, rounds=4)
print(f"\nper-token decode cost (7B Q4_0, kv={kv_len}, scan+carry):")
for name, dt in out.items():
    print(f"  {name:16s} {dt/N*1e3:7.3f} ms/tok", flush=True)
