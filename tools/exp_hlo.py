"""Dump the compiled HLO of the decode scan body and count copy/fusion ops
touching the KV caches — finds where the ~0.35ms/token carry-vs-nocarry gap
(exp_scan) actually goes instead of guessing.

Usage: python tools/exp_hlo.py [packed.safetensors] [stacked|unrolled]
"""
import re
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from zgml_tpu.io.packed_ckpt import load_packed_llama           # noqa: E402

path = sys.argv[1] if len(sys.argv) > 1 else \
    ".bench_cache/llama2-7b_q4_0.gguf.packed.safetensors"
layout = sys.argv[2] if len(sys.argv) > 2 else "unrolled"
kv_len = 192
print("devices:", jax.devices(), flush=True)
t0 = time.time()
model = load_packed_llama(path, derive=False)
model.params = jax.device_put(model.params)
model.attach_derived()
jax.block_until_ready(jax.tree.leaves(model.params)[0])
print(f"ready in {time.time()-t0:.1f}s", flush=True)
cfg = model.cfg


def run(x0, params, cache):
    def body(carry, _):
        tok, cache, pos = carry
        logits, cache2 = model.forward(params, tok[:, None], cache, pos)
        nxt = (jnp.abs(logits[0, -1, 0]).astype(jnp.int32)
               % cfg.vocab_size)[None]
        return (nxt, cache2, pos + 1), nxt

    tok0 = (jnp.abs(x0[:, 0]).astype(jnp.int32) % cfg.vocab_size)
    (tok, cache, pos), toks = jax.lax.scan(
        body, (tok0, cache, kv_len), length=8)
    return toks[-1].astype(jnp.float32)[None]


x0 = jnp.zeros((1, 2), jnp.float32)
cache = model.init_cache(1, layout=layout)
t0 = time.time()
compiled = jax.jit(run).lower(x0, model.params, cache).compile()
print(f"compiled in {time.time()-t0:.1f}s", flush=True)
txt = compiled.as_text()
out = f"/tmp/decode_{layout}.hlo"
with open(out, "w") as f:
    f.write(txt)
print(f"wrote {out} ({len(txt)} bytes)")

# cache-shaped tensors: bf16 with the max_seq dim
S = cfg.max_seq_len
pat_cache = re.compile(r"bf16\[[^\]]*%d[^\]]*\]" % S)
copies = [ln for ln in txt.splitlines() if " copy(" in ln]
cache_copies = [ln for ln in copies if pat_cache.search(ln)]
dus = [ln for ln in txt.splitlines()
       if "dynamic-update-slice" in ln and pat_cache.search(ln)]
fusions = [ln for ln in txt.splitlines()
           if ln.strip().startswith(("%fusion", "fusion"))
           and "dynamic-update-slice" in ln]
print(f"copy ops total: {len(copies)}  on cache-shaped bf16: "
      f"{len(cache_copies)}")
for ln in cache_copies[:8]:
    print("  ", ln.strip()[:160])
print(f"cache-shaped dynamic-update-slice lines: {len(dus)}")
for ln in dus[:4]:
    print("  ", ln.strip()[:160])
