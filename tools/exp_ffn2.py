"""FFN-megakernel F-tile A/B at 7B (ZGML_TPU_FFN_TUNE) on the full decode
step. bf=512 (22 steps x 3.9MB) measured 562 GB/s vs the 634 probe; wider
tiles cut per-step + ramp overhead if Mosaic accepts the VMEM.

Usage: python tools/exp_ffn2.py [packed.safetensors] [kv_len]
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
print(f"loaded+uploaded+derived in {time.time()-t0:.1f}s", flush=True)

cfg = model.cfg
cache = model.init_cache(1)


def step_fn(xf, params, cache):
    tok = jnp.abs(xf[:, :1]).astype(jnp.int32) % cfg.vocab_size
    logits, _ = model.forward(params, tok, cache, kv_len)
    return logits


x0 = jnp.zeros((1, 2), jnp.float32)
args = (step_fn, x0, model.params, cache)

VARIANTS = {
    "bf512(base)": (args, {"ZGML_TPU_FFN_TUNE": ""}),
    "bf1024": (args, {"ZGML_TPU_FFN_TUNE": "1024,16"}),
    "bf1408": (args, {"ZGML_TPU_FFN_TUNE": "1408,24"}),
}

ok = {}
for name, spec in VARIANTS.items():
    try:
        t0 = time.time()
        r = time_ab({name: spec}, reps=4, reps2=12, rounds=1)
        print(f"  compiled {name} in {time.time()-t0:.1f}s "
              f"(first: {r[name]*1e3:.2f} ms)", flush=True)
        ok[name] = spec
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)

out = time_ab(ok, reps=4, reps2=16, rounds=4)
print(f"\nfull decode step A/B over FFN F-tiles (7B Q4_0, kv={kv_len}):")
for name, dt in sorted(out.items(), key=lambda kv: kv[1]):
    print(f"  {name:14s} {dt*1e3:7.3f} ms  {1/dt:6.1f} tok/s", flush=True)
