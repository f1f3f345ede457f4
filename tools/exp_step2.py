"""Full-decode-step A/B over fused-layer geometries (ZGML_TPU_LAYER_TUNE)
and the whole-layer merge (ZGML_TPU_LAYER_FFN) at 7B shapes.

Single-kernel A/Bs at ~90us resolve poorly on the time-shared chip; the full
step (32 layers, ~8ms) gives 90x the signal. Interleaved two-point fits
(ktime.time_ab) so every variant shares each round's window.

Usage: python tools/exp_step2.py [packed.safetensors] [kv_len]
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
model = load_packed_llama(path)
model.params = jax.device_put(model.params)
jax.block_until_ready(jax.tree.leaves(model.params)[0])
print(f"loaded+uploaded in {time.time()-t0:.1f}s", flush=True)

cfg = model.cfg
cache = model.init_cache(1)


def step_fn(xf, params, cache):
    tok = jnp.abs(xf[:, :1]).astype(jnp.int32) % cfg.vocab_size
    logits, _ = model.forward(params, tok, cache, kv_len)
    return logits


x0 = jnp.zeros((1, 2), jnp.float32)
args = (step_fn, x0, model.params, cache)

import os                                                       # noqa: E402
os.environ["ZGML_TPU_LK_DEBUG"] = "1"
# round-4 A-phase question: attn_block streams 526 GB/s vs the FFN's 610
# (7B kernel profile, kv=576) — the A phase's [256, 6144] 1.5MB blocks
# amortize per-step cost worse than the FFN's ~4MB blocks. Bigger A blocks
# via ncA=1 (full-width) and bkA=512 (double-height), budgets raised so the
# tune shrink loop actually HOLDS the requested geometry (the earlier 9M
# sweep silently doubled ncA — the printed label lied).
VARIANTS = {
    "auto": (args, {"ZGML_TPU_LAYER_TUNE": "", "ZGML_TPU_LAYER_FFN": "0",
                    "ZGML_TPU_LK_NOREGROUP": "0"}),
    "auto+NOREGROUP(diag)": (args, {"ZGML_TPU_LAYER_TUNE": "",
                                    "ZGML_TPU_LAYER_FFN": "0",
                                    "ZGML_TPU_LK_NOREGROUP": "1"}),
}

results = {}
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
print(f"\nfull decode step A/B (7B Q4_0, kv={kv_len}):")
for name, dt in sorted(out.items(), key=lambda kv: kv[1]):
    print(f"  {name:22s} {dt*1e3:7.3f} ms  {1/dt:6.1f} tok/s", flush=True)
