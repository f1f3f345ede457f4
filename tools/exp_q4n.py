"""A/B the N-packed Q4 FFN kernel vs the planar-half-split one (interleaved).
Usage: python tools/exp_q4n.py [packed_ckpt]"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from zgml_tpu.io.packed_ckpt import load_packed_llama          # noqa: E402
from zgml_tpu.runtime.ktime import time_ab                     # noqa: E402
from zgml_tpu.ops.ffn import (fused_ffn_norm_pallas,           # noqa: E402
                              fused_ffn_norm_q4n)

path = sys.argv[1] if len(sys.argv) > 1 else \
    ".bench_cache/tinyllama_q4_0.gguf.packed.safetensors"
print("devices:", jax.devices(), flush=True)
model = load_packed_llama(path)
model.params = jax.device_put(model.params)
jax.block_until_ready(jax.tree.leaves(model.params)[0])
cfg = model.cfg
layer0 = model.params["layers"][0]
pack = layer0["ffn_q4n"]
gu, wd = layer0["w_gate_up"], layer0["w_down"]
g = layer0["ffn_norm"]
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((1, 1, cfg.d_model)), jnp.float32)

f_old = lambda x, g, gu_, wd_: fused_ffn_norm_pallas(   # noqa: E731
    x, g, gu_, wd_, cfg.rms_norm_eps)
f_new = lambda x, g, pk: fused_ffn_norm_q4n(            # noqa: E731
    x, g, pk, cfg.d_model, cfg.rms_norm_eps)
r = time_ab({"ffn_old": (f_old, x, g, gu, wd),
             "ffn_q4n": (f_new, x, g, pack)},
            reps=60, reps2=300, rounds=4)
mb = (gu.nbytes + wd.nbytes) / 1e6
for k, v in r.items():
    print(f"{k} {v*1e6:.1f}us ({mb/1e3/v:.0f} GB/s)", flush=True)

# numerical cross-check on device
a = np.asarray(f_old(x, g, gu, wd)).ravel()
b = np.asarray(f_new(x, g, pack)).ravel()[:a.size]
rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
print(f"old-vs-new rel diff {rel:.5f}", flush=True)
