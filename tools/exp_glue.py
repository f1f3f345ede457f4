"""Isolate decode-step glue: pure fused-kernel chain vs the real forward.

chain      = attn_block + ffn per layer + lm_head, constant rope tables,
             no cache writes / embed / out_norm (kernel floor)
full_fwd   = model.forward (the real step body, minus sampling)
The difference is exactly the XLA glue: embed gather, per-step rope compute,
44 cache dynamic_update_slices, out_norm, pad/slice around the kernels.
Usage: python tools/exp_glue.py [packed_ckpt] [kv_len]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from zgml_tpu.io.packed_ckpt import load_packed_llama          # noqa: E402
from zgml_tpu.runtime.ktime import time_ab                     # noqa: E402
from zgml_tpu.ops import dispatch as ops                       # noqa: E402
from zgml_tpu.ops import refs                                  # noqa: E402
from zgml_tpu.ops.layerkernel import attn_block_step           # noqa: E402

path = sys.argv[1] if len(sys.argv) > 1 else \
    ".bench_cache/tinyllama_q4_0.gguf.packed.safetensors"
kv_len = int(sys.argv[2]) if len(sys.argv) > 2 else 228
print("devices:", jax.devices(), flush=True)
model = load_packed_llama(path)
model.params = jax.device_put(model.params)
jax.block_until_ready(jax.tree.leaves(model.params)[0])
print("uploaded", flush=True)
cfg = model.cfg
d, hd = cfg.d_model, cfg.head_dim

cache = model.init_cache(1)
cos, sin = refs.rope_cos_sin(jnp.asarray([kv_len]), hd, cfg.rope_base)
cos2 = jnp.concatenate([cos, cos], axis=1)
sin2 = jnp.concatenate([-sin, sin], axis=1)
x0 = jnp.zeros((1, 1, d), jnp.float32)


def chain(x, params, cache, c2, s2):
    for i, layer in enumerate(params["layers"]):
        x, _, _, did_ffn, _, _ = attn_block_step(cfg, layer, x, cache["k"][i],
                                           cache["v"][i], kv_len, c2, s2)
        if did_ffn:
            continue
        if "ffn_q4n" in layer:
            x = ops.fused_ffn_norm_q4n(x, layer["ffn_norm"],
                                       layer["ffn_q4n"], d,
                                       cfg.rms_norm_eps)
        else:
            x = ops.fused_ffn_norm(x, layer["ffn_norm"], layer["w_gate_up"],
                                   layer["w_down"], cfg.rms_norm_eps)
    if "lm_head" in params:
        x = ops.qmatmul(x, params["lm_head"])
    return x


def full_fwd(x, params, cache, c2, s2):
    tok = jnp.abs(x[:, :1, 0]).astype(jnp.int32) % cfg.vocab_size
    logits, _ = model.forward(params, tok, cache, kv_len)
    return logits


r = time_ab({
    "chain": (chain, x0, model.params, cache, cos2, sin2),
    "full_fwd": (full_fwd, x0, model.params, cache, cos2, sin2),
}, reps=10, reps2=50, rounds=4)
for k, v in r.items():
    print(f"{k:9s} {v*1e3:7.3f} ms ({1/v:6.0f} tok/s)", flush=True)
print(f"glue (embed+rope+cache-writes+out_norm+relayout): "
      f"{1e3*(r['full_fwd']-r['chain']):.3f} ms", flush=True)
