"""A/B the stacked all-layers decode megacall against the per-layer fused
path, SAME WINDOW (time_ab), at real model shapes.

Also isolates the megacall's weight-stream efficiency with pos=1 (minimal
B phase) and times the kernel without embed/lm_head glue.

Usage: python tools/exp_stack2.py [packed_ckpt] [kv_len]
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import dataclasses                                             # noqa: E402

from zgml_tpu.io.packed_ckpt import load_packed_llama          # noqa: E402
from zgml_tpu.models.llama import LlamaModel                   # noqa: E402
from zgml_tpu.runtime.ktime import time_ab                     # noqa: E402

path = sys.argv[1] if len(sys.argv) > 1 else \
    ".bench_cache/llama2-7b_q4_0.gguf.packed.safetensors"
kv_len = int(sys.argv[2]) if len(sys.argv) > 2 else 192
print("devices:", jax.devices(), flush=True)

model = load_packed_llama(path)
cfg = dataclasses.replace(model.cfg, max_seq_len=512)
model.cfg = cfg
ok = model.enable_stacked_decode()     # host-side stack BEFORE device_put
print("stacked views:", ok, flush=True)
model.params = jax.device_put(model.params)
jax.block_until_ready(jax.tree.leaves(model.params)[0])

# unrolled variant: same weight arrays, no stacked views
un_params = {k: v for k, v in model.params.items() if k != "layers_stacked"}
model_un = LlamaModel(cfg, un_params)
cache_un = model_un.init_cache(1)

stacked = model.params["layers_stacked"]
cache_st = model.init_cache(1)
jax.block_until_ready(jax.tree.leaves(stacked)[0])
print("uploaded", flush=True)

d = cfg.d_model
x0 = jnp.zeros((1, 1, d), jnp.float32)
pos = kv_len - 1


def full_un(x, params, cache):
    tok = jnp.abs(x[:, :1, 0]).astype(jnp.int32) % cfg.vocab_size
    logits, _ = model_un.forward(params, tok, cache, pos)
    return logits


def full_st(x, params, cache):
    tok = jnp.abs(x[:, :1, 0]).astype(jnp.int32) % cfg.vocab_size
    logits, _ = model.forward(params, tok, cache, pos)
    return logits


from zgml_tpu.ops.stackkernel import stacked_decode_step       # noqa: E402
from zgml_tpu.ops import refs                                  # noqa: E402


def kernel_st(x, st, ck, cv, p):
    # st passed as an ARG: a closed-over device array would be baked into
    # the lowering as a 4GB captured constant (duplicate HBM)
    cos, sin = refs.rope_cos_sin(p + jnp.arange(1), cfg.head_dim,
                                 cfg.rope_base)
    out, ck2, cv2 = stacked_decode_step(cfg, st, x, ck, cv, p, cos, sin)
    return out


def chain_un(x, params, cache):
    """Per-layer fused kernel chain only (no embed/out_norm/lm_head)."""
    from zgml_tpu.models.llama import _layer_step
    cos, sin = refs.rope_cos_sin(pos + jnp.arange(1), cfg.head_dim,
                                 cfg.rope_base)
    for i, layer in enumerate(params["layers"]):
        x, _, _ = _layer_step(cfg, x, layer, cache["k"][i], cache["v"][i],
                              pos, pos + 1, cos, sin, True)
    return x


r = time_ab({
    "full_unrolled": (full_un, x0, un_params, cache_un),
    "full_stacked": (full_st, x0, model.params, cache_st),
    "kernel_stacked": (kernel_st, x0, stacked, cache_st["k"], cache_st["v"],
                       jnp.asarray(pos, jnp.int32)),
    "kernel_stacked_pos1": (kernel_st, x0, stacked, cache_st["k"],
                            cache_st["v"], jnp.asarray(1, jnp.int32)),
    "chain_unrolled": (chain_un, x0, un_params, cache_un),
}, reps=8, reps2=32, rounds=4)

wbytes = sum(la["wqkv"].nbytes + la["wo"].nbytes + la["w_gate_up"].nbytes
             + la["w_down"].nbytes for la in un_params["layers"])
for k, v in r.items():
    gbs = wbytes / v / 1e9 if "kernel" in k or "chain" in k else 0
    extra = f"  layers-stream {gbs:5.0f} GB/s" if gbs else ""
    print(f"{k:22s} {v*1e3:7.3f} ms  ({1/v:6.0f} tok/s){extra}", flush=True)
