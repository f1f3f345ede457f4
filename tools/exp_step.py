"""Decompose the decode step: projections-only vs +attention vs full model.

The full-step-minus-kernel-sum residue ("glue") can't be localized by
isolated kernel timing; this times progressively richer step bodies
interleaved in-window. Usage: python tools/exp_step.py [packed_ckpt]
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

path = sys.argv[1] if len(sys.argv) > 1 else \
    ".bench_cache/tinyllama_q4_0.gguf.packed.safetensors"
print("devices:", jax.devices(), flush=True)
model = load_packed_llama(path)
model.params = jax.device_put(model.params)
jax.block_until_ready(jax.tree.leaves(model.params)[0])
print("uploaded", flush=True)

cfg = model.cfg
d, hd = cfg.d_model, cfg.head_dim
hq, hkv = cfg.n_heads, cfg.n_kv_heads
nq, nkv = hq * hd, hkv * hd
kv_len = 192
cache = model.init_cache(1)
x0 = jnp.zeros((1, 1, d), jnp.float32)


def proj_only(x, params, cache):
    """All weight-streaming matmuls, no norms/rope/cache/attention."""
    for layer in params["layers"]:
        qkv = ops.qmatmul(x, layer["wqkv"])
        x = x + ops.qmatmul(qkv[..., :nq], layer["wo"])
        ff = ops.fused_ffn(x, layer["w_gate_up"], layer["w_down"])
        if ff is None:
            gu = ops.qmatmul(x, layer["w_gate_up"])
            f = gu.shape[-1] // 2
            act = gu[..., f:] * jax.nn.sigmoid(gu[..., :f]) * gu[..., :f]
            ff = ops.qmatmul(act, layer["w_down"])
        x = x + ff
    return ops.qmatmul(x, params["lm_head"]) if "lm_head" in params else x


def proj_attn(x, params, cache):
    """+ decode attention + cache write (no norms/rope/sampling)."""
    pos = kv_len - 1
    for i, layer in enumerate(params["layers"]):
        qkv = ops.qmatmul(x, layer["wqkv"])
        q = qkv[..., :nq].reshape(1, 1, hq, hd).transpose(0, 2, 1, 3)
        k = qkv[..., nq:nq + nkv].reshape(1, 1, hkv, hd).transpose(0, 2, 1, 3)
        v = qkv[..., nq + nkv:].reshape(1, 1, hkv, hd).transpose(0, 2, 1, 3)
        ck = jax.lax.dynamic_update_slice(
            cache["k"][i], k.astype(cache["k"][i].dtype), (0, 0, pos, 0))
        cv = jax.lax.dynamic_update_slice(
            cache["v"][i], v.astype(cache["v"][i].dtype), (0, 0, pos, 0))
        att = ops.decode_attention(q, ck, cv, kv_len)
        att = att.astype(x.dtype).transpose(0, 2, 1, 3).reshape(1, 1, nq)
        x = x + ops.qmatmul(att, layer["wo"])
        ff = ops.fused_ffn(x, layer["w_gate_up"], layer["w_down"])
        if ff is None:
            gu = ops.qmatmul(x, layer["w_gate_up"])
            f = gu.shape[-1] // 2
            act = gu[..., f:] * jax.nn.sigmoid(gu[..., :f]) * gu[..., :f]
            ff = ops.qmatmul(act, layer["w_down"])
        x = x + ff
    return ops.qmatmul(x, params["lm_head"]) if "lm_head" in params else x


def full_fwd(x, params, cache):
    tok = jnp.abs(x[:, :1, 0]).astype(jnp.int32) % cfg.vocab_size
    logits, _ = model.forward(params, tok, cache, kv_len)
    return logits


r = time_ab({
    "proj_only": (proj_only, x0, model.params, cache),
    "proj_attn": (proj_attn, x0, model.params, cache),
    "full_fwd": (full_fwd, x0, model.params, cache),
}, reps=10, reps2=40, rounds=4)
for k, v in r.items():
    print(f"{k:10s} {v*1e3:7.3f} ms  ({1/v:6.0f} tok/s)", flush=True)
print(f"attention+cache adds {1e3*(r['proj_attn']-r['proj_only']):.3f} ms; "
      f"norms/rope/embed/logits glue adds "
      f"{1e3*(r['full_fwd']-r['proj_attn']):.3f} ms", flush=True)
