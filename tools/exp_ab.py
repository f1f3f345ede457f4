"""Interleaved A/B harness: FFN megakernel vs separate, attention grid
variants, full-step variants — all variants share each timing round's
window (time_ab). Usage: python tools/exp_ab.py [packed_ckpt] [reps reps2]
"""
import dataclasses
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from zgml_tpu.io.packed_ckpt import load_packed_llama          # noqa: E402
from zgml_tpu.runtime.ktime import time_ab                     # noqa: E402
from zgml_tpu.ops.attention import (decode_attention_pallas,   # noqa: E402
                                    decode_attention_q8_pallas)
from zgml_tpu.ops.ffn import fused_ffn_pallas                  # noqa: E402
from zgml_tpu.ops.qmatmul import qmatmul_pallas                # noqa: E402
from zgml_tpu.quant.kv_cache import quantize_columns           # noqa: E402

path = sys.argv[1] if len(sys.argv) > 1 else \
    ".bench_cache/llama2-7b_q4_0.gguf.packed.safetensors"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
reps2 = int(sys.argv[3]) if len(sys.argv) > 3 else 160

print("devices:", jax.devices(), flush=True)
t0 = time.time()
model = load_packed_llama(path)
model.params = jax.device_put(model.params)
jax.block_until_ready(jax.tree.leaves(model.params)[0])
print(f"loaded+uploaded in {time.time()-t0:.1f}s", flush=True)

cfg = model.cfg
layer0 = model.params["layers"][0]
gu, wd = layer0["w_gate_up"], layer0["w_down"]
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((1, 1, cfg.d_model)), jnp.float32)


def sep_ffn(x, gq, gs, dq, ds):
    g = dataclasses.replace(gu, qvals=gq, scales=gs)
    d_ = dataclasses.replace(wd, qvals=dq, scales=ds)
    guo = qmatmul_pallas(x, g)
    f = guo.shape[-1] // 2
    gate, up = guo[..., :f], guo[..., f:]
    act = up * (gate * jax.nn.sigmoid(gate))
    return qmatmul_pallas(act, d_)


def mega_ffn(x, gq, gs, dq, ds):
    g = dataclasses.replace(gu, qvals=gq, scales=gs)
    d_ = dataclasses.replace(wd, qvals=dq, scales=ds)
    return fused_ffn_pallas(x, g, d_)


wargs = (gu.qvals, gu.scales, wd.qvals, wd.scales)
r = time_ab({"ffn_mega": (mega_ffn, x) + wargs,
             "ffn_sep": (sep_ffn, x) + wargs}, reps=reps, reps2=reps2)
mb = (gu.nbytes + wd.nbytes) / 1e6
print(f"FFN layer ({mb:.0f} MB): " + "  ".join(
    f"{k} {v*1e6:.1f}us ({mb/1e3/v:.0f} GB/s)" for k, v in r.items()),
    flush=True)

# -- attention variants at two context lengths --------------------------------
b, hkv, hq, d = 1, cfg.n_kv_heads, cfg.n_heads, cfg.head_dim
S = min(cfg.max_seq_len, 2048)
q = jnp.asarray(rng.standard_normal((b, hq, 1, d)), jnp.float32)
k = jnp.asarray(rng.standard_normal((b, hkv, S, d)), jnp.float32)
v = jnp.asarray(rng.standard_normal((b, hkv, S, d)), jnp.float32)
k16, v16 = k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
kq, ks = quantize_columns(k)
vq, vs = quantize_columns(v)

att16 = lambda q, k, v, l: decode_attention_pallas(q, k, v, l)  # noqa: E731
attq8 = lambda q, *a: decode_attention_q8_pallas(q, *a)         # noqa: E731
for kvlen in (192, S - 1):
    lens = jnp.full((b,), kvlen, jnp.int32)
    r1 = time_ab({
        "bf16_dyn": ((att16, q, k16, v16, lens), {"ZGML_TPU_DYNGRID": "1"}),
        "i8_dyn": ((attq8, q, kq, ks, vq, vs, lens),
                   {"ZGML_TPU_DYNGRID": "1"}),
        "bf16_sta": ((att16, q, k16, v16, lens), {"ZGML_TPU_DYNGRID": "0"}),
        "i8_sta": ((attq8, q, kq, ks, vq, vs, lens),
                   {"ZGML_TPU_DYNGRID": "0"}),
    }, reps=reps, reps2=reps2, rounds=3)
    by16 = 2 * b * hkv * kvlen * d * 2
    print(f"attn kv={kvlen}: " + "  ".join(
        f"{k} {v*1e6:.1f}us ({by16/(2 if 'i8' in k else 1)/v/1e9:.0f} GB/s)"
        for k, v in r1.items()), flush=True)

# -- full decode step: FFN megakernel vs separate (interleaved) ---------------
x0 = jnp.zeros((1, 2), jnp.float32)


def make_step():
    cache = model.init_cache(1)

    def step_fn(xf, params, cache):
        tok = jnp.abs(xf[:, :1]).astype(jnp.int32) % cfg.vocab_size
        logits, _ = model.forward(params, tok, cache, 192)
        return logits
    return step_fn, cache

s1, c1 = make_step()
s2, c2 = make_step()
r = time_ab({
    "step_mega": ((s1, x0, model.params, c1),
                  {"ZGML_TPU_KERNELS_DISABLE": ""}),
    "step_sep": ((s2, x0, model.params, c2),
                 {"ZGML_TPU_KERNELS_DISABLE": "fused_ffn"}),
}, reps=6, reps2=20, rounds=3)
print("full step: " + "  ".join(
    f"{k} {v*1e3:.2f}ms ({1/v:.0f} tok/s)" for k, v in r.items()), flush=True)
