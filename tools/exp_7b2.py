"""7B experiment 2: FFN megakernel vs separate path; dynamic-grid decode
attention; full-step A/B with/without the megakernel. One upload, all
variants interleaved in-window (ARCHITECTURE.md methodology)."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from zgml_tpu.io.packed_ckpt import load_packed_llama          # noqa: E402
from zgml_tpu.runtime.ktime import time_call                   # noqa: E402
from zgml_tpu.ops import dispatch as ops                       # noqa: E402
from zgml_tpu.ops.attention import (decode_attention_pallas,   # noqa: E402
                                    decode_attention_q8_pallas)
from zgml_tpu.ops.ffn import fused_ffn_pallas                  # noqa: E402
from zgml_tpu.ops.qmatmul import qmatmul_pallas                # noqa: E402
from zgml_tpu.quant.kv_cache import quantize_columns           # noqa: E402

path = sys.argv[1] if len(sys.argv) > 1 else \
    ".bench_cache/llama2-7b_q4_0.gguf.packed.safetensors"
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
    import dataclasses
    g = dataclasses.replace(gu, qvals=gq, scales=gs)
    d_ = dataclasses.replace(wd, qvals=dq, scales=ds)
    guo = qmatmul_pallas(x, g)
    f = guo.shape[-1] // 2
    gate, up = guo[..., :f], guo[..., f:]
    act = up * (gate * jax.nn.sigmoid(gate))
    return qmatmul_pallas(act, d_)

def mega_ffn(x, gq, gs, dq, ds):
    import dataclasses
    g = dataclasses.replace(gu, qvals=gq, scales=gs)
    d_ = dataclasses.replace(wd, qvals=dq, scales=ds)
    return fused_ffn_pallas(x, g, d_)

kw = dict(reps=8, reps2=40, trials=3)
t_mega = time_call(mega_ffn, x, gu.qvals, gu.scales, wd.qvals, wd.scales, **kw)
t_sep = time_call(sep_ffn, x, gu.qvals, gu.scales, wd.qvals, wd.scales, **kw)
mb = (gu.nbytes + wd.nbytes) / 1e6
print(f"FFN 7B layer ({mb:.0f} MB): megakernel {t_mega*1e6:.1f}us "
      f"({mb/1e3/t_mega:.0f} GB/s)  separate {t_sep*1e6:.1f}us "
      f"({mb/1e3/t_sep:.0f} GB/s)", flush=True)

# -- dynamic-grid decode attention: time vs kv_len ---------------------------
b, hkv, hq, d, S = 1, cfg.n_kv_heads, cfg.n_heads, cfg.head_dim, 2048
q = jnp.asarray(rng.standard_normal((b, hq, 1, d)), jnp.float32)
k = jnp.asarray(rng.standard_normal((b, hkv, S, d)), jnp.float32)
v = jnp.asarray(rng.standard_normal((b, hkv, S, d)), jnp.float32)
k16, v16 = k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
kq, ks = quantize_columns(k)
vq, vs = quantize_columns(v)
print(f"{'kv_len':>7s} {'bf16 us':>9s} {'GB/s':>7s} {'i8 us':>9s} {'GB/s':>7s}",
      flush=True)
for kvlen in (192, 512, 1024, 2047):
    lens = jnp.full((b,), kvlen, jnp.int32)
    t16 = time_call(lambda q, k, v, l: decode_attention_pallas(q, k, v, l),
                    q, k16, v16, lens, **kw)
    ti8 = time_call(lambda q, *a: decode_attention_q8_pallas(q, *a),
                    q, kq, ks, vq, vs, lens, **kw)
    by16 = 2 * b * hkv * kvlen * d * 2
    by8 = by16 // 2 + 2 * b * hkv * kvlen * 4
    print(f"{kvlen:7d} {t16*1e6:9.1f} {by16/t16/1e9:7.1f} "
          f"{ti8*1e6:9.1f} {by8/ti8/1e9:7.1f}", flush=True)

# -- full decode step: megakernel vs separate FFN ----------------------------
def make_step():
    cache = model.init_cache(1)
    def step_fn(xf, params, cache):
        tok = jnp.abs(xf[:, :1]).astype(jnp.int32) % cfg.vocab_size
        logits, _ = model.forward(params, tok, cache, 192)
        return logits
    return step_fn, cache

step_fn, cache = make_step()
x0 = jnp.zeros((1, 2), jnp.float32)
t_step = time_call(step_fn, x0, model.params, cache, reps=8, reps2=24,
                   trials=3)
os.environ["ZGML_TPU_KERNELS_DISABLE"] = "fused_ffn"
step2, cache2 = make_step()
t_step2 = time_call(step2, x0, model.params, cache2, reps=8, reps2=24,
                    trials=3)
del os.environ["ZGML_TPU_KERNELS_DISABLE"]
print(f"full step: megakernel-FFN {t_step*1e3:.2f}ms "
      f"({1/t_step:.1f} tok/s)  separate-FFN {t_step2*1e3:.2f}ms "
      f"({1/t_step2:.1f} tok/s)", flush=True)
