"""7B-shape single-process experiment driver: kernel profile + KV A/B.

Pays the 7B weight upload once, then (1) per-kernel decode profile at model
shapes, (2) decode-attention bf16 vs int8-KV A/B across context lengths
(interleaved in the same window, per the contention methodology in
ARCHITECTURE.md). Usage: python tools/exp_7b.py [packed_ckpt] [kv_len]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from zgml_tpu.io.packed_ckpt import load_packed_llama          # noqa: E402
from zgml_tpu.runtime.ktime import (profile_decode_kernels,    # noqa: E402
                                    render_kernel_profile, time_call)
from zgml_tpu.ops import dispatch as ops                       # noqa: E402
from zgml_tpu.ops.attention import decode_attention_q8_pallas  # noqa: E402
from zgml_tpu.quant.kv_cache import quantize_columns           # noqa: E402

path = sys.argv[1] if len(sys.argv) > 1 else \
    ".bench_cache/llama2-7b_q4_0.gguf.packed.safetensors"
kv_mid = int(sys.argv[2]) if len(sys.argv) > 2 else 192

print("devices:", jax.devices(), flush=True)
t0 = time.time()
model = load_packed_llama(path)
model.params = jax.device_put(model.params)
jax.block_until_ready(jax.tree.leaves(model.params)[0])
print(f"loaded+uploaded in {time.time()-t0:.1f}s", flush=True)

rows = profile_decode_kernels(model, kv_len=kv_mid)
print(render_kernel_profile(rows), flush=True)

# -- decode attention: bf16 vs int8 KV across context lengths ----------------
cfg = model.cfg
b, hkv, d = 1, cfg.n_kv_heads, cfg.head_dim
hq, S = cfg.n_heads, cfg.max_seq_len
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((b, hq, 1, d)), jnp.float32)
k = jnp.asarray(rng.standard_normal((b, hkv, S, d)), jnp.float32)
v = jnp.asarray(rng.standard_normal((b, hkv, S, d)), jnp.float32)
k16, v16 = k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
kq, ks = quantize_columns(k)
vq, vs = quantize_columns(v)

print(f"\n{'kv_len':>7s} {'bf16 us':>9s} {'i8 us':>9s} {'i8(pv=f32)':>11s} "
      f"{'bf16 GB/s':>9s} {'i8 GB/s':>8s}", flush=True)
for kvlen in (512, 1024, 2048, min(4095, S - 1)):
    if kvlen >= S:
        continue
    lens = jnp.full((b,), kvlen, jnp.int32)
    kw = dict(reps=8, reps2=48, trials=3)
    t16 = time_call(lambda q, k, v, l: ops.decode_attention(q, k, v, l),
                    q, k16, v16, lens, **kw)
    ti8 = time_call(
        lambda q, *a: decode_attention_q8_pallas(q, *a, pq_i8=True),
        q, kq, ks, vq, vs, lens, **kw)
    tpv = time_call(
        lambda q, *a: decode_attention_q8_pallas(q, *a, pq_i8=False),
        q, kq, ks, vq, vs, lens, **kw)
    by16 = 2 * b * hkv * kvlen * d * 2
    by8 = 2 * b * hkv * kvlen * d + 2 * b * hkv * kvlen * 4
    print(f"{kvlen:7d} {t16*1e6:9.1f} {ti8*1e6:9.1f} {tpv*1e6:11.1f} "
          f"{by16/t16/1e9:9.1f} {by8/ti8/1e9:8.1f}", flush=True)
