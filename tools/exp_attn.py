"""High-rep attention A/B: dyn vs static grid, bf16 vs int8 KV.

reps large enough that the kernel time dominates ms-scale tunnel jitter.
Usage: python tools/exp_attn.py [d hq hkv S]
"""
import sys
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")
from zgml_tpu.runtime.ktime import time_ab                     # noqa: E402
from zgml_tpu.ops.attention import (decode_attention_pallas,   # noqa: E402
                                    decode_attention_q8_pallas)
from zgml_tpu.quant.kv_cache import quantize_columns           # noqa: E402

d, hq, hkv, S = (int(a) for a in sys.argv[1:5]) if len(sys.argv) > 4 else \
    (128, 32, 32, 2048)
b = 1
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((b, hq, 1, d)), jnp.float32)
k = jnp.asarray(rng.standard_normal((b, hkv, S, d)), jnp.float32)
v = jnp.asarray(rng.standard_normal((b, hkv, S, d)), jnp.float32)
k16, v16 = k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
kq, ks = quantize_columns(k)
vq, vs = quantize_columns(v)

att16 = lambda q, k, v, l: decode_attention_pallas(q, k, v, l)  # noqa: E731
attq8 = lambda q, *a: decode_attention_q8_pallas(q, *a)         # noqa: E731
for kvlen in (192, 1024, S - 1):
    lens = jnp.full((b,), kvlen, jnp.int32)
    r = time_ab({
        "bf16_dyn": ((att16, q, k16, v16, lens), {"ZGML_TPU_DYNGRID": "1"}),
        "i8_dyn": ((attq8, q, kq, ks, vq, vs, lens),
                   {"ZGML_TPU_DYNGRID": "1"}),
        "bf16_sta": ((att16, q, k16, v16, lens), {"ZGML_TPU_DYNGRID": "0"}),
        "i8_sta": ((attq8, q, kq, ks, vq, vs, lens),
                   {"ZGML_TPU_DYNGRID": "0"}),
    }, reps=200, reps2=1000, rounds=4)
    by16 = 2 * b * hkv * kvlen * d * 2
    print(f"kv={kvlen}: " + "  ".join(
        f"{k_} {v_*1e6:.1f}us ({by16/(2 if 'i8' in k_ else 1)/v_/1e9:.0f}GB/s)"
        for k_, v_ in r.items()), flush=True)
