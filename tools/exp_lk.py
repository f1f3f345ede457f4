"""Layer-kernel block-geometry A/B at 7B shapes (ZGML_TPU_LAYER_TUNE).

The round-4 kernel profile showed attn_block streaming at ~408 GB/s vs the
FFN megakernel's 562 and the 634 GB/s probe — the attention block's grid is
26 small steps (avg ~1.7MB) vs the FFN's 22 x ~4MB. This harness interleaves
geometry variants in one window (ktime.time_ab) to find the best block
shapes. Usage: python tools/exp_lk.py [packed.safetensors]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import os                                                       # noqa: E402
os.environ["ZGML_TPU_LK_DEBUG"] = "1"
from zgml_tpu.io.packed_ckpt import load_packed_llama           # noqa: E402
from zgml_tpu.runtime.ktime import time_ab                      # noqa: E402
from zgml_tpu.ops.layerkernel import attn_block_step            # noqa: E402
from zgml_tpu.ops import refs                                   # noqa: E402

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
hq, hkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
rng = np.random.default_rng(0)
kv_len = int(sys.argv[2]) if len(sys.argv) > 2 else 192
cos, sin = refs.rope_cos_sin(jnp.asarray([kv_len]), hd, cfg.rope_base)
cos2 = jnp.concatenate([cos, cos], axis=1)
sin2 = jnp.concatenate([-sin, sin], axis=1)
x1 = jnp.asarray(rng.standard_normal((1, 1, cfg.d_model)), jnp.float32)
kc = jnp.asarray(rng.standard_normal((1, hkv, cfg.max_seq_len, hd)),
                 jnp.bfloat16)
vc = jnp.asarray(rng.standard_normal((1, hkv, cfg.max_seq_len, hd)),
                 jnp.bfloat16)


def f_ab(x, layer, ck1, cv1, c2, s2):
    x2, *_ = attn_block_step(cfg, layer, x, ck1, cv1, kv_len, c2, s2)
    return x2


args = (x1, layer0, kc, vc, cos2, sin2)
# round-4 focus: the kernel profile shows attn_block at 526 GB/s vs the FFN
# megakernel's 610 at kv=576 — the B (KV) phase is the gap. bkB sweep at the
# bench's mid-generation context, holding the tuned A/C geometry (ncA=2,hg=2)
VARIANTS = {
    "base(auto)": ((f_ab,) + args, {"ZGML_TPU_LAYER_TUNE": ""}),
    "nca2,bkB128,hg2,9M": ((f_ab,) + args,
                           {"ZGML_TPU_LAYER_TUNE": "0,2,128,2,9"}),
    "nca2,bkB256,hg2,9M": ((f_ab,) + args,
                           {"ZGML_TPU_LAYER_TUNE": "0,2,256,2,9"}),
    "nca2,bkB128,hg4,9M": ((f_ab,) + args,
                           {"ZGML_TPU_LAYER_TUNE": "0,2,128,4,9"}),
    "nca1,bkB128,hg2,9M": ((f_ab,) + args,
                           {"ZGML_TPU_LAYER_TUNE": "0,1,128,2,9"}),
    "nca2,bkB64,hg2,9M": ((f_ab,) + args,
                          {"ZGML_TPU_LAYER_TUNE": "0,2,64,2,9"}),
}

results = {}
for name, spec in list(VARIANTS.items()):
    try:
        r = time_ab({name: spec}, reps=8, reps2=40, rounds=1)
        results.update(r)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        VARIANTS.pop(name)

# full interleaved comparison of the survivors
out = time_ab(VARIANTS, reps=8, reps2=40, rounds=3)
from zgml_tpu.quant.repack import PackedWeight  # noqa: E402
mb = (layer0["wqkv"].nbytes + layer0["wo3"].nbytes
      + 2 * hkv * kv_len * hd * 2) / 1e6
print(f"\nattn_block A/B (layer bytes ~{mb:.1f} MB @ kv={kv_len}):")
for name, dt in sorted(out.items(), key=lambda kv: kv[1]):
    print(f"  {name:26s} {dt*1e6:8.1f} us  {mb/1e3/dt:6.0f} GB/s", flush=True)
