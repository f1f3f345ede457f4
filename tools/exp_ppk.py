"""Prefill per-kernel profile: where does the pp-chunk step spend its time?

Times each prefill-shape component in isolation (ktime.time_call two-point
fit) and reconciles the sum against the measured full chunk forward, with
per-component TFLOP/s so the MXU-bound pieces are visible (VERDICT: prefill
MFU ~45%, target >=60% at pp512).

Usage: python tools/exp_ppk.py [packed.safetensors] [chunk] [pos]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from zgml_tpu.io.packed_ckpt import load_packed_llama           # noqa: E402
from zgml_tpu.ops import dispatch as ops                        # noqa: E402
from zgml_tpu.ops import refs                                   # noqa: E402
from zgml_tpu.runtime.ktime import time_call                    # noqa: E402

path = sys.argv[1] if len(sys.argv) > 1 else \
    ".bench_cache/llama2-7b_q4_0.gguf.packed.safetensors"
chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 256
pos = int(sys.argv[3]) if len(sys.argv) > 3 else 128
print("devices:", jax.devices(), flush=True)
t0 = time.time()
model = load_packed_llama(path, derive=False)
model.params = jax.device_put(model.params)
model.attach_derived()
jax.block_until_ready(jax.tree.leaves(model.params)[0])
print(f"ready in {time.time()-t0:.1f}s", flush=True)

cfg = model.cfg
d, hd, hq, hkv = cfg.d_model, cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
L, F, V = cfg.n_layers, cfg.d_ff, cfg.vocab_size
rng = np.random.default_rng(0)
layer0 = model.params["layers"][0]
rows = []


def add(name, dt, calls, flops):
    rows.append((name, dt * 1e6, calls, dt * 1e6 * calls,
                 flops / dt / 1e12 if dt > 0 else 0.0))


m = chunk
x = jnp.asarray(rng.standard_normal((1, m, d)), jnp.float32)

# projections (per layer, x L)
wqkv = layer0["wqkv"]
dt = time_call(lambda x, w: ops.qmatmul(x, w), x, wqkv, reps=8, reps2=40)
add("wqkv", dt, L, 2 * m * d * (hq + 2 * hkv) * hd)

att_in = jnp.asarray(rng.standard_normal((1, m, hq * hd)), jnp.float32)
dt = time_call(lambda x, w: ops.qmatmul(x, w), att_in, layer0["wo"],
               reps=8, reps2=40)
add("wo", dt, L, 2 * m * hq * hd * d)

g1 = jnp.ones((d,), jnp.float32)


def ffn(x, layer):
    out = None
    if "ffn_q4n" in layer:
        out = ops.fused_ffn_norm_q4n(x, g1, layer["ffn_q4n"], d, 1e-5)
    if out is None and "w_gate_up" in layer:
        out = ops.fused_ffn(x, layer["w_gate_up"], layer["w_down"])
    if out is None:
        gu = ops.qmatmul(x, layer["w_gate_up"])
        f = gu.shape[-1] // 2
        act = refs.swiglu_ref(gu[..., :f], gu[..., f:])
        out = ops.qmatmul(act, layer["w_down"])
    return out


dt = time_call(lambda x, l: ffn(x, l), x, layer0, reps=8, reps2=40)
add("ffn(gu+down)", dt, L, 2 * m * d * 3 * F)

# attention at mid-prefill kv
kv_len = pos + m
S = cfg.max_seq_len
q = jnp.asarray(rng.standard_normal((1, hq, m, hd)), jnp.float32)
kc = jnp.asarray(rng.standard_normal((1, hkv, S, hd)), jnp.bfloat16)
vc = jnp.asarray(rng.standard_normal((1, hkv, S, hd)), jnp.bfloat16)
dt = time_call(
    lambda q, k, v: ops.flash_attention(q, k, v, kv_len=kv_len, q_offset=pos),
    q, kc, vc, reps=8, reps2=40)
add(f"flash(kv={kv_len})", dt, L, 2 * 2 * hq * m * kv_len * hd)

# norms + rope (XLA glue, per layer x2 / x1)
g = jnp.ones((d,), jnp.float32)
dt = time_call(lambda x, g: ops.rmsnorm(x, g, 1e-5), x, g, reps=8, reps2=40)
add("rmsnorm", dt, 2 * L + 1, 0)
cos, sin = refs.rope_cos_sin(pos + jnp.arange(m), hd, cfg.rope_base)
qh = jnp.asarray(rng.standard_normal((1, hq, m, hd)), jnp.float32)
dt = time_call(lambda q: ops.rope_apply(q, cos, sin), qh, reps=8, reps2=40)
add("rope", dt, 2 * L, 0)

# lm_head over the whole chunk
lm = model.params.get("lm_head")
if lm is not None:
    dt = time_call(lambda x, w: ops.qmatmul(x, w), x, lm, reps=8, reps2=40)
    add("lm_head", dt, 1, 2 * m * d * V)

# full chunk forward
cache = model.init_cache(1)
toks = jnp.asarray(rng.integers(0, V, (1, m)), jnp.int32)


def full(xf, params, cache, toks):
    logits, _ = model.forward(params, toks, cache, pos)
    return logits


dt_full = time_call(full, x, model.params, cache, toks, reps=8, reps2=40)
mm_tok = L * (d * (hq + 2 * hkv) * hd + hq * hd * d + 3 * d * F) + d * V
fl_full = 2 * m * mm_tok + L * 2 * 2 * hq * m * kv_len * hd

print(f"\nprefill chunk={m} pos={pos} (7B-class shapes)")
print(f"{'component':18s} {'us/call':>9s} {'calls':>6s} {'us/chunk':>10s} "
      f"{'TFLOP/s':>8s}")
acc = 0.0
for name, us, calls, us_tot, tf in rows:
    acc += us_tot
    print(f"{name:18s} {us:9.1f} {calls:6d} {us_tot:10.1f} {tf:8.1f}")
print(f"{'SUM(isolated)':18s} {'':9s} {'':6s} {acc:10.1f}")
print(f"{'full chunk':18s} {dt_full*1e6:9.1f} {1:6d} {dt_full*1e6:10.1f} "
      f"{fl_full/dt_full/1e12:8.1f}")
print(f"{'unaccounted':18s} {'':9s} {'':6s} {dt_full*1e6-acc:10.1f}")
print(f"\nchunk rate: {m/dt_full:,.0f} tok/s   "
      f"MFU vs 197 TF/s: {100*fl_full/dt_full/197e12:.1f}%", flush=True)
