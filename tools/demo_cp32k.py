"""Demonstrate context-parallel prefill of a 32k-token prompt on the virtual
8-device CPU mesh through the kernel-tier ring attention (VERDICT r4 item 7).

Each device owns a 4096-token shard; every ring hop runs the blockwise flash
kernel (interpret mode here) over the visiting 4096-token KV block and merges
via LSE — the peak per-device attention transient is O(t_loc * d) f32, never
the O(t_loc^2) = 64 MB/head score block the einsum ref tier would allocate.

Usage: python tools/demo_cp32k.py [T=32768] [layers=1]
"""
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["ZGML_TPU_INTERPRET"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from zgml_tpu.models.llama import LlamaConfig, LlamaModel, init_params  # noqa: E402
from zgml_tpu.parallel.mesh import make_mesh                            # noqa: E402
from zgml_tpu.runtime.engine import LlamaEngine                         # noqa: E402
from zgml_tpu.runtime.profile import global_profile                     # noqa: E402

T = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
L = int(sys.argv[2]) if len(sys.argv) > 2 else 1

cfg = LlamaConfig(vocab_size=256, d_model=128, n_heads=4, n_kv_heads=2,
                  d_ff=256, n_layers=L, max_seq_len=T + 64, tied_lm_head=True)
model = LlamaModel(cfg, init_params(cfg, seed=0))
mesh = make_mesh(tp=8, dp=1, axis_names=("dp", "cp"))
prompt = np.random.default_rng(0).integers(0, 256, T).astype(np.int32)

eng = LlamaEngine(model, batch=1)
global_profile.reset()
t0 = time.time()
last = eng.prefill_cp(prompt, mesh)
last_np = np.asarray(last)
dt = time.time() - t0
n_ring = global_profile.op_tiers.get(("ring_attention", "pallas"), 0)
assert np.isfinite(last_np).all(), "cp prefill produced non-finite logits"
assert n_ring > 0, "ring flash tier did not run"
print(f"cp32k ok: T={T} layers={L} t_loc={T//8} in {dt:.1f}s "
      f"(interpret-mode flash, {n_ring} ring calls); "
      f"logits[0,:3]={last_np[0, :3]}")
nxt, _ = eng.step(np.array([int(last_np[0].argmax())]))
print(f"decode continues: next={int(np.asarray(nxt)[0])} pos={eng.pos}")
