"""Diagnose the decode fit-vs-scan delta at 7B: the time_ab step fit (cache
invariant, writes DCE'd) measures ~7.5ms/token while bench's decode_n scan
measures ~7.9ms. Variants isolate: carried cache (real writes), sampling,
and the toks stacking.

Usage: python tools/exp_scan.py [packed.safetensors] [kv_len]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from zgml_tpu.io.packed_ckpt import load_packed_llama           # noqa: E402
from zgml_tpu.runtime.ktime import time_ab                      # noqa: E402
from zgml_tpu.runtime.sampling import SamplingParams, sample    # noqa: E402

path = sys.argv[1] if len(sys.argv) > 1 else \
    ".bench_cache/llama2-7b_q4_0.gguf.packed.safetensors"
kv_len = int(sys.argv[2]) if len(sys.argv) > 2 else 192
print("devices:", jax.devices(), flush=True)
t0 = time.time()
model = load_packed_llama(path, derive=False)
model.params = jax.device_put(model.params)
model.attach_derived()
jax.block_until_ready(jax.tree.leaves(model.params)[0])
print(f"ready in {time.time()-t0:.1f}s", flush=True)

cfg = model.cfg
cache0 = model.init_cache(1)
sp = SamplingParams()

# variant 1: logits-only, cache loop-invariant (the optimistic fit)
def fit_step(xf, params, cache):
    tok = jnp.abs(xf[:, :1]).astype(jnp.int32) % cfg.vocab_size
    logits, _ = model.forward(params, tok, cache, kv_len)
    return logits

# variant 2: cache CARRIED through the rep loop (real in-place writes), no
# sampling. time_ab's loop folds out[0] into x; we thread the cache by
# closing over a mutable... not possible — instead build a scan mirroring
# decode_n so the carry structure matches the real engine.
def make_scan(n, sample_tok: bool, carry_cache: bool):
    @jax.jit
    def run(x0, params, cache):
        key = jax.random.PRNGKey(0)

        def body(carry, _):
            tok, cache, pos, key = carry
            logits, cache2 = model.forward(params, tok[:, None], cache, pos)
            if not carry_cache:
                cache2 = cache
            if sample_tok:
                key, sub = jax.random.split(key)
                nxt = sample(logits[:, -1], sp, sub)
            else:
                nxt = (jnp.abs(logits[0, -1, 0]).astype(jnp.int32)
                       % cfg.vocab_size)[None]
            return (nxt, cache2, pos + 1, key), nxt

        tok0 = (jnp.abs(x0[:, 0]).astype(jnp.int32) % cfg.vocab_size)
        (tok, cache, pos, key), toks = jax.lax.scan(
            body, (tok0, cache, kv_len, key), length=n)
        return toks[-1].astype(jnp.float32)[None]
    return run

x0 = jnp.zeros((1, 2), jnp.float32)

VARIANTS = {
    "fit(invariant-cache)": (fit_step, x0, model.params, cache0),
}
# scan variants run n steps INSIDE one call; time_ab's own scan then chains
# them — report per-token by dividing by n after
N = 8
for name, (samp, carry) in {
    "scan+carry+sample": (True, True),
    "scan+carry": (False, True),
    "scan(no-carry)": (False, False),
}.items():
    VARIANTS[name] = (make_scan(N, samp, carry), x0, model.params,
                      model.init_cache(1))

out = time_ab(VARIANTS, reps=4, reps2=16, rounds=4)
print(f"\nper-token decode cost (7B Q4_0, kv={kv_len}):")
for name, dt in out.items():
    per = dt if name.startswith("fit") else dt / N
    print(f"  {name:22s} {per*1e3:7.3f} ms/tok", flush=True)
