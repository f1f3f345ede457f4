"""Per-kernel device-time profiling for the decode hot path.

The analog of the reference's RuntimeProfile (src/profile.zig:820-910), which
accumulates per-op-tag nanoseconds inside the backend so a slow kernel is
visible, not hidden behind "the backend served it". XLA gives no per-op hook,
so this times each kernel *in isolation at its real model shapes* (chained
dispatch, value-fetch barrier — tunnel-safe) and reconciles the sum against
the measured full decode step: the "unaccounted" row is dispatch overhead +
XLA-tier glue. Used by `bench.py --kernel-profile` and the acceptance rule
"fast paths visible in profiles" (ref docs/perf-targets.md:52-54).
"""
from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from zgml_tpu.quant.repack import PackedWeight

from zgml_tpu import config


def time_call(f, x0, *rest, reps: int = 32, reps2: int = 160,
              trials: int = 3) -> float:
    """Best-of-`trials` marginal seconds/call of f(x0, *rest), with the reps
    run back-to-back ON DEVICE inside one lax.scan dispatch and the fixed
    dispatch cost cancelled by a TWO-POINT fit.

    Two tunnel artifacts poison naive timing here: (1) host-side per-dispatch
    overhead is ~2 ms, so a python rep loop measures the tunnel, not the
    kernel; (2) the value-fetch barrier costs a ~30 ms RTT, so even a single
    scan-chained window of N reps reads `RTT/N + kernel` — at reps=30 a 100us
    kernel "measures" 1.1 ms (this corrupted the first recorded 7B kernel
    table). The scan chains iterations via a denormal-scaled output fold
    (serial dependency, no CSE), and the slope (t(reps2) - t(reps)) /
    (reps2 - reps) cancels every fixed cost exactly. The chip is TIME-SHARED
    (same kernel 33->258 GB/s between windows); best-of-trials keeps the
    least-contended slope. x0 must be a float array (the fold target)."""
    loop1, loop2 = _make_loop(f, reps), _make_loop(f, reps2)
    for loop in (loop1, loop2):
        float(np.asarray(loop(x0, *rest)).ravel()[0])   # compile + warm
    slopes = []
    for _ in range(trials):
        t0 = time.time()
        float(np.asarray(loop1(x0, *rest)).ravel()[0])
        t1 = time.time()
        float(np.asarray(loop2(x0, *rest)).ravel()[0])
        t2 = time.time()
        slopes.append(((t2 - t1) - (t1 - t0)) / (reps2 - reps))
    # median, not min: a contended short-rep window next to a clean long-rep
    # window yields a spuriously tiny (even negative) slope, so min-of-trials
    # undershoots (a 31MB-read kernel once "measured" 4980 GB/s)
    pos = [s for s in slopes if s > 0]
    return float(np.median(pos)) if pos else (t2 - t1) / reps2


def _make_loop(f, n: int):
    @jax.jit
    def loop(x, *rest):
        def body(x, _):
            out = f(x, *rest)
            leaf = jax.tree.leaves(out)[0]
            dep = leaf.ravel()[0].astype(x.dtype) * 1e-30
            return x + dep, ()
        x, _ = jax.lax.scan(body, x, length=n)
        return x
    return loop


def time_ab(variants: dict, reps: int = 30, reps2: int = 160,
            rounds: int = 3) -> dict:
    """Interleaved A/B of several kernels/steps on a TIME-SHARED chip.

    time_call times each variant's trials back-to-back, so minutes-scale
    contention drift biases whichever variant ran in the worse window (two
    same-code runs disagreed 20% on a full-step A/B). Here every round times
    each variant once (two-point fit), so all variants share each round's
    window; the per-variant median-of-positive-slopes then compares like
    with like. variants: {name: (f, x0, *rest)} -> {name: sec/call}.
    A variant name may map to ((f, x0, *rest), {env}) to set env vars during
    its compile (dispatch tier gates read the env at trace time)."""
    import os
    comp = {}
    for name, spec in variants.items():
        env = {}
        if (len(spec) == 2 and isinstance(spec[1], dict)
                and isinstance(spec[0], tuple)):
            spec, env = spec
        f, x0, *rest = spec
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            l1, l2 = _make_loop(f, reps), _make_loop(f, reps2)
            float(np.asarray(l1(x0, *rest)).ravel()[0])   # compile + warm
            float(np.asarray(l2(x0, *rest)).ravel()[0])
        finally:
            for k, old in saved.items():
                if old is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = old
        comp[name] = (l1, l2, x0, rest)
    slopes = {n: [] for n in variants}
    raw = {}
    for _ in range(rounds):
        for name, (l1, l2, x0, rest) in comp.items():
            t0 = time.time()
            float(np.asarray(l1(x0, *rest)).ravel()[0])
            t1 = time.time()
            float(np.asarray(l2(x0, *rest)).ravel()[0])
            t2 = time.time()
            slopes[name].append(((t2 - t1) - (t1 - t0)) / (reps2 - reps))
            raw[name] = min(raw.get(name, float("inf")),
                            (t2 - t1) / reps2)
    out = {}
    for n, ss in slopes.items():
        pos = [s for s in ss if s > 0]
        # no positive slope (every window was contended): fall back to the
        # raw two-point estimate from the best round — mirroring time_call —
        # rather than returning a zero/negative slope that silently corrupts
        # downstream A/B ratios
        out[n] = float(np.median(pos)) if pos else raw.get(n, float("nan"))
    return out


def _layer0(leaf):
    """One layer's slice of a stacked ([L, ...]) weight leaf."""
    if isinstance(leaf, PackedWeight):
        if getattr(leaf.qvals, "ndim", 2) == 3:
            return dataclasses.replace(leaf, qvals=leaf.qvals[0],
                                       scales=leaf.scales[0])
        return leaf
    return leaf[0] if getattr(leaf, "ndim", 2) == 3 else leaf


def _leaf_bytes(leaf) -> int:
    if isinstance(leaf, PackedWeight):
        return leaf.nbytes
    return int(np.prod(leaf.shape)) * jnp.dtype(leaf.dtype).itemsize


def profile_decode_kernels(model, kv_len: int = 256, batch: int = 1,
                           reps: int = 30) -> list[dict]:
    """Time every decode-step kernel at its real shapes.

    Returns rows {name, shape, us_call, calls_tok, us_tok, mb_call, gbs} plus
    a measured `full decode step` row and the derived `unaccounted` residue.
    """
    from zgml_tpu.ops import dispatch as ops

    cfg = model.cfg
    L = cfg.n_layers
    rng = np.random.default_rng(0)
    rows: list[dict] = []

    def add(name, shape, dt, calls, nbytes):
        rows.append({
            "name": name, "shape": shape, "us_call": dt * 1e6,
            "calls_tok": calls, "us_tok": dt * 1e6 * calls,
            "mb_call": nbytes / 1e6,
            "gbs": (nbytes / dt / 1e9) if dt > 0 else 0.0,
        })

    # -- per-layer projections (one layer's weights, x L calls/token) --------
    layers = model.params["layers"]
    layer0 = (layers[0] if isinstance(layers, (list, tuple))
              else {n: _layer0(leaf) for n, leaf in layers.items()})
    from zgml_tpu.quant.headmajor import DERIVED_KEYS
    proj_names = [n for n in layer0
                  if n not in ("attn_norm", "ffn_norm") + tuple(DERIVED_KEYS)]
    for name in proj_names:
        w = layer0[name]
        if isinstance(w, PackedWeight):
            k, n = w.k, w.n
        else:
            k, n = int(w.shape[0]), int(w.shape[1])
        x = jnp.asarray(rng.standard_normal((batch, 1, k)), jnp.float32)
        # weights go in as ARGUMENTS: closing over them would capture GBs as
        # lowering constants and re-upload them through the tunnel per compile
        dt = time_call(lambda x, w: ops.qmatmul(x, w), x, w, reps=reps)
        add(name, f"[{k}x{n}]", dt, L, _leaf_bytes(w))

    # -- decode attention over the live cache prefix -------------------------
    hq, hkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    s = cfg.max_seq_len
    q = jnp.asarray(rng.standard_normal((batch, hq, 1, hd)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((batch, hkv, s, hd)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((batch, hkv, s, hd)), jnp.bfloat16)
    lens = jnp.full((batch,), kv_len, jnp.int32)
    dt = time_call(lambda q, k, v, l: ops.decode_attention(q, k, v, l),
                   q, kc, vc, lens, reps=reps)
    kv_bytes = 2 * batch * hkv * kv_len * hd * 2     # live K+V, bf16
    add("decode_attention", f"[kv={kv_len}/{s}]", dt, L, kv_bytes)

    # -- fused decode-path kernels (when attached AND the step will actually
    # run them: key on the same runtime gates _layer_step uses, not on wo3
    # presence alone — a flipped ZGML_TPU_ATTN_BLOCK would otherwise inflate
    # the 'unaccounted' row by excluding rows the step really served) -------
    from zgml_tpu.ops.layerkernel import attn_block_enabled
    fused_active = (batch == 1 and "wo3" in layer0
                    and attn_block_enabled() and ops.use_pallas("attn_block"))
    if fused_active:
        from zgml_tpu.ops import refs as _refs
        from zgml_tpu.ops.layerkernel import attn_block_step
        cos, sin = _refs.rope_cos_sin(jnp.asarray([kv_len]), hd,
                                      cfg.rope_base)
        cos2 = jnp.concatenate([cos, cos], axis=1)
        sin2 = jnp.concatenate([-sin, sin], axis=1)
        x1 = jnp.asarray(rng.standard_normal((1, 1, cfg.d_model)),
                         jnp.float32)

        def f_ab(x, layer, ck1, cv1, c2, s2):
            x2, *_ = attn_block_step(cfg, layer, x, ck1, cv1, kv_len,
                                          c2, s2)
            return x2

        dt = time_call(f_ab, x1, layer0, kc, vc, cos2, sin2, reps=reps)
        ab_bytes = (layer0["wqkv"].nbytes + layer0["wo3"].nbytes + kv_bytes)
        import os as _os
        whole = ("ffn_q4n" in layer0
                 and config.layer_ffn())
        if whole:                        # whole-layer kernel: FFN included
            ab_bytes += sum(v.nbytes for v in layer0["ffn_q4n"].values())
            add("layer(fused)", f"[kv={kv_len}]", dt, L, ab_bytes)
        else:
            add("attn_block(fused)", f"[kv={kv_len}]", dt, L, ab_bytes)

        gu, wd = layer0.get("w_gate_up"), layer0.get("w_down")
        if "ffn_q4n" in layer0:
            pack = layer0["ffn_q4n"]

            def f_ffn(x, g, pack):
                out = ops.fused_ffn_norm_q4n(x, g, pack, cfg.d_model,
                                             cfg.rms_norm_eps)
                return out if out is not None else x

            dt = time_call(f_ffn, x1, layer0["ffn_norm"], pack, reps=reps)
            add("ffn_q4n(fused)", "", dt, L,
                sum(v.nbytes for v in pack.values()))
        elif gu is not None:
            def f_ffn(x, g, gu_, wd_):
                out = ops.fused_ffn_norm(x, g, gu_, wd_, cfg.rms_norm_eps)
                return out if out is not None else x

            dt = time_call(f_ffn, x1, layer0["ffn_norm"], gu, wd, reps=reps)
            add("ffn_norm(fused)", "", dt, L,
                _leaf_bytes(gu) + _leaf_bytes(wd))

    # -- lm head -------------------------------------------------------------
    head = model.params.get("lm_head")
    d = cfg.d_model
    h = jnp.asarray(rng.standard_normal((batch, 1, d)), jnp.float32)
    if head is None:
        emb = model.params["tok_embd"]
        dt = time_call(lambda h, e: jnp.einsum(
            "btd,vd->btv", h, e.astype(jnp.float32)), h, emb, reps=reps)
        add("lm_head(tied)", f"[{d}x{cfg.vocab_size}]", dt, 1,
            _leaf_bytes(emb))
    else:
        dt = time_call(lambda h, w: ops.qmatmul(h, w), h, head, reps=reps)
        add("lm_head", f"[{d}x{cfg.vocab_size}]", dt, 1, _leaf_bytes(head))

    # -- the full measured step + residue ------------------------------------
    cache = model.init_cache(batch)

    def step_fn(xf, params, cache):
        # xf is loop-variant (carries the dep fold), so tok can't be hoisted
        # out of the timing scan; its value stays 0
        tok = jnp.abs(xf[:, :1]).astype(jnp.int32) % cfg.vocab_size
        logits, _ = model.forward(params, tok, cache, kv_len)
        return logits

    x0 = jnp.zeros((batch, 2), jnp.float32)
    dt_step = time_call(step_fn, x0, model.params, cache, reps=reps)
    # reconcile against the kernels the step ACTUALLY runs: with the fused
    # path active (same gates as _layer_step), the per-projection and
    # decode_attention rows are reference points only (the step runs
    # attn_block + ffn_norm instead)
    served = ["wqkv", "wo", "w_gate_up", "w_gate", "w_up", "w_down",
              "decode_attention"]
    if any(r["name"] == "layer(fused)" for r in rows):
        served += ["ffn_q4n(fused)", "ffn_norm(fused)"]
    accounted = sum(r["us_tok"] for r in rows
                    if not (fused_active and r["name"] in served))
    add("full decode step", "", dt_step, 1, 0)
    rows.append({"name": "unaccounted (dispatch+glue)", "shape": "",
                 "us_call": dt_step * 1e6 - accounted, "calls_tok": 1,
                 "us_tok": dt_step * 1e6 - accounted, "mb_call": 0.0,
                 "gbs": 0.0})
    return rows


def render_kernel_profile(rows: list[dict]) -> str:
    out = [f"{'kernel':28s} {'shape':16s} {'us/call':>9s} {'x/tok':>6s} "
           f"{'us/tok':>9s} {'MB':>8s} {'GB/s':>7s}"]
    for r in rows:
        out.append(
            f"{r['name']:28s} {r['shape']:16s} {r['us_call']:9.1f} "
            f"{r['calls_tok']:6d} {r['us_tok']:9.1f} {r['mb_call']:8.1f} "
            f"{r['gbs']:7.1f}")
    return "\n".join(out)
