"""Conformance tests for the fused attention-block megakernel vs a composed
jnp oracle (rmsnorm -> qkv -> rope -> cache+self attention -> wo -> residual).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zgml_tpu.models.llama import LlamaConfig
from zgml_tpu.ops import refs
from zgml_tpu.ops.layerkernel import (attn_block_compatible, attn_block_step)
from zgml_tpu.quant.headmajor import attach_head_major
from zgml_tpu.quant.repack import concat_packed, dequant_packed, \
    quantize_weight


def _mk(cfg, kind, seed=0):
    rng = np.random.default_rng(seed)
    d, hd = cfg.d_model, cfg.head_dim
    nq, nkv = cfg.n_heads * hd, cfg.n_kv_heads * hd

    def qw(n, k):
        w = rng.standard_normal((n, k)).astype(np.float32) * 0.08
        return quantize_weight(w, kind, n_align=1)

    wq, wk, wv = qw(nq, d), qw(nkv, d), qw(nkv, d)
    wqkv = concat_packed([wq, wk, wv])
    wo = quantize_weight(
        rng.standard_normal((d, nq)).astype(np.float32) * 0.08, kind)
    layer = {"wqkv": wqkv, "wo": wo,
             "attn_norm": jnp.asarray(
                 1.0 + 0.1 * rng.standard_normal(d).astype(np.float32))}
    assert attach_head_major(layer, cfg.n_heads, cfg.n_kv_heads, hd)
    return layer


def _oracle(cfg, layer, x, cache_k, cache_v, pos):
    d, hd = cfg.d_model, cfg.head_dim
    hq, hkv = cfg.n_heads, cfg.n_kv_heads
    nq, nkv = hq * hd, hkv * hd
    g = np.asarray(layer["attn_norm"])
    xn = np.asarray(x).reshape(d)
    xn = xn / np.sqrt((xn * xn).mean() + cfg.rms_norm_eps) * g
    wqkv = dequant_packed(layer["wqkv"])          # [n, k]
    qkv = xn @ wqkv.T                             # [nq + 2nkv]
    q = qkv[:nq].reshape(hq, hd)
    k = qkv[nq:nq + nkv].reshape(hkv, hd)
    v = qkv[nq + nkv:nq + 2 * nkv].reshape(hkv, hd)
    cos, sin = (np.asarray(a)[0] for a in refs.rope_cos_sin(
        jnp.asarray([pos]), hd, cfg.rope_base))
    rot = lambda t: np.concatenate(                      # noqa: E731
        [t[..., :hd // 2] * cos - t[..., hd // 2:] * sin,
         t[..., hd // 2:] * cos + t[..., :hd // 2] * sin], -1)
    q, k = rot(q), rot(k)
    ks = np.concatenate(
        [np.asarray(cache_k)[0, :, :pos, :], k[:, None, :]], axis=1)
    vs = np.concatenate(
        [np.asarray(cache_v)[0, :, :pos, :], v[:, None, :]], axis=1)
    nr = hq // hkv
    att = np.zeros((hq, hd), np.float32)
    for h in range(hq):
        s = (ks[h // nr] @ q[h]) / np.sqrt(hd)
        p = np.exp(s - s.max())
        p /= p.sum()
        att[h] = p @ vs[h // nr]
    out = att.reshape(nq) @ dequant_packed(layer["wo"]).T
    return np.asarray(x).reshape(d) + out, k, v


@pytest.mark.parametrize("kind", ["q8_0", "q4_0"])
@pytest.mark.parametrize("hq,hkv,pos", [(8, 2, 37), (4, 4, 0), (8, 8, 100)])
def test_attn_block_matches_oracle(kind, hq, hkv, pos, monkeypatch):
    # exercise the in-kernel aliased cache write (opt-in; default is the
    # XLA dynamic_update_slice path, measured faster — config.lk_cachewrite)
    monkeypatch.setenv("ZGML_TPU_LK_CACHEWRITE", "1")
    hd = 32
    cfg = LlamaConfig(vocab_size=128, d_model=hq * hd, n_heads=hq,
                      n_kv_heads=hkv, d_ff=128, n_layers=1, max_seq_len=128)
    layer = _mk(cfg, kind, seed=hq + pos)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 1, cfg.d_model)), jnp.float32)
    cache_k = jnp.asarray(
        rng.standard_normal((1, hkv, cfg.max_seq_len, hd)) * 0.5, jnp.bfloat16)
    cache_v = jnp.asarray(
        rng.standard_normal((1, hkv, cfg.max_seq_len, hd)) * 0.5, jnp.bfloat16)
    assert attn_block_compatible(layer, cfg, cache_k)

    cos, sin = refs.rope_cos_sin(jnp.asarray([pos]), hd, cfg.rope_base)
    cos2 = jnp.concatenate([cos, cos], axis=1)           # [1, hd]
    sin2 = jnp.concatenate([-sin, sin], axis=1)
    x2, kc, vc, did_ffn, new_ck, new_cv = attn_block_step(
        cfg, layer, x, cache_k, cache_v, pos, cos2, sin2)
    assert not did_ffn           # test layers carry no FFN weights
    # in-kernel aliased cache write: row `pos` holds the rope'd K/V; live
    # rows (< pos) and rows outside the 16-row window stay byte-identical
    # to the input cache; dead in-window rows (> pos) deterministically
    # hold kcur/vcur (they're overwritten before any read)
    rows = np.arange(cfg.max_seq_len)
    w0 = (pos // 16) * 16
    dead = (rows >= w0) & (rows < w0 + 16) & (rows >= pos)
    for new, cur, old in ((new_ck, kc, cache_k), (new_cv, vc, cache_v)):
        new, old = np.asarray(new)[0], np.asarray(old)[0]
        curr = np.asarray(cur).reshape(hkv, hd).astype(new.dtype)
        expect = old.copy()
        expect[:, dead, :] = curr[:, None, :]
        np.testing.assert_array_equal(new, expect)

    want_x2, want_k, want_v = _oracle(
        cfg, layer, x, cache_k.astype(jnp.float32),
        cache_v.astype(jnp.float32), pos)
    np.testing.assert_allclose(np.asarray(kc).reshape(hkv, hd), want_k,
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(vc).reshape(hkv, hd), want_v,
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(x2).reshape(-1), want_x2,
                               rtol=3e-2, atol=3e-2)


def test_engine_fused_attn_block_matches_unfused(tmp_path, monkeypatch):
    """End-to-end: engine decode with the fused attention block ==
    the unfused path (same weights, greedy tokens)."""
    from zgml_tpu.io.gguf import GGMLType
    from zgml_tpu.io.llama_loader import load_llama
    from zgml_tpu.runtime.engine import LlamaEngine
    from zgml_tpu.utils.synthetic import write_synthetic_llama_gguf
    cfg = LlamaConfig(vocab_size=96, d_model=256, n_heads=8, n_kv_heads=2,
                      d_ff=192, n_layers=2, max_seq_len=96)
    path = tmp_path / "m.gguf"
    write_synthetic_llama_gguf(str(path), cfg, GGMLType.Q4_0, seed=7)
    model, _ = load_llama(str(path), mode="quantized")
    assert "wo3" in model.params["layers"][0]

    toks = [3, 1, 4, 1, 5]
    eng = LlamaEngine(model, donate_cache=False)
    lf = eng.prefill(toks)
    t1, _ = eng.step(np.array([7]))
    seq1 = [int(t1[0])]
    for _ in range(5):
        t1, _ = eng.step(t1)
        seq1.append(int(t1[0]))

    monkeypatch.setenv("ZGML_TPU_ATTN_BLOCK", "0")
    eng2 = LlamaEngine(model, donate_cache=False)
    lg = eng2.prefill(toks)
    t2, _ = eng2.step(np.array([7]))
    seq2 = [int(t2[0])]
    for _ in range(5):
        t2, _ = eng2.step(t2)
        seq2.append(int(t2[0]))
    assert seq1 == seq2, (seq1, seq2)
    a, b = np.asarray(lf).ravel(), np.asarray(lg).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.999, cos


def test_engine_stacked_kv_decode_matches_unrolled(tmp_path, monkeypatch):
    """ZGML_TPU_KV_STACK=1: fused kernels read the stacked [L,...] cache via
    scalar-prefetch slab maps and the step batches all layers' K/V into TWO
    dynamic_update_slices — greedy tokens and logits must match the
    per-layer list-cache path exactly (same kernels, same arithmetic)."""
    from zgml_tpu.io.gguf import GGMLType
    from zgml_tpu.io.llama_loader import load_llama
    from zgml_tpu.runtime.engine import LlamaEngine
    from zgml_tpu.utils.synthetic import write_synthetic_llama_gguf
    cfg = LlamaConfig(vocab_size=96, d_model=256, n_heads=8, n_kv_heads=2,
                      d_ff=192, n_layers=2, max_seq_len=96)
    path = tmp_path / "m.gguf"
    write_synthetic_llama_gguf(str(path), cfg, GGMLType.Q4_0, seed=23)
    model, _ = load_llama(str(path), mode="quantized")

    toks = [3, 1, 4, 1, 5]

    def run(stack_env):
        monkeypatch.setenv("ZGML_TPU_KV_STACK", stack_env)
        eng = LlamaEngine(model, donate_cache=False)
        assert (getattr(eng.cache["k"], "ndim", 0) == 5) == (stack_env == "1")
        eng.prefill(toks)
        seq, logits = [], []
        t, l = eng.step(np.array([7]))
        for _ in range(5):
            seq.append(int(t[0]))
            logits.append(np.asarray(l).ravel())
            t, l = eng.step(t)
        return seq, logits

    seq_s, log_s = run("1")
    seq_u, log_u = run("0")
    assert seq_s == seq_u, (seq_s, seq_u)
    for a, b in zip(log_s, log_u):
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
        assert cos > 0.9999, cos


def test_ffn_q4n_matches_oracle():
    from zgml_tpu.ops.ffn import fused_ffn_norm_q4n
    from zgml_tpu.quant.headmajor import ffn_npack
    rng = np.random.default_rng(4)
    d, F = 512, 1024
    gate = quantize_weight(
        rng.standard_normal((F, d)).astype(np.float32) * 0.05, "q4_0",
        n_align=1)
    up = quantize_weight(
        rng.standard_normal((F, d)).astype(np.float32) * 0.05, "q4_0",
        n_align=1)
    wd = quantize_weight(
        rng.standard_normal((d, F)).astype(np.float32) * 0.05, "q4_0")
    gu = concat_packed([gate, up], part_pad=wd.k_pad)
    pack = ffn_npack(gu, wd)
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((1, 1, d)), jnp.float32)
    got = np.asarray(fused_ffn_norm_q4n(x, g, pack, d, 1e-5)).reshape(d)

    xn = np.asarray(x).reshape(d)
    xn_n = xn / np.sqrt((xn * xn).mean() + 1e-5) * np.asarray(g)
    gt = xn_n @ dequant_packed(gate).T
    ut = xn_n @ dequant_packed(up).T
    act = ut * (gt / (1 + np.exp(-gt)))
    want = xn + act @ dequant_packed(wd).T
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 2e-2, rel


def test_ffn_q4n_i8_matches_oracle(monkeypatch):
    """int8 gate/up phase (the ggml vec-dot tier; default-on at dp>=4096):
    same oracle, activation-quantization-noise tolerance. Round-5 device
    trace showed the f32 dequant VPU work as the FFN kernel's binding
    constraint at 7B (545 -> 674 GB/s with this phase)."""
    monkeypatch.setenv("ZGML_TPU_FFN_I8A", "1")
    from zgml_tpu.ops.ffn import fused_ffn_norm_q4n
    from zgml_tpu.quant.headmajor import ffn_npack
    rng = np.random.default_rng(11)
    d, F = 512, 1024
    gate = quantize_weight(
        rng.standard_normal((F, d)).astype(np.float32) * 0.05, "q4_0",
        n_align=1)
    up = quantize_weight(
        rng.standard_normal((F, d)).astype(np.float32) * 0.05, "q4_0",
        n_align=1)
    wd = quantize_weight(
        rng.standard_normal((d, F)).astype(np.float32) * 0.05, "q4_0")
    gu = concat_packed([gate, up], part_pad=wd.k_pad)
    pack = ffn_npack(gu, wd)
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d).astype(np.float32))
    for m in (1, 3):                      # decode + small serving batch
        x = jnp.asarray(rng.standard_normal((m, 1, d)), jnp.float32)
        got = np.asarray(fused_ffn_norm_q4n(x, g, pack, d, 1e-5))
        got = got.reshape(m, d)
        xn = np.asarray(x).reshape(m, d)
        xn_n = xn / np.sqrt((xn * xn).mean(-1, keepdims=True) + 1e-5) \
            * np.asarray(g)
        gt = xn_n @ dequant_packed(gate).T
        ut = xn_n @ dequant_packed(up).T
        act = ut * (gt / (1 + np.exp(-gt)))
        want = xn + act @ dequant_packed(wd).T
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 2e-2, (m, rel)


def test_engine_whole_layer_kernel_matches_unfused(tmp_path, monkeypatch):
    """Dims chosen so ffn_q4n attaches -> the WHOLE layer runs as one kernel;
    logits must match the unfused path to quantization-noise tolerance."""
    from zgml_tpu.io.gguf import GGMLType
    from zgml_tpu.io.llama_loader import load_llama
    from zgml_tpu.runtime.engine import LlamaEngine
    from zgml_tpu.utils.synthetic import write_synthetic_llama_gguf
    cfg = LlamaConfig(vocab_size=96, d_model=512, n_heads=8, n_kv_heads=2,
                      d_ff=1024, n_layers=2, max_seq_len=96)
    path = tmp_path / "m.gguf"
    write_synthetic_llama_gguf(str(path), cfg, GGMLType.Q4_0, seed=11)
    model, _ = load_llama(str(path), mode="quantized")
    assert "ffn_q4n" in model.params["layers"][0]

    toks = [3, 1, 4, 1, 5, 9]
    monkeypatch.setenv("ZGML_TPU_LAYER_FFN", "1")   # exercise the merge
    eng = LlamaEngine(model, donate_cache=False)
    eng.prefill(toks)
    _, l1 = eng.step(np.array([7]))
    _, l1b = eng.step(np.array([8]))

    monkeypatch.setenv("ZGML_TPU_LAYER_FFN", "0")
    monkeypatch.setenv("ZGML_TPU_ATTN_BLOCK", "0")
    eng2 = LlamaEngine(model, donate_cache=False)
    eng2.prefill(toks)
    _, l2 = eng2.step(np.array([7]))
    _, l2b = eng2.step(np.array([8]))
    for a, b in ((l1, l2), (l1b, l2b)):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
        assert cos > 0.999, cos


def test_engine_fused_int8_cache_matches_unfused(tmp_path, monkeypatch):
    """int8-KV decode through the fused layer kernel == the unfused int8
    path (same quantized cache discipline) to quantization tolerance."""
    from zgml_tpu.io.gguf import GGMLType
    from zgml_tpu.io.llama_loader import load_llama
    from zgml_tpu.runtime.engine import LlamaEngine
    from zgml_tpu.utils.synthetic import write_synthetic_llama_gguf
    cfg = LlamaConfig(vocab_size=96, d_model=256, n_heads=8, n_kv_heads=2,
                      d_ff=192, n_layers=2, max_seq_len=96)
    path = tmp_path / "m.gguf"
    write_synthetic_llama_gguf(str(path), cfg, GGMLType.Q4_0, seed=13)
    model, _ = load_llama(str(path), mode="quantized")

    toks = [3, 1, 4, 1, 5, 9]

    def logits_pair(env_val):
        monkeypatch.setenv("ZGML_TPU_ATTN_BLOCK", env_val)
        eng = LlamaEngine(model, cache_dtype="int8", donate_cache=False)
        eng.prefill(toks)
        _, l1 = eng.step(np.array([7]))
        _, l2 = eng.step(np.array([8]))
        return np.asarray(l1).ravel(), np.asarray(l2).ravel()

    f1, f2 = logits_pair("1")
    u1, u2 = logits_pair("0")
    for a, b in ((f1, u1), (f2, u2)):
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
        assert cos > 0.995, cos


def test_device_derivation_matches_host():
    """attach_head_major_jnp (on-device jnp bit-shuffles, the cold-start
    path) must produce byte-identical wo3/ffn_q4n views to the host numpy
    derivation."""
    from zgml_tpu.quant.headmajor import (attach_head_major,
                                          attach_head_major_jnp)
    rng = np.random.default_rng(7)
    d, hd, hq, hkv, F = 512, 64, 8, 4, 1024

    def qw(n, k, kind="q4_0"):
        return quantize_weight(
            rng.standard_normal((n, k)).astype(np.float32) * 0.05, kind,
            n_align=1)

    for kind in ("q4_0", "q8_0"):
        wq, wk, wv = (qw(hq * hd, d, kind), qw(hkv * hd, d, kind),
                      qw(hkv * hd, d, kind))
        wqkv = concat_packed([wq, wk, wv])
        wo = quantize_weight(
            rng.standard_normal((d, hq * hd)).astype(np.float32) * 0.05, kind)
        layer_np = {"wqkv": wqkv, "wo": wo}
        layer_dev = dict(layer_np)
        if kind == "q4_0":
            gate, up = qw(F, d), qw(F, d)
            wd = quantize_weight(
                rng.standard_normal((d, F)).astype(np.float32) * 0.05, kind)
            gu = concat_packed([gate, up], part_pad=wd.k_pad)
            layer_np.update(w_gate_up=gu, w_down=wd)
            layer_dev.update(w_gate_up=gu, w_down=wd)
        assert attach_head_major(layer_np, hq, hkv, hd)
        assert attach_head_major_jnp(layer_dev, hq, hkv, hd)
        np.testing.assert_array_equal(np.asarray(layer_dev["wo3"].qvals),
                                      np.asarray(layer_np["wo3"].qvals))
        np.testing.assert_array_equal(np.asarray(layer_dev["wo3"].scales),
                                      np.asarray(layer_np["wo3"].scales))
        for aux in ("kind", "heads", "hd", "k", "n"):
            assert getattr(layer_dev["wo3"], aux) == \
                getattr(layer_np["wo3"], aux)
        if kind == "q4_0":
            assert "ffn_q4n" in layer_np and "ffn_q4n" in layer_dev
            for key in layer_np["ffn_q4n"]:
                np.testing.assert_array_equal(
                    np.asarray(layer_dev["ffn_q4n"][key]),
                    np.asarray(layer_np["ffn_q4n"][key]), err_msg=key)
