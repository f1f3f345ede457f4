"""Quantized KV cache tests: roundtrip accuracy, kernel conformance,
engine-level cosine similarity (ref: quantized-KV cosine >= 0.99 vs f32,
llama_inference.zig:911-954; roundtrip tolerances quant.zig:1259-1344)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zgml_tpu.quant.kv_cache import (dequantize_cache, init_quant_cache,
                                     quantize_columns, write_columns)
from zgml_tpu.ops.attention import decode_attention_q8_pallas
from zgml_tpu.ops import refs


def test_quantize_columns_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 5, 64)).astype(np.float32))
    q, s = quantize_columns(x)
    assert q.shape == (2, 3, 64, 5) and s.shape == (2, 3, 5)
    back = dequantize_cache(q, s)
    err = np.abs(np.asarray(back) - np.asarray(x))
    amax = np.abs(np.asarray(x)).max()
    assert err.max() < amax / 127 * 1.01


def test_write_columns_at_position():
    cache = init_quant_cache(1, 1, 2, 16, 32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 2, 3, 32)).astype(np.float32))
    q, s = quantize_columns(x)
    kq, ks = write_columns(cache["k_q"][0], cache["k_s"][0], q, s, 4)
    back = np.asarray(dequantize_cache(kq, ks))
    np.testing.assert_allclose(back[:, :, 4:7], np.asarray(x), atol=0.05,
                               rtol=0.02)
    assert np.all(back[:, :, :4] == 0)


@pytest.mark.parametrize("hq,hkv,kv_len,s", [
    (4, 4, 17, 128), (8, 2, 100, 128),
    # multi-block cases: kv_len spans several KV tiles (default bs=256), so the
    # online-softmax alpha-rescale across block boundaries is exercised
    (8, 2, 500, 512), (4, 4, 512, 1024),
])
def test_decode_q8_kernel_matches_oracle(hq, hkv, kv_len, s):
    rng = np.random.default_rng(2)
    b, d = 2, 64
    q = jnp.asarray(rng.standard_normal((b, hq, 1, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)).astype(np.float32))
    kq, ks = quantize_columns(k)
    vq, vs = quantize_columns(v)
    got = decode_attention_q8_pallas(q, kq, ks, vq, vs, kv_len)
    # oracle: same quantized values through the reference attention
    kf, vf = dequantize_cache(kq, ks), dequantize_cache(vq, vs)
    valid = (np.arange(s) < kv_len)[None, None, None, :]
    want = refs.gqa_attention_ref(q, kf, vf, jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_engine_int8_cache_cosine_vs_dense(tmp_path):
    from zgml_tpu.io.gguf import GGMLType
    from zgml_tpu.io.llama_loader import load_llama
    from zgml_tpu.runtime.engine import LlamaEngine
    from zgml_tpu.utils.synthetic import TINY_TEST, write_synthetic_llama_gguf
    path = tmp_path / "t.gguf"
    write_synthetic_llama_gguf(str(path), TINY_TEST, GGMLType.Q8_0, seed=5)
    model, _ = load_llama(str(path), mode="dense")
    toks = [3, 1, 4, 1, 5, 9, 2, 6]

    eng_f = LlamaEngine(model, donate_cache=False)
    lf = eng_f.prefill(toks)
    eng_q = LlamaEngine(model, cache_dtype="int8", donate_cache=False)
    lq = eng_q.prefill(toks)
    a, b = np.asarray(lf).ravel(), np.asarray(lq).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos >= 0.99, cos

    # decode steps agree too (greedy token path)
    tf, _ = eng_f.step(np.array([7]))
    tq, _ = eng_q.step(np.array([7]))
    s1, s2 = [int(tf[0])], [int(tq[0])]
    for _ in range(4):
        tf, _ = eng_f.step(tf)
        tq, _ = eng_q.step(tq)
        s1.append(int(tf[0]))
        s2.append(int(tq[0]))
    assert s1 == s2, (s1, s2)
