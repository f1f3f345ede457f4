"""Custom-VJP conformance: Pallas flash-attention gradients vs jax.grad of the
jnp oracle (interpret mode on CPU).

The reference cannot train attention at all (its backward panics,
src/tensor/backward.zig:393-404); here the Pallas kernel carries a
FlashAttention-2 backward, so training runs the kernel tier end-to-end.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zgml_tpu.ops import refs
from zgml_tpu.ops.attention import flash_attention_pallas


def _grads(fn, *args):
    return jax.grad(lambda *a: jnp.sum(jnp.sin(fn(*a))), argnums=(0, 1, 2))(*args)


@pytest.mark.parametrize("b,hq,hkv,tq,s,kv_len,q_off", [
    (1, 2, 2, 128, 128, 128, 0),      # MHA, full causal square
    (2, 4, 2, 128, 256, 200, 72),     # GQA n_rep=2, live prefix < S, offset
    (1, 4, 1, 64, 256, 96, 32),       # GQA n_rep=4, odd Tq (pad path)
])
def test_flash_vjp_matches_oracle(b, hq, hkv, tq, s, kv_len, q_off):
    d = 64
    n_rep = hq // hkv
    rng = np.random.default_rng(hash((b, hq, tq, s)) % 2**32)
    q = jnp.asarray(rng.standard_normal((b, hq, tq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)

    ki = np.arange(s)[None, :]
    qi = q_off + np.arange(tq)[:, None]
    mask = jnp.asarray((ki < kv_len) & (ki <= qi))

    def ref_fn(q, k, v):
        return refs.gqa_attention_ref(q, k, v, mask[None, None])

    def pallas_fn(q, k, v):
        return flash_attention_pallas(q, k, v, kv_len=kv_len, q_offset=q_off)

    got = _grads(pallas_fn, q, k, v)
    want = _grads(ref_fn, q, k, v)
    for name, a, bb in zip("dq dk dv".split(), got, want):
        a, bb = np.asarray(a), np.asarray(bb)
        scale = np.abs(bb).max() + 1e-9
        # bf16 MXU operands vs the f32 oracle: <= ~5e-3 now that the
        # backward recomputes scores with the forward's exact operand dtypes
        # (was 2e-2 when the recompute ran f32 against a bf16-derived LSE)
        np.testing.assert_allclose(a / scale, bb / scale, atol=8e-3,
                                   err_msg=name)


def test_flash_vjp_f32_gate_tight(monkeypatch):
    """ZGML_TPU_PREFILL_BF16=0 restores full-f32 numerics through the flash
    forward AND backward — gradients then match the oracle to f32 accumulation
    noise (the one-switch A/B the config contract promises)."""
    monkeypatch.setenv("ZGML_TPU_PREFILL_BF16", "0")
    b, hq, hkv, tq, s, kv_len, q_off, d = 1, 4, 2, 128, 256, 200, 72, 64
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((b, hq, tq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    ki = np.arange(s)[None, :]
    qi = q_off + np.arange(tq)[:, None]
    mask = jnp.asarray((ki < kv_len) & (ki <= qi))

    got = _grads(lambda q, k, v: flash_attention_pallas(
        q, k, v, kv_len=kv_len, q_offset=q_off), q, k, v)
    want = _grads(lambda q, k, v: refs.gqa_attention_ref(
        q, k, v, mask[None, None]), q, k, v)
    for name, a, bb in zip("dq dk dv".split(), got, want):
        a, bb = np.asarray(a), np.asarray(bb)
        scale = np.abs(bb).max() + 1e-9
        # dk/dv accumulate over 128 query rows (ordering differs from the
        # oracle's softmax-vjp), so f32 residue is ~4e-4; the bf16 path is
        # ~5e-3 — 1e-3 cleanly separates the two
        np.testing.assert_allclose(a / scale, bb / scale, atol=1e-3,
                                   err_msg=name)


@pytest.mark.parametrize("kind,k,n,m", [
    ("q8_0", 512, 384, 16),
    ("q4_0", 512, 384, 16),
    ("q4_0", 768, 256, 40),   # odd m (pad path), k not a multiple of 512
])
def test_qmatmul_vjp_matches_dequant(kind, k, n, m):
    """dx through the Pallas transposed-dequant backward == g @ dequant(W).

    The packed weight leaves are frozen (zero cotangent) — quantized weights
    are inference-side constants in the reference too (src/quant.zig:200-630
    has no backward for quantized mats)."""
    from zgml_tpu.quant.repack import quantize_weight, dequant_packed
    from zgml_tpu.ops.qmatmul import qmatmul_pallas

    rng = np.random.default_rng(hash((kind, k, n, m)) % 2**32)
    w = rng.standard_normal((n, k)).astype(np.float32)
    pw = quantize_weight(w, kind)
    wref = jnp.asarray(dequant_packed(pw))
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)

    dx = jax.grad(
        lambda x: jnp.sum(qmatmul_pallas(x, pw, out_dtype=jnp.float32) * g))(x)
    dx_ref = g @ wref
    scale = float(jnp.max(jnp.abs(dx_ref))) + 1e-9
    np.testing.assert_allclose(np.asarray(dx) / scale,
                               np.asarray(dx_ref) / scale, atol=1e-5)


def test_flash_vjp_value_matches_primal():
    """The custom_vjp fwd (LSE-saving kernel) must return the same output as
    the inference kernel."""
    b, hq, hkv, tq, s, d = 1, 4, 2, 128, 256, 64
    kv_len, q_off = 192, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, hq, tq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)

    primal = flash_attention_pallas(q, k, v, kv_len=kv_len, q_offset=q_off)
    via_vjp, _ = jax.vjp(
        lambda q, k, v: flash_attention_pallas(q, k, v, kv_len=kv_len,
                                               q_offset=q_off), q, k, v)
    np.testing.assert_allclose(np.asarray(via_vjp), np.asarray(primal),
                               rtol=1e-5, atol=1e-5)
