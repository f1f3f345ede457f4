"""Conformance: the stacked all-layers decode megacall + stacked-cache prefill
vs the classic per-layer engine (interpret mode on CPU).

The stacked path is the round-3 decode redesign (one Pallas call per token for
the whole layer stack, ops/stackkernel.py); equivalence with the per-layer
path makes the megacall's phases — residual handoff in scratch, in-kernel
norms, per-layer K/V emission, single-update cache write — oracle-checked.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(autouse=True)
def _force_stack_decode(monkeypatch):
    # the megacall is default-OFF (measured slower than the per-layer fused
    # path at 7B, PARITY.md) — force it on so these conformance tests keep
    # exercising the kernel
    monkeypatch.setenv("ZGML_TPU_STACK_DECODE", "1")

from zgml_tpu.io.gguf import GGMLType
from zgml_tpu.io.llama_loader import load_llama
from zgml_tpu.models.llama import LlamaConfig
from zgml_tpu.runtime.engine import LlamaEngine
from zgml_tpu.utils import synthetic


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    # dims chosen so ffn_q4n attaches (d_ff pads to a 256-multiple, d=512)
    cfg = LlamaConfig(vocab_size=96, d_model=512, n_heads=8, n_kv_heads=2,
                      d_ff=768, n_layers=3, max_seq_len=128)
    path = tmp_path_factory.mktemp("stack") / "m.gguf"
    synthetic.write_synthetic_llama_gguf(str(path), cfg, GGMLType.Q4_0,
                                         seed=3)
    classic, _ = load_llama(str(path), mode="quantized")
    stacked, _ = load_llama(str(path), mode="quantized")
    assert stacked.enable_stacked_decode()
    return classic, stacked


def test_stacked_decode_matches_classic(models):
    classic, stacked = models
    e1 = LlamaEngine(classic)
    e2 = LlamaEngine(stacked)
    assert isinstance(e2.cache["k"], jax.Array)        # stacked cache layout
    prompt = [1, 5, 9, 2, 7]
    l1 = e1.prefill(prompt)
    l2 = e2.prefill(prompt)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=2e-4, atol=2e-4)
    tok = int(jnp.argmax(l1[0]))
    for _ in range(4):
        n1, lg1 = e1.step([tok])
        n2, lg2 = e2.step([tok])
        a, b = np.asarray(lg1), np.asarray(lg2)
        scale = np.abs(a).max() + 1e-9
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-3)
        tok = int(jnp.argmax(lg1[0]))


def test_stacked_decode_scan_matches_steps(models):
    """decode_n (lax.scan over the megacall) must equal sequential step()."""
    _, stacked = models
    e1 = LlamaEngine(stacked)
    e2 = LlamaEngine(stacked)
    prompt = [3, 1, 4]
    e1.prefill(prompt)
    e2.prefill(prompt)
    toks = np.asarray(e1.decode_n([7], 4))             # [4, 1]
    got = [7]
    for _ in range(4):
        nxt, _ = e2.step([got[-1]])
        got.append(int(nxt[0]))
    np.testing.assert_array_equal(toks[:, 0], got[1:])


def test_stacked_gate_falls_back(models, monkeypatch):
    """ZGML_TPU_STACK_DECODE=0 routes decode through the per-layer kernels
    over the stacked cache — outputs must still match."""
    _, stacked = models
    monkeypatch.setenv("ZGML_TPU_STACK_DECODE", "0")
    e = LlamaEngine(stacked)
    e.prefill([1, 5, 9])
    _, lg = e.step([2])
    monkeypatch.setenv("ZGML_TPU_STACK_DECODE", "1")
    e2 = LlamaEngine(stacked)
    e2.prefill([1, 5, 9])
    _, lg2 = e2.step([2])
    a, b = np.asarray(lg), np.asarray(lg2)
    scale = np.abs(a).max() + 1e-9
    # the fallback decodes through the bf16 prefill flash kernel while the
    # megacall keeps f32 score dots -> ~1.6% logit spread (numerics tier,
    # not a routing bug; megacall vs classic agrees to 5e-7)
    np.testing.assert_allclose(a / scale, b / scale, atol=3e-2)
