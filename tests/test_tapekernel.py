"""Conformance for the tape-streamed whole-stack decode megacall
(zgml_tpu/ops/tapekernel.py).

Two layers of checking:
  1. build_tape round-trip: dequantize every tape entry (weights x scales,
     per phase layout) and compare EXACTLY against the dequantized source
     weights — catches mis-indexed scale rows / column tiles, the failure
     class a tolerance test can absorb.
  2. Engine-level: tape decode vs the classic per-layer engine (interpret
     mode). The tape path quantizes activations per-32-block in-kernel
     (ggml vec-dot discipline) for EVERY projection, so logits agree to
     int8-activation numerics (cosine), not bitwise.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zgml_tpu.io.gguf import GGMLType
from zgml_tpu.io.llama_loader import load_llama
from zgml_tpu.models.llama import LlamaConfig
from zgml_tpu.ops.tapekernel import LANES, build_tape
from zgml_tpu.quant.blocks import QK
from zgml_tpu.runtime.engine import LlamaEngine
from zgml_tpu.utils import synthetic

CFG = LlamaConfig(vocab_size=96, d_model=1024, n_heads=16, n_kv_heads=4,
                  d_ff=1024, n_layers=2, max_seq_len=128)


@pytest.fixture(autouse=True)
def _opt_in_tape(monkeypatch):
    # tape decode is default-off (measured slower end-to-end, config.py) —
    # these tests exercise the megacall itself, so opt in explicitly
    monkeypatch.setenv("ZGML_TPU_TAPE_DECODE", "1")


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    path = tmp_path_factory.mktemp("tape") / "m.gguf"
    synthetic.write_synthetic_llama_gguf(str(path), CFG, GGMLType.Q4_0,
                                         seed=3)
    classic, _ = load_llama(str(path), mode="quantized")
    taped, _ = load_llama(str(path), mode="quantized")
    assert taped.enable_tape_decode()
    return classic, taped


def _deq_planar(qvals, scales):
    """Planar q4 [Kp/2, N] + scales [Kp/32, N] -> dense [Kp, N] f32."""
    v = np.asarray(qvals).astype(np.int32)
    kp2 = v.shape[0]
    lo = ((v & 15) - 8).astype(np.float32)
    hi = (((v >> 4) & 15) - 8).astype(np.float32)
    s = np.asarray(scales)
    slo = np.repeat(s[: kp2 // QK], QK, axis=0)
    shi = np.repeat(s[kp2 // QK:], QK, axis=0)
    return np.concatenate([lo * slo, hi * shi], axis=0)


def test_tape_roundtrip_exact(models):
    """Every tape entry dequantizes to exactly the source weight columns."""
    _, taped = models
    tape = taped.params["layers_tape"]
    (dp, n_qkv, fp, fp_pad, nAc, nC, nGU, nDN, nrow, dpg, EPL, L) = tape.dims
    R = dp // 2
    wt = np.asarray(tape.wtape).reshape(-1, R, LANES)
    st = np.asarray(tape.stape)

    def entry_deq(t):
        """Planar-style dequant of entry t: [2R values, LANES]."""
        v = wt[t].astype(np.int32)
        lo = ((v & 15) - 8).astype(np.float32)
        hi = (((v >> 4) & 15) - 8).astype(np.float32)
        slo = np.repeat(st[t, : R // QK], QK, axis=0)
        shi = np.repeat(st[t, R // QK:], QK, axis=0)
        return lo * slo, hi * shi

    for li, layer in enumerate(taped.params["layers"]):
        base = li * EPL
        wq = _deq_planar(layer["wqkv"].qvals, layer["wqkv"].scales)
        for c in range(nAc):
            lo, hi = entry_deq(base + c)
            want = wq[:, c * LANES:(c + 1) * LANES]
            np.testing.assert_array_equal(lo, want[:R])
            np.testing.assert_array_equal(hi, want[R:])
        base += nAc
        wo = _deq_planar(layer["wo"].qvals, layer["wo"].scales)
        for c in range(nC):
            lo, hi = entry_deq(base + c)
            want = wo[:, c * LANES:(c + 1) * LANES]
            np.testing.assert_array_equal(lo, want[:R])
            np.testing.assert_array_equal(hi, want[R:])
        base += nC
        pack = layer["ffn_q4n"]
        gu = np.asarray(pack["gu_q"]).astype(np.int32)
        gate = (((gu & 15) - 8).astype(np.float32)
                * np.repeat(np.asarray(pack["gs"]), QK, axis=0))
        up = ((((gu >> 4) & 15) - 8).astype(np.float32)
              * np.repeat(np.asarray(pack["us"]), QK, axis=0))
        for c in range(nGU):
            for half in range(2):
                lo, hi = entry_deq(base + 2 * c + half)
                rows = slice(half * R, (half + 1) * R)
                cols = slice(c * LANES, (c + 1) * LANES)
                np.testing.assert_array_equal(lo, gate[rows, cols])
                np.testing.assert_array_equal(hi, up[rows, cols])
        base += 2 * nGU
        dn = np.asarray(pack["dn_q"]).astype(np.int32)
        ds = np.repeat(np.asarray(pack["ds"]), QK, axis=0)     # [fp, dp]
        d_lo = ((dn & 15) - 8).astype(np.float32) * ds[:, : dp // 2]
        d_hi = (((dn >> 4) & 15) - 8).astype(np.float32) * ds[:, dp // 2:]
        for g in range(dpg):
            cols = slice(g * LANES, (g + 1) * LANES)
            for r in range(nrow):
                lo, hi = entry_deq(base + g * nrow + r)
                rows = slice(r * R, min((r + 1) * R, fp))
                n = rows.stop - rows.start
                np.testing.assert_array_equal(lo[:n], d_lo[rows, cols])
                np.testing.assert_array_equal(hi[:n], d_hi[rows, cols])
                assert not lo[n:].any() and not hi[n:].any()


def test_tape_decode_matches_classic(models):
    classic, taped = models
    e1 = LlamaEngine(classic)
    e2 = LlamaEngine(taped)
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
        a, b = np.asarray(lg1).ravel(), np.asarray(lg2).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
        # every projection re-quantizes its activations to int8 in-kernel;
        # at tiny synthetic scale that is ~0.5-3% logit spread (numerics
        # tier, matches the qmatmul int8-dot gates) — rank must agree
        assert cos > 0.998, cos
        assert a.argmax() == b.argmax()
        tok = int(jnp.argmax(lg1[0]))


def test_tape_decode_scan_matches_steps(models):
    """decode_n (lax.scan over the megacall) must equal sequential step()."""
    _, taped = models
    e1 = LlamaEngine(taped)
    e2 = LlamaEngine(taped)
    prompt = [3, 1, 4]
    e1.prefill(prompt)
    e2.prefill(prompt)
    toks = np.asarray(e1.decode_n([7], 4))             # [4, 1]
    got = [7]
    for _ in range(4):
        nxt, _ = e2.step([got[-1]])
        got.append(int(nxt[0]))
    np.testing.assert_array_equal(toks[:, 0], got[1:])


def test_tape_gate_falls_back(models, monkeypatch):
    """ZGML_TPU_TAPE_DECODE=0 routes decode through the per-layer kernels
    over the stacked cache — outputs must still rank-agree."""
    _, taped = models
    monkeypatch.setenv("ZGML_TPU_TAPE_DECODE", "0")
    e = LlamaEngine(taped)
    e.prefill([1, 5, 9])
    _, lg = e.step([2])
    monkeypatch.setenv("ZGML_TPU_TAPE_DECODE", "1")
    e2 = LlamaEngine(taped)
    e2.prefill([1, 5, 9])
    _, lg2 = e2.step([2])
    a, b = np.asarray(lg).ravel(), np.asarray(lg2).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.998, cos


def test_tape_incompatible_dims():
    """d_model not LANES-aligned -> build_tape declines (no tape views)."""
    cfg = LlamaConfig(vocab_size=64, d_model=512, n_heads=8, n_kv_heads=2,
                      d_ff=768, n_layers=1, max_seq_len=64)
    import tempfile
    import os
    path = os.path.join(tempfile.mkdtemp(), "m.gguf")
    synthetic.write_synthetic_llama_gguf(path, cfg, GGMLType.Q4_0, seed=0)
    m, _ = load_llama(path, mode="quantized")
    assert build_tape(m.params, m.cfg) is None
    assert not m.enable_tape_decode()
