"""On-device decode loop and sampling tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zgml_tpu.io.llama_loader import load_llama
from zgml_tpu.runtime.engine import LlamaEngine
from zgml_tpu.runtime.sampling import SamplingParams, sample
from zgml_tpu.utils.synthetic import TINY_TEST, write_synthetic_llama_gguf
from zgml_tpu.io.gguf import GGMLType


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "t.gguf"
    write_synthetic_llama_gguf(str(path), TINY_TEST, GGMLType.Q8_0, seed=3)
    m, _ = load_llama(str(path), mode="dense")
    return m


def test_decode_n_matches_step_loop(model):
    """decode_n (one on-device scan) must produce the same tokens as the
    per-step host loop (greedy)."""
    eng1 = LlamaEngine(model, donate_cache=False)
    eng1.prefill([1, 2, 3])
    tok, _ = eng1.step(np.array([7]))
    seq = [int(tok[0])]
    for _ in range(5):
        tok, _ = eng1.step(tok)
        seq.append(int(tok[0]))

    eng2 = LlamaEngine(model, donate_cache=False)
    eng2.prefill([1, 2, 3])
    tok, _ = eng2.step(np.array([7]))
    toks = eng2.decode_n(tok, 5)
    seq2 = [int(tok[0])] + [int(t) for t in np.asarray(toks)[:, 0]]
    assert seq == seq2
    assert eng1.pos == eng2.pos


def test_sampling_modes():
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray([[1.0, 5.0, 2.0, 0.1]])
    assert int(sample(logits, SamplingParams(), key)[0]) == 1  # greedy
    t = sample(logits, SamplingParams(temperature=0.7, top_k=2), key)
    assert int(t[0]) in (1, 2)
    t = sample(logits, SamplingParams(temperature=0.5, top_p=0.5), key)
    assert int(t[0]) == 1  # top-p 0.5 keeps only the argmax here


def test_sampling_top_p_distribution():
    key = jax.random.PRNGKey(1)
    logits = jnp.tile(jnp.asarray([[3.0, 3.0, -10.0, -10.0]]), (256, 1))
    toks = np.asarray(sample(logits, SamplingParams(temperature=1.0, top_p=0.9),
                             key))
    assert set(np.unique(toks)) <= {0, 1}


def test_profile_program_census(model):
    """Static program profile (analog of profileProgram, profile.zig:72-167)."""
    from zgml_tpu.runtime.profile import profile_program
    import jax.numpy as jnp
    cache = model.init_cache(1)
    prof = profile_program(
        lambda t, c: model.forward(model.params, t, c, 0),
        jnp.zeros((1, 1), jnp.int32), cache)
    assert prof["n_eqns"] > 10
    assert prof["custom_calls"] >= model.cfg.n_layers  # pallas kernels visible
    assert prof["input_bytes"] > 0


def test_kernel_profile_rows(model):
    """ktime.profile_decode_kernels: every decode kernel appears with a
    nonzero time and the accounting reconciles (RuntimeProfile analog,
    ref profile.zig:820-910)."""
    from zgml_tpu.runtime.ktime import (profile_decode_kernels,
                                        render_kernel_profile)
    rows = profile_decode_kernels(model, kv_len=16, reps=3)
    names = {r["name"] for r in rows}
    assert "decode_attention" in names
    assert any(n.startswith("lm_head") for n in names)
    assert "full decode step" in names
    assert "unaccounted (dispatch+glue)" in names
    proj_rows = [r for r in rows if r["name"] in
                 ("wq", "wk", "wv", "wo", "wqkv", "w_gate_up", "w_gate",
                  "w_up", "w_down")]
    assert len(proj_rows) >= 3
    for r in rows:
        if r["name"] != "unaccounted (dispatch+glue)":
            assert r["us_call"] > 0, r
    assert "GB/s" in render_kernel_profile(rows)


def test_no_silent_fallback_placement(model):
    """Acceptance rule 3 as a CI assert: an engine decode must be served by
    the Pallas tier for its hot ops (not the jnp ref fallback)."""
    from zgml_tpu.runtime.profile import global_profile
    global_profile.reset()
    eng = LlamaEngine(model, batch=1)
    eng.prefill(np.arange(8, dtype=np.int32))
    eng.step(np.array([1]))
    tiers = global_profile.tier_summary()
    assert tiers.get("attention", {}).get("pallas", 0) >= 1, tiers
    assert tiers.get("decode_attention", {}).get("pallas", 0) >= 1, tiers
    assert "ref" not in tiers.get("attention", {}), tiers
    assert "ref" not in tiers.get("decode_attention", {}), tiers


def test_cache_layout_decision_table():
    """The ONE chooser (ARCHITECTURE.md decision table) resolves every
    (params layout, dtype, override, flag) combination predictably."""
    import jax.numpy as jnp
    from zgml_tpu.models.llama import (CacheLayout, LlamaConfig, LlamaModel,
                                       cache_layout_of, init_params)
    cfg = LlamaConfig(vocab_size=64, d_model=32, n_heads=2, n_kv_heads=1,
                      d_ff=64, n_layers=2, max_seq_len=16, tied_lm_head=True)
    scan = LlamaModel(cfg, init_params(cfg, seed=0))        # stacked dict
    unrolled = LlamaModel(cfg, dict(
        init_params(cfg, seed=0),
        layers=[{k: v[i] for k, v in init_params(cfg, 0)["layers"].items()}
                for i in range(2)]))

    # scan params -> stacked, regardless of the kv_stack flag
    assert scan.cache_layout() is CacheLayout.STACKED
    assert scan.cache_layout("int8") is CacheLayout.STACKED_INT8
    # unrolled params: flag decides bf16; int8 always the per-layer list
    assert unrolled.cache_layout("int8") is CacheLayout.UNROLLED_INT8
    assert unrolled.cache_layout(layout="unrolled") is CacheLayout.UNROLLED
    assert unrolled.cache_layout(layout="stacked") is CacheLayout.STACKED
    # the inspector inverts init_cache for every layout
    for m, dt, lay in ((scan, jnp.bfloat16, None),
                       (scan, "int8", None),
                       (unrolled, jnp.bfloat16, "unrolled"),
                       (unrolled, "int8", None)):
        c = m.init_cache(1, dt, layout=lay)
        assert cache_layout_of(c) is m.cache_layout(dt, lay)

    # incompatible pairs rejected with a clear error at forward entry
    import pytest
    toks = jnp.zeros((1, 1), jnp.int32)
    with pytest.raises(ValueError, match="unrolled"):
        scan.forward(scan.params, toks,
                     unrolled.init_cache(1, layout="unrolled"), 0)
    with pytest.raises(ValueError, match="scan-layout"):
        unrolled.forward(unrolled.params, toks, scan.init_cache(1, "int8"), 0)
