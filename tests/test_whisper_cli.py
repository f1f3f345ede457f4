"""Whisper model smoke + CLI tests."""
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from zgml_tpu.models.whisper import WhisperConfig, WhisperModel, init_params


CFG = WhisperConfig(n_mels=16, n_audio_ctx=32, n_audio_state=32,
                    n_audio_heads=4, n_audio_layers=2, vocab_size=64,
                    n_text_ctx=16, n_text_state=32, n_text_heads=4,
                    n_text_layers=2)


def test_whisper_encode_decode_shapes():
    model = WhisperModel(CFG, init_params(CFG, seed=0))
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 32, 16)).astype(np.float32))
    enc = model.encode_features(mel)
    assert enc.shape == (1, 16, 32)          # stride-2 conv halves T
    logits = model.decode(jnp.asarray([[1, 2, 3]], jnp.int32), enc)
    assert logits.shape == (1, 3, 64)
    assert np.isfinite(np.asarray(logits)).all()


def test_whisper_transcribe_greedy_deterministic():
    model = WhisperModel(CFG, init_params(CFG, seed=1))
    mel = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 32, 16)).astype(np.float32))
    a = model.transcribe_greedy(mel, bos=1, eos=2, max_tokens=6)
    b = model.transcribe_greedy(mel, bos=1, eos=2, max_tokens=6)
    assert a == b and a[0] == 1


def test_whisper_causality():
    """Decoder token t must not depend on future tokens."""
    model = WhisperModel(CFG, init_params(CFG, seed=2))
    mel = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 32, 16)).astype(np.float32))
    enc = model.encode_features(mel)
    l1 = model.decode(jnp.asarray([[1, 2, 3]], jnp.int32), enc)
    l2 = model.decode(jnp.asarray([[1, 2, 9]], jnp.int32), enc)
    np.testing.assert_allclose(np.asarray(l1[0, :2]), np.asarray(l2[0, :2]),
                               rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    from zgml_tpu.io.gguf import GGMLType
    from zgml_tpu.utils.synthetic import TINY_TEST, write_synthetic_llama_gguf
    path = tmp_path_factory.mktemp("cli") / "t.gguf"
    write_synthetic_llama_gguf(str(path), TINY_TEST, GGMLType.Q4_0, seed=0)
    return str(path)


def test_cli_inspect(tiny_gguf, capsys):
    from zgml_tpu.utils.cli import main
    main(["inspect", tiny_gguf])
    out = capsys.readouterr().out
    assert "architecture: llama" in out
    assert "Q4_0" in out
    assert "params:" in out


def test_cli_generate(tiny_gguf, capsys):
    from zgml_tpu.utils.cli import main
    main(["generate", tiny_gguf, "--prompt-ids", "1,2,3", "-n", "4",
          "--mode", "dense"])
    out = capsys.readouterr().out
    assert "output ids:" in out
