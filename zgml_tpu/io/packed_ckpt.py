"""Repacked-checkpoint format: PackedWeight params serialized to safetensors.

Loading a GGUF means dequant-aware parsing plus the TPU planar repack
(quant/repack.py) — host work that costs minutes at 7B on a small host. The
reference sidesteps this with mmap zero-copy of its native layout
(ref: src/gguf.zig mmap path); this is the analog for the TPU layout: the
ALREADY-REPACKED qvals/scales and the dense leaves go into one safetensors
file (+ config json in its metadata), and loading is an mmap + device_put —
seconds, not minutes. `bench.py` and serving deployments convert once and
reload fast forever after.
"""
from __future__ import annotations

import dataclasses
import json
import sys

import jax.numpy as jnp
import numpy as np

from zgml_tpu.io.safetensors import SafetensorsFile, save_safetensors
from zgml_tpu.models.llama import LlamaConfig, LlamaModel
from zgml_tpu.quant.repack import PackedWeight

_PW_AUX = ("kind", "n", "k", "n_pad", "k_pad")


def _flatten_params(params, prefix="", out=None, meta=None):
    out = {} if out is None else out
    meta = {} if meta is None else meta
    from zgml_tpu.ops.tapekernel import Tape
    from zgml_tpu.quant.headmajor import DERIVED_KEYS, HeadPacked
    if isinstance(params, HeadPacked) or \
            prefix.split(".")[-1] in DERIVED_KEYS:
        # derived views re-derive cheaply ON DEVICE at load (attach_derived);
        # persisting them would double the file AND the tunnel upload
        return out, meta
    if isinstance(params, Tape):
        # the decode tape is expensive to build (minutes of host transposes
        # at 7B) but cheap to mmap — persist it alongside the planar weights
        out[prefix + ".wtape"] = np.asarray(params.wtape)
        out[prefix + ".stape"] = np.asarray(params.stape)
        out[prefix + ".tg1"] = np.asarray(params.g1)
        out[prefix + ".tg2"] = np.asarray(params.g2)
        meta[prefix] = {"tape": list(params.dims)}
        return out, meta
    if isinstance(params, PackedWeight):
        out[prefix + ".qvals"] = np.asarray(params.qvals)
        out[prefix + ".scales"] = np.asarray(params.scales)
        meta[prefix] = {"packed": [getattr(params, f) for f in _PW_AUX]}
        return out, meta
    if isinstance(params, dict):
        for k, v in params.items():
            _flatten_params(v, f"{prefix}.{k}" if prefix else k, out, meta)
        return out, meta
    if isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            _flatten_params(v, f"{prefix}#{i}", out, meta)
        meta[prefix + "#len"] = len(params)
        return out, meta
    out[prefix] = np.asarray(params)
    return out, meta


def save_packed_llama(path: str, model: LlamaModel):
    """Serialize a (possibly quantized) llama model to one safetensors file."""
    tensors, meta = _flatten_params(model.params)
    save_safetensors(path, tensors, metadata={
        "zgml_config": json.dumps(dataclasses.asdict(model.cfg)),
        "zgml_tree": json.dumps(meta),
    })


def load_packed_llama(path: str, max_seq_len: int | None = None,
                      dtype=jnp.float32, derive: bool = True) -> LlamaModel:
    """mmap-load a repacked llama checkpoint (no dequant, no repack).

    derive=False skips the host-side derived-view attach; callers that
    device_put the params should follow with `model.attach_derived()` so the
    nibble shuffles run on the TPU instead of costing ~70s of host numpy at
    7B (the cold-start path: bench.py, serving)."""
    st = SafetensorsFile(path)
    cfg = LlamaConfig(**json.loads(st.metadata["zgml_config"]))
    if max_seq_len is not None:
        cfg = dataclasses.replace(cfg, max_seq_len=max_seq_len)
    tree = json.loads(st.metadata["zgml_tree"])

    names = list(st.keys())
    from zgml_tpu import config as _config
    if not _config.tape_decode():
        # a persisted decode tape is a full second copy of the weights AND its
        # mere presence flips init_cache to the stacked [L,...] layout that
        # bypasses the fused per-layer kernels (the round-3 regression, 62.4%
        # vs 82.9% of roofline) — skip it entirely unless opted in
        if "layers_tape" in tree:
            print("packed_ckpt: checkpoint carries a decode tape; skipping "
                  "it (set ZGML_TPU_TAPE_DECODE=1 to load it)",
                  file=sys.stderr)
        names = [n for n in names if not n.startswith("layers_tape.")]
        tree.pop("layers_tape", None)
    # files written by an interim round-4 build persisted the derived views;
    # they re-derive on device now (attach_derived) — never parse them
    from zgml_tpu.quant.headmajor import DERIVED_KEYS

    def _is_derived(name: str) -> bool:
        parts = name.split(".")
        return any(p in DERIVED_KEYS for p in parts)

    names = [n for n in names if not _is_derived(n)]
    tree = {k: v for k, v in tree.items() if not _is_derived(k)}

    def build(prefix):
        if (prefix in tree and isinstance(tree[prefix], dict)
                and "tape" in tree[prefix]):
            from zgml_tpu.ops.tapekernel import Tape
            return Tape(st.tensor(prefix + ".wtape"),
                        st.tensor(prefix + ".stape"),
                        jnp.asarray(st.tensor(prefix + ".tg1")),
                        jnp.asarray(st.tensor(prefix + ".tg2")),
                        tree[prefix]["tape"])
        if prefix in tree and isinstance(tree[prefix], dict):
            kind, n, k, n_pad, k_pad = tree[prefix]["packed"]
            # keep numpy (mmap zero-copy): head-major views derive on host,
            # and the caller's device_put uploads everything once
            scales = st.tensor(prefix + ".scales")
            if scales.dtype == np.float32 and _config.scale_f16():
                # legacy f32-scale checkpoint: compact to f16 bits before
                # upload (lossless for GGUF-sourced scales; ~10% less HBM
                # traffic + upload bytes — quant/repack.scales_store)
                from zgml_tpu.quant.repack import scales_store
                scales = scales_store(scales)
            return PackedWeight(kind, n, k, n_pad, k_pad,
                                st.tensor(prefix + ".qvals"), scales)
        if (prefix + "#len") in tree:
            return [build(f"{prefix}#{i}")
                    for i in range(tree[prefix + "#len"])]
        # dict node: children share the dotted prefix
        pre = prefix + "." if prefix else ""
        kids = set()
        for nm in names:
            if nm.startswith(pre):
                rest = nm[len(pre):]
                kids.add(rest.split(".")[0].split("#")[0])
        for key in list(tree):
            if key.startswith(pre) and key != prefix:
                rest = key[len(pre):]
                kids.add(rest.split(".")[0].split("#")[0])
        if not kids:
            arr = st.tensor(prefix)
            a = jnp.asarray(arr)
            return a.astype(dtype) if a.dtype == jnp.float32 else a
        return {k: build(pre + k) for k in sorted(kids)}

    params = build("")
    if not _config.tape_decode():
        params.pop("layers_tape", None)
    layers = params.get("layers")
    if derive and isinstance(layers, list):
        from zgml_tpu.ops.layerkernel import attn_block_enabled
        from zgml_tpu.quant.headmajor import attach_head_major
        if attn_block_enabled():
            for layer in layers:
                attach_head_major(layer, cfg.n_heads, cfg.n_kv_heads,
                                  cfg.head_dim)
    return LlamaModel(cfg, params)
