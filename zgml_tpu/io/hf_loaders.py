"""HuggingFace safetensors -> model params (ref: src/models/llama_loader.zig,
gpt_loader.zig, loader_utils.zig).

Name maps follow the HF conventions; weights transpose from HF's [out, in]
row-major to this framework's K-major [in, out] (the reference does the same
transpose, llama_loader.zig). GPT-2's separate c_attn already packs QKV; llama's
separate q/k/v projections are concatenated into the fused wqkv layout.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from zgml_tpu.io.safetensors import SafetensorsFile
from zgml_tpu.models.gpt import GPTConfig, GPTModel
from zgml_tpu.models.llama import LlamaConfig, LlamaModel


def _t(arr) -> jnp.ndarray:
    """HF [out, in] -> K-major [in, out]."""
    return jnp.asarray(np.ascontiguousarray(np.asarray(arr, np.float32).T))


def load_llama_hf(path: str, cfg: LlamaConfig, fuse: bool = True,
                  prefix: str = "model.") -> LlamaModel:
    """Load a llama-family HF safetensors file. cfg must match the checkpoint
    (HF config.json is not parsed here — zero-egress environment)."""
    st = SafetensorsFile(path)

    def get(name):
        return st.tensor(prefix + name)

    layers = []
    for i in range(cfg.n_layers):
        p = f"layers.{i}."
        layer = {
            "attn_norm": jnp.asarray(get(p + "input_layernorm.weight"),
                                     jnp.float32),
            "ffn_norm": jnp.asarray(get(p + "post_attention_layernorm.weight"),
                                    jnp.float32),
        }
        wq = _t(get(p + "self_attn.q_proj.weight"))
        wk = _t(get(p + "self_attn.k_proj.weight"))
        wv = _t(get(p + "self_attn.v_proj.weight"))
        if fuse:
            layer["wqkv"] = jnp.concatenate([wq, wk, wv], axis=1)
        else:
            layer.update(wq=wq, wk=wk, wv=wv)
        layer["wo"] = _t(get(p + "self_attn.o_proj.weight"))
        wg = _t(get(p + "mlp.gate_proj.weight"))
        wu = _t(get(p + "mlp.up_proj.weight"))
        if fuse:
            layer["w_gate_up"] = jnp.concatenate([wg, wu], axis=1)
        else:
            layer.update(w_gate=wg, w_up=wu)
        layer["w_down"] = _t(get(p + "mlp.down_proj.weight"))
        layers.append(layer)

    params = {
        "tok_embd": jnp.asarray(get("embed_tokens.weight"), jnp.float32),
        "out_norm": jnp.asarray(get("norm.weight"), jnp.float32),
        "layers": layers,
    }
    if not cfg.tied_lm_head:
        params["lm_head"] = _t(st.tensor("lm_head.weight"))
    st.close()
    return LlamaModel(cfg, params)


def load_gpt2_hf(path: str, cfg: GPTConfig, prefix: str = "") -> GPTModel:
    """GPT-2 HF safetensors. Note: HF GPT-2 Conv1D stores c_attn/c_fc weights
    already as [in, out] (not transposed)."""
    st = SafetensorsFile(path)

    def get(name):
        return st.tensor(prefix + name)

    layers = []
    for i in range(cfg.n_layers):
        p = f"h.{i}."
        layers.append({
            "ln_1": {"g": jnp.asarray(get(p + "ln_1.weight"), jnp.float32),
                     "b": jnp.asarray(get(p + "ln_1.bias"), jnp.float32)},
            "ln_2": {"g": jnp.asarray(get(p + "ln_2.weight"), jnp.float32),
                     "b": jnp.asarray(get(p + "ln_2.bias"), jnp.float32)},
            "w_qkv": jnp.asarray(get(p + "attn.c_attn.weight"), jnp.float32),
            "b_qkv": jnp.asarray(get(p + "attn.c_attn.bias"), jnp.float32),
            "wo": jnp.asarray(get(p + "attn.c_proj.weight"), jnp.float32),
            "bo": jnp.asarray(get(p + "attn.c_proj.bias"), jnp.float32),
            "w_fc": jnp.asarray(get(p + "mlp.c_fc.weight"), jnp.float32),
            "b_fc": jnp.asarray(get(p + "mlp.c_fc.bias"), jnp.float32),
            "w_proj": jnp.asarray(get(p + "mlp.c_proj.weight"), jnp.float32),
            "b_proj": jnp.asarray(get(p + "mlp.c_proj.bias"), jnp.float32),
        })
    params = {
        "wte": jnp.asarray(get("wte.weight"), jnp.float32),
        "wpe": jnp.asarray(get("wpe.weight"), jnp.float32),
        "ln_f": {"g": jnp.asarray(get("ln_f.weight"), jnp.float32),
                 "b": jnp.asarray(get("ln_f.bias"), jnp.float32)},
        "layers": layers,
    }
    st.close()
    return GPTModel(cfg, params)
