"""Tensor + data parallel execution of the Llama model via shard_map.

Megatron-style TP over the 'tp' mesh axis (the scaling-book recipe — pick a
mesh, annotate shardings, let collectives ride ICI):

  - wq/wk/wv, w_gate/w_up: column-sharded (out-features local) -> no comm
  - wo, w_down: row-sharded (in-features local) -> psum after the projection
  - KV cache: sharded over kv heads (each device owns its heads' cache slab —
    the multi-chip generalization of the reference's per-head cache slabs,
    llama_transformer.zig:216-219)
  - lm_head: vocab-sharded -> all_gather of logits
  - batch: sharded over 'dp'

Requires n_heads % tp == 0 and n_kv_heads % tp == 0 (standard TP constraint).

shard_map (not bare pjit) because the hot path calls Pallas kernels, which
partition manually, and because it makes every collective explicit and
overlappable by the XLA latency-hiding scheduler.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import inspect


def shard_map(f, *, mesh, in_specs, out_specs, check_rep=False):
    """Compat wrapper: jax.shard_map (check_vma) vs experimental (check_rep)."""
    try:
        sm = jax.shard_map
    except AttributeError:
        from jax.experimental.shard_map import shard_map as sm
    kw = ("check_vma" if "check_vma" in inspect.signature(sm).parameters
          else "check_rep")
    return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
              **{kw: check_rep})

from zgml_tpu.models.llama import LlamaConfig, LlamaModel
from zgml_tpu.quant.repack import PackedWeight

_COL_SHARDED = {"wq", "wk", "wv", "w_gate", "w_up"}   # out-features over tp
_ROW_SHARDED = {"wo", "w_down"}                       # in-features over tp


def llama_param_specs(params: dict) -> dict:
    """PartitionSpec pytree matching a LlamaModel params pytree."""
    layer_specs = {}
    for name, leaf in params["layers"].items():
        if name in _COL_SHARDED:
            spec = P(None, None, "tp")
        elif name in _ROW_SHARDED:
            spec = P(None, "tp", None)
        else:                       # norms: replicated
            spec = P(None, None)
        if isinstance(leaf, PackedWeight):
            # qvals and scales shard along the same (K or N) axis
            layer_specs[name] = jax.tree.map(lambda _: spec, leaf)
        else:
            layer_specs[name] = spec
    specs: dict[str, Any] = {
        "tok_embd": P(None, None),
        "out_norm": P(None),
        "layers": layer_specs,
    }
    if "lm_head" in params:
        lm = params["lm_head"]
        spec = P(None, "tp")
        specs["lm_head"] = jax.tree.map(lambda _: spec, lm) \
            if isinstance(lm, PackedWeight) else spec
    return specs


def cache_specs() -> dict:
    return {"k": P(None, "dp", "tp", None, None),
            "v": P(None, "dp", "tp", None, None)}


def shard_llama_params(params: dict, mesh: Mesh) -> dict:
    """device_put the params with their TP shardings (dense leaves only for
    PackedWeight-free trees; PackedWeight leaves use their specs as-is)."""
    specs = llama_param_specs(params)

    def put(leaf, spec):
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(put, params, specs)


def make_sharded_forward(model: LlamaModel, mesh: Mesh):
    """jit(shard_map(forward)): (params, tokens, cache, pos) -> (logits, cache).

    tokens [B, T] with B sharded over dp; logits [B, T, V] full-vocab per dp
    shard; cache sharded (dp, tp).
    """
    tp = mesh.shape["tp"]
    cfg = model.cfg
    if cfg.n_heads % tp or cfg.n_kv_heads % tp:
        raise ValueError(f"n_heads={cfg.n_heads}/n_kv_heads={cfg.n_kv_heads} "
                         f"not divisible by tp={tp}")
    pspecs = llama_param_specs(model.params)

    def fwd(params, tokens, cache, pos):
        return model.forward(params, tokens, cache, pos,
                             tp_axis="tp", tp_size=tp)

    sm = shard_map(fwd, mesh=mesh,
                   in_specs=(pspecs, P("dp", None), cache_specs(), P()),
                   out_specs=(P("dp", None, None), cache_specs()),
                   check_rep=False)
    return jax.jit(sm, donate_argnums=(2,))


def make_sharded_train_step(model: LlamaModel, mesh: Mesh, optimizer=None):
    """jit(shard_map(train_step)): full dp+tp training step.

    Next-token LM loss over a [B, T] batch; grads psum'ed over dp (and over tp
    for replicated leaves); SGD update by default. Runs the XLA (ref) op tier —
    training uses dense weights and jax.grad (the reference's missing attention
    backward, backward.zig:393-404, comes for free here).
    """
    from zgml_tpu.ops.dispatch import force_ref
    from zgml_tpu.optim.sgd import sgd_update

    tp = mesh.shape["tp"]
    cfg = model.cfg
    pspecs = llama_param_specs(model.params)

    def loss_fn(params, tokens, cache):
        with force_ref():
            logits, _ = model.forward(params, tokens[:, :-1], cache, 0,
                                      tp_axis="tp", tp_size=tp)
        targets = tokens[:, 1:]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
        return jnp.mean(nll)

    def step(params, tokens, cache, lr):
        # TP gradient exactness comes from the model's _tp_copy (Megatron 'f')
        # operators: replicated leaves get full identical grads on every tp
        # member, sharded leaves get exact local grads — only dp averaging here.
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens, cache)
        loss = jax.lax.pmean(loss, "dp")
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, "dp"), grads)
        new_params = sgd_update(params, grads, lr)
        return loss, new_params

    sm = shard_map(step, mesh=mesh,
                   in_specs=(pspecs, P("dp", None), cache_specs(), P()),
                   out_specs=(P(), pspecs),
                   check_rep=False)
    return jax.jit(sm)
