"""Pipeline parallelism: llama layers sharded across a 'pp' mesh axis.

The stacked-layer pytree ([L, ...] leaves) shards naturally along its layer
axis: stage s owns layers [s*L/pp, (s+1)*L/pp) and their KV-cache slabs —
distributing parameter and cache MEMORY across the pipeline (the principal
reason to use PP). Activations hand off stage-to-stage via ppermute over ICI.

This is the M=1 (non-overlapped) schedule: every stage executes each cycle
under SPMD and selection keeps only the active stage's result, so wall-clock
equals sequential execution while memory is 1/pp per device. GPipe-style
microbatch overlap is a schedule change inside `fn`, not an API change.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zgml_tpu.models.llama import LlamaModel
from zgml_tpu.parallel.tp import shard_map


def pp_param_specs(params: dict) -> dict:
    """Shard every stacked layer leaf along its leading (layer) axis."""
    def leaf_spec(leaf):
        return P("pp")          # leading axis only; rest replicated
    specs = {
        "tok_embd": P(None, None),
        "out_norm": P(None),
        "layers": jax.tree.map(leaf_spec, params["layers"]),
    }
    if "lm_head" in params:
        specs["lm_head"] = jax.tree.map(lambda _: P(None, None),
                                        params["lm_head"])
    return specs


def make_pp_forward(model: LlamaModel, mesh: Mesh):
    """jit(shard_map) pipeline forward: (params, tokens, cache, pos) ->
    (logits, cache). Requires stacked layers with n_layers % pp == 0."""
    pp = mesh.shape["pp"]
    cfg = model.cfg
    if cfg.n_layers % pp:
        raise ValueError(f"n_layers={cfg.n_layers} not divisible by pp={pp}")
    pspecs = pp_param_specs(model.params)
    cache_spec = {"k": P("pp"), "v": P("pp")}

    from zgml_tpu.models.llama import _layer_step
    from zgml_tpu.ops import dispatch as ops
    from zgml_tpu.ops import refs

    def fn(params, tokens, cache, pos):
        stage = jax.lax.axis_index("pp")
        b, t = tokens.shape
        x = jnp.take(params["tok_embd"], tokens, axis=0)
        positions = pos + jnp.arange(t)
        cos, sin = refs.rope_cos_sin(positions, cfg.head_dim, cfg.rope_base)
        kv_len = pos + t
        decode = t == 1

        def local_scan(x_in, ck_all, cv_all):
            def body(x_c, layer_and_cache):
                layer, ck, cv = layer_and_cache
                x_o, ck, cv = _layer_step(cfg, x_c, layer, ck, cv, pos,
                                          kv_len, cos, sin, decode)
                return x_o, (ck, cv)
            return jax.lax.scan(body, x_in, (params["layers"], ck_all, cv_all))

        act = x
        ck, cv = cache["k"], cache["v"]
        perm = [(i, (i + 1) % pp) for i in range(pp)]
        for cyc in range(pp):                      # static pipeline cycles
            out, (ck_new, cv_new) = local_scan(act, ck, cv)
            active = stage == cyc
            ck = jnp.where(active, ck_new, ck)
            cv = jnp.where(active, cv_new, cv)
            act = jnp.where(active, out, act)
            act = jax.lax.ppermute(act, "pp", perm)
        # after pp hand-offs the final activation sits on stage 0; broadcast
        final = jax.lax.psum(jnp.where(stage == 0, act, jnp.zeros_like(act)),
                             "pp")
        h = ops.rmsnorm(final, params["out_norm"], cfg.rms_norm_eps)
        lm_head = params.get("lm_head")
        if lm_head is None:
            logits = jnp.einsum("btd,vd->btv", h.astype(jnp.float32),
                                params["tok_embd"].astype(jnp.float32))
        else:
            logits = ops.qmatmul(h, lm_head)
        return logits.astype(jnp.float32), {"k": ck, "v": cv}

    sm = shard_map(fn, mesh=mesh,
                   in_specs=(pspecs, P(None, None), cache_spec, P()),
                   out_specs=(P(None, None, None), cache_spec))
    return jax.jit(sm, donate_argnums=(2,))


def shard_pp_params(params: dict, mesh: Mesh) -> dict:
    specs = pp_param_specs(params)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params, specs)
