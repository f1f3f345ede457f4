"""Continuous batching serving engine.

A new capability over the reference (which is single-request, single-session —
SURVEY.md §2.7): decode requests share one fixed-shape batched decode step
(slots), join between steps after a per-slot prefill, and leave when finished.
Maps the BASELINE.json requirement "continuous batching of decode requests".

Design (slot model):
  - `max_batch` slots, one compiled batched-decode plan with per-row positions
    (pos vector + per-row kv_len masking inside the kernels).
  - New requests prefill through a shared batch-1 prefill plan writing into a
    staging cache, then their K/V slab is inserted into their slot (one DUS on
    the batch axis per layer).
  - Inactive slots keep pos=0 and their sampled tokens are ignored.
"""
from __future__ import annotations

import dataclasses
import functools
import itertools
from collections import deque
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from zgml_tpu.runtime.profile import global_profile
from zgml_tpu.runtime.sampling import SamplingParams, sample


@dataclasses.dataclass
class Request:
    prompt: list[int]
    max_new_tokens: int
    stop_ids: tuple[int, ...] = ()
    rid: int = -1
    output: list[int] = dataclasses.field(default_factory=list)
    done: bool = False


class ContinuousBatchingEngine:
    def __init__(self, model, max_batch: int = 8, prefill_chunk: int = 128,
                 cache_dtype=jnp.bfloat16,
                 sampling: SamplingParams = SamplingParams()):
        self.model = model
        self.cfg = model.cfg
        self.max_batch = max_batch
        self.sampling = sampling
        self.cache = model.init_cache(max_batch, cache_dtype)
        self.prefill_chunk = min(prefill_chunk, self.cfg.max_seq_len)
        self._staging_cache_dtype = cache_dtype
        self.pos = np.zeros(max_batch, np.int64)
        self.slots: list[Request | None] = [None] * max_batch
        self.last_tok = np.zeros(max_batch, np.int32)
        self.waiting: deque[Request] = deque()
        self._ids = itertools.count()
        self.key = jax.random.PRNGKey(0)

        @jax.jit
        def _prefill(params, tokens, cache, pos, n_valid):
            logits, cache = model.forward(params, tokens, cache, pos)
            return logits[:, n_valid - 1], cache

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _decode(params, tokens, cache, pos_vec, key):
            logits, cache = model.forward(params, tokens, cache, pos_vec)
            tok = sample(logits[:, -1], self.sampling, key)
            return tok, cache

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _insert_slot(cache, staging, slot):
            """Copy the staging (batch-1) cache into batch slot `slot`."""
            def ins(c, s):
                return jax.lax.dynamic_update_slice(
                    c, s.astype(c.dtype), (slot,) + (0,) * (c.ndim - 1))
            return jax.tree.map(ins, cache, staging)

        self._prefill = _prefill
        self._decode = _decode
        self._insert_slot = _insert_slot

    # -- public api ----------------------------------------------------------
    def submit(self, prompt, max_new_tokens: int,
               stop_ids: tuple[int, ...] = ()) -> int:
        prompt = list(prompt)
        # a prompt longer than the cache would silently clamp the DUS start
        # and corrupt the cache tail; reject like LlamaEngine.prefill
        # (ref: error.SequenceTooLong, llama_inference.zig:682)
        if len(prompt) + 1 > self.cfg.max_seq_len:
            raise ValueError(
                f"SequenceTooLong: prompt {len(prompt)} + 1 exceeds "
                f"max_seq_len {self.cfg.max_seq_len}")
        req = Request(prompt, max_new_tokens, stop_ids,
                      rid=next(self._ids))
        self.waiting.append(req)
        return req.rid

    def _free_slot(self) -> int | None:
        for i, s in enumerate(self.slots):
            if s is None:
                return i
        return None

    def _admit(self):
        """Prefill waiting requests into free slots (between decode steps)."""
        while self.waiting and (slot := self._free_slot()) is not None:
            req = self.waiting.popleft()
            staging = self.model.init_cache(1, self._staging_cache_dtype)
            toks = np.asarray(req.prompt, np.int32)[None, :]
            pos = 0
            chunk = self.prefill_chunk
            last = None
            with global_profile.phase("serve_prefill"):
                for i in range(0, toks.shape[1], chunk):
                    window = toks[:, i:i + chunk]
                    n_valid = window.shape[1]
                    if n_valid < chunk:
                        window = np.pad(window, ((0, 0), (0, chunk - n_valid)))
                    last, staging = self._prefill(
                        self.model.params, jnp.asarray(window), staging, pos,
                        n_valid)
                    pos += n_valid
            self.cache = self._insert_slot(self.cache, staging, slot)
            self.key, sub = jax.random.split(self.key)
            first = sample(last, self.sampling, sub)
            req.output.append(int(first[0]))
            self.slots[slot] = req
            self.pos[slot] = pos
            self.last_tok[slot] = req.output[-1]
            self._maybe_finish(slot)

    def _maybe_finish(self, slot: int):
        req = self.slots[slot]
        if req is None:
            return
        if (len(req.output) >= req.max_new_tokens
                or (req.output and req.output[-1] in req.stop_ids)
                or self.pos[slot] + 1 >= self.cfg.max_seq_len):
            req.done = True
            self.slots[slot] = None
            self.pos[slot] = 0

    def step(self) -> list[tuple[int, int]]:
        """Admit, run one batched decode step, return (rid, token) emissions."""
        self._admit()
        active = [i for i, s in enumerate(self.slots) if s is not None]
        if not active:
            return []
        self.key, sub = jax.random.split(self.key)
        with global_profile.phase("serve_decode"):
            tok, self.cache = self._decode(
                self.model.params,
                jnp.asarray(self.last_tok[:, None]),
                self.cache,
                jnp.asarray(self.pos, jnp.int32),
                sub)
        tok_host = np.asarray(tok)
        out = []
        for i in active:
            req = self.slots[i]
            t = int(tok_host[i])
            req.output.append(t)
            self.pos[i] += 1
            self.last_tok[i] = t
            out.append((req.rid, t))
            self._maybe_finish(i)
        global_profile.add("serve_decode_tokens", len(active))
        return out

    def run(self, requests: list[tuple[list[int], int]]) -> dict[int, list[int]]:
        """Drain a list of (prompt, max_new_tokens); returns rid -> output."""
        reqs = {self.submit(p, n): None for p, n in requests}
        results: dict[int, list[int]] = {}
        all_reqs: dict[int, Request] = {}
        pending = list(self.waiting)
        for r in pending:
            all_reqs[r.rid] = r
        while self.waiting or any(s is not None for s in self.slots):
            self.step()
        for rid, req in all_reqs.items():
            results[rid] = req.output
        return {rid: results[rid] for rid in reqs}
