"""Continuous batching serving engine.

A new capability over the reference (which is single-request, single-session —
SURVEY.md §2.7): decode requests share one fixed-shape batched decode step
(slots), join between steps after a per-slot prefill, and leave when finished.
Maps the BASELINE.json requirement "continuous batching of decode requests".

Design (slot model, v2):
  - `max_batch` slots, one compiled batched-decode plan with per-row positions
    (pos vector + per-row kv_len masking inside the kernels).
  - Admission is CHUNK-INTERLEAVED: each step() advances at most one
    prefill-chunk of one pending request between decode steps, so decoding
    slots never stall behind a long prompt (VERDICT 6).
  - Prefill writes DIRECTLY into the request's slot rows of the shared cache
    via the flash kernel's kv_row scalar-prefetch offset (zero staging cache,
    zero slab copies).
  - decode_burst(n): N decode steps in ONE device dispatch (lax.scan) when no
    admissions are pending — host syncs once per burst; stop-token overshoot
    is truncated on the host (the overshot KV is dead weight the slot's next
    occupant overwrites).
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


@dataclasses.dataclass
class _Prefill:
    """A request whose prompt is being prefilled chunk-by-chunk into its
    reserved slot (interleaved with decode steps)."""
    req: Request
    slot: int
    pos: int = 0                 # prompt tokens written so far


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
        self.requests: dict[int, Request] = {}   # rid -> request (registry)
        self._ids = itertools.count()
        self.key = jax.random.PRNGKey(0)

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _prefill_slot(params, tokens, cache, slot, pos, n_valid):
            """One prefill chunk written straight into slot `slot`'s rows of
            the shared cache (kv_row path — no staging, no slab copies)."""
            logits, cache = model.forward(params, tokens, cache, pos,
                                          cache_row=slot)
            return logits[:, n_valid - 1], cache

        dead_pos = self.cfg.max_seq_len - 1   # never-live dump position

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _decode(params, tokens, cache, pos_vec, active, key):
            # inactive/prefilling slots dump their garbage K/V write at the
            # dead last position so they can't clobber a mid-prefill row
            wpos = jnp.where(active, pos_vec, dead_pos)
            logits, cache = model.forward(params, tokens, cache, pos_vec,
                                          write_pos=wpos)
            tok = sample(logits[:, -1], self.sampling, key)
            return tok, cache

        @functools.partial(jax.jit, static_argnames=("n",),
                           donate_argnums=(2,))
        def _decode_burst(params, tok0, cache, pos_vec, active, key, n):
            def body(carry, _):
                tok, cache, pos, key = carry
                wpos = jnp.where(active, pos, dead_pos)
                logits, cache = model.forward(params, tok[:, None], cache,
                                              pos, write_pos=wpos)
                key, sub = jax.random.split(key)
                nxt = sample(logits[:, -1], self.sampling, sub)
                return (nxt, cache, pos + 1, key), nxt

            (tok, cache, pos, key), toks = jax.lax.scan(
                body, (tok0, cache, pos_vec, key), length=n)
            return toks, cache           # toks: [n, B]

        self._prefill_slot = _prefill_slot
        self._decode = _decode
        self._decode_burst = _decode_burst
        self.prefilling: deque = deque()   # _Prefill entries, FIFO

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
        self.requests[req.rid] = req
        return req.rid

    def _free_slot(self) -> int | None:
        for i, s in enumerate(self.slots):
            if s is None:
                return i
        return None

    def _admit(self):
        """Assign free slots to waiting requests (prefill happens chunkwise
        in _advance_prefill, interleaved with decode steps)."""
        reserved = {p.slot for p in self.prefilling}
        while self.waiting:
            slot = next((i for i, s in enumerate(self.slots)
                         if s is None and i not in reserved), None)
            if slot is None:
                return
            req = self.waiting.popleft()
            self.prefilling.append(_Prefill(req, slot))
            reserved.add(slot)

    def _advance_prefill(self, max_chunks: int = 1):
        """Advance pending prefills by up to `max_chunks` chunks total —
        the admission work done between two decode steps."""
        chunk = self.prefill_chunk
        for _ in range(max_chunks):
            if not self.prefilling:
                return
            p = self.prefilling[0]
            toks = np.asarray(p.req.prompt, np.int32)[None, p.pos:p.pos + chunk]
            n_valid = toks.shape[1]
            if n_valid < chunk:
                toks = np.pad(toks, ((0, 0), (0, chunk - n_valid)))
            with global_profile.phase("serve_prefill"):
                last, self.cache = self._prefill_slot(
                    self.model.params, jnp.asarray(toks), self.cache,
                    p.slot, p.pos, n_valid)
            p.pos += n_valid
            if p.pos >= len(p.req.prompt):        # prefill complete
                self.prefilling.popleft()
                self.key, sub = jax.random.split(self.key)
                first = sample(last, self.sampling, sub)
                p.req.output.append(int(first[0]))
                self.slots[p.slot] = p.req
                self.pos[p.slot] = p.pos
                self.last_tok[p.slot] = p.req.output[-1]
                self._maybe_finish(p.slot)

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
        """Admit + one prefill chunk + one batched decode step; returns
        (rid, token) emissions."""
        self._admit()
        self._advance_prefill()
        active = [i for i, s in enumerate(self.slots) if s is not None]
        if not active:
            return []
        self.key, sub = jax.random.split(self.key)
        with global_profile.phase("serve_decode"):
            mask = np.zeros(self.max_batch, bool)
            mask[active] = True
            tok, self.cache = self._decode(
                self.model.params,
                jnp.asarray(self.last_tok[:, None]),
                self.cache,
                jnp.asarray(self.pos, jnp.int32),
                jnp.asarray(mask),
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

    def step_burst(self, n: int) -> list[tuple[int, int]]:
        """Like step() but decodes `n` tokens in ONE device dispatch.

        Used when no admissions are pending: the host syncs once per burst
        instead of per token. Slots that hit a stop id or their token budget
        mid-burst get their overshoot truncated on the host (the garbage KV
        beyond their stop is never read again: the slot is freed and its next
        occupant prefills from position 0)."""
        self._admit()
        self._advance_prefill()
        if self.prefilling or self.waiting:
            return self.step()              # fall back to stepwise interleave
        active = [i for i, s in enumerate(self.slots) if s is not None]
        if not active:
            return []
        n = min(n, *(s.max_new_tokens - len(s.output)
                     for s in self.slots if s is not None),
                int(self.cfg.max_seq_len - 1 - max(self.pos[i]
                                                   for i in active)))
        if n < 1:
            return self.step()
        n = 1 << (n.bit_length() - 1)   # pow2 buckets: one compile per size
        self.key, sub = jax.random.split(self.key)
        with global_profile.phase("serve_decode"):
            mask = np.zeros(self.max_batch, bool)
            mask[active] = True
            toks, self.cache = self._decode_burst(
                self.model.params, jnp.asarray(self.last_tok), self.cache,
                jnp.asarray(self.pos, jnp.int32), jnp.asarray(mask), sub, n=n)
        toks_host = np.asarray(toks)        # [n, B]
        out = []
        for i in active:
            req = self.slots[i]
            for step_i in range(n):
                t = int(toks_host[step_i, i])
                req.output.append(t)
                self.pos[i] += 1
                self.last_tok[i] = t
                out.append((req.rid, t))
                if (len(req.output) >= req.max_new_tokens
                        or t in req.stop_ids):
                    break                   # truncate overshoot
            self._maybe_finish(i)
        global_profile.add("serve_decode_tokens", len(out))
        return out

    def run(self, requests: list[tuple[list[int], int]],
            burst: int = 1) -> dict[int, list[int]]:
        """Drain a list of (prompt, max_new_tokens); returns rid -> output.

        burst > 1 decodes that many tokens per dispatch once admissions have
        drained (multi-token emission; exact for greedy/sampled streams,
        stop-token overshoot is truncated)."""
        reqs = {self.submit(p, n): None for p, n in requests}
        results: dict[int, list[int]] = {}
        all_reqs: dict[int, Request] = {}
        pending = list(self.waiting)
        for r in pending:
            all_reqs[r.rid] = r
        while (self.waiting or self.prefilling
               or any(s is not None for s in self.slots)):
            if burst > 1:
                self.step_burst(burst)
            else:
                self.step()
        for rid, req in all_reqs.items():
            results[rid] = req.output
        return {rid: results[rid] for rid in reqs}
