"""Prompt-lookup (n-gram) decoding — the analogue of common/ngram-cache.cpp
+ examples/lookup: a draft-free speculative decoder whose proposals come
from matching the current n-gram suffix against the already-seen context.

Wraps the same verification machinery as SpeculativeEngine (greedy
acceptance is lossless)."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .engine import Engine


@dataclass
class LookupStats:
    n_rounds: int = 0
    n_drafted: int = 0
    n_accepted: int = 0

    @property
    def accept_rate(self) -> float:
        return self.n_accepted / self.n_drafted if self.n_drafted else 0.0


class NgramCache:
    """Maps n-gram tuples -> most recent continuation position (ref:
    common_ngram_cache_update)."""

    def __init__(self, n: int = 3):
        self.n = n
        self.index: dict[tuple, int] = {}

    def update(self, tokens: list[int], start: int = 0):
        n = self.n
        for i in range(max(start, n - 1), len(tokens) - 1):
            key = tuple(tokens[i - n + 1 : i + 1])
            self.index[key] = i + 1  # continuation starts here

    def propose(self, tokens: list[int], k: int) -> list[int]:
        if len(tokens) < self.n:
            return []
        key = tuple(tokens[-self.n :])
        pos = self.index.get(key)
        if pos is None:
            return []
        return tokens[pos : pos + k]


class LookupEngine:
    """Greedy prompt-lookup decoding over a target Engine (batch=1)."""

    def __init__(self, target: Engine, n_draft: int = 5, ngram: int = 3):
        assert target.batch == 1
        assert target.sampler_cfg.greedy, "lookup decoding implemented for greedy"
        self.t = target
        self.n_draft = n_draft
        self.cache_ngram = ngram
        self.stats = LookupStats()

    def generate(self, prompt_tokens: list[int], max_new_tokens: int = 128,
                 stop_ids: set[int] | None = None) -> list[int]:
        stop_ids = stop_ids or set()
        t = self.t
        K = self.n_draft
        cache = t.new_cache()
        sstate = t.new_sampler_state()
        tok, cache, sstate, n_past = t.prefill(prompt_tokens, cache, sstate)

        seq = list(prompt_tokens)
        ng = NgramCache(self.cache_ngram)
        ng.update(seq)
        out: list[int] = []
        verify = jax.jit(t.fwd_decode)

        while len(out) < max_new_tokens and tok not in stop_ids:
            out.append(tok)
            seq.append(tok)
            ng.update(seq, start=len(seq) - self.cache_ngram - 1)
            if len(out) >= max_new_tokens:
                break
            drafts = ng.propose(seq, K)
            if not drafts:
                tok2, cache, sstate = t.decode_step(tok, n_past, cache, sstate)
                n_past += 1
                tok = tok2
                continue
            Kd = len(drafts)
            block = [tok] + drafts
            pos = jnp.arange(n_past, n_past + Kd + 1, dtype=jnp.int32)[None]
            logits, cache = verify(
                t.model.params, jnp.asarray(block, jnp.int32)[None], pos, cache
            )
            t_toks = np.asarray(jnp.argmax(logits[0], axis=-1))
            n_acc = 0
            while n_acc < Kd and t_toks[n_acc] == drafts[n_acc]:
                n_acc += 1
            self.stats.n_rounds += 1
            self.stats.n_drafted += Kd
            self.stats.n_accepted += n_acc
            for a in drafts[:n_acc]:
                if len(out) >= max_new_tokens or a in stop_ids:
                    return out
                out.append(a)
                seq.append(a)
            ng.update(seq)
            n_past += n_acc + 1
            tok = int(t_toks[n_acc])
        return out
