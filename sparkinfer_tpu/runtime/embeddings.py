"""Embedding extraction + pooling (ref: tools/server /embeddings +
examples/embedding; pooling modes mirror llama_pooling_type)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.transformer import make_forward
from .engine import bucket_len
from .kv_cache import init_cache


class Embedder:
    def __init__(self, model, max_seq: int = 512, pooling: str = "mean"):
        assert pooling in ("mean", "last", "cls", "none", "rank")
        self.model = model
        self.cfg = model.config
        self.max_seq = max_seq
        self.pooling = pooling
        self._fwd = jax.jit(make_forward(self.cfg, with_hidden=True))

    def embed_tokens(self, token_lists: list[list[int]], normalize: bool = True) -> np.ndarray:
        """Returns (len(token_lists), E) pooled embeddings."""
        out = []
        for ids in token_lists:
            n = len(ids)
            if n == 0:
                raise ValueError("empty input")
            if n > self.max_seq:
                ids = ids[: self.max_seq]
                n = self.max_seq
            Tpad = bucket_len(n)
            toks = np.zeros((1, Tpad), np.int32)
            toks[0, :n] = ids
            pos = np.arange(Tpad, dtype=np.int32)[None].copy()
            if getattr(self.cfg.traits, "non_causal", False):
                # bidirectional encoders (bert): padding slots carry
                # position -1 so every real token's attention excludes them
                pos[0, n:] = -1
            cache = init_cache(self.cfg, 1, max(Tpad, 8), jnp.float32)
            _, _, hidden = self._fwd(
                self.model.params, jnp.asarray(toks), jnp.asarray(pos), cache
            )
            h = np.asarray(hidden)[0, :n]  # (n, E)
            if self.pooling == "mean":
                v = h.mean(0)
            elif self.pooling == "last":
                v = h[-1]
            elif self.pooling == "cls":
                v = h[0]
            elif self.pooling == "rank":
                # classification head on the CLS position (ref build_pooling
                # LLAMA_POOLING_TYPE_RANK, llama-graph.cpp:2277-2303);
                # emits a 1-element score vector, never normalized
                p = self.model.params
                v = h[0]
                if "cls_w" in p:
                    v = np.asarray(p["cls_w"]) @ v
                    if "cls_b" in p:
                        v = v + np.asarray(p["cls_b"])
                    v = np.tanh(v)
                if "cls_out_w" in p:
                    v = np.asarray(p["cls_out_w"]) @ v
                    if "cls_out_b" in p:
                        v = v + np.asarray(p["cls_out_b"])
                out.append(np.atleast_1d(v)[:1])
                continue
            else:
                out.append(h)
                continue
            if normalize:
                v = v / max(np.linalg.norm(v), 1e-12)
            out.append(v)
        return np.stack(out) if self.pooling != "none" else out

    def rerank_scores(self, pairs: list[list[int]]) -> list[float]:
        """pairs: tokenized [bos]query[eos][sep]doc[eos] sequences ->
        one relevance score each (rank pooling)."""
        assert self.pooling == "rank"
        return [float(s[0]) for s in self.embed_tokens(pairs, normalize=False)]
