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
        assert pooling in ("mean", "last", "cls", "none")
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
            pos = np.arange(Tpad, dtype=np.int32)[None]
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
            else:
                out.append(h)
                continue
            if normalize:
                v = v / max(np.linalg.norm(v), 1e-12)
            out.append(v)
        return np.stack(out) if self.pooling != "none" else out
