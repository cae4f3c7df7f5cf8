"""Encoder-decoder generation runtime (T5 family).

The analogue of the reference's llama_encode + llama_decode split
(llama-context.cpp encode()/decode(); tools/main handles enc-dec models
by encoding the prompt then seeding the decoder with
llama_model_decoder_start_token, main.cpp).

TPU design: the encoder runs once per sequence (padded to a bucket), the
per-layer cross K/V are precomputed (models/t5.py precompute_cross_kv),
and the decode step is one jitted function over static shapes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..models.t5 import (init_dec_cache, make_t5_decoder, make_t5_encoder,
                         precompute_cross_kv)
from .engine import bucket_len
from .sampling import SamplerConfig, init_state, make_sampler


class Seq2SeqEngine:
    def __init__(self, model, max_seq: int = 512,
                 sampler: SamplerConfig | None = None, dtype=jnp.float32):
        self.model = model
        self.cfg = model.config
        assert self.cfg.traits.enc_dec, "Seq2SeqEngine needs a t5-family model"
        self.max_seq = max_seq
        self.sampler_cfg = sampler or SamplerConfig()
        self.sampler = make_sampler(self.sampler_cfg)
        self._enc = jax.jit(make_t5_encoder(self.cfg))
        self._dec = jax.jit(make_t5_decoder(self.cfg))
        self._dtype = dtype

    def encode(self, tokens: list[int]):
        """Run the encoder over a (bucket-padded) prompt; returns
        (enc_out, cross_k, cross_v, enc_valid)."""
        n = len(tokens)
        if n == 0:
            raise ValueError("empty encoder input")
        if n > self.max_seq:
            raise ValueError(f"encoder input {n} > max_seq {self.max_seq}")
        S = bucket_len(n)
        toks = np.zeros((1, S), np.int32)
        toks[0, :n] = tokens
        valid = np.zeros((1, S), bool)
        valid[0, :n] = True
        enc_out = self._enc(self.model.params, jnp.asarray(toks),
                            jnp.asarray(valid))
        ck, cv = precompute_cross_kv(self.model.params, enc_out, self.cfg)
        return enc_out, ck, cv, jnp.asarray(valid)

    def generate(self, tokens: list[int], max_new_tokens: int = 32,
                 eos_id: int | None = 1, seed: int = 0) -> list[int]:
        """Encode `tokens`, then autoregressively decode starting from
        decoder_start_token_id (ref llama_model_decoder_start_token)."""
        _, ck, cv, valid = self.encode(tokens)
        start = self.cfg.dec_start_token_id
        if start < 0:
            start = 0
        cache = init_dec_cache(self.cfg, 1, max(8, max_new_tokens + 1),
                               self._dtype)
        st = init_state(self.sampler_cfg, seed=seed)
        cur = start
        out: list[int] = []
        for t in range(max_new_tokens):
            logits, cache = self._dec(
                self.model.params, jnp.asarray([[cur]], jnp.int32),
                jnp.asarray([[t]], jnp.int32), cache, ck, cv, valid)
            tok_arr, st = self.sampler(logits[0, -1], st)
            tok = int(tok_arr)
            if eos_id is not None and tok == eos_id:
                break
            out.append(tok)
            cur = tok
        return out
