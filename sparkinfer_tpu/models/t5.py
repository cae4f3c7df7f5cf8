"""T5 encoder-decoder family (ref: src/models/t5-enc.cpp, t5-dec.cpp;
tensor names src/llama-arch.cpp LLM_ARCH_T5/T5ENCODER; hparams
llama-model.cpp:1772-1780 — decoder_block_count, relative_buckets_count,
decoder_start_token_id).

Semantics (verified against the reference graphs + HF T5):
  - RMS pre-norm everywhere, no biases.
  - Attention is UNSCALED (build_attn scale=1.0, not 1/sqrt(d)).
  - Relative-position-bucket bias: layer 0 of the encoder and of the
    decoder carry a (n_buckets, n_head) bias table shared by ALL layers
    of that stack (t5-dec.cpp:52 falls back to layers[0].attn_rel_b).
    Encoder buckets are bidirectional, decoder causal.
  - Cross-attention reads the encoder output; no positional bias.
  - FFN: relu (v1.0) or gated-gelu when ffn_gate exists (flan/v1.1,
    t5-dec.cpp LLM_FFN_GELU/LLM_FFN_PAR).
  - Tied lm_head is scaled by d_model^-0.5 (HF T5 tie_word_embeddings).

TPU design: one lax.scan per stack over stacked layer dicts; cross K/V
are precomputed ONCE per sequence after encoding (the reference
recomputes them per decode graph) so each decode step touches only the
latent cache and the per-step self-attention write.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import rms_norm

NEG_INF = -1e30


def rel_pos_bucket(rel: jnp.ndarray, bidirectional: bool, num_buckets: int,
                   max_dist: int) -> jnp.ndarray:
    """HF T5Attention._relative_position_bucket, jnp; rel = key - query."""
    n = num_buckets
    if bidirectional:
        n = n // 2
        ret = jnp.where(rel > 0, n, 0)
        rel = jnp.abs(rel)
    else:
        ret = jnp.zeros_like(rel)
        rel = -jnp.minimum(rel, 0)
    max_exact = n // 2
    is_small = rel < max_exact
    relf = jnp.maximum(rel.astype(jnp.float32), 1.0)
    val_large = max_exact + (
        jnp.log(relf / max_exact) / math.log(max_dist / max_exact)
        * (n - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, n - 1)
    return ret + jnp.where(is_small, rel, val_large)


def _pos_bias(rel_b: jnp.ndarray, q_pos: jnp.ndarray, k_pos: jnp.ndarray,
              bidirectional: bool, num_buckets: int, max_dist: int):
    """rel_b (n_buckets, H); q_pos (B,T), k_pos (S,) -> bias (B,H,T,S)."""
    rel = k_pos[None, None, :] - q_pos[:, :, None]  # (B,T,S)
    bkt = rel_pos_bucket(rel, bidirectional, num_buckets, max_dist)
    return jnp.transpose(rel_b[bkt], (0, 3, 1, 2)).astype(jnp.float32)


def _attn(q, k, v, bias, mask):
    """q (B,T,H,D), k/v (B,S,H,D), bias (B,H,T,S)|None, mask (B,T,S)|None.
    T5 attention: scale 1.0 (ref t5-dec.cpp build_attn(..., 1.0f, il))."""
    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias
    if mask is not None:
        scores = jnp.where(mask[:, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v)


def _ffn(lp, x, eps):
    h = rms_norm(x, lp["ffn_norm_w"], eps)
    up = h @ lp["w_up"]
    if "w_gate" in lp:
        hid = jax.nn.gelu(
            (h @ lp["w_gate"]).astype(jnp.float32), approximate=True
        ).astype(up.dtype) * up
    else:
        hid = jnp.maximum(up, 0)
    return x + hid @ lp["w_down"]


def make_t5_encoder(cfg):
    """(params, tokens (B,S) int32, valid (B,S) bool) -> enc hidden (B,S,E).
    Bidirectional self-attention with the shared relative bias."""
    H, D, eps = cfg.n_head, cfg.head_dim, cfg.norm_eps
    nb, md = cfg.n_rel_attn_bkts, cfg.rel_attn_max_dist

    def enc(params, tokens, valid):
        x = params["tok_embd"][tokens]
        B, S, _ = x.shape
        pos = jnp.arange(S, dtype=jnp.int32)
        bias = _pos_bias(params["enc_rel_b"], jnp.broadcast_to(pos, (B, S)),
                         pos, True, nb, md)
        mask = jnp.broadcast_to(valid[:, None, :], (B, S, S))

        def body(x, lp):
            h = rms_norm(x, lp["attn_norm_w"], eps)
            q = (h @ lp["wq"]).reshape(B, S, H, D)
            k = (h @ lp["wk"]).reshape(B, S, H, D)
            v = (h @ lp["wv"]).reshape(B, S, H, D)
            o = _attn(q, k, v, bias, mask).reshape(B, S, H * D)
            x = x + o @ lp["wo"]
            return _ffn(lp, x, eps), None

        x, _ = jax.lax.scan(body, x, params["enc_layers"])
        return rms_norm(x, params["enc_output_norm_w"], eps)

    return enc


def precompute_cross_kv(params, enc_out, cfg):
    """Per-layer cross-attention K/V from the encoder output, computed
    once per sequence: (L, B, S, H, D) each."""
    H, D = cfg.n_head, cfg.head_dim
    B, S, _ = enc_out.shape

    def per_layer(lp):
        k = (enc_out @ lp["cross_wk"]).reshape(B, S, H, D)
        v = (enc_out @ lp["cross_wv"]).reshape(B, S, H, D)
        return k, v

    return jax.vmap(per_layer)(params["dec_layers"])


def make_t5_decoder(cfg):
    """(params, tokens (B,T), positions (B,T), cache (k,v),
        cross_k/cross_v (L,B,Senc,H,D), enc_valid (B,Senc))
       -> (logits f32 (B,T,V), new cache).

    cache: (k, v) each (L, B, Smax, H, D); self-attn keys are written at
    their absolute positions (slot index == position)."""
    H, D, eps = cfg.n_head, cfg.head_dim, cfg.norm_eps
    nb, md = cfg.n_rel_attn_bkts, cfg.rel_attn_max_dist

    def dec(params, tokens, positions, cache, cross_k, cross_v, enc_valid):
        x = params["tok_embd"][tokens]
        B, T, _ = x.shape
        kc_all, vc_all = cache
        Smax = kc_all.shape[2]
        s_idx = jnp.arange(Smax, dtype=jnp.int32)
        bias = _pos_bias(params["dec_rel_b"], positions, s_idx, False, nb, md)
        self_mask = jnp.broadcast_to(
            s_idx[None, None, :] <= positions[:, :, None], (B, T, Smax))
        cross_mask = jnp.broadcast_to(
            enc_valid[:, None, :], (B, T, enc_valid.shape[1]))
        bidx = jnp.arange(B, dtype=jnp.int32)

        def body(x, t):
            lp, kc, vc, ck, cv = t
            h = rms_norm(x, lp["attn_norm_w"], eps)
            q = (h @ lp["wq"]).reshape(B, T, H, D)
            k = (h @ lp["wk"]).reshape(B, T, H, D)
            v = (h @ lp["wv"]).reshape(B, T, H, D)
            kc = kc.at[bidx[:, None], positions].set(k)
            vc = vc.at[bidx[:, None], positions].set(v)
            o = _attn(q, kc.astype(q.dtype), vc.astype(q.dtype), bias,
                      self_mask).reshape(B, T, H * D)
            x = x + o @ lp["wo"]
            # cross-attention: no positional bias (t5-dec.cpp:85)
            h2 = rms_norm(x, lp["cross_attn_norm_w"], eps)
            q2 = (h2 @ lp["cross_wq"]).reshape(B, T, H, D)
            o2 = _attn(q2, ck.astype(q2.dtype), cv.astype(q2.dtype), None,
                       cross_mask).reshape(B, T, H * D)
            x = x + o2 @ lp["cross_wo"]
            return _ffn(lp, x, eps), (kc, vc)

        xs = (params["dec_layers"], kc_all, vc_all, cross_k, cross_v)
        x, (k_new, v_new) = jax.lax.scan(body, x, xs)
        x = rms_norm(x, params["dec_output_norm_w"], eps)
        logits = jnp.einsum("bte,ev->btv", x, params["output"],
                            preferred_element_type=jnp.float32)
        return logits, (k_new, v_new)

    return dec


def init_dec_cache(cfg, batch: int, max_seq: int, dtype=jnp.bfloat16):
    L, H, D = cfg.dec_n_layer or cfg.n_layer, cfg.n_head, cfg.head_dim
    z = jnp.zeros((L, batch, max_seq, H, D), dtype)
    return (z, z)


def load_t5(r, cfg, dtype):
    """GGUF -> stacked T5 params (ref tensor names: llama-arch.cpp
    LLM_ARCH_T5). t5encoder GGUFs carry only the enc.* half."""
    from .loader import _as_jnp, _get, _linear

    E, H, D, F = cfg.n_embd, cfg.n_head, cfg.head_dim, cfg.n_ff
    tok = _get(r, "token_embd.weight")
    params = {"tok_embd": _as_jnp(tok, dtype)}
    out_w = _linear(r, "output.weight", E, cfg.n_vocab)
    if out_w is None:
        # tied head: HF scales hidden by d_model^-0.5 before the shared
        # embedding matmul — fold the scale into the weight
        out_w = np.ascontiguousarray(tok.T) * (E ** -0.5)
    params["output"] = _as_jnp(out_w, dtype)

    def stack(prefix, n, cross):
        rows: dict[str, list] = {}

        def add(key, arr, required=True):
            if arr is None:
                if required:
                    raise ValueError(f"{prefix} missing {key}")
                return
            rows.setdefault(key, []).append(arr)

        for i in range(n):
            p = f"{prefix}.blk.{i}."
            add("attn_norm_w", _get(r, p + "attn_norm.weight"))
            add("wq", _linear(r, p + "attn_q.weight", E, H * D))
            add("wk", _linear(r, p + "attn_k.weight", E, H * D))
            add("wv", _linear(r, p + "attn_v.weight", E, H * D))
            add("wo", _linear(r, p + "attn_o.weight", H * D, E))
            if cross:
                add("cross_attn_norm_w", _get(r, p + "cross_attn_norm.weight"))
                add("cross_wq", _linear(r, p + "cross_attn_q.weight", E, H * D))
                add("cross_wk", _linear(r, p + "cross_attn_k.weight", E, H * D))
                add("cross_wv", _linear(r, p + "cross_attn_v.weight", E, H * D))
                add("cross_wo", _linear(r, p + "cross_attn_o.weight", H * D, E))
            add("ffn_norm_w", _get(r, p + "ffn_norm.weight"))
            add("w_up", _linear(r, p + "ffn_up.weight", E, F))
            add("w_gate", _linear(r, p + "ffn_gate.weight", E, F),
                required=False)
            add("w_down", _linear(r, p + "ffn_down.weight", F, E))
        return {k: _as_jnp(np.stack(v), jnp.float32 if "norm" in k else dtype)
                for k, v in rows.items()}

    if _get(r, "enc.blk.0.attn_q.weight") is not None:
        params["enc_layers"] = stack("enc", cfg.n_layer, cross=False)
        params["enc_rel_b"] = _as_jnp(
            _rel_b(r, "enc.blk.0.attn_rel_b.weight", H), jnp.float32)
        params["enc_output_norm_w"] = _as_jnp(
            _get(r, "enc.output_norm.weight"), jnp.float32)
    if _get(r, "dec.blk.0.attn_q.weight") is not None:
        nd = cfg.dec_n_layer or cfg.n_layer
        params["dec_layers"] = stack("dec", nd, cross=True)
        params["dec_rel_b"] = _as_jnp(
            _rel_b(r, "dec.blk.0.attn_rel_b.weight", H), jnp.float32)
        params["dec_output_norm_w"] = _as_jnp(
            _get(r, "dec.output_norm.weight"), jnp.float32)
    return params


def _rel_b(r, name, n_head):
    from .loader import _get

    w = _get(r, name)
    if w is None:
        raise ValueError(f"missing {name}")
    if w.shape[0] == n_head and w.shape[1] != n_head:
        w = np.ascontiguousarray(w.T)  # -> (n_buckets, H)
    return w
