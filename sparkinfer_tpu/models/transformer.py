"""Generic transformer forward pass, driven by ArchTraits.

One lax.scan-over-stacked-layers forward replaces the reference's 100
per-arch graph builders (src/models/*.cpp) + llm_graph_context helpers
(src/llama-graph.cpp build_ffn/build_attn): the arch differences that
matter for the supported families are all expressible as traits
(norm/activation/rope/parallel-blocks/biases/positional embeddings).

The FFN is pluggable: `ffn_fn(lp, x) -> y` lets the sparse predictor-gated
path (sparse/ffn.py, the analogue of build_sparse_ffn
src/llama-graph.cpp:896-1142) replace the dense FFN without touching
attention or the scan structure.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.activations import act_fn
from ..ops.norms import layer_norm, rms_norm
from ..ops.rope import RopeParams, apply_rope
from ..runtime.kv_cache import KVCache, read_layer, write_layer
from .config import ModelConfig

NEG_INF = -1e30


def rope_params(cfg: ModelConfig) -> RopeParams:
    yarn_ext = 0.0
    if cfg.rope_scaling_type == "yarn" and cfg.rope_orig_ctx:
        yarn_ext = 1.0
    return RopeParams(
        dim=cfg.rope_dim or cfg.head_dim,
        mode=cfg.traits.rope_mode,
        freq_base=cfg.rope_freq_base,
        freq_scale=cfg.rope_scale,
        yarn_orig_ctx=cfg.rope_orig_ctx,
        yarn_ext_factor=yarn_ext,
    )


def _norm(x, w, b, kind: str, eps: float):
    if kind == "rms":
        return rms_norm(x, w, eps)
    return layer_norm(x, w, b, eps)


def dense_ffn(cfg: ModelConfig):
    gated, f = act_fn(cfg.traits.act, cfg.fatrelu_threshold)

    def ffn(lp: dict, x: jnp.ndarray) -> jnp.ndarray:
        up = x @ lp["w_up"]
        if "b_up" in lp:
            up = up + lp["b_up"].astype(up.dtype)
        if gated and "w_gate" in lp:
            hidden = f(x @ lp["w_gate"], up)
        elif gated:
            # gated act but model has no gate proj: act on up alone
            hidden = f(up, jnp.ones_like(up))
        else:
            hidden = f(up)
        out = hidden @ lp["w_down"]
        if "b_down" in lp:
            out = out + lp["b_down"].astype(out.dtype)
        return out

    return ffn


def attention(
    cfg: ModelConfig,
    lp: dict,
    x: jnp.ndarray,  # (B, T, E) already normed
    positions: jnp.ndarray,  # (B, T)
    kc: jnp.ndarray,
    vc: jnp.ndarray,
    ks: jnp.ndarray | None,
    vs: jnp.ndarray | None,
    rp: RopeParams,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray | None, jnp.ndarray | None]:
    B, T, _ = x.shape
    H, Hkv, D = cfg.n_head, cfg.n_head_kv, cfg.head_dim
    S = kc.shape[1]
    q = (x @ lp["wq"]).reshape(B, T, H, D)
    k = (x @ lp["wk"]).reshape(B, T, Hkv, D)
    v = (x @ lp["wv"]).reshape(B, T, Hkv, D)
    if "bq" in lp:
        q = q + lp["bq"].astype(q.dtype).reshape(H, D)
        k = k + lp["bk"].astype(k.dtype).reshape(Hkv, D)
        v = v + lp["bv"].astype(v.dtype).reshape(Hkv, D)
    q = apply_rope(q, positions, rp)
    k = apply_rope(k, positions, rp)

    kc, ks = write_layer(kc, ks, k, positions)
    vc, vs = write_layer(vc, vs, v, positions)
    keys = read_layer(kc, ks, q.dtype)  # (B, S, Hkv, D)
    vals = read_layer(vc, vs, q.dtype)

    g = H // Hkv
    qg = q.reshape(B, T, Hkv, g, D)
    scores = jnp.einsum("bthgd,bshd->bhgts", qg, keys, preferred_element_type=jnp.float32)
    scores = scores * (D ** -0.5)
    s_idx = jnp.arange(S, dtype=jnp.int32)
    mask = s_idx[None, None, :] <= positions[:, :, None]  # (B, T, S)
    if cfg.sliding_window > 0:
        mask = mask & (s_idx[None, None, :] > positions[:, :, None] - cfg.sliding_window)
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhgts,bshd->bthgd", probs, vals)
    out = out.reshape(B, T, H * D)
    out = out @ lp["wo"]
    if "bo" in lp:
        out = out + lp["bo"].astype(out.dtype)
    return out, kc, vc, ks, vs


def make_forward(
    cfg: ModelConfig,
    ffn_fn: Callable | None = None,
) -> Callable:
    """Build the jittable forward: (params, tokens, positions, cache) ->
    (logits_f32 (B,T,V), cache). `positions` must be the absolute sequence
    positions of `tokens` per batch slot."""
    tr = cfg.traits
    rp = rope_params(cfg)
    ffn = ffn_fn or dense_ffn(cfg)
    eps = cfg.norm_eps
    quant_kv_keys = ("k_scale", "v_scale")

    def fwd(params: dict, tokens: jnp.ndarray, positions: jnp.ndarray, cache: KVCache):
        x = params["tok_embd"][tokens]  # (B, T, E)
        if tr.pos_embd:
            x = x + params["pos_embd"][positions + tr.pos_embd_offset]

        layers = params["layers"]
        quantized = cache.quantized

        def body(x, layer_in):
            lp, kc, vc, ks, vs = layer_in
            h = _norm(x, lp["attn_norm_w"], lp.get("attn_norm_b"), tr.norm, eps)
            attn_out, kc, vc, ks, vs = attention(cfg, lp, h, positions, kc, vc, ks, vs, rp)
            if tr.parallel_blocks:
                # falcon: FFN reads attn_norm_2(x) (or the same norm when absent)
                if "attn_norm2_w" in lp:
                    h2 = _norm(x, lp["attn_norm2_w"], lp.get("attn_norm2_b"), tr.norm, eps)
                else:
                    h2 = h
                x = x + attn_out + ffn(lp, h2)
            else:
                x = x + attn_out
                h2 = _norm(x, lp["ffn_norm_w"], lp.get("ffn_norm_b"), tr.norm, eps)
                x = x + ffn(lp, h2)
            return x, (kc, vc, ks, vs)

        def scan_body(carry, layer_in):
            return body(carry, layer_in)

        ks = cache.k_scale if quantized else None
        vs = cache.v_scale if quantized else None
        xs = (layers, cache.k, cache.v, ks, vs)

        if quantized:
            x, (k_new, v_new, ks_new, vs_new) = jax.lax.scan(
                lambda c, t: scan_body(c, t), x, xs
            )
            new_cache = KVCache(k=k_new, v=v_new, k_scale=ks_new, v_scale=vs_new)
        else:
            x, (k_new, v_new, _, _) = jax.lax.scan(
                lambda c, t: scan_body(c, (t[0], t[1], t[2], None, None)), x, (layers, cache.k, cache.v)
            )
            new_cache = KVCache(k=k_new, v=v_new)

        x = _norm(x, params["output_norm_w"], params.get("output_norm_b"), tr.norm, eps)
        logits = jnp.einsum(
            "bte,ev->btv", x, params["output"], preferred_element_type=jnp.float32
        )
        return logits, new_cache

    return fwd
