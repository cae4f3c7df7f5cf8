"""Context parallelism: ring-attention prefill over a `cp` mesh axis.

EXCEEDS the reference — SparkInfer has no sequence/context parallelism
(SURVEY §2.7 SP/CP row: absent). On TPU, long-context prefill is the one
place sequence sharding pays: each device holds T/n query tokens while the
K/V blocks rotate around the ring via `ppermute`, with streaming-softmax
accumulation (the Ring Attention construction), so attention memory per
device is O(T/n · T/n) per step instead of O(T²) and the N× FLOPs spread
over N chips rides ICI with one block exchange per step.

Scope: the llama-family dense path (rms/layer norm, standard rope, GQA,
dense gated FFN). The produced KV cache is all-gathered back to the
replicated (L, B, S, Hkv, D) layout `init_cache` uses, so decode continues
on any of the existing paths (single chip, tp, tiered). Exact vs
make_forward: tests/test_parallel.py::test_cp_ring_prefill_matches_dense.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..models.config import ModelConfig
from ..models.transformer import _norm, dense_ffn, mm, rope_params
from ..ops.rope import apply_rope

_NEG = -1e9


def _ring_attention(q, k, v, pos_q, pos_k, scale, axis, n):
    """Streaming-softmax ring attention (causal).

    q: (B, Tl, H, D) local queries; k/v: (B, Tl, Hkv, D) local KV block;
    pos_q/pos_k: (B, Tl) global positions. Each of the n ring steps
    attends q against the currently-held KV block, then rotates the block
    to the next device with `ppermute`. -> (B, Tl, H, D)
    """
    B, Tl, H, D = q.shape
    Hkv = k.shape[2]
    rep = H // Hkv
    qf = q.astype(jnp.float32)

    def step(carry, _):
        k_c, v_c, pk_c, m, l, acc = carry
        kk = jnp.repeat(k_c.astype(jnp.float32), rep, axis=2)
        vv = jnp.repeat(v_c.astype(jnp.float32), rep, axis=2)
        # (B, H, Tl, Ts)
        scores = jnp.einsum("bthd,bshd->bhts", qf, kk) * scale
        mask = pk_c[:, None, None, :] <= pos_q[:, None, :, None]
        scores = jnp.where(mask, scores, _NEG)
        m_new = jnp.maximum(m, scores.max(-1))
        p = jnp.exp(scores - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l_new = l * corr + p.sum(-1)
        upd = jnp.einsum("bhts,bshd->bthd", p, vv)  # (B, Tl, H, D)
        acc_new = acc * jnp.moveaxis(corr, 1, 2)[..., None] + upd
        # rotate the KV block one hop around the ring
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_c = jax.lax.ppermute(k_c, axis, perm)
        v_c = jax.lax.ppermute(v_c, axis, perm)
        pk_c = jax.lax.ppermute(pk_c, axis, perm)
        return (k_c, v_c, pk_c, m_new, l_new, acc_new), None

    m0 = jnp.full((B, H, Tl), _NEG, jnp.float32)
    l0 = jnp.zeros((B, H, Tl), jnp.float32)
    a0 = jnp.zeros((B, Tl, H, D), jnp.float32)
    (_, _, _, _, l, acc), _ = jax.lax.scan(
        step, (k, v, pos_k, m0, l0, a0), None, length=n)
    out = acc / jnp.moveaxis(l, 1, 2)[..., None]
    return out.astype(q.dtype)


def make_cp_prefill(cfg: ModelConfig, mesh: Mesh, axis: str = "cp"):
    """Build the jittable CP prefill:
        fwd(params, tokens, positions) -> (logits (B, T, V), (k, v))
    tokens/positions (B, T) with T divisible by the cp axis size; the
    returned k/v are the REPLICATED (L, B, T, Hkv, D) cache tensors.
    """
    tr = cfg.traits
    if cfg.n_expert or cfg.kv_lora_rank or tr.recurrent or cfg.n_head_arr:
        raise NotImplementedError(
            "cp prefill covers the llama-family dense path")
    rp = rope_params(cfg)
    ffn = dense_ffn(cfg)
    n = mesh.shape[axis]
    H, Hkv, D = cfg.n_head, cfg.n_head_kv, cfg.head_dim
    scale = cfg.attn_scale or 1.0 / math.sqrt(D)
    eps = cfg.norm_eps

    def local_fwd(params, tokens, positions):
        # tokens: (B, Tl) local chunk
        x = jnp.take(params["tok_embd"], tokens, axis=0)
        if cfg.embd_scale != 1.0:
            x = x * jnp.asarray(cfg.embd_scale, x.dtype)
        B, Tl, E = x.shape

        def layer(x, lp):
            h = _norm(x, lp["attn_norm_w"], lp.get("attn_norm_b"),
                      tr.norm, eps)
            q = mm(h, lp["wq"]).reshape(B, Tl, H, D)
            k = mm(h, lp["wk"]).reshape(B, Tl, Hkv, D)
            v = mm(h, lp["wv"]).reshape(B, Tl, Hkv, D)
            q = apply_rope(q, positions, rp)
            k = apply_rope(k, positions, rp)
            att = _ring_attention(q, k, v, positions, positions, scale,
                                  axis, n)
            x2 = x + mm(att.reshape(B, Tl, H * D), lp["wo"]).astype(x.dtype)
            h2 = _norm(x2, lp["ffn_norm_w"], lp.get("ffn_norm_b"),
                       tr.norm, eps)
            y = x2 + ffn(lp, h2).astype(x.dtype)
            return y, (k, v)

        x, kvs = jax.lax.scan(
            lambda c, lp: layer(c, lp), x, params["layers"])
        x = _norm(x, params["output_norm_w"], params.get("output_norm_b"),
                  tr.norm, eps)
        logits = mm(x, params["output"]).astype(jnp.float32)
        if cfg.logit_scale != 1.0:
            logits = logits * cfg.logit_scale
        # (L, B, Tl, Hkv, D) each — gather the sequence axis back
        k_all = jax.lax.all_gather(kvs[0], axis, axis=2, tiled=True)
        v_all = jax.lax.all_gather(kvs[1], axis, axis=2, tiled=True)
        return logits, k_all, v_all

    sharded = jax.shard_map(
        local_fwd, mesh=mesh,
        in_specs=(P(), P(None, axis), P(None, axis)),
        out_specs=(P(None, axis), P(), P()),
        check_vma=False)

    def fwd(params, tokens, positions):
        logits, k_all, v_all = sharded(params, tokens, positions)
        return logits, (k_all, v_all)

    return fwd
