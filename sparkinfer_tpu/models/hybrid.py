"""Hybrid attention + recurrent memory (Jamba) — the TPU-native analogue of
the reference's llama_memory_hybrid (src/llama-memory-hybrid.cpp:1-268) and
the jamba graph builder (src/models/jamba.cpp:1-106).

A hybrid stack interleaves two memory types: attention layers (KV cache,
no rope for jamba) and mamba layers (conv + ssm recurrent state, with the
jamba-specific dt/B/C RMS norms — graph-context-mamba.cpp:94-97).  Which
layer is which comes from the per-layer `{arch}.attention.head_count_kv`
GGUF array (0 = recurrent; src/llama-model.cpp:1470-1472).  Every layer
then runs a gated-silu FFN or a softmax-routed MoE (jamba.cpp:60-84).

TPU-first: rather than the reference's two separate memory objects joined
by a splitter, the state is ONE pytree (HybridCache) carrying stacked
attention caches for the La attention layers and stacked conv/ssm states
for the Lr recurrent layers.  The layer loop is unrolled in Python (the
stack is heterogeneous, so a lax.scan over stacked layer params does not
apply); each sub-stack indexes its own cache rows, and the whole step
stays one jittable function, so Engine/Scheduler drive it exactly like
any other model.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import rms_norm
from .mamba import _conv_width, _layer_step, _layer_step2


class HybridCache(NamedTuple):
    k: jnp.ndarray  # (La, B, S, Hkv, D)
    v: jnp.ndarray  # (La, B, S, Hkv, D)
    conv: jnp.ndarray  # (Lr, B, d_conv-1, d_inner)
    ssm: jnp.ndarray  # (Lr, B, d_inner, d_state)


def _shortconv_step(lp, u, conv_state, ssm_state, cfg):
    """One token of an lfm2 gated short-conv block (ref lfm2.cpp
    build_shortconv_block / HF Lfm2ShortConv.slow_forward): split the
    in_proj into [B, C, x], causal-conv B*x over the last L_cache inputs,
    gate with C."""
    E = cfg.n_embd
    bcx = u @ lp["sc_in"]  # (B, 3E)
    b, c, x = bcx[:, :E], bcx[:, E : 2 * E], bcx[:, 2 * E :]
    bx = (b * x).astype(jnp.float32)
    window = jnp.concatenate([conv_state, bx[:, None, :]], axis=1)  # (B, L, E)
    conv = jnp.einsum("ble,le->be", window, lp["sc_conv"])
    y = c.astype(jnp.float32) * conv
    out = y.astype(u.dtype) @ lp["sc_out"]
    return out, window[:, 1:, :], ssm_state


def _layer_kinds(cfg):
    """(attn_layer_indices, recurrent_layer_indices) from the per-layer
    kv-head array; a layer is recurrent iff n_head_kv(il) == 0
    (ref llama-hparams.cpp is_recurrent). Parallel hybrids (falcon-h1:
    attention AND mamba2 in EVERY layer, summed — falcon-h1.cpp:26-72)
    put every layer in both lists."""
    if cfg.traits.hybrid_parallel:
        both = list(range(cfg.n_layer))
        return both, both
    arr = cfg.n_head_kv_arr or tuple(
        cfg.n_head_kv for _ in range(cfg.n_layer))
    attn = [i for i, h in enumerate(arr) if h > 0]
    rec = [i for i, h in enumerate(arr) if h == 0]
    return attn, rec


def init_hybrid_cache(cfg, batch: int, max_seq: int,
                      dtype=jnp.bfloat16) -> HybridCache:
    attn, rec = _layer_kinds(cfg)
    if cfg.shortconv_l_cache > 0:  # lfm2: conv over n_embd, no ssm state
        d_conv, width = cfg.shortconv_l_cache, cfg.n_embd
        ssm_shape = (len(rec), batch, 0, 0)
    else:
        d_conv, width = cfg.ssm_d_conv, _conv_width(cfg)
        ssm_shape = (len(rec), batch, cfg.ssm_d_inner, cfg.ssm_d_state)
    return HybridCache(
        k=jnp.zeros((len(attn), batch, max_seq, cfg.n_head_kv, cfg.head_dim), dtype),
        v=jnp.zeros((len(attn), batch, max_seq, cfg.n_head_kv, cfg.head_dim), dtype),
        conv=jnp.zeros((len(rec), batch, d_conv - 1, width), jnp.float32),
        ssm=jnp.zeros(ssm_shape, jnp.float32),
    )


def make_hybrid_forward(cfg):
    """fwd(params, tokens (B,T), positions (B,T), cache) ->
    (logits (B,T,V) f32, HybridCache). params["layers"] is a Python list
    of per-layer dicts (heterogeneous stack)."""
    from .transformer import attention, dense_ffn, rope_params

    eps = cfg.norm_eps
    attn_idx, rec_idx = _layer_kinds(cfg)
    a_of = {il: a for a, il in enumerate(attn_idx)}
    r_of = {il: r for r, il in enumerate(rec_idx)}
    rp = rope_params(cfg)  # jamba: rope_mode "none" -> identity
    _dense = dense_ffn(cfg)
    _moe = None
    if cfg.n_expert > 0:
        from ..sparse.moe import make_moe_ffn

        # jamba routes softmax top-k WITHOUT renormalizing the selected
        # weights (ref jamba.cpp:73-84 build_moe_ffn norm=false);
        # granite-hybrid follows its GGUF KVs (gating func 3 + norm flag,
        # the HF GraniteMoeTopKGating convention)
        _moe = make_moe_ffn(cfg, mode="dense",
                            norm_topk=False if cfg.arch == "jamba" else None)

    if cfg.shortconv_l_cache > 0:
        mamba_step = _shortconv_step
    elif cfg.ssm_n_group > 0:
        mamba_step = _layer_step2
    else:
        mamba_step = _layer_step

    rscale = cfg.residual_scale

    def fwd(params, tokens, positions, cache: HybridCache):
        valid = tokens >= 0  # (B, T): -1 padding passes recurrent state through
        x = params["tok_embd"][jnp.maximum(tokens, 0)]
        if cfg.embd_scale != 1.0:  # granite embedding multiplier
            x = x * jnp.asarray(cfg.embd_scale, x.dtype)
        layers = params["layers"]
        k_all, v_all = cache.k, cache.v
        conv_all, ssm_all = cache.conv, cache.ssm

        for il, lp in enumerate(layers):
            h = rms_norm(x, lp["attn_norm_w"], eps)
            out = None
            if il in a_of:
                ai = a_of[il]
                out, kc, vc, _, _ = attention(
                    cfg, lp, h, positions, k_all[ai], v_all[ai], None, None, rp)
                k_all = k_all.at[ai].set(kc)
                v_all = v_all.at[ai].set(vc)
            if il in r_of:
                ri = r_of[il]

                def time_step(carry, inp):
                    u_t, v_t = inp
                    conv_s, ssm_s = carry
                    o, conv_n, ssm_n = mamba_step(lp, u_t, conv_s, ssm_s, cfg)
                    keep = v_t[:, None]
                    conv_n = jnp.where(keep[:, :, None], conv_n, conv_s)
                    ssm_n = jnp.where(keep[:, :, None], ssm_n, ssm_s)
                    return (conv_n, ssm_n), jnp.where(keep, o, 0.0)

                (conv1, ssm1), rec_out = jax.lax.scan(
                    time_step, (conv_all[ri], ssm_all[ri]),
                    (jnp.swapaxes(h, 0, 1), jnp.swapaxes(valid, 0, 1)))
                rec_out = jnp.swapaxes(rec_out, 0, 1).astype(x.dtype)
                conv_all = conv_all.at[ri].set(conv1)
                ssm_all = ssm_all.at[ri].set(ssm1)
                # parallel hybrids sum attention + ssm (falcon-h1.cpp:70-72)
                out = rec_out if out is None else out + rec_out
            if rscale != 1.0:  # granite residual multiplier
                out = out * jnp.asarray(rscale, out.dtype)
            x = x + out

            hf = rms_norm(x, lp["ffn_norm_w"], eps)
            ffn_out = _moe(lp, hf) if "w_router" in lp else _dense(lp, hf)
            if rscale != 1.0:
                ffn_out = ffn_out * jnp.asarray(rscale, ffn_out.dtype)
            x = x + ffn_out

        x = rms_norm(x, params["output_norm_w"], eps)
        logits = jnp.einsum("bte,ev->btv", x, params["output"],
                            preferred_element_type=jnp.float32)
        if cfg.logit_scale != 1.0:  # granite divides by logits_scaling
            logits = logits * cfg.logit_scale
        return logits, HybridCache(k=k_all, v=v_all, conv=conv_all, ssm=ssm_all)

    return fwd


def load_hybrid_layers(r, cfg, dtype=jnp.bfloat16) -> list[dict]:
    """Per-layer tensor dicts from a hybrid GGUF (jamba tensor table
    src/llama-model.cpp:4337-4418; falcon-h1 :6180-6230 has BOTH attention
    and mamba2 tensors in every layer)."""
    attn_idx, rec_idx = _layer_kinds(cfg)
    attn_set = set(attn_idx)
    rec_set = set(rec_idx)
    layers = []
    for i in range(cfg.n_layer):
        p = f"blk.{i}."

        def g(n, required=True):
            t = r.tensors.get(p + n)
            if t is None:
                if required:
                    raise KeyError(p + n)
                return None
            return t.to_f32()

        def lin(n):
            # gguf numpy order is (out, in); compute uses x @ w -> (in, out)
            return jnp.asarray(np.ascontiguousarray(g(n).T), dtype)

        lp: dict = {"attn_norm_w": jnp.asarray(g("attn_norm.weight"), jnp.float32),
                    "ffn_norm_w": jnp.asarray(g("ffn_norm.weight"), jnp.float32)}
        if i in attn_set:
            lp["wq"] = lin("attn_q.weight")
            lp["wk"] = lin("attn_k.weight")
            lp["wv"] = lin("attn_v.weight")
            lp["wo"] = lin("attn_output.weight")
            for hf_n, key in (("attn_q_norm.weight", "attn_q_norm_w"),
                              ("attn_k_norm.weight", "attn_k_norm_w")):
                t = g(hf_n, required=False)  # lfm2 per-head qk norms
                if t is not None:
                    lp[key] = jnp.asarray(t, jnp.float32)
        if i in rec_set and cfg.shortconv_l_cache > 0:
            # lfm2 shortconv (blk.i.shortconv.* — llama-arch.cpp:2340-2342)
            lp["sc_in"] = jnp.asarray(
                np.ascontiguousarray(g("shortconv.in_proj.weight").T), jnp.float32)
            sck = g("shortconv.conv.weight")  # (E, L) numpy order
            lp["sc_conv"] = jnp.asarray(np.ascontiguousarray(sck.T), jnp.float32)
            lp["sc_out"] = jnp.asarray(
                np.ascontiguousarray(g("shortconv.out_proj.weight").T), jnp.float32)
        elif i in rec_set and cfg.ssm_n_group > 0:
            # mamba2 block (falcon-h1/granite-hybrid style)
            lp["ssm_in"] = jnp.asarray(np.ascontiguousarray(g("ssm_in.weight").T),
                                       jnp.float32)
            cw = g("ssm_conv1d.weight")
            lp["conv_w"] = jnp.asarray(np.ascontiguousarray(cw.T), jnp.float32)
            lp["conv_b"] = jnp.asarray(g("ssm_conv1d.bias"), jnp.float32)
            lp["ssm_dt_b"] = jnp.asarray(g("ssm_dt.bias"), jnp.float32)
            lp["ssm_a"] = jnp.asarray(g("ssm_a").reshape(-1), jnp.float32)
            lp["ssm_d"] = jnp.asarray(g("ssm_d").reshape(-1), jnp.float32)
            snorm = g("ssm_norm.weight", required=False)  # optional (falcon-h1)
            if snorm is not None:
                lp["ssm_norm"] = jnp.asarray(snorm, jnp.float32)
            lp["ssm_out"] = jnp.asarray(np.ascontiguousarray(g("ssm_out.weight").T),
                                        jnp.float32)
        elif i in rec_set:
            lp["ssm_in"] = jnp.asarray(np.ascontiguousarray(g("ssm_in.weight").T),
                                       jnp.float32)
            cw = g("ssm_conv1d.weight")  # (d_inner, d_conv) numpy order
            lp["conv_w"] = jnp.asarray(np.ascontiguousarray(cw.T), jnp.float32)
            lp["conv_b"] = jnp.asarray(g("ssm_conv1d.bias"), jnp.float32)
            lp["ssm_x"] = jnp.asarray(np.ascontiguousarray(g("ssm_x.weight").T),
                                      jnp.float32)
            lp["ssm_dt"] = jnp.asarray(np.ascontiguousarray(g("ssm_dt.weight").T),
                                       jnp.float32)
            lp["ssm_dt_b"] = jnp.asarray(g("ssm_dt.bias"), jnp.float32)
            lp["ssm_a"] = jnp.asarray(g("ssm_a"), jnp.float32)
            lp["ssm_d"] = jnp.asarray(g("ssm_d"), jnp.float32)
            lp["ssm_out"] = jnp.asarray(np.ascontiguousarray(g("ssm_out.weight").T),
                                        jnp.float32)
            # jamba dt/B/C RMS norms (graph-context-mamba.cpp:94-97)
            for nm, key in (("ssm_dt_norm", "ssm_dt_norm_w"),
                            ("ssm_b_norm", "ssm_b_norm_w"),
                            ("ssm_c_norm", "ssm_c_norm_w")):
                t = g(nm + ".weight", required=False)
                if t is not None:
                    lp[key] = jnp.asarray(t, jnp.float32)
        if r.tensors.get(p + "ffn_gate_inp.weight") is not None:
            lp["w_router"] = lin("ffn_gate_inp.weight")
            for hf_n, key in (("ffn_up_shexp.weight", "w_up_shexp"),
                              ("ffn_gate_shexp.weight", "w_gate_shexp"),
                              ("ffn_down_shexp.weight", "w_down_shexp")):
                t = g(hf_n, required=False)
                if t is not None:  # granite-hybrid shared expert
                    lp[key] = jnp.asarray(np.ascontiguousarray(t.T), dtype)
            lp["w_up_exps"] = jnp.asarray(
                np.ascontiguousarray(np.swapaxes(g("ffn_up_exps.weight"), 1, 2)),
                dtype)
            lp["w_gate_exps"] = jnp.asarray(
                np.ascontiguousarray(np.swapaxes(g("ffn_gate_exps.weight"), 1, 2)),
                dtype)
            lp["w_down_exps"] = jnp.asarray(
                np.ascontiguousarray(np.swapaxes(g("ffn_down_exps.weight"), 1, 2)),
                dtype)
        else:
            lp["w_up"] = lin("ffn_up.weight")
            lp["w_gate"] = lin("ffn_gate.weight")
            lp["w_down"] = lin("ffn_down.weight")
        layers.append(lp)
    return layers
