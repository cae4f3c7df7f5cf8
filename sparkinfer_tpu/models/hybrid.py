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


def _deltanet_step(lp, u, conv_state, ssm_state, cfg):
    """One token of a qwen3next gated delta net block (ref
    src/models/qwen3next.cpp build_delta_net_recurrent + HF
    torch_recurrent_gated_delta_rule). State: conv window over the
    concatenated [q;k;v] projections + S (nv, hk, hv) fast weights."""
    B = u.shape[0]
    hk = cfg.ssm_d_state
    nk = cfg.ssm_n_group
    nv = cfg.ssm_dt_rank
    hv = cfg.ssm_d_inner // nv
    rep = nv // nk
    key_dim, value_dim = hk * nk, hv * nv

    qkvz = u @ lp["ssm_in"]  # (B, 2*key_dim + 2*value_dim)
    # interleaved per k-head: [q_hk | k_hk | v rep*hv | z rep*hv]
    # (HF fix_query_key_value_ordering)
    qkvz = qkvz.reshape(B, nk, 2 * hk + 2 * rep * hv)
    q = qkvz[:, :, :hk]
    k = qkvz[:, :, hk : 2 * hk]
    v = qkvz[:, :, 2 * hk : 2 * hk + rep * hv].reshape(B, nv, hv)
    z = qkvz[:, :, 2 * hk + rep * hv :].reshape(B, nv, hv)
    ba = (u @ lp["ssm_ba"]).reshape(B, nk, 2 * rep)  # (b | a) per k-head
    b = ba[:, :, :rep].reshape(B, nv)
    a = ba[:, :, rep:].reshape(B, nv)

    # causal conv over the concatenated [q;k;v] flat dims, silu
    mixed = jnp.concatenate(
        [q.reshape(B, key_dim), k.reshape(B, key_dim), v.reshape(B, value_dim)],
        axis=-1)
    window = jnp.concatenate([conv_state, mixed[:, None, :]], axis=1)
    mixed = jnp.einsum("bcd,cd->bd", window, lp["conv_w"])
    if "conv_b" in lp:
        mixed = mixed + lp["conv_b"]
    new_conv = window[:, 1:, :]
    mixed = jax.nn.silu(mixed.astype(jnp.float32))
    q = mixed[:, :key_dim].reshape(B, nk, hk)
    k = mixed[:, key_dim : 2 * key_dim].reshape(B, nk, hk)
    v = mixed[:, 2 * key_dim :].reshape(B, nv, hv)

    beta = jax.nn.sigmoid(b.astype(jnp.float32))  # (B, nv)
    # g = A * softplus(a + dt_bias); ssm_a already holds A = -exp(A_log)
    g = lp["ssm_a"] * jax.nn.softplus(a.astype(jnp.float32) + lp["ssm_dt_b"])

    def l2n(x):
        return x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + 1e-6)

    q = l2n(q.astype(jnp.float32)) * (hk ** -0.5)
    k = l2n(k.astype(jnp.float32))
    q = jnp.repeat(q, rep, axis=1)  # (B, nv, hk)
    k = jnp.repeat(k, rep, axis=1)

    S = ssm_state.reshape(B, nv, hk, hv) * jnp.exp(g)[:, :, None, None]
    kv_mem = jnp.einsum("bhkv,bhk->bhv", S, k)
    delta = (v.astype(jnp.float32) - kv_mem) * beta[:, :, None]
    S = S + k[:, :, :, None] * delta[:, :, None, :]
    out = jnp.einsum("bhkv,bhk->bhv", S, q)  # (B, nv, hv)

    # gated per-head RMS norm: norm BEFORE the silu(z) gate
    # (Qwen3NextRMSNormGated; weight used as-is — no +1)
    var = jnp.mean(out * out, axis=-1, keepdims=True)
    out = out * jax.lax.rsqrt(var + cfg.norm_eps) * lp["ssm_norm"]
    out = out * jax.nn.silu(z.astype(jnp.float32))

    y = out.reshape(B, value_dim).astype(u.dtype) @ lp["ssm_out"]
    return y, new_conv, S.reshape(B, cfg.ssm_d_inner, hk)


def _plamo2_step(lp, u, conv_state, ssm_state, cfg):
    """One token of a PLaMo2 mamba block (ref src/models/plamo2.cpp
    build_plamo2_mamba_layer): per-head-interleaved [z; x] in-proj, conv
    over x only, B/C/dt from a post-conv projection with rms norms, dt
    through a low-rank head projection, mamba2-style per-head scan,
    silu(z)-gated output."""
    B = u.shape[0]
    d_in = cfg.ssm_d_inner
    ds = cfg.ssm_d_state
    nh = cfg.ssm_dt_rank  # head count (time_step_rank carries n_head)
    hd = d_in // nh

    zx = (u @ lp["ssm_in"]).reshape(B, nh, 2 * hd)
    z = zx[:, :, :hd].reshape(B, d_in)
    x = zx[:, :, hd:].reshape(B, d_in)

    window = jnp.concatenate([conv_state, x[:, None, :]], axis=1)
    x = jnp.einsum("bcd,cd->bd", window, lp["conv_w"])
    if "conv_b" in lp:
        x = x + lp["conv_b"]
    new_conv = window[:, 1:, :]
    x = jax.nn.silu(x.astype(jnp.float32))

    bcdt = x.astype(u.dtype) @ lp["ssm_x"]  # (B, 2*ds + dt_dim)
    Bm = rms_norm(bcdt[:, :ds], lp["ssm_b_norm_w"], cfg.norm_eps)
    Cm = rms_norm(bcdt[:, ds: 2 * ds], lp["ssm_c_norm_w"], cfg.norm_eps)
    dtr = rms_norm(bcdt[:, 2 * ds:], lp["ssm_dt_norm_w"], cfg.norm_eps)
    dt = dtr @ lp["ssm_dt"] + lp["ssm_dt_b"]  # (B, nh)
    dt_sp = jax.nn.softplus(dt.astype(jnp.float32))
    A = lp["ssm_a"].reshape(nh)  # -exp(A_log), scalar per head
    dA = jnp.exp(dt_sp * A)

    xh = x.reshape(B, nh, hd)
    h0 = ssm_state.reshape(B, nh, hd, ds)
    xdt = xh * dt_sp[:, :, None]
    Bf = Bm.astype(jnp.float32)
    Cf = Cm.astype(jnp.float32)
    h = dA[:, :, None, None] * h0 + xdt[..., None] * Bf[:, None, None, :]
    y = jnp.einsum("bhds,bs->bhd", h, Cf)
    y = y + lp["ssm_d"].reshape(nh)[None, :, None] * xh
    y = y.reshape(B, d_in) * jax.nn.silu(z.astype(jnp.float32))
    out = y.astype(u.dtype) @ lp["ssm_out"]
    return out, new_conv, h.reshape(B, d_in, ds)


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
    if cfg.arch == "nemotron-h" and cfg.n_ff_arr:
        # single-block stack: kv==0 covers BOTH mamba and ffn-only layers;
        # ffn layers are the ones with a nonzero per-layer width
        # (ref nemotron-h.cpp: is_recurrent / n_ff(il)==0 / else)
        rec = [i for i in rec if cfg.n_ff_arr[i] == 0]
    return attn, rec


def init_hybrid_cache(cfg, batch: int, max_seq: int,
                      dtype=jnp.bfloat16) -> HybridCache:
    attn, rec = _layer_kinds(cfg)
    if cfg.arch == "qwen3next":
        # delta net: conv over [q;k;v], fast-weight state (d_inner, hk)
        d_conv = cfg.ssm_d_conv
        width = 2 * cfg.ssm_d_state * cfg.ssm_n_group + cfg.ssm_d_inner
        ssm_shape = (len(rec), batch, cfg.ssm_d_inner, cfg.ssm_d_state)
    elif cfg.shortconv_l_cache > 0:  # lfm2: conv over n_embd, no ssm state
        d_conv, width = cfg.shortconv_l_cache, cfg.n_embd
        ssm_shape = (len(rec), batch, 0, 0)
    elif cfg.arch == "plamo2":  # conv over d_inner only
        d_conv, width = cfg.ssm_d_conv, cfg.ssm_d_inner
        ssm_shape = (len(rec), batch, cfg.ssm_d_inner, cfg.ssm_d_state)
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

    if cfg.arch == "qwen3next":
        mamba_step = _deltanet_step
    elif cfg.arch == "plamo2":
        mamba_step = _plamo2_step
    elif cfg.shortconv_l_cache > 0:
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
                if "attn_post_norm_w" in lp:  # plamo2 post-attn norm
                    out = rms_norm(out, lp["attn_post_norm_w"], eps)
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
                if "attn_post_norm_w" in lp and il not in a_of:
                    rec_out = rms_norm(rec_out, lp["attn_post_norm_w"], eps)
                conv_all = conv_all.at[ri].set(conv1)
                ssm_all = ssm_all.at[ri].set(ssm1)
                # parallel hybrids sum attention + ssm (falcon-h1.cpp:70-72)
                out = rec_out if out is None else out + rec_out
            if out is None:
                # nemotron-h ffn-only layer: the pre-norm stream feeds the
                # FFN directly, ONE residual for the whole block
                out = _moe(lp, h) if "w_router" in lp else _dense(lp, h)
            if rscale != 1.0:  # granite residual multiplier
                out = out * jnp.asarray(rscale, out.dtype)
            x = x + out

            if "ffn_norm_w" in lp:
                hf = rms_norm(x, lp["ffn_norm_w"], eps)
                ffn_out = _moe(lp, hf) if "w_router" in lp else _dense(lp, hf)
                if "ffn_post_norm_w" in lp:  # plamo2 post-ffn norm
                    ffn_out = rms_norm(ffn_out, lp["ffn_post_norm_w"], eps)
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

        lp: dict = {"attn_norm_w": jnp.asarray(g("attn_norm.weight"), jnp.float32)}
        if cfg.arch == "nemotron-h":
            # single-block stack: no per-layer FFN sub-block; ffn-only
            # layers carry relu^2 up/down (+biases) after attn_norm
            if i not in attn_set and i not in rec_set:
                lp["w_up"] = lin("ffn_up.weight")
                lp["w_down"] = lin("ffn_down.weight")
                for nm, key in (("ffn_up.bias", "b_up"),
                                ("ffn_down.bias", "b_down")):
                    t = g(nm, required=False)
                    if t is not None:
                        lp[key] = jnp.asarray(t, jnp.float32)
        else:
            fn = g("ffn_norm.weight", required=False)
            if fn is None:  # qwen3next names the pre-FFN norm attn_post_norm
                fn = g("attn_post_norm.weight")
            lp["ffn_norm_w"] = jnp.asarray(fn, jnp.float32)
            if cfg.arch == "plamo2":  # post-norms around both blocks
                lp["attn_post_norm_w"] = jnp.asarray(
                    g("attn_post_norm.weight"), jnp.float32)
                lp["ffn_post_norm_w"] = jnp.asarray(
                    g("ffn_post_norm.weight"), jnp.float32)
        if i in attn_set and cfg.arch == "qwen3next":
            # wq packs [q | gate] interleaved per head (2*D cols per head,
            # llama-model.cpp QWEN3NEXT wq {n_embd, head*2})
            wq2 = g("attn_q.weight").T  # (E, H*2D)
            E2 = wq2.shape[0]
            H, D = cfg.n_head, cfg.head_dim
            wq2 = wq2.reshape(E2, H, 2 * D)
            lp["wq"] = jnp.asarray(
                np.ascontiguousarray(wq2[:, :, :D].reshape(E2, H * D)), dtype)
            lp["w_attn_gate"] = jnp.asarray(
                np.ascontiguousarray(wq2[:, :, D:].reshape(E2, H * D)), dtype)
            lp["wk"] = lin("attn_k.weight")
            lp["wv"] = lin("attn_v.weight")
            lp["wo"] = lin("attn_output.weight")
        elif i in attn_set and cfg.arch == "plamo2":
            # fused [Q;K;V] concat (plamo2.cpp wqkv views)
            wqkv = g("attn_qkv.weight").T  # (E, total)
            H, Hkv, D = cfg.n_head, cfg.n_head_kv, cfg.head_dim
            lp["wq"] = jnp.asarray(
                np.ascontiguousarray(wqkv[:, : H * D]), dtype)
            lp["wk"] = jnp.asarray(np.ascontiguousarray(
                wqkv[:, H * D: (H + Hkv) * D]), dtype)
            lp["wv"] = jnp.asarray(np.ascontiguousarray(
                wqkv[:, (H + Hkv) * D:]), dtype)
            lp["wo"] = lin("attn_output.weight")
        elif i in attn_set:
            lp["wq"] = lin("attn_q.weight")
            lp["wk"] = lin("attn_k.weight")
            lp["wv"] = lin("attn_v.weight")
            lp["wo"] = lin("attn_output.weight")
        if i in attn_set:
            for hf_n, key in (("attn_q_norm.weight", "attn_q_norm_w"),
                              ("attn_k_norm.weight", "attn_k_norm_w")):
                t = g(hf_n, required=False)  # per-head qk norms (lfm2/qwen3next)
                if t is not None:
                    lp[key] = jnp.asarray(t, jnp.float32)
        if i in rec_set and cfg.arch == "qwen3next":
            # gated delta net tensors (llama-model.cpp QWEN3NEXT table)
            lp["ssm_in"] = jnp.asarray(np.ascontiguousarray(g("ssm_in.weight").T),
                                       jnp.float32)
            lp["ssm_ba"] = jnp.asarray(
                np.ascontiguousarray(g("ssm_beta_alpha.weight").T), jnp.float32)
            cw = g("ssm_conv1d.weight")  # (conv_dim, d_conv) numpy order
            lp["conv_w"] = jnp.asarray(np.ascontiguousarray(cw.T), jnp.float32)
            cb = g("ssm_conv1d.bias", required=False)
            if cb is not None:
                lp["conv_b"] = jnp.asarray(cb, jnp.float32)
            lp["ssm_dt_b"] = jnp.asarray(g("ssm_dt.bias"), jnp.float32)
            lp["ssm_a"] = jnp.asarray(g("ssm_a").reshape(-1), jnp.float32)
            lp["ssm_norm"] = jnp.asarray(g("ssm_norm.weight"), jnp.float32)
            lp["ssm_out"] = jnp.asarray(np.ascontiguousarray(g("ssm_out.weight").T),
                                        jnp.float32)
        elif i in rec_set and cfg.shortconv_l_cache > 0:
            # lfm2 shortconv (blk.i.shortconv.* — llama-arch.cpp:2340-2342)
            lp["sc_in"] = jnp.asarray(
                np.ascontiguousarray(g("shortconv.in_proj.weight").T), jnp.float32)
            sck = g("shortconv.conv.weight")  # (E, L) numpy order
            lp["sc_conv"] = jnp.asarray(np.ascontiguousarray(sck.T), jnp.float32)
            lp["sc_out"] = jnp.asarray(
                np.ascontiguousarray(g("shortconv.out_proj.weight").T), jnp.float32)
        elif i in rec_set and cfg.arch == "plamo2":
            # plamo2 mamba tensors (src/models/plamo2.cpp)
            lp["ssm_in"] = jnp.asarray(
                np.ascontiguousarray(g("ssm_in.weight").T), jnp.float32)
            cw = g("ssm_conv1d.weight")  # (d_inner, d_conv) numpy order
            lp["conv_w"] = jnp.asarray(np.ascontiguousarray(cw.T), jnp.float32)
            cb = g("ssm_conv1d.bias", required=False)
            if cb is not None:
                lp["conv_b"] = jnp.asarray(cb, jnp.float32)
            lp["ssm_x"] = jnp.asarray(
                np.ascontiguousarray(g("ssm_x.weight").T), jnp.float32)
            lp["ssm_dt"] = jnp.asarray(
                np.ascontiguousarray(g("ssm_dt.weight").T), jnp.float32)
            lp["ssm_dt_b"] = jnp.asarray(g("ssm_dt.bias"), jnp.float32)
            lp["ssm_a"] = jnp.asarray(g("ssm_a").reshape(-1), jnp.float32)
            lp["ssm_d"] = jnp.asarray(g("ssm_d").reshape(-1), jnp.float32)
            lp["ssm_out"] = jnp.asarray(
                np.ascontiguousarray(g("ssm_out.weight").T), jnp.float32)
            for nm, key in (("ssm_dt_norm", "ssm_dt_norm_w"),
                            ("ssm_b_norm", "ssm_b_norm_w"),
                            ("ssm_c_norm", "ssm_c_norm_w")):
                lp[key] = jnp.asarray(g(nm + ".weight"), jnp.float32)
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
        if cfg.arch == "nemotron-h":
            # single-block layers already fully read above; attention
            # layers may carry q/k/v/o biases
            if i in attn_set:
                for nm, key in (("attn_q.bias", "bq"), ("attn_k.bias", "bk"),
                                ("attn_v.bias", "bv"),
                                ("attn_output.bias", "bo")):
                    t = g(nm, required=False)
                    if t is not None:
                        lp[key] = jnp.asarray(t, jnp.float32)
            layers.append(lp)
            continue
        if r.tensors.get(p + "ffn_gate_inp.weight") is not None:
            lp["w_router"] = lin("ffn_gate_inp.weight")
            for hf_n, key in (("ffn_up_shexp.weight", "w_up_shexp"),
                              ("ffn_gate_shexp.weight", "w_gate_shexp"),
                              ("ffn_down_shexp.weight", "w_down_shexp")):
                t = g(hf_n, required=False)
                if t is not None:  # shared expert (granite-hybrid/qwen3next)
                    lp[key] = jnp.asarray(np.ascontiguousarray(t.T), dtype)
            sg = g("ffn_gate_inp_shexp.weight", required=False)
            if sg is not None:  # qwen2moe-style scalar shared gate (1, E)
                lp["w_gate_inp_shexp"] = jnp.asarray(sg.reshape(-1), dtype)
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
