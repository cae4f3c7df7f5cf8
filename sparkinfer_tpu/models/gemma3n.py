"""Gemma 3n (E2B/E4B) family — ref: src/models/gemma3n-iswa.cpp (377 LoC),
tensor names src/llama-arch.cpp LLM_ARCH_GEMMA3N, KV keys gguf-py
constants (altup.num_inputs / altup.active_idx /
embedding_length_per_layer_input / attention.shared_kv_layers /
activation_sparsity_scale).

Mechanisms (verified against HF Gemma3nForCausalLM, the parity oracle):
  - AltUp (alternating updates): the hidden state is a STACK of n_altup
    E-wide streams; only the active stream runs attention+FFN, the others
    are predicted/corrected via tiny learned routers
    (modeling_gemma3n.py Gemma3nTextAltUp.predict/correct).
  - Laurel: low-rank residual bypass around attention.
  - Per-layer embeddings: a second (smaller) token table contributes a
    per-layer injection, gated by the corrected active stream.
  - KV sharing: the last num_kv_shared_layers reuse the K/V of the LAST
    non-shared layer of the same attention type (sliding vs full).
  - Activation sparsity: gaussian top-k cutoff (mean + icdf(target)*std)
    on the FFN gate for the early layers.
  - Attention: per-head q/k rms-norm, WEIGHTLESS v rms-norm, scale=1.0,
    local layers rope at 10 kHz, global at rope_theta.

Design: the altup stack and the per-layer conditionals (KV sharing,
per-layer sparsity) are layer-heterogeneous, so the forward unrolls a
python loop over layers at trace time (the reference unrolls its graph
the same way); XLA still fuses each layer body.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import rms_norm
from ..ops.rope import RopeParams, apply_rope
from ..runtime.kv_cache import KVCache

NEG_INF = -1e30


def _mag(x):
    """RMS magnitude with the HF epsilon clamp (modeling_gemma3n:1650)."""
    ms = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return jnp.sqrt(jnp.maximum(ms, 1e-5))


def _rms_weightless(x, eps):
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(ms + eps)).astype(x.dtype)


def _gelu(x):
    return jax.nn.gelu(x.astype(jnp.float32), approximate=True)


def kv_share_sources(cfg) -> list[int]:
    """Layer -> KV source layer (itself unless shared; shared layers use
    the last non-shared layer of the same attention type)."""
    L = cfg.n_layer
    swa = cfg.swa_layers
    first_sh = L - cfg.n_kv_shared if cfg.n_kv_shared > 0 else L
    src = []
    for il in range(L):
        if il >= first_sh:
            same = [j for j in range(first_sh) if swa[j] == swa[il]]
            src.append(same[-1])
        else:
            src.append(il)
    return src


def make_gemma3n_forward(cfg, with_hidden: bool = False):
    """(params, tokens (B,T), positions (B,T), cache) -> (logits, cache).
    Standard KVCache layout; shared layers leave their slots untouched."""
    eps = cfg.norm_eps
    E, H, Hkv, D = cfg.n_embd, cfg.n_head, cfg.n_head_kv, cfg.head_dim
    L, Epl, na, iact = cfg.n_layer, cfg.n_embd_altup, cfg.n_altup, cfg.i_altup_act
    swa = cfg.swa_layers
    src = kv_share_sources(cfg)
    std_mul = cfg.act_sparsity_scale or (0.0,) * L
    softcap = cfg.traits.final_logit_softcap
    rp_global = RopeParams(dim=D, mode="neox", freq_base=cfg.rope_freq_base,
                           freq_scale=cfg.rope_scale)
    rp_local = RopeParams(dim=D, mode="neox",
                          freq_base=cfg.rope_freq_base_swa or 10000.0)
    g = H // Hkv

    def attn_one(lp, h, positions, kc, vc, il, write: bool):
        B, T, _ = h.shape
        S = kc.shape[1]
        q = (h @ lp["wq"]).reshape(B, T, H, D)
        q = rms_norm(q, lp["attn_q_norm_w"], eps)
        rp = rp_local if swa[il] else rp_global
        q = apply_rope(q, positions, rp)
        if write:
            k = (h @ lp["wk"]).reshape(B, T, Hkv, D)
            k = rms_norm(k, lp["attn_k_norm_w"], eps)
            k = apply_rope(k, positions, rp)
            v = _rms_weightless((h @ lp["wv"]).reshape(B, T, Hkv, D), eps)
            bidx = jnp.arange(B)[:, None]
            kc = kc.at[bidx, positions].set(k.astype(kc.dtype))
            vc = vc.at[bidx, positions].set(v.astype(vc.dtype))
        keys, vals = kc.astype(q.dtype), vc.astype(q.dtype)
        qg = q.reshape(B, T, Hkv, g, D)
        scores = jnp.einsum("bthgd,bshd->bhgts", qg, keys,
                            preferred_element_type=jnp.float32)
        # scale = 1.0 (ref f_attention_scale, HF scaling=1.0)
        s_idx = jnp.arange(S, dtype=jnp.int32)
        mask = s_idx[None, None, :] <= positions[:, :, None]
        if swa[il] and cfg.sliding_window > 0:
            mask = mask & (s_idx[None, None, :] >
                           positions[:, :, None] - cfg.sliding_window)
        scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhgts,bshd->bthgd", probs, vals)
        return out.reshape(B, T, H * D) @ lp["wo"], kc, vc

    def fwd(params, tokens, positions, cache: KVCache, fstate=None):
        B, T = tokens.shape
        x0 = params["tok_embd"][tokens] * jnp.asarray(E ** 0.5,
                                                      params["tok_embd"].dtype)
        # per-layer inputs (get_per_layer_inputs + project_per_layer_inputs)
        pli = params["tok_embd_per_layer"][tokens].reshape(B, T, L, Epl)
        pli = pli * (Epl ** 0.5)
        plp = (x0 @ params["per_layer_model_proj"]) * (E ** -0.5)
        plp = plp.reshape(B, T, L, Epl)
        plp = rms_norm(plp, params["per_layer_proj_norm"], eps)
        per_layer = (plp + pli) * (2.0 ** -0.5)  # (B, T, L, Epl)

        # expand to the altup stack with magnitude preservation
        tm = _mag(x0)
        hs = [x0]
        for i in range(na - 1):
            h = x0 @ params["altup_proj"][i]
            hs.append((h.astype(jnp.float32) * tm / _mag(h)).astype(x0.dtype))
        hs = jnp.stack(hs)  # (na, B, T, E)

        lay = params["layers"]
        kc_all, vc_all = cache.k, cache.v
        new_k, new_v = list(kc_all), list(vc_all)

        for il in range(L):
            lp = {k: v[il] for k, v in lay.items()}

            def modalities(x):
                ri = rms_norm(x, lp["altup_router_norm"], eps) * (1.0 / E)
                return jnp.tanh((ri @ lp["altup_router"]).astype(jnp.float32))

            # --- altup predict
            mod = modalities(hs[iact])  # (B, T, na)
            coefs = (mod @ lp["altup_predict_coef"]).reshape(B, T, na, na)
            preds = jnp.einsum("btji,ibte->jbte", coefs,
                               hs.astype(jnp.float32))
            preds = (preds + hs.astype(jnp.float32)).astype(hs.dtype)
            active = preds[iact]

            h = rms_norm(active, lp["attn_norm_w"], eps)
            # laurel low-rank residual
            lr = rms_norm((h @ lp["laurel_l"]) @ lp["laurel_r"],
                          lp["laurel_post_norm"], eps)
            laurel_out = h + lr

            ksrc = src[il]
            attn, k2, v2 = attn_one(lp, h, positions, new_k[ksrc],
                                    new_v[ksrc], il, write=ksrc == il)
            if ksrc == il:
                new_k[il], new_v[il] = k2, v2
            attn = rms_norm(attn, lp["attn_post_norm_w"], eps)
            attn_gated = active + attn
            attn_laurel = (attn_gated + laurel_out) * (2.0 ** -0.5)

            h2 = rms_norm(attn_laurel, lp["ffn_norm_w"], eps)
            gate = h2 @ lp["w_gate"]
            if std_mul[il] > 0.0:
                # gaussian top-k cutoff (Gemma3nTextMLP._gaussian_topk;
                # biased std, matching torch unbiased=False)
                gf = gate.astype(jnp.float32)
                mean = jnp.mean(gf, axis=-1, keepdims=True)
                std = jnp.std(gf, axis=-1, keepdims=True)
                gate = jnp.maximum(gf - (mean + std_mul[il] * std),
                                   0.0).astype(gate.dtype)
            hid = (_gelu(gate) * (h2 @ lp["w_up"]).astype(jnp.float32)
                   ).astype(h2.dtype)
            ffw = rms_norm(hid @ lp["w_down"], lp["ffn_post_norm_w"], eps)
            gated = attn_laurel + ffw

            # --- altup correct
            mod_c = modalities(gated)
            ccoefs = (mod_c @ lp["altup_correct_coef"]) + 1.0  # (B, T, na)
            innovation = (gated - preds[iact]).astype(jnp.float32)
            corrected = (jnp.einsum("btj,bte->jbte", ccoefs, innovation)
                         + preds.astype(jnp.float32))

            # per-layer input injection onto the non-first streams
            fp = corrected[iact] * lp["altup_correct_scale"].astype(jnp.float32)
            fp = _gelu(fp.astype(hs.dtype) @ lp["per_layer_inp_gate"])
            fp = fp * per_layer[:, :, il].astype(jnp.float32)
            fp = fp.astype(hs.dtype) @ lp["per_layer_proj"]
            fp = rms_norm(fp, lp["per_layer_post_norm_w"], eps)
            corrected = corrected.at[1:].add(fp.astype(jnp.float32))
            hs = corrected.astype(hs.dtype)

        # merge the altup streams (mean with magnitude-preserved unembeds)
        tm = _mag(hs[0])
        merged = [hs[0].astype(jnp.float32)]
        for i in range(na - 1):
            u = hs[i + 1] @ params["altup_unembd_proj"][i]
            merged.append(u.astype(jnp.float32) * tm / _mag(u))
        x = (sum(merged) / na).astype(hs.dtype)
        x = rms_norm(x, params["output_norm_w"], eps)
        hidden = x
        logits = jnp.einsum("bte,ev->btv", x, params["output"],
                            preferred_element_type=jnp.float32)
        if softcap > 0:
            logits = softcap * jnp.tanh(logits / softcap)
        new_cache = KVCache(k=jnp.stack(new_k), v=jnp.stack(new_v))
        if with_hidden:
            return logits, new_cache, hidden
        return logits, new_cache

    return fwd


def load_gemma3n(r, cfg, dtype):
    """GGUF -> params (tensor names: llama-arch.cpp LLM_ARCH_GEMMA3N)."""
    from .loader import _as_jnp, _get, _linear

    E, H, Hkv, D, F, L = (cfg.n_embd, cfg.n_head, cfg.n_head_kv,
                          cfg.head_dim, cfg.n_ff, cfg.n_layer)
    Epl, na = cfg.n_embd_altup, cfg.n_altup
    tok = _get(r, "token_embd.weight")
    params = {
        "tok_embd": _as_jnp(tok, dtype),
        "tok_embd_per_layer": _as_jnp(
            _get(r, "per_layer_token_embd.weight"), dtype),
        "per_layer_model_proj": _as_jnp(
            _linear(r, "per_layer_model_proj.weight", E, L * Epl), dtype),
        "per_layer_proj_norm": _as_jnp(
            _get(r, "per_layer_proj_norm.weight"), jnp.float32),
        "output_norm_w": _as_jnp(_get(r, "output_norm.weight"), jnp.float32),
    }
    out_w = _linear(r, "output.weight", E, cfg.n_vocab)
    params["output"] = _as_jnp(
        out_w if out_w is not None else np.ascontiguousarray(tok.T), dtype)
    # stacked (na-1, E, E) projections; each slice stored (out, in)
    for nm, key in (("altup_proj.weight", "altup_proj"),
                    ("altup_unembd_proj.weight", "altup_unembd_proj")):
        w = _get(r, nm)  # (na-1, E, E) (out, in) per slice
        params[key] = _as_jnp(np.ascontiguousarray(
            np.swapaxes(w, -1, -2)), dtype)

    rows: dict[str, list] = {}

    def add(k, a):
        assert a is not None, k
        rows.setdefault(k, []).append(a)

    for i in range(L):
        p = f"blk.{i}."
        add("attn_norm_w", _get(r, p + "attn_norm.weight"))
        add("attn_post_norm_w", _get(r, p + "attn_post_norm.weight"))
        add("ffn_norm_w", _get(r, p + "ffn_norm.weight"))
        add("ffn_post_norm_w", _get(r, p + "ffn_post_norm.weight"))
        add("attn_q_norm_w", _get(r, p + "attn_q_norm.weight"))
        add("attn_k_norm_w", _get(r, p + "attn_k_norm.weight"))
        add("wq", _linear(r, p + "attn_q.weight", E, H * D))
        add("wk", _linear(r, p + "attn_k.weight", E, Hkv * D))
        add("wv", _linear(r, p + "attn_v.weight", E, Hkv * D))
        add("wo", _linear(r, p + "attn_output.weight", H * D, E))
        add("w_up", _linear(r, p + "ffn_up.weight", E, F))
        add("w_gate", _linear(r, p + "ffn_gate.weight", E, F))
        add("w_down", _linear(r, p + "ffn_down.weight", F, E))
        add("altup_router", _linear(r, p + "altup_router.weight", E, na))
        add("altup_router_norm", _get(r, p + "altup_router_norm.weight"))
        add("altup_predict_coef",
            _linear(r, p + "altup_predict_coef.weight", na, na * na))
        add("altup_correct_coef",
            _linear(r, p + "altup_correct_coef.weight", na, na))
        add("altup_correct_scale", _get(r, p + "altup_correct_scale.weight"))
        # laurel: (rank, E) / (E, rank) torch layouts -> (in, out)
        add("laurel_l", np.ascontiguousarray(
            _get(r, p + "laurel_l.weight").T))
        add("laurel_r", np.ascontiguousarray(
            _get(r, p + "laurel_r.weight").T))
        add("laurel_post_norm", _get(r, p + "laurel_post_norm.weight"))
        add("per_layer_inp_gate", _linear(r, p + "inp_gate.weight", E, Epl))
        add("per_layer_proj", _linear(r, p + "proj.weight", Epl, E))
        add("per_layer_post_norm_w", _get(r, p + "post_norm.weight"))

    params["layers"] = {
        k: _as_jnp(np.stack(v),
                   jnp.float32 if ("norm" in k or "coef" in k
                                   or "router" in k or "scale" in k)
                   else dtype)
        for k, v in rows.items()
    }
    return params
