"""RWKV7 (Goose) forward — delta-rule linear-attention family.

Parity targets (behavior, not code):
  ref graph builder: src/models/rwkv7.cpp, src/models/rwkv7-base.cpp
  ref wkv7 kernel math (ggml/src/ggml-cpu/ops.cpp
  ggml_compute_forward_rwkv_wkv7_f32, state layout [i=value dim, j=key dim]):
    sa_i      = sum_j a_j * S[i,j]
    S'[i,j]   = S[i,j]*w_j + v_i*k_j + sa_i*b_j
    out_i     = sum_j S'[i,j] * r_j
  with a = -kk (L2-normalized k*k_k per head) and b = kk*a_gate.

TPU-first design mirrors rwkv6.py: every projection/lora/norm is a
batched MXU matmul over all T positions; only the rank-1 delta-rule
state update runs under lax.scan over time carrying (B, H, N, N) f32.
The v-residual ("value-first") mixes layer 0's v into every later
layer — it rides the layer scan as a carry alongside x.

State per layer per sequence: identical geometry to RWKV6
(token_shift_count=2 + (H, N, N) wkv state), so the cache type and the
Engine recurrent plumbing are shared.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .rwkv6 import GROUPNORM_EPS, RWKV6Cache, _ln, init_rwkv6_cache

RWKV7Cache = RWKV6Cache
init_rwkv7_cache = init_rwkv6_cache


def _wkv7_scan(r, w, k, v, a, b, state0, valid):
    """The wkv7 delta-rule recurrence over time.

    r/w/k/v/a/b: (B, T, H, N) f32;  state0: (B, H, N, N) [i=value, j=key];
    valid: (B, T) bool — padded steps pass state through untouched.
    """

    def step(S, inp):
        r_t, w_t, k_t, v_t, a_t, b_t, ok = inp
        sa = jnp.einsum("bhij,bhj->bhi", S, a_t)  # (B, H, N)
        S2 = (
            S * w_t[:, :, None, :]
            + v_t[..., :, None] * k_t[:, :, None, :]
            + sa[..., :, None] * b_t[:, :, None, :]
        )
        out = jnp.einsum("bhij,bhj->bhi", S2, r_t)
        S2 = jnp.where(ok[:, None, None, None], S2, S)
        return S2, out

    xs = tuple(jnp.moveaxis(t, 1, 0) for t in (r, w, k, v, a, b))
    state, outs = jax.lax.scan(step, state0, xs + (jnp.moveaxis(valid, 1, 0),))
    return jnp.moveaxis(outs, 0, 1), state  # (B, T, H, N)


def _build_time_mix(cfg):
    """rwkv7 time-mix shared by rwkv7 and arwkv7 (ref rwkv7-base.cpp
    build_rwkv7_time_mix): groupnorm and gating apply only when their
    tensors exist (arwkv7 may omit time_mix_ln)."""
    E = cfg.n_embd
    N = cfg.wkv_head_size
    H = E // N

    def time_mix(lp, xn, x_prev, state0, valid, v_first, il):
        B, T, _ = xn.shape
        sx = x_prev - xn
        # six static lerps, order r,w,k,v,a,g (ref rwkv7-base.cpp views)
        xm = xn[:, :, None, :] + sx[:, :, None, :] * lp["lerp_fused"]
        xr, xw, xk, xv, xa, xg = [xm[:, :, m] for m in range(6)]

        r = xr @ lp["tm_r"]
        # decay: w = exp(-0.606531 * sigmoid(w0 + tanh(xw@w1)@w2))
        # (ref rwkv7-base.cpp:69-72; 0.606531 = exp(-0.5))
        wl = (jnp.tanh(xw @ lp["tm_w1"]) @ lp["tm_w2"]) + lp["tm_w0"]
        w = jnp.exp(-0.606531 * jax.nn.sigmoid(wl.astype(jnp.float32)))

        k = xk @ lp["tm_k"]
        v = xv @ lp["tm_v"]
        # value-first residual: later layers mix layer 0's v back in
        # (ref rwkv7-base.cpp:75-84)
        v_mix = jax.nn.sigmoid(
            ((xv @ lp["tm_v1"]) @ lp["tm_v2"]) + lp["tm_v0"]
        )
        v = jnp.where(il == 0, v, v + (v_first - v) * v_mix.astype(v.dtype))
        v_first = jnp.where(il == 0, v, v_first)

        g = jax.nn.sigmoid(xg @ lp["tm_g1"]) @ lp["tm_g2"]
        a_gate = jax.nn.sigmoid(
            ((xa @ lp["tm_a1"]) @ lp["tm_a2"]) + lp["tm_a0"]
        ).astype(jnp.float32)

        # kk = per-head L2-normalized k*k_k (ref :93-95)
        kf = k.astype(jnp.float32)
        kk = (kf * lp["tm_k_k"]).reshape(B, T, H, N)
        kk = kk / jnp.maximum(
            jnp.linalg.norm(kk, axis=-1, keepdims=True), 1e-12
        )
        # k <- k + k*k_a*(a-1) (ref :97-98)
        ag = a_gate.reshape(B, T, E)
        kf = kf + kf * lp["tm_k_a"] * (ag - 1.0)

        shp = (B, T, H, N)
        out, state = _wkv7_scan(
            r.astype(jnp.float32).reshape(shp),
            w.reshape(shp),
            kf.reshape(shp),
            v.astype(jnp.float32).reshape(shp),
            -kk,
            kk * ag.reshape(shp),
            state0,
            valid,
        )
        # per-head groupnorm then scale/shift with time_mix_ln
        # (ref :115-123; skipped when the tensors are absent — arwkv7)
        if "tm_ln_w" in lp:
            y = _ln(out, 1.0, 0.0, GROUPNORM_EPS).reshape(B, T, E)
            y = y * lp["tm_ln_w"] + lp["tm_ln_b"]
        else:
            y = out.reshape(B, T, E)
        # bonus term: y += v * sum_head(r*k*r_k) (ref :124-127)
        rk = (
            (r.astype(jnp.float32).reshape(shp) * kf.reshape(shp))
            * lp["tm_r_k"].reshape(H, N)
        ).sum(-1, keepdims=True)  # (B, T, H, 1)
        y = y + (v.astype(jnp.float32).reshape(shp) * rk).reshape(B, T, E)
        y = y.astype(xn.dtype) * g.astype(xn.dtype)
        return y @ lp["tm_out"], state, v_first

    return time_mix


def make_rwkv7_forward(cfg):
    """fwd(params, tokens (B,T), positions-ignored, cache) ->
    (logits (B,T,V) f32, RWKV7Cache). Same call shape as the transformer
    forward so the Engine/Scheduler drive it unchanged."""
    eps = cfg.norm_eps
    E = cfg.n_embd
    time_mix = _build_time_mix(cfg)

    def channel_mix(lp, xn, x_prev):
        # ref rwkv7-base.cpp:7-26: k = relu(xk@Wk)^2, no receptance
        sx = x_prev - xn
        xk = xn + sx * lp["cm_lerp_k"]
        kk = jnp.square(jax.nn.relu(xk @ lp["cm_k"]))
        return kk @ lp["cm_v"]

    def fwd(params, tokens, positions, cache: RWKV7Cache):
        del positions
        valid = tokens >= 0
        any_valid = jnp.any(valid, axis=1)
        last_idx = jnp.maximum(jnp.sum(valid.astype(jnp.int32), axis=1) - 1, 0)
        x = params["tok_embd"][jnp.maximum(tokens, 0)]
        x = _ln(x, params["tok_norm_w"], params["tok_norm_b"], eps)
        B, T, _ = x.shape
        bidx = jnp.arange(B)

        def layer(carry, t):
            x, v_first = carry
            lp, shift0, wkv0, il = t
            att_norm = _ln(x, lp["ln1_w"], lp["ln1_b"], eps)
            x_prev = jnp.concatenate(
                [shift0[:, 0][:, None].astype(x.dtype), att_norm[:, :-1]], axis=1
            )
            att, wkv1, v_first = time_mix(
                lp, att_norm, x_prev, wkv0, valid, v_first, il
            )
            x = x + att
            ffn_norm = _ln(x, lp["ln2_w"], lp["ln2_b"], eps)
            x_prev2 = jnp.concatenate(
                [shift0[:, 1][:, None].astype(x.dtype), ffn_norm[:, :-1]], axis=1
            )
            x = x + channel_mix(lp, ffn_norm, x_prev2)
            shift1 = jnp.stack(
                [att_norm[bidx, last_idx], ffn_norm[bidx, last_idx]], axis=1
            ).astype(jnp.float32)
            keep = any_valid[:, None, None]
            shift1 = jnp.where(keep, shift1, shift0)
            return (x, v_first), (shift1, wkv1)

        il_arr = jnp.arange(cfg.n_layer)
        v_first0 = jnp.zeros((B, T, E), x.dtype)
        (x, _), (shift_new, wkv_new) = jax.lax.scan(
            layer, (x, v_first0), (params["layers"], cache.shift, cache.wkv, il_arr)
        )
        x = _ln(x, params["output_norm_w"], params["output_norm_b"], eps)
        logits = jnp.einsum(
            "bte,ev->btv", x, params["output"], preferred_element_type=jnp.float32
        )
        return logits, RWKV7Cache(shift=shift_new, wkv=wkv_new)

    return fwd


def load_rwkv7_layers(r, cfg, dtype=jnp.float32) -> dict:
    """Per-layer tensors (L-stacked) from an rwkv7 GGUF; canonical (in, out)
    orientations for x @ w. On-disk shapes follow the reference
    (llama-model.cpp LLM_ARCH_RWKV7 create_tensor dims, ggml ne order —
    numpy shapes are reversed):
      time_mix_w1 (n_lora_decay, E) -> transpose;  w2 (E, n_lora_decay);
      a1/a2, v1/v2, g1/g2 lora pairs likewise;  w0/a0/v0 (E,);
      time_mix_lerp_fused (6, 1, 1, E);  k_k/k_a/r_k (E,);
      matmul weights (out, in)."""
    L, E = cfg.n_layer, cfg.n_embd
    per: dict[str, list[np.ndarray]] = {}

    def add(k, a):
        if a is not None:
            per.setdefault(k, []).append(a)

    def lin(name, i, o):
        w = r.tensors.get(name)
        if w is None:
            return None
        w = w.to_f32()
        if w.shape == (o, i):
            return np.ascontiguousarray(w.T)
        assert w.shape == (i, o), (name, w.shape)
        return w

    def lora(p, stem):
        """(w1 (rank, E) -> (E, rank), w2 (E, rank) -> (rank, E))."""
        w1 = r.tensors[p + f"time_mix_{stem}1.weight"].to_f32()
        w2 = r.tensors[p + f"time_mix_{stem}2.weight"].to_f32()
        rank = w1.shape[0]
        assert w1.shape == (rank, E) and w2.shape == (E, rank), (w1.shape, w2.shape)
        return np.ascontiguousarray(w1.T), np.ascontiguousarray(w2.T)

    for i in range(L):
        p = f"blk.{i}."
        g = lambda n: (r.tensors[p + n].to_f32() if p + n in r.tensors else None)
        add("ln1_w", g("attn_norm.weight"))
        add("ln1_b", g("attn_norm.bias"))
        add("ln2_w", g("attn_norm_2.weight"))
        add("ln2_b", g("attn_norm_2.bias"))
        add("lerp_fused", g("time_mix_lerp_fused.weight").reshape(6, E))
        add("tm_w0", g("time_mix_w0.weight").reshape(E))
        w1, w2 = lora(p, "w")
        add("tm_w1", w1)
        add("tm_w2", w2)
        add("tm_a0", g("time_mix_a0.weight").reshape(E))
        a1, a2 = lora(p, "a")
        add("tm_a1", a1)
        add("tm_a2", a2)
        # layer 0's v-lora is unused (it DEFINES v_first); the reference
        # ships placeholder tensors there and so does our converter
        add("tm_v0", g("time_mix_v0.weight").reshape(E))
        v1, v2 = lora(p, "v")  # layer 0's rank may differ; padded below
        add("tm_v1", v1)
        add("tm_v2", v2)
        g1, g2 = lora(p, "g")
        add("tm_g1", g1)
        add("tm_g2", g2)
        add("tm_k_k", g("time_mix_k_k.weight").reshape(E))
        add("tm_k_a", g("time_mix_k_a.weight").reshape(E))
        add("tm_r_k", g("time_mix_r_k.weight").reshape(E))
        add("tm_r", lin(p + "time_mix_receptance.weight", E, E))
        add("tm_k", lin(p + "time_mix_key.weight", E, E))
        add("tm_v", lin(p + "time_mix_value.weight", E, E))
        add("tm_ln_w", g("time_mix_ln.weight"))
        add("tm_ln_b", g("time_mix_ln.bias"))
        add("tm_out", lin(p + "time_mix_output.weight", E, E))
        add("cm_lerp_k", g("channel_mix_lerp_k.weight").reshape(E))
        add("cm_k", lin(p + "channel_mix_key.weight", E, cfg.n_ff))
        add("cm_v", lin(p + "channel_mix_value.weight", cfg.n_ff, E))

    # layer 0's (unused) v-lora placeholder has the iclr rank while later
    # layers use the value-res-mix rank — zero-pad to a common width so
    # the stack is scan-able (padding columns contribute exactly 0)
    R = max(a.shape[1] for a in per["tm_v1"])
    per["tm_v1"] = [np.pad(a, ((0, 0), (0, R - a.shape[1]))) for a in per["tm_v1"]]
    per["tm_v2"] = [np.pad(a, ((0, R - a.shape[0]), (0, 0))) for a in per["tm_v2"]]

    out = {}
    for k, arrs in per.items():
        assert len(arrs) == L, f"{k}: {len(arrs)} != {L}"
        out[k] = jnp.asarray(np.stack(arrs), dtype)
    return out


# ---------------------------------------------------------------------------
# arwkv7: rwkv7 time-mix inside a qwen-shaped block (ref
# src/models/arwkv7.cpp — RMS pre-norms, gated-silu FFN, no channel mix;
# time-mix shared with rwkv7, groupnorm only if time_mix_ln present)


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return ((xf * jax.lax.rsqrt(ms + eps)) * w).astype(x.dtype)


def make_arwkv7_forward(cfg):
    eps = cfg.norm_eps
    E = cfg.n_embd
    time_mix = _build_time_mix(cfg)

    def fwd(params, tokens, positions, cache: RWKV7Cache):
        del positions
        valid = tokens >= 0
        any_valid = jnp.any(valid, axis=1)
        last_idx = jnp.maximum(jnp.sum(valid.astype(jnp.int32), axis=1) - 1, 0)
        x = params["tok_embd"][jnp.maximum(tokens, 0)]
        B, T, _ = x.shape
        bidx = jnp.arange(B)

        def layer(carry, t):
            x, v_first = carry
            lp, shift0, wkv0, il = t
            att_norm = _rms(x, lp["ln1_w"], eps)
            x_prev = jnp.concatenate(
                [shift0[:, 0][:, None].astype(x.dtype), att_norm[:, :-1]],
                axis=1)
            att, wkv1, v_first = time_mix(
                lp, att_norm, x_prev, wkv0, valid, v_first, il)
            x = x + att
            h = _rms(x, lp["ln2_w"], eps)
            up = h @ lp["w_up"]
            gate = jax.nn.silu((h @ lp["w_gate"]).astype(jnp.float32))
            x = x + (gate.astype(h.dtype) * up) @ lp["w_down"]
            shift1 = jnp.stack(
                [att_norm[bidx, last_idx],
                 jnp.zeros_like(att_norm[bidx, last_idx])], axis=1
            ).astype(jnp.float32)
            shift1 = jnp.where(any_valid[:, None, None], shift1, shift0)
            return (x, v_first), (shift1, wkv1)

        il_arr = jnp.arange(cfg.n_layer)
        v_first0 = jnp.zeros((B, T, E), x.dtype)
        (x, _), (shift_new, wkv_new) = jax.lax.scan(
            layer, (x, v_first0),
            (params["layers"], cache.shift, cache.wkv, il_arr))
        x = _rms(x, params["output_norm_w"], eps)
        logits = jnp.einsum("bte,ev->btv", x, params["output"],
                            preferred_element_type=jnp.float32)
        return logits, RWKV7Cache(shift=shift_new, wkv=wkv_new)

    return fwd


def load_arwkv7_layers(r, cfg, dtype=jnp.float32) -> dict:
    """arwkv7 GGUF layers (llama-arch.cpp LLM_ARCH_ARWKV7: rwkv7 time-mix
    tensors, rms attn/ffn norms, qwen ffn, no channel mix / time_mix_ln)."""
    L, E, F = cfg.n_layer, cfg.n_embd, cfg.n_ff
    per: dict[str, list[np.ndarray]] = {}

    def add(k, a):
        if a is not None:
            per.setdefault(k, []).append(a)

    def lin(name, i, o):
        w = r.tensors.get(name)
        if w is None:
            return None
        w = w.to_f32()
        if w.shape == (o, i):
            return np.ascontiguousarray(w.T)
        assert w.shape == (i, o), (name, w.shape)
        return w

    def lora(p, stem):
        w1 = r.tensors[p + f"time_mix_{stem}1.weight"].to_f32()
        w2 = r.tensors[p + f"time_mix_{stem}2.weight"].to_f32()
        rank = w1.shape[0]
        assert w1.shape == (rank, E) and w2.shape == (E, rank)
        return np.ascontiguousarray(w1.T), np.ascontiguousarray(w2.T)

    for i in range(L):
        p = f"blk.{i}."
        g = lambda n: (r.tensors[p + n].to_f32() if p + n in r.tensors
                       else None)
        add("ln1_w", g("attn_norm.weight"))
        add("ln2_w", g("ffn_norm.weight"))
        add("lerp_fused", g("time_mix_lerp_fused.weight").reshape(6, E))
        add("tm_w0", g("time_mix_w0.weight").reshape(E))
        w1, w2 = lora(p, "w")
        add("tm_w1", w1)
        add("tm_w2", w2)
        add("tm_a0", g("time_mix_a0.weight").reshape(E))
        a1, a2 = lora(p, "a")
        add("tm_a1", a1)
        add("tm_a2", a2)
        add("tm_v0", g("time_mix_v0.weight").reshape(E))
        v1, v2 = lora(p, "v")
        add("tm_v1", v1)
        add("tm_v2", v2)
        g1, g2 = lora(p, "g")
        add("tm_g1", g1)
        add("tm_g2", g2)
        add("tm_k_k", g("time_mix_k_k.weight").reshape(E))
        add("tm_k_a", g("time_mix_k_a.weight").reshape(E))
        add("tm_r_k", g("time_mix_r_k.weight").reshape(E))
        add("tm_r", lin(p + "time_mix_receptance.weight", E, E))
        add("tm_k", lin(p + "time_mix_key.weight", E, E))
        add("tm_v", lin(p + "time_mix_value.weight", E, E))
        add("tm_ln_w", g("time_mix_ln.weight"))
        add("tm_ln_b", g("time_mix_ln.bias"))
        add("tm_out", lin(p + "time_mix_output.weight", E, E))
        add("w_up", lin(p + "ffn_up.weight", E, F))
        add("w_gate", lin(p + "ffn_gate.weight", E, F))
        add("w_down", lin(p + "ffn_down.weight", F, E))

    out = {}
    for k, arrs in per.items():
        assert len(arrs) == L, f"{k}: {len(arrs)} != {L}"
        want = jnp.float32 if ("ln" in k or "lerp" in k or k in (
            "tm_w0", "tm_a0", "tm_v0", "tm_k_k", "tm_k_a", "tm_r_k")
        ) else dtype
        out[k] = jnp.asarray(np.stack(arrs), want)
    return out
