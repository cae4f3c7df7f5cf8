"""RWKV6 (Finch) forward — linear-attention recurrent family.

Parity targets (behavior, not code):
  ref graph builders: src/models/rwkv6.cpp, src/models/rwkv6-base.cpp
  ref wkv kernel math: ggml/src/ggml-cpu/ops.cpp (ggml_compute_forward_rwkv_wkv6:
    out[j] += r_i * (tf_i * k_i * v_j + S_ij);  S_ij <- S_ij * w_i + k_i * v_j)
  ref state handling: src/llama-memory-recurrent.cpp (token_shift_count=2)

TPU-first design: everything except the wkv recurrence is computed for ALL
T positions at once (token-shift is a plain sequence shift, not a
recurrence — the five lerp projections, r/k/v/g, the decay MLP and both
channel-mix matmuls are batched MXU matmuls). Only the order-1 wkv state
update runs under lax.scan over time, carrying (B, H, N, N) f32 — pure
VPU elementwise work per step. The reference instead runs a CUDA/CPU
kernel per token over the whole stack.

State per layer per sequence (the analogue of llama_memory_recurrent):
  shift (2, E)   — last token's att_norm / ffn_norm (token_shift_count=2)
  wkv   (H, N, N) f32 — per-head linear-attention state, i=key dim,
                   j=value dim (ggml state layout h*N*N + i*N + j)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

GROUPNORM_EPS = 64e-5  # ref: rwkv6-base.cpp ggml_norm(ctx0, cur, 64e-5f)


class RWKV6Cache(NamedTuple):
    shift: jnp.ndarray  # (L, B, 2, E) f32
    wkv: jnp.ndarray  # (L, B, H, N, N) f32


def init_rwkv6_cache(cfg, batch: int, dtype=jnp.float32) -> RWKV6Cache:
    L, E = cfg.n_layer, cfg.n_embd
    N = cfg.wkv_head_size
    H = E // N
    return RWKV6Cache(
        shift=jnp.zeros((L, batch, 2, E), jnp.float32),
        wkv=jnp.zeros((L, batch, H, N, N), jnp.float32),
    )


def _ln(x, w, b, eps):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean(jnp.square(x - m), axis=-1, keepdims=True)
    y = (x - m) * jax.lax.rsqrt(v + eps)
    return y * w + b


def _wkv6_scan(r, k, v, w, tf, state0, valid):
    """The wkv6 recurrence over time.

    r/k/v/w: (B, T, H, N) f32;  tf: (H, N);  state0: (B, H, N, N);
    valid: (B, T) bool — padded steps pass state through untouched.
    Returns (out (B, T, H, N), state (B, H, N, N))."""

    def step(S, inp):
        r_t, k_t, v_t, w_t, valid_t = inp  # (B, H, N), …, (B,)
        kv = k_t[..., :, None] * v_t[..., None, :]  # (B, H, N, N) i,j
        # out_j = sum_i r_i * (tf_i * kv_ij + S_ij)
        acc = tf[None, :, :, None] * kv + S
        out = jnp.einsum("bhi,bhij->bhj", r_t, acc)
        S_new = S * w_t[..., :, None] + kv
        S = jnp.where(valid_t[:, None, None, None], S_new, S)
        return S, out

    xs = (
        jnp.swapaxes(r, 0, 1),
        jnp.swapaxes(k, 0, 1),
        jnp.swapaxes(v, 0, 1),
        jnp.swapaxes(w, 0, 1),
        jnp.swapaxes(valid, 0, 1),
    )
    state, out = jax.lax.scan(step, state0, xs)
    return jnp.swapaxes(out, 0, 1), state


def make_rwkv6_forward(cfg):
    """fwd(params, tokens (B,T), positions-ignored, cache) ->
    (logits (B,T,V) f32, RWKV6Cache). Same call shape as the transformer
    forward so the Engine/Scheduler drive it unchanged."""
    eps = cfg.norm_eps
    E = cfg.n_embd
    N = cfg.wkv_head_size
    H = E // N
    ed = cfg.time_mix_extra_dim
    rescale_every = cfg.rescale_every_n_layers

    def time_mix(lp, xn, x_prev, state0, valid):
        B, T, _ = xn.shape
        sx = x_prev - xn
        xxx = xn + sx * lp["tm_lerp_x"]
        tm = jnp.tanh(xxx @ lp["tm_w1"])  # (B, T, 5*ed)
        tm = tm.reshape(B, T, 5, ed)
        # per-mode low-rank lerp deltas: (B, T, 5, E)
        deltas = jnp.einsum("btme,med->btmd", tm, lp["tm_w2"])
        # fused lerp (ref rwkv6-base.cpp:66-75): x_m = xn + sx*(delta_m + mu_m)
        xm = xn[:, :, None, :] + sx[:, :, None, :] * (
            deltas + lp["tm_lerp_fused"]
        )  # order: w, k, v, r, g
        xw, xk, xv, xr, xg = [xm[:, :, m] for m in range(5)]

        r = xr @ lp["tm_r"]
        k = xk @ lp["tm_k"]
        v = xv @ lp["tm_v"]
        if "tm_r_b" in lp:
            r = r + lp["tm_r_b"]
        if "tm_k_b" in lp:
            k = k + lp["tm_k_b"]
        if "tm_v_b" in lp:
            v = v + lp["tm_v_b"]
        g = jax.nn.silu(xg @ lp["tm_g"])

        # data-dependent decay (ref :120-125): w = exp(-exp(lora(xw)+decay))
        dec = jnp.tanh(xw @ lp["tm_decay_w1"]) @ lp["tm_decay_w2"]
        dec = dec + lp["tm_decay"]
        w = jnp.exp(-jnp.exp(dec.astype(jnp.float32)))

        shp = (B, T, H, N)
        out, state = _wkv6_scan(
            r.astype(jnp.float32).reshape(shp),
            k.astype(jnp.float32).reshape(shp),
            v.astype(jnp.float32).reshape(shp),
            w.reshape(shp),
            lp["tm_first"].astype(jnp.float32),
            state0,
            valid,
        )
        # per-head groupnorm, then scale/shift with time_mix_ln (ref :147-154)
        y = _ln(out, 1.0, 0.0, GROUPNORM_EPS).reshape(B, T, E)
        y = y * lp["tm_ln_w"] + lp["tm_ln_b"]
        y = y.astype(xn.dtype) * g
        return y @ lp["tm_out"], state

    def channel_mix(lp, xn, x_prev):
        # ref rwkv6-base.cpp:7-27
        sx = x_prev - xn
        xk = xn + sx * lp["cm_lerp_k"]
        xr = xn + sx * lp["cm_lerp_r"]
        rr = jax.nn.sigmoid(xr @ lp["cm_r"])
        kk = jnp.square(jax.nn.relu(xk @ lp["cm_k"]))
        return rr * (kk @ lp["cm_v"])

    def fwd(params, tokens, positions, cache: RWKV6Cache):
        del positions  # no positional encoding in RWKV
        valid = tokens >= 0  # trailing bucket padding must not touch state
        any_valid = jnp.any(valid, axis=1)  # (B,)
        # index of the last real token per row (shift state source)
        last_idx = jnp.maximum(jnp.sum(valid.astype(jnp.int32), axis=1) - 1, 0)
        x = params["tok_embd"][jnp.maximum(tokens, 0)]  # (B, T, E)
        x = _ln(x, params["tok_norm_w"], params["tok_norm_b"], eps)
        B, T, _ = x.shape
        bidx = jnp.arange(B)

        def layer(x, t):
            lp, shift0, wkv0, il = t
            att_norm = _ln(x, lp["ln1_w"], lp["ln1_b"], eps)
            x_prev = jnp.concatenate(
                [shift0[:, 0][:, None].astype(x.dtype), att_norm[:, :-1]], axis=1
            )
            att, wkv1 = time_mix(lp, att_norm, x_prev, wkv0, valid)
            x = x + att
            ffn_norm = _ln(x, lp["ln2_w"], lp["ln2_b"], eps)
            x_prev2 = jnp.concatenate(
                [shift0[:, 1][:, None].astype(x.dtype), ffn_norm[:, :-1]], axis=1
            )
            x = x + channel_mix(lp, ffn_norm, x_prev2)
            if rescale_every:
                x = jnp.where((il + 1) % rescale_every == 0, x * 0.5, x)
            shift1 = jnp.stack(
                [att_norm[bidx, last_idx], ffn_norm[bidx, last_idx]], axis=1
            ).astype(jnp.float32)
            keep = any_valid[:, None, None]
            shift1 = jnp.where(keep, shift1, shift0)
            return x, (shift1, wkv1)

        il_arr = jnp.arange(cfg.n_layer)
        x, (shift_new, wkv_new) = jax.lax.scan(
            layer, x, (params["layers"], cache.shift, cache.wkv, il_arr)
        )
        x = _ln(x, params["output_norm_w"], params["output_norm_b"], eps)
        logits = jnp.einsum(
            "bte,ev->btv", x, params["output"], preferred_element_type=jnp.float32
        )
        return logits, RWKV6Cache(shift=shift_new, wkv=wkv_new)

    return fwd


def load_rwkv6_layers(r, cfg, dtype=jnp.float32) -> dict:
    """Per-layer tensors (L-stacked) from an rwkv6 GGUF; canonical (in, out)
    orientations for x @ w. On-disk shapes follow the reference converter
    (convert_hf_to_gguf.py Rwkv6Model.modify_tensors):
      time_mix_w1 (5*ed, E);  time_mix_w2 (5, E, ed);
      time_mix_decay_w1 (dd, E);  time_mix_decay_w2 (E, dd);
      time_mix_lerp_fused (5, 1, 1, E);  time_mix_first (H, N);
      matmul weights (out, in)."""
    L, E = cfg.n_layer, cfg.n_embd
    N = cfg.wkv_head_size
    H = E // N
    ed = cfg.time_mix_extra_dim
    F = cfg.n_ff
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

    for i in range(L):
        p = f"blk.{i}."
        g = lambda n: (
            r.tensors[p + n].to_f32() if p + n in r.tensors else None
        )
        add("ln1_w", g("attn_norm.weight"))
        add("ln1_b", g("attn_norm.bias"))
        add("ln2_w", g("attn_norm_2.weight"))
        add("ln2_b", g("attn_norm_2.bias"))
        add("tm_lerp_x", g("time_mix_lerp_x.weight").reshape(E))
        fused = g("time_mix_lerp_fused.weight")
        if fused is None:
            # pre-fused GGUFs carry five separate lerp vectors; the fused
            # form is mathematically identical (ref rwkv6-base.cpp:76-89)
            fused = np.stack(
                [g(f"time_mix_lerp_{m}.weight").reshape(E) for m in "wkvrg"]
            )
        add("tm_lerp_fused", fused.reshape(5, E))
        w1 = g("time_mix_w1.weight")  # (5*ed, E)
        assert w1.shape == (5 * ed, E), w1.shape
        add("tm_w1", np.ascontiguousarray(w1.T))
        w2 = g("time_mix_w2.weight")  # (5, E, ed)
        assert w2.shape == (5, E, ed), w2.shape
        add("tm_w2", np.ascontiguousarray(np.swapaxes(w2, 1, 2)))  # (5, ed, E)
        dd = cfg.time_decay_extra_dim
        dw1 = g("time_mix_decay_w1.weight")  # (dd, E)
        assert dw1.shape == (dd, E), dw1.shape
        add("tm_decay_w1", np.ascontiguousarray(dw1.T))
        dw2 = g("time_mix_decay_w2.weight")  # (E, dd)
        assert dw2.shape == (E, dd), dw2.shape
        add("tm_decay_w2", np.ascontiguousarray(dw2.T))
        add("tm_decay", g("time_mix_decay.weight").reshape(E))
        add("tm_first", g("time_mix_first.weight").reshape(H, N))
        add("tm_r", lin(p + "time_mix_receptance.weight", E, E))
        add("tm_k", lin(p + "time_mix_key.weight", E, E))
        add("tm_v", lin(p + "time_mix_value.weight", E, E))
        add("tm_g", lin(p + "time_mix_gate.weight", E, E))
        add("tm_r_b", g("time_mix_receptance.bias"))
        add("tm_k_b", g("time_mix_key.bias"))
        add("tm_v_b", g("time_mix_value.bias"))
        add("tm_ln_w", g("time_mix_ln.weight"))
        add("tm_ln_b", g("time_mix_ln.bias"))
        add("tm_out", lin(p + "time_mix_output.weight", E, E))
        add("cm_lerp_k", g("channel_mix_lerp_k.weight").reshape(E))
        add("cm_lerp_r", g("channel_mix_lerp_r.weight").reshape(E))
        add("cm_k", lin(p + "channel_mix_key.weight", E, F))
        add("cm_r", lin(p + "channel_mix_receptance.weight", E, E))
        add("cm_v", lin(p + "channel_mix_value.weight", F, E))

    out = {}
    for k, arrs in per.items():
        assert len(arrs) == L, f"{k}: {len(arrs)} != {L}"
        want = jnp.float32 if ("ln" in k or "lerp" in k or k in (
            "tm_decay", "tm_first")) else dtype
        out[k] = jnp.asarray(np.stack(arrs), want)
    return out


# ---------------------------------------------------------------------------
# rwkv6qwen2 (qrwkv): rwkv6 time-mix inside a qwen2-shaped block
# (ref src/models/rwkv6qwen2.cpp + the is_qrwkv branches of
# rwkv6-base.cpp:48-157 — sigmoid gate, GQA k/v repeat, k *= (1-w),
# ggml_gated_linear_attn with head_size^-0.5 scale, no bonus/groupnorm,
# RMS pre-norms, gated-silu FFN, no channel mix)


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return ((xf * jax.lax.rsqrt(ms + eps)) * w).astype(x.dtype)


def _gla_scan(r, k, v, w, state0, valid, scale):
    """Gated linear attention (ggml_gated_linear_attn):
    S' = S*w + k⊗v; out = scale * r·S'."""

    def step(S, inp):
        r_t, k_t, v_t, w_t, valid_t = inp
        kv = k_t[..., :, None] * v_t[..., None, :]
        S_new = S * w_t[..., :, None] + kv
        out = scale * jnp.einsum("bhi,bhij->bhj", r_t, S_new)
        S = jnp.where(valid_t[:, None, None, None], S_new, S)
        return S, out

    xs = tuple(jnp.swapaxes(a, 0, 1) for a in (r, k, v, w)) + (
        jnp.swapaxes(valid, 0, 1),)
    state, out = jax.lax.scan(step, state0, xs)
    return jnp.swapaxes(out, 0, 1), state


def make_rwkv6qwen2_forward(cfg):
    """fwd(params, tokens, positions-ignored, cache) -> (logits, cache)."""
    eps = cfg.norm_eps
    E = cfg.n_embd
    N = cfg.wkv_head_size
    H = E // N
    Hkv = cfg.n_head_kv if cfg.n_head_kv > 0 else H
    rep = H // Hkv
    ed = cfg.time_mix_extra_dim

    def time_mix(lp, xn, x_prev, state0, valid):
        B, T, _ = xn.shape
        sx = x_prev - xn
        xxx = xn + sx * lp["tm_lerp_x"]
        tm = jnp.tanh(xxx @ lp["tm_w1"]).reshape(B, T, 5, ed)
        deltas = jnp.einsum("btme,med->btmd", tm, lp["tm_w2"])
        xm = xn[:, :, None, :] + sx[:, :, None, :] * (
            deltas + lp["tm_lerp_fused"])
        xw, xk, xv, xr, xg = [xm[:, :, m] for m in range(5)]

        r = xr @ lp["tm_r"]
        k = xk @ lp["tm_k"]
        v = xv @ lp["tm_v"]
        if "tm_r_b" in lp:
            r = r + lp["tm_r_b"]
        if "tm_k_b" in lp:
            k = k + lp["tm_k_b"]
        if "tm_v_b" in lp:
            v = v + lp["tm_v_b"]
        g = jax.nn.sigmoid((xg @ lp["tm_g"]).astype(jnp.float32))

        dec = jnp.tanh(xw @ lp["tm_decay_w1"]) @ lp["tm_decay_w2"]
        dec = dec + lp["tm_decay"]
        w = jnp.exp(-jnp.exp(dec.astype(jnp.float32)))  # (B, T, E)

        # GQA: repeat kv heads consecutively (ggml repeat over the
        # group dim; matches HF repeat_kv ordering)
        k = jnp.repeat(k.reshape(B, T, Hkv, N), rep, axis=2)
        v = jnp.repeat(v.reshape(B, T, Hkv, N), rep, axis=2)
        wf = w.reshape(B, T, H, N)
        k = k.astype(jnp.float32) * (1.0 - wf)  # ref rwkv6-base.cpp:131
        out, state = _gla_scan(
            r.astype(jnp.float32).reshape(B, T, H, N), k,
            v.astype(jnp.float32), wf, state0, valid, N ** -0.5)
        y = out.reshape(B, T, E) * g
        return y.astype(xn.dtype) @ lp["tm_out"], state

    def fwd(params, tokens, positions, cache: RWKV6Cache):
        del positions
        valid = tokens >= 0
        any_valid = jnp.any(valid, axis=1)
        last_idx = jnp.maximum(jnp.sum(valid.astype(jnp.int32), axis=1) - 1, 0)
        x = params["tok_embd"][jnp.maximum(tokens, 0)]
        B, T, _ = x.shape
        bidx = jnp.arange(B)

        def layer(x, t):
            lp, shift0, wkv0 = t
            att_norm = _rms(x, lp["ln1_w"], eps)
            x_prev = jnp.concatenate(
                [shift0[:, 0][:, None].astype(x.dtype), att_norm[:, :-1]],
                axis=1)
            att, wkv1 = time_mix(lp, att_norm, x_prev, wkv0, valid)
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
            return x, (shift1, wkv1)

        x, (shift_new, wkv_new) = jax.lax.scan(
            layer, x, (params["layers"], cache.shift, cache.wkv))
        x = _rms(x, params["output_norm_w"], eps)
        logits = jnp.einsum("bte,ev->btv", x, params["output"],
                            preferred_element_type=jnp.float32)
        return logits, RWKV6Cache(shift=shift_new, wkv=wkv_new)

    return fwd


def load_rwkv6qwen2_layers(r, cfg, dtype=jnp.float32) -> dict:
    """Per-layer tensors (L-stacked) from an rwkv6qwen2 GGUF (tensor table:
    llama-arch.cpp LLM_ARCH_RWKV6QWEN2 — no first/ln/channel-mix)."""
    L, E, F = cfg.n_layer, cfg.n_embd, cfg.n_ff
    N = cfg.wkv_head_size
    H = E // N
    Hkv = cfg.n_head_kv if cfg.n_head_kv > 0 else H
    ed = cfg.time_mix_extra_dim
    dd = cfg.time_decay_extra_dim
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

    for i in range(L):
        p = f"blk.{i}."
        g = lambda n: (
            r.tensors[p + n].to_f32() if p + n in r.tensors else None)
        add("ln1_w", g("attn_norm.weight"))
        add("ln2_w", g("ffn_norm.weight"))
        add("tm_lerp_x", g("time_mix_lerp_x.weight").reshape(E))
        add("tm_lerp_fused", g("time_mix_lerp_fused.weight").reshape(5, E))
        add("tm_w1", np.ascontiguousarray(g("time_mix_w1.weight").T))
        add("tm_w2", np.ascontiguousarray(
            np.swapaxes(g("time_mix_w2.weight"), 1, 2)))
        add("tm_decay_w1", np.ascontiguousarray(
            g("time_mix_decay_w1.weight").T))
        add("tm_decay_w2", np.ascontiguousarray(
            g("time_mix_decay_w2.weight").T))
        add("tm_decay", g("time_mix_decay.weight").reshape(E))
        add("tm_r", lin(p + "time_mix_receptance.weight", E, H * N))
        add("tm_k", lin(p + "time_mix_key.weight", E, Hkv * N))
        add("tm_v", lin(p + "time_mix_value.weight", E, Hkv * N))
        add("tm_g", lin(p + "time_mix_gate.weight", E, E))
        add("tm_r_b", g("time_mix_receptance.bias"))
        add("tm_k_b", g("time_mix_key.bias"))
        add("tm_v_b", g("time_mix_value.bias"))
        add("tm_out", lin(p + "time_mix_output.weight", E, E))
        add("w_up", lin(p + "ffn_up.weight", E, F))
        add("w_gate", lin(p + "ffn_gate.weight", E, F))
        add("w_down", lin(p + "ffn_down.weight", F, E))

    out = {}
    for k, arrs in per.items():
        assert len(arrs) == L, f"{k}: {len(arrs)} != {L}"
        want = jnp.float32 if ("ln" in k or "lerp" in k
                               or k == "tm_decay") else dtype
        out[k] = jnp.asarray(np.stack(arrs), want)
    return out
