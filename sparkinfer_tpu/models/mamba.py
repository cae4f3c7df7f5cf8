"""Mamba (S6 selective state space) forward — the recurrent-memory model
family (ref: src/models/mamba.cpp graph builder + llama-memory-recurrent.cpp
state handling; arch KVs mamba.ssm.* read like src/llama-model.cpp).

State per layer per sequence (the analogue of llama_memory_recurrent):
  conv_state (d_conv-1, d_inner) — rolling window for the causal conv
  ssm_state  (d_inner, d_state)  — the selective-scan recurrence

Prefill runs the scan over time with lax.scan (associative-scan form is a
future optimization); decode is the O(1) single-step recurrence. Both are
pure functions of (params, tokens, state) -> (logits, state), so the same
engine/scheduler machinery applies with MambaCache instead of KVCache.

Math (Mamba-1):
  x, z = split(in_proj(u))
  x = silu(causal_conv1d(x))
  dt, B, C = split(x_proj(x));  dt = softplus(dt_proj(dt))
  A = -exp(A_log);  dA = exp(dt * A);  dB = dt * B
  h' = dA * h + dB * x;  y = (h' @ C) + D * x
  out = out_proj(y * silu(z))
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import rms_norm


class MambaCache(NamedTuple):
    conv: jnp.ndarray  # (L, B, d_conv-1, conv_width)
    ssm: jnp.ndarray  # (L, B, d_inner, d_state)


def _conv_width(cfg) -> int:
    """Mamba-2 convolves [x; B; C] together (d_inner + 2*G*d_state wide,
    ref llama-model.cpp:4322); mamba-1 convolves x alone."""
    if cfg.ssm_n_group > 0:
        return cfg.ssm_d_inner + 2 * cfg.ssm_n_group * cfg.ssm_d_state
    return cfg.ssm_d_inner


def init_mamba_cache(cfg, batch: int, dtype=jnp.float32) -> MambaCache:
    L = cfg.n_layer
    return MambaCache(
        conv=jnp.zeros((L, batch, cfg.ssm_d_conv - 1, _conv_width(cfg)), dtype),
        ssm=jnp.zeros((L, batch, cfg.ssm_d_inner, cfg.ssm_d_state), dtype),
    )


def _layer_step(lp, u, conv_state, ssm_state, cfg):
    """One token for one layer. u (B, E); states per shapes above."""
    B = u.shape[0]
    d_in = cfg.ssm_d_inner
    d_state = cfg.ssm_d_state
    dt_rank = cfg.ssm_dt_rank

    xz = u @ lp["ssm_in"]  # (B, 2*d_in)
    x, z = xz[:, :d_in], xz[:, d_in:]

    # causal conv over the last d_conv inputs
    window = jnp.concatenate([conv_state, x[:, None, :]], axis=1)  # (B, d_conv, d_in)
    x = jnp.einsum("bcd,cd->bd", window, lp["conv_w"]) + lp["conv_b"]
    new_conv = window[:, 1:, :]
    x = jax.nn.silu(x.astype(jnp.float32))

    dbc = x @ lp["ssm_x"]  # (B, dt_rank + 2*d_state)
    dt = dbc[:, :dt_rank]
    Bm = dbc[:, dt_rank : dt_rank + d_state]
    Cm = dbc[:, dt_rank + d_state :]
    if "ssm_dt_norm_w" in lp:
        # jamba-style dt/B/C RMS norms (ref graph-context-mamba.cpp:94-97)
        dt = rms_norm(dt, lp["ssm_dt_norm_w"], cfg.norm_eps)
        Bm = rms_norm(Bm, lp["ssm_b_norm_w"], cfg.norm_eps)
        Cm = rms_norm(Cm, lp["ssm_c_norm_w"], cfg.norm_eps)
    dt = jax.nn.softplus(dt @ lp["ssm_dt"] + lp["ssm_dt_b"])  # (B, d_in)

    # GGUF convention: ssm_a already holds A = -exp(A_log) (the reference
    # converter transforms at write — convert_hf_to_gguf.py MambaModel
    # "A_log --> A"), so reference-produced GGUFs load directly
    A = lp["ssm_a"].astype(jnp.float32)  # (d_in, d_state)
    dA = jnp.exp(dt[:, :, None] * A[None])  # (B, d_in, d_state)
    dBx = (dt * x)[:, :, None] * Bm[:, None, :]  # (B, d_in, d_state)
    h = dA * ssm_state + dBx
    y = jnp.einsum("bds,bs->bd", h, Cm) + lp["ssm_d"] * x  # (B, d_in)
    y = y * jax.nn.silu(z.astype(jnp.float32))
    out = y.astype(u.dtype) @ lp["ssm_out"]  # (B, E)
    return out, new_conv, h


def _layer_step2(lp, u, conv_state, ssm_state, cfg):
    """One token of a Mamba-2 (SSD) block (ref build_mamba2_layer,
    graph-context-mamba.cpp, + the ggml_ssm_scan mamba-2 branch
    ggml-cpu/ops.cpp:8897-8905: scalar dA per head, grouped B/C)."""
    B = u.shape[0]
    d_in = cfg.ssm_d_inner
    ds = cfg.ssm_d_state
    nh = cfg.ssm_dt_rank  # head count (ssm.time_step_rank carries n_head)
    hd = d_in // nh
    G = cfg.ssm_n_group
    d_xbc = d_in + 2 * G * ds

    zxbcdt = u @ lp["ssm_in"]  # (B, 2*d_in + 2*G*ds + nh)
    z = zxbcdt[:, :d_in]
    xBC = zxbcdt[:, d_in : d_in + d_xbc]
    dt = zxbcdt[:, d_in + d_xbc :]  # (B, nh)

    window = jnp.concatenate([conv_state, xBC[:, None, :]], axis=1)
    xBC = jnp.einsum("bcd,cd->bd", window, lp["conv_w"]) + lp["conv_b"]
    new_conv = window[:, 1:, :]
    xBC = jax.nn.silu(xBC.astype(jnp.float32))

    x = xBC[:, :d_in].reshape(B, nh, hd)
    Bm = xBC[:, d_in : d_in + G * ds].reshape(B, G, ds)
    Cm = xBC[:, d_in + G * ds :].reshape(B, G, ds)

    dt_sp = jax.nn.softplus(dt.astype(jnp.float32) + lp["ssm_dt_b"])  # (B, nh)
    A = lp["ssm_a"].reshape(nh)  # already -exp(A_log), scalar per head
    dA = jnp.exp(dt_sp * A)  # (B, nh)

    g_idx = jnp.arange(nh, dtype=jnp.int32) // (nh // G)  # repeat_interleave
    Bh = Bm[:, g_idx]  # (B, nh, ds)
    Ch = Cm[:, g_idx]
    h0 = ssm_state.reshape(B, nh, hd, ds)
    xdt = x * dt_sp[:, :, None]  # (B, nh, hd)
    h = dA[:, :, None, None] * h0 + xdt[..., None] * Bh[:, :, None, :]
    y = jnp.einsum("bhds,bhs->bhd", h, Ch)
    y = y + lp["ssm_d"].reshape(nh)[None, :, None] * x  # D per head
    y = y.reshape(B, d_in) * jax.nn.silu(z.astype(jnp.float32))

    if "ssm_norm" in lp:
        # grouped gated RMS norm (ssm_norm {d_inner/G, G} —
        # llama-model.cpp:4332; variance per group, matching the official
        # mamba layernorm_gated). Optional: falcon-h1 with
        # mamba_rms_norm=false has no ssm_norm (build_mamba2_layer guards)
        yg = y.reshape(B, G, d_in // G)
        var = jnp.mean(yg * yg, axis=-1, keepdims=True)
        yg = yg * jax.lax.rsqrt(var + cfg.norm_eps)
        y = (yg * lp["ssm_norm"].reshape(G, d_in // G)).reshape(B, d_in)

    out = y.astype(u.dtype) @ lp["ssm_out"]
    return out, new_conv, h.reshape(B, d_in, ds)


def make_mamba_forward(cfg):
    """fwd(params, tokens (B,T), positions-ignored, cache) ->
    (logits (B,T,V) f32, MambaCache). Same call shape as the transformer
    forward so Engine-style drivers can reuse it."""
    eps = cfg.norm_eps
    step = _layer_step2 if cfg.ssm_n_group > 0 else _layer_step

    def fwd(params, tokens, positions, cache: MambaCache):
        # tokens < 0 are PADDING no-ops: state must pass through untouched
        # (unlike attention, a recurrent state absorbs every consumed token,
        # so bucket-padded prefill would otherwise corrupt it)
        valid = (tokens >= 0)  # (B, T)
        x = params["tok_embd"][jnp.maximum(tokens, 0)]  # (B, T, E)
        B, T, E = x.shape
        layers = params["layers"]

        def layer_scan(x_seq, layer_in):
            lp, conv0, ssm0 = layer_in

            def time_step(carry, inp):
                u_t, v_t = inp  # (B, E), (B,)
                conv_s, ssm_s = carry
                h = rms_norm(u_t, lp["attn_norm_w"], eps)
                out, conv_n, ssm_n = step(lp, h, conv_s, ssm_s, cfg)
                keep = v_t[:, None]
                conv_n = jnp.where(keep[:, :, None], conv_n, conv_s)
                ssm_n = jnp.where(keep[:, :, None], ssm_n, ssm_s)
                out = jnp.where(keep, out, 0.0)
                return (conv_n, ssm_n), u_t + out.astype(u_t.dtype)

            (conv1, ssm1), y_seq = jax.lax.scan(
                time_step, (conv0, ssm0),
                (jnp.swapaxes(x_seq, 0, 1), jnp.swapaxes(valid, 0, 1)),
            )
            return jnp.swapaxes(y_seq, 0, 1), (conv1, ssm1)

        def body(carry_x, t):
            lp, conv0, ssm0 = t
            y, (c1, s1) = layer_scan(carry_x, (lp, conv0, ssm0))
            return y, (c1, s1)

        x, (conv_new, ssm_new) = jax.lax.scan(body, x, (layers, cache.conv, cache.ssm))
        x = rms_norm(x, params["output_norm_w"], eps)
        logits = jnp.einsum("bte,ev->btv", x, params["output"],
                            preferred_element_type=jnp.float32)
        return logits, MambaCache(conv=conv_new, ssm=ssm_new)

    return fwd


def load_mamba_layers(r, cfg) -> dict:
    """Per-layer tensors (stacked) from a mamba GGUF; canonical (in, out)
    orientations for x @ w."""
    L = cfg.n_layer
    per = {}

    def add(k, a):
        per.setdefault(k, []).append(a)

    if cfg.ssm_n_group > 0:  # mamba2 tensor table (llama-model.cpp:4314-4336)
        for i in range(L):
            p = f"blk.{i}."
            g = lambda n: r.tensors[p + n].to_f32()
            add("attn_norm_w", g("attn_norm.weight"))
            add("ssm_in", np.ascontiguousarray(g("ssm_in.weight").T))
            cw = g("ssm_conv1d.weight")  # (d_xbc, d_conv) numpy order
            add("conv_w", np.ascontiguousarray(cw.T))
            add("conv_b", g("ssm_conv1d.bias"))
            add("ssm_dt_b", g("ssm_dt.bias"))
            add("ssm_a", g("ssm_a").reshape(-1))  # stored {1, nh}
            add("ssm_d", g("ssm_d").reshape(-1))
            add("ssm_norm", g("ssm_norm.weight"))  # (G, d_inner/G)
            add("ssm_out", np.ascontiguousarray(g("ssm_out.weight").T))
        return {k: jnp.asarray(np.stack(v), jnp.float32) for k, v in per.items()}

    for i in range(L):
        p = f"blk.{i}."
        g = lambda n: r.tensors[p + n].to_f32()
        add("attn_norm_w", g("attn_norm.weight"))
        add("ssm_in", np.ascontiguousarray(g("ssm_in.weight").T))
        cw = g("ssm_conv1d.weight")  # (d_inner, d_conv) in gguf numpy order
        add("conv_w", np.ascontiguousarray(cw.T))  # (d_conv, d_inner)
        add("conv_b", g("ssm_conv1d.bias"))
        add("ssm_x", np.ascontiguousarray(g("ssm_x.weight").T))
        add("ssm_dt", np.ascontiguousarray(g("ssm_dt.weight").T))
        add("ssm_dt_b", g("ssm_dt.bias"))
        add("ssm_a", g("ssm_a"))
        add("ssm_d", g("ssm_d"))
        add("ssm_out", np.ascontiguousarray(g("ssm_out.weight").T))
        if cfg.ssm_dt_b_c_rms:
            # falcon-mamba: weightless RMS over dt/B/C (the GGUF carries
            # only the ssm.dt_b_c_rms flag — synthesize unit weights;
            # ref graph-context-mamba.cpp:94, llama-model.cpp:1403)
            add("ssm_dt_norm_w", np.ones(cfg.ssm_dt_rank, np.float32))
            add("ssm_b_norm_w", np.ones(cfg.ssm_d_state, np.float32))
            add("ssm_c_norm_w", np.ones(cfg.ssm_d_state, np.float32))
    return {k: jnp.asarray(np.stack(v), jnp.float32) for k, v in per.items()}
