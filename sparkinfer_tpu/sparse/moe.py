"""Mixture-of-Experts FFN — the analogue of build_moe_ffn
(src/llama-graph.cpp) and the scheduler's used-expert-only weight handling
(ggml-backend.cpp:1604-1688, -cmoe flags).

TPU design: MoE is structurally the SAME problem as the sparse FFN — a
per-token top-k selection over blocks of neuron rows — so it reuses the
fused scalar-prefetch kernel: each expert's F rows are split into
F/group_size MXU-aligned groups; a token routed to expert e contributes
groups [e*F/G .. (e+1)*F/G) with the router weight applied in "scale"
mask mode. HBM reads only the selected experts' rows — the used-expert-only
property falls out of the kernel instead of needing scheduler machinery.

Router semantics follow the common llama.cpp path: softmax over expert
logits, top-k, optional renormalization of the selected weights
(norm_topk_prob, mixtral/qwen2moe default true).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.config import ModelConfig


def moe_layout(lp: dict, cfg: ModelConfig, group_size: int = 128) -> dict:
    """Reshape stacked expert weights (..., X, E, F)/(..., X, F, E) into the
    row-store (..., X * F/G, G, E) the fused kernel indexes."""
    F, E, X = (cfg.n_ff_exp or cfg.n_ff), cfg.n_embd, cfg.n_expert
    G = min(group_size, F)
    while F % G:
        G //= 2
    ng_e = F // G

    def rows_from_col(w):  # (..., X, E, F) -> (..., X*ng_e, G, E)
        wt = jnp.swapaxes(w, -1, -2)  # (..., X, F, E)
        return wt.reshape(wt.shape[:-3] + (X * ng_e, G, E))

    def rows_from_row(w):  # (..., X, F, E) -> (..., X*ng_e, G, E)
        return w.reshape(w.shape[:-3] + (X * ng_e, G, E))

    out = dict(lp)
    out["moe_up_rows"] = rows_from_col(lp["w_up_exps"])
    if "w_gate_exps" in lp:
        out["moe_gate_rows"] = rows_from_col(lp["w_gate_exps"])
    out["moe_down_rows"] = rows_from_row(lp["w_down_exps"])
    return out


def route(cfg: ModelConfig, lp: dict, xt: jnp.ndarray, norm_topk: bool | None = None):
    """xt (N, E) -> (expert_idx (N, k), weights (N, k)).

    Gating follows llm_graph_context::build_moe_ffn: softmax (default) or
    sigmoid (deepseek3/gpt-oss-style LLAMA_EXPERT_GATING_FUNC_SIGMOID)
    over router logits; selection may add the score-correction bias
    (exp_probs_b) while the mixing weights use unbiased probs; optional
    top-k renorm (norm_topk_prob) and routed scaling
    (expert_weights_scale)."""
    if norm_topk is None:
        norm_topk = cfg.norm_topk_prob
    logits = (xt @ lp["w_router"].astype(xt.dtype)).astype(jnp.float32)  # (N, X)
    if "w_router_b" in lp:  # gpt-oss router bias (applied to the logits)
        logits = logits + lp["w_router_b"].astype(jnp.float32)
    if cfg.expert_gating == "sigmoid":
        probs = jax.nn.sigmoid(logits)
    elif cfg.expert_gating == "softmax_topk":
        # gpt-oss: select on raw logits, softmax over the k selected
        # (LLAMA_EXPERT_GATING_FUNC_TYPE_SOFTMAX_WEIGHT)
        probs = logits
    else:
        probs = jax.nn.softmax(logits, axis=-1)
    sel = probs
    if "router_bias" in lp:
        sel = probs + lp["router_bias"].astype(jnp.float32)
    _, idx = jax.lax.top_k(sel, cfg.n_expert_used)
    w = jnp.take_along_axis(probs, idx, axis=-1)
    if cfg.expert_gating == "softmax_topk":
        w = jax.nn.softmax(w, axis=-1)
    if norm_topk:
        w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-9)
    if cfg.expert_weights_scale:
        w = w * cfg.expert_weights_scale
    return idx.astype(jnp.int32), w


def _shared_expert(cfg: ModelConfig, lp: dict, xt: jnp.ndarray, act: str):
    """Always-on shared expert(s) added to the routed output
    (qwen2moe ffn_*_shexp with a sigmoid gate scalar; deepseek2 plain)."""
    up = xt @ lp["w_up_shexp"].astype(xt.dtype)
    if "w_gate_shexp" in lp:
        gate = xt @ lp["w_gate_shexp"].astype(xt.dtype)
        if act == "silu":
            hidden = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        else:
            hidden = jax.nn.gelu(gate.astype(jnp.float32), approximate=True).astype(up.dtype) * up
    else:
        hidden = jax.nn.silu(up.astype(jnp.float32)).astype(up.dtype)
    out = hidden @ lp["w_down_shexp"].astype(hidden.dtype)
    if "w_gate_inp_shexp" in lp:
        g = jax.nn.sigmoid(
            (xt @ lp["w_gate_inp_shexp"].astype(xt.dtype)).astype(jnp.float32))
        out = out * g[..., None].astype(out.dtype)
    return out


def make_moe_ffn(cfg: ModelConfig, group_size: int = 128, mode: str = "pallas",
                 norm_topk: bool | None = None):
    """ffn(lp, x) for make_forward. lp needs w_router (E, X) + the
    moe_layout row stores (pallas) or w_*_exps (dense)."""
    X, F, E, k = cfg.n_expert, (cfg.n_ff_exp or cfg.n_ff), cfg.n_embd, cfg.n_expert_used
    assert X > 0 and k > 0
    G = min(group_size, F)
    while F % G:
        G //= 2
    ng_e = F // G
    act = cfg.traits.act  # silu for mixtral/qwen-family

    from ..ops.activations import act_fn

    gated, actf = act_fn(act)

    def dense(lp, x):
        B, T, _ = x.shape
        xt = x.reshape(B * T, E)
        idx, w = route(cfg, lp, xt, norm_topk)  # (N, k)
        up_w = jnp.take(lp["w_up_exps"], idx, axis=0)  # (N, k, E, F)
        gate_w = jnp.take(lp["w_gate_exps"], idx, axis=0) if "w_gate_exps" in lp else None
        down_w = jnp.take(lp["w_down_exps"], idx, axis=0)  # (N, k, F, E)
        up = jnp.einsum("ne,nkef->nkf", xt, up_w.astype(xt.dtype))
        if "w_up_exps_b" in lp:  # gpt-oss expert biases
            up = up + jnp.take(lp["w_up_exps_b"], idx, axis=0).astype(up.dtype)
        if gate_w is not None:
            gate = jnp.einsum("ne,nkef->nkf", xt, gate_w.astype(xt.dtype))
            if "w_gate_exps_b" in lp:
                gate = gate + jnp.take(lp["w_gate_exps_b"], idx, axis=0).astype(gate.dtype)
            hidden = actf(gate, up) if gated else actf(up)
        else:
            hidden = jax.nn.silu(up.astype(jnp.float32)).astype(up.dtype)
        out = jnp.einsum("nkf,nkfe->nke", hidden, down_w.astype(hidden.dtype))
        if "w_down_exps_b" in lp:
            out = out + jnp.take(lp["w_down_exps_b"], idx, axis=0).astype(out.dtype)
        out = (out * w[..., None].astype(out.dtype)).sum(1)
        if "w_up_shexp" in lp:
            out = out + _shared_expert(cfg, lp, xt, act).astype(out.dtype)
        return out.reshape(B, T, E).astype(x.dtype)

    def pallas(lp, x):
        from ..ops.sparse_ffn_pallas import sparse_ffn_block

        B, T, _ = x.shape
        xt = x.reshape(B * T, E)
        N = B * T
        idx, w = route(cfg, lp, xt, norm_topk)  # (N, k)
        # expand expert ids to their group rows: (N, k*ng_e)
        offs = jnp.arange(ng_e, dtype=jnp.int32)
        rows = (idx[:, :, None] * ng_e + offs[None, None, :]).reshape(N, k * ng_e)
        scale = jnp.broadcast_to(
            w[:, :, None, None], (N, k, ng_e, G)
        ).reshape(N, k * ng_e, G).astype(jnp.float32)
        out = sparse_ffn_block(
            xt,
            rows,
            scale,
            lp["moe_up_rows"],
            lp.get("moe_gate_rows"),
            lp["moe_down_rows"],
            act=act,
            mask_mode="scale",
        )
        if "w_up_shexp" in lp:
            out = out + _shared_expert(cfg, lp, xt, act).astype(out.dtype)
        return out.reshape(B, T, E).astype(x.dtype)

    return {"dense": dense, "pallas": pallas}[mode]
