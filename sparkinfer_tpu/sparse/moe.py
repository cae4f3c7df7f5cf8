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

    def bias_rows(b):  # (..., X, F) -> (..., X*ng_e, G)
        return b.reshape(b.shape[:-2] + (X * ng_e, G))

    out = dict(lp)
    out["moe_up_rows"] = rows_from_col(lp["w_up_exps"])
    if "w_gate_exps" in lp:
        out["moe_gate_rows"] = rows_from_col(lp["w_gate_exps"])
    out["moe_down_rows"] = rows_from_row(lp["w_down_exps"])
    # gpt-oss per-expert biases ride as row stores too (down bias is per
    # (expert, E) and is mixed outside the kernel)
    if "w_up_exps_b" in lp:
        out["moe_up_b_rows"] = bias_rows(lp["w_up_exps_b"])
    if "w_gate_exps_b" in lp:
        out["moe_gate_b_rows"] = bias_rows(lp["w_gate_exps_b"])
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
    if "router_logits" in lp:
        # smallthinker lookahead routing: logits precomputed from the
        # LAYER INPUT before attention (src/models/smallthinker.cpp:22)
        logits = lp["router_logits"].reshape(-1, cfg.n_expert).astype(jnp.float32)
    else:
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
        if "w_up_chexps" in lp and cfg.n_group_experts > 0:
            # grovemoe adjugate experts: the routed OUTPUT feeds chunk
            # experts selected by expert_id // experts_per_group with the
            # SAME router weights, scaled by expert_group_scale
            # (ref src/models/grovemoe.cpp; llama-graph.cpp:1286-1289)
            cidx = idx // cfg.n_group_experts  # (N, k)
            cu = jnp.take(lp["w_up_chexps"], cidx, axis=0)
            cg = jnp.take(lp["w_gate_chexps"], cidx, axis=0)
            cd = jnp.take(lp["w_down_chexps"], cidx, axis=0)
            xo = out.astype(xt.dtype)
            aup = jnp.einsum("ne,nkef->nkf", xo, cu.astype(xo.dtype))
            agt = jnp.einsum("ne,nkef->nkf", xo, cg.astype(xo.dtype))
            ah = actf(agt, aup) if gated else actf(aup)
            adj = jnp.einsum("nkf,nkfe->nke", ah, cd.astype(ah.dtype))
            adj = (adj * w[..., None].astype(adj.dtype)).sum(1)
            out = out + cfg.expert_group_scale * adj
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
        bu_sel = bg_sel = None
        if "moe_up_b_rows" in lp:  # gpt-oss expert biases (fused in-kernel)
            bu_sel = jnp.take(lp["moe_up_b_rows"], rows, axis=0)
        if "moe_gate_b_rows" in lp:
            bg_sel = jnp.take(lp["moe_gate_b_rows"], rows, axis=0)
        out = sparse_ffn_block(
            xt,
            rows,
            scale,
            lp["moe_up_rows"],
            lp.get("moe_gate_rows"),
            lp["moe_down_rows"],
            act=act,
            mask_mode="scale",
            bu_sel=bu_sel,
            bg_sel=bg_sel,
        )
        if "w_down_exps_b" in lp:
            # down bias is per (expert, E): mix with the routing weights
            db = jnp.take(lp["w_down_exps_b"], idx, axis=0)  # (N, k, E)
            out = out + (db * w[..., None]).sum(1).astype(out.dtype)
        if "w_up_shexp" in lp:
            out = out + _shared_expert(cfg, lp, xt, act).astype(out.dtype)
        return out.reshape(B, T, E).astype(x.dtype)

    return {"dense": dense, "pallas": pallas}[mode]


def moe_rows_layout(lp: dict, cfg: ModelConfig, group_size: int = 128) -> dict:
    """Stacked expert weights -> the neuron-row layout the group tiering
    machinery understands: w_up_rows/w_gate_rows/w_down_rows
    (L, X*Fe/G, G, E), where expert e owns groups [e*ng_e, (e+1)*ng_e).
    Feeding these to init_tiered/ColdStore/Balancer gives EXPERT hot/cold
    tiering for free — the analogue of the reference's used-expert-only
    upload (-cmoe, ggml-backend.cpp:1604-1688)."""
    Fe, E, X = (cfg.n_ff_exp or cfg.n_ff), cfg.n_embd, cfg.n_expert
    G = min(group_size, Fe)
    while Fe % G:
        G //= 2
    ng_e = Fe // G

    out = dict(lp)
    up = jnp.swapaxes(lp["w_up_exps"], -1, -2)  # (L, X, Fe, E)
    out["w_up_rows"] = up.reshape(up.shape[:-3] + (X * ng_e, G, E))
    if "w_gate_exps" in lp:
        gate = jnp.swapaxes(lp["w_gate_exps"], -1, -2)
        out["w_gate_rows"] = gate.reshape(gate.shape[:-3] + (X * ng_e, G, E))
    out["w_down_rows"] = lp["w_down_exps"].reshape(
        lp["w_down_exps"].shape[:-3] + (X * ng_e, G, E))
    return out


class MoEColdStore:
    """Host-RAM expert rows + the host complement for cold (not-in-HBM)
    experts. Same storage contract as sparse.tiering.ColdStore
    (up/gate/down (L, ng, G, E)) so the Balancer drives it unchanged."""

    def __init__(self, cfg: ModelConfig, scfg, layers_np: dict, dtype=None):
        import numpy as np

        if dtype is None:
            dtype = np.float16
        self.up = np.asarray(layers_np["w_up_rows"], dtype)
        self.gate = (np.asarray(layers_np["w_gate_rows"], dtype)
                     if "w_gate_rows" in layers_np else None)
        self.down = np.asarray(layers_np["w_down_rows"], dtype)
        Fe = cfg.n_ff_exp or cfg.n_ff
        G = scfg.group_size
        while Fe % G:
            G //= 2
        self.ng_e = Fe // G
        self.act = cfg.traits.act

    def complement_moe(self, il, x, idx, wts, expert_hot):
        """x (N, E) f32; idx/wts (N, k); expert_hot (N, k) bool ->
        (N, E) f32 contribution of the cold routed experts."""
        import numpy as np

        l = int(il)
        N, E = x.shape
        out = np.zeros((N, E), np.float32)
        ge = self.ng_e
        for n in range(N):
            for j in range(idx.shape[1]):
                if expert_hot[n, j]:
                    continue
                e = int(idx[n, j])
                sl = slice(e * ge, (e + 1) * ge)
                U = self.up[l, sl].reshape(-1, E).astype(np.float32)
                up = x[n] @ U.T
                if self.gate is not None:
                    Gw = self.gate[l, sl].reshape(-1, E).astype(np.float32)
                    g = x[n] @ Gw.T
                    if self.act == "geglu":
                        import math

                        h = 0.5 * g * (1.0 + np.tanh(
                            math.sqrt(2.0 / math.pi) * (g + 0.044715 * g ** 3))) * up
                    else:  # silu
                        h = g / (1.0 + np.exp(-g)) * up
                else:
                    h = up / (1.0 + np.exp(-up))
                D = self.down[l, sl].reshape(-1, E).astype(np.float32)
                out[n] += float(wts[n, j]) * (h @ D)
        return out


def make_tiered_moe_ffn(cfg: ModelConfig, scfg, cold, mode: str = "drop"):
    """Expert-tiered MoE ffn(lp, x, fs, il) -> (y, fs') for
    make_forward(..., stateful_ffn=True): hot experts' row-groups live in
    the flat HBM store (params['sparse_flat'], same layout as the tiered
    dense path), cold experts are dropped (their router weight mass is
    renormalized away) or computed on host via pure_callback.

    DFR = per-group routing frequency EMA; since all ng_e groups of an
    expert fire together, the Balancer converges to whole-expert swaps —
    expert-granular hot/cold with zero new balancer machinery."""
    import jax as _jax

    X, E, k = cfg.n_expert, cfg.n_embd, cfg.n_expert_used
    Fe = cfg.n_ff_exp or cfg.n_ff
    G = scfg.group_size
    while Fe % G:
        G //= 2
    ng_e = Fe // G
    ng = X * ng_e
    act = cfg.traits.act
    lam = scfg.dfr_decay
    L = cfg.n_layer

    from ..ops.activations import act_fn

    gated, actf = act_fn(act)

    def ffn(lp: dict, x: jnp.ndarray, fs, il):
        from .tiering import DFRState

        H = lp["hot_upT_flat"].shape[0] // L
        B, T, E_ = x.shape
        xt = x.reshape(B * T, E_)
        N = B * T
        idx, w = route(cfg, lp, xt)  # (N, k)
        offs = jnp.arange(ng_e, dtype=jnp.int32)
        rows = (idx[:, :, None] * ng_e + offs[None, None, :]).reshape(N, k * ng_e)
        gmap = lp["group_map"]  # (ng,)
        slots = jnp.take(gmap, rows)  # (N, k*ng_e)
        hot = slots >= 0
        slots_flat = jnp.maximum(slots, 0).astype(jnp.int32) + il * H

        # gather math over the flat transposed stores
        wuT = jnp.take(lp["hot_upT_flat"], slots_flat, axis=0)  # (N,C,E,G)
        up = jnp.einsum("ne,nceg->ncg", xt, wuT.astype(xt.dtype))
        gate = None
        if lp.get("hot_gateT_flat") is not None:
            wgT = jnp.take(lp["hot_gateT_flat"], slots_flat, axis=0)
            gate = jnp.einsum("ne,nceg->ncg", xt, wgT.astype(xt.dtype))
        hidden = actf(gate, up) if (gated and gate is not None) else (
            _jax.nn.silu(up.astype(jnp.float32)).astype(up.dtype))
        # apply router weight per expert block + zero cold blocks
        scale = jnp.broadcast_to(w[:, :, None], (N, k, ng_e)).reshape(N, k * ng_e)
        scale = jnp.where(hot, scale, 0.0)
        hidden = hidden * scale[..., None].astype(hidden.dtype)
        wd = jnp.take(lp["hot_down_flat"], slots_flat, axis=0)
        out = jnp.einsum("ncg,ncge->ne", hidden, wd.astype(hidden.dtype)
                         ).astype(jnp.float32)

        expert_hot = hot.reshape(N, k, ng_e).all(-1)  # (N, k)
        n_miss = (~expert_hot).sum().astype(jnp.float32)
        if mode == "host":
            comp = _jax.pure_callback(
                cold.complement_moe,
                _jax.ShapeDtypeStruct((N, E_), jnp.float32),
                il, xt.astype(jnp.float32), idx,
                w.astype(jnp.float32), expert_hot,
            )
            out = out + comp

        if "w_up_shexp" in lp:
            out = out + _shared_expert(cfg, lp, xt, act).astype(out.dtype)

        # DFR: routed-frequency per group (all of an expert's groups move
        # together); EMA like the dense tiered path
        fired = jnp.zeros((ng,), jnp.float32).at[rows.reshape(-1)].add(1.0) / N
        dfr = lam * fs.dfr + (1.0 - lam) * fired if scfg.dfr_ema else fs.dfr + fired
        fs2 = DFRState(dfr=dfr, miss=fs.miss + n_miss, steps=fs.steps + 1.0)
        return out.reshape(B, T, E_).astype(x.dtype), fs2

    return ffn
