"""Predictor-gated sparse FFN — the TPU re-design of build_sparse_ffn
(src/llama-graph.cpp:896-1142).

Reference semantics: every FFN neuron whose predicted activation
probability >= threshold is computed (GGML_OP_MUL_MAT_SPARSE skips rows
below threshold, mm-sparse.cu:22; the down-projection accumulates per
active neuron row via GGML_OP_AXPY_SPARSE); inactive neurons contribute
exactly zero.

TPU re-design (static shapes, MXU-aligned):
  - neurons are processed in GROUPS of `group_size` (128 = lane width),
    mirroring the reference split-file's `ffn_group_size`;
  - per token we select the top-`capacity` groups by active-neuron count
    (fixed capacity => static shapes; capacity >= #active groups makes the
    result EXACTLY the thresholded reference function, enforced in tests);
  - inside selected groups, sub-threshold neurons are masked to zero, so
    group granularity never changes values, only which neurons get cut
    when capacity is exceeded;
  - three execution paths:
      "dense"  — masked dense matmuls (reads all weights; right for
                 prefill where the cross-token union of active groups is
                 large);
      "gather" — jnp take of selected weight blocks (reference
                 implementation & CPU-mesh testable);
      "pallas" — fused scalar-prefetch streaming kernel that reads ONLY
                 the selected groups' weight rows from HBM
                 (ops/sparse_ffn_pallas.py) — the analogue of
                 mm-sparse.cu + axpy-sparse.cu fused into one kernel.

Weight layout: the sparse path wants neuron-major rows; `sparse_layout`
precomputes (n_g, G, E) blocks for up/gate/down from the loader's
canonical (E, F)/(F, E) — the same motivation as the reference loading
ffn_down transposed (src/llama-model.cpp:2758-2770).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..models.config import ModelConfig
from .config import SparseConfig
from .predictor import predict_activations


def _sparse_act(name: str, threshold: float = 0.0):
    """combine(gate, up) for the sparse archs (src/llama-graph.cpp:1063-1094).
    For ungated archs (relu), gate is None."""
    if name == "fatrelu":
        return lambda g, u: jnp.where(g > threshold, g, 0.0) * u
    if name == "drelu":
        return lambda g, u: jnp.maximum(g, 0.0) * jnp.maximum(u, 0.0)
    if name == "relu":
        return lambda g, u: jnp.maximum(u, 0.0)
    raise ValueError(name)


def _dequant_sub_nd(q, s):
    """Dequantize a v6q packed store: q (..., B, L) int8 with scales
    (..., B//32, L) f32 repeated over each 32-sublane ggml block."""
    B, L = q.shape[-2:]
    qf = q.astype(jnp.float32).reshape(q.shape[:-2] + (B // 32, 32, L))
    return (qf * s[..., :, None, :]).reshape(q.shape)


def sparse_layout(lp: dict, cfg: ModelConfig, scfg: SparseConfig) -> dict:
    """Augment a layer-param dict (possibly L-stacked) with neuron-major
    grouped weight blocks: w_up_rows/w_gate_rows/w_down_rows (…, n_g, G, E)."""
    G = scfg.group_size
    F, E = cfg.n_ff, cfg.n_embd
    ng = scfg.n_groups(F)

    for k in ("w_up", "w_gate", "w_down"):
        if k in lp and not hasattr(lp[k], "reshape"):
            raise ValueError(
                f"sparse FFN needs dense (bf16/f32) {k}; load the model with "
                "keep_quantized=False (ref parity: sparse FFN weight types are "
                "F16/BF16/Q8_0, src/llama-sparkinfer.cpp:178)"
            )

    def rows_from_col(w):  # (..., E, F) -> (..., n_g, G, E)
        wt = jnp.swapaxes(w, -1, -2)  # (..., F, E)
        return wt.reshape(wt.shape[:-2] + (ng, G, E))

    def rows_from_row(w):  # (..., F, E) -> (..., n_g, G, E)
        return w.reshape(w.shape[:-2] + (ng, G, E))

    out = dict(lp)
    out["w_up_rows"] = rows_from_col(lp["w_up"])
    if "w_gate" in lp:
        out["w_gate_rows"] = rows_from_col(lp["w_gate"])
    out["w_down_rows"] = rows_from_row(lp["w_down"])
    return out


def select_groups(probs: jnp.ndarray, scfg: SparseConfig, n_ff: int):
    """probs (..., F) -> (idx (..., C) int32 group ids, group mask info).

    Score = active-neuron count per group (threshold crossings), with the
    max prob as tiebreak so near-threshold groups order stably."""
    G = scfg.group_size
    ng = scfg.n_groups(n_ff)
    C = scfg.capacity(n_ff)
    gp = probs.reshape(probs.shape[:-1] + (ng, G))
    active = (gp >= scfg.threshold).astype(jnp.float32)
    score = active.sum(-1) + gp.max(-1)  # (..., ng); max<1 breaks ties only
    _, idx = jax.lax.top_k(score, C)
    return idx.astype(jnp.int32)


def prepare_sparse_params(params: dict, cfg: ModelConfig, scfg: SparseConfig,
                          drop_dense: bool = False,
                          donate: bool = False) -> dict:
    """Return params with the stacked layer dict augmented by sparse_layout
    row blocks (leading L axis handled by the reshape rules).

    drop_dense=True removes the original (E,F)/(F,E) FFN weights so only the
    neuron-major row layout stays in HBM (halves FFN weight memory — needed
    for models near the HBM limit); the masked-dense prefill path computes
    from the row layout in that case.

    donate=True (drop_dense only) TRANSFERS OWNERSHIP of the dense FFN
    arrays: they are donated to the layout jit and popped from the caller's
    layers dict, so each dense buffer is reused in place for its same-sized
    row block instead of coexisting with it. Converting all three tensors
    before dropping the dense copies doubles FFN HBM transiently (22 GB at
    7B > 16 GB chip); donation removes that peak. Only pass donate=True when
    no other live reference to the dense arrays exists (the serving
    Scheduler, which replaces model.params wholesale)."""
    out = dict(params)
    if drop_dense and donate:
        import gc

        import jax

        G = scfg.group_size
        F, E = cfg.n_ff, cfg.n_embd
        ng = scfg.n_groups(F)

        @partial(jax.jit, donate_argnums=0)
        def rows_col(w):  # (..., E, F) -> (..., ng, G, E)
            wt = jnp.swapaxes(w, -1, -2)
            return wt.reshape(wt.shape[:-2] + (ng, G, E))

        @partial(jax.jit, donate_argnums=0)
        def rows_row(w):  # (..., F, E) -> (..., ng, G, E)
            return w.reshape(w.shape[:-2] + (ng, G, E))

        layers = params["layers"]
        layers["w_up_rows"] = rows_col(layers.pop("w_up"))
        gc.collect()
        if "w_gate" in layers:
            layers["w_gate_rows"] = rows_col(layers.pop("w_gate"))
            gc.collect()
        layers["w_down_rows"] = rows_row(layers.pop("w_down"))
        gc.collect()
        out["layers"] = layers
        return out
    layers = sparse_layout(params["layers"], cfg, scfg)
    if drop_dense:
        for k in ("w_up", "w_gate", "w_down"):
            layers.pop(k, None)
    out["layers"] = layers
    return out


def make_sparse_ffn(
    cfg: ModelConfig,
    scfg: SparseConfig,
    mode: str = "dense",
) -> Callable:
    """Build ffn(lp, x) for models/transformer.make_forward.

    lp must carry predictor weights; for the gather/pallas paths, also the
    sparse_layout row blocks."""
    act = _sparse_act(cfg.traits.sparse_act, cfg.fatrelu_threshold)
    gated = cfg.traits.sparse_act in ("fatrelu", "drelu")
    G = scfg.group_size
    F = cfg.n_ff
    ng = scfg.n_groups(F)
    thr = scfg.threshold

    def dense_ffn(lp, x):
        probs = predict_activations(lp, x)  # (..., F) f32
        mask = (probs >= thr).astype(x.dtype)

        def _layer_flat(key):
            # slice this layer's ng groups out of the flat (L*ng, ...) store
            # (einsum consumers fuse the dynamic-slice; prefill-only path)
            import jax

            w = lp[key]
            return jax.lax.dynamic_slice_in_dim(w, lp["flat_il"] * ng, ng, 0)

        def col_mm(key_dense, key_rows):
            if key_dense in lp:
                return x @ lp[key_dense]
            base = key_dense.replace("w_", "")
            if key_dense + "T_flat" in lp:
                # v6 transposed flat store (L*ng, E, G)
                w = _layer_flat(key_dense + "T_flat")
                y = jnp.einsum("...e,neg->...ng", x, w.astype(x.dtype))
                return y.reshape(y.shape[:-2] + (F,))
            if "qw_" + base + "T_flat" in lp:
                # q8_0 packed transposed flat store: dequant then contract
                q = _layer_flat("qw_" + base + "T_flat")  # (ng, E, G) int8
                s = _layer_flat("s_" + base + "T_flat")  # (ng, E//32, G)
                w = _dequant_sub_nd(q, s).astype(x.dtype)
                y = jnp.einsum("...e,neg->...ng", x, w)
                return y.reshape(y.shape[:-2] + (F,))
            # row layout (ng, G, E): contract E, flatten groups back to F
            w = lp[key_rows]
            y = jnp.einsum("...e,nge->...ng", x, w.astype(x.dtype))
            return y.reshape(y.shape[:-2] + (F,))

        up = col_mm("w_up", "w_up_rows")
        if "b_up" in lp:
            up = up + lp["b_up"].astype(up.dtype)
        gate = None
        if gated and ("w_gate" in lp or "w_gate_rows" in lp
                      or "w_gateT_flat" in lp or "qw_gateT_flat" in lp):
            gate = col_mm("w_gate", "w_gate_rows")
        hidden = act(gate, up) if gate is not None else act(None, up)
        hidden = hidden * mask
        if "w_down" in lp:
            out = hidden @ lp["w_down"]
        else:
            h3 = hidden.reshape(hidden.shape[:-1] + (ng, G))
            if "w_down_rows" in lp:
                wd = lp["w_down_rows"].astype(hidden.dtype)
            elif "w_down_flat" in lp:
                wd = _layer_flat("w_down_flat").astype(hidden.dtype)
            else:
                wd = _dequant_sub_nd(_layer_flat("qw_down_flat"),
                                     _layer_flat("s_down_flat")).astype(hidden.dtype)
            out = jnp.einsum("...ng,nge->...e", h3, wd)
        if "b_down" in lp:
            out = out + lp["b_down"].astype(out.dtype)
        return out

    def gather_ffn(lp, x):
        # x (B, T, E); per-token group selection
        B, T, E = x.shape
        xt = x.reshape(B * T, E)
        probs = predict_activations(lp, xt)  # (N, F)
        idx = select_groups(probs, scfg, F)  # (N, C)
        C = idx.shape[-1]

        up_rows = lp["w_up_rows"]  # (ng, G, E)
        down_rows = lp["w_down_rows"]
        wu = jnp.take(up_rows, idx, axis=0)  # (N, C, G, E)
        up = jnp.einsum("ne,ncge->ncg", xt, wu.astype(xt.dtype))
        if "b_up" in lp:
            bu = jnp.take(lp["b_up"].reshape(ng, G), idx, axis=0)  # (N, C, G)
            up = up + bu.astype(up.dtype)
        if gated and "w_gate_rows" in lp:
            wg = jnp.take(lp["w_gate_rows"], idx, axis=0)
            gate = jnp.einsum("ne,ncge->ncg", xt, wg.astype(xt.dtype))
        else:
            gate = None
        hidden = act(gate, up) if gate is not None else act(None, up)
        # within-group threshold mask
        gp = probs.reshape(B * T, ng, G)
        pmask = jnp.take_along_axis(gp, idx[..., None], axis=1) >= thr  # (N, C, G)
        hidden = hidden * pmask.astype(hidden.dtype)
        wd = jnp.take(down_rows, idx, axis=0)  # (N, C, G, E)
        out = jnp.einsum("ncg,ncge->ne", hidden, wd.astype(hidden.dtype))
        if "b_down" in lp:
            out = out + lp["b_down"].astype(out.dtype)
        return out.reshape(B, T, E)

    def pallas_ffn(lp, x):
        from ..ops.sparse_ffn_pallas import sparse_ffn_block

        B, T, E = x.shape
        xt = x.reshape(B * T, E)
        probs = predict_activations(lp, xt)
        idx = select_groups(probs, scfg, F)
        gp = probs.reshape(B * T, ng, G)
        gp_sel = jnp.take_along_axis(gp, idx[..., None], axis=1)  # (N, C, G)
        bu_sel = None
        if "b_up" in lp:
            bu_sel = jnp.take(lp["b_up"].reshape(ng, G).astype(jnp.float32), idx, axis=0)
        out = sparse_ffn_block(
            xt,
            idx,
            gp_sel,
            lp["w_up_rows"],
            lp.get("w_gate_rows"),
            lp["w_down_rows"],
            act=cfg.traits.sparse_act,
            fatrelu_threshold=cfg.fatrelu_threshold,
            prob_threshold=thr,
            bu_sel=bu_sel,
        )
        if "b_down" in lp:
            out = out + lp["b_down"].astype(out.dtype)
        return out.reshape(B, T, E).astype(x.dtype)

    table = {"dense": dense_ffn, "gather": gather_ffn, "pallas": pallas_ffn}
    return table[mode]


# ---------------------------------------------------------------------------
# one-layer-ahead pipelined selection (ref: build_sparse_ffn pipelining,
# src/llama-graph.cpp:939-946,951-953)


def prepare_pipelined_params(params: dict, cfg: ModelConfig, scfg: SparseConfig,
                             drop_dense: bool = False,
                             layout: str = "v1",
                             quant: str | None = None) -> dict:
    """prepare_sparse_params + predictor weights shifted one layer DOWN
    (layer il's slice carries layer il+1's predictor, wrapping at the end),
    so each scan iteration can compute the NEXT layer's selection — the
    weight fetch for layer il then has no data dependence on layer il's own
    activations and overlaps with attention.

    layout="v6" stores up/gate TRANSPOSED and FLAT over (layer, group):
    (L*ng, E, G) under params["sparse_flat"] (down flat as (L*ng, G, E)) for
    the v6 VPU-matvec kernel (ops/sparse_ffn_pallas.py). Flat + top-level is
    load-bearing for performance: stores inside params["layers"] ride the
    layer scan's xs, and the per-layer dynamic-slice cannot fuse into a
    Pallas custom call — XLA materializes a full copy of the layer's store
    EVERY layer EVERY step. The flat store is loop-invariant; the kernel
    block-indexes it at il*ng + idx. Same total HBM as v1."""
    import jax.numpy as jnp

    out = prepare_sparse_params(params, cfg, scfg, drop_dense=drop_dense)
    layers = dict(out["layers"])
    for k in ("pred_up", "pred_up_b", "pred_down", "pred_down_b"):
        if k in layers:
            layers[k + "_nx"] = jnp.roll(layers[k], -1, axis=0)
    if layout == "v6":
        L = cfg.n_layer
        ng = scfg.n_groups(cfg.n_ff)
        G = scfg.group_size
        E = cfg.n_embd
        flat = {}
        flat["w_upT_flat"] = jnp.swapaxes(
            layers.pop("w_up_rows"), -1, -2).reshape(L * ng, E, G)
        if "w_gate_rows" in layers:
            flat["w_gateT_flat"] = jnp.swapaxes(
                layers.pop("w_gate_rows"), -1, -2).reshape(L * ng, E, G)
        flat["w_down_flat"] = layers.pop("w_down_rows").reshape(L * ng, G, E)
        if quant == "q8_0":
            # Q8_0-packed stores (ref sparse weight types incl. Q8_0,
            # src/llama-sparkinfer.cpp:178): int8 + per-32-block f32 scale;
            # halves sparse HBM bytes/token vs bf16
            from ..ops.sparse_ffn_pallas import quantize_rows_q8_0

            for src, dst, tr in (("w_upT_flat", "qw_upT_flat", True),
                                 ("w_gateT_flat", "qw_gateT_flat", True),
                                 ("w_down_flat", "qw_down_flat", False)):
                if src not in flat:
                    continue
                q, s = quantize_rows_q8_0(flat[src], transposed=tr)
                flat[dst] = jnp.asarray(q)
                flat[dst.replace("qw_", "s_")] = jnp.asarray(s)
                del flat[src]
        out["sparse_flat"] = flat
    elif quant is not None:
        raise ValueError("quantized sparse stores require layout='v6'")
    import os

    if os.environ.get("SPIF_KERNEL_V2"):
        # v2 single-stream store: [up; gate; down] concatenated on rows
        # (only built when the experimental kernel is enabled — it's an
        # FFN-sized extra HBM allocation)
        parts = [layers["w_up_rows"]]
        if "w_gate_rows" in layers:
            parts.append(layers["w_gate_rows"])
        parts.append(layers["w_down_rows"])
        layers["w_all_rows"] = jnp.concatenate(parts, axis=-3)
    out["layers"] = layers
    return out


def union_from_selection(idx: jnp.ndarray, gp_sel: jnp.ndarray, ng: int,
                         Cu: int):
    """Cross-token union of selected groups (static shapes).

    idx (B, C) per-token selected group ids; gp_sel (B, C, G) their probs.
    Returns (union (Cu,) int32 group ids ranked by how many tokens
    selected them, gp_u (B, Cu, G) per-token probs — zero where the token
    did not select that group). Exact when Cu >= |union|; otherwise the
    least-shared groups' contributions are dropped (the same capacity
    trade the per-token path already makes at C)."""
    B, C = idx.shape
    G = gp_sel.shape[-1]
    pres = jnp.zeros((B, ng), jnp.float32).at[
        jnp.arange(B)[:, None], idx].set(1.0)
    count = pres.sum(0)  # (ng,)
    _, union = jax.lax.top_k(count, Cu)
    union = union.astype(jnp.int32)
    # scatter per-token probs to group-major, then gather the union slots
    gp_full = jnp.zeros((B, ng, G), gp_sel.dtype).at[
        jnp.arange(B)[:, None], idx].set(gp_sel)
    gp_u = jnp.take(gp_full, union, axis=1)  # (B, Cu, G)
    sel = jnp.take(pres, union, axis=1)  # (B, Cu)
    return union, gp_u * sel[..., None]


def make_pipelined_sparse_ffn(cfg: ModelConfig, scfg: SparseConfig,
                              mode: str = "gather",
                              union_groups: int | None = None):
    """Returns (ffn, carry_init) for make_forward(..., ffn_carry_init=...).

    ffn(lp, x, carry, il): layer 0 selects from its own predictor; every
    other layer consumes the selection computed at the previous layer with
    ITS (pre-shifted) predictor weights. The layer's own compute also emits
    the next layer's selection.

    mode='pallas_union' (batch decode): the cross-token UNION of selected
    groups is read once per layer through the v7u kernel (B-wide MXU
    dots) instead of once per (token, group) — union capacity
    `union_groups` (default min(ng, 4C), exact when it covers the union;
    ref batched kernels: mm-sparse.cu batch path)."""
    import jax
    import jax.numpy as jnp

    act = _sparse_act(cfg.traits.sparse_act, cfg.fatrelu_threshold)
    gated = cfg.traits.sparse_act in ("fatrelu", "drelu")
    G = scfg.group_size
    F = cfg.n_ff
    ng = scfg.n_groups(F)
    C = scfg.capacity(F)
    thr = scfg.threshold

    def _select(pu, pub, pd, pdb, xt):
        from .predictor import predict_from

        probs = predict_from(pu, pub, pd, pdb, xt)
        idx = select_groups(probs, scfg, F)
        gp = probs.reshape(-1, ng, G)
        gp_sel = jnp.take_along_axis(gp, idx[..., None], axis=1)
        return idx, gp_sel

    def carry_init(B: int, T: int):
        N = B * T
        return {
            "idx": jnp.zeros((N, C), jnp.int32),
            "gp_sel": jnp.zeros((N, C, G), jnp.float32),
        }

    Cu = union_groups or min(ng, 4 * C)

    def _compute(lp, xt, idx, gp_sel, il):
        if mode == "pallas_union":
            from ..ops.sparse_ffn_pallas import sparse_ffn_block_v7u

            union, gp_u = union_from_selection(idx, gp_sel, ng, Cu)
            bu_u = None
            if "b_up" in lp:
                bu_u = jnp.broadcast_to(
                    jnp.take(lp["b_up"].reshape(ng, G).astype(jnp.float32),
                             union, axis=0)[None],
                    gp_u.shape)
            return sparse_ffn_block_v7u(
                xt, union + il * ng, gp_u, lp["w_upT_flat"],
                lp.get("w_gateT_flat"), lp["w_down_flat"],
                act=cfg.traits.sparse_act,
                fatrelu_threshold=cfg.fatrelu_threshold,
                prob_threshold=thr, bu_u=bu_u,
            )
        if mode == "gather_union":
            # CPU-testable union math (flat v6 stores OR v1 row layout)
            union, gp_u = union_from_selection(idx, gp_sel, ng, Cu)
            flat_form = "w_upT_flat" in lp
            rows = union + il * ng if flat_form else union

            def col(key_flat, key_rows):
                if flat_form:
                    w = jnp.take(lp[key_flat], rows, axis=0)  # (Cu, E, G)
                    return jnp.einsum("be,ueg->bug", xt, w.astype(xt.dtype))
                w = jnp.take(lp[key_rows], rows, axis=0)  # (Cu, G, E)
                return jnp.einsum("be,uge->bug", xt, w.astype(xt.dtype))

            up = col("w_upT_flat", "w_up_rows")
            if "b_up" in lp:
                up = up + jnp.take(lp["b_up"].reshape(ng, G), union,
                                   axis=0).astype(up.dtype)[None]
            gate = None
            if gated and (lp.get("w_gateT_flat") is not None
                          or "w_gate_rows" in lp):
                gate = col("w_gateT_flat", "w_gate_rows")
            hidden = act(gate, up) if gate is not None else act(None, up)
            hidden = hidden * (gp_u >= thr).astype(hidden.dtype)
            wd = jnp.take(lp["w_down_flat"] if flat_form
                          else lp["w_down_rows"], rows, axis=0)  # (Cu, G, E)
            return jnp.einsum("bug,uge->be", hidden, wd.astype(hidden.dtype))
        if mode == "pallas":
            from ..ops.sparse_ffn_pallas import (
                sparse_ffn_block,
                sparse_ffn_block_v2,
                sparse_ffn_block_v6,
            )

            bu_sel = None
            if "b_up" in lp:
                bu_sel = jnp.take(lp["b_up"].reshape(ng, G).astype(jnp.float32),
                                  idx, axis=0)
            if "qw_upT_flat" in lp:
                # q8_0 packed FLAT stores -> fused dequant VPU kernel;
                # block row = il*ng + group (loop-invariant operand, no
                # per-layer slice copy)
                from ..ops.sparse_ffn_pallas import sparse_ffn_block_v6q

                idxf = idx + il * ng
                return sparse_ffn_block_v6q(
                    xt, idxf, gp_sel, lp["qw_upT_flat"], lp["s_upT_flat"],
                    lp.get("qw_gateT_flat"), lp.get("s_gateT_flat"),
                    lp["qw_down_flat"], lp["s_down_flat"],
                    act=cfg.traits.sparse_act,
                    fatrelu_threshold=cfg.fatrelu_threshold,
                    prob_threshold=thr, bu_sel=bu_sel,
                )
            if "w_upT_flat" in lp:
                # v6 transposed FLAT layout -> auto-pipelined VPU-matvec
                idxf = idx + il * ng
                return sparse_ffn_block_v6(
                    xt, idxf, gp_sel, lp["w_upT_flat"], lp.get("w_gateT_flat"),
                    lp["w_down_flat"], act=cfg.traits.sparse_act,
                    fatrelu_threshold=cfg.fatrelu_threshold,
                    prob_threshold=thr, bu_sel=bu_sel,
                )
            import os

            if "w_all_rows" in lp and os.environ.get("SPIF_KERNEL_V2"):
                # experimental deep single-stream kernel (measured SLOWER
                # than v1 on v5e at decode shapes — 184 vs 199 t/s at 1B;
                # kept for round-2 investigation, see BENCH_NOTES.md)
                return sparse_ffn_block_v2(
                    xt, idx, gp_sel, lp["w_all_rows"],
                    act=cfg.traits.sparse_act, gated=gated, R=ng,
                    fatrelu_threshold=cfg.fatrelu_threshold,
                    prob_threshold=thr, bu_sel=bu_sel,
                )
            return sparse_ffn_block(
                xt, idx, gp_sel, lp["w_up_rows"], lp.get("w_gate_rows"),
                lp["w_down_rows"], act=cfg.traits.sparse_act,
                fatrelu_threshold=cfg.fatrelu_threshold, prob_threshold=thr,
                bu_sel=bu_sel,
            )
        # gather: jnp take + dense dots — the take depends ONLY on idx, so
        # XLA hoists the HBM reads to overlap with this layer's attention
        wu = jnp.take(lp["w_up_rows"], idx, axis=0)  # (N, C, G, E)
        up = jnp.einsum("ne,ncge->ncg", xt, wu.astype(xt.dtype))
        if "b_up" in lp:
            bu = jnp.take(lp["b_up"].reshape(ng, G), idx, axis=0)
            up = up + bu.astype(up.dtype)
        gate = None
        if gated and "w_gate_rows" in lp:
            wg = jnp.take(lp["w_gate_rows"], idx, axis=0)
            gate = jnp.einsum("ne,ncge->ncg", xt, wg.astype(xt.dtype))
        hidden = act(gate, up) if gate is not None else act(None, up)
        hidden = hidden * (gp_sel >= thr).astype(hidden.dtype)
        wd = jnp.take(lp["w_down_rows"], idx, axis=0)
        return jnp.einsum("ncg,ncge->ne", hidden, wd.astype(hidden.dtype))

    L = cfg.n_layer

    def _pred(lp, il, nxt):
        """Own (il) or next-layer ((il+1) mod L) predictor weights, from
        either per-layer xs slices (pred_up / pred_up_nx) or one
        loop-invariant stack (pred_up_all — the HBM-tight form that avoids
        materializing the rolled `_nx` duplicate; see resolve_predictor)."""
        if "pred_up_all" in lp:
            from .predictor import resolve_predictor

            return resolve_predictor(lp, (il + 1) % L if nxt else il)
        sfx = "_nx" if nxt else ""
        return (lp["pred_up" + sfx], lp["pred_up_b" + sfx],
                lp["pred_down" + sfx], lp["pred_down_b" + sfx])

    def ffn(lp, x, carry, il):
        B, T, E = x.shape
        xt = x.reshape(B * T, E)

        # Layer 0 selects from its own predictor; lax.cond (not where) so
        # the own-predictor matmuls only RUN at layer 0 — under a where,
        # every layer would pay the predictor weight read twice per step.
        idx, gp_sel = jax.lax.cond(
            il == 0,
            lambda: _select(*_pred(lp, il, False), xt),
            lambda: (carry["idx"], carry["gp_sel"]),
        )

        out = _compute(lp, xt, idx, gp_sel, il)
        if "b_down" in lp:
            out = out + lp["b_down"].astype(out.dtype)

        # selection for the NEXT layer via the pre-shifted predictor
        nx_idx, nx_gp = _select(*_pred(lp, il, True), xt)
        return out.reshape(B, T, E).astype(x.dtype), {"idx": nx_idx, "gp_sel": nx_gp}

    return ffn, carry_init
