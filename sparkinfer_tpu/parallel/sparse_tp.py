"""Tensor parallelism for the fused sparse-FFN FAST path (v6 Pallas).

Round-2 gap (VERDICT item 3): `parallel/mesh.py` sharded the slow gather
path's row stores, but nothing sharded the flat v6 stores or ran the
Pallas kernel under a mesh — the flagship perf path was single-chip-only.

Design (TPU-first, the Megatron column/row split applied to the hot-path
layout):

  * Layout: single-chip v6 flat stores are LAYER-major ((L*ng, E, G),
    block row = il*ng + g). For TP they are re-ordered GROUP-major
    ((ng*L, E, G), block row = g*L + il) so a plain dim-0 shard over the
    `tp` axis gives each device a CONTIGUOUS range of neuron groups for
    every layer — the same neuron-dim split as the dense rules' w_up
    (column) / w_down (row), but on the layout the kernel actually reads.

  * Selection is replicated: every device computes the same predictor
    probs and top-k ids (the predictor stacks are small — at 7B ~7% of
    sparse bytes; sharding them would buy little and cost an allgather
    of probs). Each device then compacts the selected ids IT OWNS to the
    front (stable argsort on an ownership key — static shapes) and
    streams only those blocks through the unmodified v6 kernel under
    `shard_map`.

  * One `psum` over tp reduces the down-projection partials — the fused
    kernel folds the whole up/act/down chain, so the layer's sparse FFN
    costs exactly ONE collective, same count as Megatron dense.

  * Capacity: with local capacity Cl = C the result is EXACT for any
    selection (every owned id fits; non-owned slots are masked via a
    zeroed gate prob and a clamped row index). With a capacity factor
    f < tp, Cl = ceil(C/tp·f) bounds each device's HBM stream to ~1/tp
    of the single-chip bytes (the point of TP) and drops only ids past
    the local capacity — the same capacity-factor trade MoE routers make.

Reference equivalents: CUDA row-split LLAMA_SPLIT_MODE_ROW +
ggml_backend_sched pipeline (ggml/src/ggml-backend.cpp:692; SURVEY §2.7).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig
from ..sparse.config import SparseConfig


def tp_flat_layout(flat: dict, L: int) -> dict:
    """Re-order every *_flat store from layer-major (L*R0, ...) to
    group-major (R0*L, ...); non-flat entries (predictor stacks, biases)
    pass through unchanged."""
    out = {}
    for k, v in flat.items():
        if k.endswith("_flat"):
            R = v.shape[0]
            ng = R // L
            out[k] = jnp.reshape(
                jnp.swapaxes(v.reshape(L, ng, *v.shape[1:]), 0, 1),
                (R, *v.shape[1:]))
        else:
            out[k] = v
    return out


def shard_tp_flat(mesh: Mesh, flat: dict, axis: str = "tp") -> dict:
    """device_put group-major flat stores sharded on dim 0 over `axis`
    (replicating anything that does not divide)."""
    out = {}
    for k, v in flat.items():
        if k.endswith("_flat") and v.shape[0] % mesh.shape[axis] == 0:
            spec = P(axis, *([None] * (v.ndim - 1)))
        else:
            spec = P(*([None] * getattr(v, "ndim", 1)))
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def _local_capacity(C: int, tp: int, capacity_factor: float | None) -> int:
    if capacity_factor is None:
        return C  # exact mode
    return min(C, max(4, math.ceil(C / tp * capacity_factor / 4) * 4))


def make_tp_sparse_ffn(
    cfg: ModelConfig,
    scfg: SparseConfig,
    mesh: Mesh,
    axis: str = "tp",
    capacity_factor: float | None = None,
):
    """(ffn, carry_init) like sparse.ffn.make_pipelined_sparse_ffn
    (mode='pallas'), but the v6 kernel runs under shard_map with the
    GROUP-major flat stores sharded over `axis` (see module docstring).
    Expects params['sparse_flat'] transformed by tp_flat_layout and
    sharded by shard_tp_flat."""
    from ..sparse.ffn import make_pipelined_sparse_ffn, select_groups  # noqa: F401
    from ..sparse.predictor import predict_from

    G = scfg.group_size
    F = cfg.n_ff
    ng = scfg.n_groups(F)
    C = scfg.capacity(F)
    L = cfg.n_layer
    tpn = mesh.shape[axis]
    assert ng % tpn == 0, f"n_groups {ng} must divide tp={tpn}"
    ngl = ng // tpn
    Cl = _local_capacity(C, tpn, capacity_factor)
    act = cfg.traits.sparse_act
    thr = scfg.threshold

    def _select(pu, pub, pd, pdb, xt):
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

    def _local(xt, idx, gp_sel, il, upT, gateT, down):
        from ..ops.sparse_ffn_pallas import sparse_ffn_block_v6

        t = jax.lax.axis_index(axis)
        g0 = t * ngl
        owned = (idx >= g0) & (idx < g0 + ngl)  # (N, C)
        # owned ids to the front, original order preserved (static shapes)
        key = jnp.where(owned, 0, 1) * (C + 1) + jnp.arange(C, dtype=jnp.int32)
        order = jnp.argsort(key, axis=1)[:, :Cl]
        idc = jnp.take_along_axis(idx, order, axis=1) - g0
        ownc = jnp.take_along_axis(owned, order, axis=1)
        gpc = jnp.take_along_axis(gp_sel, order[..., None], axis=1)
        # non-owned slots: zero probs (threshold mask kills the hidden)
        gpc = jnp.where(ownc[..., None], gpc, 0.0)
        rows = jnp.clip(idc, 0, ngl - 1) * L + il  # group-major local row
        out = sparse_ffn_block_v6(
            xt, rows.astype(jnp.int32), gpc, upT, gateT, down,
            act=act, fatrelu_threshold=cfg.fatrelu_threshold,
            prob_threshold=thr)
        return jax.lax.psum(out, axis)

    def _pred(lp, il, nxt):
        from ..sparse.predictor import resolve_predictor

        if "pred_up_all" in lp or "pred_up_qt" in lp:
            return resolve_predictor(lp, (il + 1) % L if nxt else il)
        sfx = "_nx" if nxt else ""
        return (lp["pred_up" + sfx], lp["pred_up_b" + sfx],
                lp["pred_down" + sfx], lp["pred_down_b" + sfx])

    def ffn(lp, x, carry, il):
        B, T, E = x.shape
        xt = x.reshape(B * T, E)
        idx, gp_sel = jax.lax.cond(
            il == 0,
            lambda: _select(*_pred(lp, il, False), xt),
            lambda: (carry["idx"], carry["gp_sel"]),
        )
        gated = lp.get("w_gateT_flat") is not None
        args = [xt, idx, gp_sel, jnp.asarray(il, jnp.int32),
                lp["w_upT_flat"]]
        specs = [P(), P(), P(), P(), P(axis)]
        if gated:
            args.append(lp["w_gateT_flat"])
            specs.append(P(axis))
        args.append(lp["w_down_flat"])
        specs.append(P(axis))
        fn = (_local if gated else
              (lambda xt_, i_, g_, il_, u_, d_: _local(xt_, i_, g_, il_,
                                                       u_, None, d_)))
        out = jax.shard_map(fn, mesh=mesh, in_specs=tuple(specs),
                            out_specs=P(), check_vma=False)(*args)
        if "b_down" in lp:
            out = out + lp["b_down"].astype(out.dtype)
        nx_idx, nx_gp = _select(*_pred(lp, il, True), xt)
        return (out.reshape(B, T, E).astype(x.dtype),
                {"idx": nx_idx, "gp_sel": nx_gp})

    return ffn, carry_init


def make_tp_tiered_ffn(
    cfg: ModelConfig,
    scfg: SparseConfig,
    mesh: Mesh,
    axis: str = "tp",
    mode: str = "drop",
):
    """Tiered hot/cold decode with the HOT store sharded over tp: hot
    SLOTS are split group-major ((H*L, ...) flat, slot s owned by device
    s // (H/tp)); selection + group_map stay replicated, misses ride the
    DFR state exactly as on one chip. mode="fetch" additionally tracks
    per-group miss counts in DFRState.miss_g so the between-step balancer
    can demand-fetch missed groups into the sharded hot store (the
    multi-chip face of the single-chip fetch tier, sparse/tiering.py:393).
    One psum per layer.

    ffn(lp, x, fs, il) -> (y, fs') for make_forward(stateful_ffn=True)."""
    from ..sparse.ffn import select_groups
    from ..sparse.predictor import predict_activations
    from ..sparse.tiering import DFRState

    G = scfg.group_size
    F = cfg.n_ff
    ng = scfg.n_groups(F)
    L = cfg.n_layer
    thr = scfg.threshold
    lam = scfg.dfr_decay
    act = cfg.traits.sparse_act
    tpn = mesh.shape[axis]

    def _local(H_l, xt, slots, gp_hot, il, upT, gateT, down):
        from ..ops.sparse_ffn_pallas import sparse_ffn_block_v6

        t = jax.lax.axis_index(axis)
        s0 = t * H_l
        owned = (slots >= s0) & (slots < s0 + H_l)
        C = slots.shape[1]
        key = (jnp.where(owned, 0, 1) * (C + 1)
               + jnp.arange(C, dtype=jnp.int32))
        order = jnp.argsort(key, axis=1)
        sl = jnp.take_along_axis(slots, order, axis=1) - s0
        ownc = jnp.take_along_axis(owned, order, axis=1)
        gpc = jnp.take_along_axis(gp_hot, order[..., None], axis=1)
        gpc = jnp.where(ownc[..., None], gpc, 0.0)
        rows = jnp.clip(sl, 0, H_l - 1) * L + il
        out = sparse_ffn_block_v6(
            xt, rows.astype(jnp.int32), gpc, upT, gateT, down,
            act=act, fatrelu_threshold=cfg.fatrelu_threshold,
            prob_threshold=thr)
        return jax.lax.psum(out, axis)

    def ffn(lp, x, fs, il):
        B, T, E = x.shape
        xt = x.reshape(B * T, E)
        N = B * T
        H = lp["hot_upT_flat"].shape[0] // L  # global hot slots
        H_l = H // tpn
        probs = predict_activations(lp, xt)
        gp = probs.reshape(N, ng, G)
        idx = select_groups(probs, scfg, F)
        gmap = lp["group_map"]
        slots = jnp.take(gmap, idx)
        hot = slots >= 0
        slots_safe = jnp.maximum(slots, 0).astype(jnp.int32)
        gp_sel = jnp.take_along_axis(gp, idx[..., None], axis=1)
        gp_hot = jnp.where(hot[..., None], gp_sel, 0.0)
        gated = lp.get("hot_gateT_flat") is not None
        args = [xt, slots_safe, gp_hot, jnp.asarray(il, jnp.int32),
                lp["hot_upT_flat"]]
        specs = [P(), P(), P(), P(), P(axis)]
        if gated:
            args.append(lp["hot_gateT_flat"])
            specs.append(P(axis))
        args.append(lp["hot_down_flat"])
        specs.append(P(axis))
        fn = (partial(_local, H_l) if gated else
              (lambda xt_, s_, g_, il_, u_, d_: _local(H_l, xt_, s_, g_,
                                                       il_, u_, None, d_)))
        out = jax.shard_map(fn, mesh=mesh, in_specs=tuple(specs),
                            out_specs=P(), check_vma=False)(*args)
        if "b_down" in lp:
            out = out + lp["b_down"].astype(out.dtype)
        y = out.reshape(B, T, E).astype(x.dtype)
        if fs is None:
            return y, None
        group_active = (gp >= thr).any(-1)
        cold_active = group_active & (gmap[None, :] < 0)
        n_miss = cold_active.sum().astype(jnp.float32)
        fired = (gp >= thr).astype(jnp.float32).sum(-1).sum(0) / (N * G)
        dfr = (lam * fs.dfr + (1.0 - lam) * fired) if scfg.dfr_ema \
            else fs.dfr + fired
        miss_g = fs.miss_g
        if mode == "fetch" and miss_g is not None:
            miss_g = miss_g + cold_active.sum(0).astype(jnp.float32)
        return y, DFRState(dfr=dfr, miss=fs.miss + n_miss,
                           steps=fs.steps + 1.0, miss_g=miss_g)

    return ffn
