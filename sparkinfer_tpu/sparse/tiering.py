"""HBM / host-DRAM neuron tiering — the TPU re-design of the SparkInfer
cache manager (src/llama-sparkinfer.cpp:147-388, sparkinfer_layer_cache
ggml/include/ggml-sparkinfer.hpp:32-81).

Reference architecture: hot neuron groups live in a GPU cache
(ffn_{up,gate,down}_cache + neuron_idx); cold neurons stay in host RAM and
their activations are computed BY THE CPU concurrently (hybrid matmul),
while DFR statistics pick which groups to swap into the GPU cache via
async H2D copies overlapped with compute.

TPU re-design (SURVEY.md §7 hard part (a) — no event-driven scheduler;
everything is expressed around one jitted decode step):

  - The HOT store is an HBM-resident (L, H, G, E) cache per projection;
    `group_map` (L, n_g) maps group id -> hot slot (or -1 = cold). The
    fused Pallas kernel indexes the hot store by SLOT, with probs/bias
    pre-gathered by original group id.
  - The COLD store is the full neuron-major weight set in host RAM
    (numpy). Cold∩active contributions are either
      * computed on the host inside the step via `jax.pure_callback`
        (mode="host") — the direct analogue of the reference's CPU
        complement (ggml-cpu.c:1692-1925), with only activations (KB)
        crossing the PCIe, never weights; XLA can overlap the callback
        with the independent hot-store matmul; or
      * dropped (mode="drop") — an approximation whose error shrinks as
        the DFR balancer adapts the hot set; miss counts are tracked
        in-step for telemetry.
  - DFR (decayed firing rate) EMA statistics update INSIDE the step as
    carried state (ref build_dfr, src/llama-graph.cpp:910-930; math
    dfr = λ·dfr + (1-λ)·delta/norm, binbcast.cu:26-33).
  - Rebalancing happens BETWEEN steps on the host (sparse/balancer.py),
    replacing the reference's RELOAD_PLAN/RELOAD_EXEC ops + executor
    thread with windowed host->HBM block updates that JAX async dispatch
    overlaps with the next step's compute.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from .config import SparseConfig
from .ffn import select_groups
from .predictor import predict_activations


class ColdStore:
    """Host-RAM neuron-major weights + the host complement computation.

    Weights are kept f16 by default (half the host RAM — the reference
    keeps f16/quantized weights on host, src/llama-sparkinfer.cpp:178);
    the native kernel converts in HW inside the dot loops
    (spif_sparse_complement_f16)."""

    def __init__(self, cfg: ModelConfig, scfg: SparseConfig, layers_np: dict,
                 dtype=None):
        """layers_np: numpy copies of the stacked layer params (at least
        w_up_rows / w_down_rows (+ w_gate_rows, b_up) in (L, n_g, G, E))."""
        self.cfg = cfg
        self.scfg = scfg
        from .. import native as _native

        self._native = _native if _native.available() else None
        if dtype is None:
            dtype = np.float16 if (self._native and _native.has_f16()) else np.float32
        self.dtype = dtype
        self.up = np.asarray(layers_np["w_up_rows"], dtype)
        self.gate = (
            np.asarray(layers_np["w_gate_rows"], dtype)
            if "w_gate_rows" in layers_np
            else None
        )
        self.down = np.asarray(layers_np["w_down_rows"], dtype)
        self.b_up = (
            np.asarray(layers_np["b_up"], np.float32).reshape(
                self.up.shape[0], self.up.shape[1], self.up.shape[2]
            )
            if "b_up" in layers_np
            else None
        )
        self.act = cfg.traits.sparse_act
        self.fatrelu_threshold = cfg.fatrelu_threshold

    def complement(
        self,
        il: np.ndarray,  # () int32 layer
        x: np.ndarray,  # (N, E) f32
        probs: np.ndarray,  # (N, n_g, G) f32
        cold_active: np.ndarray,  # (N, n_g) bool — active AND not in hot set
    ) -> np.ndarray:  # (N, E) f32
        l = int(il)
        if self._native is not None:
            return self._native.sparse_complement(
                np.asarray(x, np.float32),
                self.up[l],
                None if self.gate is None else self.gate[l],
                self.down[l],
                None if self.b_up is None else self.b_up[l],
                np.asarray(probs, np.float32),
                np.asarray(cold_active),
                self.act,
                self.fatrelu_threshold,
                self.scfg.threshold,
            )
        N, E = x.shape
        out = np.zeros((N, E), np.float32)
        thr = self.scfg.threshold
        for n in range(N):
            groups = np.nonzero(cold_active[n])[0]
            for g in groups:
                up = x[n] @ self.up[l, g].T.astype(np.float32)
                if self.b_up is not None:
                    up = up + self.b_up[l, g]
                if self.act == "fatrelu":
                    gate = x[n] @ self.gate[l, g].T.astype(np.float32)
                    h = np.where(gate > self.fatrelu_threshold, gate, 0.0) * up
                elif self.act == "drelu":
                    gate = x[n] @ self.gate[l, g].T.astype(np.float32)
                    h = np.maximum(gate, 0.0) * np.maximum(up, 0.0)
                else:
                    h = np.maximum(up, 0.0)
                h = h * (probs[n, g] >= thr)
                out[n] += h @ self.down[l, g].astype(np.float32)
        return out


class TieredParams(NamedTuple):
    """Device-side tiered weight state, swapped by the balancer between
    steps (analogue of the GPU-side sparkinfer_layer_cache buffers).

    The hot stores are FLAT over (layer, slot) and up/gate TRANSPOSED —
    the same loop-invariance + v6-kernel layout as the all-HBM path (see
    prepare_pipelined_params): block row = il*H + slot."""

    hot_upT: jnp.ndarray  # (L*H, E, G) bf16/f32 — int8 when s_upT is set
    hot_gateT: jnp.ndarray | None
    hot_down: jnp.ndarray  # (L*H, G, E)
    group_map: jnp.ndarray  # (L, n_g) int32: slot or -1
    hot_ids: jnp.ndarray  # (L, H) int32: slot -> group id (for debug/state io)
    # Q8_0 per-32-sublane scales (None = unquantized store). A Q8_0 hot
    # store holds ~2x the groups per HBM byte AND halves the sparse-FFN
    # stream per step (fused-dequant v6q kernel) — the reference's sparse
    # weight types include Q8_0 (src/llama-sparkinfer.cpp:178).
    s_upT: jnp.ndarray | None = None  # (L*H, E//32, G) f32
    s_gateT: jnp.ndarray | None = None
    s_down: jnp.ndarray | None = None  # (L*H, G//32, E) f32

    @property
    def n_hot(self) -> int:
        return self.hot_ids.shape[1]

    @property
    def quantized(self) -> bool:
        return self.s_upT is not None


class DFRState(NamedTuple):
    """Carried per-layer statistics (leading L axis; threads through scan)."""

    dfr: jnp.ndarray  # (L, n_g) f32 decayed firing rate
    miss: jnp.ndarray  # (L, 1) f32 count of active-but-cold group hits
    steps: jnp.ndarray  # (L, 1) f32 tokens seen
    # fetch mode only: per-GROUP cold∩active counts since the last
    # rebalance — the balancer prioritizes these for entry so misses
    # become next-chunk hits (the relay-compatible analogue of the
    # reference's async reload-exec, ggml-cuda.cu:2520-2604; host
    # callbacks for in-step exactness are rejected by the relay)
    miss_g: jnp.ndarray | None = None  # (L, n_g) f32


def init_tiered(
    cfg: ModelConfig,
    scfg: SparseConfig,
    layers: dict,
    hot_groups: int,
    init_hot: np.ndarray | None = None,  # (L, H) group ids; default first H
    quant: str | None = None,  # "q8_0" packs the hot store (v6q kernel)
    track_miss_groups: bool = False,  # fetch mode: per-group miss counts
) -> tuple[TieredParams, DFRState]:
    """Build the initial hot cache from the (stacked, row-layout) layer
    params. By default the FIRST H groups are hot — combined with the
    split-file reorder permutation (hot-first neuron order,
    src/llama-sparkinfer.cpp:286-352) that means 'the profiled-hottest'."""
    L = cfg.n_layer
    # group count from the actual row store (MoE expert rows span
    # n_expert * Fe/G groups, not n_ff/G)
    ng = layers["w_up_rows"].shape[1]
    H = min(hot_groups, ng)
    if init_hot is None:
        init_hot = np.tile(np.arange(H, dtype=np.int32), (L, 1))
    gm = np.full((L, ng), -1, np.int32)
    for l in range(L):
        gm[l, init_hot[l]] = np.arange(H, dtype=np.int32)

    ids = jnp.asarray(init_hot, jnp.int32)
    E = cfg.n_embd
    G = scfg.group_size

    def gather(w, transpose):  # (L, ng, G, E) -> flat (L*H, …)
        if isinstance(w, np.ndarray):
            # HOST-side gather + upload of ONLY the hot blocks — the
            # memory-critical init path (Scheduler prefill_mode="tiered"):
            # the full rows never touch HBM, mirroring the reference's
            # first-m-rows-only GPU upload (src/llama-sparkinfer.cpp:354-359)
            sel = np.take_along_axis(
                w, np.asarray(init_hot)[:, :, None, None], axis=1)
            if transpose:
                sel = np.swapaxes(sel, -1, -2)
            return jnp.asarray(
                np.ascontiguousarray(sel.reshape((L * H,) + sel.shape[2:])))
        sel = jnp.take_along_axis(w, ids[:, :, None, None], axis=1)
        if transpose:
            sel = jnp.swapaxes(sel, -1, -2)  # (L, H, E, G)
        return sel.reshape((L * H,) + sel.shape[2:])

    if quant == "q8_0":
        from ..ops.sparse_ffn_pallas import quantize_rows_q8_0

        qu, su = quantize_rows_q8_0(gather(layers["w_up_rows"], True), True)
        qg = sg = None
        if "w_gate_rows" in layers:
            qg, sg = quantize_rows_q8_0(gather(layers["w_gate_rows"], True),
                                        True)
        qd, sd = quantize_rows_q8_0(gather(layers["w_down_rows"], False),
                                    False)
        tp = TieredParams(
            hot_upT=jnp.asarray(qu),
            hot_gateT=None if qg is None else jnp.asarray(qg),
            hot_down=jnp.asarray(qd),
            group_map=jnp.asarray(gm), hot_ids=ids,
            s_upT=jnp.asarray(su),
            s_gateT=None if sg is None else jnp.asarray(sg),
            s_down=jnp.asarray(sd),
        )
    elif quant is not None:
        raise ValueError(f"unsupported tiered store quant {quant!r}")
    else:
        tp = TieredParams(
            hot_upT=gather(layers["w_up_rows"], True),
            hot_gateT=gather(layers["w_gate_rows"], True)
            if "w_gate_rows" in layers else None,
            hot_down=gather(layers["w_down_rows"], False),
            group_map=jnp.asarray(gm),
            hot_ids=ids,
        )
    st = DFRState(
        dfr=jnp.zeros((L, ng), jnp.float32),
        miss=jnp.zeros((L, 1), jnp.float32),
        steps=jnp.zeros((L, 1), jnp.float32),
        miss_g=jnp.zeros((L, ng), jnp.float32) if track_miss_groups else None,
    )
    return tp, st


def make_tiered_ffn(
    cfg: ModelConfig,
    scfg: SparseConfig,
    cold: ColdStore | None,
    mode: str = "host",  # "host" | "drop" | "fetch"
    kernel: str = "pallas",  # "pallas" | "gather" (CPU tests)
    stateless: bool = False,
):
    """Stateful ffn(lp, x, fs, il) -> (y, fs') for make_forward(...,
    stateful_ffn=True). lp carries group_map + predictors per layer; the
    flat hot stores arrive via params['sparse_flat'] (loop-invariant).

    stateless=True returns plain ffn(lp, x) -> y (layer index read from
    lp['flat_il'], DFR bookkeeping skipped) — for quality evaluation of a
    FIXED hot set (tools/perplexity --hot-groups)."""
    act_name = cfg.traits.sparse_act
    G = scfg.group_size
    F = cfg.n_ff
    ng = scfg.n_groups(F)
    thr = scfg.threshold
    lam = scfg.dfr_decay
    L = cfg.n_layer

    if mode == "host" and cold is None:
        raise ValueError("mode='host' needs a ColdStore")

    def ffn(lp: dict, x: jnp.ndarray, fs: dict, il: jnp.ndarray):
        from ..ops.sparse_ffn_pallas import sparse_ffn_block_v6

        # the flat-store stride is the ACTUAL hot-slot count (shapes are
        # static at trace time), not the config default — init_tiered may
        # have clamped or the caller overridden it
        q8 = "qhot_upT_flat" in lp
        H = lp["qhot_upT_flat" if q8 else "hot_upT_flat"].shape[0] // L
        B, T, E = x.shape
        xt = x.reshape(B * T, E)
        N = B * T
        probs = predict_activations(lp, xt)  # (N, F)
        gp = probs.reshape(N, ng, G)

        idx = select_groups(probs, scfg, F)  # (N, C) original group ids
        C = idx.shape[-1]
        gmap = lp["group_map"]  # (ng,)
        slots = jnp.take(gmap, idx)  # (N, C), -1 = cold
        hot = slots >= 0
        slots_safe = jnp.maximum(slots, 0).astype(jnp.int32)

        gp_sel = jnp.take_along_axis(gp, idx[..., None], axis=1)  # (N, C, G)
        gp_hot = jnp.where(hot[..., None], gp_sel, 0.0)
        bu_sel = None
        if "b_up" in lp:
            bu_sel = jnp.take(lp["b_up"].reshape(ng, G).astype(jnp.float32), idx, axis=0)

        slots_flat = slots_safe + il * H
        if kernel == "pallas" and q8:
            from ..ops.sparse_ffn_pallas import sparse_ffn_block_v6q

            out = sparse_ffn_block_v6q(
                xt, slots_flat, gp_hot,
                lp["qhot_upT_flat"], lp["s_hot_upT_flat"],
                lp.get("qhot_gateT_flat"), lp.get("s_hot_gateT_flat"),
                lp["qhot_down_flat"], lp["s_hot_down_flat"],
                act=act_name,
                fatrelu_threshold=cfg.fatrelu_threshold,
                prob_threshold=thr,
                bu_sel=bu_sel,
            )
        elif kernel == "pallas":
            out = sparse_ffn_block_v6(
                xt,
                slots_flat,
                gp_hot,
                lp["hot_upT_flat"],
                lp.get("hot_gateT_flat"),
                lp["hot_down_flat"],
                act=act_name,
                fatrelu_threshold=cfg.fatrelu_threshold,
                prob_threshold=thr,
                bu_sel=bu_sel,
            )
        else:
            # gather math over the flat stores (CPU/tests)
            from .ffn import _dequant_sub_nd, _sparse_act

            act = _sparse_act(act_name, cfg.fatrelu_threshold)
            if q8:
                wuT = _dequant_sub_nd(
                    jnp.take(lp["qhot_upT_flat"], slots_flat, axis=0),
                    jnp.take(lp["s_hot_upT_flat"], slots_flat, axis=0))
            else:
                wuT = jnp.take(lp["hot_upT_flat"], slots_flat, axis=0)
            up = jnp.einsum("ne,nceg->ncg", xt, wuT.astype(xt.dtype))
            if bu_sel is not None:
                up = up + bu_sel.astype(up.dtype)
            gate = None
            if q8 and lp.get("qhot_gateT_flat") is not None:
                wgT = _dequant_sub_nd(
                    jnp.take(lp["qhot_gateT_flat"], slots_flat, axis=0),
                    jnp.take(lp["s_hot_gateT_flat"], slots_flat, axis=0))
                gate = jnp.einsum("ne,nceg->ncg", xt, wgT.astype(xt.dtype))
            elif lp.get("hot_gateT_flat") is not None:
                wgT = jnp.take(lp["hot_gateT_flat"], slots_flat, axis=0)
                gate = jnp.einsum("ne,nceg->ncg", xt, wgT.astype(xt.dtype))
            hidden = act(gate, up) if gate is not None else act(None, up)
            hidden = hidden * (gp_hot >= thr).astype(hidden.dtype)
            if q8:
                wd = _dequant_sub_nd(
                    jnp.take(lp["qhot_down_flat"], slots_flat, axis=0),
                    jnp.take(lp["s_hot_down_flat"], slots_flat, axis=0))
            else:
                wd = jnp.take(lp["hot_down_flat"], slots_flat, axis=0)
            out = jnp.einsum("ncg,ncge->ne", hidden, wd.astype(hidden.dtype))
            # kill contributions of cold-selected slots entirely (their
            # gp_hot is 0 so the threshold mask already zeroes them)
            out = out.astype(jnp.float32)

        # cold∩active bookkeeping; fetch mode ALSO requires the selection
        # to have reached the group (capacity-truncated cold groups are
        # not fetch-demanded — matching what the kernel actually missed)
        group_active = (gp >= thr).any(-1)  # (N, ng)
        cold_active = group_active & (gmap[None, :] < 0)  # (N, ng)
        n_miss = cold_active.sum().astype(jnp.float32)

        if mode == "host":  # noqa: SIM108
            comp = jax.pure_callback(
                cold.complement,
                jax.ShapeDtypeStruct((N, E), jnp.float32),
                il,
                xt.astype(jnp.float32),
                gp,
                cold_active,
            )
            out = out + comp

        if "b_down" in lp:
            out = out + lp["b_down"].astype(out.dtype)
        y = out.reshape(B, T, E).astype(x.dtype)
        if fs is None:  # stateless quality-eval path
            return y, None
        # DFR EMA (ref: ggml_scale_add; delta = fired fraction per group)
        fired = (gp >= thr).astype(jnp.float32).sum(-1).sum(0) / (N * G)  # (ng,)
        if scfg.dfr_ema:
            dfr = lam * fs.dfr + (1.0 - lam) * fired
        else:
            dfr = fs.dfr + fired
        miss_g = fs.miss_g
        if mode == "fetch" and miss_g is not None:
            miss_g = miss_g + cold_active.sum(0).astype(jnp.float32)
        fs2 = DFRState(dfr=dfr, miss=fs.miss + n_miss, steps=fs.steps + 1.0,
                       miss_g=miss_g)
        return y, fs2

    if stateless:
        def ffn_stateless(lp, x):
            return ffn(lp, x, None, lp["flat_il"])[0]

        return ffn_stateless
    return ffn


def tiered_layer_params(layers: dict, tp: TieredParams) -> tuple[dict, dict]:
    """Split the tiered state for make_forward: (per-layer dict for the
    scan xs, flat loop-invariant dict for params['sparse_flat']). Drops the
    full-size HBM row layouts (the whole point is not to keep them in HBM;
    the dense prefill path re-reads from the loader params when needed).
    The hot stores go in sparse_flat — inside the scan xs their per-layer
    dynamic-slice could not fuse into the Pallas call and XLA would copy
    the hot cache every layer, every step."""
    out = {k: v for k, v in layers.items() if not k.endswith("_rows")}
    out["group_map"] = tp.group_map
    if tp.quantized:
        flat = {"qhot_upT_flat": tp.hot_upT, "s_hot_upT_flat": tp.s_upT,
                "qhot_down_flat": tp.hot_down, "s_hot_down_flat": tp.s_down}
        if tp.hot_gateT is not None:
            flat["qhot_gateT_flat"] = tp.hot_gateT
            flat["s_hot_gateT_flat"] = tp.s_gateT
    else:
        flat = {"hot_upT_flat": tp.hot_upT, "hot_down_flat": tp.hot_down}
        if tp.hot_gateT is not None:
            flat["hot_gateT_flat"] = tp.hot_gateT
    return out, flat
