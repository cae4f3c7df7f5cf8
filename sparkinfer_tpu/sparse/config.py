"""Sparse-FFN configuration.

TPU re-design of the reference's env-var config surface (SPIF_* knobs,
ggml/include/ggml-sparkinfer.hpp:20-30 + compile-time SPIF_SPARSE_THRESHOLD
mm-sparse.cu:5-7) and the split-file group geometry
(`ffn_group_size` KV, src/llama-sparkinfer.cpp:150-158).

Key deviation from the reference, forced by XLA static shapes: sparsity is
expressed as a FIXED-CAPACITY top-k over neuron GROUPS rather than a
data-dependent threshold count (SURVEY.md §7 hard part (b)). The threshold
still gates individual neurons inside selected groups (multiplicative
mask), so the computed function matches the reference's
"rows with sparse_idx < 0.5 contribute zero" semantics for every neuron
that falls inside the top-k group capacity.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class SparseConfig:
    # neurons per group; 128 aligns groups with MXU/VPU lanes
    # (ref: split-file KV `ffn_group_size`)
    group_size: int = 128
    # number of groups computed per token (static top-k capacity).
    # 0 = dense (all groups).
    capacity_groups: int = 0
    # activation-probability threshold gating individual neurons
    # (ref: SPIF_SPARSE_THRESHOLD = 0.5)
    threshold: float = 0.5
    # DFR (decayed firing rate) EMA decay λ (ref: SPIF_INIT_DFR_DECAY=67 -> 0.67)
    dfr_decay: float = 0.67
    # EMA vs plain accumulate (ref: SPIF_DFR_EMA)
    dfr_ema: bool = True
    # number of HBM-resident hot groups per layer (0 = all in HBM / gpu_only).
    # The analogue of n_group_cache[il] (src/llama-sparkinfer.cpp:179-202).
    hot_groups: int = 0
    # window of group copies per reload step (ref: SPIF_RELOAD_WINDOW_SIZE=4)
    reload_window: int = 4
    # hard per-rebalance upload budget in MiB (0 = unlimited). Bounds the
    # serving tick-latency tail: the adaptive window can otherwise grow
    # into multi-GB rebalance uploads at 7B+ shapes — the byte-aware
    # generalization of the reference's per-window copy cap
    # (SPIF_RELOAD_WINDOW_SIZE, ggml-cuda.cu:2556-2604)
    reload_budget_mb: float = 0.0
    # swap hysteresis: a DFR-only challenger must beat the incumbent's
    # score by this fraction of the layer's score range before it swaps
    # in. Kills steady-state churn (measured: with a profiled hot set and
    # near-zero misses, churn alone cost KL 0.0016-0.0069 vs drop's
    # 2e-5, quality_ppl_tool.json) without slowing miss-driven fetches —
    # a missed group's priority bump exceeds any dfr range.
    swap_hysteresis: float = 0.05

    @classmethod
    def from_env(cls, **overrides) -> "SparseConfig":
        """Env-var mirrors of the reference's SPIF_* knobs
        (ggml-sparkinfer.hpp:20-30, canonical values run_demo.sh:3-10):
        SPIF_GROUP_SIZE, SPIF_CAPACITY_GROUPS, SPIF_THRESHOLD,
        SPIF_INIT_DFR_DECAY (percent, default 67), SPIF_DFR_EMA,
        SPIF_HOT_GROUPS, SPIF_RELOAD_WINDOW_SIZE."""
        import os

        def get(name, cast, default):
            v = os.environ.get(name)
            return cast(v) if v is not None else default

        kw = dict(
            group_size=get("SPIF_GROUP_SIZE", int, 128),
            capacity_groups=get("SPIF_CAPACITY_GROUPS", int, 0),
            threshold=get("SPIF_THRESHOLD", float, 0.5),
            dfr_decay=get("SPIF_INIT_DFR_DECAY", lambda v: float(v) / 100.0, 0.67),
            dfr_ema=bool(int(get("SPIF_DFR_EMA", str, "1"))),
            hot_groups=get("SPIF_HOT_GROUPS", int, 0),
            reload_window=get("SPIF_RELOAD_WINDOW_SIZE", int, 4),
            reload_budget_mb=get("SPIF_RELOAD_BUDGET_MB", float, 0.0),
            swap_hysteresis=get("SPIF_SWAP_HYSTERESIS", float, 0.05),
        )
        kw.update(overrides)
        return cls(**kw)

    def n_groups(self, n_ff: int) -> int:
        assert n_ff % self.group_size == 0, (n_ff, self.group_size)
        return n_ff // self.group_size

    def capacity(self, n_ff: int) -> int:
        ng = self.n_groups(n_ff)
        c = self.capacity_groups if self.capacity_groups > 0 else ng
        return min(c, ng)


# chip-calibrated sparse/dense decode batch crossover, keyed by FFN width
# buckets (eval_scripts/run_batch_crossover.py, batched-bench methodology
# — ref tools/batched-bench). Entries: (max_n_ff, crossover_batch); a
# shape whose dense weights exceed chip HBM is "always sparse" (batch
# cap = a large sentinel). Values re-measured per chip generation; env
# SPIF_SPARSE_BATCH_MAX overrides.
_BATCH_CROSSOVER_TABLE: list[tuple[int, int]] = [
    (6144, 4),       # <=1B-class FFN widths (round-4 measured: sparse<=4)
    (11008, 4),      # 3B-class (chip-calibrated, batch_crossover.json)
    (1 << 30, 999),  # 7B+: dense bf16 exceeds 16 GB HBM — always sparse
]


def sparse_batch_crossover(n_ff: int) -> int:
    """Largest decode batch where a sparse path (per-token or v7u union
    kernel) still beats the dense step for this FFN width; the Scheduler
    falls back to the dense decode executable above it."""
    import os

    env = os.environ.get("SPIF_SPARSE_BATCH_MAX")
    if env is not None:
        return int(env)
    for max_ff, b in _BATCH_CROSSOVER_TABLE:
        if n_ff <= max_ff:
            return b
    return _BATCH_CROSSOVER_TABLE[-1][1]
