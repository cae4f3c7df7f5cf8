#!/usr/bin/env python
"""HBM-budget sweep — the analogue of the reference's
eval_scripts/vb_{orig,spif_pwif,topk}.sh, which sweep the -vb VRAM budget
(12/24 GiB) and measure decode t/s per budget.

Here -vb GiB is converted to per-layer hot group counts exactly like the
CLI does (tools/cli.py hbm_budget_to_hot_groups — the analogue of the
reference's budget -> n_group_cache apportioning,
src/llama-sparkinfer.cpp:179-202) and the tiered hot/cold path is run at
each budget against the dense baseline with the interleaved protocol.

Usage: python eval_scripts/vb_sweep.py [tiny|1b|3b] [vb_gib ...]
(defaults: tiny + auto budgets on CPU; 1b + {0.25, 0.5, 1.0} GiB on TPU)
"""

from __future__ import annotations

import json
import statistics
import sys

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402

from sparkinfer_tpu.tools.cli import hbm_budget_to_hot_groups  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    from sparkinfer_tpu.models.transformer import make_forward
    from sparkinfer_tpu.sparse import SparseConfig

    plat = jax.devices()[0].platform
    args = sys.argv[1:]
    preset = args[0] if args else ("1b" if plat == "tpu" else "tiny")
    cfg, params, host_ffn = bench.build_model(preset, host_ffn=True)
    ng = cfg.n_ff // 128
    cap = max(4, (int(ng * 0.25) + 3) // 4 * 4)
    scfg = SparseConfig(group_size=128, capacity_groups=cap)

    # full per-layer FFN HBM cost -> budgets as fractions of it
    full_gib = 3 * cfg.n_layer * cfg.n_ff * cfg.n_embd * 2 / (1 << 30)
    budgets = ([float(a) for a in args[1:]] if len(args) > 1
               else [round(full_gib * f, 4) for f in (0.15, 0.3, 0.6)])

    # ProSparse-like clustered firing so tiering has something to find
    # (same skew as bench.tiered_main)
    rng = np.random.default_rng(7)
    L, F = cfg.n_layer, cfg.n_ff
    sigma = 0.6 * (0.05 * np.sqrt(cfg.n_embd)) * np.sqrt(cfg.max_pred_rank / 2)
    b = np.full((L, F), -4.0 * sigma, np.float32)
    for l in range(L):
        for g in rng.choice(ng, size=max(1, ng // 5), replace=False):
            b[l, g * 128:(g + 1) * 128] = (
                rng.standard_normal(128).astype(np.float32) * 0.5 - 0.5) * sigma
    params["layers"]["pred_down_b"] = jnp.asarray(b)

    cold = bench.make_cold(cfg, host_ffn, scfg)
    del host_ffn
    S = 1024
    n_rounds = 4 if plat == "tpu" else 2
    dense = bench.Path("dense", make_forward(cfg), params, cfg, S)
    dense.run_chunk()  # warm

    for vb in budgets:
        H = min(hbm_budget_to_hot_groups(vb, cfg, scfg.group_size), ng)
        tp = bench.TieredPath(f"vb{vb}", cfg, scfg, cold, H, "drop", plat,
                              params, S)
        _, warm_miss, _ = tp.run_chunk()  # compile + cold-start misses
        times, ratios, misses = [], [], [warm_miss]
        for _ in range(n_rounds):
            dt = dense.run_chunk()
            ct, miss, _ = tp.run_chunk()
            times.append(ct)
            misses.append(miss)
            ratios.append(dt / ct)
        print(json.dumps({
            "vb_gib": vb, "hot_groups_per_layer": H,
            "hot_frac": round(H / ng, 3),
            "tps": round(bench.CHUNK / min(times), 1),
            "vs_dense": round(statistics.median(ratios), 3),
            "miss_traj": [round(m) for m in misses],
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
