#!/usr/bin/env python
"""Per-shape sparse/dense batch crossover calibration (VERDICT r4 item 5).

The Scheduler's sparse-vs-dense decode decision was a hardcoded
<=4-slots rule from one 1B measurement. This harness measures, per model
shape, aggregate decode t/s of the dense step vs the per-token sparse
kernel vs the v7u union kernel at B in {1, 2, 4, 8} (batched-bench
methodology, ref tools/batched-bench), derives the largest batch where a
sparse path still wins, and writes eval_scripts/batch_crossover.json —
the calibration source for sparse/config.py:sparse_batch_crossover.

7B note: dense bf16 exceeds the 16 GB chip HBM entirely (the tiered
path is the only option), so the crossover is recorded as "always
sparse" there without measurement.

Run on chip: SPIF_BENCH_MANUAL_AXON=1 python eval_scripts/run_batch_crossover.py [presets...]
CPU smoke: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python eval_scripts/run_batch_crossover.py tiny
"""

from __future__ import annotations

import json
import os
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

ROOT = pathlib.Path(__file__).resolve().parent.parent


def measure_preset(preset: str, plat: str) -> list[dict]:
    import jax.numpy as jnp

    from bench import (
        CHUNK,
        Path,
        _cap_groups,
        build_model,
        build_model_full_device,
        build_sparse,
    )
    from sparkinfer_tpu.models.transformer import make_forward
    from sparkinfer_tpu.sparse import SparseConfig
    from sparkinfer_tpu.sparse.ffn import make_pipelined_sparse_ffn

    t0 = time.time()
    if plat == "tpu":
        cfg, params = build_model_full_device(preset)
    else:
        cfg, params = build_model(preset)
    S = 512
    n_trials = 3 if plat == "tpu" else 2
    dense_fwd = make_forward(cfg)
    sparse_fwd, sparams, dense_prefill = build_sparse(cfg, params, preset,
                                                      plat)
    gs = 128 if cfg.n_ff % 128 == 0 else 64
    ng = cfg.n_ff // gs
    scfg_u = SparseConfig(group_size=gs, capacity_groups=_cap_groups(ng))
    umode = "pallas_union" if plat == "tpu" else "gather_union"
    Cu = min(ng, 4 * scfg_u.capacity_groups)
    ffn_u, ci_u = make_pipelined_sparse_ffn(cfg, scfg_u, mode=umode,
                                            union_groups=Cu)
    union_fwd = make_forward(cfg, ffn_fn=ffn_u, ffn_carry_init=ci_u)
    print(f"# {preset}: built {time.time()-t0:.0f}s", file=sys.stderr,
          flush=True)

    rows = []
    for B in (1, 2, 4, 8):
        paths = {
            "dense": Path("dense", dense_fwd, params, cfg, S, batch=B),
            "sparse": Path("sparse", sparse_fwd, sparams, cfg, S,
                           prefill_fwd=dense_prefill, batch=B),
            "union": Path("union", union_fwd, sparams, cfg, S,
                          prefill_fwd=dense_prefill, batch=B),
        }
        times = {k: [] for k in paths}
        for p in paths.values():
            p.run_chunk()  # warm/compile
        for _ in range(n_trials):
            for k, p in paths.items():
                times[k].append(p.run_chunk())
        row = {"preset": preset, "batch": B}
        for k in paths:
            row[k + "_tps"] = round(B * CHUNK / min(times[k]), 1)
        row["best_sparse_tps"] = max(row["sparse_tps"], row["union_tps"])
        row["sparse_wins"] = row["best_sparse_tps"] > row["dense_tps"]
        rows.append(row)
        print(json.dumps(row), flush=True)
        for p in paths.values():
            del p
        del paths
    return rows


def main():
    if os.environ.get("SPIF_BENCH_MANUAL_AXON") == "1":
        from bench import _manual_axon_register

        _manual_axon_register()
    import jax

    presets = sys.argv[1:] or ["1b", "3b"]
    plat = jax.devices()[0].platform
    out = {"rows": [], "crossover": {}}
    dst = ROOT / "eval_scripts" / "batch_crossover.json"
    if dst.exists():
        out = json.loads(dst.read_text())
        out.setdefault("rows", [])
        out.setdefault("crossover", {})
    for preset in presets:
        rows = measure_preset(preset, plat)
        out["rows"] = [r for r in out["rows"] if r["preset"] != preset] + rows
        winning = [r["batch"] for r in rows if r["sparse_wins"]]
        out["crossover"][preset] = max(winning) if winning else 0
        out["note"] = (
            "largest batch where a sparse decode path (per-token or v7u "
            "union kernel) beats the dense step, per shape; feeds "
            "sparse/config.py sparse_batch_crossover. 7B+: dense bf16 "
            "exceeds chip HBM — always sparse (no measurement needed).")
        dst.write_text(json.dumps(out, indent=1))
    print(f"wrote {dst}: crossover={out['crossover']}", flush=True)


if __name__ == "__main__":
    main()
