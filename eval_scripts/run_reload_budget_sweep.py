#!/usr/bin/env python
"""--reload-budget-mb sweep for 7B tiered+fetch serving (VERDICT r4 item 4).

Each budget runs cold (fresh process — the convergence-phase H2D is the
cost being bounded) through eval_scripts/run_serving_tiered.py on chip.
Writes eval_scripts/reload_budget_sweep.json with one serving row per
budget; 0 = unlimited (the round-4 baseline: aggregate 5.23 t/s vs
82 t/s cadence, tail dominated by multi-GB adaptive windows on the
~70 MB/s relay H2D).

Run: python eval_scripts/run_reload_budget_sweep.py [budgets-mb...]
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent


def main():
    budgets = [float(a) for a in sys.argv[1:]] or [0, 64, 32, 16, 8]
    preset = os.environ.get("SPIF_SERVE_PRESET", "7b")
    rows = []
    dst = ROOT / "eval_scripts" / "reload_budget_sweep.json"
    for mb in budgets:
        env = dict(os.environ)
        env["SPIF_RELOAD_BUDGET_MB"] = str(mb)
        env["SPIF_SERVE_PRESET"] = preset
        env.setdefault("SPIF_SERVE_TOKENS", "384")
        t0 = time.time()
        print(f"# budget {mb} MB: starting", file=sys.stderr, flush=True)
        p = subprocess.run(
            [sys.executable, str(ROOT / "eval_scripts" /
                                 "run_serving_tiered.py")],
            env=env, capture_output=True, text=True, timeout=3600)
        out = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if p.returncode != 0 or not out:
            print(f"# budget {mb}: FAILED rc={p.returncode}\n{p.stderr[-2000:]}",
                  file=sys.stderr, flush=True)
            rows.append({"reload_budget_mb": mb, "error": p.returncode})
            continue
        row = json.loads(out[-1])
        row["reload_budget_mb"] = mb
        row["wall_s"] = round(time.time() - t0, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)
        # persist incrementally so a later failure keeps earlier points
        dst.write_text(json.dumps({
            "note": (f"SPIF_RELOAD_BUDGET_MB sweep, {preset} tiered+fetch "
                     "serving (cold start per point, "
                     f"{env['SPIF_SERVE_TOKENS']} tok/slot x 4 slots); "
                     "0 = unlimited adaptive window. On the ~70 MB/s "
                     "relay the budget bounds the rebalance H2D tail; "
                     "locally-attached H2D (~7-10 GB/s) shrinks all "
                     "fetch costs ~100x"),
            "rows": rows}, indent=1))
    print(f"wrote {dst}", flush=True)


if __name__ == "__main__":
    main()
