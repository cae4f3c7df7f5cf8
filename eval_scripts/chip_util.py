#!/usr/bin/env python
"""Chip-utilization sweep — the analogue of the reference's
eval_scripts/gpu_util_{orig,spif_pwif,topk}.sh (which log nvidia-smi GPU
utilization per mode). A TPU has no smi; the meaningful utilization for
batch-1 decode is ACHIEVED HBM BANDWIDTH vs peak, derived from measured
tokens/s and the per-step byte model (eval_scripts/traffic_model.py —
calibrated against the measured 1B/3B chip runs).

Reads bench.py JSON lines on stdin (or runs `python bench.py [size]`
itself when given --run), emits one JSON row per mode:
  {mode, tps, bytes_per_tok_GB, eff_GBps, pct_of_peak}

Peak HBM defaults to v5e (~820 GB/s); override with --peak-gbps.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from traffic_model import SHAPES, step_bytes  # noqa: E402


def rows_from_lines(lines, peak):
    out = []
    for ln in lines:
        ln = ln.strip()
        if not ln.startswith("{"):
            continue
        try:
            d = json.loads(ln)
        except json.JSONDecodeError:
            continue
        m = d.get("metric", "")
        if "decode_tps" not in m or "value" not in d:
            continue
        # metric name: decode_tps_<mode>_<size>_b1
        parts = m.split("_")
        mode = parts[2] if len(parts) > 2 else "?"
        size = parts[3] if len(parts) > 3 else "?"
        if size not in SHAPES:
            continue
        b = step_bytes(size)
        per_tok = b["sparse"] if mode in ("sparse", "tiered") else b["dense"]
        eff = d["value"] * per_tok
        out.append({
            "mode": mode, "size": size, "tps": d["value"],
            "bytes_per_tok_GB": round(per_tok / 1e9, 3),
            "eff_GBps": round(eff / 1e9, 1),
            "pct_of_peak": round(100 * eff / 1e9 / peak, 1),
        })
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default=None, metavar="SIZE",
                    help="run `python bench.py SIZE` instead of reading stdin")
    ap.add_argument("--peak-gbps", type=float, default=820.0,
                    help="HBM peak (v5e ~820, v5p ~2765, v6e ~1640)")
    args = ap.parse_args(argv)
    if args.run:
        p = subprocess.run([sys.executable, "bench.py", args.run],
                           capture_output=True, text=True, timeout=3600)
        lines = p.stdout.splitlines() + p.stderr.splitlines()
    else:
        lines = sys.stdin.read().splitlines()
    rows = rows_from_lines(lines, args.peak_gbps)
    for r in rows:
        print(json.dumps(r))
    if not rows:
        print("no decode_tps_* lines found", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
