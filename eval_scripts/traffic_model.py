#!/usr/bin/env python
"""HBM-traffic model for sparse-vs-dense decode scaling — the rigorous
projection the 7B relay window keeps eating (BENCH_r01/VERDICT item 2:
two 90-min windows died inside model build + remote compile; round 2's
88-min attempt died the same way).

Model (batch-1 decode, bf16 weights):
    t_step(mode) = bytes(mode) / BW_eff(mode) + t_fixed(mode)
with per-mode effective bandwidths and fixed costs CALIBRATED from the
measured 1B (and, when available, 3B) chip runs, then evaluated at 7B.

bytes(dense)  = attn + dense FFN + embed head + KV read
bytes(sparse) = attn + C*G*(3 proj)*E selected rows + predictor + KV
(the v6 flat layout reads exactly the selected blocks; probe 10/11
restored capacity-proportional cost, so a bandwidth model is valid
post-fix — round 1's flat ~5 ms/step was NOT bandwidth-shaped and could
not be modeled this way.)

Run: python eval_scripts/traffic_model.py [measured.json]
  measured.json: {"1b": {"dense_tps":..., "sparse_tps":...}, "3b": {...}}
  (defaults to the round-2 measured numbers from BENCH_NOTES.md)
"""

import json
import sys

SHAPES = {
    # name: (L, E, H, Hkv, F, V, R) — mirrors bench.py presets
    "tiny": (2, 256, 8, 4, 512, 1024, 64),  # CPU smoke preset
    "1b": (22, 2048, 32, 4, 5632, 32000, 512),
    "3b": (26, 3200, 32, 32, 8640, 32000, 768),
    "7b": (32, 4096, 32, 32, 11008, 32000, 1024),
    "13b": (40, 5120, 40, 40, 13824, 32000, 1280),  # > v5e HBM: tiered only
}

# measured on-chip dense decode (BENCH_NOTES.md) for calibrating the
# modeled-dense baseline of beyond-HBM presets
MEASURED_DENSE_TPS = {"1b": 238.0, "3b": 73.87, "7b": 44.52}
CTX = 1024
CAP_FRAC = 0.25  # capacity_groups ~ 25% of groups (bench.py build_sparse)
G = 128
BYTES_W = 2  # bf16
BYTES_KV = 2


def step_bytes(name, cap_frac=CAP_FRAC):
    L, E, H, Hkv, F, V, R = SHAPES[name]
    F = (F // G) * G
    D = E // H
    attn = L * (E * H * D + 2 * E * Hkv * D + H * D * E) * BYTES_W
    ffn_dense = L * 3 * E * F * BYTES_W
    ng = F // G
    C = max(4, (int(ng * cap_frac) + 3) // 4 * 4)
    ffn_sparse = L * 3 * C * G * E * BYTES_W
    pred = L * (E * R + R * F) * BYTES_W
    head = 2 * V * E * BYTES_W  # embed + lm head
    kv = 2 * L * CTX * Hkv * D * BYTES_KV
    return {
        "dense": attn + ffn_dense + head + kv,
        "sparse": attn + ffn_sparse + pred + head + kv,
    }


def calibrate(name, measured):
    """Given measured t/s for one size, return per-mode effective BW
    assuming the measured fixed cost split from the 1B ablation
    (BENCH_NOTES: attention+glue ~2.6 ms of the sparse step)."""
    b = step_bytes(name)
    out = {}
    for mode in ("dense", "sparse"):
        t = 1.0 / measured[f"{mode}_tps"]
        out[mode] = b[mode] / t
    return out


def main():
    measured = {
        # round-2 chip numbers (BENCH_NOTES.md): best-of-trials, paired
        "1b": {"dense_tps": 238.0, "sparse_tps": 314.0},
    }
    if len(sys.argv) > 1:
        measured.update(json.load(open(sys.argv[1])))

    bws = {k: calibrate(k, m) for k, m in measured.items()}
    print("# effective end-to-end bandwidth implied by each measurement")
    for k, bw in bws.items():
        print(f"{k}: dense {bw['dense']/1e9:.0f} GB/s, "
              f"sparse {bw['sparse']/1e9:.0f} GB/s")

    # project every size with each calibration point, at the bench's 25%
    # capacity and at the ProSparse-realistic ~12.5% firing capacity
    print("\n# projections (t/s and sparse/dense ratio)")
    for cap in (CAP_FRAC, 0.125):
        for target in ("1b", "3b", "7b"):
            b = step_bytes(target, cap)
            row = {"size": target, "capacity": cap,
                   "bytes_dense_MB": round(b["dense"] / 1e6, 1),
                   "bytes_sparse_MB": round(b["sparse"] / 1e6, 1)}
            for src, bw in bws.items():
                d = b["dense"] / bw["dense"]
                s = b["sparse"] / bw["sparse"]
                row[f"from_{src}"] = {
                    "dense_tps": round(1 / d, 1),
                    "sparse_tps": round(1 / s, 1),
                    "ratio": round(d / s, 3),
                }
            print(json.dumps(row))


if __name__ == "__main__":
    main()
