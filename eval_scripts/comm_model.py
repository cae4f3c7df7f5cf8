"""Analytical comm-volume model for multi-chip decode (VERDICT r3 item 7).

Predicts per-step communication bytes and exposed time for the TP / DP
sharding the dryrun compiles (parallel/sparse_tp.py, __graft_entry__.py),
at real 7B/13B shapes, against ICI and DCN link bandwidths — so the
SURVEY.md "≥85% per-device efficiency at 2 hosts" target has an analytical
estimate instead of only a CPU-mesh correctness run (whose timings are
meaningless, scaling_cpu_mesh.json).

Model (decode, batch B, bf16 activations):
  * TP over `tp` chips, Megatron-style: 2 all-reduces per layer (attention
    output + FFN output), each over a (B, E) activation. Ring all-reduce
    moves 2*(tp-1)/tp * bytes per chip per reduce.
  * Our tp-sharded sparse/tiered FFN (parallel/sparse_tp.py) does ONE
    psum per layer for the FFN; attention adds the second.
  * Compute per layer: decode is HBM-bandwidth-bound — t = bytes_of
    weights touched per chip / hbm_bw. Weights per layer: attention
    4*E*E*wb + FFN rows (sparse: capacity_frac of 3*E*F, tiered-Q8 wb=1;
    dense: 3*E*F*wb).
  * 2-host DP over DCN: data-parallel decode replicates weights; the only
    cross-host traffic in serving is request routing (negligible) — DP
    efficiency is ~1.0 by construction. The interesting 2-host case is
    TP SPANNING hosts: the per-layer all-reduce then rides DCN for the
    host-boundary hop; we model the slowest hop dominating the ring.
  * Exposed comm: XLA overlaps collectives with compute imperfectly at
    decode sizes (latency-bound); we report both overlap=0 (worst) and
    overlap=1 (comm fully hidden) efficiencies plus the latency floor
    per psum.

Defaults (editable via CLI): v5e-class numbers — HBM 8.1e11 B/s, ICI
4.5e10 B/s per link direction, DCN 2.5e10 B/s per host, psum latency
~1 us intra-host, ~10 us cross-host.

Output: one JSON line per (model, tp, span) scenario + a summary row with
the 2-host verdict; also writes eval_scripts/comm_model.json.
"""

from __future__ import annotations

import argparse
import json
import os

SHAPES = {
    "7b": dict(L=32, E=4096, F=11008, n_head=32, n_kv=32, hd=128),
    "13b": dict(L=40, E=5120, F=13824, n_head=40, n_kv=40, hd=128),
}


def step_model(shape, tp, B=1, wb_attn=1.0, wb_ffn=1.0625, cap_frac=0.25,
               hbm=8.1e11, link=4.5e10, lat=1e-6, dense=False):
    """-> dict of per-step times (s) and bytes for one decode token batch.

    wb: weight bytes/elem (1.0625 = Q8_0 incl. scales, 2 = bf16).
    cap_frac: fraction of FFN rows actually read (sparse capacity).
    """
    L, E, F = shape["L"], shape["E"], shape["F"]
    HD = shape["n_head"] * shape["hd"]
    KD = shape["n_kv"] * shape["hd"]
    # weight bytes touched per layer (whole model; each chip reads 1/tp)
    attn_w = (E * HD + 2 * E * KD + HD * E) * wb_attn
    ffn_w = 3 * E * F * wb_ffn * (1.0 if dense else cap_frac)
    w_per_chip = (attn_w + ffn_w) * L / tp
    t_compute = w_per_chip / hbm

    # collectives: 2 ring all-reduces per layer over (B, E) bf16
    ar_bytes = 2 * B * E  # payload per reduce (bf16)
    ring = 2.0 * (tp - 1) / tp if tp > 1 else 0.0
    comm_bytes = 2 * L * ar_bytes * ring  # per chip, whole step
    t_comm_bw = comm_bytes / link if tp > 1 else 0.0
    # latency floor: ring has 2(tp-1) hops per reduce, 2 reduces x L layers
    t_comm_lat = 2 * L * 2 * (tp - 1) * lat if tp > 1 else 0.0
    t_comm = t_comm_bw + t_comm_lat
    return dict(
        t_compute=t_compute, t_comm=t_comm, t_comm_bw=t_comm_bw,
        t_comm_lat=t_comm_lat, comm_bytes=comm_bytes,
        eff_exposed=t_compute / (t_compute + t_comm),
        eff_overlapped=min(1.0, t_compute / max(t_compute, t_comm)),
        tps_exposed=1.0 / (t_compute + t_comm),
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--hbm", type=float, default=8.1e11,
                    help="HBM bandwidth per chip (B/s)")
    ap.add_argument("--ici", type=float, default=4.5e10,
                    help="ICI per-link bandwidth (B/s)")
    ap.add_argument("--dcn", type=float, default=2.5e10,
                    help="DCN per-host bandwidth (B/s)")
    ap.add_argument("--lat-ici", type=float, default=1e-6)
    ap.add_argument("--lat-dcn", type=float, default=10e-6)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    rows = []
    for name, shape in SHAPES.items():
        for tp in (1, 2, 4, 8):
            r = step_model(shape, tp, B=args.batch, hbm=args.hbm,
                           link=args.ici, lat=args.lat_ici)
            rows.append({"model": name, "tp": tp, "span": "ici",
                         **{k: (round(v, 6) if isinstance(v, float) else v)
                            for k, v in r.items()}})
        # 2-host TP: the ring's host-boundary hop rides DCN — the slowest
        # link dominates ring time; latency jumps to the DCN floor
        r = step_model(shape, 8, B=args.batch, hbm=args.hbm,
                       link=args.dcn, lat=args.lat_dcn)
        rows.append({"model": name, "tp": 8, "span": "2host-tp",
                     **{k: (round(v, 6) if isinstance(v, float) else v)
                        for k, v in r.items()}})
        # 2-host DP (the sharding we actually recommend): weights
        # replicated per host, zero per-step cross-host collectives
        tp4 = next(r for r in rows if r["model"] == name and r["tp"] == 4
                   and r["span"] == "ici")
        rows.append({"model": name, "tp": 4, "span": "2host-dp",
                     "note": "dp=2 over DCN: no per-step collectives; "
                             "per-device efficiency = single-host tp4",
                     "eff_exposed": tp4["eff_exposed"],
                     "eff_overlapped": tp4["eff_overlapped"]})

    for r in rows:
        print(json.dumps(r))
    # summary verdict for the SURVEY >=85% @ 2 hosts target
    target = {}
    for name in SHAPES:
        dp = next(r for r in rows
                  if r["model"] == name and r["span"] == "2host-dp")
        tp8 = next(r for r in rows
                   if r["model"] == name and r["span"] == "2host-tp")
        target[name] = {
            "dp_eff_exposed": round(dp["eff_exposed"], 3),
            "dp_eff_overlapped": round(dp["eff_overlapped"], 3),
            "tp_spanning_eff": round(tp8["eff_exposed"], 3),
            # worst case = zero collective/compute overlap; XLA pipelines
            # the per-layer psum against the next layer's weight reads in
            # practice, so the truth lies between the two bounds
            "meets_85_via_dp": dp["eff_overlapped"] >= 0.85,
            "meets_85_worst_case": dp["eff_exposed"] >= 0.85,
        }
    summary = {"summary": "2host_target", **target,
               "recommendation": "dp across hosts + tp within host: "
                                 "cross-host traffic is request routing "
                                 "only, so 2-host efficiency tracks "
                                 "single-host tp efficiency; never span "
                                 "a TP ring across DCN (8% efficiency)"}
    print(json.dumps(summary))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "comm_model.json")
    with open(out, "w") as f:
        json.dump({"rows": rows, **summary}, f, indent=1)


if __name__ == "__main__":
    main()
