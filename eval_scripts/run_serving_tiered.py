#!/usr/bin/env python
"""Tiered+fetch serving under load on chip (VERDICT r3 item 6 chip row).

Drives the PRODUCT Scheduler — continuous batching, 4 concurrent slots,
sparse_cold_mode="fetch", between-tick balancer — on a synthetic 7B
(bench shapes) and reports aggregate decode throughput as one JSON row.
This is the serving-side complement of bench.py's single-slot tiered rows
(ref: update_slots semantics, tools/server/server-context.cpp:704-775).

Run on chip AFTER the driver bench (shares the one TPU):
  SPIF_SERVE_PRESET=7b python eval_scripts/run_serving_tiered.py
CPU smoke:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu SPIF_SERVE_PRESET=tiny \
    python eval_scripts/run_serving_tiered.py
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time
import types

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    preset = os.environ.get("SPIF_SERVE_PRESET", "7b")
    n_slots = int(os.environ.get("SPIF_SERVE_SLOTS", "4"))
    n_new = int(os.environ.get("SPIF_SERVE_TOKENS", "192"))
    if os.environ.get("SPIF_BENCH_MANUAL_AXON") == "1":
        # stable-session registration (relay wedge mitigation — see
        # bench.py:_manual_axon_register and BENCH_NOTES round 4)
        from bench import _manual_axon_register

        _manual_axon_register()
    import jax.numpy as jnp

    from bench import _skewed_pred_bias, build_model_device
    from sparkinfer_tpu.runtime.sampling import SamplerConfig
    from sparkinfer_tpu.runtime.scheduler import Request, Scheduler
    from sparkinfer_tpu.sparse import SparseConfig

    t0 = time.time()
    cfg, params, gen_pred, gen_dense_ffn, _ = build_model_device(preset)
    params["layers"].update(gen_dense_ffn())
    preds = gen_pred()
    params["layers"].update(
        {k[: -len("_all")]: v for k, v in preds.items()})
    ng = cfg.n_ff // 128
    params["layers"]["pred_down_b"] = jnp.asarray(
        _skewed_pred_bias(cfg, ng))
    print(f"# {preset}: weights on device {time.time()-t0:.0f}s",
          file=sys.stderr, flush=True)

    gs = 128 if cfg.n_ff % 128 == 0 else 64
    ngg = cfg.n_ff // gs
    H = max(1, int(ngg * 0.25))
    # capacity <= hot slots: with C > H, C-H selected groups per token can
    # NEVER be resident — guaranteed steady-state misses and eviction
    # thrash from the miss-priority bump (the bench's winning 13B config
    # is c16@hot27 for the same reason)
    cap = max(4, min((int(ngg * 0.25) + 3) // 4 * 4, (H // 4) * 4 or H))
    scfg = SparseConfig(group_size=gs, capacity_groups=min(cap, ngg),
                        hot_groups=H,
                        reload_budget_mb=float(os.environ.get(
                            "SPIF_RELOAD_BUDGET_MB", "0")))
    model = types.SimpleNamespace(config=cfg, params=params, vocab=None)
    split = None
    if os.environ.get("SPIF_SERVE_PROFILE") == "1":
        # offline profile -> hot-first reorder, the PRODUCT flow (the
        # reference REQUIRES -spif-ms; serving from an unprofiled
        # first-H hot set pays ~500k misses of convergence at 7B).
        # Profiling itself is cheap: one counting forward pass.
        from sparkinfer_tpu.sparse.split import build_split, profile_firing

        t_p = time.time()
        prof_rng = np.random.default_rng(11)
        batches = [prof_rng.integers(0, cfg.n_vocab, 128) for _ in range(4)]
        firing = profile_firing(model, batches, scfg, max_seq=160)
        split = build_split(firing, scfg)
        print(f"# profile: {time.time()-t_p:.0f}s", file=sys.stderr,
              flush=True)
    # >=7B: rows + hot store exceed 16 GB HBM — free the rows and run
    # prefill through the tiered path too (prefill_mode="tiered")
    pf_default = "tiered" if preset in ("7b", "13b") else "rows"
    sched = Scheduler(model, n_slots=n_slots, max_seq=32 + n_new + 8,
                      sampler=SamplerConfig(temp=0.0),
                      sparse=scfg, sparse_cold_mode="fetch", split=split,
                      prefill_mode=os.environ.get("SPIF_SERVE_PREFILL",
                                                  pf_default),
                      rebalance_every=int(os.environ.get(
                          "SPIF_SERVE_REBALANCE", "4")))
    print(f"# scheduler ready {time.time()-t0:.0f}s", file=sys.stderr,
          flush=True)

    rng = np.random.default_rng(3)
    reqs = [sched.submit(Request(
        prompt_tokens=[int(x) for x in
                       rng.integers(0, cfg.n_vocab, 32)],
        max_new_tokens=n_new)) for _ in range(n_slots)]
    # warm: admit + first ticks compile everything
    t_warm = time.time()
    while not all(s.running for s in sched.slots):
        sched.step()
    for _ in range(8):
        sched.step()
    print(f"# warm {time.time()-t_warm:.1f}s", file=sys.stderr, flush=True)

    n0 = sched.metrics.get("n_tokens_generated", 0)
    t1 = time.time()
    tick_s = []
    while any(s.running for s in sched.slots) or not sched.pending.empty():
        tt = time.perf_counter()
        sched.step()
        tick_s.append(time.perf_counter() - tt)
    dt = time.time() - t1
    n1 = sched.metrics.get("n_tokens_generated", 0)
    toks = n1 - n0
    for r in reqs:
        r.tokens()  # drain
    reb = sched.balancer.rebalances if sched.tiered else 0
    miss = (float(np.asarray(sched._fstate.miss).sum())
            if sched._fstate is not None else 0.0)
    # separate the pure decode cadence from the rebalance H2D windows:
    # median tick = steady decode; the tail quarter shows converged
    # behavior (the relay's 70 MB/s H2D makes early fetch windows
    # seconds-long; locally-attached H2D is ~100x faster)
    med_tick = float(np.median(tick_s)) if tick_s else 0.0
    q4 = tick_s[3 * len(tick_s) // 4:] or [0.0]
    row = {
        "metric": f"serving_tiered_fetch_{preset}_b{n_slots}",
        "value": round(toks / dt, 2),
        "unit": "tokens/s aggregate",
        "slots": n_slots,
        "tokens": int(toks),
        "rebalances": int(reb),
        "total_misses": round(miss),
        "per_slot_tps": round(toks / dt / n_slots, 2),
        "median_tick_ms": round(1e3 * med_tick, 1),
        "steady_decode_tps": round(n_slots / med_tick, 2) if med_tick else 0,
        "tail_quarter_tps": round(n_slots * len(q4) / sum(q4), 2),
    }
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
