#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line with the headline metric.

Headline: single-chip decode tokens/s on the SPARSE predictor-gated path
for a ProSparse-style model at realistic firing rates, with vs_baseline =
speedup over this framework's own dense decode of the same model — the
same ratio family as the reference's headline claim (up to 5.05x over
dense llama.cpp, README.md:11; north star >=2x, BASELINE.json).

Protocol (round 2): both paths decode through a FUSED multi-step loop
(lax.scan over steps, greedy sampling on-device — one dispatch per CHUNK
steps, eliminating the per-step relay dispatch that compressed round-1
ratios), and the two modes are INTERLEAVED trial-by-trial inside one
process with the ratio taken per pair (median of paired ratios cancels
the relay session drift; see BENCH_NOTES.md).

On CPU (no TPU attached) runs a tiny preset as a smoke test.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np

CHUNK = 64  # decode steps fused into one dispatch


def build_model(preset: str, host_ffn: bool = False):
    """host_ffn=True also returns {name: np.float16} host copies of the
    FFN weights (for the tiered ColdStore) so no device->host readback of
    GB-scale tensors rides the relay."""
    import jax.numpy as jnp

    from sparkinfer_tpu.models.config import ModelConfig

    shapes = {
        # name: (L, E, H, Hkv, F, V, pred_rank)
        "7b": (32, 4096, 32, 32, 11008, 32000, 1024),
        "3b": (26, 3200, 32, 32, 8640, 32000, 768),
        "1b": (22, 2048, 32, 4, 5632, 32000, 512),
        "tiny": (2, 256, 8, 4, 512, 1024, 64),
    }
    L, E, H, Hkv, F, V, R = shapes[preset]
    # round F to a multiple of 128 groups
    F = (F // 128) * 128
    D = E // H
    cfg = ModelConfig(arch="prosparse_llama", n_layer=L, n_embd=E, n_head=H,
                      n_head_kv=Hkv, n_ff=F, n_vocab=V, head_dim=D,
                      pred_lora=(R,) * L)
    rng = np.random.default_rng(0)

    host_copies = {}

    def w(*shape, scale=0.02, dtype=jnp.bfloat16, host_key=None):
        # f32 RNG directly (f64 default doubles host time/memory at 7B scale)
        a = rng.standard_normal(shape, dtype=np.float32) * scale
        if host_ffn and host_key:
            host_copies[host_key] = a.astype(np.float16)
        return jnp.asarray(a, dtype)

    layers = {
        "attn_norm_w": jnp.ones((L, E), jnp.float32),
        "ffn_norm_w": jnp.ones((L, E), jnp.float32),
        "wq": w(L, E, H * D), "wk": w(L, E, Hkv * D), "wv": w(L, E, Hkv * D),
        "wo": w(L, H * D, E),
        "w_up": w(L, E, F, host_key="w_up"),
        "w_gate": w(L, E, F, host_key="w_gate"),
        "w_down": w(L, F, E, host_key="w_down"),
        # predictor biased so ~12% of neurons fire (ProSparse-like rates);
        # bf16 storage (compute is f32 inside predict_activations)
        "pred_up": w(L, E, R, scale=0.05),
        "pred_up_b": jnp.zeros((L, R), jnp.float32),
        "pred_down": w(L, R, F, scale=0.6),
        "pred_down_b": jnp.asarray(
            rng.standard_normal((L, F), dtype=np.float32) * 0.5 - 1.2, jnp.float32),
    }
    params = {
        "tok_embd": w(V, E),
        "output_norm_w": jnp.ones((E,), jnp.float32),
        "output": w(E, V),
        "layers": layers,
    }
    if host_ffn:
        return cfg, params, host_copies
    return cfg, params


def _drain(a):
    # block_until_ready is not a reliable fence on every backend (the
    # axon relay acks early); a scalar host readback is.
    return float(np.asarray(a).reshape(-1)[0])


def make_fused_loop(fwd):
    import jax
    import jax.numpy as jnp

    def loop(params, tok, pos, cache):
        def body(carry, _):
            tok, pos, cache = carry
            logits, cache = fwd(params, tok, pos, cache)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
            return (nxt, pos + 1, cache), ()

        (tok, pos, cache), _ = jax.lax.scan(body, (tok, pos, cache), None,
                                            length=CHUNK)
        return tok, pos, cache

    return jax.jit(loop, donate_argnums=(3,))


class Path:
    """One decode path (dense or sparse) with its own cache + position.

    Decode runs UNFUSED (one donated jitted step per token, drain at trial
    end): probe #11 measured per-step dispatch FASTER than the lax.scan
    fused loop for BOTH modes on this relay (dense 4.20 vs 7.31 ms/step,
    sparse 3.18 vs 5.25 — the scan appears to defeat cache buffer aliasing);
    each mode gets its best-known configuration."""

    def __init__(self, name, fwd, params, cfg, S, prefill_fwd=None, batch=1):
        import jax
        import jax.numpy as jnp

        from sparkinfer_tpu.runtime.kv_cache import init_cache

        self.name = name
        self.params = params
        self.jnp = jnp
        self.batch = batch
        self.step = jax.jit(fwd, donate_argnums=(3,))
        T0 = 64
        cache = init_cache(cfg, batch, S, jnp.bfloat16)
        pstep = jax.jit(prefill_fwd if prefill_fwd is not None else fwd,
                        donate_argnums=(3,))
        lg, cache = pstep(params, jnp.zeros((batch, T0), jnp.int32),
                          jnp.broadcast_to(jnp.arange(T0, dtype=jnp.int32),
                                           (batch, T0)), cache)
        _drain(lg)
        self.cache = cache
        self.tok = jnp.zeros((batch, 1), jnp.int32)
        self.pos = T0

    def run_chunk(self) -> float:
        jnp = self.jnp
        t0 = time.perf_counter()
        for _ in range(CHUNK):
            lg, self.cache = self.step(
                self.params, self.tok,
                jnp.full((self.batch, 1), self.pos, jnp.int32), self.cache)
            self.pos += 1
        _drain(lg)
        return time.perf_counter() - t0


def build_sparse(cfg, params, preset, plat):
    """Returns (sparse_fwd, sparse_params, dense_prefill_fwd)."""
    import gc

    import jax.numpy as jnp

    from sparkinfer_tpu.models.transformer import make_forward
    from sparkinfer_tpu.sparse import SparseConfig, make_sparse_ffn
    from sparkinfer_tpu.sparse.ffn import (
        make_pipelined_sparse_ffn,
        prepare_pipelined_params,
    )

    ng = cfg.n_ff // 128 if cfg.n_ff % 128 == 0 else cfg.n_ff // 64
    gs = 128 if cfg.n_ff % 128 == 0 else 64
    cap = max(4, (int(ng * 0.25) + 3) // 4 * 4)  # multiple of 4
    scfg = SparseConfig(group_size=gs, capacity_groups=cap)
    tight_hbm = preset == "7b"  # 7B needs the rows-only layout to fit
    if tight_hbm:
        # avoid transient dense+rows duplication in HBM: pull the FFN
        # weights to host, free the device copies, relayout on host
        # (v6 transposed stores for up/gate), re-upload
        host_ffn = {k: np.array(params["layers"][k])
                    for k in ("w_up", "w_gate", "w_down")}
        for k in ("w_up", "w_gate", "w_down"):
            del params["layers"][k]
        gc.collect()
        L, E, F2 = cfg.n_layer, cfg.n_embd, cfg.n_ff
        ngg = F2 // gs
        rows = {
            # FLAT (L*ng, ...) loop-invariant stores (see sparse/ffn.py
            # prepare_pipelined_params layout='v6' notes)
            "w_upT_flat": host_ffn["w_up"].reshape(L, E, ngg, gs)
            .transpose(0, 2, 1, 3).reshape(L * ngg, E, gs).copy(),
            "w_gateT_flat": host_ffn["w_gate"].reshape(L, E, ngg, gs)
            .transpose(0, 2, 1, 3).reshape(L * ngg, E, gs).copy(),
            "w_down_flat": host_ffn["w_down"].reshape(L * ngg, gs, E),
        }
        del host_ffn
        gc.collect()
        sparams = dict(params)
        slayers = dict(params["layers"])
        flat = {}
        for k in list(rows):
            flat[k] = jnp.asarray(rows.pop(k))
            gc.collect()
        for k in ("pred_up", "pred_up_b", "pred_down", "pred_down_b"):
            slayers[k + "_nx"] = jnp.roll(slayers[k], -1, axis=0)
        sparams["layers"] = slayers
        sparams["sparse_flat"] = flat
    else:
        sparams = prepare_pipelined_params(
            params, cfg, scfg, drop_dense=False,
            layout="v6" if plat == "tpu" else "v1")
    mode = "pallas" if plat == "tpu" else "gather"
    ffn, carry_init = make_pipelined_sparse_ffn(cfg, scfg, mode=mode)
    sparse_fwd = make_forward(cfg, ffn_fn=ffn, ffn_carry_init=carry_init)
    dense_prefill = make_forward(cfg, ffn_fn=make_sparse_ffn(cfg, scfg, mode="dense"))
    return sparse_fwd, sparams, dense_prefill


def make_cold(cfg, host_ffn, scfg):
    """Host-side neuron-major rows (ColdStore, f16) from the host copies
    build_model kept — no GB-scale device->host readback on the relay."""
    from sparkinfer_tpu.sparse.tiering import ColdStore

    L, E, F = cfg.n_layer, cfg.n_embd, cfg.n_ff
    G = scfg.group_size
    ng = F // G
    rows = {}
    for k in ("w_up", "w_gate", "w_down"):
        wnp = host_ffn[k]
        if k == "w_down":  # (L, F, E): already neuron-major rows
            rows[k + "_rows"] = wnp.reshape(L, ng, G, E)
        else:  # (L, E, F) -> (L, F, E) -> (L, ng, G, E)
            rows[k + "_rows"] = np.ascontiguousarray(
                wnp.transpose(0, 2, 1)).reshape(L, ng, G, E)
    return ColdStore(cfg, scfg, rows, dtype=np.float16)


class TieredPath:
    """Hot/cold tiered decode path: hot groups in HBM (v6 flat stores),
    cold in host RAM, DFR balancer rebalancing between chunks.

    The reference's core mode (llama-sparkinfer.cpp hot/cold caches); this
    measures it on-chip: tiered t/s vs dense/all-HBM sparse, and whether
    mode='host' (pure_callback complement) overlaps or serializes."""

    def __init__(self, name, cfg, scfg, cold, hot_groups, mode, plat,
                 params, S):
        import jax
        import jax.numpy as jnp

        from sparkinfer_tpu.models.transformer import make_forward
        from sparkinfer_tpu.runtime.kv_cache import init_cache
        from sparkinfer_tpu.sparse.balancer import Balancer
        from sparkinfer_tpu.sparse.tiering import (
            DFRState,
            TieredParams,
            make_tiered_ffn,
            tiered_layer_params,
        )

        self.name = name
        self.jnp = jnp
        L, E, F = cfg.n_layer, cfg.n_embd, cfg.n_ff
        G = scfg.group_size
        ng = F // G
        H = hot_groups
        init_hot = np.tile(np.arange(H, dtype=np.int32), (L, 1))
        wdt = jnp.bfloat16 if plat == "tpu" else jnp.float32

        def hot(w, transpose):  # cold (L, ng, G, E) -> flat (L*H, ...)
            sel = w[np.arange(L)[:, None], init_hot]
            if transpose:
                sel = np.swapaxes(sel, -1, -2)
            return jnp.asarray(
                sel.reshape((L * H,) + sel.shape[2:]).astype(np.float32), wdt)

        gm = np.full((L, ng), -1, np.int32)
        gm[:, :H] = np.arange(H, dtype=np.int32)
        self.tp = TieredParams(
            hot_upT=hot(cold.up, True), hot_gateT=hot(cold.gate, True),
            hot_down=hot(cold.down, False),
            group_map=jnp.asarray(gm), hot_ids=jnp.asarray(init_hot))
        self.fs = DFRState(dfr=jnp.zeros((L, ng), jnp.float32),
                           miss=jnp.zeros((L, 1), jnp.float32),
                           steps=jnp.zeros((L, 1), jnp.float32))
        ffn = make_tiered_ffn(cfg, scfg, cold, mode=mode,
                              kernel="pallas" if plat == "tpu" else "gather")
        # decode params: drop the dense FFN weights from the scan xs
        self._layers = {k: v for k, v in params["layers"].items()
                        if k not in ("w_up", "w_gate", "w_down")}
        lp, flat = tiered_layer_params(self._layers, self.tp)
        self.params = dict(params)
        self.params["layers"] = lp
        self.params["sparse_flat"] = flat
        self.step = jax.jit(make_forward(cfg, ffn_fn=ffn, stateful_ffn=True),
                            donate_argnums=(3, 4))
        self.balancer = Balancer(cold=cold, scfg=scfg, window=8, max_window=64)
        self.cache = init_cache(cfg, 1, S, jnp.bfloat16)
        self.tok = jnp.zeros((1, 1), jnp.int32)
        self.pos = 0
        self._tlp = tiered_layer_params

    def run_chunk(self):
        """-> (compute_s, miss_count_this_chunk, rebalance_s)."""
        jnp = self.jnp
        miss0 = float(np.asarray(self.fs.miss).sum())
        t0 = time.perf_counter()
        for _ in range(CHUNK):
            lg, self.cache, self.fs = self.step(
                self.params, self.tok,
                jnp.full((1, 1), self.pos, jnp.int32), self.cache, self.fs)
            self.pos += 1
        _drain(lg)
        dt = time.perf_counter() - t0
        t1 = time.perf_counter()
        self.tp = self.balancer.rebalance(self.tp, np.asarray(self.fs.dfr))
        (self.params["layers"],
         self.params["sparse_flat"]) = self._tlp(self._layers, self.tp)
        reb = time.perf_counter() - t1
        miss = float(np.asarray(self.fs.miss).sum()) - miss0
        return dt, miss, reb


def tiered_main(plat, size=None):
    """`bench.py tiered [size]`: hot-fraction x {drop,host} sweep vs dense,
    with miss-rate trajectories (VERDICT item 4). Headline = best config."""
    from sparkinfer_tpu.models.transformer import make_forward
    from sparkinfer_tpu.sparse import SparseConfig

    preset = size or ("1b" if plat == "tpu" else "tiny")
    cfg, params, host_ffn = build_model(preset, host_ffn=True)
    S = 1024
    n_rounds = 6 if plat == "tpu" else 3
    ng = cfg.n_ff // 128
    cap = max(4, (int(ng * 0.25) + 3) // 4 * 4)
    scfg = SparseConfig(group_size=128, capacity_groups=cap)

    # Skew the predictor bias: a random ~20% of neuron groups fire often,
    # the rest almost never — the ProSparse/DejaVu activation locality the
    # hot/cold design exploits (uniform random firing would light up every
    # group every token and no tiering could ever win). The hot groups are
    # SHUFFLED so the DFR balancer must discover them online.
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    L, F = cfg.n_layer, cfg.n_ff
    R = cfg.max_pred_rank
    # the pred-LoRA term has logit std ~ 0.6*(0.05*sqrt(E))*sqrt(R/2)
    # (w scales in build_model); bias offsets must scale with it or the
    # noise swamps the skew at 1B+ (observed: flat max misses on-chip)
    sigma = 0.6 * (0.05 * np.sqrt(cfg.n_embd)) * np.sqrt(R / 2)
    b = np.full((L, F), -4.0 * sigma, np.float32)
    for l in range(L):
        true_hot = rng.choice(ng, size=max(1, ng // 5), replace=False)
        for g in true_hot:
            b[l, g * 128:(g + 1) * 128] = (
                rng.standard_normal(128).astype(np.float32) * 0.5 - 0.5) * sigma
    params["layers"]["pred_down_b"] = jnp.asarray(b)

    cold = make_cold(cfg, host_ffn, scfg)
    del host_ffn
    print(f"# cold store: {cold.dtype} "
          f"{(cold.up.nbytes + cold.gate.nbytes + cold.down.nbytes) / 1e9:.2f} GB host",
          file=sys.stderr)

    dense = Path("dense", make_forward(cfg), params, cfg, S)
    dense.run_chunk()  # warm
    configs = [(m, f) for f in (0.5, 0.25) for m in ("drop", "host")]
    results = {k: {"t": [], "miss": [], "reb": [], "ratio": []}
               for k in configs}
    tiered = {}
    skipped = {}
    for mode, frac in configs:
        H = max(1, int(ng * frac))
        try:
            tiered[(mode, frac)] = TieredPath(
                f"tiered-{mode}-{frac}", cfg, scfg, cold, H, mode, plat, params, S)
            # warm/compile chunk; its miss count is the pre-balancer cold start
            _, warm_miss, _ = tiered[(mode, frac)].run_chunk()
            results[(mode, frac)]["miss"].append(warm_miss)
        except Exception as e:  # the axon relay rejects host callbacks
            skipped[(mode, frac)] = f"{type(e).__name__}: {str(e)[:120]}"
            tiered.pop((mode, frac), None)
    configs = [k for k in configs if k in tiered]
    d_times = []
    for _ in range(n_rounds):
        dt = dense.run_chunk()
        d_times.append(dt)
        for k in configs:
            ct, miss, reb = tiered[k].run_chunk()
            results[k]["t"].append(ct)
            results[k]["miss"].append(miss)
            results[k]["reb"].append(reb)
            results[k]["ratio"].append(dt / ct)

    best_key, best_tps, best_ratio = None, 0.0, 0.0
    print(f"# dense: {CHUNK / min(d_times):.1f} t/s", file=sys.stderr)
    for k, why in skipped.items():
        print(json.dumps({"config": f"{k[0]}@hot{k[1]}", "skipped": why}),
              file=sys.stderr)
    for k in configs:
        r = results[k]
        tps = CHUNK / min(r["t"])
        ratio = statistics.median(r["ratio"])
        print(json.dumps({
            "config": f"{k[0]}@hot{k[1]}", "tps": round(tps, 1),
            "vs_dense": round(ratio, 3),
            "miss_traj": [round(m, 0) for m in r["miss"]],
            "rebalance_ms": round(1e3 * statistics.median(r["reb"]), 1),
        }), file=sys.stderr)
        if tps > best_tps:
            best_key, best_tps, best_ratio = k, tps, ratio
    print(json.dumps({
        "metric": f"decode_tps_tiered_{preset}_b1",
        "value": round(best_tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(best_ratio, 3),
        "best_config": f"{best_key[0]}@hot{best_key[1]}" if best_key else "none",
    }))


def batch_main(plat):
    """`bench.py batch`: serving-batch amortization — sparse vs dense
    aggregate decode t/s at B in {1, 4, 8}. The sparse path's fixed
    per-step costs (predictor, top-k, kernel entry) amortize over the
    batch while its bandwidth saving persists, so the ratio should GROW
    with B (round-2 order-of-attack #3, BENCH_NOTES)."""
    from sparkinfer_tpu.models.transformer import make_forward

    preset = "1b" if plat == "tpu" else "tiny"
    cfg, params = build_model(preset)
    S = 1024
    n_trials = 4 if plat == "tpu" else 2
    dense_fwd = make_forward(cfg)
    sparse_fwd, sparams, dense_prefill = build_sparse(cfg, params, preset, plat)

    best = None
    for B in (1, 4, 8):
        dense = Path("dense", dense_fwd, params, cfg, S, batch=B)
        sparse = Path("sparse", sparse_fwd, sparams, cfg, S,
                      prefill_fwd=dense_prefill, batch=B)
        dense.run_chunk()
        sparse.run_chunk()
        d_t, s_t, ratios = [], [], []
        for _ in range(n_trials):
            dt = dense.run_chunk()
            st = sparse.run_chunk()
            d_t.append(dt)
            s_t.append(st)
            ratios.append(dt / st)
        row = {
            "batch": B,
            "dense_tps": round(B * CHUNK / min(d_t), 1),
            "sparse_tps": round(B * CHUNK / min(s_t), 1),
            "ratio": round(statistics.median(ratios), 3),
        }
        print(json.dumps(row), file=sys.stderr)
        if best is None or row["sparse_tps"] > best["sparse_tps"]:
            best = row
        del dense, sparse
    print(json.dumps({
        "metric": f"decode_tps_sparse_{preset}_batched",
        "value": best["sparse_tps"],
        "unit": "tokens/s",
        "vs_baseline": best["ratio"],
        "best_batch": best["batch"],
    }))


def build_moe_model(preset: str):
    """Qwen3-MoE-style decode model for the fused-MoE bench: router +
    stacked experts, silu gating."""
    import jax.numpy as jnp

    from sparkinfer_tpu.models.config import ModelConfig

    shapes = {
        # name: (L, E, H, Hkv, F_exp, X, k, V)
        "moe": (12, 2048, 16, 4, 1408, 8, 2, 32000),
        "tiny": (2, 256, 8, 4, 128, 4, 2, 1024),
    }
    L, E, H, Hkv, F, X, k, V = shapes[preset]
    D = E // H
    cfg = ModelConfig(arch="qwen3moe", n_layer=L, n_embd=E, n_head=H,
                      n_head_kv=Hkv, n_ff=F, n_ff_exp=F, n_vocab=V,
                      head_dim=D, n_expert=X, n_expert_used=k)
    rng = np.random.default_rng(0)

    def w(*shape, scale=0.02):
        return jnp.asarray(rng.standard_normal(shape, dtype=np.float32) * scale,
                           jnp.bfloat16)

    layers = {
        "attn_norm_w": jnp.ones((L, E), jnp.float32),
        "ffn_norm_w": jnp.ones((L, E), jnp.float32),
        "wq": w(L, E, H * D), "wk": w(L, E, Hkv * D), "wv": w(L, E, Hkv * D),
        "wo": w(L, H * D, E),
        "w_router": w(L, E, X, scale=0.1),
        "w_up_exps": w(L, X, E, F),
        "w_gate_exps": w(L, X, E, F),
        "w_down_exps": w(L, X, F, E),
    }
    params = {
        "tok_embd": w(V, E),
        "output_norm_w": jnp.ones((E,), jnp.float32),
        "output": w(E, V),
        "layers": layers,
    }
    return cfg, params


def moe_main(plat):
    """`bench.py moe`: dense-gather vs fused row-streaming expert FFN at
    batch-1 decode. Dense mode materializes per-token (k, E, F) expert
    gathers in HBM (jnp.take) before the matmuls; the Pallas path streams
    only the selected rows HBM->VMEM (PARITY gap: fused-MoE engine path)."""
    from sparkinfer_tpu.models.transformer import make_forward
    from sparkinfer_tpu.sparse.moe import moe_layout

    preset = "moe" if plat == "tpu" else "tiny"
    cfg, params = build_moe_model(preset)
    S = 1024
    n_trials = 6 if plat == "tpu" else 2

    dense_fwd = make_forward(cfg, moe_mode="dense")
    pallas_fwd = make_forward(cfg, moe_mode="pallas")
    rows_layers = moe_layout(params["layers"], cfg)
    for kk in ("w_up_exps", "w_gate_exps", "w_down_exps"):
        rows_layers.pop(kk)
    params_rows = dict(params) | {"layers": rows_layers}

    t0 = time.time()
    dense = Path("moe_dense", dense_fwd, params, cfg, S)
    print(json.dumps({"phase": "dense_prefill_ok", "t": round(time.time() - t0, 1)}),
          file=sys.stderr, flush=True)
    pallas = Path("moe_pallas", pallas_fwd, params_rows, cfg, S,
                  prefill_fwd=pallas_fwd)
    print(json.dumps({"phase": "pallas_prefill_ok", "t": round(time.time() - t0, 1)}),
          file=sys.stderr, flush=True)
    dense.run_chunk()
    print(json.dumps({"phase": "dense_decode_ok", "t": round(time.time() - t0, 1)}),
          file=sys.stderr, flush=True)
    pallas.run_chunk()
    print(json.dumps({"phase": "pallas_decode_ok", "t": round(time.time() - t0, 1)}),
          file=sys.stderr, flush=True)
    d_t, p_t, ratios = [], [], []
    for _ in range(n_trials):
        dt = dense.run_chunk()
        pt = pallas.run_chunk()
        d_t.append(dt)
        p_t.append(pt)
        ratios.append(dt / pt)
        print(json.dumps({"dense_ms": round(dt * 1e3 / CHUNK, 2),
                          "pallas_ms": round(pt * 1e3 / CHUNK, 2),
                          "ratio": round(dt / pt, 3)}), file=sys.stderr)
    print(json.dumps({
        "metric": f"decode_tps_moe_pallas_{preset}_b1",
        "value": round(CHUNK / min(p_t), 2),
        "unit": "tokens/s",
        "vs_baseline": round(statistics.median(ratios), 3),
        "dense_tps": round(CHUNK / min(d_t), 2),
    }))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from sparkinfer_tpu.models.transformer import make_forward

    plat = jax.devices()[0].platform
    preset = "1b" if plat == "tpu" else "tiny"
    if len(sys.argv) > 1:
        preset = sys.argv[1]
    if preset.startswith("tiered"):
        return tiered_main(plat, preset[6:].lstrip("-") or None)
    if preset == "batch":
        return batch_main(plat)
    if preset == "moe":
        return moe_main(plat)
    cfg, params = build_model(preset)
    tight_hbm = preset == "7b"
    S = 1024
    n_trials = 3 if preset == "tiny" else 6

    dense_fwd = make_forward(cfg)

    if tight_hbm:
        # HBM cannot hold both layouts at 7B: measure dense fully first,
        # free it, then sparse (same process; drift within a process is
        # far below the cross-process band — BENCH_NOTES.md)
        dense = Path("dense", dense_fwd, params, cfg, S)
        dense.run_chunk()  # warm
        d_times = [dense.run_chunk() for _ in range(n_trials)]
        del dense
        sparse_fwd, sparams, dense_prefill = build_sparse(cfg, params, preset, plat)
        sparse = Path("sparse", sparse_fwd, sparams, cfg, S,
                      prefill_fwd=dense_prefill)
        sparse.run_chunk()
        s_times = [sparse.run_chunk() for _ in range(n_trials)]
        ratios = [dt / st for dt, st in zip(sorted(d_times), sorted(s_times))]
    else:
        sparse_fwd, sparams, dense_prefill = build_sparse(cfg, params, preset, plat)
        dense = Path("dense", dense_fwd, params, cfg, S)
        sparse = Path("sparse", sparse_fwd, sparams, cfg, S,
                      prefill_fwd=dense_prefill)
        dense.run_chunk()  # warm/compile
        sparse.run_chunk()
        d_times, s_times, ratios = [], [], []
        for _ in range(n_trials):
            dt = dense.run_chunk()
            st = sparse.run_chunk()
            d_times.append(dt)
            s_times.append(st)
            ratios.append(dt / st)

    sparse_tps = CHUNK / min(s_times)
    dense_tps = CHUNK / min(d_times)
    ratio = statistics.median(ratios)
    print(json.dumps({
        "metric": f"decode_tps_sparse_{preset}_b1",
        "value": round(sparse_tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(ratio, 3),
    }))
    print(json.dumps({
        "metric": f"decode_tps_dense_{preset}_b1",
        "value": round(dense_tps, 2),
        "unit": "tokens/s",
        "ratio_spread": [round(min(ratios), 3), round(max(ratios), 3)],
        "vs_baseline": 1.0,
    }), file=sys.stderr)


if __name__ == "__main__":
    main()
