#!/usr/bin/env python
"""Activation-family sweep — the analogue of the reference's
eval_scripts/non_relu_{spif_pwif,topk}.sh, which measure the sparse path
on models whose FFN is NOT natively ReLU (sparseqwen2 = dReLU-ified
Qwen2, relufalcon = ReLU-ified Falcon) alongside the ReLU-native
ProSparse/Bamboo family.

Here the same sweep runs over the framework's sparse activation zoo
(ref: build_sparse_ffn per-arch activations, src/llama-graph.cpp:1063-1094):
  prosparse_llama  fatrelu(gate)*up   (gated)
  bamboo           relu(gate)*relu(up) (gated dReLU)
  qwen2            dReLU, neox rope    (the sparseqwen2 analogue)
  opt              relu(up)            (ungated relu)
Each arch: build a synthetic predictor model (bench.py shapes), decode
dense vs sparse with the interleaved paired protocol, report t/s + ratio.

Usage: python eval_scripts/nonrelu_sweep.py [tiny|1b|3b]  (default: tiny
on CPU, 1b on TPU)
"""

from __future__ import annotations

import json
import statistics
import sys

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402  (repo-root bench machinery: build_model, Path)

ARCHS = ["prosparse_llama", "bamboo", "qwen2", "opt"]


def build_for_arch(arch: str, preset: str):
    """bench.build_model re-targeted at `arch` (same llama-like shapes;
    opt adds learned positions and drops gate/rope per its traits)."""
    import jax.numpy as jnp

    from sparkinfer_tpu.models.config import ModelConfig

    cfg0, params = bench.build_model(preset)
    cfg = ModelConfig(
        arch=arch, n_layer=cfg0.n_layer, n_embd=cfg0.n_embd,
        n_head=cfg0.n_head, n_head_kv=cfg0.n_head_kv, n_ff=cfg0.n_ff,
        n_vocab=cfg0.n_vocab, head_dim=cfg0.head_dim,
        pred_lora=cfg0.pred_lora,
    )
    layers = params["layers"]
    if not (cfg.traits.sparse_act in ("fatrelu", "drelu")):
        layers.pop("w_gate", None)  # ungated: relu(up) only
    if cfg.traits.pos_embd:
        S = 1024 + cfg.traits.pos_embd_offset + 8
        rng = np.random.default_rng(1)
        params["pos_embd"] = jnp.asarray(
            rng.standard_normal((S, cfg.n_embd), dtype=np.float32) * 0.02,
            jnp.bfloat16)
    return cfg, params


def run_arch(arch: str, preset: str, plat: str, n_trials: int):
    from sparkinfer_tpu.models.transformer import make_forward

    cfg, params = build_for_arch(arch, preset)
    S = 1024
    dense = bench.Path("dense", make_forward(cfg), params, cfg, S)
    sparse_fwd, sparams, dense_prefill = bench.build_sparse(
        cfg, params, preset, plat)
    sparse = bench.Path("sparse", sparse_fwd, sparams, cfg, S,
                        prefill_fwd=dense_prefill)
    dense.run_chunk(), sparse.run_chunk()  # warm/compile
    ratios, d_best, s_best = [], 1e9, 1e9
    for _ in range(n_trials):
        dt, st = dense.run_chunk(), sparse.run_chunk()
        d_best, s_best = min(d_best, dt), min(s_best, st)
        ratios.append(dt / st)
    return {
        "arch": arch, "act": cfg.traits.sparse_act,
        "gated": cfg.traits.sparse_act in ("fatrelu", "drelu"),
        "dense_tps": round(bench.CHUNK / d_best, 1),
        "sparse_tps": round(bench.CHUNK / s_best, 1),
        "ratio": round(statistics.median(ratios), 3),
    }


def main() -> int:
    import jax

    plat = jax.devices()[0].platform
    preset = sys.argv[1] if len(sys.argv) > 1 else (
        "1b" if plat == "tpu" else "tiny")
    n_trials = 4 if plat == "tpu" else 2
    for arch in ARCHS:
        try:
            print(json.dumps(run_arch(arch, preset, plat, n_trials)))
        except Exception as e:
            print(json.dumps({"arch": arch,
                              "error": f"{type(e).__name__}: {str(e)[:160]}"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
