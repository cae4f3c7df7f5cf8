#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line with the headline metric.

Metric: single-chip decode throughput (tokens/s) on a llama-7B-shaped
bf16 model (or a scaled-down variant if HBM is tight), the analogue of
llama-bench tg (tools/llama-bench). vs_baseline compares against the
reference's DGX-Spark dense-path tg numbers only loosely — the real
baseline for the sparse path lands once the sparse bench exists.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def build_model(preset: str):
    import jax.numpy as jnp

    from sparkinfer_tpu.models.config import ModelConfig

    shapes = {
        # name: (L, E, H, Hkv, F, V)
        "7b": (32, 4096, 32, 32, 11008, 32000),
        "3b": (26, 3200, 32, 32, 8640, 32000),
        "1b": (22, 2048, 32, 4, 5632, 32000),
        "tiny": (2, 256, 8, 4, 512, 1024),
    }
    L, E, H, Hkv, F, V = shapes[preset]
    D = E // H
    cfg = ModelConfig(arch="llama", n_layer=L, n_embd=E, n_head=H, n_head_kv=Hkv,
                      n_ff=F, n_vocab=V, head_dim=D)
    rng = np.random.default_rng(0)

    def w(*shape):
        # iid small weights; bf16 on device
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.02, jnp.bfloat16)

    layers = {
        "attn_norm_w": jnp.ones((L, E), jnp.float32),
        "ffn_norm_w": jnp.ones((L, E), jnp.float32),
        "wq": w(L, E, H * D), "wk": w(L, E, Hkv * D), "wv": w(L, E, Hkv * D),
        "wo": w(L, H * D, E),
        "w_up": w(L, E, F), "w_gate": w(L, E, F), "w_down": w(L, F, E),
    }
    params = {
        "tok_embd": w(V, E),
        "output_norm_w": jnp.ones((E,), jnp.float32),
        "output": w(E, V),
        "layers": layers,
    }
    return cfg, params


def main():
    import jax
    import jax.numpy as jnp

    from sparkinfer_tpu.models.transformer import make_forward
    from sparkinfer_tpu.runtime.kv_cache import init_cache

    plat = jax.devices()[0].platform
    preset = "7b" if plat == "tpu" else "tiny"
    if len(sys.argv) > 1:
        preset = sys.argv[1]
    cfg, params = build_model(preset)

    fwd = jax.jit(make_forward(cfg), donate_argnums=(3,))
    B, S = 1, 1024
    cache = init_cache(cfg, B, S, jnp.bfloat16)

    # prefill 512 to fill cache state realistically
    T0 = 512
    tokens = jnp.zeros((B, T0), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T0, dtype=jnp.int32)[None], (B, T0))
    logits, cache = fwd(params, tokens, pos, cache)
    logits.block_until_ready()

    tok = jnp.zeros((B, 1), jnp.int32)
    # warmup decode step (compile)
    lg, cache = fwd(params, tok, jnp.full((B, 1), T0, jnp.int32), cache)
    lg.block_until_ready()

    n_steps = 64 if preset != "tiny" else 32
    t0 = time.perf_counter()
    for i in range(n_steps):
        lg, cache = fwd(params, tok, jnp.full((B, 1), T0 + 1 + i, jnp.int32), cache)
    lg.block_until_ready()
    dt = time.perf_counter() - t0
    tps = n_steps / dt

    # reference anchor: no published single-chip dense tg for this shape;
    # report ratio vs the DGX-Spark gpt-oss-20B tg32 86.58 t/s only as a
    # loose cross-hardware marker when running the 7b preset on real TPU.
    vs = tps / 86.58 if (preset == "7b" and plat == "tpu") else 0.0
    print(json.dumps({
        "metric": f"decode_tps_dense_{preset}_bf16_b1",
        "value": round(tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
