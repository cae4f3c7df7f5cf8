#!/usr/bin/env python
"""Round-2 probe #11: fused (lax.scan multi-step) vs unfused (per-step
dispatch) decode for BOTH dense and sparse, one session — the bench must
compare each mode at its best configuration.

Run: timeout 4500 python eval_scripts/probe_kernels11.py [preset]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

CHUNK = 32

from bench import build_model, make_fused_loop  # noqa: E402

from sparkinfer_tpu.models.transformer import make_forward  # noqa: E402
from sparkinfer_tpu.runtime.kv_cache import init_cache  # noqa: E402
from sparkinfer_tpu.sparse import SparseConfig  # noqa: E402
from sparkinfer_tpu.sparse.ffn import (  # noqa: E402
    make_pipelined_sparse_ffn,
    prepare_pipelined_params,
)


def drain(a):
    return float(np.asarray(a).reshape(-1)[0])


def run_fused(name, fwd, params, cfg, S=512, n=4):
    loop = make_fused_loop(fwd)
    cache = init_cache(cfg, 1, S, jnp.bfloat16)
    tok = jnp.zeros((1, 1), jnp.int32)
    pos = jnp.full((1, 1), 0, jnp.int32)
    t0 = time.perf_counter()
    tok, pos, cache = loop(params, tok, pos, cache)
    drain(tok)
    print(f"{name} fused: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        tok, pos, cache = loop(params, tok, pos, cache)
        drain(tok)
        best = min(best, time.perf_counter() - t0)
    print(f"{name} fused: {best/CHUNK*1e3:.3f} ms/step ({CHUNK/best:.1f} t/s)",
          flush=True)
    del cache
    return best / CHUNK


def run_unfused(name, fwd, params, cfg, S=512, n=4):
    step = jax.jit(fwd, donate_argnums=(3,))
    cache = init_cache(cfg, 1, S, jnp.bfloat16)
    tok = jnp.zeros((1, 1), jnp.int32)
    t0 = time.perf_counter()
    lg, cache = step(params, tok, jnp.full((1, 1), 0, jnp.int32), cache)
    drain(lg)
    print(f"{name} unfused: compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    best = float("inf")
    p = 1
    for _ in range(n):
        t0 = time.perf_counter()
        for i in range(CHUNK):
            lg, cache = step(params, tok, jnp.full((1, 1), p, jnp.int32), cache)
            p += 1
        drain(lg)
        best = min(best, time.perf_counter() - t0)
    print(f"{name} unfused: {best/CHUNK*1e3:.3f} ms/step ({CHUNK/best:.1f} t/s)",
          flush=True)
    del cache
    return best / CHUNK


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    preset = sys.argv[1] if len(sys.argv) > 1 else "1b"
    cfg, params = build_model(preset)

    dense_fwd = make_forward(cfg)
    scfg = SparseConfig(group_size=128, capacity_groups=12)
    sp = prepare_pipelined_params(params, cfg, scfg, drop_dense=False,
                                  layout="v6")
    ffn, ci = make_pipelined_sparse_ffn(cfg, scfg, mode="pallas")
    sparse_fwd = make_forward(cfg, ffn_fn=ffn, ffn_carry_init=ci)

    # interleave everything twice to expose in-session drift
    for round_ in (1, 2):
        df = run_fused("dense", dense_fwd, params, cfg)
        du = run_unfused("dense", dense_fwd, params, cfg)
        sf = run_fused("sparse", sparse_fwd, sp, cfg)
        su = run_unfused("sparse", sparse_fwd, sp, cfg)
        print(f"[round {round_}] best-vs-best ratio: "
              f"{min(df, du)/min(sf, su):.3f} "
              f"(fused/fused {df/sf:.3f})", flush=True)


if __name__ == "__main__":
    main()
