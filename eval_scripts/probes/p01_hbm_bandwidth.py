#!/usr/bin/env python
"""Round-2 kernel probe: effective HBM bandwidth of the sparse-FFN weight
stream, isolated from the rest of the decode step.

Each variant runs a 22-iteration lax.scan (one iteration ~= one layer's
sparse FFN at 1B decode shapes) inside ONE jitted program, so per-execute
relay dispatch is amortized away and the number is the on-chip streaming
rate of the kernel itself.

Run: timeout 2400 python eval_scripts/probe_kernels.py
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

L, E, G, NG, C = 22, 2048, 128, 44, 12
DT = jnp.bfloat16


def drain(a):
    return float(jnp.asarray(a).reshape(-1)[0])


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    key = jax.random.PRNGKey(0)

    def rnd(*shape, dtype=DT, scale=0.05):
        nonlocal key
        key, k2 = jax.random.split(key)
        return jax.random.normal(k2, shape, dtype) * scale

    wu = rnd(NG, G, E)
    wg = rnd(NG, G, E)
    wd = rnd(NG, G, E)
    # distinct selection per scan iteration; values don't matter for speed
    idx_all = jnp.asarray(
        np.stack([np.random.default_rng(i).choice(NG, (1, C), replace=False)
                  for i in range(L)]), jnp.int32)
    gp = jnp.full((1, C, G), 0.9, jnp.float32)
    x0 = rnd(1, E, dtype=jnp.float32, scale=1.0)

    bytes_per_iter = 3 * C * G * E * 2
    total_gb = L * bytes_per_iter / 1e9

    def make_loop(block_fn):
        @jax.jit
        def loop(x):
            def body(x, idxl):
                out = block_fn(x, idxl)
                return (out * 1e-3).astype(jnp.float32), ()
            x, _ = jax.lax.scan(body, x, idx_all)
            return x
        return loop

    def timeloop(name, loop, n=6):
        t0 = time.perf_counter()
        drain(loop(x0))
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            drain(loop(x0))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best*1e3:.3f} ms for {total_gb*1e3:.0f} MB "
              f"-> {total_gb/best:.0f} GB/s", flush=True)

    from sparkinfer_tpu.ops.sparse_ffn_pallas import (
        sparse_ffn_block,
        sparse_ffn_block_v3,
    )

    def v1(x, idxl):
        return sparse_ffn_block(x, idxl, gp, wu, wg, wd, act="fatrelu",
                                interpret=False)

    def v3(window):
        def f(x, idxl):
            return sparse_ffn_block_v3(x, idxl, gp, wu, wg, wd, act="fatrelu",
                                       interpret=False, window=window)
        return f

    def gather(x, idxl):
        wu_s = jnp.take(wu, idxl[0], axis=0)
        wg_s = jnp.take(wg, idxl[0], axis=0)
        wd_s = jnp.take(wd, idxl[0], axis=0)
        up = jnp.einsum("e,cge->cg", x[0].astype(DT), wu_s)
        gt = jnp.einsum("e,cge->cg", x[0].astype(DT), wg_s)
        hid = jnp.where(gt > 0, gt, 0).astype(jnp.float32) * up.astype(jnp.float32)
        out = jnp.einsum("cg,cge->e", hid.astype(DT), wd_s)
        return out[None].astype(jnp.float32)

    def dense(x, idxl):
        # ceiling probe: dense read of the FULL store (44/12 = 3.67x bytes)
        xb = x[0].astype(DT)
        up = jnp.einsum("e,nge->ng", xb, wu)
        gt = jnp.einsum("e,nge->ng", xb, wg)
        hid = (jnp.where(gt > 0, gt, 0).astype(jnp.float32)
               * up.astype(jnp.float32))
        out = jnp.einsum("ng,nge->e", hid.astype(DT), wd)
        return out[None].astype(jnp.float32)

    timeloop("v1 auto-pipeline", make_loop(v1))
    for w in (4, 8, 12):
        timeloop(f"v3 window={w}", make_loop(v3(w)))
    timeloop("gather einsum", make_loop(gather))

    dense_gb = L * 3 * NG * G * E * 2 / 1e9
    loop = make_loop(dense)
    t0 = time.perf_counter(); drain(loop(x0))
    print(f"dense full-store: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter(); drain(loop(x0))
        best = min(best, time.perf_counter() - t0)
    print(f"dense full-store: {best*1e3:.3f} ms for {dense_gb*1e3:.0f} MB "
          f"-> {dense_gb/best:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
