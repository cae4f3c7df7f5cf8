#!/usr/bin/env python
"""Round-2 kernel probe #3: same variants as probe #2 but with CHAINED
timing (K dependent executes, one drain) so the ~30 ms synchronous
readback floor of the relay is amortized to nothing.

Run: timeout 2400 python eval_scripts/probe_kernels3.py
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
K = 16  # chain length per measurement


def drain(a):
    return float(jnp.asarray(a).reshape(-1)[0])


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    key = jax.random.PRNGKey(0)

    def rnd(*shape, dtype=DT, scale=0.05):
        nonlocal key
        key, k2 = jax.random.split(key)
        return jax.random.normal(k2, shape, dtype) * scale

    x0b = rnd(1, E, dtype=DT, scale=1.0)

    def bench(name, loop, gb, n=4):
        def chain():
            y = x0b
            for _ in range(K):
                y = loop(y)
            drain(y)
        t0 = time.perf_counter()
        chain()
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            chain()
            best = min(best, time.perf_counter() - t0)
        per = best / K
        print(f"{name}: {per*1e3:.3f} ms/loop for {gb*1e3:.0f} MB "
              f"-> {gb/per:.0f} GB/s", flush=True)

    # raw ceiling, chained: y = f(big, y) reads 1GB and returns x-shaped
    big = rnd(512 * 1024 * 1024 // 2, dtype=DT)

    @jax.jit
    def raw(x, b):
        s = jnp.sum((b * 1.0001).astype(jnp.float32))
        return x + s.astype(DT) * 1e-9

    bench("raw 1GB read", lambda y: raw(y, big), 1.074)

    wu = rnd(NG, G, E)
    wg = rnd(NG, G, E)
    wd = rnd(NG, G, E)
    idx_all = jnp.asarray(
        np.stack([np.random.default_rng(i).choice(NG, (1, C), replace=False)
                  for i in range(L)]), jnp.int32)
    gp = jnp.full((1, C, G), 0.9, jnp.float32)
    sel_gb = L * 3 * C * G * E * 2 / 1e9
    dense_gb = L * 3 * NG * G * E * 2 / 1e9

    from sparkinfer_tpu.ops.sparse_ffn_pallas import (
        sparse_ffn_block,
        sparse_ffn_block_v3,
    )

    def scan_loop(block_fn):
        @jax.jit
        def loop(x, wu, wg, wd, idx_all):
            def body(x, idxl):
                out = block_fn(x, idxl, wu, wg, wd)
                return (out * 1e-3).astype(x.dtype), ()
            x, _ = jax.lax.scan(body, x, idx_all)
            return x
        return lambda y: loop(y, wu, wg, wd, idx_all)

    def v3w(w):
        def f(x, idxl, wu, wg, wd):
            return sparse_ffn_block_v3(x, idxl, gp, wu, wg, wd, act="fatrelu",
                                       interpret=False, window=w)
        return f

    def v1b(x, idxl, wu, wg, wd):
        return sparse_ffn_block(x, idxl, gp, wu, wg, wd, act="fatrelu",
                                interpret=False)

    def gather(x, idxl, wu, wg, wd):
        wu_s = jnp.take(wu, idxl[0], axis=0)
        wg_s = jnp.take(wg, idxl[0], axis=0)
        wd_s = jnp.take(wd, idxl[0], axis=0)
        up = jnp.einsum("e,cge->cg", x[0], wu_s)
        gt = jnp.einsum("e,cge->cg", x[0], wg_s)
        hid = jnp.where(gt > 0, gt, 0).astype(jnp.float32) * up.astype(jnp.float32)
        out = jnp.einsum("cg,cge->e", hid.astype(DT), wd_s)
        return out[None].astype(x.dtype)

    def dense(x, idxl, wu, wg, wd):
        up = jnp.einsum("e,nge->ng", x[0], wu)
        gt = jnp.einsum("e,nge->ng", x[0], wg)
        hid = (jnp.where(gt > 0, gt, 0).astype(jnp.float32)
               * up.astype(jnp.float32))
        out = jnp.einsum("ng,nge->e", hid.astype(DT), wd)
        return out[None].astype(x.dtype)

    bench("dense full-store scan", scan_loop(dense), dense_gb)
    bench("gather scan", scan_loop(gather), sel_gb)
    bench("v1 scan", scan_loop(v1b), sel_gb)
    for w in (4, 7):
        bench(f"v3 w={w} scan", scan_loop(v3w(w)), sel_gb)


if __name__ == "__main__":
    main()
