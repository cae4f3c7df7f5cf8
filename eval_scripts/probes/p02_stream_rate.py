#!/usr/bin/env python
"""Round-2 kernel probe #2: why does the isolated sparse kernel stream at
16 GB/s when the in-model ablation implied ~175 GB/s?

Isolation axes: raw HBM ceiling, dense einsum over the same stores,
gather-by-index, pallas v1/v3, constant-idx vs scan-sliced idx, x dtype.

Run: timeout 2400 python eval_scripts/probe_kernels2.py
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


def bench(name, fn, gb, n=5):
    t0 = time.perf_counter()
    drain(fn())
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        drain(fn())
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.3f} ms for {gb*1e3:.0f} MB -> {gb/best:.0f} GB/s",
          flush=True)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    key = jax.random.PRNGKey(0)

    def rnd(*shape, dtype=DT, scale=0.05):
        nonlocal key
        key, k2 = jax.random.split(key)
        return jax.random.normal(k2, shape, dtype) * scale

    # 0. raw HBM ceiling: elementwise over 1 GB
    big = rnd(512 * 1024 * 1024 // 2, dtype=DT)  # 1 GB bf16

    @jax.jit
    def raw(x):
        return jnp.sum((x * 1.0001).astype(jnp.float32))

    bench("raw 1GB read", lambda: raw(big), 1.074)

    wu = rnd(NG, G, E)
    wg = rnd(NG, G, E)
    wd = rnd(NG, G, E)
    idx_all = jnp.asarray(
        np.stack([np.random.default_rng(i).choice(NG, (1, C), replace=False)
                  for i in range(L)]), jnp.int32)
    idx_const = idx_all[0]
    gp = jnp.full((1, C, G), 0.9, jnp.float32)
    x0b = rnd(1, E, dtype=DT, scale=1.0)

    sel_gb = L * 3 * C * G * E * 2 / 1e9
    dense_gb = L * 3 * NG * G * E * 2 / 1e9

    from sparkinfer_tpu.ops.sparse_ffn_pallas import (
        sparse_ffn_block,
        sparse_ffn_block_v3,
    )

    def scan_loop(block_fn, use_xs):
        @jax.jit
        def loop(x):
            def body(x, idxl):
                out = block_fn(x, idxl)
                return (out * 1e-3).astype(x.dtype), ()
            x, _ = jax.lax.scan(body, x, idx_all if use_xs else None,
                                length=None if use_xs else L)
            return x
        return loop

    def v3b(x, idxl):
        idxl = idx_const if idxl is None else idxl
        return sparse_ffn_block_v3(x, idxl, gp, wu, wg, wd, act="fatrelu",
                                   interpret=False, window=4)

    def v1b(x, idxl):
        idxl = idx_const if idxl is None else idxl
        return sparse_ffn_block(x, idxl, gp, wu, wg, wd, act="fatrelu",
                                interpret=False)

    def gather(x, idxl):
        idxl = idx_const if idxl is None else idxl
        wu_s = jnp.take(wu, idxl[0], axis=0)
        wg_s = jnp.take(wg, idxl[0], axis=0)
        wd_s = jnp.take(wd, idxl[0], axis=0)
        up = jnp.einsum("e,cge->cg", x[0], wu_s)
        gt = jnp.einsum("e,cge->cg", x[0], wg_s)
        hid = jnp.where(gt > 0, gt, 0).astype(jnp.float32) * up.astype(jnp.float32)
        out = jnp.einsum("cg,cge->e", hid.astype(DT), wd_s)
        return out[None].astype(x.dtype)

    def dense(x, idxl):
        up = jnp.einsum("e,nge->ng", x[0], wu)
        gt = jnp.einsum("e,nge->ng", x[0], wg)
        hid = (jnp.where(gt > 0, gt, 0).astype(jnp.float32)
               * up.astype(jnp.float32))
        out = jnp.einsum("ng,nge->e", hid.astype(DT), wd)
        return out[None].astype(x.dtype)

    bench("dense full-store scan (bf16 x)", lambda l=scan_loop(dense, False): l(x0b),
          dense_gb)
    bench("gather const-idx scan (bf16 x)", lambda l=scan_loop(gather, False): l(x0b),
          sel_gb)
    bench("gather xs-idx scan (bf16 x)", lambda l=scan_loop(gather, True): l(x0b),
          sel_gb)
    bench("v3 w=4 const-idx scan (bf16 x)", lambda l=scan_loop(v3b, False): l(x0b),
          sel_gb)
    bench("v3 w=4 xs-idx scan (bf16 x)", lambda l=scan_loop(v3b, True): l(x0b),
          sel_gb)
    bench("v1 const-idx scan (bf16 x)", lambda l=scan_loop(v1b, False): l(x0b),
          sel_gb)


if __name__ == "__main__":
    main()
