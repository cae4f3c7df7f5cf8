#!/usr/bin/env python
"""Round-2 kernel probe #7: auto-pipeline with DYNAMIC index_map at grid
depth. Probe #6 showed the auto-pipeline streams 779 GB/s with a static
index_map while every manual-DMA variant caps at ~170 GB/s. Here:

  1. v1 unroll=1 (grid (1, C) = 12 steps, 3 dynamic streams)
  2. v1 unroll=2
  3. dense-pallas stream with a scalar-prefetched identity index
     (dynamic index_map at grid depth 44 — isolates the dynamic-index cost)
  4. bigger capacity C=24, unroll=1 (grid depth 24)

Run: timeout 2400 python eval_scripts/probe_kernels7.py
"""

from __future__ import annotations

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

L, E, G, NG = 22, 2048, 128, 44
DT = jnp.bfloat16
K = 16


def drain(a):
    return float(jnp.asarray(a).reshape(-1)[0])


def dyn_dense_kernel(*refs):
    idx_ref, up_ref, gate_ref, down_ref, out_ref = refs
    i = pl.program_id(0)
    part = (up_ref[0, 0, :] + gate_ref[0, 0, :] + down_ref[0, 0, :])

    @pl.when(i == 0)
    def _():
        out_ref[0] = part

    @pl.when(i > 0)
    def _():
        out_ref[0] = out_ref[0] + part


@jax.jit
def pallas_dyn_dense(idx, wu, wg, wd):
    spec = pl.BlockSpec((1, G, E), lambda i, idx_ref: (idx_ref[i], 0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NG,),
        in_specs=[spec] * 3,
        out_specs=pl.BlockSpec((1, E), lambda i, idx_ref: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        dyn_dense_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, E), DT),
    )(idx, wu, wg, wd)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    key = jax.random.PRNGKey(0)

    def rnd(*shape, dtype=DT, scale=0.05):
        nonlocal key
        key, k2 = jax.random.split(key)
        return jax.random.normal(k2, shape, dtype) * scale

    x0b = rnd(1, E, dtype=DT, scale=1.0)
    wu = rnd(NG, G, E)
    wg = rnd(NG, G, E)
    wd = rnd(NG, G, E)

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

    from sparkinfer_tpu.ops.sparse_ffn_pallas import sparse_ffn_block

    def v1_loop(C, unroll):
        idx_all = jnp.asarray(
            np.stack([np.random.default_rng(i).choice(NG, (1, C), replace=False)
                      for i in range(L)]), jnp.int32)
        gp = jnp.full((1, C, G), 0.9, jnp.float32)

        @jax.jit
        def loop(x, wu, wg, wd, idx_all):
            def body(x, idxl):
                out = sparse_ffn_block(x, idxl, gp, wu, wg, wd, act="fatrelu",
                                       interpret=False, unroll=unroll)
                return (out * 1e-3).astype(x.dtype), ()
            x, _ = jax.lax.scan(body, x, idx_all)
            return x
        gb = L * 3 * C * G * E * 2 / 1e9
        return (lambda y: loop(y, wu, wg, wd, idx_all)), gb

    for C, u in ((12, 1), (12, 2), (24, 1)):
        loop, gb = v1_loop(C, u)
        bench(f"v1 C={C} unroll={u}", loop, gb)

    # dynamic-identity full sweep (isolates dynamic index_map at depth 44)
    idx_id = jnp.arange(NG, dtype=jnp.int32)
    dense_gb = L * 3 * NG * G * E * 2 / 1e9

    @jax.jit
    def dyn_loop(x, wu, wg, wd):
        def body(x, _):
            out = pallas_dyn_dense(idx_id, wu, wg, wd)
            return (x + out[0, :1].astype(x.dtype) * 1e-9), ()
        x, _ = jax.lax.scan(body, x, None, length=L)
        return x

    bench("pallas dyn-idx dense sweep", lambda y: dyn_loop(y, wu, wg, wd),
          dense_gb)


if __name__ == "__main__":
    main()
