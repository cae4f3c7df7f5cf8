#!/usr/bin/env python
"""Round-2 kernel probe #8: v6 (auto-pipeline + VPU matvec) vs a static
dense VPU-matvec pallas kernel (dense-path candidate) vs XLA dense.

Run: timeout 2400 python eval_scripts/probe_kernels8.py
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


def dense_vpu_kernel(*refs):
    xT_ref, wuT_ref, wgT_ref, wd_ref, out_ref = refs
    i = pl.program_id(0)
    xT = xT_ref[0].astype(jnp.float32)  # (E, 1)
    up = jnp.sum(xT * wuT_ref[0].astype(jnp.float32), axis=0, keepdims=True)
    gt = jnp.sum(xT * wgT_ref[0].astype(jnp.float32), axis=0, keepdims=True)
    hid = jnp.where(gt > 0, gt, 0.0) * up  # (1, G)
    hid_T = hid.reshape(hid.shape[-1], 1)
    part = jnp.sum(hid_T * wd_ref[0].astype(jnp.float32), axis=0,
                   keepdims=True)

    @pl.when(i == 0)
    def _():
        out_ref[0] = part

    @pl.when(i > 0)
    def _():
        out_ref[0] = out_ref[0] + part


@jax.jit
def pallas_dense_vpu(xT, wuT, wgT, wd):
    wspecT = pl.BlockSpec((1, E, G), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((1, G, E), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        dense_vpu_kernel,
        grid=(NG,),
        in_specs=[pl.BlockSpec((E, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM), wspecT, wspecT, wspec],
        out_specs=pl.BlockSpec((1, E), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, E), jnp.float32),
    )(xT, wuT, wgT, wd)


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
    wuT = jnp.swapaxes(wu, -1, -2)
    wgT = jnp.swapaxes(wg, -1, -2)

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

    from sparkinfer_tpu.ops.sparse_ffn_pallas import sparse_ffn_block_v6

    def v6_loop(C):
        idx_all = jnp.asarray(
            np.stack([np.random.default_rng(i).choice(NG, (1, C), replace=False)
                      for i in range(L)]), jnp.int32)
        gp = jnp.full((1, C, G), 0.9, jnp.float32)

        @jax.jit
        def loop(x, wuT, wgT, wd, idx_all):
            def body(x, idxl):
                out = sparse_ffn_block_v6(x, idxl, gp, wuT, wgT, wd,
                                          act="fatrelu", interpret=False)
                return (out * 1e-3).astype(x.dtype), ()
            x, _ = jax.lax.scan(body, x, idx_all)
            return x
        gb = L * 3 * C * G * E * 2 / 1e9
        return (lambda y: loop(y, wuT, wgT, wd, idx_all)), gb

    for C in (12, 8):
        loop, gb = v6_loop(C)
        bench(f"v6 C={C}", loop, gb)

    dense_gb = L * 3 * NG * G * E * 2 / 1e9

    @jax.jit
    def dvpu_loop(x, wuT, wgT, wd):
        def body(x, _):
            out = pallas_dense_vpu(x.reshape(E, 1), wuT, wgT, wd)
            return (out * 1e-3).astype(x.dtype).reshape(1, E), ()
        x, _ = jax.lax.scan(body, x, None, length=L)
        return x

    bench("pallas dense VPU matvec", lambda y: dvpu_loop(y, wuT, wgT, wd),
          dense_gb)

    @jax.jit
    def xla_dense(x, wu, wg, wd):
        def body(x, _):
            up = jnp.einsum("e,nge->ng", x[0], wu)
            gt = jnp.einsum("e,nge->ng", x[0], wg)
            hid = (jnp.where(gt > 0, gt, 0).astype(jnp.float32)
                   * up.astype(jnp.float32))
            out = jnp.einsum("ng,nge->e", hid.astype(DT), wd)
            return (out[None] * 1e-3).astype(x.dtype), ()
        x, _ = jax.lax.scan(body, x, None, length=L)
        return x

    bench("xla dense einsum", lambda y: xla_dense(y, wu, wg, wd), dense_gb)


if __name__ == "__main__":
    main()
