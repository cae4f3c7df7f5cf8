#!/usr/bin/env python
"""Round-2 kernel probe #6: what caps the Pallas DMA path at ~190 GB/s?

Variants:
  1. pure-DMA manual kernel (no compute), dynamic idx
  2. pure-DMA manual kernel, contiguous idx (locality control)
  3. pallas auto-pipeline dense stream over the full store (trivial compute)
  4. XLA dense einsum (the 400 GB/s reference)
  5. v5 with sorted idx

Run: timeout 2400 python eval_scripts/probe_kernels6.py
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

L, E, G, NG, C = 22, 2048, 128, 44, 12
DT = jnp.bfloat16
K = 16
W = 7


def drain(a):
    return float(jnp.asarray(a).reshape(-1)[0])


def pure_dma_kernel(C, W, *refs):
    (idx_ref, up_hbm, gate_hbm, down_hbm, out_ref, su, sg, sd,
     sem_u, sem_g, sem_d) = refs
    n = pl.program_id(0)

    def dma(hbm, scr, sem, c, slot):
        return pltpu.make_async_copy(hbm.at[idx_ref[n, c]], scr.at[slot],
                                     sem.at[slot])

    for c in range(min(W, C)):
        dma(up_hbm, su, sem_u, c, c).start()
        dma(gate_hbm, sg, sem_g, c, c).start()
        dma(down_hbm, sd, sem_d, c, c).start()
    for c in range(C):
        slot = c % W
        dma(up_hbm, su, sem_u, c, slot).wait()
        dma(gate_hbm, sg, sem_g, c, slot).wait()
        dma(down_hbm, sd, sem_d, c, slot).wait()
        if c + W < C:
            dma(up_hbm, su, sem_u, c + W, slot).start()
            dma(gate_hbm, sg, sem_g, c + W, slot).start()
            dma(down_hbm, sd, sem_d, c + W, slot).start()
    out_ref[0] = su[0, 0, :] + sg[0, 0, :] + sd[0, 0, :]


@functools.partial(jax.jit, static_argnames=())
def pure_dma(idx, wu, wg, wd):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=pl.BlockSpec((1, E), lambda n, idx_ref: (n, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((W, G, E), DT) for _ in range(3)]
        + [pltpu.SemaphoreType.DMA((W,))] * 3,
    )
    return pl.pallas_call(
        functools.partial(pure_dma_kernel, C, W),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, E), DT),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, wu, wg, wd)


def dense_stream_kernel(*refs):
    up_ref, gate_ref, down_ref, out_ref = refs
    i = pl.program_id(0)
    part = (up_ref[0, 0, :] + gate_ref[0, 0, :] + down_ref[0, 0, :])

    @pl.when(i == 0)
    def _():
        out_ref[0] = part

    @pl.when(i > 0)
    def _():
        out_ref[0] = out_ref[0] + part


@jax.jit
def pallas_dense_stream(wu, wg, wd):
    spec = pl.BlockSpec((1, G, E), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        dense_stream_kernel,
        grid=(NG,),
        in_specs=[spec] * 3,
        out_specs=pl.BlockSpec((1, E), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, E), DT),
    )(wu, wg, wd)


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

    sel_gb = L * 3 * C * G * E * 2 / 1e9
    dense_gb = L * 3 * NG * G * E * 2 / 1e9

    idx_dyn = jnp.asarray(
        np.stack([np.random.default_rng(i).choice(NG, (1, C), replace=False)
                  for i in range(L)]), jnp.int32)
    idx_sorted = jnp.sort(idx_dyn, axis=-1)
    idx_contig = jnp.asarray(
        np.stack([(np.arange(C) + 2 * i) % NG for i in range(L)])[:, None, :],
        jnp.int32)

    def dma_loop(idx_all):
        @jax.jit
        def loop(x, wu, wg, wd, idx_all):
            def body(x, idxl):
                out = pure_dma(idxl, wu, wg, wd)
                return (x + out[0, :1].astype(x.dtype) * 1e-9), ()
            x, _ = jax.lax.scan(body, x, idx_all)
            return x
        return lambda y: loop(y, wu, wg, wd, idx_all)

    bench("pure-DMA dynamic idx", dma_loop(idx_dyn), sel_gb)
    bench("pure-DMA contiguous idx", dma_loop(idx_contig), sel_gb)

    @jax.jit
    def dstream_loop(x, wu, wg, wd):
        def body(x, _):
            out = pallas_dense_stream(wu, wg, wd)
            return (x + out[0, :1].astype(x.dtype) * 1e-9), ()
        x, _ = jax.lax.scan(body, x, None, length=L)
        return x

    bench("pallas auto-pipeline dense", lambda y: dstream_loop(y, wu, wg, wd),
          dense_gb)

    from sparkinfer_tpu.ops.sparse_ffn_pallas import sparse_ffn_block_v5
    gp = jnp.full((1, C, G), 0.9, jnp.float32)

    def v5_loop(idx_all):
        @jax.jit
        def loop(x, wu, wg, wd, idx_all):
            def body(x, idxl):
                out = sparse_ffn_block_v5(x, idxl, gp, wu, wg, wd,
                                          act="fatrelu", interpret=False,
                                          wave=2)
                return (out * 1e-3).astype(x.dtype), ()
            x, _ = jax.lax.scan(body, x, idx_all)
            return x
        return lambda y: loop(y, wu, wg, wd, idx_all)

    bench("v5 sorted idx", v5_loop(idx_sorted), sel_gb)

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
