#!/usr/bin/env python
"""Round-2 kernel probe #5: v5 wave-batched kernel
(fewer, larger DMAs) vs the dense streaming ceiling, chained timing.

Run: timeout 2400 python eval_scripts/probe_kernels5.py
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

L, E, F = 22, 2048, 5632  # 1B decode shapes
DT = jnp.bfloat16
K = 16


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

    from sparkinfer_tpu.ops.sparse_ffn_pallas import sparse_ffn_block_v5

    def make_case(G, wave, frac=12 / 44):
        NG = F // G
        C = max(2, round(NG * frac))
        C = ((C + wave - 1) // wave) * wave
        wu = rnd(NG, G, E)
        wg = rnd(NG, G, E)
        wd = rnd(NG, G, E)
        idx_all = jnp.asarray(
            np.stack([np.random.default_rng(i).choice(NG, (1, C), replace=False)
                      for i in range(L)]), jnp.int32)
        gp = jnp.full((1, C, G), 0.9, jnp.float32)
        gbytes = L * C * 3 * G * E * 2 / 1e9

        @jax.jit
        def loop(x, wu, wg, wd, idx_all):
            def body(x, idxl):
                out = sparse_ffn_block_v5(x, idxl, gp, wu, wg, wd,
                                          act="fatrelu", interpret=False,
                                          wave=wave)
                return (out * 1e-3).astype(x.dtype), ()
            x, _ = jax.lax.scan(body, x, idx_all)
            return x

        return (lambda y: loop(y, wu, wg, wd, idx_all)), gbytes, C, NG

    for G, wave in ((128, 2), (128, 4), (128, 6), (256, 2), (256, 3)):
        loop, gb, C, NG = make_case(G, wave)
        bench(f"v5 G={G} wave={wave} C={C}/{NG}", loop, gb)

    # dense ceiling, same session
    wu = rnd(F // 128, 128, E)
    wg = rnd(F // 128, 128, E)
    wd = rnd(F // 128, 128, E)
    dense_gb = L * 3 * F * E * 2 / 1e9

    @jax.jit
    def dloop(x, wu, wg, wd):
        def body(x, _):
            up = jnp.einsum("e,nge->ng", x[0], wu)
            gt = jnp.einsum("e,nge->ng", x[0], wg)
            hid = (jnp.where(gt > 0, gt, 0).astype(jnp.float32)
                   * up.astype(jnp.float32))
            out = jnp.einsum("ng,nge->e", hid.astype(DT), wd)
            return (out[None] * 1e-3).astype(x.dtype), ()
        x, _ = jax.lax.scan(body, x, None, length=L)
        return x

    bench("dense full-store scan", lambda y: dloop(y, wu, wg, wd), dense_gb)


if __name__ == "__main__":
    main()
