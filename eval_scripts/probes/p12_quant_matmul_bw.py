#!/usr/bin/env python
"""Round-3 probe #12: flat quant-matmul effective bandwidth at decode
shapes (N=1). The q8full tiered config measured SLOWER than bf16
attention (33.2 vs 43.4 t/s) — the attention quant matmuls appear to run
at ~230-390 GB/s vs bf16 dense ~600+. Sweep stripe widths / scale dtypes
/ dequant precision to find the efficient shape.

Run: timeout 3000 python eval_scripts/probe_kernels12.py
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

QK = 32
VMEM = 100 * 1024 * 1024


def drain(a):
    return float(np.asarray(a).reshape(-1)[0])


def make_kernel(IN, OUT, TO, sc_dtype, deq):
    def kern(x_ref, qw_ref, sc_ref, out_ref):
        if deq == "bf16":
            w = qw_ref[:].astype(jnp.bfloat16)
            s = sc_ref[:].astype(jnp.bfloat16)
        else:
            w = qw_ref[:].astype(jnp.float32)
            s = sc_ref[:].astype(jnp.float32)
        w3 = w.reshape(IN // QK, QK, TO)
        w = (w3 * s[:, None, :]).reshape(IN, TO)
        out_ref[:] = jax.lax.dot_general(
            x_ref[:].astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    def call(x, qw, sc):
        return pl.pallas_call(
            kern,
            grid=(OUT // TO,),
            in_specs=[
                pl.BlockSpec((1, IN), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((IN, TO), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((IN // QK, TO), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TO), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, OUT), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM),
        )(x, qw, sc)

    @jax.jit
    def run(x, qw, sc):
        # chain 50 calls inside ONE executable: per-dispatch relay latency
        # (~1 ms) swamps single-op timing (probe v1 measured 27 GB/s for
        # everything incl. XLA bf16 dense)
        def body(i, xc):
            y = call(xc, qw, sc)
            return (y * 1e-3).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, 50, body, x)

    return run


def bench(fn, args, reps=4):
    out = fn(*args)
    drain(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        drain(out)
        best = min(best, time.perf_counter() - t0)
    return best / 50  # 50 chained calls per dispatch


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    IN, OUT = 5120, 5120
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, IN), jnp.bfloat16)
    qw = jax.random.randint(key, (IN, OUT), -127, 128, jnp.int8)
    scb = jnp.full((IN // QK, OUT), 2e-4, jnp.bfloat16)
    scf = scb.astype(jnp.float32)
    gbytes = (qw.size + x.size * 2) / 1e9

    # bf16 dense reference matmul at the same shape
    wb = jax.random.normal(key, (IN, OUT), jnp.bfloat16)

    @jax.jit
    def dense(x, w):
        def body(i, xc):
            y = jax.lax.dot_general(xc, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return (y * 1e-3).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, 50, body, x)

    dt = bench(dense, (x, wb))
    print(f"bf16 dense xla: {dt*1e6:.0f} us  {wb.size*2/1e9/dt:.0f} GB/s",
          flush=True)

    for TO in (512, 1024, 2560, 5120):
        if OUT % TO:
            continue
        for deq, sc in (("bf16", scb), ("f32", scf)):
            try:
                fn = make_kernel(IN, OUT, TO, sc.dtype, deq)
                t = bench(fn, (x, qw, sc))
                print(f"TO={TO:5d} deq={deq:4s} sc={sc.dtype}: "
                      f"{t*1e6:7.0f} us  {gbytes/t:6.0f} GB/s", flush=True)
            except Exception as e:
                print(f"TO={TO} deq={deq}: {type(e).__name__} "
                      f"{str(e)[:100]}", flush=True)

    # also probe the v6q-style whole-array block (grid over nothing):
    # single (IN, OUT) block read
    try:
        fn = make_kernel(IN, OUT, OUT, scb.dtype, "bf16")
        t = bench(fn, (x, qw, scb))
        print(f"single-block: {t*1e6:.0f} us {gbytes/t:.0f} GB/s", flush=True)
    except Exception as e:
        print("single-block:", type(e).__name__, str(e)[:100], flush=True)


if __name__ == "__main__":
    main()
