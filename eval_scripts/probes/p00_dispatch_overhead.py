#!/usr/bin/env python
"""Round-2 probe: attribute the fixed per-step overhead seen in round 1.

Questions:
  1. What does one jitted execute cost through the relay (dispatch floor)?
  2. How much does fusing the decode loop (lax.scan over steps, on-device
     argmax feedback) buy vs the per-step python loop?
  3. Does the persistent compilation cache work through the remote-compile
     relay (second run of this script should skip compiles)?

Run on TPU: timeout 1800 python eval_scripts/probe_dispatch.py
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def drain(a):
    return float(jnp.asarray(a).reshape(-1)[0])


def timeit(label, fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.3f} ms", flush=True)
    return best


def main():
    dev = jax.devices()[0]
    print("platform:", dev.platform, flush=True)

    # --- 1. dispatch floor ---------------------------------------------
    @jax.jit
    def bump(x):
        return x + 1.0

    x = jnp.zeros((8, 128), jnp.float32)
    t0 = time.perf_counter()
    x = bump(x)
    drain(x)
    print(f"bump compile+first: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

    def run_chain(n):
        y = x
        for _ in range(n):
            y = bump(y)
        drain(y)

    run_chain(4)
    b = timeit("chained 64 empty executes", lambda: run_chain(64))
    print(f"  -> per-execute pipelined cost: {b/64*1e6:.1f} us", flush=True)

    # drain after EVERY call (round-trip bound)
    def run_sync(n):
        y = x
        for _ in range(n):
            y = bump(y)
            drain(y)

    b = timeit("16 synchronous executes", lambda: run_sync(16))
    print(f"  -> per-execute synchronous cost: {b/16*1e3:.3f} ms", flush=True)

    # --- 2. dense 1B decode: per-step loop vs fused scan loop ----------
    from sparkinfer_tpu.models.config import ModelConfig
    from sparkinfer_tpu.models.transformer import make_forward
    from sparkinfer_tpu.runtime.kv_cache import init_cache

    L, E, H, Hkv, F, V = 22, 2048, 32, 4, 5632, 32000
    F = (F // 128) * 128
    D = E // H
    cfg = ModelConfig(arch="llama", n_layer=L, n_embd=E, n_head=H,
                      n_head_kv=Hkv, n_ff=F, n_vocab=V, head_dim=D)

    key = jax.random.PRNGKey(0)

    def w(*shape):
        nonlocal key
        key, k2 = jax.random.split(key)
        return (jax.random.normal(k2, shape, jnp.bfloat16) * 0.02)

    t0 = time.perf_counter()
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
    drain(params["output"])
    print(f"on-device 1B weight gen: {time.perf_counter()-t0:.1f} s", flush=True)

    fwd = make_forward(cfg)
    S = 1024
    cache = init_cache(cfg, 1, S, jnp.bfloat16)
    T0 = S // 2
    step = jax.jit(fwd, donate_argnums=(3,))

    t0 = time.perf_counter()
    lg, cache = step(params, jnp.zeros((1, T0), jnp.int32),
                     jnp.arange(T0, dtype=jnp.int32)[None], cache)
    drain(lg)
    print(f"prefill compile+run: {time.perf_counter()-t0:.1f} s", flush=True)

    tok = jnp.zeros((1, 1), jnp.int32)
    t0 = time.perf_counter()
    lg, cache = step(params, tok, jnp.full((1, 1), T0, jnp.int32), cache)
    drain(lg)
    print(f"decode step compile+run: {time.perf_counter()-t0:.1f} s", flush=True)

    n_steps = 32
    def per_step():
        nonlocal cache
        t0 = time.perf_counter()
        lg = None
        c = cache
        for i in range(n_steps):
            lg, c = step(params, tok, jnp.full((1, 1), T0 + 1 + i, jnp.int32), c)
        drain(lg)
        cache = c
        return n_steps / (time.perf_counter() - t0)

    for i in range(3):
        print(f"per-step dense decode: {per_step():.1f} t/s", flush=True)

    # fused loop: N steps inside one jit, greedy feedback
    N_FUSED = 32

    @jax.jit
    def fused(params, tok0, pos0, cache):
        def body(carry, _):
            tok, pos, cache = carry
            lg, cache = fwd(params, tok, pos[None], cache)
            nxt = jnp.argmax(lg[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
            return (nxt, pos + 1, cache), nxt[0, 0]
        (_, _, cache), toks = jax.lax.scan(
            body, (tok0, pos0, cache), None, length=N_FUSED)
        return toks, cache

    pos0 = jnp.full((1,), T0 + 40, jnp.int32)
    t0 = time.perf_counter()
    toks, cache = fused(params, tok, pos0, cache)
    drain(toks)
    print(f"fused loop compile+run: {time.perf_counter()-t0:.1f} s", flush=True)

    for i in range(4):
        t0 = time.perf_counter()
        toks, cache = fused(params, tok, pos0, cache)
        drain(toks)
        dt = time.perf_counter() - t0
        print(f"fused dense decode: {N_FUSED/dt:.1f} t/s  ({dt/N_FUSED*1e3:.2f} ms/tok)",
              flush=True)


if __name__ == "__main__":
    main()
