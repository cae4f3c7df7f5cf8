#!/usr/bin/env python
"""Round-3 probe #13: where do the 13B headline step's 18.1 ms go?

The w8a8attn+q8+fetch config decodes at 55.1 t/s (18.15 ms/step) moving
~7.6 GB/step — ~450 GB/s effective vs the chip's ~820 GB/s HBM peak, so
up to ~2x is still on the table. This probe times each leg of the step
STANDALONE at the exact 13B shapes (L=40, E=5120, F=13824, C=16 hot
groups, S=1024 ctx, R=1280 predictor):

  attn_w8a8   4 int8 MXU matmuls/layer (wq wk wv wo)     4.19 GB int8
  kv_math     QK^T + PV against a bf16 S=1024 cache      0.84 GB bf16
  pred_q8     flat-quant pred_up + pred_down matmuls     0.97 GB q8
  ffn_v6q     fused hot-store kernel, C=16 groups/layer  1.26 GB q8
  head        (1,E)@(E,V) bf16 lm head                   0.33 GB bf16

Sum-of-legs vs the measured full step isolates dispatch/fusion overhead
the legs can't see. Per-leg GB/s names the slowest stream.

Run: timeout 3300 python eval_scripts/probe_kernels13.py
"""

from __future__ import annotations

import json
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

L, E, F, V, RP, S, C, G = 40, 5120, 13824, 32000, 1280, 1024, 16, 128
NG = F // G  # 108 groups/layer
H = 27  # hot groups/layer at hot0.25
CHUNK = 64


def _drain(a):
    return float(np.asarray(a).reshape(-1)[0])


def _i8(key, *shape):
    """Device-generated int8 tensor (layer-chunked to bound transients)."""
    def body(i, acc):
        k = jax.random.fold_in(key, i)
        r = jax.random.randint(k, shape[1:], -127, 128, jnp.int32)
        return acc.at[i].set(r.astype(jnp.int8))

    return jax.jit(lambda: jax.lax.fori_loop(
        0, shape[0], body, jnp.zeros(shape, jnp.int8)))()


def _bf16(key, *shape, scale=0.02):
    def body(i, acc):
        k = jax.random.fold_in(key, i)
        r = jax.random.normal(k, shape[1:], jnp.float32) * scale
        return acc.at[i].set(r.astype(jnp.bfloat16))

    return jax.jit(lambda: jax.lax.fori_loop(
        0, shape[0], body, jnp.zeros(shape, jnp.bfloat16)))()


def time_leg(name, fn, x0, gbytes, ws, n_trials=4):
    """ws: weights passed as EXPLICIT jit args — closing over device
    arrays embeds them as HLO constants, which the relay serializes
    (a 4.2 GB compile payload; killed the first probe run)."""
    f = jax.jit(fn)
    x = f(x0, ws)  # compile+warm
    _drain(x)
    best = float("inf")
    for _ in range(n_trials):
        t0 = time.perf_counter()
        for _ in range(CHUNK):
            x = f(x, ws)
        _drain(x)
        best = min(best, (time.perf_counter() - t0) / CHUNK)
    row = {"leg": name, "ms": round(best * 1e3, 3), "gb": round(gbytes, 2),
           "gbps": round(gbytes / best, 1) if gbytes else 0.0}
    print(json.dumps(row), flush=True)
    return row


def main():
    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 32))
    rows = []
    x0 = jnp.ones((1, E), jnp.bfloat16) * 0.01

    # --- leg 1: W8A8 attention matmuls (the whale: 4.19 GB int8) -------
    from sparkinfer_tpu.ops.quant_matmul import W8A8Tensor, w8a8_linear

    wq = W8A8Tensor(_i8(next(ks), L, E, E),
                    jnp.full((L, E), 2.2e-4, jnp.float32))
    wk = W8A8Tensor(_i8(next(ks), L, E, E),
                    jnp.full((L, E), 2.2e-4, jnp.float32))
    wv = W8A8Tensor(_i8(next(ks), L, E, E),
                    jnp.full((L, E), 2.2e-4, jnp.float32))
    wo = W8A8Tensor(_i8(next(ks), L, E, E),
                    jnp.full((L, E), 2.2e-4, jnp.float32))

    def attn_fn(x, ws):
        def body(h, w):
            q = w8a8_linear(h, w[0])
            k = w8a8_linear(h, w[1])
            v = w8a8_linear(h, w[2])
            o = w8a8_linear((q + k + v).astype(jnp.bfloat16), w[3])
            return (h + 0.001 * o).astype(jnp.bfloat16), ()

        y, _ = jax.lax.scan(body, x, ws)
        return y

    gb_attn = 4 * L * E * E / 1e9
    rows.append(time_leg("attn_w8a8_4mm", attn_fn, x0, gb_attn,
                         (wq, wk, wv, wo)))
    del wq, wk, wv, wo

    # --- leg 2: attention cache math (bf16, S=1024) ---------------------
    kc = _bf16(next(ks), L, S, E)
    vc = _bf16(next(ks), L, S, E)

    def kv_fn(x, ws):
        def body(h, kv):
            k, v = kv
            lg = (k @ h.reshape(E, 1)).astype(jnp.float32)  # (S,1)
            p = jax.nn.softmax(lg, axis=0).astype(jnp.bfloat16)
            o = (p.reshape(1, S) @ v).astype(jnp.bfloat16)  # (1,E)
            return (h + 0.001 * o).astype(jnp.bfloat16), ()

        y, _ = jax.lax.scan(body, x, ws)
        return y

    gb_kv = 2 * L * S * E * 2 / 1e9
    rows.append(time_leg("kv_math_bf16", kv_fn, x0, gb_kv, (kc, vc)))
    del kc, vc

    # --- leg 3: Q8 predictor stacks through the flat quant matmul -------
    from sparkinfer_tpu.ops.quant_matmul import quant_matmul_flat

    q_up = _i8(next(ks), E, L * RP)  # IN-major packed (in, L*out)
    s_up = jnp.full((E // 32, L * RP), 1e-3, jnp.float32)
    q_dn = _i8(next(ks), RP, L * F)
    s_dn = jnp.full((RP // 32, L * F), 1e-3, jnp.float32)

    def pred_fn(x, ws):
        qu, su, qd, sd = ws

        def body(h, il):
            r = quant_matmul_flat(h, qu, su, il, kind="q8_0", out_dim=RP)
            d = quant_matmul_flat(r.astype(jnp.bfloat16), qd, sd, il,
                                  kind="q8_0", out_dim=F)
            return (h + 1e-6 * d[:, :E]).astype(jnp.bfloat16), ()

        y, _ = jax.lax.scan(body, x, jnp.arange(L, dtype=jnp.int32))
        return y

    gb_pred = (E * L * RP + RP * L * F) / 1e9
    rows.append(time_leg("pred_q8_flat", pred_fn, x0, gb_pred,
                         (q_up, s_up, q_dn, s_dn)))
    del q_up, s_up, q_dn, s_dn

    # --- leg 4: v6q fused hot-store FFN, C=16 of H=27 hot groups --------
    from sparkinfer_tpu.ops.sparse_ffn_pallas import sparse_ffn_block_v6q

    qupT = _i8(next(ks), L * H, E, G)
    supT = jnp.full((L * H, E // 32, G), 1e-3, jnp.float32)
    qgT = _i8(next(ks), L * H, E, G)
    sgT = jnp.full((L * H, E // 32, G), 1e-3, jnp.float32)
    qdn = _i8(next(ks), L * H, G, E)
    sdn = jnp.full((L * H, G // 32, E), 1e-3, jnp.float32)
    idx_all = jnp.asarray(
        np.stack([np.random.default_rng(i).choice(H, C, replace=False) + i * H
                  for i in range(L)]), jnp.int32)  # (L, C)
    sel = jnp.ones((1, C, G), jnp.float32)

    def ffn_fn(x, ws):
        qu, su, qg, sg, qd, sd, sel_w, idxs = ws

        def body(h, idx_l):
            o = sparse_ffn_block_v6q(
                h.astype(jnp.bfloat16), idx_l[None], sel_w,
                qu, su, qg, sg, qd, sd, act="fatrelu",
                mask_mode="threshold")
            return (h + 0.001 * o).astype(jnp.bfloat16), ()

        y, _ = jax.lax.scan(body, x, idxs)
        return y

    gb_ffn = 3 * L * C * G * E / 1e9
    rows.append(time_leg("ffn_v6q_c16", ffn_fn, x0, gb_ffn,
                         (qupT, supT, qgT, sgT, qdn, sdn, sel, idx_all)))
    del qupT, supT, qgT, sgT, qdn, sdn

    # --- leg 5: bf16 lm head --------------------------------------------
    head = _bf16(next(ks), 1, E, V)[0]

    def head_fn(x, w):
        lg = (x @ w).astype(jnp.float32)
        return (x + 1e-6 * lg[:, :E]).astype(jnp.bfloat16)

    gb_head = E * V * 2 / 1e9
    rows.append(time_leg("head_bf16", head_fn, x0, gb_head, head))

    total_ms = sum(r["ms"] for r in rows)
    total_gb = sum(r["gb"] for r in rows)
    print(json.dumps({
        "sum_of_legs_ms": round(total_ms, 2),
        "sum_gb": round(total_gb, 2),
        "full_step_ms_measured": 18.15,
        "overhead_ms": round(18.15 - total_ms, 2),
        "note": "legs are standalone scans; full step adds norms, rope, "
                "select/top-k, residual adds, and cross-leg scheduling",
    }, ), flush=True)


if __name__ == "__main__":
    main()
