#!/usr/bin/env python
"""Round-2 probe #9: FULL fused-decode step ablation at 1B shapes.

Attribution targets (per-step ms inside a CHUNK-step lax.scan):
  dense            : the baseline to beat
  sparse-nofnn     : attention + predictor + select, FFN zeroed -> glue floor
  sparse v6 cap=12 : production candidate
  sparse v6 cap=4  : fixed-vs-stream split (same call count, 1/3 bytes)
  sparse v6 G=256  : half the grid steps, same bytes (cap 6)
  sparse v6 G=512  : quarter grid steps (cap 3)
  sparse v6q cap=12: q8_0 packed (half bytes)

Run: timeout 3000 python eval_scripts/probe_kernels9.py [preset]
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

CHUNK = 32

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from bench import build_model, make_fused_loop  # noqa: E402

from sparkinfer_tpu.models.transformer import make_forward  # noqa: E402
from sparkinfer_tpu.runtime.kv_cache import init_cache  # noqa: E402
from sparkinfer_tpu.sparse import SparseConfig  # noqa: E402
from sparkinfer_tpu.sparse.ffn import (  # noqa: E402
    make_pipelined_sparse_ffn,
    prepare_pipelined_params,
)


def drain(a):
    return float(np.asarray(a).reshape(-1)[0])


def run_path(name, fwd, params, cfg, S=512, n=4):
    loop = make_fused_loop(fwd)
    cache = init_cache(cfg, 1, S, jnp.bfloat16)
    tok = jnp.zeros((1, 1), jnp.int32)
    pos = jnp.full((1, 1), 0, jnp.int32)
    t0 = time.perf_counter()
    tok, pos, cache = loop(params, tok, pos, cache)
    drain(tok)
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        tok, pos, cache = loop(params, tok, pos, cache)
        drain(tok)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/CHUNK*1e3:.3f} ms/step "
          f"({CHUNK/best:.1f} t/s)", flush=True)
    del cache
    return best / CHUNK


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    preset = sys.argv[1] if len(sys.argv) > 1 else "1b"
    cfg, params = build_model(preset)

    dense_fwd = make_forward(cfg)
    run_path("dense", dense_fwd, params, cfg)

    def sparse_path(gs, cap, quant=None, tag=""):
        scfg = SparseConfig(group_size=gs, capacity_groups=cap)
        sp = prepare_pipelined_params(params, cfg, scfg, drop_dense=False,
                                      layout="v6", quant=quant)
        ffn, ci = make_pipelined_sparse_ffn(cfg, scfg, mode="pallas")
        fwd = make_forward(cfg, ffn_fn=ffn, ffn_carry_init=ci)
        r = run_path(f"sparse{tag} G={gs} cap={cap} q={quant or '-'}",
                     fwd, sp, cfg)
        del sp
        return r

    # glue floor: pipelined structure, FFN compute skipped (returns zeros)
    scfg = SparseConfig(group_size=128, capacity_groups=12)
    sp = prepare_pipelined_params(params, cfg, scfg, drop_dense=False,
                                  layout="v6")
    ffn_full, ci = make_pipelined_sparse_ffn(cfg, scfg, mode="pallas")

    def ffn_nofnn(lp, x, carry, il):
        out, nxt = ffn_full(lp, x, carry, il)
        return jnp.zeros_like(x) + out * 0.0, nxt

    # cheaper honest floor: run everything except the pallas kernel
    ffn_g, cig = make_pipelined_sparse_ffn(cfg, scfg, mode="gather")

    def ffn_floor(lp, x, carry, il):
        # selection glue only: reuse the pipelined ffn but replace compute
        # with a zero — we emulate by calling _select path via gather ffn
        # on a 1-group capacity... simplest: full pipelined with kernel out
        # multiplied by 0 would still RUN the kernel; instead do selection
        # by hand here.
        from sparkinfer_tpu.sparse.ffn import select_groups

        B, T, E = x.shape
        xt = x.reshape(B * T, E)
        xf = xt.astype(jnp.float32)
        h = jnp.maximum(xf @ lp["pred_up_nx"].astype(jnp.float32)
                        + lp["pred_up_b_nx"], 0.0)
        probs = jax.nn.sigmoid(h @ lp["pred_down_nx"].astype(jnp.float32)
                               + lp["pred_down_b_nx"])
        idx = select_groups(probs, scfg, cfg.n_ff)
        gp = probs.reshape(-1, scfg.n_groups(cfg.n_ff), 128)
        gp_sel = jnp.take_along_axis(gp, idx[..., None], axis=1)
        out = x * 0.0 + (gp_sel.sum() * 1e-9).astype(x.dtype)
        return out.astype(x.dtype), {"idx": idx, "gp_sel": gp_sel}

    fwd_floor = make_forward(cfg, ffn_fn=ffn_floor, ffn_carry_init=ci)
    run_path("sparse-floor (no FFN weights)", fwd_floor, sp, cfg)
    del sp

    sparse_path(128, 12)
    sparse_path(128, 4)
    sparse_path(256, 6)
    sparse_path(128, 12, quant="q8_0", tag="-q8")
    sparse_path(512, 3)  # last: largest VMEM blocks, may not fit


if __name__ == "__main__":
    main()
