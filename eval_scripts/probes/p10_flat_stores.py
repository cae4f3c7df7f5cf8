#!/usr/bin/env python
"""Round-2 probe #10: flat loop-invariant sparse stores (the dynamic-slice
copy fix) — full fused-step timings vs dense in ONE session.

Hypothesis under test: probe9 showed the sparse FFN cost (~4.6 ms/step) is
independent of capacity AND group size but proportional to STORE dtype
size — i.e. XLA materializes a per-layer copy of the whole weight store to
feed the Pallas custom call (scan xs dynamic-slice can't fuse into a
custom call). Flat (L*ng, ...) stores passed loop-invariant + il*ng+idx
block indexing remove the copy.

Run: timeout 4500 python eval_scripts/probe_kernels10.py [preset]
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
    d = run_path("dense", dense_fwd, params, cfg)

    def sparse_path(gs, cap, quant=None, tag=""):
        scfg = SparseConfig(group_size=gs, capacity_groups=cap)
        sp = prepare_pipelined_params(params, cfg, scfg, drop_dense=False,
                                      layout="v6", quant=quant)
        ffn, ci = make_pipelined_sparse_ffn(cfg, scfg, mode="pallas")
        fwd = make_forward(cfg, ffn_fn=ffn, ffn_carry_init=ci)
        r = run_path(f"sparse-flat{tag} G={gs} cap={cap} q={quant or '-'}",
                     fwd, sp, cfg)
        print(f"  -> ratio vs dense: {d/r:.3f}", flush=True)
        del sp
        return r

    sparse_path(128, 12)
    sparse_path(128, 4)
    sparse_path(128, 12, quant="q8_0", tag="-q8")
    sparse_path(256, 6)


if __name__ == "__main__":
    main()
