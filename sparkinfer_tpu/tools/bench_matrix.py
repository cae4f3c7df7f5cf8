"""sparkinfer-bench — llama-bench analogue (ref: tools/llama-bench, 2,241
LoC): matrix sweep over prefill sizes (pp), generation lengths (tg) and
batch sizes, reporting tokens/s as markdown or JSON (the format the
reference's dgx-spark tables use).

Also covers batched-bench (B x PP x TG throughput table, ref:
tools/batched-bench) via --batch sizes > 1 using the Scheduler.
"""

from __future__ import annotations

import argparse
import json
import statistics
import time

import numpy as np


def bench_pp(model, n_tokens: int, n_rep: int, kv_dtype) -> float:
    """Prefill throughput t/s."""
    import jax
    import jax.numpy as jnp

    from ..models.transformer import make_forward
    from ..runtime.kv_cache import init_cache

    cfg = model.config
    fwd = jax.jit(make_forward(cfg), donate_argnums=(3,))
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (1, n_tokens)), jnp.int32)
    pos = jnp.arange(n_tokens, dtype=jnp.int32)[None]
    times = []
    for _ in range(n_rep + 1):
        cache = init_cache(cfg, 1, n_tokens, kv_dtype)
        t0 = time.perf_counter()
        logits, cache = fwd(model.params, toks, pos, cache)
        float(logits.reshape(-1)[0])  # host readback = reliable fence
        times.append(time.perf_counter() - t0)
    return n_tokens / statistics.median(times[1:])  # skip compile


def bench_tg(model, n_tokens: int, n_rep: int, kv_dtype, ctx: int = 1024,
             batch: int = 1, sparse=None) -> float:
    """Decode throughput t/s at a realistic cache depth. sparse: a
    SparseConfig to bench the pipelined sparse decode path instead."""
    import jax
    import jax.numpy as jnp

    from ..models.transformer import make_forward
    from ..runtime.kv_cache import init_cache

    cfg = model.config
    if sparse is not None:
        from ..sparse.ffn import make_pipelined_sparse_ffn, prepare_pipelined_params

        model.params = prepare_pipelined_params(model.params, cfg, sparse)
        ffn, ci = make_pipelined_sparse_ffn(cfg, sparse, mode="pallas")
        fwd = jax.jit(make_forward(cfg, ffn_fn=ffn, ffn_carry_init=ci),
                      donate_argnums=(3,))
    else:
        fwd = jax.jit(make_forward(cfg), donate_argnums=(3,))
    cache = init_cache(cfg, batch, ctx, kv_dtype)
    # seed cache with ctx/2 tokens
    T0 = min(ctx // 2, 512)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (batch, T0)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T0, dtype=jnp.int32)[None], (batch, T0))
    logits, cache = fwd(model.params, toks, pos, cache)
    float(logits.reshape(-1)[0])

    tok = jnp.zeros((batch, 1), jnp.int32)
    lg, cache = fwd(model.params, tok, jnp.full((batch, 1), T0, jnp.int32), cache)
    float(lg.reshape(-1)[0])
    rates = []
    for r in range(n_rep):
        t0 = time.perf_counter()
        for i in range(n_tokens):
            lg, cache = fwd(
                model.params, tok,
                jnp.full((batch, 1), T0 + 1 + r * n_tokens + i, jnp.int32), cache
            )
        float(lg.reshape(-1)[0])  # host readback fence
        rates.append(batch * n_tokens / (time.perf_counter() - t0))
    return statistics.median(rates)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="sparkinfer-bench")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-pp", type=str, default="512",
                    help="comma-separated prefill sizes (0 to skip)")
    ap.add_argument("-tg", type=str, default="32",
                    help="comma-separated generation lengths (0 to skip)")
    ap.add_argument("-b", "--batch", type=str, default="1",
                    help="comma-separated batch sizes for tg")
    ap.add_argument("-r", "--reps", type=int, default=3)
    ap.add_argument("-c", "--ctx", type=int, default=1024)
    ap.add_argument("-ctk", choices=["f32", "bf16", "q8"], default="bf16")
    ap.add_argument("--keep-quantized", action="store_true")
    ap.add_argument("--sparse", action="store_true",
                    help="bench the pipelined sparse decode (needs predictors)")
    ap.add_argument("--capacity-groups", type=int, default=0)
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("-o", "--output", choices=["md", "json"], default="md")
    ap.add_argument("--trace", metavar="DIR",
                    help="capture a jax.profiler (xprof/TensorBoard) trace "
                         "of the measured section into DIR")
    args = ap.parse_args(argv)

    import contextlib

    import jax.numpy as jnp

    from ..models.loader import load_model
    from ..utils.profiling import maybe_trace

    kv_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16, "q8": jnp.bfloat16}[args.ctk]
    model = load_model(args.model, keep_quantized=args.keep_quantized)
    cfg = model.config

    stack = contextlib.ExitStack()
    stack.enter_context(maybe_trace(args.trace))
    rows = []
    for pp in [int(x) for x in args.pp.split(",") if int(x) > 0]:
        tps = bench_pp(model, pp, args.reps, kv_dtype)
        rows.append({"test": f"pp{pp}", "t/s": round(tps, 2)})
    sparse = None
    if args.sparse:
        from ..sparse.config import SparseConfig

        gs = args.group_size
        while cfg.n_ff % gs:
            gs //= 2
        sparse = SparseConfig(group_size=gs,
                              capacity_groups=args.capacity_groups)
    for b in [int(x) for x in args.batch.split(",")]:
        for tg in [int(x) for x in args.tg.split(",") if int(x) > 0]:
            tps = bench_tg(model, tg, args.reps, kv_dtype, args.ctx, batch=b,
                           sparse=sparse)
            name = f"tg{tg}" if b == 1 else f"tg{tg}@b{b}"
            if sparse is not None:
                name += "-sparse"
            rows.append({"test": name, "t/s": round(tps, 2)})

    stack.close()  # flush the profiler trace before reporting
    meta = {"arch": cfg.arch, "n_layer": cfg.n_layer, "n_embd": cfg.n_embd,
            "n_ff": cfg.n_ff}
    if args.output == "json":
        print(json.dumps({"meta": meta, "results": rows}))
    else:
        print(f"| model | test | t/s |")
        print(f"|---|---|---|")
        for r in rows:
            print(f"| {cfg.arch} L{cfg.n_layer} E{cfg.n_embd} | {r['test']} | {r['t/s']} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
