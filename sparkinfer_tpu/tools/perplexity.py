"""Perplexity evaluator — the quality-Δ harness (ref: tools/perplexity,
2,070 LoC: chunked teacher-forced NLL over a text corpus).

PPL = exp(mean over tokens of -log p(token | context)), computed over
windows of ctx tokens with the first `skip` tokens of each window excluded
(the reference skips the first half by default to give each scored token
enough context).

Used to gate the sparse path: PPL(sparse) - PPL(dense) is the quality
cost of prediction errors + capacity truncation.
"""

from __future__ import annotations

import argparse
import json
import math
import sys

import numpy as np


def compute_ppl(
    model,
    token_ids: np.ndarray,
    ctx: int = 512,
    skip: int | None = None,
    ffn_fn=None,
    stride: int | None = None,
    progress=None,
) -> dict:
    import jax
    import jax.numpy as jnp

    from ..models.transformer import make_forward
    from ..runtime.kv_cache import init_cache

    cfg = model.config
    fwd = jax.jit(make_forward(cfg, ffn_fn=ffn_fn))
    skip = ctx // 2 if skip is None else skip
    stride = stride or ctx

    n = len(token_ids)
    nll = 0.0
    count = 0
    pos = jnp.arange(ctx, dtype=jnp.int32)[None]
    for start in range(0, n - ctx, stride):
        window = token_ids[start : start + ctx]
        cache = init_cache(cfg, 1, ctx, jnp.bfloat16)
        logits, _ = fwd(model.params, jnp.asarray(window, jnp.int32)[None], pos, cache)
        logp = jax.nn.log_softmax(logits[0], axis=-1)  # (ctx, V)
        targets = jnp.asarray(window[1:], jnp.int32)
        tok_logp = np.asarray(
            jnp.take_along_axis(logp[:-1], targets[:, None], axis=1)[:, 0]
        )
        sel = tok_logp[skip:]
        nll += float(-sel.sum())
        count += len(sel)
        if progress:
            progress(start + ctx, n, math.exp(nll / max(count, 1)))
    ppl = math.exp(nll / max(count, 1))
    return {"ppl": ppl, "nll_per_token": nll / max(count, 1), "n_tokens": count}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="sparkinfer-perplexity")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="text corpus")
    ap.add_argument("-c", "--ctx-size", type=int, default=512)
    ap.add_argument("--sparse", action="store_true")
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--capacity-groups", type=int, default=0)
    args = ap.parse_args(argv)

    from ..models.loader import load_model
    from ..tokenizer import build_tokenizer

    model = load_model(args.model)
    tk = build_tokenizer(model.vocab)
    text = open(args.file).read()
    ids = np.asarray(tk.encode(text, add_special=True), np.int32)
    print(f"{len(ids)} tokens", file=sys.stderr)

    ffn_fn = None
    if args.sparse and model.config.has_predictors:
        from ..sparse.config import SparseConfig
        from ..sparse.ffn import make_sparse_ffn, prepare_sparse_params

        scfg = SparseConfig(group_size=args.group_size,
                            capacity_groups=args.capacity_groups)
        model.params = prepare_sparse_params(model.params, model.config, scfg)
        ffn_fn = make_sparse_ffn(model.config, scfg, mode="dense")

    def progress(done, total, ppl):
        print(f"[{done}/{total}] ppl={ppl:.4f}", file=sys.stderr)

    out = compute_ppl(model, ids, ctx=args.ctx_size, ffn_fn=ffn_fn, progress=progress)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
