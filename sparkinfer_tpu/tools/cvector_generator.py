"""sparkinfer-cvector-generator (ref: tools/cvector-generator): build a
control vector from positive/negative prompt pairs — per-layer mean hidden
state difference (or top principal component of the differences)."""

from __future__ import annotations

import argparse
import json

import numpy as np


def generate_cvector(model, pos_prompts, neg_prompts, tokenizer, method="mean",
                     max_seq: int = 128) -> np.ndarray:
    """Returns (L, E) control vectors from per-layer hidden diffs."""
    import jax
    import jax.numpy as jnp

    from ..models.transformer import make_forward
    from ..runtime.kv_cache import init_cache

    cfg = model.config
    L, E = cfg.n_layer, cfg.n_embd

    # capture per-layer FFN inputs as hidden proxies via stateful ffn
    from ..models.transformer import dense_ffn

    base_ffn = dense_ffn(cfg)

    def capture(lp, x, fs, il):
        xt = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        return base_ffn(lp, x), {
            "sum": fs["sum"] + xt.sum(0),
            "n": fs["n"] + float(xt.shape[0]),
        }

    fwd = jax.jit(make_forward(cfg, ffn_fn=capture, stateful_ffn=True))

    def mean_hidden(prompts):
        fstate = {"sum": jnp.zeros((L, E), jnp.float32),
                  "n": jnp.zeros((L, 1), jnp.float32)}
        for p in prompts:
            ids = tokenizer.encode(p, add_special=True)[:max_seq]
            T = len(ids)
            cache = init_cache(cfg, 1, max(T, 8), jnp.float32)
            pos = jnp.arange(T, dtype=jnp.int32)[None]
            _, _, fstate = fwd(model.params, jnp.asarray(ids, jnp.int32)[None],
                               pos, cache, fstate)
        return np.asarray(fstate["sum"]) / np.maximum(np.asarray(fstate["n"]), 1)

    diff = mean_hidden(pos_prompts) - mean_hidden(neg_prompts)  # (L, E)
    if method == "mean":
        return diff
    raise ValueError(method)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="sparkinfer-cvector-generator")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--positive-file", required=True)
    ap.add_argument("--negative-file", required=True)
    ap.add_argument("-o", "--outfile", default="cvector.gguf")
    args = ap.parse_args(argv)

    from ..gguf.constants import GGMLType
    from ..gguf.writer import GGUFWriter
    from ..models.loader import load_model
    from ..tokenizer import build_tokenizer

    model = load_model(args.model)
    tk = build_tokenizer(model.vocab)
    pos = [l.strip() for l in open(args.positive_file) if l.strip()]
    neg = [l.strip() for l in open(args.negative_file) if l.strip()]
    cv = generate_cvector(model, pos, neg, tk)
    w = GGUFWriter(args.outfile, model.config.arch)
    w.add_kv("general.type", "control_vector")
    for l in range(cv.shape[0]):
        w.add_tensor(f"direction.{l}", cv[l].astype(np.float32), GGMLType.F32)
    w.write()
    print(json.dumps({"layers": int(cv.shape[0]), "outfile": args.outfile}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
