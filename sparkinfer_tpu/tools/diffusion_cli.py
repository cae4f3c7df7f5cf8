"""Diffusion text-generation CLI — analogue of examples/diffusion
(llama-diffusion-cli): flags mirror diffusion-cli.cpp (--diffusion-steps,
--diffusion-algorithm 0-4, --diffusion-eps | --diffusion-block-length,
--diffusion-visual)."""

from __future__ import annotations

import argparse
import sys

_ALG = {0: "origin", 1: "entropy", 2: "margin", 3: "random", 4: "confidence"}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="sparkinfer-diffusion-cli")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", required=True)
    ap.add_argument("-n", "--n-predict", type=int, default=64)
    ap.add_argument("--diffusion-steps", type=int, default=64)
    ap.add_argument("--diffusion-algorithm", type=int, default=4,
                    choices=sorted(_ALG))
    ap.add_argument("--diffusion-eps", type=float, default=None,
                    help="timestep schedule epsilon")
    ap.add_argument("--diffusion-block-length", type=int, default=None,
                    help="LLaDA block schedule (mutually exclusive with eps)")
    ap.add_argument("--diffusion-visual", action="store_true")
    ap.add_argument("--mask-token-id", type=int, default=None)
    ap.add_argument("--temp", type=float, default=0.0)
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("-s", "--seed", type=int, default=42)
    args = ap.parse_args(argv)

    if args.diffusion_eps is not None and args.diffusion_block_length is not None:
        print("choose ONE of --diffusion-eps / --diffusion-block-length",
              file=sys.stderr)
        return 1

    from ..models.loader import load_model
    from ..runtime.diffusion import DiffusionConfig, DiffusionEngine

    model = load_model(args.model)
    dcfg = DiffusionConfig(
        steps=args.diffusion_steps,
        algorithm=_ALG[args.diffusion_algorithm],
        schedule="block" if args.diffusion_block_length else "timestep",
        eps=args.diffusion_eps if args.diffusion_eps is not None else 1e-3,
        block_length=args.diffusion_block_length or 32,
        temp=args.temp, top_k=args.top_k, seed=args.seed,
        mask_token_id=args.mask_token_id,
    )
    eng = DiffusionEngine(model, dcfg)

    tk = None
    if model.vocab is not None:
        from ..tokenizer import build_tokenizer

        tk = build_tokenizer(model.vocab)
        ids = tk.encode(args.prompt, add_special=True)
    else:
        ids = [int(x) for x in args.prompt.split()]

    def visual(toks):
        if not args.diffusion_visual:
            return
        s = " ".join("_" if t == eng.mask_id else str(int(t)) for t in toks)
        print(f"\r{s[:160]}", end="", file=sys.stderr)

    out = eng.generate(ids, max_new_tokens=args.n_predict, on_step=visual)
    if args.diffusion_visual:
        print(file=sys.stderr)
    if tk is not None:
        print(tk.decode(out))
    else:
        print(" ".join(map(str, out)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
