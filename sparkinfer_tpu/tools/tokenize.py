"""sparkinfer-tokenize (ref: tools/tokenize): tokenize stdin/args with a
model's vocab, print ids and pieces."""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="sparkinfer-tokenize")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default=None)
    ap.add_argument("-f", "--file", default=None)
    ap.add_argument("--ids", action="store_true", help="ids only")
    ap.add_argument("--no-bos", action="store_true")
    args = ap.parse_args(argv)

    from ..models.loader import load_model
    from ..tokenizer import build_tokenizer

    model = load_model(args.model)
    if model.vocab is None:
        print("model has no vocab", file=sys.stderr)
        return 1
    tk = build_tokenizer(model.vocab)
    text = args.prompt if args.prompt is not None else (
        open(args.file).read() if args.file else sys.stdin.read()
    )
    ids = tk.encode(text, add_special=not args.no_bos)
    if args.ids:
        print(json.dumps(ids))
    else:
        for i in ids:
            print(f"{i:>8} -> {model.vocab.tokens[i]!r}")
        print(f"total: {len(ids)} tokens", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
