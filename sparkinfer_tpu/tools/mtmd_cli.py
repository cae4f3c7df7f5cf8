"""Multimodal CLI — the analogue of tools/mtmd/mtmd-cli.cpp:

    python -m sparkinfer_tpu.tools.mtmd_cli -m model.gguf \\
        --mmproj mmproj.gguf --image photo.png \\
        -p "describe <__image__> briefly" -n 64

Each `<__image__>` marker in the prompt is replaced by one image's
projected patch embeddings (mtmd.cpp mtmd_default_marker). With no
marker, the image is prepended (mtmd-cli behavior).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="sparkinfer-mtmd-cli", description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--mmproj", required=True)
    ap.add_argument("--image", action="append", default=[],
                    help="image file (repeatable, one per marker)")
    ap.add_argument("-p", "--prompt", required=True)
    ap.add_argument("-n", "--n-predict", type=int, default=64)
    ap.add_argument("--max-seq", type=int, default=2048)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from PIL import Image

    from ..models.loader import load_model
    from ..mtmd import MtmdPipeline
    from ..mtmd.pipeline import MARKER

    model = load_model(args.model, dtype=jnp.bfloat16)
    pipe = MtmdPipeline(model, args.mmproj, max_seq=args.max_seq,
                        dtype=jnp.bfloat16)

    prompt = args.prompt
    if MARKER not in prompt and args.image:
        prompt = MARKER * len(args.image) + " " + prompt
    images = [Image.open(f) for f in args.image]

    eos = None
    if model.vocab is not None and getattr(model.vocab, "eos_id", None) is not None:
        eos = model.vocab.eos_id
    toks = pipe.generate(prompt, images, max_new_tokens=args.n_predict,
                         eos_id=eos)
    if model.vocab is not None and hasattr(model.vocab, "decode"):
        print(model.vocab.decode(toks))
    else:
        print(" ".join(map(str, toks)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
