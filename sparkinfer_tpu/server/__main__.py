"""python -m sparkinfer_tpu.server — llama-server analogue entry point."""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="sparkinfer-server")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("-np", "--n-slots", type=int, default=4)
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("-ctk", "--cache-type-k", choices=["f32", "bf16", "int8"],
                    default="bf16")
    ap.add_argument("--chat-template", default=None)
    ap.add_argument("--temp", type=float, default=0.8)
    ap.add_argument("--alias", default="sparkinfer-tpu")
    args = ap.parse_args(argv)

    from ..models.loader import load_model
    from ..runtime.sampling import SamplerConfig
    from .app import ServerConfig, SparkServer

    model = load_model(args.model)
    srv = SparkServer(
        model,
        ServerConfig(
            host=args.host,
            port=args.port,
            n_slots=args.n_slots,
            max_seq=args.ctx_size,
            model_name=args.alias,
            kv_dtype=args.cache_type_k,
            chat_template=args.chat_template,
        ),
        sampler=SamplerConfig(temp=args.temp),
    )
    print(f"listening on http://{args.host}:{args.port} "
          f"({args.n_slots} slots, ctx {args.ctx_size})")
    srv.serve(block=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
