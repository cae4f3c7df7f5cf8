"""python -m sparkinfer_tpu.server — llama-server analogue entry point.

Flags come from the shared declarative table (sparkinfer_tpu/common/args.py,
the analogue of the reference's common/arg.cpp); the server scope adds
--host/--port/-np/--alias/--api-key/--models plus the full sampler-default
and SparkInfer sparse surfaces.
"""

from __future__ import annotations


def main(argv=None) -> int:
    from ..common.args import (
        adapters_from_args,
        build_parser,
        kv_dtypes_from_args,
        sampler_from_args,
    )

    ap = build_parser("server", prog="sparkinfer-server", description=__doc__)
    args = ap.parse_args(argv)
    kv_dtypes_from_args(args)  # validates the -ctk/-ctv combination
    if args.model is None and args.hf_repo:
        from ..tools.hf import resolve_hf_gguf

        args.model = resolve_hf_gguf(args.hf_repo)
    if args.model is None:
        ap.error("need -m/--model or -hf/--hf-repo")

    from ..models.loader import load_model
    from .app import ServerConfig, SparkServer

    model = load_model(args.model,
                       attn_w8a8=getattr(args, "attn_w8a8", False))
    from ..common.args import apply_model_overrides

    apply_model_overrides(args, model)  # --rope-*/--yarn-*/-t

    sparse = None
    if (args.sparse or model.config.has_predictors) and not args.dense \
            and model.config.has_predictors:
        from ..sparse.config import SparseConfig
        from ..tools.cli import hbm_budget_to_hot_groups

        hot = args.hot_groups
        if not hot and args.hbm_budget:
            hot = hbm_budget_to_hot_groups(args.hbm_budget, model.config,
                                           args.group_size)
        sparse = SparseConfig(group_size=args.group_size,
                              capacity_groups=args.capacity_groups,
                              hot_groups=hot,
                              reload_budget_mb=getattr(
                                  args, "reload_budget_mb", 0.0),
                              swap_hysteresis=getattr(
                                  args, "swap_hysteresis", 0.05))

    extra_models = None
    if args.models:
        extra_models = {}
        for spec in args.models:
            name, _, path = spec.partition("=")
            if not path:
                ap.error(f"--models expects NAME=GGUF, got {spec!r}")
            extra_models[name] = path

    srv = SparkServer(
        model,
        ServerConfig(
            host=args.host,
            port=args.port,
            n_slots=args.n_slots,
            max_seq=args.ctx_size,
            model_name=args.alias,
            kv_dtype={"q8": "int8"}.get(args.cache_type_k, args.cache_type_k),
            kv_dtype_v=({"q8": "int8"}.get(args.cache_type_v,
                                           args.cache_type_v)
                        if args.cache_type_v else None),
            chat_template=args.chat_template,
            timeout=args.timeout,
            n_predict_default=args.n_predict_default,
            slot_prompt_similarity=args.slot_prompt_similarity,
            slot_save_path=args.slot_save_path,
            api_key=args.api_key,
            lora=adapters_from_args(args) or None,
            extra_models=extra_models,
            sparse=sparse,
            sparse_cold_mode=args.cold_mode,
            prefill_mode=getattr(args, "prefill_mode", "rows"),
            split=args.split,
            rebalance_every=args.rebalance_every,
        ),
        sampler=sampler_from_args(args),
    )
    print(f"listening on http://{args.host}:{args.port} "
          f"({args.n_slots} slots, ctx {args.ctx_size})")
    srv.serve(block=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
