"""sparkinfer-cli — the llama-cli analogue (ref: tools/main/main.cpp).

Flags mirror the reference's common/arg.cpp surface where it applies to
this framework, including the SparkInfer additions:
  -m/--model           GGUF path
  -p/--prompt, -f/--prompt-file
  -n/--n-predict
  --temp --top-k --top-p --min-p --repeat-penalty --seed
  -c/--ctx-size
  --spif-ms/--split    model-split GGUF (ref -spif-ms, arg.cpp:1926)
  -vb/--hbm-budget     hot-cache budget in GiB (ref -vb VRAM budget)
  --hot-groups         explicit per-layer hot group count (overrides -vb)
  --capacity-groups    top-k group capacity per token
  --group-size
  --cold-mode          host|drop
  -nps/--n-bench-prompts  batch-bench mode (ref tools/main/main.cpp:439,185)
  -ctk/--cache-type-k  f32|bf16|q8 KV cache type (ref arg.cpp:1665)
plus grammar (--grammar/--grammar-file/-j), adapters (--lora/
--control-vector), the full sampler chain, --kv-iswa, --moe-mode.
The flag table itself lives in sparkinfer_tpu/common/args.py (the
analogue of the reference's declarative common/arg.cpp table) with
SPARK_ARG_*/SPIF_* env mirrors resolved env-as-default, CLI-wins.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    """All flags come from the shared declarative table (ref: the
    reference declares every flag once in common/arg.cpp)."""
    from ..common.args import build_parser as table_parser

    return table_parser("cli", prog="sparkinfer-cli", description=__doc__)


def hbm_budget_to_hot_groups(budget_gib: float, cfg, group_size: int) -> int:
    """GiB budget -> per-layer hot group count (3 projections, bf16)."""
    bytes_per_group = 3 * group_size * cfg.n_embd * 2
    total_groups = int(budget_gib * (1 << 30) / bytes_per_group)
    return max(total_groups // cfg.n_layer, 1)


def make_engine(args, model):
    from ..common.args import kv_dtypes_from_args, sampler_from_args
    from ..runtime.engine import Engine
    from ..sparse.config import SparseConfig

    sampler = sampler_from_args(args)
    kv_dtype, kv_dtype_v, kv_quant = kv_dtypes_from_args(args)

    use_sparse = (args.sparse or model.config.has_predictors) and not args.dense
    sparse = None
    if use_sparse and model.config.has_predictors:
        hot = args.hot_groups
        if not hot and args.hbm_budget:
            hot = hbm_budget_to_hot_groups(args.hbm_budget, model.config, args.group_size)
        gs = args.group_size
        if model.config.n_ff % gs != 0:
            # fall back to the largest power-of-two divisor
            gs = 1 << (model.config.n_ff & -model.config.n_ff).bit_length() - 1
            while model.config.n_ff % gs:
                gs //= 2
        sparse = SparseConfig(
            group_size=gs,
            capacity_groups=args.capacity_groups,
            hot_groups=hot,
            reload_budget_mb=getattr(args, "reload_budget_mb", 0.0),
            swap_hysteresis=getattr(args, "swap_hysteresis", 0.05),
        )
    eng = Engine(
        model,
        max_seq=args.ctx_size,
        self_extend=(args.grp_attn_n, args.grp_attn_w)
        if args.grp_attn_n > 1 else None,
        sampler=sampler,
        kv_dtype=kv_dtype,
        kv_dtype_v=kv_dtype_v,
        kv_quantized=kv_quant,
        kv_iswa=getattr(args, "kv_iswa", False),
        sparse=sparse,
        sparse_cold_mode=args.cold_mode,
        split=args.split,
        rebalance_every=getattr(args, "rebalance_every", 1),
        moe_mode=getattr(args, "moe_mode", "dense"),
    )
    if getattr(args, "batch_size", 0):
        eng.prefill_chunk = args.batch_size  # -b: prefill ubatch length
    return eng


def apply_adapters(args, model) -> None:
    """Merge --lora/--lora-scaled and --control-vector* into the loaded
    params (ref: common_init_from_params applies adapters after load,
    common/common.cpp:1068-1085)."""
    from ..common.args import adapters_from_args, control_vectors_from_args

    loras = adapters_from_args(args)
    cvecs = control_vectors_from_args(args)
    if not loras and not cvecs:
        return
    from ..models.lora import (
        apply_control_vector,
        apply_lora,
        load_control_vector,
    )

    for path, scale in loras:
        model.params = apply_lora(model.params, model.config, path, scale)
    for path, scale in cvecs:
        cv = load_control_vector(path, model.config.n_layer,
                                 model.config.n_embd)
        model.params = apply_control_vector(model.params, model.config, cv,
                                            scale)


def grammar_main(args, model, gbnf: str) -> int:
    """Grammar-constrained generation rides the Scheduler's on-device
    logit-masking path (a 1-slot continuous-batching scheduler — the same
    machinery the server uses; ref: grammar-first sampling in
    common/sampling.cpp:104)."""
    from ..common.args import sampler_from_args
    from ..runtime.scheduler import Request, Scheduler
    from ..tokenizer import build_tokenizer

    if model.vocab is None:
        print("--grammar needs a model with a tokenizer", file=sys.stderr)
        return 1
    tk = build_tokenizer(model.vocab)
    prompt = args.prompt
    if prompt is None and args.prompt_file:
        prompt = open(args.prompt_file).read()
    if prompt is None:
        print("need -p/--prompt or -f/--prompt-file", file=sys.stderr)
        return 1
    sched = Scheduler(model, n_slots=1, max_seq=args.ctx_size,
                      sampler=sampler_from_args(args), tokenizer=tk)
    req = sched.submit(Request(
        prompt_tokens=tk.encode(prompt, add_special=True),
        max_new_tokens=args.n_predict,
        grammar=gbnf,
        seed=args.seed,
    ))
    sys.stdout.write(prompt)
    sched.start()
    try:
        from ..server.app import _Utf8Stream

        us = _Utf8Stream(tk)
        for tok in req.stream():
            sys.stdout.write(us.push([tok]))
            sys.stdout.flush()
        sys.stdout.write(us.flush() + "\n")
    finally:
        sched.stop()
    return 0


def bench_main(args, model) -> int:
    """Batch-bench mode (ref: tools/main/main.cpp:185 bench_main): N prompts
    from --prompt-file (one per line), per-prompt prefill/decode t/s."""
    from ..tokenizer import build_tokenizer

    if not args.prompt_file:
        print("bench mode needs --prompt-file", file=sys.stderr)
        return 1
    with open(args.prompt_file) as f:
        prompts = [l.rstrip("\n") for l in f if l.strip()][: args.n_bench_prompts]
    tk = build_tokenizer(model.vocab)
    eng = make_engine(args, model)
    rows = []
    for i, p in enumerate(prompts):
        ids = tk.encode(p, add_special=True)
        eng.perf.__init__()
        out = eng.generate(ids, max_new_tokens=args.n_predict)
        s = eng.perf.summary()
        s["prompt"] = i
        rows.append(s)
        if not args.json:
            print(
                f"prompt {i}: prefill {s['prefill_tokens']} tok "
                f"@ {s['prefill_tps']} t/s | decode {s['decode_tokens']} tok "
                f"@ {s['decode_tps']} t/s"
            )
    if args.json:
        print(json.dumps(rows))
    return 0


def chat_main(args, model) -> int:
    """Interactive chat REPL (ref: tools/main interactive + tools/run)."""
    from ..server.app import _template_for
    from ..server.chat import apply_template
    from ..tokenizer import build_tokenizer

    if model.vocab is None:
        print("interactive mode needs a tokenizer", file=sys.stderr)
        return 1
    tk = build_tokenizer(model.vocab)
    template = _template_for(model.vocab, args.chat_template)
    eng = make_engine(args, model)
    stop = {i for i in range(model.vocab.n_tokens) if model.vocab.is_eog(i)}
    history = []
    print(f"(interactive; template={template.name}; /bye to exit)",
          file=sys.stderr)
    while True:
        try:
            line = input("> ")
        except (EOFError, KeyboardInterrupt):
            break
        if line.strip() in ("/bye", "/exit", "/quit"):
            break
        if not line.strip():
            continue
        history.append({"role": "user", "content": line})
        prompt = apply_template(history, template)
        ids = tk.encode(prompt, add_special=True)
        out = []
        for tok in eng.generate(ids, max_new_tokens=args.n_predict,
                                stop_ids=stop, stream=True):
            piece = tk.decode([tok])
            sys.stdout.write(piece)
            sys.stdout.flush()
            out.append(tok)
        sys.stdout.write("\n")
        history.append({"role": "assistant", "content": tk.decode(out)})
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from ..models.loader import load_model

    if args.model is None and args.hf_repo:
        from .hf import resolve_hf_gguf

        try:
            args.model = resolve_hf_gguf(args.hf_repo)
        except FileNotFoundError as e:
            print(str(e), file=sys.stderr)
            return 1
        if args.verbose:
            print(f"-hf resolved to {args.model}", file=sys.stderr)
    if args.model is None:
        print("need -m/--model or -hf/--hf-repo", file=sys.stderr)
        return 1

    t0 = time.time()
    model = load_model(args.model,
                       attn_w8a8=getattr(args, "attn_w8a8", False))
    from ..common.args import apply_model_overrides

    apply_model_overrides(args, model)  # --rope-*/--yarn-*/-t
    if args.verbose:
        print(f"loaded {args.model} ({model.config.arch}) in {time.time()-t0:.1f}s",
              file=sys.stderr)
    apply_adapters(args, model)

    from ..common.args import grammar_from_args

    gbnf = grammar_from_args(args)
    if gbnf is not None:
        return grammar_main(args, model, gbnf)

    if args.n_bench_prompts > 0:
        return bench_main(args, model)
    if args.interactive:
        return chat_main(args, model)

    prompt = args.prompt
    if prompt is None and args.prompt_file:
        prompt = open(args.prompt_file).read()
    if prompt is None:
        print("need -p/--prompt or -f/--prompt-file", file=sys.stderr)
        return 1

    if model.config.traits.enc_dec:
        # t5-family: encode the prompt, decode from decoder_start_token
        # (the analogue of llama_encode + decoder seeding in tools/main)
        from ..runtime.sampling import SamplerConfig
        from ..runtime.seq2seq import Seq2SeqEngine

        s2s = Seq2SeqEngine(model, max_seq=args.ctx_size,
                            sampler=SamplerConfig(
                                temp=args.temp, top_k=args.top_k,
                                top_p=args.top_p, min_p=args.min_p,
                                seed=args.seed))
        if model.vocab is not None:
            from ..tokenizer import build_tokenizer

            tk = build_tokenizer(model.vocab)
            ids = tk.encode(prompt, add_special=True)
            eos = model.vocab.eos_id if model.vocab.eos_id is not None else 1
            out = s2s.generate(ids, max_new_tokens=args.n_predict,
                               eos_id=eos, seed=args.seed)
            print(tk.decode(out))
        else:
            ids = [int(x) for x in prompt.split()]
            out = s2s.generate(ids, max_new_tokens=args.n_predict,
                               seed=args.seed)
            print(" ".join(map(str, out)))
        return 0

    eng = make_engine(args, model)
    drafter = None
    if args.draft_mode != "none":
        if args.temp > 0:
            print("--draft-mode requires --temp 0 (greedy)", file=sys.stderr)
            return 1
        if args.draft_mode == "lookup":
            from ..runtime.lookup import LookupEngine

            drafter = LookupEngine(eng, n_draft=args.draft)
        else:
            from ..runtime.lookahead import LookaheadEngine

            drafter = LookaheadEngine(eng, n_draft=args.draft)
    if model.vocab is not None:
        from ..tokenizer import build_tokenizer

        tk = build_tokenizer(model.vocab)
        ids = tk.encode(prompt, add_special=True)
        stop = set()
        if model.vocab.eos_id is not None and model.vocab.eos_id >= 0 \
                and not getattr(args, "ignore_eos", False):
            stop.add(model.vocab.eos_id)
        sys.stdout.write(prompt)
        sys.stdout.flush()
        if drafter is not None:
            for tok in drafter.generate(ids, max_new_tokens=args.n_predict,
                                        stop_ids=stop):
                sys.stdout.write(tk.decode([tok]))
            sys.stdout.flush()
        else:
            for tok in eng.generate(ids, max_new_tokens=args.n_predict,
                                    stop_ids=stop, stream=True,
                                    n_keep=getattr(args, "keep", -1)):
                sys.stdout.write(tk.decode([tok]))
                sys.stdout.flush()
        sys.stdout.write("\n")
    else:
        ids = [int(x) for x in prompt.split()]
        if drafter is not None:
            out = drafter.generate(ids, max_new_tokens=args.n_predict)
        else:
            out = eng.generate(ids, max_new_tokens=args.n_predict)
        print(" ".join(map(str, out)))
    if drafter is not None and args.verbose:
        st = drafter.stats
        print(json.dumps({"draft_mode": args.draft_mode,
                          "rounds": st.n_rounds, "drafted": st.n_drafted,
                          "accepted": st.n_accepted,
                          "accept_rate": round(st.accept_rate, 3)}),
              file=sys.stderr)
    if args.verbose:
        print(json.dumps(eng.perf.summary()), file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
