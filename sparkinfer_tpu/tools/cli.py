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
Env mirrors (ref .set_env pattern): SPIF_MS, SPIF_VB.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="sparkinfer-cli", description=__doc__)
    ap.add_argument("-m", "--model", default=None)
    ap.add_argument("-hf", "--hf-repo", default=None,
                    help="resolve model from the LOCAL HF hub cache: "
                    "user/repo[:quant] (offline; ref common/arg.cpp -hf)")
    ap.add_argument("-p", "--prompt", default=None)
    ap.add_argument("-f", "--prompt-file", default=None)
    ap.add_argument("-n", "--n-predict", type=int, default=64)
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("--temp", type=float, default=0.8)
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--top-p", type=float, default=0.95)
    ap.add_argument("--min-p", type=float, default=0.05)
    ap.add_argument("--repeat-penalty", type=float, default=1.0)
    ap.add_argument("-s", "--seed", type=int, default=42)
    ap.add_argument("--spif-ms", "--split", dest="split",
                    default=os.environ.get("SPIF_MS"))
    ap.add_argument("-vb", "--hbm-budget", type=float,
                    default=float(os.environ.get("SPIF_VB", 0)) or None,
                    help="hot-cache HBM budget in GiB")
    ap.add_argument("--hot-groups", type=int, default=0)
    ap.add_argument("--capacity-groups", type=int, default=0)
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--cold-mode", choices=["host", "drop"], default="host")
    ap.add_argument("--sparse", action="store_true",
                    help="force sparse FFN path (auto when predictors present)")
    ap.add_argument("--dense", action="store_true", help="force dense FFN path")
    ap.add_argument("-ctk", "--cache-type-k", choices=["f32", "bf16", "q8"],
                    default="bf16")
    ap.add_argument("-nps", "--n-bench-prompts", type=int, default=0,
                    help="bench mode: run N prompts from --prompt-file, report t/s")
    ap.add_argument("-i", "--interactive", action="store_true",
                    help="chat REPL (ref: llama-cli interactive mode)")
    ap.add_argument("--chat-template", default=None)
    ap.add_argument("--draft-mode", choices=["none", "lookup", "lookahead"],
                    default="none", help="draft-free speculative decoding "
                    "(greedy only; ref examples/lookup, examples/lookahead)")
    ap.add_argument("--draft", type=int, default=5,
                    help="draft length for --draft-mode")
    ap.add_argument("--json", action="store_true", help="bench output as JSON")
    ap.add_argument("-gan", "--grp-attn-n", type=int, default=1,
                    help="self-extend group size (ref main.cpp grp_attn_n)")
    ap.add_argument("-gaw", "--grp-attn-w", type=int, default=512,
                    help="self-extend window (multiple of -gan)")
    ap.add_argument("--verbose", action="store_true")
    return ap


def hbm_budget_to_hot_groups(budget_gib: float, cfg, group_size: int) -> int:
    """GiB budget -> per-layer hot group count (3 projections, bf16)."""
    bytes_per_group = 3 * group_size * cfg.n_embd * 2
    total_groups = int(budget_gib * (1 << 30) / bytes_per_group)
    return max(total_groups // cfg.n_layer, 1)


def make_engine(args, model):
    import jax.numpy as jnp

    from ..runtime.engine import Engine
    from ..runtime.sampling import SamplerConfig
    from ..sparse.config import SparseConfig

    sampler = SamplerConfig(
        temp=args.temp,
        top_k=args.top_k,
        top_p=args.top_p,
        min_p=args.min_p,
        penalty_repeat=args.repeat_penalty,
        seed=args.seed,
    )
    kv_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}.get(args.cache_type_k, jnp.bfloat16)
    kv_quant = args.cache_type_k == "q8"

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
        )
    return Engine(
        model,
        max_seq=args.ctx_size,
        self_extend=(args.grp_attn_n, args.grp_attn_w)
        if args.grp_attn_n > 1 else None,
        sampler=sampler,
        kv_dtype=kv_dtype,
        kv_quantized=kv_quant,
        sparse=sparse,
        sparse_cold_mode=args.cold_mode,
        split=args.split,
    )


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
    from ..server.chat import apply_template, detect_template
    from ..tokenizer import build_tokenizer

    if model.vocab is None:
        print("interactive mode needs a tokenizer", file=sys.stderr)
        return 1
    tk = build_tokenizer(model.vocab)
    template = args.chat_template or detect_template(model.vocab.chat_template)
    eng = make_engine(args, model)
    stop = {i for i in range(model.vocab.n_tokens) if model.vocab.is_eog(i)}
    history = []
    print(f"(interactive; template={template}; /bye to exit)", file=sys.stderr)
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
    model = load_model(args.model)
    if args.verbose:
        print(f"loaded {args.model} ({model.config.arch}) in {time.time()-t0:.1f}s",
              file=sys.stderr)

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
        if model.vocab.eos_id is not None and model.vocab.eos_id >= 0:
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
                                    stop_ids=stop, stream=True):
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
