"""Quality-Δ evaluator — perplexity, KL-divergence vs a base run, and
multiple-choice accuracy (HellaSwag / Winogrande).

Re-design of tools/perplexity (2,070 LoC: perplexity.cpp — PPL :  chunked
teacher-forced NLL; hellaswag_score :741; winogrande :871; KL-divergence
:173 kl_divergence_result). The reference gates sparsity quality with
these; here every sparse/tiered perf claim can ship with PPL + KL + task
accuracy against the dense path of the SAME weights.

Workflows:
  PPL:            sparkinfer-perplexity -m m.gguf -f corpus.txt
  KL base:        ... -f corpus.txt --save-logits base.npz
  KL vs base:     ... -f corpus.txt --sparse --kl-divergence base.npz
  HellaSwag:      ... --hellaswag tasks.json   (JSON: [{context, endings[4],
                  label}]; accuracy = argmax sum-logprob == label)
  Winogrande:     ... --winogrande tasks.json  (JSON: [{sentence with _,
                  option1, option2, answer}])
"""

from __future__ import annotations

import argparse
import json
import math
import sys

import numpy as np


def _make_fwd(model, ffn_fn):
    import jax

    from ..models.transformer import make_forward

    return jax.jit(make_forward(model.config, ffn_fn=ffn_fn))


def iter_window_logps(model, token_ids: np.ndarray, ctx: int, skip: int,
                      stride: int, ffn_fn=None, fwd=None):
    """Yield (scored_targets, logp (n_scored, V) f32) per window.

    Scored positions follow the reference rule: within each ctx window,
    positions [skip, ctx-1) predict tokens [skip+1, ctx)."""
    import jax
    import jax.numpy as jnp

    from ..runtime.kv_cache import init_cache

    cfg = model.config
    fwd = fwd or _make_fwd(model, ffn_fn)
    pos = jnp.arange(ctx, dtype=jnp.int32)[None]
    n = len(token_ids)
    for start in range(0, n - ctx, stride):
        window = token_ids[start : start + ctx]
        cache = init_cache(cfg, 1, ctx, jnp.bfloat16)
        logits, _ = fwd(model.params, jnp.asarray(window, jnp.int32)[None], pos, cache)
        logp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
        targets = np.asarray(window[1 + skip :], np.int32)
        yield targets, np.asarray(logp[skip:-1])


def compute_ppl(
    model,
    token_ids: np.ndarray,
    ctx: int = 512,
    skip: int | None = None,
    ffn_fn=None,
    stride: int | None = None,
    progress=None,
    save_logits: str | None = None,
    fwd=None,
) -> dict:
    """PPL over a token stream; optionally persist the scored full-vocab
    log-probs (f16 npz) as the base for a later KL-divergence run."""
    skip = ctx // 2 if skip is None else skip
    stride = stride or ctx
    n = len(token_ids)
    nll = 0.0
    count = 0
    saved = []
    for targets, logp in iter_window_logps(model, token_ids, ctx, skip, stride,
                                           ffn_fn, fwd=fwd):
        tok_logp = np.take_along_axis(logp, targets[:, None], axis=1)[:, 0]
        nll += float(-tok_logp.sum())
        count += len(targets)
        if save_logits:
            saved.append(logp.astype(np.float16))
        if progress:
            progress(count, n, math.exp(nll / max(count, 1)))
    if save_logits:
        np.savez_compressed(
            save_logits,
            logp=np.concatenate(saved, axis=0) if saved else np.zeros((0, 0)),
            tokens=token_ids, ctx=ctx, skip=skip, stride=stride,
        )
    ppl = math.exp(nll / max(count, 1))
    return {"ppl": ppl, "nll_per_token": nll / max(count, 1), "n_tokens": count}


def compute_kl(model, token_ids: np.ndarray, base_path: str, ffn_fn=None,
               progress=None, fwd=None) -> dict:
    """KL(base || model) per scored token vs a --save-logits base run, plus
    top-token agreement (ref: kl_divergence_result, perplexity.cpp:173).
    Also returns this run's PPL so one pass gives both numbers."""
    base = np.load(base_path)
    ctx, skip, stride = int(base["ctx"]), int(base["skip"]), int(base["stride"])
    if not np.array_equal(base["tokens"], token_ids):
        raise ValueError("KL base was computed over a different token stream")
    base_logp = base["logp"].astype(np.float32)
    kls = []
    agree = 0
    nll = 0.0
    count = 0
    off = 0
    for targets, logp in iter_window_logps(model, token_ids, ctx, skip, stride,
                                           ffn_fn, fwd=fwd):
        nsc = logp.shape[0]
        b = base_logp[off : off + nsc]
        off += nsc
        p = np.exp(b)
        # renormalize: the f16-stored base is only approximately a
        # distribution; without this, self-KL can read slightly negative
        z = p.sum(axis=1, keepdims=True)
        p = p / z
        b = b - np.log(z)
        kls.append((p * (b - logp)).sum(axis=1))
        agree += int((b.argmax(axis=1) == logp.argmax(axis=1)).sum())
        tok_logp = np.take_along_axis(logp, targets[:, None], axis=1)[:, 0]
        nll += float(-tok_logp.sum())
        count += nsc
        if progress:
            progress(count, len(token_ids), float(np.mean(np.concatenate(kls))))
    kl = np.concatenate(kls) if kls else np.zeros((0,))
    return {
        "kl_mean": float(kl.mean()) if len(kl) else 0.0,
        "kl_max": float(kl.max()) if len(kl) else 0.0,
        "kl_p99": float(np.percentile(kl, 99)) if len(kl) else 0.0,
        "top1_agreement": agree / max(count, 1),
        "ppl": math.exp(nll / max(count, 1)),
        "n_tokens": count,
    }


# ---------------------------------------------------------------------------
# multiple-choice scoring (HellaSwag / Winogrande)


def _choice_logprob(model, fwd, ctx_ids: list[int], cont_ids: list[int],
                    max_seq: int) -> float:
    """Sum log p(cont | ctx) with one teacher-forced forward."""
    import jax
    import jax.numpy as jnp

    from ..runtime.engine import bucket_len
    from ..runtime.kv_cache import init_cache

    ids = (ctx_ids + cont_ids)[-max_seq:]
    n_ctx = len(ids) - len(cont_ids)
    T = bucket_len(len(ids))
    toks = np.zeros((1, T), np.int32)
    toks[0, : len(ids)] = ids
    pos = np.arange(T, dtype=np.int32)[None]
    cache = init_cache(model.config, 1, T, jnp.bfloat16)
    logits, _ = fwd(model.params, jnp.asarray(toks), jnp.asarray(pos), cache)
    logp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
    total = 0.0
    for i, t in enumerate(cont_ids):
        total += float(logp[n_ctx + i - 1, t])
    return total


def hellaswag_score(model, tokenizer, tasks: list[dict], ffn_fn=None,
                    max_seq: int = 512, length_norm: bool = False,
                    progress=None) -> dict:
    """tasks: [{"context": str, "endings": [str, ...], "label": int}].
    Picks argmax sum-logprob ending (ref: hellaswag_score,
    perplexity.cpp:741 — un-normalized sum over ending tokens)."""
    fwd = _make_fwd(model, ffn_fn)
    n_correct = 0
    for i, task in enumerate(tasks):
        ctx_ids = tokenizer.encode(task["context"], add_special=True)
        scores = []
        for ending in task["endings"]:
            cont = tokenizer.encode(" " + ending.strip(), add_special=False)
            s = _choice_logprob(model, fwd, ctx_ids, cont, max_seq)
            scores.append(s / len(cont) if length_norm else s)
        n_correct += int(int(np.argmax(scores)) == int(task["label"]))
        if progress:
            progress(i + 1, len(tasks), n_correct / (i + 1))
    return {"accuracy": n_correct / max(len(tasks), 1), "n_tasks": len(tasks)}


def winogrande_score(model, tokenizer, tasks: list[dict], ffn_fn=None,
                     max_seq: int = 512, progress=None) -> dict:
    """tasks: [{"sentence": "...the _ was...", "option1": str,
    "option2": str, "answer": "1"|"2"}]. Scores the text AFTER the blank
    under each substitution (ref: winogrande, perplexity.cpp:871)."""
    fwd = _make_fwd(model, ffn_fn)
    n_correct = 0
    for i, task in enumerate(tasks):
        pre, _, post = task["sentence"].partition("_")
        scores = []
        for opt in (task["option1"], task["option2"]):
            ctx_ids = tokenizer.encode(pre + opt, add_special=True)
            cont = tokenizer.encode(post, add_special=False)
            if not cont:
                cont = [tokenizer.encode(" ", add_special=False) or [0]][0]
            scores.append(_choice_logprob(model, fwd, ctx_ids, cont, max_seq))
        pick = int(np.argmax(scores)) + 1
        n_correct += int(pick == int(task["answer"]))
        if progress:
            progress(i + 1, len(tasks), n_correct / (i + 1))
    return {"accuracy": n_correct / max(len(tasks), 1), "n_tasks": len(tasks)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="sparkinfer-perplexity")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", help="text corpus (PPL / KL modes)")
    ap.add_argument("-c", "--ctx-size", type=int, default=512)
    ap.add_argument("--sparse", action="store_true")
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--capacity-groups", type=int, default=0)
    ap.add_argument("--hot-groups", type=int, default=0,
                    help="evaluate the TIERED path with this fixed hot-set "
                         "size (quality cost of drop/host cold handling)")
    ap.add_argument("--cold-mode", default="drop",
                    choices=["drop", "host", "fetch"])
    ap.add_argument("--store-quant", default=None, choices=["q8_0"],
                    help="pack the tiered hot store Q8_0 (headline config)")
    ap.add_argument("--rebalance-every", type=int, default=1,
                    help="fetch tier: rebalance every N windows")
    ap.add_argument("--split", help="offline split file (hot-first reorder)")
    ap.add_argument("--save-logits", help="write full-vocab logp base (npz)")
    ap.add_argument("--kl-divergence", metavar="BASE_NPZ",
                    help="KL vs a --save-logits base run")
    ap.add_argument("--hellaswag", metavar="TASKS_JSON")
    ap.add_argument("--winogrande", metavar="TASKS_JSON")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"],
                    help="compute dtype (f32 for numerically-sensitive "
                         "KL comparisons; bf16 matches serving)")
    ap.add_argument("--mmlu", metavar="TASKS_JSON",
                    help="multiple-choice QA: [{question, choices[...],"
                         " answer (index or letter)}] (ref perplexity.cpp"
                         " multiple_choice_score)")
    args = ap.parse_args(argv)

    from ..models.loader import load_model
    from ..tokenizer import build_tokenizer

    import jax.numpy as _jnp

    model = load_model(args.model, dtype=_jnp.float32 if args.dtype == "f32"
                       else _jnp.bfloat16)
    tk = build_tokenizer(model.vocab)

    ffn_fn = None
    fwd_override = None
    if args.hot_groups and model.config.has_predictors:
        # tiered quality eval: fixed hot set (first-H groups — combined
        # with a --split reorder that means "the profiled-hottest")
        import jax

        from ..sparse.config import SparseConfig
        from ..sparse.ffn import sparse_layout
        from ..sparse.tiering import (
            ColdStore,
            init_tiered,
            make_tiered_ffn,
            tiered_layer_params,
        )

        cfg = model.config
        scfg = SparseConfig(group_size=args.group_size,
                            capacity_groups=args.capacity_groups,
                            hot_groups=args.hot_groups)
        if args.split:
            from ..sparse.split import apply_reorder, read_split

            model.params = apply_reorder(model.params, cfg,
                                         read_split(args.split).perms)
        layers = sparse_layout(model.params["layers"], cfg, scfg)
        tp, fs = init_tiered(cfg, scfg, layers, args.hot_groups,
                             quant=args.store_quant,
                             track_miss_groups=args.cold_mode == "fetch")
        cold = None
        if args.cold_mode in ("host", "fetch"):
            cold = ColdStore(cfg, scfg,
                             {k: np.asarray(v) for k, v in layers.items()
                              if k.endswith("_rows") or k == "b_up"})
        plat = jax.devices()[0].platform
        kern = "pallas" if plat == "tpu" else "gather"
        if args.cold_mode == "fetch":
            # the HEADLINE tier: stateful DFR + per-group miss counts,
            # balancer demand-fetching missed groups between windows
            # (runtime/scheduler.py rebalance loop; ref reload-exec,
            # ggml-cuda.cu:2520-2604). PPL here includes the convergence
            # transient — score a long-enough -f corpus (or use
            # --rebalance-every to densify rebalances) to see the
            # steady state the serving path reaches.
            import jax.numpy as jnp

            from ..models.transformer import make_forward
            from ..sparse.balancer import Balancer

            ffn_st = make_tiered_ffn(cfg, scfg, cold, mode="fetch",
                                     kernel=kern)
            fwd_st = jax.jit(make_forward(cfg, ffn_fn=ffn_st,
                                          stateful_ffn=True))
            bal = Balancer(cold=cold, scfg=scfg)
            state = {"tp": tp, "fs": fs, "win": 0}
            (model.params["layers"],
             model.params["sparse_flat"]) = tiered_layer_params(layers, tp)

            def fwd_fetch(params, toks, pos, cache):
                logits, cache2, fs2 = fwd_st(params, toks, pos, cache,
                                             state["fs"])
                state["fs"] = fs2
                state["win"] += 1
                if state["win"] % max(args.rebalance_every, 1) == 0:
                    mg = (np.asarray(fs2.miss_g)
                          if fs2.miss_g is not None else None)
                    state["tp"] = bal.rebalance(
                        state["tp"], np.asarray(fs2.dfr), miss_g=mg)
                    if mg is not None:
                        state["fs"] = fs2._replace(
                            miss_g=jnp.zeros_like(fs2.miss_g))
                    lp2, flat2 = tiered_layer_params(layers, state["tp"])
                    model.params["layers"] = lp2
                    model.params["sparse_flat"] = flat2
                return logits, cache2

            fwd_override = fwd_fetch
        else:
            ffn_fn = make_tiered_ffn(cfg, scfg, cold, mode=args.cold_mode,
                                     kernel=kern, stateless=True)
            (model.params["layers"],
             model.params["sparse_flat"]) = tiered_layer_params(layers, tp)
    elif args.sparse and model.config.has_predictors:
        from ..sparse.config import SparseConfig
        from ..sparse.ffn import make_sparse_ffn, prepare_sparse_params

        scfg = SparseConfig(group_size=args.group_size,
                            capacity_groups=args.capacity_groups)
        model.params = prepare_sparse_params(model.params, model.config, scfg)
        ffn_fn = make_sparse_ffn(model.config, scfg, mode="dense")

    def progress(done, total, metric):
        print(f"[{done}/{total}] {metric:.4f}", file=sys.stderr)

    out = {}
    if fwd_override is not None and (args.hellaswag or args.winogrande
                                     or args.mmlu):
        ap.error("--cold-mode fetch supports -f corpus modes only "
                 "(multiple-choice scoring reuses contexts; the stateful "
                 "fetch tier would leak state across choices)")
    if args.hellaswag:
        tasks = json.load(open(args.hellaswag))
        out["hellaswag"] = hellaswag_score(model, tk, tasks, ffn_fn=ffn_fn,
                                           max_seq=args.ctx_size,
                                           progress=progress)
    if args.winogrande:
        tasks = json.load(open(args.winogrande))
        out["winogrande"] = winogrande_score(model, tk, tasks, ffn_fn=ffn_fn,
                                             max_seq=args.ctx_size,
                                             progress=progress)
    if args.mmlu:
        # MMLU-style multiple choice rides the HellaSwag scorer: the
        # question becomes the context, each choice an ending
        raw = json.load(open(args.mmlu))
        tasks = []
        for t in raw:
            ans = t.get("answer", 0)
            if isinstance(ans, str):
                ans = "ABCDEFGH".index(ans.strip().upper()[0])
            tasks.append({
                "context": f"Question: {t['question']}\nAnswer:",
                "endings": [f" {c}" for c in t["choices"]],
                "label": int(ans),
            })
        out["mmlu"] = hellaswag_score(model, tk, tasks, ffn_fn=ffn_fn,
                                      max_seq=args.ctx_size,
                                      progress=progress)
    if args.file:
        ids = np.asarray(tk.encode(open(args.file).read(), add_special=True),
                         np.int32)
        print(f"{len(ids)} tokens", file=sys.stderr)
        if args.kl_divergence:
            out["kl"] = compute_kl(model, ids, args.kl_divergence,
                                   ffn_fn=ffn_fn, progress=progress,
                                   fwd=fwd_override)
        else:
            out.update(compute_ppl(model, ids, ctx=args.ctx_size,
                                   ffn_fn=ffn_fn, progress=progress,
                                   save_logits=args.save_logits,
                                   fwd=fwd_override))
    if not out:
        ap.error("nothing to do: pass -f and/or --hellaswag/--winogrande")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
