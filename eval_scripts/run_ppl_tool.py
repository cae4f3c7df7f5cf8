#!/usr/bin/env python
"""PPL Δ on a REAL text corpus through the product perplexity tool
(VERDICT r3 item 2, second half: "a PPL Δ on a real text corpus through
tools/perplexity.py").

Builds a mid-scale ProSparse-family GGUF (synthetic weights — real
checkpoints are unavailable in this zero-egress env — with the SAME
clustered-firing predictor skew as the bench/quality harness), takes the
repo's own documentation as the text corpus (byte-fallback tokenization
through the product tokenizer), and runs tools/perplexity.py four ways:

  1. --sparse                 exact sparse oracle (saves the KL base)
  2. fetch, ALL hot, C=NG     control: must match the oracle (KL ~ 0)
  3. fetch, ALL hot, C=HOT    capacity cost alone (top-C truncation,
                              everything selected is computed)
  4. drop,  25% hot, C=HOT    + tier cost, cold∩selected thrown away
  5. fetch, 25% hot, C=HOT    the HEADLINE tier semantics: balancer
                              demand-fetches missed groups (capacity <=
                              hot like the chip's c16@hot27 — with C >
                              hot, C-hot selected groups can NEVER all be
                              resident and misses cannot converge)

All rows run --dtype f32: at these shapes (L=12, E=1024) the synthetic
random weights amplify bf16 summation-order noise into KL ~1 between
IDENTICAL functions computed dense-masked vs gathered — f32 keeps the
instrument's floor at KL ~1e-6 so the tier deltas are readable.

Writes eval_scripts/quality_ppl_tool.json.

Run (CPU, ~10-20 min):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python eval_scripts/run_ppl_tool.py
Smoke: SPIF_PPL_TOOL_SMOKE=1 (tiny shapes, short corpus)
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))

SMOKE = os.environ.get("SPIF_PPL_TOOL_SMOKE") == "1"
ROOT = pathlib.Path(__file__).resolve().parent.parent

# mid-scale prosparse shapes (ng=32 groups of 128 @ F=4096) — big enough
# for a 25% hot set to have structure, small enough for CPU windows
L, E, F, V, RANK = (2, 64, 256, 300, 8) if SMOKE else (12, 1024, 4096, 2048, 64)
G = 64 if SMOKE else 128
NG = F // G
HOT = max(1, NG // 4)
HOT2 = max(1, NG // 8)  # under-provisioned tier (drop-vs-fetch gap row)
CTX = 64 if SMOKE else 256
# ~30-90 s per 256-token window on a contended 4-CPU host: the default
# corpus is sized for ~1.5k scored tokens/config; SPIF_PPL_MAX_TOKENS
# raises it when there is wall-clock to spare
MAX_TOKENS = 600 if SMOKE else int(os.environ.get("SPIF_PPL_MAX_TOKENS",
                                                  4096))


def build_gguf(path: str) -> None:
    from model_fixtures import make_tiny_llama

    from sparkinfer_tpu.gguf.reader import GGUFReader

    # weight scale ~0.5/sqrt(E): the fixture default (0.08) at E=1024
    # gives each random matmul spectral norm ~5, so 12 layers amplify
    # f32 rounding noise by ~5^12 and ANY two summation orders diverge
    # to KL ~0.5 (measured) — the instrument must be numerically stable
    # before it can measure the tier
    tensors = make_tiny_llama(
        path, arch="prosparse_llama", n_layer=L, n_embd=E, n_ff=F,
        n_head=8 if not SMOKE else 4, n_head_kv=4 if not SMOKE else 2,
        n_vocab=V, n_ctx=4 * CTX, pred_rank=RANK, with_vocab=True, seed=11,
        scale=0.5 / E ** 0.5,
    )

    # clustered-firing skew (bench _skewed_pred_bias): ~20% of groups fire
    # often, the rest almost never. Sigma is measured EMPIRICALLY from the
    # predictor logits over random normed inputs so the offsets land in
    # the logit distribution's working range.
    rng = np.random.default_rng(7)
    x = rng.standard_normal((64, E)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True) / np.sqrt(E)
    skew = np.empty((L, F), np.float32)
    for l in range(L):
        p = f"blk.{l}."
        z = x @ tensors[p + "ffn_pred_up.weight"].T + tensors[p + "ffn_pred_up.bias"]
        z = np.maximum(z, 0.0) @ tensors[p + "ffn_pred_down.weight"].T
        sigma = float(z.std())
        b = np.full(F, -4.0 * sigma, np.float32)
        hot = rng.choice(NG, size=max(1, NG // 5), replace=False)
        for g in hot:
            b[g * G:(g + 1) * G] = (
                rng.standard_normal(G).astype(np.float32) * 0.5 - 0.5) * sigma
        skew[l] = b

    # in-place binary patch of blk.i.ffn_pred_down.bias via the product
    # reader's tensor directory (offsets are exact; dtype is F32)
    r = GGUFReader(path)
    patches = []
    for l in range(L):
        ti = r.tensors[f"blk.{l}.ffn_pred_down.bias"]
        assert ti.ggml_type.name == "F32" and ti.ne == (F,)
        patches.append((r.data_offset + ti.offset, skew[l].tobytes()))
    del r
    with open(path, "r+b") as f:
        for off, raw in patches:
            f.seek(off)
            f.write(raw)


def corpus_text() -> str:
    parts = []
    for name in ("README.md", "docs/PARITY.md", "BENCH_NOTES.md",
                 "SURVEY.md"):
        p = ROOT / name
        if p.exists():
            parts.append(p.read_text(errors="replace"))
    return "\n\n".join(parts)


def run_tool(argv: list[str]) -> dict:
    import contextlib
    import io

    from sparkinfer_tpu.tools.perplexity import main as ppl_main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = ppl_main(argv)
    assert rc == 0, argv
    return json.loads(buf.getvalue())


def main():
    import time

    t0 = time.time()
    work = pathlib.Path(os.environ.get("SPIF_PPL_TOOL_DIR", "/tmp/ppl_tool"))
    work.mkdir(exist_ok=True)
    gguf = str(work / "prosparse_mid.gguf")
    if not os.path.exists(gguf) or SMOKE:
        build_gguf(gguf)
        print(f"# gguf built {time.time()-t0:.0f}s", file=sys.stderr,
              flush=True)

    text = corpus_text()
    # byte-fallback tokenization makes ~1 token/char; truncate the TEXT so
    # the runs stay CPU-tractable
    corp = work / "corpus.txt"
    corp.write_text(text[:MAX_TOKENS])
    base = str(work / "sparse_base.npz")

    # offline profile -> split file (the PRODUCT flow: the reference's
    # tiered path requires -spif-ms with hot-first reorder perms,
    # src/llama-sparkinfer.cpp:286-352 — a FIXED first-H hot set without
    # the reorder is an arbitrary set and measures nothing)
    split_path = str(work / "model.split.gguf")
    if not os.path.exists(split_path) or SMOKE:
        import jax.numpy as jnp

        from sparkinfer_tpu.models.loader import load_model
        from sparkinfer_tpu.sparse import SparseConfig
        from sparkinfer_tpu.sparse.split import (
            build_split,
            profile_firing,
            write_split,
        )
        from sparkinfer_tpu.tokenizer import build_tokenizer

        model = load_model(gguf, dtype=jnp.float32)
        tk = build_tokenizer(model.vocab)
        ids = np.asarray(tk.encode(corp.read_text(), add_special=True),
                         np.int32)
        scfg = SparseConfig(group_size=G, capacity_groups=NG)
        batches = [ids[i:i + CTX] for i in range(0, min(len(ids), 8 * CTX),
                                                 CTX)]
        firing = profile_firing(model, batches, scfg, max_seq=CTX)
        write_split(split_path, build_split(firing, scfg), "prosparse_llama")
        del model
        print(f"# split profiled {time.time()-t0:.0f}s", file=sys.stderr,
              flush=True)

    common = ["-m", gguf, "-f", str(corp), "-c", str(CTX),
              "--group-size", str(G), "--dtype", "f32"]
    cap_full = ["--capacity-groups", str(NG)]
    cap_hot = ["--capacity-groups", str(HOT)]
    rows = []

    out = run_tool(common + cap_full + ["--sparse", "--save-logits", base])
    rows.append({"config": "exact-sparse(oracle)", **out})
    print(json.dumps(rows[-1]), flush=True)

    sp = ["--split", split_path]
    for label, extra in (
        ("fetch-allhot-CONTROL", cap_full + ["--hot-groups", str(NG),
                                             "--cold-mode", "fetch"]),
        (f"allhot-c{HOT}(capacity-cost)",
         cap_hot + ["--hot-groups", str(NG), "--cold-mode", "fetch"]),
        (f"drop-c{HOT}@hot{HOT}/{NG}-split",
         cap_hot + sp + ["--hot-groups", str(HOT), "--cold-mode", "drop"]),
        (f"fetch-c{HOT}@hot{HOT}/{NG}-split",
         cap_hot + sp + ["--hot-groups", str(HOT), "--cold-mode", "fetch"]),
        # UNDER-provisioned tier (hot = half the profiled working set):
        # drop degrades (fixed hot set loses cold∩selected mass) while
        # fetch adapts between windows — the drop-vs-fetch gap the
        # headline depends on
        (f"drop-c{HOT2}@hot{HOT2}/{NG}-split",
         [ "--capacity-groups", str(HOT2)] + sp
         + ["--hot-groups", str(HOT2), "--cold-mode", "drop"]),
        (f"fetch-c{HOT2}@hot{HOT2}/{NG}-split",
         ["--capacity-groups", str(HOT2)] + sp
         + ["--hot-groups", str(HOT2), "--cold-mode", "fetch"]),
    ):
        out = run_tool(common + extra + ["--kl-divergence", base])
        rows.append({"config": label, **out["kl"]})
        print(json.dumps(rows[-1]), flush=True)

    ppl0 = rows[0]["ppl"]
    for r in rows[1:]:
        r["ppl_delta_vs_exact"] = round(r["ppl"] - ppl0, 4)
    dst = ROOT / "eval_scripts" / "quality_ppl_tool.json"
    if not SMOKE:
        dst.write_text(json.dumps({
            "note": ("PPL Δ + KL on a REAL text corpus (repo docs, "
                     f"{MAX_TOKENS} chars, byte-fallback tokens) through "
                     "tools/perplexity.py; synthetic ProSparse-family "
                     "model with clustered-firing predictors at "
                     f"L={L} E={E} F={F}; fetch rebalances every window "
                     f"(ctx {CTX})"),
            "rows": rows}, indent=1))
        print(f"wrote {dst}", flush=True)


if __name__ == "__main__":
    main()
