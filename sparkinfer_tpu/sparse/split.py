"""Offline model-split generator + split-file I/O.

The reference consumes a 'model split' GGUF produced by EXTERNAL profiling
tooling not present in its repo (SURVEY.md §2.6): KV `ffn_group_size`,
`ffn_normalized_pattern` (per-layer float weights apportioning the VRAM
budget), and per-layer `blk.i.ffn_reorder_perms` I32 tensors (hot-first
neuron permutation). Read at src/llama-sparkinfer.cpp:150-158, 269-276.

This module IS that tooling, plus reader/writer for the same artifact:
  - profile_firing(): run calibration tokens through the model with a
    stateful dense-masked FFN accumulating per-neuron firing counts;
  - build_split(): firing counts -> normalized per-layer pattern (mean
    firing rate per layer, normalized to sum 1 — layers whose neurons fire
    more get more HBM budget, matching n_group_cache apportioning
    src/llama-sparkinfer.cpp:179-202) + hot-first neuron permutation per
    layer (argsort by firing rate, descending) rounded to group blocks;
  - apply_reorder(): permute neuron rows of w_up/w_gate/w_down(+b_up) and
    predictor OUTPUT rows (pred_down cols + bias) — a pure relabeling that
    leaves the model function unchanged (ref reorder:
    src/llama-sparkinfer.cpp:286-352) but packs co-hot neurons into the
    same groups so group-granular tiering wastes less HBM;
  - write_split()/read_split(): GGUF round-trip of the artifact;
  - apportion(): HBM budget (#groups total) -> per-layer hot group counts
    with round-robin remainder (src/llama-sparkinfer.cpp:196-202).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFReader
from ..gguf.writer import GGUFWriter
from ..models.config import ModelConfig
from .config import SparseConfig
from .ffn import make_sparse_ffn
from .predictor import predict_activations


@dataclass
class ModelSplit:
    group_size: int
    pattern: np.ndarray  # (L,) f32 normalized
    perms: np.ndarray  # (L, F) int32: new_row i holds old neuron perms[l, i]
    firing: np.ndarray | None = None  # (L, F) f32 mean firing rate (optional)


def profile_firing(
    model,
    token_batches: list[np.ndarray],
    scfg: SparseConfig,
    max_seq: int = 512,
) -> np.ndarray:
    """Mean firing rate per neuron, (L, F): fraction of calibration tokens
    whose predicted activation prob >= threshold."""
    from ..models.transformer import make_forward
    from ..runtime.kv_cache import init_cache

    cfg: ModelConfig = model.config
    thr = scfg.threshold
    dense = make_sparse_ffn(cfg, scfg, mode="dense")

    def counting_ffn(lp, x, fs, il):
        probs = predict_activations(lp, x.reshape(-1, x.shape[-1]))
        fired = (probs >= thr).astype(jnp.float32)
        fs2 = {
            "fired": fs["fired"] + fired.sum(0),
            "tokens": fs["tokens"] + float(probs.shape[0]),
        }
        return dense(lp, x), fs2

    fwd = jax.jit(make_forward(cfg, ffn_fn=counting_ffn, stateful_ffn=True))
    L, F = cfg.n_layer, cfg.n_ff
    fstate = {
        "fired": jnp.zeros((L, F), jnp.float32),
        "tokens": jnp.zeros((L, 1), jnp.float32),
    }
    for toks in token_batches:
        toks = np.asarray(toks, np.int32)
        T = len(toks)
        cache = init_cache(cfg, 1, min(max_seq, max(T, 8)), jnp.float32)
        pos = jnp.arange(T, dtype=jnp.int32)[None]
        _, _, fstate = fwd(model.params, jnp.asarray(toks)[None], pos, cache, fstate)
    fired = np.asarray(fstate["fired"])
    tokens = np.asarray(fstate["tokens"])
    return fired / np.maximum(tokens, 1.0)


def build_split(firing: np.ndarray, scfg: SparseConfig) -> ModelSplit:
    L, F = firing.shape
    # hot-first permutation per layer
    perms = np.argsort(-firing, axis=1, kind="stable").astype(np.int32)
    # per-layer pattern: share of total firing mass
    layer_mass = firing.mean(axis=1)
    total = layer_mass.sum()
    pattern = (layer_mass / total if total > 0 else np.full(L, 1.0 / L)).astype(np.float32)
    return ModelSplit(
        group_size=scfg.group_size, pattern=pattern, perms=perms, firing=firing
    )


def apportion(budget_groups: int, pattern: np.ndarray, ng: int) -> np.ndarray:
    """Per-layer hot group counts: floor(budget * pattern) then round-robin
    the remainder, capped at ng (ref: src/llama-sparkinfer.cpp:179-202)."""
    L = len(pattern)
    raw = budget_groups * pattern
    counts = np.minimum(np.floor(raw).astype(np.int64), ng)
    rem = int(budget_groups - counts.sum())
    order = np.argsort(-(raw - counts), kind="stable")
    i = 0
    while rem > 0 and (counts < ng).any():
        l = order[i % L]
        if counts[l] < ng:
            counts[l] += 1
            rem -= 1
        i += 1
    return counts.astype(np.int32)


def apply_reorder(params: dict, cfg: ModelConfig, perms: np.ndarray,
                  inplace: bool = False, keys=None) -> dict:
    """Permute the neuron axis of the stacked layer weights by `perms`
    (hot-first). Function-preserving; ref src/llama-sparkinfer.cpp:286-352
    permutes ffn_up/gate/down rows, pred_down(+bias), ffn biases.

    Memory discipline (round 5, measured RESOURCE_EXHAUSTED at 7B):
    inplace=True POPS each big FFN tensor from the caller's layers dict
    before its permuted copy is created and DONATES its buffer, so at
    most one extra tensor is live at a time instead of a full second
    model. Requires exclusive ownership of the arrays (donation
    invalidates them) — the serving/CLI paths that immediately rebind
    params use it; library callers sharing params keep the default
    copy semantics. keys limits the reorder to a subset (the 7B+
    tiered serving path permutes the big FFN tensors HOST-side during
    its layer-by-layer rows conversion — even one extra device tensor
    copy exceeds HBM there — and uses keys for the small ones)."""
    from functools import partial

    layers = params["layers"] if inplace else dict(params["layers"])
    L, F = perms.shape
    pj = jnp.asarray(perms)

    @partial(jax.jit, donate_argnums=0, static_argnames=("axis",))
    def perm_d(w, p3, axis):
        return jnp.take_along_axis(w, p3, axis=axis)

    @partial(jax.jit, static_argnames=("axis",))
    def perm(w, p3, axis):
        return jnp.take_along_axis(w, p3, axis=axis)

    f = perm_d if inplace else perm
    for k, p3, ax in (("w_up", pj.reshape(L, 1, F), -1),
                      ("w_gate", pj.reshape(L, 1, F), -1),
                      ("w_down", pj[:, :, None], 1),
                      ("b_up", pj, -1),
                      ("pred_down_b", pj, -1),
                      ("pred_down", pj.reshape(L, 1, F), -1)):
        if k in layers and (keys is None or k in keys):
            layers[k] = f(layers.pop(k) if inplace else layers[k], p3, ax)
    out = dict(params)
    out["layers"] = layers
    return out


def write_split(path: str, split: ModelSplit, arch: str = "llama"):
    w = GGUFWriter(path, arch)
    w.add_kv("ffn_group_size", np.uint32(split.group_size))
    w.add_array("ffn_normalized_pattern", split.pattern.astype(np.float32))
    for l in range(split.perms.shape[0]):
        w.add_tensor(f"blk.{l}.ffn_reorder_perms", split.perms[l].astype(np.int32),
                     GGMLType.I32)
        if split.firing is not None:
            w.add_tensor(f"blk.{l}.ffn_firing", split.firing[l].astype(np.float32),
                         GGMLType.F32)
    w.write()


def read_split(path: str) -> ModelSplit:
    r = GGUFReader(path)
    gs = int(r.kv["ffn_group_size"])
    pattern = np.asarray(r.kv["ffn_normalized_pattern"], np.float32)
    L = len(pattern)
    perms = np.stack(
        [r.tensors[f"blk.{l}.ffn_reorder_perms"].astype_np().astype(np.int32) for l in range(L)]
    )
    firing = None
    if "blk.0.ffn_firing" in r.tensors:
        firing = np.stack(
            [r.tensors[f"blk.{l}.ffn_firing"].to_f32() for l in range(L)]
        )
    r.close()
    return ModelSplit(group_size=gs, pattern=pattern, perms=perms, firing=firing)
