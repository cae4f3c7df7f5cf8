"""Diffusion-LM text generation — analogue of examples/diffusion
(diffusion-cli.cpp): iterative parallel unmasking for Dream/LLaDA-style
diffusion LLMs.

The reference re-decodes the full window each step through a NON-causal
graph, picks how many masked positions to "transfer" (timestep- or
block-scheduled), and selects which ones by confidence/entropy/margin/
random/origin. TPU re-design: one jitted step function over the static
window — forward (bidirectional attention via make_forward(causal=False)),
per-position candidate sampling, score ranking among masked slots via
argsort (static shapes; the transfer count is a traced scalar compared
against rank), masked update with jnp.where. The Python loop only walks
the step schedule; everything hot is one compiled program per window size.

Algorithms (ref diffusion-cli.cpp enum diffusion_algorithm):
  origin     — random subset at rate p = 1/steps-ish (ref ORIGIN)
  entropy    — highest negative entropy first (most certain distribution)
  margin     — largest top1-top2 probability margin first
  random     — uniformly random masked positions
  confidence — highest probability of the chosen candidate (default)

Schedules (ref transfer_schedule): "timestep" (eps-parameterised fraction
of remaining masks per step) and "block" (LLaDA: equal transfer counts
within consecutive blocks).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.transformer import make_forward
from ..runtime.kv_cache import init_cache

ALGORITHMS = ("origin", "entropy", "margin", "random", "confidence")


@dataclass
class DiffusionConfig:
    steps: int = 64
    algorithm: str = "confidence"
    schedule: str = "timestep"  # "timestep" | "block"
    eps: float = 1e-3
    block_length: int = 32
    temp: float = 0.0
    top_k: int = 0
    seed: int = 42
    mask_token_id: int | None = None  # default: model metadata / vocab size-1
    visual: bool = False


class DiffusionEngine:
    """Window-denoising generation over a (non-causal) forward."""

    def __init__(self, model, dcfg: DiffusionConfig | None = None):
        self.model = model
        self.cfg = model.config
        self.dcfg = dcfg or DiffusionConfig()
        self.mask_id = self.dcfg.mask_token_id
        if self.mask_id is None:
            v = getattr(model, "vocab", None)
            self.mask_id = getattr(v, "mask_id", None) if v is not None else None
        if self.mask_id is None or self.mask_id < 0:
            self.mask_id = self.cfg.n_vocab - 1
        self._fwd = jax.jit(make_forward(self.cfg, causal=False, fresh_prefill=True))
        self._step = jax.jit(self._make_step())

    def _make_step(self):
        d = self.dcfg
        mask_id = self.mask_id

        def step(params, tokens, cache, n_transfer, b0, b1, key):
            # tokens (1, W) int32; n_transfer/b0/b1 () int32; only positions
            # in [b0, b1) are transfer candidates (block schedule); the rest
            # stay masked in the INPUT so conditioning is unchanged
            W = tokens.shape[1]
            pos = jnp.arange(W, dtype=jnp.int32)[None]
            logits, _ = self._fwd(params, tokens, pos, cache)
            logits = logits[0].astype(jnp.float32)  # (W, V)
            if d.top_k > 0:
                kth = jnp.sort(logits, axis=-1)[:, -d.top_k][:, None]
                logits = jnp.where(logits >= kth, logits, -jnp.inf)
            probs = jax.nn.softmax(logits, axis=-1)
            key, k1, k2 = jax.random.split(key, 3)
            if d.temp > 0:
                cand = jax.random.categorical(k1, logits / d.temp, axis=-1)
            else:
                cand = jnp.argmax(logits, axis=-1)
            cand = cand.astype(jnp.int32)

            idx = jnp.arange(W, dtype=jnp.int32)
            masked = (tokens[0] == mask_id) & (idx >= b0) & (idx < b1)  # (W,)
            p_cand = jnp.take_along_axis(probs, cand[:, None], axis=-1)[:, 0]
            if d.algorithm == "confidence":
                score = p_cand
            elif d.algorithm == "margin":
                top2 = jax.lax.top_k(probs, 2)[0]
                score = top2[:, 0] - top2[:, 1]
            elif d.algorithm == "entropy":
                score = (probs * jnp.log(probs + 1e-10)).sum(-1)  # -H (higher = certain)
            else:  # random / origin: uniform random priority
                score = jax.random.uniform(k2, (tokens.shape[1],))
            score = jnp.where(masked, score, -jnp.inf)
            # rank among ALL positions by descending score; unmasked are -inf
            # so ranks < n_masked are exactly the masked ones in priority order
            order = jnp.argsort(-score)
            rank = jnp.zeros_like(order).at[order].set(
                jnp.arange(order.shape[0], dtype=order.dtype))
            take = masked & (rank < n_transfer)
            new = jnp.where(take, cand, tokens[0])
            return new[None], take.sum(), key

        return step

    def _transfer_counts(self, n_masked: int) -> list[int]:
        """Per-step unmask counts (host-side; ref calculate_transfer_count +
        get_num_transfer_tokens)."""
        d = self.dcfg
        steps = max(1, d.steps)
        counts = []
        if d.schedule == "block":
            # LLaDA: equal split, remainder to the first steps
            base, rem = divmod(n_masked, steps)
            counts = [base + (1 if i < rem else 0) for i in range(steps)]
        else:
            remaining = n_masked
            for s in range(steps):
                t = 1.0 - s / steps
                t2 = max(1.0 - (s + 1) / steps, d.eps)
                p = 1.0 if s == steps - 1 else min(1.0, 1.0 - t2 / max(t, d.eps))
                c = int(np.ceil(remaining * p)) if s < steps - 1 else remaining
                c = max(c, 1) if remaining > 0 else 0
                counts.append(min(c, remaining))
                remaining -= counts[-1]
        return counts

    def generate(self, prompt_tokens: list[int], max_new_tokens: int = 64,
                 on_step=None) -> list[int]:
        d = self.dcfg
        P = len(prompt_tokens)
        W = P + max_new_tokens
        tokens = jnp.asarray(
            list(prompt_tokens) + [self.mask_id] * max_new_tokens, jnp.int32
        )[None]
        cache = init_cache(self.cfg, 1, W, jnp.bfloat16)
        key = jax.random.PRNGKey(d.seed)

        if d.schedule == "block":
            # denoise consecutive blocks left-to-right (LLaDA semi-AR)
            blocks = [
                (P + i, min(P + i + d.block_length, W))
                for i in range(0, max_new_tokens, d.block_length)
            ]
        else:
            blocks = [(P, W)]

        for (b0, b1) in blocks:
            counts = self._transfer_counts(b1 - b0)
            for c in counts:
                if c <= 0:
                    continue
                tokens, n_done, key = self._step(
                    self.model.params, tokens, cache,
                    jnp.int32(c), jnp.int32(b0), jnp.int32(b1), key)
                if on_step:
                    on_step(np.asarray(tokens[0]))
        out = np.asarray(tokens[0, P:])
        return [int(t) for t in out]
