"""Sampling chain — jittable re-design of the reference sampler stack.

The reference (src/llama-sampling.cpp) implements samplers as a chain of
stateful C objects mutating a candidate array (dist/greedy/top-k/top-p/
min-p/typical/temp/temp-ext/xtc/mirostat/penalties/dry). On TPU we keep
the same chain semantics but express every stage as a pure function over
the full logit vector, so the whole chain jits into the decode step and
runs on-device: no host round-trip per token.

Penalty state (the reference's ring buffer of recent tokens,
llama_sampler_penalties) is carried as a fixed-size token-history array in
SamplerState; DRY and grammar-constrained sampling live in separate
modules (grammar masking is applied as a logit mask before this chain).

Chain order mirrors common/sampling.cpp defaults:
  penalties -> top-k -> typical -> top-p -> min-p -> xtc -> temp -> dist.
Mirostat (v2), when enabled, replaces the truncation stages.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Static sampler parameters (compiled into the step fn).

    Defaults mirror common/common.h common_params_sampling.
    """

    temp: float = 0.8
    top_k: int = 40
    top_p: float = 0.95
    min_p: float = 0.05
    typical_p: float = 1.0
    penalty_last_n: int = 64
    penalty_repeat: float = 1.0
    penalty_freq: float = 0.0
    penalty_present: float = 0.0
    mirostat: int = 0  # 0 off, 2 = mirostat v2
    mirostat_tau: float = 5.0
    mirostat_eta: float = 0.1
    xtc_probability: float = 0.0
    xtc_threshold: float = 0.1
    seed: int = 42

    @property
    def greedy(self) -> bool:
        return self.temp <= 0.0 and self.mirostat == 0


class SamplerState(NamedTuple):
    """Per-slot carried sampling state (a pytree in the decode carry)."""

    key: jax.Array  # PRNG key, shape (2,) uint32 (or typed key)
    recent: jnp.ndarray  # (penalty_last_n,) int32 ring of recent tokens, -1 = empty
    recent_pos: jnp.ndarray  # () int32 next write slot
    mirostat_mu: jnp.ndarray  # () f32


def init_state(cfg: SamplerConfig, seed: int | None = None) -> SamplerState:
    n = max(cfg.penalty_last_n, 1)
    return SamplerState(
        key=jax.random.PRNGKey(cfg.seed if seed is None else seed),
        recent=jnp.full((n,), -1, jnp.int32),
        recent_pos=jnp.zeros((), jnp.int32),
        mirostat_mu=jnp.asarray(2.0 * cfg.mirostat_tau, jnp.float32),
    )


def _apply_penalties(cfg: SamplerConfig, logits: jnp.ndarray, st: SamplerState) -> jnp.ndarray:
    """Repetition/frequency/presence penalties over the recent-token ring.

    Ref: llama_sampler_penalties (src/llama-sampling.cpp): count occurrences
    in the last n tokens; divide positive logits by penalty_repeat (multiply
    negative), subtract freq*count + present*(count>0).
    """
    if (
        cfg.penalty_repeat == 1.0
        and cfg.penalty_freq == 0.0
        and cfg.penalty_present == 0.0
    ) or cfg.penalty_last_n <= 0:
        return logits
    V = logits.shape[-1]
    valid = st.recent >= 0
    one_hot_counts = jnp.zeros((V,), jnp.float32).at[jnp.where(valid, st.recent, 0)].add(
        valid.astype(jnp.float32)
    )
    count = one_hot_counts
    present = (count > 0).astype(jnp.float32)
    lf = logits.astype(jnp.float32)
    if cfg.penalty_repeat != 1.0:
        lf = jnp.where(
            present > 0,
            jnp.where(lf > 0, lf / cfg.penalty_repeat, lf * cfg.penalty_repeat),
            lf,
        )
    lf = lf - count * cfg.penalty_freq - present * cfg.penalty_present
    return lf


def _top_k_mask(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    V = logits.shape[-1]
    if k <= 0 or k >= V:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1]
    return jnp.where(logits < kth, NEG_INF, logits)


def _top_p_mask(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits)[::-1]
    probs = jax.nn.softmax(sorted_logits)
    cum = jnp.cumsum(probs)
    # keep tokens until cumulative prob exceeds p (always keep at least 1)
    keep_sorted = cum - probs < p
    n_keep = jnp.maximum(jnp.sum(keep_sorted), 1)
    cutoff = sorted_logits[n_keep - 1]
    return jnp.where(logits < cutoff, NEG_INF, logits)


def _min_p_mask(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    if p <= 0.0:
        return logits
    max_l = jnp.max(logits)
    # keep tokens with prob >= p * max_prob  <=>  logit >= max + log(p)
    return jnp.where(logits < max_l + jnp.log(p), NEG_INF, logits)


def _typical_mask(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Locally-typical sampling (ref: llama_sampler_typical)."""
    if p >= 1.0:
        return logits
    probs = jax.nn.softmax(logits)
    ent = -jnp.sum(jnp.where(probs > 0, probs * jnp.log(probs + 1e-20), 0.0))
    shifted = jnp.abs(-jnp.log(probs + 1e-20) - ent)
    order = jnp.argsort(shifted)  # ascending deviation from entropy
    probs_sorted = probs[order]
    cum = jnp.cumsum(probs_sorted)
    keep_n = jnp.maximum(jnp.sum((cum - probs_sorted) < p), 1)
    rank = jnp.argsort(order)  # position of each token in typicality order
    return jnp.where(rank < keep_n, logits, NEG_INF)


def _xtc(logits: jnp.ndarray, key: jax.Array, prob: float, threshold: float) -> jnp.ndarray:
    """Exclude-top-choices: with probability `prob`, drop all but the last
    token whose prob exceeds `threshold` (ref: llama_sampler_xtc)."""
    if prob <= 0.0:
        return logits
    probs = jax.nn.softmax(logits)
    above = probs >= threshold
    n_above = jnp.sum(above)
    u = jax.random.uniform(key)
    # drop every above-threshold token except the least likely of them
    kth = jax.lax.top_k(jnp.where(above, probs, -1.0), 1)[0]  # placeholder keep shape
    del kth
    min_above = jnp.min(jnp.where(above, probs, jnp.inf))
    drop = above & (probs > min_above)
    do_apply = (u < prob) & (n_above >= 2)
    return jnp.where(do_apply & drop, NEG_INF, logits)


def make_sampler(cfg: SamplerConfig):
    """Build sample(logits_f32[V], state) -> (token i32, new_state).

    Pure/jittable; vmap over slots for batched serving.
    """

    def update_recent(st: SamplerState, tok: jnp.ndarray) -> SamplerState:
        n = st.recent.shape[0]
        return st._replace(
            recent=st.recent.at[st.recent_pos % n].set(tok),
            recent_pos=st.recent_pos + 1,
        )

    def sample(logits: jnp.ndarray, st: SamplerState):
        logits = logits.astype(jnp.float32)
        lf = _apply_penalties(cfg, logits, st)

        if cfg.greedy:
            tok = jnp.argmax(lf).astype(jnp.int32)
            return tok, update_recent(st, tok)

        key, k_dist, k_xtc = jax.random.split(st.key, 3)

        if cfg.mirostat == 2:
            # Mirostat v2 (ref: llama_sampler_mirostat_v2): truncate tokens
            # with surprise > mu, sample, then update mu toward tau.
            lf = lf / max(cfg.temp, 1e-6)
            probs = jax.nn.softmax(lf)
            max_l = jnp.max(lf)
            surprise = (max_l - lf) / jnp.log(2.0)  # -log2(p/pmax) shifted
            # surprise relative to distribution: -log2 p
            logp = jax.nn.log_softmax(lf)
            s = -logp / jnp.log(2.0)
            masked = jnp.where(s <= st.mirostat_mu, lf, NEG_INF)
            # always keep argmax
            masked = masked.at[jnp.argmax(lf)].set(max_l)
            tok = jax.random.categorical(k_dist, masked).astype(jnp.int32)
            observed = s[tok]
            mu = st.mirostat_mu - cfg.mirostat_eta * (observed - cfg.mirostat_tau)
            st2 = st._replace(key=key, mirostat_mu=mu)
            del probs, surprise
            return tok, update_recent(st2, tok)

        lf = _top_k_mask(lf, cfg.top_k)
        lf = _typical_mask(lf, cfg.typical_p)
        lf = _top_p_mask(lf, cfg.top_p)
        lf = _min_p_mask(lf, cfg.min_p)
        lf = _xtc(lf, k_xtc, cfg.xtc_probability, cfg.xtc_threshold)
        lf = lf / max(cfg.temp, 1e-6)
        tok = jax.random.categorical(k_dist, lf).astype(jnp.int32)
        st2 = st._replace(key=key)
        return tok, update_recent(st2, tok)

    return sample
