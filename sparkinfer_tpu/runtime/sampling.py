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


# ---------------------------------------------------------------------------
# Dynamic per-slot sampler: every chain knob rides as DATA so one compiled
# decode step serves requests with different temperature/top-k/top-p/... —
# the analogue of the reference server building a fresh sampler chain per
# slot (launch_slot_with_task -> common_sampler_init). A neutral value for
# any stage makes that stage an exact identity, so requests that leave a
# knob at its "off" value sample identically to the static chain.


class DynamicParams(NamedTuple):
    """Per-slot sampler knobs, carried as a (B,)-stacked pytree."""

    temp: jnp.ndarray  # () f32; <= 0 -> greedy
    top_k: jnp.ndarray  # () i32; <= 0 -> off
    top_p: jnp.ndarray  # () f32; >= 1 -> off
    min_p: jnp.ndarray  # () f32; <= 0 -> off
    typical_p: jnp.ndarray  # () f32; >= 1 -> off
    penalty_repeat: jnp.ndarray  # () f32; 1.0 -> off
    penalty_freq: jnp.ndarray  # () f32; 0 -> off
    penalty_present: jnp.ndarray  # () f32; 0 -> off
    xtc_probability: jnp.ndarray  # () f32; 0 -> off


def dynamic_params(cfg: SamplerConfig) -> DynamicParams:
    f = lambda v: jnp.asarray(v, jnp.float32)
    return DynamicParams(
        temp=f(cfg.temp),
        top_k=jnp.asarray(cfg.top_k, jnp.int32),
        top_p=f(cfg.top_p),
        min_p=f(cfg.min_p),
        typical_p=f(cfg.typical_p),
        penalty_repeat=f(cfg.penalty_repeat),
        penalty_freq=f(cfg.penalty_freq),
        penalty_present=f(cfg.penalty_present),
        xtc_probability=f(cfg.xtc_probability),
    )


def make_dynamic_sampler(cfg: SamplerConfig):
    """Build sample(logits_f32[V], state, dp: DynamicParams) -> (tok, state).

    `cfg` supplies only the STATIC structure: the penalty ring size and the
    mirostat mode (mirostat stays a server-level setting; its chain shape
    differs structurally). All truncation/penalty/temperature knobs come
    from `dp` at run time. vmap over (logits, state, dp) for serving.
    """
    if cfg.mirostat:
        base = make_sampler(cfg)
        return lambda logits, st, dp: base(logits, st)

    def update_recent(st: SamplerState, tok: jnp.ndarray) -> SamplerState:
        n = st.recent.shape[0]
        return st._replace(
            recent=st.recent.at[st.recent_pos % n].set(tok),
            recent_pos=st.recent_pos + 1,
        )

    def sample(logits: jnp.ndarray, st: SamplerState, dp: DynamicParams):
        lf = logits.astype(jnp.float32)
        V = lf.shape[-1]

        # penalties — identity when repeat==1 and freq==present==0
        if cfg.penalty_last_n > 0:
            valid = st.recent >= 0
            count = jnp.zeros((V,), jnp.float32).at[
                jnp.where(valid, st.recent, 0)
            ].add(valid.astype(jnp.float32))
            present = (count > 0).astype(jnp.float32)
            lf = jnp.where(
                present > 0,
                jnp.where(lf > 0, lf / dp.penalty_repeat, lf * dp.penalty_repeat),
                lf,
            )
            lf = lf - count * dp.penalty_freq - present * dp.penalty_present

        greedy_tok = jnp.argmax(lf).astype(jnp.int32)

        key, k_dist, k_xtc = jax.random.split(st.key, 3)

        # top-k (dynamic k): kth-largest as cutoff
        sorted_desc = jnp.sort(lf)[::-1]
        k_idx = jnp.clip(dp.top_k - 1, 0, V - 1)
        kth = sorted_desc[k_idx]
        apply_k = (dp.top_k > 0) & (dp.top_k < V)
        lf = jnp.where(apply_k & (lf < kth), NEG_INF, lf)

        # typical — identity when p >= 1 (keep_n covers everything)
        probs = jax.nn.softmax(lf)
        ent = -jnp.sum(jnp.where(probs > 0, probs * jnp.log(probs + 1e-20), 0.0))
        shifted = jnp.abs(-jnp.log(probs + 1e-20) - ent)
        order = jnp.argsort(shifted)
        probs_sorted = probs[order]
        cum = jnp.cumsum(probs_sorted)
        keep_n = jnp.maximum(jnp.sum((cum - probs_sorted) < dp.typical_p), 1)
        rank = jnp.argsort(order)
        lf = jnp.where((dp.typical_p < 1.0) & (rank >= keep_n), NEG_INF, lf)

        # top-p
        sorted_desc = jnp.sort(lf)[::-1]
        probs = jax.nn.softmax(sorted_desc)
        cum = jnp.cumsum(probs)
        n_keep = jnp.maximum(jnp.sum(cum - probs < dp.top_p), 1)
        cutoff = sorted_desc[n_keep - 1]
        lf = jnp.where((dp.top_p < 1.0) & (lf < cutoff), NEG_INF, lf)

        # min-p
        max_l = jnp.max(lf)
        min_cut = max_l + jnp.log(jnp.maximum(dp.min_p, 1e-30))
        lf = jnp.where((dp.min_p > 0.0) & (lf < min_cut), NEG_INF, lf)

        # xtc — identity at probability 0
        probs = jax.nn.softmax(lf)
        above = probs >= cfg.xtc_threshold
        n_above = jnp.sum(above)
        min_above = jnp.min(jnp.where(above, probs, jnp.inf))
        u = jax.random.uniform(k_xtc)
        do_xtc = (u < dp.xtc_probability) & (n_above >= 2)
        lf = jnp.where(do_xtc & above & (probs > min_above), NEG_INF, lf)

        lf = lf / jnp.maximum(dp.temp, 1e-6)
        dist_tok = jax.random.categorical(k_dist, lf).astype(jnp.int32)
        tok = jnp.where(dp.temp <= 0.0, greedy_tok, dist_tok)
        st2 = st._replace(key=key)
        return tok, update_recent(st2, tok)

    return sample
