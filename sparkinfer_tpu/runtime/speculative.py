"""Speculative decoding — draft-model token proposal + target verification.

Ref: common/speculative.{h,cpp} (common_speculative_gen_draft) and
examples/speculative — including the SparkInfer-aware pairing where target
and draft can both run sparse (examples/speculative/speculative.cpp:89-98).

TPU design: the draft proposes K tokens with K single-token decode steps;
the target then scores all K+1 positions in ONE forward (static K => one
compile). Acceptance:
  - greedy (temp==0): accept while target argmax == draft proposal —
    output provably identical to target-only greedy decoding (tested);
  - stochastic: standard speculative sampling — accept d_i with prob
    min(1, p_t(d_i)/p_d(d_i)); on rejection sample from the residual
    normalize(max(0, p_t - p_d)).

No KV rollback machinery is needed: rejected positions' cache rows are
masked by the causal mask until legitimately overwritten (the same
static-shape trick the prefill padding uses).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .engine import Engine


@dataclass
class SpecStats:
    n_rounds: int = 0
    n_drafted: int = 0
    n_accepted: int = 0

    @property
    def accept_rate(self) -> float:
        return self.n_accepted / self.n_drafted if self.n_drafted else 0.0


class SpeculativeEngine:
    """Wraps a target Engine + draft Engine (both batch=1)."""

    def __init__(self, target: Engine, draft: Engine, n_draft: int = 5):
        assert target.batch == 1 and draft.batch == 1
        self.target = target
        self.draft = draft
        self.n_draft = n_draft
        self.stats = SpecStats()
        self._verify = jax.jit(self._verify_impl)
        self._draft_step = jax.jit(draft.fwd_decode, donate_argnums=(3,))

    def _verify_impl(self, params, tokens, positions, cache):
        logits, cache = self.target.fwd_decode(params, tokens, positions, cache)
        return logits, cache

    def generate(
        self,
        prompt_tokens: list[int],
        max_new_tokens: int = 128,
        stop_ids: set[int] | None = None,
        seed: int | None = None,
    ) -> list[int]:
        stop_ids = stop_ids or set()
        K = self.n_draft
        t, d = self.target, self.draft
        greedy = t.sampler_cfg.greedy

        t_cache = t.new_cache()
        t_state = t.new_sampler_state(seed)
        d_cache = d.new_cache()
        d_state = d.new_sampler_state(seed)

        # prefill both on the prompt; target's sampled token is authoritative
        tok, t_cache, t_state, n_past = t.prefill(prompt_tokens, t_cache, t_state)
        _, d_cache, d_state, _ = d.prefill(prompt_tokens, d_cache, d_state)

        out: list[int] = []
        key = jax.random.PRNGKey(seed if seed is not None else t.sampler_cfg.seed)

        while len(out) < max_new_tokens and tok not in stop_ids:
            out.append(tok)
            if len(out) >= max_new_tokens:
                break

            # --- draft K tokens --------------------------------------------
            # greedy target: greedy draft (acceptance is an argmax match).
            # stochastic target: the draft must be SAMPLED from the draft
            # distribution — min(1, p_t/p_d) acceptance is only lossless
            # for drafts drawn from p_d (the round-1 greedy draft biased
            # the emitted distribution).
            drafts: list[int] = []
            d_tok = tok
            d_pos = n_past
            d_probs = []
            for _ in range(K):
                lg, d_cache = self._draft_step(
                    d.model.params,
                    jnp.full((1, 1), d_tok, jnp.int32),
                    jnp.full((1, 1), d_pos, jnp.int32),
                    d_cache,
                )
                lgv = lg[0, -1]
                if greedy:
                    d_tok = int(jnp.argmax(lgv))
                else:
                    key, kd = jax.random.split(key)
                    d_tok = int(jax.random.categorical(kd, lgv))
                    d_probs.append(np.asarray(jax.nn.softmax(lgv)))
                drafts.append(d_tok)
                d_pos += 1

            # --- target verifies all K+1 positions in one forward -----------
            seq = [tok] + drafts
            pos = jnp.arange(n_past, n_past + K + 1, dtype=jnp.int32)[None]
            logits, t_cache = self._verify(
                t.model.params, jnp.asarray(seq, jnp.int32)[None], pos, t_cache
            )
            logits = logits[0]  # (K+1, V)

            if greedy:
                t_toks = np.asarray(jnp.argmax(logits, axis=-1))
                n_acc = 0
                while n_acc < K and t_toks[n_acc] == drafts[n_acc]:
                    n_acc += 1
                accepted = drafts[:n_acc]
                next_tok = int(t_toks[n_acc])
            else:
                t_probs = np.asarray(jax.nn.softmax(logits, axis=-1))
                accepted = []
                n_acc = 0
                next_tok = None
                for i, di in enumerate(drafts):
                    key, k1, k2 = jax.random.split(key, 3)
                    pt = t_probs[i, di]
                    pd = max(d_probs[i][di], 1e-20)
                    if float(jax.random.uniform(k1)) < min(1.0, pt / pd):
                        accepted.append(di)
                        n_acc += 1
                    else:
                        resid = np.maximum(t_probs[i] - d_probs[i], 0.0)
                        s = resid.sum()
                        if s <= 0:
                            resid = t_probs[i]
                            s = resid.sum()
                        resid = resid / s
                        next_tok = int(
                            jax.random.choice(k2, resid.shape[0], p=jnp.asarray(resid))
                        )
                        break
                if next_tok is None:
                    key, k3 = jax.random.split(key)
                    next_tok = int(
                        jax.random.categorical(k3, jnp.asarray(np.log(t_probs[K] + 1e-20)))
                    )

            self.stats.n_rounds += 1
            self.stats.n_drafted += K
            self.stats.n_accepted += n_acc

            # emit accepted drafts (respecting stop/max limits)
            for a in accepted:
                if len(out) >= max_new_tokens or a in stop_ids:
                    return out
                out.append(a)

            if n_acc == K:
                # full accept: the draft proposed d_K but never consumed it,
                # so its KV row at n_past+K is missing — feed it now (the
                # partial-accept case needs nothing: every accepted token was
                # consumed during drafting, and rejected rows are masked
                # until overwritten).
                _, d_cache = self._draft_step(
                    d.model.params,
                    jnp.full((1, 1), drafts[-1], jnp.int32),
                    jnp.full((1, 1), n_past + K, jnp.int32),
                    d_cache,
                )
            n_past += n_acc + 1
            tok = next_tok

        return out
