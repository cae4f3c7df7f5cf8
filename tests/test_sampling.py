"""Sampler chain semantics (ref: src/llama-sampling.cpp + test-sampling.cpp)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sparkinfer_tpu.runtime.sampling import (
    SamplerConfig,
    _apply_penalties,
    _min_p_mask,
    _top_k_mask,
    _top_p_mask,
    _typical_mask,
    init_state,
    make_sampler,
)

NEG = -1e29


def _logits(vals):
    return jnp.asarray(vals, jnp.float32)


def test_greedy_is_argmax():
    cfg = SamplerConfig(temp=0.0)
    sample = jax.jit(make_sampler(cfg))
    st = init_state(cfg)
    tok, st2 = sample(_logits([0.1, 3.0, -1.0, 2.9]), st)
    assert int(tok) == 1
    assert int(st2.recent[0]) == 1


def test_top_k_masks_all_but_k():
    out = np.asarray(_top_k_mask(_logits([1.0, 5.0, 3.0, 4.0, 2.0]), 2))
    assert (out > NEG).sum() == 2
    assert out[1] == 5.0 and out[3] == 4.0


def test_top_p_keeps_minimal_nucleus():
    # probs ~ [0.643, 0.237, 0.087, 0.032] for logits [3,2,1,0]
    out = np.asarray(_top_p_mask(_logits([3.0, 2.0, 1.0, 0.0]), 0.7))
    # cumsum-probs: 0.643 < 0.7 -> keep; 0.88 crosses -> keep (first crossing kept)
    assert (out > NEG).sum() == 2
    out = np.asarray(_top_p_mask(_logits([3.0, 2.0, 1.0, 0.0]), 0.5))
    assert (out > NEG).sum() == 1


def test_min_p_scales_with_max():
    out = np.asarray(_min_p_mask(_logits([0.0, np.log(0.5), np.log(0.01)]), 0.1))
    # keep p >= 0.1 * p_max: tokens 0 and 1
    assert (out > NEG).tolist() == [True, True, False]


def test_typical_keeps_at_least_one():
    out = np.asarray(_typical_mask(_logits([5.0, 0.0, 0.0, 0.0]), 0.2))
    assert (out > NEG).sum() >= 1


def test_penalties_repeat_and_freq():
    cfg = SamplerConfig(penalty_repeat=2.0, penalty_freq=0.5, penalty_present=0.1, penalty_last_n=8)
    st = init_state(cfg)
    # token 2 seen twice
    st = st._replace(recent=st.recent.at[0].set(2).at[1].set(2), recent_pos=jnp.asarray(2))
    lf = np.asarray(_apply_penalties(cfg, _logits([1.0, -1.0, 2.0]), st))
    assert lf[0] == 1.0 and lf[1] == -1.0
    # 2.0/2 - 2*0.5 - 0.1 = -0.1
    np.testing.assert_allclose(lf[2], -0.1, atol=1e-6)
    # negative logits get multiplied
    st2 = init_state(cfg)._replace(recent=init_state(cfg).recent.at[0].set(1))
    lf2 = np.asarray(_apply_penalties(cfg, _logits([1.0, -1.0, 2.0]), st2))
    np.testing.assert_allclose(lf2[1], -1.0 * 2.0 - 0.5 - 0.1, atol=1e-6)


def test_sampling_reproducible_and_restricted():
    cfg = SamplerConfig(temp=0.7, top_k=3, seed=123)
    sample = jax.jit(make_sampler(cfg))
    logits = _logits([0.0, 1.0, 5.0, 4.0, 4.5, -2.0])
    toks = set()
    st = init_state(cfg)
    for _ in range(50):
        tok, st = sample(logits, st)
        toks.add(int(tok))
    assert toks <= {2, 3, 4}
    # same seed -> same sequence
    st1, st2 = init_state(cfg), init_state(cfg)
    seq1, seq2 = [], []
    for _ in range(10):
        t1, st1 = sample(logits, st1)
        t2, st2 = sample(logits, st2)
        seq1.append(int(t1))
        seq2.append(int(t2))
    assert seq1 == seq2


def test_mirostat_v2_runs_and_tracks_mu():
    cfg = SamplerConfig(temp=1.0, mirostat=2, seed=7)
    sample = jax.jit(make_sampler(cfg))
    st = init_state(cfg)
    logits = _logits(np.random.default_rng(0).standard_normal(64))
    mus = []
    for _ in range(20):
        tok, st = sample(logits, st)
        assert 0 <= int(tok) < 64
        mus.append(float(st.mirostat_mu))
    assert mus[-1] != mus[0]  # mu adapts


def test_vmap_over_slots():
    cfg = SamplerConfig(temp=0.0)
    sample = make_sampler(cfg)
    sts = jax.tree.map(
        lambda *xs: jnp.stack(xs), init_state(cfg, 0), init_state(cfg, 1)
    )
    logits = jnp.stack([_logits([1.0, 2.0]), _logits([2.0, 1.0])])
    toks, _ = jax.jit(jax.vmap(sample))(logits, sts)
    assert np.asarray(toks).tolist() == [1, 0]
