"""Speculative decoding: greedy output must be IDENTICAL to target-only
decoding regardless of the draft model (the core speculative invariant);
self-drafting accepts everything."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.runtime.engine import Engine
from sparkinfer_tpu.runtime.sampling import SamplerConfig
from sparkinfer_tpu.runtime.speculative import SpeculativeEngine

from model_fixtures import make_tiny_llama


@pytest.fixture(scope="module")
def target_model(tmp_path_factory):
    p = tmp_path_factory.mktemp("models") / "target.gguf"
    make_tiny_llama(p, seed=0)
    return load_model(str(p), dtype=jnp.float32)


@pytest.fixture(scope="module")
def draft_model(tmp_path_factory):
    # different weights -> imperfect draft
    p = tmp_path_factory.mktemp("models") / "draft.gguf"
    make_tiny_llama(p, seed=9, n_layer=1)
    return load_model(str(p), dtype=jnp.float32)


def _eng(model):
    return Engine(model, max_seq=64, sampler=SamplerConfig(temp=0.0),
                  kv_dtype=jnp.float32, donate_cache=False)


def test_self_draft_accepts_everything(target_model):
    t = _eng(target_model)
    d = _eng(target_model)
    spec = SpeculativeEngine(t, d, n_draft=4)
    want = t.generate([3, 14, 15], max_new_tokens=12)
    got = spec.generate([3, 14, 15], max_new_tokens=12)
    assert got == want
    assert spec.stats.accept_rate == 1.0


def test_imperfect_draft_still_exact(target_model, draft_model):
    t = _eng(target_model)
    d = _eng(draft_model)
    spec = SpeculativeEngine(t, d, n_draft=3)
    want = t.generate([7, 30, 99], max_new_tokens=10)
    got = spec.generate([7, 30, 99], max_new_tokens=10)
    assert got == want  # greedy speculative is lossless
    assert spec.stats.n_rounds > 0


def test_stochastic_speculative_runs(target_model, draft_model):
    t = Engine(target_model, max_seq=64, sampler=SamplerConfig(temp=0.8, seed=3),
               kv_dtype=jnp.float32, donate_cache=False)
    d = _eng(draft_model)
    spec = SpeculativeEngine(t, d, n_draft=3)
    out = spec.generate([7, 30], max_new_tokens=8, seed=3)
    assert 1 <= len(out) <= 8
    assert all(0 <= x < target_model.config.n_vocab for x in out)


def test_sparse_target_speculative(tmp_path):
    """Sparse target + dense draft (ref: examples/speculative inits spif for
    the target/draft pair) — greedy lossless still holds."""
    from sparkinfer_tpu.sparse import SparseConfig

    p1 = tmp_path / "sp-target.gguf"
    make_tiny_llama(p1, arch="prosparse_llama", pred_rank=8, n_ff=96, seed=5)
    target = load_model(str(p1), dtype=jnp.float32)
    p2 = tmp_path / "draft.gguf"
    make_tiny_llama(p2, seed=9, n_layer=1)
    draft = load_model(str(p2), dtype=jnp.float32)

    scfg = SparseConfig(group_size=16, capacity_groups=4)
    t = Engine(target, max_seq=64, sampler=SamplerConfig(temp=0.0),
               kv_dtype=jnp.float32, donate_cache=False,
               sparse=scfg, sparse_decode_mode="gather", sparse_pipelined=False)
    d = _eng(draft)
    spec = SpeculativeEngine(t, d, n_draft=3)
    want = t.generate([7, 30, 99], max_new_tokens=8)
    got = spec.generate([7, 30, 99], max_new_tokens=8)
    assert got == want
