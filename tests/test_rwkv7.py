"""RWKV7 (Goose): GGUF load + logit parity vs the numpy oracle (math
transcribed from ggml_compute_forward_rwkv_wkv7_f32 +
src/models/rwkv7-base.cpp), stepwise decode vs full-sequence state
consistency, and Engine generation. transformers has no Rwkv7 class, so
the oracle plays the role the CPU backend plays in the reference's
test-backend-ops."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from model_fixtures import make_tiny_rwkv7, ref_rwkv7_forward
from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.models.rwkv7 import (
    init_rwkv7_cache,
    make_rwkv7_forward,
)

HS = 8


@pytest.fixture(scope="module")
def rwkv7_model(tmp_path_factory):
    p = tmp_path_factory.mktemp("rwkv7") / "tiny.gguf"
    raw = make_tiny_rwkv7(p, head_size=HS)
    model = load_model(str(p), dtype=jnp.float32)
    return model, raw


def test_config_and_load(rwkv7_model):
    model, _ = rwkv7_model
    cfg = model.config
    assert cfg.traits.recurrent and cfg.traits.wkv_version == 7
    assert cfg.wkv_head_size == HS
    layers = model.params["layers"]
    assert layers["lerp_fused"].shape == (cfg.n_layer, 6, cfg.n_embd)
    assert layers["tm_w1"].shape[1] == cfg.n_embd  # (L, E, dr)


def test_logit_parity_vs_oracle(rwkv7_model):
    model, raw = rwkv7_model
    cfg = model.config
    rng = np.random.default_rng(3)
    toks = rng.integers(0, cfg.n_vocab, 7).astype(np.int32)

    ref, _ = ref_rwkv7_forward(raw, toks, n_layer=cfg.n_layer, head_size=HS)

    fwd = jax.jit(make_rwkv7_forward(cfg))
    cache = init_rwkv7_cache(cfg, 1)
    got, _ = fwd(model.params, jnp.asarray(toks)[None], None, cache)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=2e-4, atol=2e-4)


def test_stepwise_matches_full(rwkv7_model):
    """Decode one token at a time (carrying state) must equal the full
    parallel prefill — the recurrent-state analogue of KV-cache parity."""
    model, _ = rwkv7_model
    cfg = model.config
    rng = np.random.default_rng(5)
    toks = rng.integers(0, cfg.n_vocab, 6).astype(np.int32)

    fwd = jax.jit(make_rwkv7_forward(cfg))
    cache = init_rwkv7_cache(cfg, 1)
    full, cache_full = fwd(model.params, jnp.asarray(toks)[None], None, cache)

    cache = init_rwkv7_cache(cfg, 1)
    outs = []
    for tok in toks:
        lg, cache = fwd(model.params, jnp.asarray([[tok]]), None, cache)
        outs.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(
        np.stack(outs), np.asarray(full[0]), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(cache.wkv), np.asarray(cache_full.wkv), rtol=2e-4, atol=2e-4
    )


def test_padding_invariance(rwkv7_model):
    """Trailing -1 padding must not perturb logits or carried state."""
    model, _ = rwkv7_model
    cfg = model.config
    toks = np.array([5, 11, 42], np.int32)
    fwd = jax.jit(make_rwkv7_forward(cfg))
    a, ca = fwd(model.params, jnp.asarray(toks)[None], None,
                init_rwkv7_cache(cfg, 1))
    padded = np.concatenate([toks, -np.ones(3, np.int32)])
    b, cb = fwd(model.params, jnp.asarray(padded)[None], None,
                init_rwkv7_cache(cfg, 1))
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0, :3]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ca.wkv), np.asarray(cb.wkv),
                               rtol=1e-5, atol=1e-5)


def test_engine_generation(rwkv7_model, tmp_path):
    model, _ = rwkv7_model
    from sparkinfer_tpu.runtime.engine import Engine
    from sparkinfer_tpu.runtime.sampling import SamplerConfig

    eng = Engine(model, max_seq=64, sampler=SamplerConfig(temp=0.0))
    out = eng.generate([5, 9, 42], max_new_tokens=8)
    assert len(out) == 8
    out2 = eng.generate([5, 9, 42], max_new_tokens=8)
    assert out == out2
