"""Finetuning (ggml-opt parity): loss decreases when overfitting a tiny
corpus; trainable-subset masking freezes the rest; finetuned model actually
changes its generations toward the data."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.training import FinetuneConfig, finetune, make_train_step

from model_fixtures import make_tiny_llama


@pytest.fixture()
def model(tmp_path):
    path = tmp_path / "tiny.gguf"
    make_tiny_llama(path)
    return load_model(str(path), dtype=jnp.float32)


def test_overfit_reduces_loss(model):
    rng = np.random.default_rng(0)
    # a strongly repetitive corpus to overfit
    corpus = np.tile(np.asarray([5, 9, 42, 7], np.int32), 64)
    ft = FinetuneConfig(lr=3e-3, seq_len=16, batch=2, epochs=4)
    hist = finetune(model, corpus, ft, max_steps=20)
    assert hist["steps"] >= 10
    first = np.mean(hist["losses"][:3])
    last = np.mean(hist["losses"][-3:])
    assert last < first * 0.7, (first, last)


def test_sgd_optimizer_and_masking(model):
    ft = FinetuneConfig(optimizer="sgd", lr=1e-2, seq_len=16, batch=2,
                        trainable="ffn")
    step, opt = make_train_step(model.config, ft)
    params = model.params
    opt_state = opt.init(params)
    toks = jnp.asarray(np.tile([1, 2, 3, 4], 4)[None].repeat(2, 0), jnp.int32)
    mask = jnp.ones_like(toks)
    before_wq = np.asarray(params["layers"]["wq"])
    before_up = np.asarray(params["layers"]["w_up"])
    params2, _, loss = step(params, opt_state, toks, mask)
    assert np.isfinite(float(loss))
    # attention weights frozen; FFN weights moved
    np.testing.assert_array_equal(np.asarray(params2["layers"]["wq"]), before_wq)
    assert np.abs(np.asarray(params2["layers"]["w_up"]) - before_up).max() > 0


def test_finetune_changes_generation(model):
    from sparkinfer_tpu.runtime.engine import Engine
    from sparkinfer_tpu.runtime.sampling import SamplerConfig

    eng = Engine(model, max_seq=64, sampler=SamplerConfig(temp=0.0),
                 kv_dtype=jnp.float32, donate_cache=False)
    before = eng.generate([5, 9], max_new_tokens=6)
    corpus = np.tile(np.asarray([5, 9, 42, 7], np.int32), 64)
    finetune(model, corpus, FinetuneConfig(lr=5e-3, seq_len=16, batch=2, epochs=3),
             max_steps=25)
    eng2 = Engine(model, max_seq=64, sampler=SamplerConfig(temp=0.0),
                  kv_dtype=jnp.float32, donate_cache=False)
    after = eng2.generate([5, 9], max_new_tokens=6)
    assert after != before
    # overfit pattern 5,9 -> 42,7,5,9...
    assert after[0] == 42, after
