"""Session save/restore: continuing from a restored state must produce the
same tokens as never having stopped (ref: examples/save-load-state)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.runtime.engine import Engine
from sparkinfer_tpu.runtime.sampling import SamplerConfig
from sparkinfer_tpu.runtime.state_io import load_state, save_state

from model_fixtures import make_tiny_llama


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny.gguf"
    make_tiny_llama(path)
    return load_model(str(path), dtype=jnp.float32)


def _run_chain(eng, prompt, k):
    """Run prefill + k decode steps manually; return (tokens, cache, sstate, n_past)."""
    cache = eng.new_cache()
    sstate = eng.new_sampler_state()
    tok, cache, sstate, n_past = eng.prefill(prompt, cache, sstate)
    toks = [tok]
    for _ in range(k):
        tok, cache, sstate = eng.decode_step(tok, n_past, cache, sstate)
        n_past += 1
        toks.append(tok)
    return toks, cache, sstate, n_past


def test_save_restore_continuation(model, tmp_path):
    eng = Engine(model, max_seq=64, sampler=SamplerConfig(temp=0.0),
                 kv_dtype=jnp.float32, donate_cache=False)
    prompt = [3, 14, 15, 92]

    # uninterrupted run: prefill + 8 steps
    full, *_ = _run_chain(eng, prompt, 8)

    # interrupted: prefill + 4 steps, save, restore in a new engine, continue
    part, cache, sstate, n_past = _run_chain(eng, prompt, 4)
    p = tmp_path / "sess.state"
    nbytes = eng.save_session(str(p), cache, n_past, sstate,
                              tokens=prompt + part)
    assert nbytes > 0

    eng2 = Engine(model, max_seq=64, sampler=SamplerConfig(temp=0.0),
                  kv_dtype=jnp.float32, donate_cache=False)
    cache2, n_past2, toks2, sstate2 = eng2.load_session(str(p))
    assert n_past2 == n_past
    assert toks2 == prompt + part
    tok = part[-1]
    cont = []
    for _ in range(4):
        tok, cache2, sstate2 = eng2.decode_step(tok, n_past2, cache2, sstate2)
        n_past2 += 1
        cont.append(tok)
    assert part + cont == full


def test_restore_rejects_wrong_model(model, tmp_path):
    eng = Engine(model, max_seq=64, sampler=SamplerConfig(temp=0.0),
                 kv_dtype=jnp.float32, donate_cache=False)
    _, cache, sstate, n_past = _run_chain(eng, [1, 2, 3], 2)
    p = tmp_path / "sess.state"
    eng.save_session(str(p), cache, n_past, sstate)

    other = tmp_path / "other.gguf"
    make_tiny_llama(other, n_layer=3)
    m2 = load_model(str(other), dtype=jnp.float32)
    eng2 = Engine(m2, max_seq=64, kv_dtype=jnp.float32)
    with pytest.raises(ValueError, match="different model"):
        eng2.load_session(str(p))


def test_quantized_cache_roundtrip(model, tmp_path):
    eng = Engine(model, max_seq=64, sampler=SamplerConfig(temp=0.0),
                 kv_quantized=True, donate_cache=False)
    full, *_ = _run_chain(eng, [5, 6, 7], 6)
    part, cache, sstate, n_past = _run_chain(eng, [5, 6, 7], 3)
    p = tmp_path / "q.state"
    eng.save_session(str(p), cache, n_past, sstate)
    cache2, n_past2, _, sstate2 = eng.load_session(str(p))
    tok = part[-1]
    cont = []
    for _ in range(3):
        tok, cache2, sstate2 = eng.decode_step(tok, n_past2, cache2, sstate2)
        n_past2 += 1
        cont.append(tok)
    assert part + cont == full
