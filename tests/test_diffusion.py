"""Diffusion-LM generation (ref examples/diffusion): iterative unmasking
mechanics on a tiny model — schedules, algorithms, determinism."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.runtime.diffusion import ALGORITHMS, DiffusionConfig, DiffusionEngine

from model_fixtures import make_tiny_llama


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = tmp_path_factory.mktemp("m") / "t.gguf"
    make_tiny_llama(p)
    return load_model(str(p), dtype=jnp.float32)


MASK = 198  # n_vocab-1 default fallback


def test_all_positions_unmask(model):
    eng = DiffusionEngine(model, DiffusionConfig(steps=8))
    out = eng.generate([5, 9, 3], max_new_tokens=12)
    assert len(out) == 12
    assert all(t != eng.mask_id for t in out)


@pytest.mark.parametrize("alg", ALGORITHMS)
def test_algorithms_run(model, alg):
    eng = DiffusionEngine(model, DiffusionConfig(steps=4, algorithm=alg))
    out = eng.generate([5, 9], max_new_tokens=8)
    assert len(out) == 8 and all(t != eng.mask_id for t in out)


def test_block_schedule_left_to_right(model):
    """LLaDA block schedule: the first block fully resolves before the
    second block starts (observed via on_step snapshots)."""
    eng = DiffusionEngine(
        model, DiffusionConfig(steps=4, schedule="block", block_length=4))
    snaps = []
    out = eng.generate([5], max_new_tokens=8, on_step=lambda t: snaps.append(t.copy()))
    assert len(out) == 8 and all(t != eng.mask_id for t in out)
    # find the first snapshot where block 1 (positions 1..4) is done;
    # block 2 (positions 5..8) must still be fully masked there
    for t in snaps:
        if (t[1:5] != eng.mask_id).all():
            assert (t[5:9] == eng.mask_id).all()
            break
    else:
        pytest.fail("block 1 never fully resolved")


def test_deterministic_and_prompt_preserved(model):
    eng = DiffusionEngine(model, DiffusionConfig(steps=6, seed=7))
    a = eng.generate([5, 9, 3], max_new_tokens=10)
    b = eng.generate([5, 9, 3], max_new_tokens=10)
    assert a == b


def test_temp_sampling_varies_with_seed(model):
    outs = {
        tuple(DiffusionEngine(model, DiffusionConfig(steps=4, temp=1.5, seed=s))
              .generate([5], max_new_tokens=8))
        for s in (1, 2, 3)
    }
    assert len(outs) > 1


def test_mask_id_sources(model, tmp_path):
    """mask_token_id precedence: explicit config > GGUF metadata > n_vocab-1."""
    eng = DiffusionEngine(model, DiffusionConfig(steps=2, mask_token_id=7))
    assert eng.mask_id == 7
    assert DiffusionEngine(model, DiffusionConfig(steps=2)).mask_id == MASK

    # GGUF metadata path: a vocab-bearing model with tokenizer.ggml.mask_token_id
    p = tmp_path / "mask.gguf"
    make_tiny_llama(p, n_vocab=300, with_vocab=True,
                    extra_kv={"tokenizer.ggml.mask_token_id": 13})
    m2 = load_model(str(p), dtype=jnp.float32)
    if getattr(m2.vocab, "mask_id", -1) == 13:  # fixture supports extra_kv
        assert DiffusionEngine(m2, DiffusionConfig(steps=2)).mask_id == 13
