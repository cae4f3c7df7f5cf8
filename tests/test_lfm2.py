"""LFM2 (gated short-conv + attention hybrid): HF conversion + logit
parity vs transformers' Lfm2ForCausalLM, engine generation.
Ref: src/models/lfm2.cpp build_shortconv_block/build_attn_block."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

from sparkinfer_tpu.models.hybrid import (init_hybrid_cache,
                                          make_hybrid_forward)
from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.tools.convert_hf import convert


@pytest.fixture(scope="module")
def hf_lfm2(tmp_path_factory):
    from transformers import Lfm2Config, Lfm2ForCausalLM

    torch.manual_seed(0)
    cfg = Lfm2Config(
        vocab_size=160,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        conv_L_cache=3,
        layer_types=["conv", "full_attention", "conv"],
        tie_word_embeddings=False,
        use_cache=False,
    )
    model = Lfm2ForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf") / "tiny-lfm2"
    model.save_pretrained(str(d), safe_serialization=True)
    return d, model


def test_convert_and_logit_parity(hf_lfm2, tmp_path):
    d, hf = hf_lfm2
    out = tmp_path / "lfm2.gguf"
    info = convert(str(d), str(out), out_type="f32")
    assert info["arch"] == "lfm2"

    m = load_model(str(out), dtype=jnp.float32)
    cfg = m.config
    assert cfg.traits.ssm_hybrid and cfg.shortconv_l_cache == 3
    assert cfg.n_head_kv_arr == (0, 2, 0)

    ids = np.array([[3, 17, 42, 9, 77, 120, 5]], np.int32)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids, dtype=torch.long)).logits.numpy()

    fwd = jax.jit(make_hybrid_forward(cfg))
    cache = init_hybrid_cache(cfg, 1, 16, jnp.float32)
    logits, _ = fwd(m.params, jnp.asarray(ids),
                    jnp.arange(7, dtype=jnp.int32)[None], cache)
    mine = np.asarray(logits)
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, rtol=2e-3, atol=2e-3)


def test_stepwise_matches_full(hf_lfm2, tmp_path):
    d, _ = hf_lfm2
    out = tmp_path / "lfm2.gguf"
    convert(str(d), str(out), out_type="f32")
    m = load_model(str(out), dtype=jnp.float32)
    cfg = m.config
    fwd = jax.jit(make_hybrid_forward(cfg))

    ids = np.array([[11, 4, 88, 151, 2, 66]], np.int32)
    T = ids.shape[1]
    full, _ = fwd(m.params, jnp.asarray(ids),
                  jnp.arange(T, dtype=jnp.int32)[None],
                  init_hybrid_cache(cfg, 1, 16, jnp.float32))
    cache = init_hybrid_cache(cfg, 1, 16, jnp.float32)
    steps = []
    for t in range(T):
        lg, cache = fwd(m.params, jnp.asarray(ids[:, t : t + 1]),
                        jnp.full((1, 1), t, jnp.int32), cache)
        steps.append(np.asarray(lg)[0, 0])
    np.testing.assert_allclose(np.stack(steps), np.asarray(full)[0],
                               rtol=2e-4, atol=2e-4)


def test_engine_generates(hf_lfm2, tmp_path):
    from sparkinfer_tpu.runtime.engine import Engine
    from sparkinfer_tpu.runtime.sampling import SamplerConfig

    d, _ = hf_lfm2
    out = tmp_path / "lfm2.gguf"
    convert(str(d), str(out), out_type="f32")
    eng = Engine(load_model(str(out), dtype=jnp.float32), max_seq=64,
                 sampler=SamplerConfig(temp=0.0), fused_chunk=0)
    toks = eng.generate([5, 9, 42], max_new_tokens=8)
    assert len(toks) == 8 and toks == eng.generate([5, 9, 42], max_new_tokens=8)
