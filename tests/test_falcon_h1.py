"""Falcon-H1 (parallel attention + mamba2 in every layer): HF conversion +
logit parity vs transformers' FalconH1ForCausalLM, engine generation.
Ref: src/models/falcon-h1.cpp (attn_out + ssm_out summed per layer)."""

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
def hf_fh1(tmp_path_factory):
    from transformers import FalconH1Config, FalconH1ForCausalLM

    torch.manual_seed(0)
    cfg = FalconH1Config(
        vocab_size=160,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=8,
        mamba_d_ssm=64,
        mamba_n_heads=8,
        mamba_d_head=8,
        mamba_n_groups=1,
        mamba_d_state=16,
        mamba_d_conv=4,
        mamba_rms_norm=True,
        mamba_chunk_size=8,
        # exercise the multiplier baking (FalconH1Model.modify_tensors)
        attention_in_multiplier=0.9,
        attention_out_multiplier=1.1,
        key_multiplier=0.8,
        ssm_in_multiplier=1.2,
        ssm_out_multiplier=0.7,
        mlp_multipliers=[1.3, 0.6],
        ssm_multipliers=[1.05, 0.95, 1.1, 0.9, 1.02],
        embedding_multiplier=2.0,
        lm_head_multiplier=0.5,
        tie_word_embeddings=False,
        use_cache=False,
    )
    model = FalconH1ForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf") / "tiny-fh1"
    model.save_pretrained(str(d), safe_serialization=True)
    return d, model


def test_convert_and_logit_parity(hf_fh1, tmp_path):
    d, hf = hf_fh1
    out = tmp_path / "fh1.gguf"
    info = convert(str(d), str(out), out_type="f32")
    assert info["arch"] == "falcon-h1"

    m = load_model(str(out), dtype=jnp.float32)
    cfg = m.config
    assert cfg.traits.hybrid_parallel and cfg.traits.ssm_hybrid
    assert cfg.ssm_n_group == 1 and cfg.ssm_d_inner == 64
    assert cfg.head_dim == 8 and cfg.n_head_kv == 2

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


def test_stepwise_matches_full(hf_fh1, tmp_path):
    d, _ = hf_fh1
    out = tmp_path / "fh1.gguf"
    convert(str(d), str(out), out_type="f32")
    m = load_model(str(out), dtype=jnp.float32)
    cfg = m.config
    fwd = jax.jit(make_hybrid_forward(cfg))

    ids = np.array([[11, 4, 88, 151, 2]], np.int32)
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


def test_engine_generates(hf_fh1, tmp_path):
    from sparkinfer_tpu.runtime.engine import Engine
    from sparkinfer_tpu.runtime.sampling import SamplerConfig

    d, _ = hf_fh1
    out = tmp_path / "fh1.gguf"
    convert(str(d), str(out), out_type="f32")
    eng = Engine(load_model(str(out), dtype=jnp.float32), max_seq=64,
                 sampler=SamplerConfig(temp=0.0), fused_chunk=0)
    toks = eng.generate([5, 9, 42], max_new_tokens=8)
    assert len(toks) == 8 and toks == eng.generate([5, 9, 42], max_new_tokens=8)
