"""Qwen3-Next (gated delta net + gated attention hybrid MoE): HF
conversion + logit parity vs transformers' Qwen3NextForCausalLM, engine
generation. Ref: src/models/qwen3next.cpp."""

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
def hf_q3n(tmp_path_factory):
    from transformers import Qwen3NextConfig, Qwen3NextForCausalLM

    torch.manual_seed(0)
    cfg = Qwen3NextConfig(
        vocab_size=160,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        linear_key_head_dim=8,
        linear_value_head_dim=8,
        linear_num_key_heads=2,
        linear_num_value_heads=4,
        linear_conv_kernel_dim=4,
        num_experts=4,
        num_experts_per_tok=2,
        moe_intermediate_size=24,
        shared_expert_intermediate_size=32,
        decoder_sparse_step=1,
        mlp_only_layers=[],
        partial_rotary_factor=0.25,
        layer_types=["linear_attention", "full_attention",
                     "linear_attention", "full_attention"],
        use_cache=False,
        tie_word_embeddings=False,
    )
    model = Qwen3NextForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf") / "tiny-q3n"
    model.save_pretrained(str(d), safe_serialization=True)
    return d, model


def test_convert_and_logit_parity(hf_q3n, tmp_path):
    d, hf = hf_q3n
    out = tmp_path / "q3n.gguf"
    info = convert(str(d), str(out), out_type="f32")
    assert info["arch"] == "qwen3next"

    m = load_model(str(out), dtype=jnp.float32)
    cfg = m.config
    assert cfg.traits.ssm_hybrid
    assert cfg.n_head_kv_arr == (0, 2, 0, 2)
    assert cfg.ssm_d_state == 8 and cfg.ssm_n_group == 2
    assert cfg.ssm_dt_rank == 4 and cfg.ssm_d_inner == 32
    assert cfg.rope_dim == 4  # 0.25 * head_dim 16

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


def test_stepwise_matches_full(hf_q3n, tmp_path):
    d, _ = hf_q3n
    out = tmp_path / "q3n.gguf"
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


def test_engine_generates(hf_q3n, tmp_path):
    from sparkinfer_tpu.runtime.engine import Engine
    from sparkinfer_tpu.runtime.sampling import SamplerConfig

    d, _ = hf_q3n
    out = tmp_path / "q3n.gguf"
    convert(str(d), str(out), out_type="f32")
    eng = Engine(load_model(str(out), dtype=jnp.float32), max_seq=64,
                 sampler=SamplerConfig(temp=0.0), fused_chunk=0)
    toks = eng.generate([5, 9, 42], max_new_tokens=8)
    assert len(toks) == 8 and toks == eng.generate([5, 9, 42], max_new_tokens=8)
