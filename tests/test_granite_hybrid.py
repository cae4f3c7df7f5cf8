"""GraniteMoeHybrid (granite 4.0: interleaved mamba2/attention + fused MoE
+ shared expert + granite multipliers): HF conversion + logit parity,
engine generation. Ref: src/models/granite-hybrid.cpp."""

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
def hf_gh(tmp_path_factory):
    from transformers import (GraniteMoeHybridConfig,
                              GraniteMoeHybridForCausalLM)

    torch.manual_seed(0)
    cfg = GraniteMoeHybridConfig(
        vocab_size=160,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=3,
        num_experts_per_tok=2,
        shared_intermediate_size=40,
        mamba_d_state=16,
        mamba_d_conv=4,
        mamba_expand=2,
        mamba_n_heads=8,
        mamba_n_groups=1,
        layer_types=["mamba", "attention", "mamba"],
        embedding_multiplier=2.0,
        residual_multiplier=0.9,
        logits_scaling=3.0,
        attention_multiplier=0.1,
        tie_word_embeddings=False,
        use_cache=False,
    )
    model = GraniteMoeHybridForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf") / "tiny-gh"
    model.save_pretrained(str(d), safe_serialization=True)
    return d, model


def test_convert_and_logit_parity(hf_gh, tmp_path):
    d, hf = hf_gh
    out = tmp_path / "gh.gguf"
    info = convert(str(d), str(out), out_type="f32")
    assert info["arch"] == "granitehybrid"

    m = load_model(str(out), dtype=jnp.float32)
    cfg = m.config
    assert cfg.traits.ssm_hybrid and not cfg.traits.hybrid_parallel
    assert cfg.n_head_kv_arr == (0, 2, 0)
    assert cfg.ssm_n_group == 1 and cfg.n_expert == 3
    assert cfg.expert_gating == "softmax_topk"
    assert cfg.attn_scale == pytest.approx(0.1)

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


def test_stepwise_matches_full(hf_gh, tmp_path):
    d, _ = hf_gh
    out = tmp_path / "gh.gguf"
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


def test_engine_generates(hf_gh, tmp_path):
    from sparkinfer_tpu.runtime.engine import Engine
    from sparkinfer_tpu.runtime.sampling import SamplerConfig

    d, _ = hf_gh
    out = tmp_path / "gh.gguf"
    convert(str(d), str(out), out_type="f32")
    eng = Engine(load_model(str(out), dtype=jnp.float32), max_seq=64,
                 sampler=SamplerConfig(temp=0.0), fused_chunk=0)
    toks = eng.generate([5, 9, 42], max_new_tokens=8)
    assert len(toks) == 8 and toks == eng.generate([5, 9, 42], max_new_tokens=8)
