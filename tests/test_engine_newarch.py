"""Engine integration for the round-2 architecture wave: the family
parity tests drive make_forward directly; these drive the full Engine
(bucketed prefill, fused/unfused decode, cache plumbing) on converted
tiny checkpoints of the structurally-novel families — gemma3 (SWA
pattern + dual rope base), gpt-oss (sinks + MoE), deepseek2 (MLA latent
cache + heterogeneous segments)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.runtime.engine import Engine
from sparkinfer_tpu.runtime.sampling import SamplerConfig
from sparkinfer_tpu.tools.convert_hf import convert


def _mk(tmp_path, cls_name, cfg_kw):
    import transformers as T

    torch.manual_seed(0)
    cls = getattr(T, cls_name)
    cfgcls = getattr(T, cfg_kw.pop("_config"))
    hf = cls(cfgcls(**cfg_kw))
    hf.eval()
    d = tmp_path / "hf"
    hf.save_pretrained(str(d), safe_serialization=True)
    out = tmp_path / "m.gguf"
    convert(str(d), str(out), out_type="f32")
    return load_model(str(out), dtype=jnp.float32)


BASE = dict(vocab_size=160, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128)

CASES = {
    "gemma3": dict(_config="Gemma3TextConfig", **{**BASE,
                   "num_hidden_layers": 7, "head_dim": 16,
                   "query_pre_attn_scalar": 16, "sliding_window": 16,
                   "rope_theta": 1000000.0, "rope_local_base_freq": 10000.0}),
    "gpt-oss": dict(_config="GptOssConfig", **{**BASE,
                    "num_hidden_layers": 3, "head_dim": 16,
                    "intermediate_size": 64, "num_local_experts": 4,
                    "num_experts_per_tok": 2, "sliding_window": 16,
                    "rope_scaling": None}),
    "deepseek2": dict(_config="DeepseekV2Config", **{**BASE,
                      "num_hidden_layers": 3, "q_lora_rank": None,
                      "kv_lora_rank": 32, "qk_nope_head_dim": 16,
                      "qk_rope_head_dim": 8, "v_head_dim": 16,
                      "n_routed_experts": 4, "num_experts_per_tok": 2,
                      "moe_intermediate_size": 48, "n_shared_experts": 1,
                      "first_k_dense_replace": 1, "moe_layer_freq": 1,
                      "topk_method": "greedy", "n_group": 1, "topk_group": 1,
                      "rope_scaling": None, "attention_bias": False}),
}
_CLS = {"gemma3": "Gemma3ForCausalLM", "gpt-oss": "GptOssForCausalLM",
        "deepseek2": "DeepseekV2ForCausalLM"}


@pytest.mark.parametrize("family", sorted(CASES))
def test_engine_generate(family, tmp_path):
    model = _mk(tmp_path, _CLS[family], dict(CASES[family]))
    eng = Engine(model, max_seq=64, sampler=SamplerConfig(temp=0.0),
                 kv_dtype=jnp.float32)
    out = eng.generate([5, 9, 42], max_new_tokens=24)
    assert len(out) == 24
    # determinism + long-enough generation to cross the SWA window
    assert out == eng.generate([5, 9, 42], max_new_tokens=24)


def test_gptoss_engine_pallas_moe_matches_dense(tmp_path):
    """gpt-oss through Engine(moe_mode='pallas'): fused row-streaming MoE
    with in-kernel expert biases + clamped swiglu must reproduce the
    dense-gather tokens exactly."""
    model_a = _mk(tmp_path, _CLS["gpt-oss"], dict(CASES["gpt-oss"]))
    a = Engine(model_a, max_seq=64, sampler=SamplerConfig(temp=0.0),
               kv_dtype=jnp.float32)
    ta = a.generate([5, 9, 42], max_new_tokens=16)
    d2 = tmp_path / "b"
    d2.mkdir()
    model_b = _mk(d2, _CLS["gpt-oss"], dict(CASES["gpt-oss"]))
    b = Engine(model_b, max_seq=64, sampler=SamplerConfig(temp=0.0),
               kv_dtype=jnp.float32, moe_mode="pallas")
    tb = b.generate([5, 9, 42], max_new_tokens=16)
    assert ta == tb
