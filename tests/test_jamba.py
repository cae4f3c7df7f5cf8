"""Jamba (hybrid attention + mamba + MoE memory): HF conversion + logit
parity vs transformers' JambaForCausalLM, stepwise-vs-full state
consistency, engine generation. The hybrid-memory analogue of the
reference's llama-memory-hybrid.cpp + src/models/jamba.cpp."""

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
def hf_jamba(tmp_path_factory):
    from transformers import JambaConfig, JambaForCausalLM

    torch.manual_seed(0)
    cfg = JambaConfig(
        vocab_size=160,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        mamba_d_state=8,
        mamba_d_conv=4,
        mamba_expand=2,
        mamba_dt_rank=4,
        # layers 1 and 3 attention, 0 and 2 mamba
        attn_layer_offset=1,
        attn_layer_period=2,
        # layers 0 and 2 MoE (3 experts, top-2), 1 and 3 dense FFN
        expert_layer_offset=0,
        expert_layer_period=2,
        num_experts=3,
        num_experts_per_tok=2,
        use_mamba_kernels=False,
        use_cache=False,
    )
    model = JambaForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf") / "tiny-jamba"
    model.save_pretrained(str(d), safe_serialization=True)
    return d, model


def test_convert_and_logit_parity(hf_jamba, tmp_path):
    d, hf = hf_jamba
    out = tmp_path / "jamba.gguf"
    info = convert(str(d), str(out), out_type="f32")
    assert info["arch"] == "jamba"

    m = load_model(str(out), dtype=jnp.float32)
    cfg = m.config
    assert cfg.traits.ssm_hybrid and cfg.traits.recurrent
    assert cfg.n_head_kv_arr == (0, 2, 0, 2)
    assert cfg.ssm_d_inner == 64 and cfg.ssm_d_state == 8
    assert cfg.n_expert == 3 and cfg.n_expert_used == 2

    ids = np.array([[3, 17, 42, 9, 77, 120, 5]], np.int32)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids, dtype=torch.long)).logits.numpy()

    fwd = jax.jit(make_hybrid_forward(cfg))
    cache = init_hybrid_cache(cfg, 1, 16, jnp.float32)
    logits, _ = fwd(m.params, jnp.asarray(ids),
                    jnp.arange(ids.shape[1], dtype=jnp.int32)[None], cache)
    mine = np.asarray(logits)
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, rtol=2e-3, atol=2e-3)


def test_stepwise_matches_full(hf_jamba, tmp_path):
    """Token-by-token decode through BOTH memories (KV writes + recurrent
    state) must match the one-shot forward."""
    d, _ = hf_jamba
    out = tmp_path / "jamba.gguf"
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


def test_padding_passthrough(hf_jamba, tmp_path):
    """-1 padded tokens must leave the recurrent state untouched and the
    padded logits must not disturb real positions (bucketed prefill)."""
    d, _ = hf_jamba
    out = tmp_path / "jamba.gguf"
    convert(str(d), str(out), out_type="f32")
    m = load_model(str(out), dtype=jnp.float32)
    cfg = m.config
    fwd = jax.jit(make_hybrid_forward(cfg))

    ids = np.array([[7, 23, 99]], np.int32)
    lg_plain, c_plain = fwd(m.params, jnp.asarray(ids),
                            jnp.arange(3, dtype=jnp.int32)[None],
                            init_hybrid_cache(cfg, 1, 16, jnp.float32))
    padded = np.full((1, 6), -1, np.int32)
    padded[0, :3] = ids
    lg_pad, c_pad = fwd(m.params, jnp.asarray(padded),
                        jnp.arange(6, dtype=jnp.int32)[None],
                        init_hybrid_cache(cfg, 1, 16, jnp.float32))
    np.testing.assert_allclose(np.asarray(lg_pad)[0, :3],
                               np.asarray(lg_plain)[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_pad.ssm), np.asarray(c_plain.ssm),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_pad.conv), np.asarray(c_plain.conv),
                               rtol=1e-5, atol=1e-5)


def test_engine_generates(hf_jamba, tmp_path):
    from sparkinfer_tpu.runtime.engine import Engine
    from sparkinfer_tpu.runtime.sampling import SamplerConfig

    d, _ = hf_jamba
    out = tmp_path / "jamba.gguf"
    convert(str(d), str(out), out_type="f32")
    eng = Engine(load_model(str(out), dtype=jnp.float32), max_seq=64,
                 sampler=SamplerConfig(temp=0.0), fused_chunk=0)
    toks = eng.generate([5, 9, 42], max_new_tokens=8)
    assert len(toks) == 8 and all(0 <= t < 160 for t in toks)
    # same seed -> deterministic greedy
    assert toks == eng.generate([5, 9, 42], max_new_tokens=8)
