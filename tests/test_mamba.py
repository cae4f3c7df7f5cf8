"""Mamba (recurrent memory): HF conversion + logit parity vs transformers'
own MambaForCausalLM, stepwise-vs-full state consistency, generation."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.models.mamba import init_mamba_cache, make_mamba_forward
from sparkinfer_tpu.tools.convert_hf import convert


@pytest.fixture(scope="module")
def hf_mamba(tmp_path_factory):
    from transformers import MambaConfig, MambaForCausalLM

    torch.manual_seed(0)
    cfg = MambaConfig(
        vocab_size=160,
        hidden_size=64,
        intermediate_size=128,
        state_size=8,
        num_hidden_layers=2,
        conv_kernel=4,
        time_step_rank=4,
        use_cache=False,
    )
    model = MambaForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf") / "tiny-mamba"
    model.save_pretrained(str(d), safe_serialization=True)
    return d, model


def test_convert_and_logit_parity(hf_mamba, tmp_path):
    d, hf = hf_mamba
    out = tmp_path / "mamba.gguf"
    info = convert(str(d), str(out), out_type="f32")
    assert info["arch"] == "mamba"

    model = load_model(str(out), dtype=jnp.float32)
    cfg = model.config
    assert cfg.traits.recurrent
    assert cfg.ssm_d_inner == 128 and cfg.ssm_d_state == 8 and cfg.ssm_d_conv == 4

    rng = np.random.default_rng(0)
    toks = rng.integers(0, 160, 6).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(toks)[None]).logits[0].numpy()

    fwd = jax.jit(make_mamba_forward(cfg))
    cache = init_mamba_cache(cfg, 1)
    logits, _ = fwd(model.params, jnp.asarray(toks, jnp.int32)[None],
                    jnp.arange(6, dtype=jnp.int32)[None], cache)
    np.testing.assert_allclose(np.asarray(logits)[0], ref, rtol=3e-3, atol=3e-3)


def test_stepwise_matches_full(hf_mamba, tmp_path):
    """The recurrence: full-sequence forward == token-by-token with carried
    state (the recurrent-cache correctness property)."""
    d, _ = hf_mamba
    out = tmp_path / "mamba.gguf"
    convert(str(d), str(out), out_type="f32")
    model = load_model(str(out), dtype=jnp.float32)
    cfg = model.config
    fwd = jax.jit(make_mamba_forward(cfg))
    rng = np.random.default_rng(1)
    toks = rng.integers(0, 160, 7).astype(np.int32)

    full, _ = fwd(model.params, jnp.asarray(toks)[None],
                  jnp.arange(7, dtype=jnp.int32)[None], init_mamba_cache(cfg, 1))
    cache = init_mamba_cache(cfg, 1)
    rows = []
    for t in range(7):
        lg, cache = fwd(model.params, jnp.asarray(toks[t:t+1])[None],
                        jnp.full((1, 1), t, jnp.int32), cache)
        rows.append(np.asarray(lg)[0, -1])
    np.testing.assert_allclose(np.stack(rows), np.asarray(full)[0],
                               rtol=1e-4, atol=1e-4)


def test_engine_generates_with_mamba(hf_mamba, tmp_path):
    from sparkinfer_tpu.runtime.engine import Engine
    from sparkinfer_tpu.runtime.sampling import SamplerConfig

    d, _ = hf_mamba
    out = tmp_path / "mamba.gguf"
    convert(str(d), str(out), out_type="f32")
    model = load_model(str(out), dtype=jnp.float32)
    eng = Engine(model, max_seq=64, sampler=SamplerConfig(temp=0.0),
                 kv_dtype=jnp.float32, donate_cache=False)
    out_toks = eng.generate([3, 14, 15], max_new_tokens=6)
    assert len(out_toks) == 6
    assert out_toks == eng.generate([3, 14, 15], max_new_tokens=6)


def test_padding_does_not_corrupt_state(hf_mamba, tmp_path):
    """Engine pads prompts to bucket lengths; for recurrent models padding
    must be a state no-op — continuation equals the unpadded chain."""
    d, _ = hf_mamba
    out = tmp_path / "mamba.gguf"
    convert(str(d), str(out), out_type="f32")
    model = load_model(str(out), dtype=jnp.float32)
    cfg = model.config
    fwd = jax.jit(make_mamba_forward(cfg))
    rng = np.random.default_rng(2)
    toks = rng.integers(0, 160, 3).astype(np.int32)

    # unpadded prefill state
    _, cache_a = fwd(model.params, jnp.asarray(toks)[None],
                     jnp.arange(3, dtype=jnp.int32)[None], init_mamba_cache(cfg, 1))
    # padded (engine-style) prefill state
    padded = np.full(16, -1, np.int32)
    padded[:3] = toks
    _, cache_b = fwd(model.params, jnp.asarray(padded)[None],
                     jnp.arange(16, dtype=jnp.int32)[None], init_mamba_cache(cfg, 1))
    np.testing.assert_allclose(np.asarray(cache_b.ssm), np.asarray(cache_a.ssm),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cache_b.conv), np.asarray(cache_a.conv),
                               rtol=1e-5, atol=1e-6)


def test_falcon_mamba_parity(tmp_path):
    """falcon-mamba: mamba-1 + weightless RMS over dt/B/C (ref
    llama-hparams.h ssm_dt_b_c_rms; graph-context-mamba.cpp:94)."""
    from transformers import FalconMambaConfig, FalconMambaForCausalLM

    torch.manual_seed(0)
    cfg_hf = FalconMambaConfig(
        vocab_size=160, hidden_size=64, intermediate_size=128, state_size=8,
        num_hidden_layers=2, conv_kernel=4, time_step_rank=4, use_cache=False)
    hf = FalconMambaForCausalLM(cfg_hf)
    hf.eval()
    d = tmp_path / "hf"
    hf.save_pretrained(str(d), safe_serialization=True)
    out = tmp_path / "fm.gguf"
    info = convert(str(d), str(out), out_type="f32")
    assert info["arch"] == "mamba"

    model = load_model(str(out), dtype=jnp.float32)
    cfg = model.config
    assert cfg.ssm_dt_b_c_rms
    assert "ssm_dt_norm_w" in model.params["layers"]

    rng = np.random.default_rng(0)
    toks = rng.integers(0, 160, 6).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(toks)[None]).logits[0].numpy()
    fwd = jax.jit(make_mamba_forward(cfg))
    cache = init_mamba_cache(cfg, 1)
    logits, _ = fwd(model.params, jnp.asarray(toks, jnp.int32)[None],
                    jnp.arange(6, dtype=jnp.int32)[None], cache)
    np.testing.assert_allclose(np.asarray(logits)[0], ref, rtol=3e-3, atol=3e-3)
