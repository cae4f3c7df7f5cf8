"""HF -> GGUF conversion validated against transformers itself: build a tiny
random LlamaForCausalLM, save_pretrained, convert, load in our engine, and
compare logits with the torch forward — the strongest end-to-end parity
test in the suite (validates rope permutation, tensor mapping, loader)."""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.models.transformer import make_forward
from sparkinfer_tpu.runtime.kv_cache import init_cache
from sparkinfer_tpu.tools.convert_hf import convert


@pytest.fixture(scope="module")
def hf_model_dir(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=160,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf") / "tiny-llama-hf"
    model.save_pretrained(str(d), safe_serialization=True)
    return d, model


def test_convert_and_logit_parity(hf_model_dir, tmp_path):
    d, hf = hf_model_dir
    out = tmp_path / "converted.gguf"
    info = convert(str(d), str(out), out_type="f32")
    assert info["arch"] == "llama"
    assert info["n_layer"] == 2

    model = load_model(str(out), dtype=jnp.float32)
    cfg = model.config
    assert cfg.n_embd == 64 and cfg.n_head == 4 and cfg.n_head_kv == 2

    rng = np.random.default_rng(0)
    toks = rng.integers(0, 160, 7).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(toks)[None]).logits[0].numpy()

    fwd = jax.jit(make_forward(cfg))
    logits, _ = fwd(
        model.params,
        jnp.asarray(toks, jnp.int32)[None],
        jnp.arange(7, dtype=jnp.int32)[None],
        init_cache(cfg, 1, 16, jnp.float32),
    )
    got = np.asarray(logits)[0]
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_convert_with_predictors(hf_model_dir, tmp_path):
    d, hf = hf_model_dir
    # fabricate ReluMLP predictor checkpoints (fc1/fc2, rank 8)
    pred_dir = tmp_path / "preds"
    pred_dir.mkdir()
    torch.manual_seed(1)
    for i in range(2):
        sd = {
            "fc1.weight": torch.randn(8, 64),
            "fc1.bias": torch.randn(8),
            "fc2.weight": torch.randn(96, 8),
            "fc2.bias": torch.randn(96) - 2.0,
        }
        torch.save(sd, pred_dir / f"model_{i}.pt")

    out = tmp_path / "converted-sparse.gguf"
    convert(str(d), str(out), pred_path=str(pred_dir), pred_bias=True, out_type="f32")

    from sparkinfer_tpu.gguf.reader import GGUFReader

    r = GGUFReader(str(out))
    assert list(r.kv["llama.pred_lora"]) == [8, 8]
    # ffn_down stored transposed {n_embd, n_ff} = numpy shape (96, 64)->(64,96)?
    t = r.tensors["blk.0.ffn_down.weight"]
    assert t.shape == (96, 64)  # transposed from HF's (64, 96)
    assert "blk.0.ffn_pred_up.weight" in r.tensors
    r.close()

    model = load_model(str(out), dtype=jnp.float32)
    assert model.config.has_predictors

    # sparse dense-masked forward runs end-to-end
    from sparkinfer_tpu.runtime.engine import Engine
    from sparkinfer_tpu.runtime.sampling import SamplerConfig
    from sparkinfer_tpu.sparse import SparseConfig

    eng = Engine(model, max_seq=32, sampler=SamplerConfig(temp=0.0),
                 kv_dtype=jnp.float32,
                 sparse=SparseConfig(group_size=16, capacity_groups=4),
                 sparse_decode_mode="gather")
    toks = eng.generate([3, 5, 7], max_new_tokens=4)
    assert len(toks) == 4


def test_qwen2_convert_logit_parity(tmp_path):
    """Qwen2 (neox rope + qkv biases) — converter must NOT permute q/k."""
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(0)
    cfg = Qwen2Config(
        vocab_size=160, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    hf = Qwen2ForCausalLM(cfg)
    hf.eval()
    d = tmp_path / "qwen2-hf"
    hf.save_pretrained(str(d), safe_serialization=True)

    out = tmp_path / "qwen2.gguf"
    info = convert(str(d), str(out), out_type="f32")
    assert info["arch"] == "qwen2"

    model = load_model(str(out), dtype=jnp.float32)
    assert model.config.traits.rope_mode == "neox"

    rng = np.random.default_rng(0)
    toks = rng.integers(0, 160, 6).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(toks)[None]).logits[0].numpy()
    fwd = jax.jit(make_forward(model.config))
    lg, _ = fwd(model.params, jnp.asarray(toks, jnp.int32)[None],
                jnp.arange(6, dtype=jnp.int32)[None],
                init_cache(model.config, 1, 16, jnp.float32))
    np.testing.assert_allclose(np.asarray(lg)[0], ref, rtol=2e-3, atol=2e-3)


def test_opt_convert_logit_parity(tmp_path):
    """OPT (LN norms, ReLU FFN, learned positions offset 2, biases) vs
    transformers — the 3rd SparkInfer sparse arch."""
    from transformers import OPTConfig, OPTForCausalLM

    torch.manual_seed(0)
    cfg = OPTConfig(
        vocab_size=160, hidden_size=64, ffn_dim=96, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        do_layer_norm_before=True, word_embed_proj_dim=64,
    )
    hf = OPTForCausalLM(cfg)
    hf.eval()
    d = tmp_path / "opt-hf"
    hf.save_pretrained(str(d), safe_serialization=True)

    out = tmp_path / "opt.gguf"
    info = convert(str(d), str(out), out_type="f32")
    assert info["arch"] == "opt"

    model = load_model(str(out), dtype=jnp.float32)
    tr = model.config.traits
    assert tr.norm == "ln" and tr.act == "relu" and tr.pos_embd

    rng = np.random.default_rng(0)
    toks = rng.integers(0, 160, 6).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(toks)[None]).logits[0].numpy()
    fwd = jax.jit(make_forward(model.config))
    lg, _ = fwd(model.params, jnp.asarray(toks, jnp.int32)[None],
                jnp.arange(6, dtype=jnp.int32)[None],
                init_cache(model.config, 1, 16, jnp.float32))
    np.testing.assert_allclose(np.asarray(lg)[0], ref, rtol=2e-3, atol=2e-3)


def test_falcon_convert_logit_parity(tmp_path):
    """Falcon (parallel blocks, fused multi-query QKV, neox rope) vs
    transformers — the 4th SparkInfer sparse arch."""
    from transformers import FalconConfig, FalconForCausalLM

    torch.manual_seed(0)
    cfg = FalconConfig(
        vocab_size=160, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, multi_query=True,
        new_decoder_architecture=False, parallel_attn=True, bias=False,
        alibi=False, layer_norm_epsilon=1e-5,
    )
    hf = FalconForCausalLM(cfg)
    hf.eval()
    d = tmp_path / "falcon-hf"
    hf.save_pretrained(str(d), safe_serialization=True)

    out = tmp_path / "falcon.gguf"
    info = convert(str(d), str(out), out_type="f32")
    assert info["arch"] == "falcon"

    model = load_model(str(out), dtype=jnp.float32)
    tr = model.config.traits
    assert tr.parallel_blocks and tr.fused_qkv and model.config.n_head_kv == 1

    rng = np.random.default_rng(0)
    toks = rng.integers(0, 160, 6).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(toks)[None]).logits[0].numpy()
    fwd = jax.jit(make_forward(model.config))
    lg, _ = fwd(model.params, jnp.asarray(toks, jnp.int32)[None],
                jnp.arange(6, dtype=jnp.int32)[None],
                init_cache(model.config, 1, 16, jnp.float32))
    np.testing.assert_allclose(np.asarray(lg)[0], ref, rtol=2e-3, atol=2e-3)


def test_gpt2_convert_logit_parity(tmp_path):
    """GPT-2 (Conv1D transposed weights, fused QKV, LN, learned positions)
    vs transformers."""
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(0)
    cfg = GPT2Config(
        vocab_size=160, n_embd=64, n_layer=2, n_head=4, n_positions=64,
        n_inner=96,
    )
    hf = GPT2LMHeadModel(cfg)
    hf.eval()
    d = tmp_path / "gpt2-hf"
    hf.save_pretrained(str(d), safe_serialization=True)

    out = tmp_path / "gpt2.gguf"
    info = convert(str(d), str(out), out_type="f32")
    assert info["arch"] == "gpt2"

    model = load_model(str(out), dtype=jnp.float32)
    tr = model.config.traits
    assert tr.fused_qkv and tr.pos_embd and tr.norm == "ln"

    rng = np.random.default_rng(0)
    toks = rng.integers(0, 160, 6).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(toks)[None]).logits[0].numpy()
    fwd = jax.jit(make_forward(model.config))
    lg, _ = fwd(model.params, jnp.asarray(toks, jnp.int32)[None],
                jnp.arange(6, dtype=jnp.int32)[None],
                init_cache(model.config, 1, 16, jnp.float32))
    np.testing.assert_allclose(np.asarray(lg)[0], ref, rtol=2e-3, atol=2e-3)
