"""Gemma 3n parity vs transformers (ref: src/models/gemma3n-iswa.cpp —
AltUp stack, laurel, per-layer embeddings, KV sharing, gaussian-topk
activation sparsity, weightless v-norm, scale-1.0 attention)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

from sparkinfer_tpu.models.gemma3n import make_gemma3n_forward
from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.runtime.kv_cache import init_cache
from sparkinfer_tpu.tools.convert_hf import convert

LT = ["sliding_attention", "sliding_attention", "full_attention",
      "sliding_attention", "sliding_attention", "full_attention"]


@pytest.fixture(scope="module")
def hf_gemma3n(tmp_path_factory):
    import transformers as T

    torch.manual_seed(0)
    cfg = T.Gemma3nTextConfig(
        vocab_size=160, vocab_size_per_layer_input=160, hidden_size=64,
        intermediate_size=96, num_hidden_layers=6, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, altup_num_inputs=4,
        altup_active_idx=0, hidden_size_per_layer_input=8, laurel_rank=4,
        num_kv_shared_layers=2, sliding_window=16,
        activation_sparsity_pattern=[0.95, 0.95, 0.0, 0.0, 0.0, 0.0],
        layer_types=LT, rope_theta=1000000.0, rope_local_base_freq=10000.0,
        max_position_embeddings=128, pad_token_id=0)
    hf = T.Gemma3nForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("hf") / "tiny-g3n"
    hf.save_pretrained(str(d), safe_serialization=True)
    return d, hf


def test_gemma3n_logit_parity(hf_gemma3n, tmp_path):
    d, hf = hf_gemma3n
    out = tmp_path / "g3n.gguf"
    info = convert(str(d), str(out), out_type="f32")
    assert info["arch"] == "gemma3n"

    model = load_model(str(out), dtype=jnp.float32)
    cfg = model.config
    assert cfg.n_altup == 4 and cfg.n_embd_altup == 8 and cfg.n_kv_shared == 2
    assert cfg.swa_layers == (True, True, False, True, True, False)
    assert cfg.act_sparsity_scale[0] > 1.6 and cfg.act_sparsity_scale[2] == 0.0

    rng = np.random.default_rng(1)
    n_tok = 9
    toks = rng.integers(0, 160, n_tok).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(toks)[None]).logits[0].numpy()

    fwd = jax.jit(make_gemma3n_forward(cfg))
    logits, _ = fwd(model.params, jnp.asarray(toks, jnp.int32)[None],
                    jnp.arange(n_tok, dtype=jnp.int32)[None],
                    init_cache(cfg, 1, 32, jnp.float32))
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=5e-3, atol=5e-3)


def test_gemma3n_stepwise_and_engine(hf_gemma3n, tmp_path):
    """Stepwise decode through the shared-KV cache must equal the full
    pass; the Engine must generate greedily like HF."""
    d, hf = hf_gemma3n
    out = tmp_path / "g3n.gguf"
    convert(str(d), str(out), out_type="f32")
    model = load_model(str(out), dtype=jnp.float32)
    cfg = model.config

    rng = np.random.default_rng(2)
    toks = rng.integers(0, 160, 7).astype(np.int32)
    fwd = jax.jit(make_gemma3n_forward(cfg))
    full, _ = fwd(model.params, jnp.asarray(toks)[None],
                  jnp.arange(7, dtype=jnp.int32)[None],
                  init_cache(cfg, 1, 16, jnp.float32))
    cache = init_cache(cfg, 1, 16, jnp.float32)
    outs = []
    for t, tok in enumerate(toks):
        lg, cache = fwd(model.params, jnp.asarray([[tok]], jnp.int32),
                        jnp.full((1, 1), t, jnp.int32), cache)
        outs.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.stack(outs), np.asarray(full[0]),
                               rtol=5e-4, atol=5e-4)

    from sparkinfer_tpu.runtime import SamplerConfig
    from sparkinfer_tpu.runtime.engine import Engine

    eng = Engine(model, max_seq=32, sampler=SamplerConfig(temp=0.0),
                 kv_dtype=jnp.float32)
    got = eng.generate(list(map(int, toks)), max_new_tokens=6)
    with torch.no_grad():
        want = hf.generate(torch.tensor(toks.astype(np.int64))[None],
                           max_new_tokens=6, do_sample=False)[0][7:].tolist()
    assert got[: len(want)] == want
