"""iSWA dual KV cache: SWA layers keep only a sliding_window+chunk ring
while full-attention layers keep the whole context (ref:
src/llama-kv-cache-iswa.cpp). Verifies exact logit parity with the full
cache far beyond the window, the memory saving, and Engine integration
on a gemma2-style alternating-SWA model."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.models.transformer import make_forward
from sparkinfer_tpu.runtime.kv_cache import init_cache, init_cache_iswa, swa_runs
from sparkinfer_tpu.tools.convert_hf import convert

W = 8  # sliding window
S = 64  # full context


@pytest.fixture(scope="module")
def gemma2_model(tmp_path_factory):
    import transformers as T

    torch.manual_seed(0)
    cfg = T.Gemma2Config(
        vocab_size=160, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, query_pre_attn_scalar=16, sliding_window=W,
        max_position_embeddings=256)
    hf = T.Gemma2ForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("iswa") / "hf"
    hf.save_pretrained(str(d), safe_serialization=True)
    out = d / "m.gguf"
    convert(str(d), str(out), out_type="f32")
    return load_model(str(out), dtype=jnp.float32)


def test_swa_runs_and_memory(gemma2_model):
    cfg = gemma2_model.config
    runs = swa_runs(cfg)
    # gemma2 pattern 2: alternating swa/full starting with swa
    assert [r[2] for r in runs] == [True, False, True, False]
    full = init_cache(cfg, 1, S, jnp.float32)
    iswa = init_cache_iswa(cfg, 1, S, chunk=4, dtype=jnp.float32)
    bytes_full = full.k.nbytes + full.v.nbytes
    bytes_iswa = sum(a.nbytes for a in iswa.k) + sum(a.nbytes for a in iswa.v)
    # 2 of 4 layers shrink from S=64 to W+chunk=12 slots
    assert bytes_iswa < 0.65 * bytes_full
    assert iswa.iswa and not full.iswa


def test_decode_parity_beyond_window(gemma2_model):
    """Step-by-step decode with the ring cache must match the full cache
    exactly, well past several window wraps."""
    cfg = gemma2_model.config
    params = gemma2_model.params
    fwd = jax.jit(make_forward(cfg))
    rng = np.random.default_rng(0)
    toks = rng.integers(0, 160, 40).astype(np.int32)

    cache_f = init_cache(cfg, 1, S, jnp.float32)
    cache_r = init_cache_iswa(cfg, 1, S, chunk=1, dtype=jnp.float32)
    for t, tok in enumerate(toks):
        tk = jnp.asarray([[tok]], jnp.int32)
        ps = jnp.full((1, 1), t, jnp.int32)
        lf, cache_f = fwd(params, tk, ps, cache_f)
        lr, cache_r = fwd(params, tk, ps, cache_r)
        np.testing.assert_allclose(
            np.asarray(lr), np.asarray(lf), rtol=1e-5, atol=1e-5,
            err_msg=f"step {t}")


def test_chunked_prefill_parity(gemma2_model):
    """A multi-token chunk (T <= chunk budget) through the ring matches
    the full cache."""
    cfg = gemma2_model.config
    params = gemma2_model.params
    fwd = jax.jit(make_forward(cfg))
    rng = np.random.default_rng(1)
    toks = rng.integers(0, 160, 6).astype(np.int32)
    pos = jnp.arange(6, dtype=jnp.int32)[None]
    lf, _ = fwd(params, jnp.asarray(toks)[None], pos, init_cache(cfg, 1, S, jnp.float32))
    lr, _ = fwd(params, jnp.asarray(toks)[None], pos,
                init_cache_iswa(cfg, 1, S, chunk=6, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(lr), np.asarray(lf), rtol=1e-5, atol=1e-5)


def test_engine_iswa_generation(gemma2_model):
    from sparkinfer_tpu.runtime.engine import Engine
    from sparkinfer_tpu.runtime.sampling import SamplerConfig

    a = Engine(gemma2_model, max_seq=S, sampler=SamplerConfig(temp=0.0),
               kv_dtype=jnp.float32, fused_chunk=0)
    b = Engine(gemma2_model, max_seq=S, sampler=SamplerConfig(temp=0.0),
               kv_dtype=jnp.float32, fused_chunk=0, kv_iswa=True)
    prompt = [3, 7, 11, 19]
    assert a.generate(prompt, max_new_tokens=24) == b.generate(prompt, max_new_tokens=24)
