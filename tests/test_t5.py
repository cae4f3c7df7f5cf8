"""T5 encoder-decoder parity vs transformers (ref: src/models/t5-enc.cpp,
t5-dec.cpp; llama_encode/llama_decode split in llama-context.cpp)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.models.t5 import (init_dec_cache, make_t5_decoder,
                                      make_t5_encoder, precompute_cross_kv)
from sparkinfer_tpu.tools.convert_hf import convert


def _tiny_cfg(T, **kw):
    base = dict(
        vocab_size=160, d_model=64, d_kv=16, d_ff=96, num_layers=2,
        num_decoder_layers=2, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=32,
        feed_forward_proj="relu", tie_word_embeddings=True,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1)
    base.update(kw)
    return T.T5Config(**base)


def _convert_and_load(hf, tmp_path):
    d = tmp_path / "hf"
    hf.save_pretrained(str(d), safe_serialization=True)
    out = tmp_path / "m.gguf"
    info = convert(str(d), str(out), out_type="f32")
    model = load_model(str(out), dtype=jnp.float32)
    return model, info


@pytest.mark.parametrize("variant", ["relu", "gated-gelu"])
def test_t5_logit_parity(variant, tmp_path):
    import transformers as T

    torch.manual_seed(0)
    kw = dict(feed_forward_proj=variant)
    if variant == "gated-gelu":
        kw["tie_word_embeddings"] = False  # flan-style: untied lm_head
    hf = T.T5ForConditionalGeneration(_tiny_cfg(T, **kw))
    hf.eval()
    model, info = _convert_and_load(hf, tmp_path)
    assert info["arch"] == "t5"
    cfg = model.config
    assert cfg.dec_n_layer == 2 and cfg.n_rel_attn_bkts == 8
    assert cfg.dec_start_token_id == 0

    rng = np.random.default_rng(1)
    enc_toks = rng.integers(2, 160, 7).astype(np.int64)
    dec_toks = np.concatenate([[0], rng.integers(2, 160, 4)]).astype(np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(enc_toks)[None],
                 decoder_input_ids=torch.tensor(dec_toks)[None]).logits[0].numpy()

    enc = jax.jit(make_t5_encoder(cfg))
    dec = jax.jit(make_t5_decoder(cfg))
    enc_out = enc(model.params, jnp.asarray(enc_toks, jnp.int32)[None],
                  jnp.ones((1, 7), bool))
    ck, cv = precompute_cross_kv(model.params, enc_out, cfg)
    Td = len(dec_toks)
    logits, _ = dec(model.params, jnp.asarray(dec_toks, jnp.int32)[None],
                    jnp.arange(Td, dtype=jnp.int32)[None],
                    init_dec_cache(cfg, 1, 8, jnp.float32),
                    ck, cv, jnp.ones((1, 7), bool))
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=4e-3, atol=4e-3)


def test_t5_stepwise_decode_and_engine(tmp_path):
    """One-token-at-a-time decode through the cache must equal the full
    pass; Seq2SeqEngine greedy output must match HF generate."""
    import transformers as T

    torch.manual_seed(0)
    hf = T.T5ForConditionalGeneration(_tiny_cfg(T))
    hf.eval()
    model, _ = _convert_and_load(hf, tmp_path)
    cfg = model.config

    rng = np.random.default_rng(2)
    enc_toks = rng.integers(2, 160, 5).astype(np.int64)
    dec_toks = np.concatenate([[0], rng.integers(2, 160, 3)]).astype(np.int64)

    enc = jax.jit(make_t5_encoder(cfg))
    dec = jax.jit(make_t5_decoder(cfg))
    enc_out = enc(model.params, jnp.asarray(enc_toks, jnp.int32)[None],
                  jnp.ones((1, 5), bool))
    ck, cv = precompute_cross_kv(model.params, enc_out, cfg)
    valid = jnp.ones((1, 5), bool)
    Td = len(dec_toks)
    full, _ = dec(model.params, jnp.asarray(dec_toks, jnp.int32)[None],
                  jnp.arange(Td, dtype=jnp.int32)[None],
                  init_dec_cache(cfg, 1, 8, jnp.float32), ck, cv, valid)
    cache = init_dec_cache(cfg, 1, 8, jnp.float32)
    outs = []
    for t, tok in enumerate(dec_toks):
        lg, cache = dec(model.params, jnp.asarray([[tok]], jnp.int32),
                        jnp.full((1, 1), t, jnp.int32), cache, ck, cv, valid)
        outs.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.stack(outs), np.asarray(full[0]),
                               rtol=2e-4, atol=2e-4)

    # engine greedy == HF greedy
    from sparkinfer_tpu.runtime.sampling import SamplerConfig
    from sparkinfer_tpu.runtime.seq2seq import Seq2SeqEngine

    eng = Seq2SeqEngine(model, max_seq=32,
                        sampler=SamplerConfig(temp=0.0))
    got = eng.generate(list(map(int, enc_toks)), max_new_tokens=8)
    with torch.no_grad():
        want = hf.generate(torch.tensor(enc_toks)[None], max_new_tokens=8,
                           do_sample=False)[0].tolist()
    # HF output: [decoder_start, tok...]; strip start + trailing eos
    want = [t for t in want[1:] if t != 1][: len(got)]
    assert got[: len(want)] == want


def test_t5_encoder_model(tmp_path):
    """T5EncoderModel (t5encoder arch) hidden-state parity."""
    import transformers as T

    torch.manual_seed(0)
    hf = T.T5EncoderModel(_tiny_cfg(T))
    hf.eval()
    model, info = _convert_and_load(hf, tmp_path)
    assert info["arch"] == "t5encoder"
    cfg = model.config

    rng = np.random.default_rng(3)
    toks = rng.integers(2, 160, 6).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(toks)[None]).last_hidden_state[0].numpy()
    enc = jax.jit(make_t5_encoder(cfg))
    got = enc(model.params, jnp.asarray(toks, jnp.int32)[None],
              jnp.ones((1, 6), bool))
    np.testing.assert_allclose(np.asarray(got)[0], ref, rtol=4e-3, atol=4e-3)
