"""Multimodal (mtmd): llava conversion (LLM GGUF + mmproj GGUF), CLIP
vision-tower + projector parity vs transformers' own image features, and
full spliced-sequence logit parity vs LlavaForConditionalGeneration —
the analogue of the reference's tools/mtmd stack (clip.cpp + mtmd.cpp)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.mtmd import load_mmproj, make_vision_forward
from sparkinfer_tpu.tools.convert_hf import convert

IMG = 24  # image_size
P = 8  # patch_size -> 9 patches


@pytest.fixture(scope="module")
def llava(tmp_path_factory):
    import transformers as T

    torch.manual_seed(0)
    vision = T.CLIPVisionConfig(
        image_size=IMG, patch_size=P, hidden_size=48, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, hidden_act="quick_gelu")
    text = T.LlamaConfig(
        vocab_size=160, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128)
    cfg = T.LlavaConfig(vision_config=vision, text_config=text,
                        image_token_index=150,
                        vision_feature_select_strategy="default",
                        vision_feature_layer=-1)
    hf = T.LlavaForConditionalGeneration(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("llava") / "hf"
    hf.save_pretrained(str(d), safe_serialization=True)
    out = d / "m.gguf"
    info = convert(str(d), str(out), out_type="f32")
    assert info["n_mmproj_tensors"] > 0
    return hf, str(out), info["mmproj"]


def test_vision_tower_parity(llava):
    """Projected image features must match HF get_image_features."""
    hf, _, mmproj = llava
    vcfg, vparams = load_mmproj(mmproj)
    assert vcfg.n_patches == (IMG // P) ** 2
    vision = jax.jit(make_vision_forward(vcfg))
    rng = np.random.default_rng(0)
    px = rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(
            torch.tensor(px),
            vision_feature_layer=-1,
            vision_feature_select_strategy="default")
    if isinstance(ref, (list, tuple)):
        ref = ref[0]
    ref = ref.numpy().reshape(1, -1, ref.shape[-1])
    got = np.asarray(vision(vparams, jnp.asarray(px)))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_spliced_logits_parity(llava):
    """text + image + text spliced through our inputs_embeds forward must
    match the HF llava forward with an <image> token."""
    from sparkinfer_tpu.models.transformer import make_forward
    from sparkinfer_tpu.runtime.kv_cache import init_cache

    hf, gguf, mmproj = llava
    model = load_model(gguf, dtype=jnp.float32)
    vcfg, vparams = load_mmproj(mmproj)
    vision = jax.jit(make_vision_forward(vcfg))

    rng = np.random.default_rng(1)
    px = rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32)
    pre = [5, 9]
    post = [11, 3, 7]
    image_tok = 150
    n_p = vcfg.n_patches
    ids = pre + [image_tok] * n_p + post
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(px)).logits[0].numpy()

    img_emb = np.asarray(vision(vparams, jnp.asarray(px))[0])
    tok_embd = np.asarray(model.params["tok_embd"])
    embeds = np.concatenate(
        [tok_embd[pre], img_emb, tok_embd[post]], 0).astype(np.float32)
    fwd = jax.jit(make_forward(model.config, inputs_embeds=True))
    T_ = embeds.shape[0]
    lg, _ = fwd(model.params, jnp.asarray(embeds)[None],
                jnp.arange(T_, dtype=jnp.int32)[None],
                init_cache(model.config, 1, 64, jnp.float32))
    got = np.asarray(lg)[0]
    np.testing.assert_allclose(got, ref, rtol=4e-3, atol=4e-3)


def test_pipeline_splicing(llava):
    """MtmdPipeline marker splicing builds the right embedding sequence
    and generates deterministically end-to-end."""
    from sparkinfer_tpu.mtmd import MtmdPipeline

    _, gguf, mmproj = llava
    model = load_model(gguf, dtype=jnp.float32)

    class StubVocab:
        def encode(self, s):
            return [3 + (ord(c) % 7) for c in s.strip()][:4]

    model.vocab = StubVocab()
    pipe = MtmdPipeline(model, mmproj, max_seq=64)
    img = (np.random.default_rng(2).integers(0, 255, (32, 32, 3))
           .astype(np.uint8))
    emb = pipe.build_embeds("hi <__image__> there", [img])
    n_text = len(model.vocab.encode("hi ")) + len(model.vocab.encode(" there"))
    assert emb.shape == (n_text + pipe.vcfg.n_patches, model.config.n_embd)
    out = pipe.generate("hi <__image__> go", [img], max_new_tokens=6)
    assert len(out) == 6
    assert out == pipe.generate("hi <__image__> go", [img], max_new_tokens=6)


def test_audio_encoder_parity(tmp_path):
    """Whisper audio tower: convert the HF encoder to the reference's
    audio-mmproj layout, load, and match transformers' encoder output
    (ref clip.cpp build_whisper_enc / mtmd-audio.cpp)."""
    import transformers as T

    from sparkinfer_tpu.mtmd import load_mmproj_audio, make_audio_forward

    torch.manual_seed(0)
    cfg = T.WhisperConfig(
        vocab_size=100, num_mel_bins=16, d_model=48,
        encoder_layers=2, encoder_attention_heads=4, encoder_ffn_dim=64,
        decoder_layers=1, decoder_attention_heads=4, decoder_ffn_dim=64,
        max_source_positions=40, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, decoder_start_token_id=1)
    hf = T.WhisperModel(cfg)
    hf.eval()
    d = tmp_path / "hf"
    hf.save_pretrained(str(d), safe_serialization=True)
    out = tmp_path / "a.mmproj.gguf"
    info = convert(str(d), str(out))
    assert info["arch"] == "clip-audio" and info["n_tensors"] > 0

    acfg, aparams = load_mmproj_audio(str(out))
    assert acfg.n_mel == 16 and acfg.n_layer == 2
    fwd = jax.jit(make_audio_forward(acfg))

    rng = np.random.default_rng(0)
    n_frames = 80  # -> 40 positions after the stride-2 conv
    mel = rng.standard_normal((1, 16, n_frames)).astype(np.float32)
    with torch.no_grad():
        ref = hf.encoder(torch.tensor(mel)).last_hidden_state.numpy()
    got = np.asarray(fwd(aparams, jnp.asarray(mel)))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
