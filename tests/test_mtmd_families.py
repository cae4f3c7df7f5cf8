"""mtmd family breadth (VERDICT r4 item 6): gemma3 vision (SigLIP +
avg-pool projector), pixtral (RMS-norm ViT + 2D RoPE + gated FFN) and
internvl (LN ViT + layer scales + pixel shuffle), each converted through
the product converter to clip.cpp-convention mmproj GGUFs and checked
for projected-feature parity against transformers (ref:
tools/mtmd/clip.cpp build_siglip/build_pixtral/build_internvl)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.mtmd import load_mmproj, make_vision_forward
from sparkinfer_tpu.tools.convert_hf import convert

IMG = 32
P = 8  # -> 4x4 patches


@pytest.fixture(scope="module")
def gemma3(tmp_path_factory):
    import transformers as T

    torch.manual_seed(0)
    vision = T.SiglipVisionConfig(
        image_size=IMG, patch_size=P, hidden_size=48, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4)
    text = T.Gemma3TextConfig(
        vocab_size=160, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16)
    cfg = T.Gemma3Config(vision_config=vision, text_config=text,
                         mm_tokens_per_image=4, image_token_index=150,
                         boi_token_index=151, eoi_token_index=152)
    hf = T.Gemma3ForConditionalGeneration(cfg)
    hf.eval()
    with torch.no_grad():
        # the projector params init to zeros in a fresh model; randomize
        # so parity is meaningful
        hf.model.multi_modal_projector.mm_input_projection_weight.normal_(0, 0.1)
        hf.model.multi_modal_projector.mm_soft_emb_norm.weight.normal_(0, 0.5)
    d = tmp_path_factory.mktemp("gemma3") / "hf"
    hf.save_pretrained(str(d), safe_serialization=True)
    out = d / "m.gguf"
    info = convert(str(d), str(out), out_type="f32")
    assert info["n_mmproj_tensors"] > 0
    return hf, str(out), info["mmproj"]


@pytest.fixture(scope="module")
def pixtral(tmp_path_factory):
    import transformers as T

    torch.manual_seed(1)
    vision = T.PixtralVisionConfig(
        image_size=IMG, patch_size=P, hidden_size=48, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, hidden_act="silu")
    text = T.MistralConfig(
        vocab_size=160, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2)
    cfg = T.LlavaConfig(vision_config=vision, text_config=text,
                        image_token_index=150,
                        vision_feature_select_strategy="full",
                        vision_feature_layer=-1,
                        projector_hidden_act="gelu",
                        multimodal_projector_bias=True)
    hf = T.LlavaForConditionalGeneration(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("pixtral") / "hf"
    hf.save_pretrained(str(d), safe_serialization=True)
    out = d / "m.gguf"
    info = convert(str(d), str(out), out_type="f32")
    assert info["n_mmproj_tensors"] > 0
    return hf, str(out), info["mmproj"]


def test_gemma3_vision_parity(gemma3):
    """Pool + soft-emb-norm + projection must match HF get_image_features
    (clip.cpp:558-580 graph semantics)."""
    hf, _, mmproj = gemma3
    vcfg, vparams = load_mmproj(mmproj)
    assert vcfg.proj_type == "gemma3"
    assert vcfg.scale_factor == 2  # 4 patches/side -> 2 tokens/side
    assert not vcfg.has_class_embd  # SigLIP
    fwd = jax.jit(make_vision_forward(vcfg))
    px = np.random.default_rng(0).standard_normal(
        (1, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(torch.tensor(px))
    ref = np.asarray(ref[0] if isinstance(ref, (list, tuple)) else ref)
    got = np.asarray(fwd(vparams, jnp.asarray(px)))
    assert got.shape[1] == 4  # mm_tokens_per_image
    np.testing.assert_allclose(got.reshape(ref.shape), ref,
                               atol=2e-5, rtol=2e-4)


def test_gemma3_text_loads(gemma3):
    _, gguf, _ = gemma3
    m = load_model(gguf, dtype=jnp.float32)
    assert m.config.arch == "gemma3"


def test_pixtral_vision_parity(pixtral):
    """RMS ViT + interleaved 2D RoPE (on ggml-permuted q/k) + gated-silu
    FFN + mm.1/mm.2 projector vs HF PixtralVisionModel features."""
    hf, _, mmproj = pixtral
    vcfg, vparams = load_mmproj(mmproj)
    assert vcfg.proj_type == "pixtral"
    assert vcfg.norm_rms and vcfg.use_silu and vcfg.rope_theta == 10000.0
    fwd = jax.jit(make_vision_forward(vcfg))
    px = np.random.default_rng(1).standard_normal(
        (1, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(torch.tensor(px),
                                    image_sizes=torch.tensor([[IMG, IMG]]))
    ref = np.asarray(ref[0] if isinstance(ref, (list, tuple)) else ref)
    got = np.asarray(fwd(vparams, jnp.asarray(px)))
    np.testing.assert_allclose(got.reshape(ref.shape), ref,
                               atol=2e-5, rtol=2e-4)


def test_pixtral_img_break_assembly(pixtral):
    """[IMG_BREAK] row-separator layout (clip.cpp build_pixtral tail):
    n rows of n patches + one break token after all but the last row."""
    from sparkinfer_tpu.mtmd.clip import append_img_break

    _, _, mmproj = pixtral
    vcfg, _ = load_mmproj(mmproj)
    n = IMG // P
    feats = np.arange(n * n * 5, dtype=np.float32).reshape(n * n, 5)
    brk = np.full(5, -1.0, np.float32)
    out = append_img_break(feats, vcfg, brk)
    assert out.shape == (n * n + n - 1, 5)
    # break rows sit after each patch row except the last
    for r in range(n - 1):
        np.testing.assert_array_equal(out[r * (n + 1) + n], brk)


def test_pixtral_text_loads(pixtral):
    _, gguf, _ = pixtral
    m = load_model(gguf, dtype=jnp.float32)
    assert m.config.arch == "llama"  # mistral maps to llama family


@pytest.fixture(scope="module")
def internvl(tmp_path_factory):
    import transformers as T

    torch.manual_seed(2)
    vc = T.InternVLVisionConfig(
        image_size=IMG, patch_size=P, hidden_size=48, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4)
    tc = T.Qwen2Config(vocab_size=160, hidden_size=64, intermediate_size=96,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2)
    cfg = T.InternVLConfig(vision_config=vc, text_config=tc,
                           image_token_id=150)
    hf = T.InternVLForConditionalGeneration(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("internvl") / "hf"
    hf.save_pretrained(str(d), safe_serialization=True)
    out = d / "m.gguf"
    info = convert(str(d), str(out), out_type="f32")
    assert info["n_mmproj_tensors"] > 0
    return hf, str(out), info["mmproj"]


def test_internvl_vision_parity(internvl):
    """LN ViT with cls token + ls1/ls2 layer scales, pixel shuffle, and
    the mm.model.mlp LN+MLP projector vs HF get_image_features
    (clip.cpp build_internvl semantics)."""
    hf, _, mmproj = internvl
    vcfg, vparams = load_mmproj(mmproj)
    assert vcfg.proj_type == "internvl"
    assert vcfg.scale_factor == 2  # 1 / downsample_ratio
    assert vcfg.has_class_embd
    assert "ls1_w" in vparams["layers"] and "ls2_w" in vparams["layers"]
    fwd = jax.jit(make_vision_forward(vcfg))
    px = np.random.default_rng(2).standard_normal(
        (1, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(torch.tensor(px))
    ref = np.asarray(ref[0] if isinstance(ref, (list, tuple)) else ref)
    got = np.asarray(fwd(vparams, jnp.asarray(px)))
    # pixel shuffle: 4x4 patches -> 2x2 tokens at 4x channel width
    assert got.shape[1] == 4
    np.testing.assert_allclose(got.reshape(ref.shape), ref,
                               atol=2e-5, rtol=2e-4)


def test_internvl_text_loads(internvl):
    _, gguf, _ = internvl
    m = load_model(gguf, dtype=jnp.float32)
    assert m.config.arch == "qwen2"
