"""Qwen2-VL parity vs transformers: vision tower (2D rotary ViT + 2x2
merger — ref tools/mtmd/clip.cpp build_qwen2vl) and the M-RoPE LLM
(ref src/models/qwen2vl.cpp, ggml_rope_multi), end-to-end through the
converted GGUF + mmproj pair."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.models.transformer import make_forward
from sparkinfer_tpu.mtmd.qwen2vl import (Qwen2VLPipeline,
                                         load_qwen2vl_mmproj,
                                         make_qwen2vl_vision_forward,
                                         mrope_positions)
from sparkinfer_tpu.runtime.kv_cache import init_cache
from sparkinfer_tpu.tools.convert_hf import convert

GRID = (1, 4, 4)  # 16 patches -> 4 merged tokens
IMG_TOK = 150
VSTART = 149


@pytest.fixture(scope="module")
def hf_qwen2vl(tmp_path_factory):
    import transformers as T

    torch.manual_seed(0)
    cfg = T.Qwen2VLConfig(
        text_config=dict(
            vocab_size=160, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128,
            rope_theta=10000.0,
            rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]}),
        vision_config=dict(
            depth=2, embed_dim=32, hidden_size=64, num_heads=4, mlp_ratio=2,
            in_channels=3, patch_size=4, temporal_patch_size=2,
            spatial_merge_size=2),
        image_token_id=IMG_TOK, video_token_id=151, vision_start_token_id=VSTART,
        vision_end_token_id=148)
    hf = T.Qwen2VLForConditionalGeneration(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("hf") / "tiny-q2vl"
    hf.save_pretrained(str(d), safe_serialization=True)
    return d, hf


def test_qwen2vl_multimodal_logit_parity(hf_qwen2vl, tmp_path):
    d, hf = hf_qwen2vl
    out = tmp_path / "q2vl.gguf"
    info = convert(str(d), str(out), out_type="f32")
    assert info["arch"] == "qwen2vl"
    assert info["n_mmproj_tensors"] > 0

    model = load_model(str(out), dtype=jnp.float32)
    cfg = model.config
    assert cfg.mrope_sections == (2, 3, 3)

    rng = np.random.default_rng(0)
    px = rng.normal(size=(16, 3 * 2 * 4 * 4)).astype(np.float32)
    ids_before = [5, 7, VSTART]
    ids_after = [9, 11]
    input_ids = ids_before + [IMG_TOK] * 4 + ids_after

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(input_ids)[None],
                 pixel_values=torch.tensor(px),
                 image_grid_thw=torch.tensor([list(GRID)])).logits[0].numpy()

    # vision tower
    vcfg, vparams = load_qwen2vl_mmproj(info["mmproj"], jnp.float32)
    vfwd = jax.jit(make_qwen2vl_vision_forward(vcfg, GRID))
    img = np.asarray(vfwd(vparams, jnp.asarray(px)))
    with torch.no_grad():
        vref = hf.model.visual(torch.tensor(px),
                               grid_thw=torch.tensor([list(GRID)])).numpy()
    np.testing.assert_allclose(img, vref, rtol=4e-3, atol=4e-3)

    # spliced multimodal forward with M-RoPE
    tok_embd = np.asarray(model.params["tok_embd"], np.float32)
    embeds = np.concatenate([tok_embd[np.asarray(ids_before)], img,
                             tok_embd[np.asarray(ids_after)]], 0)
    pos3, _ = mrope_positions(len(ids_before), GRID, 2, len(ids_after))
    fwd = jax.jit(make_forward(cfg, inputs_embeds=True))
    T_ = embeds.shape[0]
    logits, _ = fwd(model.params, jnp.asarray(embeds)[None],
                    jnp.arange(T_, dtype=jnp.int32)[None],
                    init_cache(cfg, 1, 16, jnp.float32),
                    mrope_pos=jnp.asarray(pos3)[:, None, :])
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=4e-3, atol=4e-3)


def test_qwen2vl_pipeline_greedy(hf_qwen2vl, tmp_path):
    d, hf = hf_qwen2vl
    out = tmp_path / "q2vl.gguf"
    info = convert(str(d), str(out), out_type="f32")
    model = load_model(str(out), dtype=jnp.float32)

    rng = np.random.default_rng(1)
    px = rng.normal(size=(16, 3 * 2 * 4 * 4)).astype(np.float32)
    ids_before = [5, 7, VSTART]
    ids_after = [9, 11]
    input_ids = ids_before + [IMG_TOK] * 4 + ids_after

    pipe = Qwen2VLPipeline(model, info["mmproj"], max_seq=64)
    got = pipe.generate(ids_before, px, GRID, ids_after, max_new_tokens=6)

    with torch.no_grad():
        want = hf.generate(
            input_ids=torch.tensor(input_ids)[None],
            pixel_values=torch.tensor(px),
            image_grid_thw=torch.tensor([list(GRID)]),
            max_new_tokens=6, do_sample=False)[0][len(input_ids):].tolist()
    assert got == want


def test_qwen2vl_text_only_engine(hf_qwen2vl, tmp_path):
    """Text-only decode reduces M-RoPE to plain neox rope — the standard
    Engine path must match HF exactly."""
    d, hf = hf_qwen2vl
    out = tmp_path / "q2vl.gguf"
    convert(str(d), str(out), out_type="f32")
    model = load_model(str(out), dtype=jnp.float32)

    from sparkinfer_tpu.runtime import SamplerConfig
    from sparkinfer_tpu.runtime.engine import Engine

    toks = [5, 9, 3, 17, 2]
    eng = Engine(model, max_seq=32, sampler=SamplerConfig(temp=0.0),
                 kv_dtype=jnp.float32)
    got = eng.generate(toks, max_new_tokens=6)
    with torch.no_grad():
        want = hf.generate(torch.tensor(toks)[None], max_new_tokens=6,
                           do_sample=False)[0][len(toks):].tolist()
    assert got == want


# ---------------------------------------------------------------------------
# Qwen2.5-VL: windowed-attention vision tower (rms blocks, gated MLP)


GRID25 = (1, 8, 8)  # 64 patches -> 16 merged tokens; 4 attention windows


@pytest.fixture(scope="module")
def hf_qwen25vl(tmp_path_factory):
    import transformers as T

    torch.manual_seed(0)
    cfg = T.Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=160, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128,
            rope_theta=10000.0,
            rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]}),
        vision_config=dict(
            depth=4, hidden_size=32, out_hidden_size=64,
            intermediate_size=48, num_heads=4, in_channels=3, patch_size=4,
            temporal_patch_size=2, spatial_merge_size=2, window_size=16,
            fullatt_block_indexes=[2]),
        image_token_id=IMG_TOK, video_token_id=151,
        vision_start_token_id=VSTART, vision_end_token_id=148)
    hf = T.Qwen2_5_VLForConditionalGeneration(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("hf") / "tiny-q25vl"
    hf.save_pretrained(str(d), safe_serialization=True)
    return d, hf


def test_qwen25vl_vision_and_logit_parity(hf_qwen25vl, tmp_path):
    from sparkinfer_tpu.mtmd.qwen2vl import (load_qwen25vl_mmproj,
                                             make_qwen25vl_vision_forward)

    d, hf = hf_qwen25vl
    out = tmp_path / "q25vl.gguf"
    info = convert(str(d), str(out), out_type="f32")
    assert info["arch"] == "qwen2vl"

    model = load_model(str(out), dtype=jnp.float32)
    cfg = model.config
    assert cfg.mrope_sections == (2, 3, 3)

    rng = np.random.default_rng(0)
    px = rng.normal(size=(64, 3 * 2 * 4 * 4)).astype(np.float32)

    vcfg, vparams = load_qwen25vl_mmproj(info["mmproj"], jnp.float32)
    assert vcfg.window_size == 16 and vcfg.fullatt_idx == (2,)
    vfwd = jax.jit(make_qwen25vl_vision_forward(vcfg, GRID25))
    img = np.asarray(vfwd(vparams, jnp.asarray(px)))
    with torch.no_grad():
        vref = hf.model.visual(torch.tensor(px),
                               grid_thw=torch.tensor([list(GRID25)])).numpy()
    np.testing.assert_allclose(img, vref, rtol=4e-3, atol=4e-3)

    # spliced multimodal logits
    ids_before = [5, 7, VSTART]
    ids_after = [9, 11]
    input_ids = ids_before + [IMG_TOK] * 16 + ids_after
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(input_ids)[None],
                 pixel_values=torch.tensor(px),
                 image_grid_thw=torch.tensor([list(GRID25)])).logits[0].numpy()
    tok_embd = np.asarray(model.params["tok_embd"], np.float32)
    embeds = np.concatenate([tok_embd[np.asarray(ids_before)], img,
                             tok_embd[np.asarray(ids_after)]], 0)
    pos3, _ = mrope_positions(len(ids_before), GRID25, 2, len(ids_after))
    fwd = jax.jit(make_forward(cfg, inputs_embeds=True))
    T_ = embeds.shape[0]
    logits, _ = fwd(model.params, jnp.asarray(embeds)[None],
                    jnp.arange(T_, dtype=jnp.int32)[None],
                    init_cache(cfg, 1, 32, jnp.float32),
                    mrope_pos=jnp.asarray(pos3)[:, None, :])
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=4e-3, atol=4e-3)


# ---------------------------------------------------------------------------
# Qwen3-VL text stacks: INTERLEAVED M-RoPE (vision/deepstack not converted)


def _q3vl_cfg(T, moe=False):
    tc = dict(vocab_size=160, hidden_size=64, intermediate_size=96,
              num_hidden_layers=2, num_attention_heads=4,
              num_key_value_heads=2, head_dim=16,
              max_position_embeddings=128, rope_theta=10000.0,
              rope_scaling={"rope_type": "default", "mrope_section": [2, 3, 3],
                            "mrope_interleaved": True})
    if moe:
        tc.update(num_experts=4, num_experts_per_tok=2,
                  moe_intermediate_size=48, decoder_sparse_step=1,
                  mlp_only_layers=[])
    vc = dict(depth=2, hidden_size=32, out_hidden_size=64,
              intermediate_size=48, num_heads=4, in_channels=3,
              patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
              num_position_embeddings=16, deepstack_visual_indexes=[0])
    cls = T.Qwen3VLMoeConfig if moe else T.Qwen3VLConfig
    return cls(text_config=tc, vision_config=vc, image_token_id=IMG_TOK,
               video_token_id=151, vision_start_token_id=VSTART,
               vision_end_token_id=148)


@pytest.mark.parametrize("moe", [False, True])
def test_qwen3vl_text_parity(moe, tmp_path):
    import transformers as T

    torch.manual_seed(0)
    cls = (T.Qwen3VLMoeForConditionalGeneration if moe
           else T.Qwen3VLForConditionalGeneration)
    hf = cls(_q3vl_cfg(T, moe))
    hf.eval()
    d = tmp_path / "hf"
    hf.save_pretrained(str(d), safe_serialization=True)
    out = tmp_path / "q3vl.gguf"
    info = convert(str(d), str(out), out_type="f32")
    assert info["arch"] == ("qwen3vl-moe" if moe else "qwen3vl")

    model = load_model(str(out), dtype=jnp.float32)
    cfg = model.config
    assert cfg.mrope_interleaved and cfg.mrope_sections == (2, 3, 3)

    rng = np.random.default_rng(1)
    toks = rng.integers(0, 160, 9).astype(np.int64)
    # text-only: equal streams reduce interleaved M-RoPE to plain rope
    with torch.no_grad():
        ref = hf(torch.tensor(toks)[None]).logits[0].numpy()
    fwd = jax.jit(make_forward(cfg))
    logits, _ = fwd(model.params, jnp.asarray(toks, jnp.int32)[None],
                    jnp.arange(9, dtype=jnp.int32)[None],
                    init_cache(cfg, 1, 16, jnp.float32))
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=4e-3, atol=4e-3)

    # unequal streams exercise the INTERLEAVED layout itself
    pos3 = np.stack([np.arange(9), np.arange(9) // 2, np.arange(9) // 3]
                    ).astype(np.int64)
    with torch.no_grad():
        ref3 = hf(torch.tensor(toks)[None],
                  position_ids=torch.tensor(pos3)[:, None, :]
                  ).logits[0].numpy()
    fwd3 = jax.jit(make_forward(cfg))
    logits3, _ = fwd3(model.params, jnp.asarray(toks, jnp.int32)[None],
                      jnp.arange(9, dtype=jnp.int32)[None],
                      init_cache(cfg, 1, 16, jnp.float32),
                      mrope_pos=jnp.asarray(pos3, jnp.int32)[:, None, :])
    np.testing.assert_allclose(np.asarray(logits3)[0], ref3,
                               rtol=4e-3, atol=4e-3)


def test_qwen3vl_multimodal_deepstack_parity(tmp_path):
    """Full qwen3vl multimodal path: interpolated-pos ViT + deepstack
    mergers + per-layer injection + interleaved M-RoPE vs HF."""
    import transformers as T

    from sparkinfer_tpu.mtmd.qwen3vl import (Qwen3VLPipeline,
                                             load_qwen3vl_mmproj,
                                             make_qwen3vl_vision_forward,
                                             prepare_vision)

    torch.manual_seed(0)
    hf = T.Qwen3VLForConditionalGeneration(_q3vl_cfg(T))
    hf.eval()
    d = tmp_path / "hf"
    hf.save_pretrained(str(d), safe_serialization=True)
    out = tmp_path / "q3vl.gguf"
    info = convert(str(d), str(out), out_type="f32")
    assert info["n_mmproj_tensors"] > 0

    model = load_model(str(out), dtype=jnp.float32)
    cfg = model.config

    rng = np.random.default_rng(0)
    px = rng.normal(size=(16, 3 * 2 * 4 * 4)).astype(np.float32)
    grid = (1, 4, 4)

    # vision tower + deepstack taps
    vcfg, vparams = load_qwen3vl_mmproj(info["mmproj"], jnp.float32)
    assert vcfg.deepstack_idx == (0,)
    vp = prepare_vision(vcfg, vparams, grid)
    vfwd = jax.jit(make_qwen3vl_vision_forward(vcfg, grid))
    img, ds = vfwd(vp, jnp.asarray(px))
    with torch.no_grad():
        vref, ds_ref = hf.model.visual(torch.tensor(px),
                                       grid_thw=torch.tensor([list(grid)]))
    np.testing.assert_allclose(np.asarray(img), vref.numpy(),
                               rtol=4e-3, atol=4e-3)
    np.testing.assert_allclose(np.asarray(ds)[0], ds_ref[0].numpy(),
                               rtol=4e-3, atol=4e-3)

    # spliced logits incl. the per-layer deepstack injection
    ids_before = [5, 7, VSTART]
    ids_after = [9, 11]
    input_ids = ids_before + [IMG_TOK] * 4 + ids_after
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(input_ids)[None],
                 pixel_values=torch.tensor(px),
                 image_grid_thw=torch.tensor([list(grid)])).logits[0].numpy()

    pipe = Qwen3VLPipeline(model, info["mmproj"], max_seq=32)
    # reuse the pipeline's prefill plumbing for a logits check
    from sparkinfer_tpu.models.transformer import make_forward
    from sparkinfer_tpu.mtmd.qwen2vl import mrope_positions
    from sparkinfer_tpu.runtime.kv_cache import init_cache

    s, e = len(ids_before), len(ids_before) + 4
    tok_embd = np.asarray(model.params["tok_embd"], np.float32)
    embeds = np.concatenate([tok_embd[np.asarray(ids_before)],
                             np.asarray(img),
                             tok_embd[np.asarray(ids_after)]], 0)
    pos3, _ = mrope_positions(s, grid, 2, len(ids_after))
    L = cfg.n_layer
    ds_all = np.zeros((L, 4, embeds.shape[1]), np.float32)
    ds_all[:1] = np.asarray(ds)
    fwd = jax.jit(make_forward(cfg, inputs_embeds=True,
                               deepstack_slice=(s, e)))
    T_ = embeds.shape[0]
    logits, _ = fwd(model.params, jnp.asarray(embeds)[None],
                    jnp.arange(T_, dtype=jnp.int32)[None],
                    init_cache(cfg, 1, 16, jnp.float32),
                    mrope_pos=jnp.asarray(pos3)[:, None, :],
                    deepstack=jnp.asarray(ds_all))
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=4e-3, atol=4e-3)

    # pipeline greedy vs HF generate
    got = pipe.generate(ids_before, px, grid, ids_after, max_new_tokens=5)
    with torch.no_grad():
        want = hf.generate(
            input_ids=torch.tensor(input_ids)[None],
            pixel_values=torch.tensor(px),
            image_grid_thw=torch.tensor([list(grid)]),
            max_new_tokens=5, do_sample=False)[0][len(input_ids):].tolist()
    assert got == want
