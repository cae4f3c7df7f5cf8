"""Converter family breadth, validated against transformers itself: for
each supported HF architecture, build a tiny random model, save, convert
to GGUF, load in our engine, and compare full logits with the torch
forward. This exercises the whole chain per family — tensor mapping,
permutes/splits, trait semantics (qk-norm, post-norms, softcaps, scales,
SWA patterns, per-layer rope bases, NoPE, MoE routing/shared experts).

Reference scope: convert_hf_to_gguf.py Model subclasses + the per-arch
graph builders in src/models/*.cpp.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.models.transformer import make_forward
from sparkinfer_tpu.runtime.kv_cache import init_cache
from sparkinfer_tpu.tools.convert_hf import convert

COMMON = dict(
    vocab_size=160,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=128,
)


def _cfg(cls, **kw):
    merged = {**COMMON, **kw}
    return cls(**merged)


def _families():
    import transformers as T

    return {
        "qwen3": (T.Qwen3ForCausalLM, _cfg(T.Qwen3Config, head_dim=16)),
        "gemma": (T.GemmaForCausalLM, _cfg(T.GemmaConfig, head_dim=16)),
        "nemotron": (T.NemotronForCausalLM, _cfg(
            T.NemotronConfig, partial_rotary_factor=0.5)),
        "stablelm": (T.StableLmForCausalLM, _cfg(
            T.StableLmConfig, partial_rotary_factor=0.25)),
        "phi2": (T.PhiForCausalLM, _cfg(
            T.PhiConfig, num_key_value_heads=4, partial_rotary_factor=0.5)),
        "gemma2": (T.Gemma2ForCausalLM, _cfg(
            T.Gemma2Config, head_dim=16, query_pre_attn_scalar=16,
            sliding_window=32)),
        "gemma3": (T.Gemma3ForCausalLM, _cfg(
            T.Gemma3TextConfig, head_dim=16, query_pre_attn_scalar=16,
            sliding_window=16, rope_theta=1000000.0,
            rope_local_base_freq=10000.0, num_hidden_layers=7)),
        "olmo2": (T.Olmo2ForCausalLM, _cfg(T.Olmo2Config)),
        "command-r": (T.CohereForCausalLM, _cfg(
            T.CohereConfig, logit_scale=0.25, tie_word_embeddings=True)),
        "granitemoe": (T.GraniteMoeForCausalLM, _cfg(
            T.GraniteMoeConfig, num_local_experts=4, num_experts_per_tok=2,
            embedding_multiplier=2.0, residual_multiplier=0.5,
            logits_scaling=4.0, attention_multiplier=0.1)),
        "granite": (T.GraniteForCausalLM, _cfg(
            T.GraniteConfig, embedding_multiplier=2.0,
            residual_multiplier=0.5, logits_scaling=4.0,
            attention_multiplier=0.1)),
        "phi3": (T.Phi3ForCausalLM, _cfg(T.Phi3Config, pad_token_id=0)),
        "starcoder2": (T.Starcoder2ForCausalLM, _cfg(T.Starcoder2Config)),
        "mixtral": (T.MixtralForCausalLM, _cfg(
            T.MixtralConfig, num_local_experts=4, num_experts_per_tok=2)),
        "qwen2moe": (T.Qwen2MoeForCausalLM, _cfg(
            T.Qwen2MoeConfig, num_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=48, shared_expert_intermediate_size=64,
            decoder_sparse_step=1, mlp_only_layers=[])),
        "olmoe": (T.OlmoeForCausalLM, _cfg(
            T.OlmoeConfig, num_experts=4, num_experts_per_tok=2)),
        "smollm3": (T.SmolLM3ForCausalLM, _cfg(
            T.SmolLM3Config, num_hidden_layers=4, pad_token_id=0)),
        "ernie4_5": (T.Ernie4_5ForCausalLM, _cfg(T.Ernie4_5Config)),
        # olmo v1: non-parametric layernorm (checkpoint carries no norm
        # tensors), NEOX rope
        "olmo": (T.OlmoForCausalLM, _cfg(T.OlmoConfig)),
        # arcee (AFM): gateless relu^2 FFN
        "arcee": (T.ArceeForCausalLM, _cfg(T.ArceeConfig)),
        # seed-oss: attention bias + wide head_dim
        "seed_oss": (T.SeedOssForCausalLM, _cfg(
            T.SeedOssConfig, head_dim=16, attention_bias=True)),
        # glm-4.5 MoE: sigmoid router + correction bias, shared expert,
        # dense lead, qk-norm, partial rope, attention bias
        "glm4moe": (T.Glm4MoeForCausalLM, _cfg(
            T.Glm4MoeConfig, head_dim=16, num_hidden_layers=3,
            n_routed_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=48, n_shared_experts=1,
            first_k_dense_replace=1, use_qk_norm=True,
            attention_bias=True, partial_rotary_factor=0.5,
            routed_scaling_factor=1.5, pad_token_id=0)),
        "gpt-oss": (T.GptOssForCausalLM, _cfg(
            T.GptOssConfig, head_dim=16, num_local_experts=4,
            num_experts_per_tok=2, sliding_window=16, rope_scaling=None,
            num_hidden_layers=3, intermediate_size=64)),
        "qwen3moe": (T.Qwen3MoeForCausalLM, _cfg(
            T.Qwen3MoeConfig, head_dim=16, num_experts=4,
            num_experts_per_tok=2, moe_intermediate_size=48,
            decoder_sparse_step=1, mlp_only_layers=[])),
        # deepseek2-lite flavor: MLA without q-lora, 1 leading dense layer,
        # shared experts, softmax gating + routed scaling
        "deepseek2": (T.DeepseekV2ForCausalLM, _cfg(
            T.DeepseekV2Config, num_hidden_layers=3, q_lora_rank=None,
            kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
            v_head_dim=16, n_routed_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=48, n_shared_experts=1,
            first_k_dense_replace=1, moe_layer_freq=1,
            routed_scaling_factor=1.5, topk_method="greedy", n_group=1,
            topk_group=1, rope_scaling=None, attention_bias=False)),
        # chameleon: per-head LN qk-norm with (H, D) affine
        "chameleon": (T.ChameleonForConditionalGeneration, _cfg(
            T.ChameleonConfig, vocabulary_map={"a": 1}, pad_token_id=0,
            vq_config=dict(embed_dim=8, num_embeddings=16,
                           latent_channels=32, base_channels=32,
                           channel_multiplier=[1], num_res_blocks=1,
                           resolution=32))),
        # olmo3: olmo2 post-norm + full-width qk-norm + 3:1 swa pattern
        "olmo3": (T.Olmo3ForCausalLM, _cfg(
            T.Olmo3Config, num_hidden_layers=4, sliding_window=16,
            rope_scaling=None, pad_token_id=0)),
        # granitemoe + always-on fused shared MLP
        "granitemoeshared": (T.GraniteMoeSharedForCausalLM, _cfg(
            T.GraniteMoeSharedConfig, num_local_experts=4,
            num_experts_per_tok=2, shared_intermediate_size=48,
            embedding_multiplier=2.0, residual_multiplier=0.5,
            logits_scaling=4.0, attention_multiplier=0.1)),
        # hunyuan v1: per-head qk-norm applied AFTER rope
        "hunyuan-dense": (T.HunYuanDenseV1ForCausalLM, _cfg(
            T.HunYuanDenseV1Config, head_dim=16, pad_token_id=0)),
        "hunyuan-moe": (T.HunYuanMoEV1ForCausalLM, _cfg(
            T.HunYuanMoEV1Config, head_dim=16, num_experts=4, moe_topk=2,
            pad_token_id=0)),
        # bitnet b1.58: sub-norms + gated relu^2
        "bitnet": (T.BitNetForCausalLM, _cfg(T.BitNetConfig, pad_token_id=0)),
        # apertus: xIELU with per-layer learned coefficients, qk-norm
        "apertus": (T.ApertusForCausalLM, _cfg(T.ApertusConfig,
                                               rope_scaling=None,
                                               pad_token_id=0)),
        # exaone4: 3 sliding:1 global, global layers NoPE, qk-norm
        "exaone4": (T.Exaone4ForCausalLM, _cfg(
            T.Exaone4Config, head_dim=16, num_hidden_layers=4,
            sliding_window=16, sliding_window_pattern=4, pad_token_id=0)),
        # ernie 4.5 moe: softmax router + selection-only correction bias,
        # fused shared expert, leading dense layer
        "ernie4_5-moe": (T.Ernie4_5_MoeForCausalLM, _cfg(
            T.Ernie4_5_MoeConfig, num_hidden_layers=3,
            moe_num_experts=4, moe_k=2, moe_intermediate_size=48,
            moe_num_shared_experts=1, moe_layer_start_index=1,
            moe_layer_interval=1, pad_token_id=0)),
        # dots1: per-head qk-norm + sigmoid-routed MoE w/ correction bias
        "dots1": (T.Dots1ForCausalLM, _cfg(
            T.Dots1Config, head_dim=16, num_hidden_layers=3,
            n_routed_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=48, n_shared_experts=1,
            first_k_dense_replace=1, n_group=1, topk_group=1,
            routed_scaling_factor=1.5, norm_topk_prob=True,
            pad_token_id=0)),
        # dbrx: bias-less LN, fused clamped Wqkv, flat fused expert tensors
        "dbrx": (T.DbrxForCausalLM, T.DbrxConfig(
            d_model=64, n_heads=4, n_layers=2, max_seq_len=128,
            vocab_size=160,
            attn_config={"kv_n_heads": 2, "clip_qkv": 8.0,
                         "rope_theta": 10000.0},
            ffn_config={"ffn_hidden_size": 48, "moe_num_experts": 4,
                        "moe_top_k": 2})),
        # starcoder v1 (GPTBigCode): MQA, learned positions, fused c_attn
        "starcoder": (T.GPTBigCodeForCausalLM, T.GPTBigCodeConfig(
            vocab_size=160, n_positions=128, n_embd=64, n_layer=2, n_head=4,
            n_inner=96, multi_query=True)),
        "gptneox": (T.GPTNeoXForCausalLM, _cfg(
            T.GPTNeoXConfig, rotary_pct=0.5, use_parallel_residual=True,
            num_key_value_heads=4)),  # gptneox is MHA-only
        "bloom": (T.BloomForCausalLM, T.BloomConfig(
            vocab_size=160, hidden_size=64, n_layer=2, n_head=4,
            num_hidden_layers=2)),
        "mpt": (T.MptForCausalLM, T.MptConfig(
            vocab_size=160, d_model=64, n_layers=2, n_heads=4,
            expansion_ratio=2, max_seq_len=128)),
        "gptj": (T.GPTJForCausalLM, T.GPTJConfig(
            vocab_size=160, n_embd=64, n_layer=2, n_head=4, rotary_dim=8,
            n_positions=128)),
        "glm4": (T.Glm4ForCausalLM, _cfg(
            T.Glm4Config, head_dim=16, partial_rotary_factor=0.5,
            pad_token_id=0)),
        "cohere2": (T.Cohere2ForCausalLM, _cfg(
            T.Cohere2Config, logit_scale=0.25, tie_word_embeddings=True,
            sliding_window=16, sliding_window_pattern=4,
            num_hidden_layers=5)),
        # deepseek3 flavor: q-lora + sigmoid gating + score-correction bias
        "deepseek3": (T.DeepseekV3ForCausalLM, _cfg(
            T.DeepseekV3Config, num_hidden_layers=3, q_lora_rank=24,
            kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
            v_head_dim=16, n_routed_experts=8, num_experts_per_tok=2,
            moe_intermediate_size=48, n_shared_experts=1,
            first_k_dense_replace=1, moe_layer_freq=1,
            routed_scaling_factor=2.0, scoring_func="sigmoid",
            norm_topk_prob=True, n_group=1, topk_group=1,
            rope_scaling=None, attention_bias=False)),
    }


@pytest.mark.parametrize("family", sorted(_families()))
def test_family_logit_parity(family, tmp_path):
    cls, cfg_hf = _families()[family]
    torch.manual_seed(0)
    hf = cls(cfg_hf)
    hf.eval()
    d = tmp_path / "hf"
    hf.save_pretrained(str(d), safe_serialization=True)

    out = tmp_path / "m.gguf"
    info = convert(str(d), str(out), out_type="f32")
    alias = {"deepseek3": "deepseek2", "granitemoeshared": "granitemoe"}
    assert info["arch"] == alias.get(family, family)

    model = load_model(str(out), dtype=jnp.float32)
    cfg = model.config
    L = cfg_hf.num_hidden_layers
    assert cfg.n_layer == L

    rng = np.random.default_rng(1)
    n_tok = 9
    toks = rng.integers(0, COMMON["vocab_size"], n_tok).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(toks)[None]).logits[0].numpy()

    fwd = jax.jit(make_forward(cfg))
    logits, _ = fwd(
        model.params,
        jnp.asarray(toks, jnp.int32)[None],
        jnp.arange(n_tok, dtype=jnp.int32)[None],
        init_cache(cfg, 1, 32, jnp.float32),
    )
    got = np.asarray(logits)[0]
    np.testing.assert_allclose(got, ref, rtol=4e-3, atol=4e-3)


@pytest.mark.parametrize("mla_arch", ["minicpm3", "plm"])
def test_mla_arch_smoke(mla_arch, tmp_path):
    """minicpm3 (MLA + q-lora) and plm (MLA direct-q + relu^2 FFN) through
    the absorbed latent cache — direct GGUF, stepwise == full-sequence
    (ref src/models/minicpm3.cpp, src/models/plm.cpp)."""
    from sparkinfer_tpu.gguf.writer import GGUFWriter

    rng = np.random.default_rng(0)
    E, H, qr, R, Dn, Dr, Dv, F, L, V = 64, 4, 24, 32, 16, 8, 16, 96, 2, 160
    Dk = Dn + Dr
    if mla_arch == "plm":
        qr = 0  # direct q projection

    def w(*shape):
        return (rng.standard_normal(shape) * 0.08).astype(np.float32)

    wr = GGUFWriter(str(tmp_path / "m3.gguf"), mla_arch)
    for k, v in (("block_count", L), ("embedding_length", E),
                 ("attention.head_count", H), ("attention.head_count_kv", H),
                 ("feed_forward_length", F), ("vocab_size", V),
                 ("context_length", 128), ("attention.key_length", Dk),
                 ("rope.dimension_count", Dr),
                 ("attention.q_lora_rank", qr),
                 ("attention.kv_lora_rank", R),
                 ("attention.value_length", Dv)):
        wr.add_kv(f"{mla_arch}.{k}", np.uint32(v))
    wr.add_kv(f"{mla_arch}.attention.layer_norm_rms_epsilon",
              np.float32(1e-5))
    wr.add_kv(f"{mla_arch}.rope.freq_base", np.float32(10000.0))
    wr.add_tensor("token_embd.weight", w(V, E))
    wr.add_tensor("output_norm.weight", 1.0 + 0.1 * w(E))
    wr.add_tensor("output.weight", w(V, E))
    for i in range(L):
        p = f"blk.{i}."
        wr.add_tensor(p + "attn_norm.weight", 1.0 + 0.1 * w(E))
        if qr > 0:
            wr.add_tensor(p + "attn_q_a.weight", w(qr, E))
            wr.add_tensor(p + "attn_q_a_norm.weight", 1.0 + 0.1 * w(qr))
            wr.add_tensor(p + "attn_q_b.weight", w(H * Dk, qr))
        else:
            wr.add_tensor(p + "attn_q.weight", w(H * Dk, E))
        wr.add_tensor(p + "attn_kv_a_mqa.weight", w(R + Dr, E))
        wr.add_tensor(p + "attn_kv_a_norm.weight", 1.0 + 0.1 * w(R))
        wr.add_tensor(p + "attn_kv_b.weight", w(H * (Dn + Dv), R))
        wr.add_tensor(p + "attn_output.weight", w(E, H * Dv))
        wr.add_tensor(p + "ffn_norm.weight", 1.0 + 0.1 * w(E))
        wr.add_tensor(p + "ffn_up.weight", w(F, E))
        if mla_arch != "plm":  # plm: ungated relu^2
            wr.add_tensor(p + "ffn_gate.weight", w(F, E))
        wr.add_tensor(p + "ffn_down.weight", w(E, F))
    wr.write()

    model = load_model(str(tmp_path / "m3.gguf"), dtype=jnp.float32)
    cfg = model.config
    assert cfg.q_lora_rank == qr and cfg.kv_lora_rank == R
    fwd = jax.jit(make_forward(cfg))
    toks = np.random.default_rng(1).integers(0, V, 6).astype(np.int32)
    full, _ = fwd(model.params, jnp.asarray(toks)[None],
                  jnp.arange(6, dtype=jnp.int32)[None],
                  init_cache(cfg, 1, 8, jnp.float32))
    assert np.isfinite(np.asarray(full)).all()
    cache = init_cache(cfg, 1, 8, jnp.float32)
    outs = []
    for t, tok in enumerate(toks):
        lg, cache = fwd(model.params, jnp.asarray([[tok]], jnp.int32),
                        jnp.full((1, 1), t, jnp.int32), cache)
        outs.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.stack(outs), np.asarray(full[0]),
                               rtol=2e-4, atol=2e-4)


def test_bert_encoder_parity(tmp_path):
    """bert (encoder-only, post-norm, bidirectional, WPM family — ref
    src/models/bert.cpp): hidden states must match HF BertModel exactly,
    including with right-padding excluded via position -1 masking."""
    import transformers as T

    torch.manual_seed(0)
    cfg_hf = T.BertConfig(
        vocab_size=160, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64, hidden_act="gelu")
    hf = T.BertModel(cfg_hf)
    hf.eval()
    d = tmp_path / "hf"
    hf.save_pretrained(str(d), safe_serialization=True)
    out = tmp_path / "m.gguf"
    info = convert(str(d), str(out), out_type="f32")
    assert info["arch"] == "bert"

    model = load_model(str(out), dtype=jnp.float32)
    cfg = model.config
    assert cfg.traits.non_causal and cfg.traits.post_norm

    rng = np.random.default_rng(1)
    n_tok = 9
    toks = rng.integers(0, 160, n_tok).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(toks)[None]).last_hidden_state[0].numpy()

    fwd = jax.jit(make_forward(cfg, with_hidden=True))
    _, _, hidden = fwd(
        model.params,
        jnp.asarray(toks, jnp.int32)[None],
        jnp.arange(n_tok, dtype=jnp.int32)[None],
        init_cache(cfg, 1, 16, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(hidden)[0], ref,
                               rtol=4e-3, atol=4e-3)

    # right-padding with position -1 must not perturb the real tokens
    # (bidirectional attention would otherwise read the pad keys)
    Tpad = 16
    toks_p = np.zeros((1, Tpad), np.int32)
    toks_p[0, :n_tok] = toks
    pos_p = np.arange(Tpad, dtype=np.int32)[None].copy()
    pos_p[0, n_tok:] = -1
    _, _, hidden_p = fwd(model.params, jnp.asarray(toks_p),
                         jnp.asarray(pos_p),
                         init_cache(cfg, 1, Tpad, jnp.float32))
    np.testing.assert_allclose(np.asarray(hidden_p)[0, :n_tok], ref,
                               rtol=4e-3, atol=4e-3)

    # Embedder pooling path end-to-end
    from sparkinfer_tpu.runtime.embeddings import Embedder

    emb = Embedder(model, max_seq=32, pooling="mean")
    v = emb.embed_tokens([list(map(int, toks))])
    want = ref.mean(0)
    want = want / np.linalg.norm(want)
    np.testing.assert_allclose(v[0], want, rtol=4e-3, atol=4e-3)


def test_bert_reranker_parity(tmp_path):
    """BertForSequenceClassification -> cls/cls.output rank head: the
    Embedder 'rank' pooling must match HF classification logits (the
    /rerank endpoint's scoring path; ref build_pooling RANK)."""
    import transformers as T

    torch.manual_seed(0)
    cfg_hf = T.BertConfig(
        vocab_size=160, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64, hidden_act="gelu", num_labels=1)
    hf = T.BertForSequenceClassification(cfg_hf)
    hf.eval()
    d = tmp_path / "hf"
    hf.save_pretrained(str(d), safe_serialization=True)
    out = tmp_path / "m.gguf"
    convert(str(d), str(out), out_type="f32")

    model = load_model(str(out), dtype=jnp.float32)
    assert "cls_w" in model.params and "cls_out_w" in model.params

    from sparkinfer_tpu.runtime.embeddings import Embedder

    emb = Embedder(model, max_seq=32, pooling="rank")
    rng = np.random.default_rng(4)
    toks = [list(map(int, rng.integers(0, 160, n))) for n in (5, 9)]
    scores = [float(emb.embed_tokens([t], normalize=False)[0][0])
              for t in toks]
    with torch.no_grad():
        want = [float(hf(torch.tensor(t)[None]).logits[0, 0]) for t in toks]
    np.testing.assert_allclose(scores, want, rtol=4e-3, atol=4e-3)


def test_mla_latent_cache_decode_and_memory(tmp_path):
    """The absorbed MLA cache (one R+Dr latent slot per token, no per-head
    K/V) must decode stepwise exactly like full-sequence prefill, and be
    far smaller than a dense cache would be."""
    import torch
    import transformers as T
    from sparkinfer_tpu.runtime.kv_cache import init_cache

    torch.manual_seed(0)
    cfg_hf = _cfg(T.DeepseekV2Config, num_hidden_layers=2, q_lora_rank=None,
                  kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
                  v_head_dim=16, n_routed_experts=4, num_experts_per_tok=2,
                  moe_intermediate_size=48, n_shared_experts=1,
                  first_k_dense_replace=2, moe_layer_freq=1,
                  topk_method="greedy", n_group=1, topk_group=1,
                  rope_scaling=None, attention_bias=False)
    hf = T.DeepseekV2ForCausalLM(cfg_hf)
    hf.eval()
    d = tmp_path / "hf"
    hf.save_pretrained(str(d), safe_serialization=True)
    out = tmp_path / "m.gguf"
    convert(str(d), str(out), out_type="f32")
    model = load_model(str(out), dtype=jnp.float32)
    cfg = model.config

    cache = init_cache(cfg, 1, 32, jnp.float32)
    # latent slot: kv_lora_rank + rope_dim, ONE head
    assert cache.k.shape[-2:] == (1, 32 + 8)
    assert cache.v.shape[-1] == 0
    dense_bytes = cfg.n_layer * 32 * cfg.n_head * cfg.head_dim * 2 * 4
    # tiny test dims give (R+Dr)/(2*H*Dk) ~ 0.21; real deepseek2 dims
    # (H=16..128, Dk=192, R=512) put this near 0.01-0.09
    assert cache.k.nbytes + cache.v.nbytes < 0.25 * dense_bytes

    fwd = jax.jit(make_forward(cfg))
    rng = np.random.default_rng(2)
    toks = rng.integers(0, COMMON["vocab_size"], 7).astype(np.int32)
    full, _ = fwd(model.params, jnp.asarray(toks)[None],
                  jnp.arange(7, dtype=jnp.int32)[None], cache)
    cache2 = init_cache(cfg, 1, 32, jnp.float32)
    outs = []
    for t, tok in enumerate(toks):
        lg, cache2 = fwd(model.params, jnp.asarray([[tok]], jnp.int32),
                         jnp.full((1, 1), t, jnp.int32), cache2)
        outs.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.stack(outs), np.asarray(full[0]),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("arch", ["internlm2", "minicpm", "exaone",
                                  "smollm", "tinyllama", "olmo2",
                                  "xverse", "baichuan", "seed_oss",
                                  "arcee", "orion", "olmo", "qwen",
                                  "jais", "codeshell", "refact",
                                  "deepseek", "llada-moe", "rnd1",
                                  "bailingmoe", "pangu-embedded",
                                  "minimax-m2", "neo-bert", "plamo",
                                  "bailingmoe2", "gemma-embedding", "grok",
                                  "openelm", "smallthinker",
                                  "cogvlm"])
def test_direct_gguf_arch_smoke(arch, tmp_path):
    """Trait-only (llama-shaped) archs load and run from a direct GGUF —
    no converter needed (llama.cpp-produced GGUFs of these archs use the
    standard tensor names)."""
    import sys

    sys.path.insert(0, "tests")
    from model_fixtures import make_tiny_llama

    p = tmp_path / f"{arch}.gguf"
    from sparkinfer_tpu.models.config import ARCH_REGISTRY
    tr = ARCH_REGISTRY[arch]
    kw = {}
    if tr.fused_qkv:  # qwen v1 / jais / codeshell: fused [Q;K;V]
        kw = dict(fused_qkv=True, n_head_kv=4, n_head=4)
    if arch in ("deepseek", "llada-moe", "rnd1", "bailingmoe",
                "minimax-m2", "bailingmoe2", "grok", "smallthinker"):
        kw = dict(n_expert=4, n_expert_used=2)
    if arch == "gemma-embedding":
        kw = dict(extra_kv={"gemma-embedding.attention.sliding_window": 8,
                            "gemma-embedding.rope.freq_base_swa": 10000.0})
    make_tiny_llama(p, arch=arch, **kw)
    model = load_model(str(p), dtype=jnp.float32)
    assert model.config.arch == arch
    fwd = jax.jit(make_forward(model.config))
    toks = jnp.asarray([[3, 5, 7]], jnp.int32)
    lg, _ = fwd(model.params, toks, jnp.arange(3, dtype=jnp.int32)[None],
                init_cache(model.config, 1, 8, jnp.float32))
    assert np.isfinite(np.asarray(lg)).all()


def test_deci_nas_smoke(tmp_path):
    """deci (ref src/models/deci.cpp): per-layer NAS head counts — one
    GQA layer, one ATTENTION-FREE layer, one MQA layer with a narrower
    FFN; direct GGUF, stepwise == full through the sliced KV cache."""
    from sparkinfer_tpu.gguf.constants import GGMLType
    from sparkinfer_tpu.gguf.writer import GGUFWriter

    rng = np.random.default_rng(0)
    E, D, V = 64, 16, 120
    heads = [4, 0, 4]
    kv = [2, 0, 1]
    ffs = [96, 48, 96]

    def w(*shape):
        return (rng.standard_normal(shape) * 0.1).astype(np.float32)

    wr = GGUFWriter(str(tmp_path / "deci.gguf"), "deci")
    wr.add_kv("deci.block_count", np.uint32(3))
    wr.add_kv("deci.embedding_length", np.uint32(E))
    wr.add_array("deci.attention.head_count", np.asarray(heads, np.uint32))
    wr.add_array("deci.attention.head_count_kv", np.asarray(kv, np.uint32))
    wr.add_array("deci.feed_forward_length", np.asarray(ffs, np.uint32))
    wr.add_kv("deci.vocab_size", np.uint32(V))
    wr.add_kv("deci.context_length", np.uint32(128))
    wr.add_kv("deci.attention.key_length", np.uint32(D))
    wr.add_kv("deci.attention.layer_norm_rms_epsilon", np.float32(1e-5))
    wr.add_kv("deci.rope.freq_base", np.float32(10000.0))
    wr.add_kv("deci.rope.dimension_count", np.uint32(D))
    wr.add_tensor("token_embd.weight", w(V, E), GGMLType.F32)
    wr.add_tensor("output_norm.weight", 1.0 + 0.1 * w(E), GGMLType.F32)
    wr.add_tensor("output.weight", w(V, E), GGMLType.F32)
    for i in range(3):
        p = f"blk.{i}."
        wr.add_tensor(p + "attn_norm.weight", 1.0 + 0.1 * w(E), GGMLType.F32)
        if heads[i] > 0:
            wr.add_tensor(p + "attn_q.weight", w(heads[i] * D, E), GGMLType.F32)
            wr.add_tensor(p + "attn_k.weight", w(kv[i] * D, E), GGMLType.F32)
            wr.add_tensor(p + "attn_v.weight", w(kv[i] * D, E), GGMLType.F32)
            wr.add_tensor(p + "attn_output.weight", w(E, heads[i] * D),
                          GGMLType.F32)
        wr.add_tensor(p + "ffn_norm.weight", 1.0 + 0.1 * w(E), GGMLType.F32)
        wr.add_tensor(p + "ffn_up.weight", w(ffs[i], E), GGMLType.F32)
        wr.add_tensor(p + "ffn_gate.weight", w(ffs[i], E), GGMLType.F32)
        wr.add_tensor(p + "ffn_down.weight", w(E, ffs[i]), GGMLType.F32)
    wr.write()

    model = load_model(str(tmp_path / "deci.gguf"), dtype=jnp.float32)
    cfg = model.config
    assert cfg.n_head_arr == (4, 0, 4) and cfg.n_head_kv_arr == (2, 0, 1)
    assert cfg.n_ff_arr == (96, 48, 96)
    assert "layer_segments" in model.params  # heterogeneous stacks

    fwd = jax.jit(make_forward(cfg))
    toks = np.random.default_rng(1).integers(0, 120, 6).astype(np.int32)
    full, _ = fwd(model.params, jnp.asarray(toks)[None],
                  jnp.arange(6, dtype=jnp.int32)[None],
                  init_cache(cfg, 1, 8, jnp.float32))
    assert np.isfinite(np.asarray(full)).all()
    cache = init_cache(cfg, 1, 8, jnp.float32)
    outs = []
    for t, tok in enumerate(toks):
        lg, cache = fwd(model.params, jnp.asarray([[tok]], jnp.int32),
                        jnp.full((1, 1), t, jnp.int32), cache)
        outs.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.stack(outs), np.asarray(full[0]),
                               rtol=2e-4, atol=2e-4)


def test_arctic_parallel_moe_smoke(tmp_path):
    """arctic (ref src/models/arctic.cpp): dense FFN in-block + a parallel
    residual MoE over ffn_norm_exps(layer input) — direct GGUF smoke,
    stepwise == full."""
    import sys

    sys.path.insert(0, "tests")
    from model_fixtures import make_tiny_llama

    rng = np.random.default_rng(7)
    E, F = 64, 96
    extra = {}
    for i in range(2):
        p = f"blk.{i}."
        extra[p + "ffn_norm_exps.weight"] = (
            1.0 + 0.1 * rng.standard_normal(E)).astype(np.float32)
        extra[p + "ffn_up.weight"] = (
            0.08 * rng.standard_normal((F, E))).astype(np.float32)
        extra[p + "ffn_gate.weight"] = (
            0.08 * rng.standard_normal((F, E))).astype(np.float32)
        extra[p + "ffn_down.weight"] = (
            0.08 * rng.standard_normal((E, F))).astype(np.float32)
    p = tmp_path / "arctic.gguf"
    make_tiny_llama(p, arch="arctic", n_expert=4, n_expert_used=2,
                    extra_tensors=extra)
    model = load_model(str(p), dtype=jnp.float32)
    cfg = model.config
    assert cfg.traits.parallel_moe and cfg.n_expert == 4
    lp0 = model.params["layers"]
    assert "ffn_norm_exps_w" in lp0 and "w_up" in lp0 and "w_router" in lp0

    fwd = jax.jit(make_forward(cfg))
    toks = np.random.default_rng(1).integers(0, 199, 6).astype(np.int32)
    full, _ = fwd(model.params, jnp.asarray(toks)[None],
                  jnp.arange(6, dtype=jnp.int32)[None],
                  init_cache(cfg, 1, 8, jnp.float32))
    assert np.isfinite(np.asarray(full)).all()
    cache = init_cache(cfg, 1, 8, jnp.float32)
    outs = []
    for t, tok in enumerate(toks):
        lg, cache = fwd(model.params, jnp.asarray([[tok]], jnp.int32),
                        jnp.full((1, 1), t, jnp.int32), cache)
        outs.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.stack(outs), np.asarray(full[0]),
                               rtol=2e-4, atol=2e-4)


def test_afmoe_smoke(tmp_path):
    """afmoe (ref src/models/afmoe.cpp): sigmoid attention gate off the
    normed stream, qk-norm, NoPE layers, post-norms, dense-lead sigmoid
    MoE with shared experts — direct GGUF, stepwise == full."""
    from sparkinfer_tpu.gguf.constants import GGMLType
    from sparkinfer_tpu.gguf.writer import GGUFWriter

    rng = np.random.default_rng(0)
    E, H, Hkv, D, F, Fx, X, V, L = 64, 4, 2, 16, 96, 48, 4, 120, 3

    def w(*shape):
        return (rng.standard_normal(shape) * 0.1).astype(np.float32)

    wr = GGUFWriter(str(tmp_path / "afmoe.gguf"), "afmoe")
    for k, v in (("block_count", L), ("embedding_length", E),
                 ("attention.head_count", H),
                 ("attention.head_count_kv", Hkv),
                 ("feed_forward_length", F), ("vocab_size", V),
                 ("context_length", 128), ("attention.key_length", D),
                 ("rope.dimension_count", D),
                 ("leading_dense_block_count", 1), ("expert_count", X),
                 ("expert_used_count", 2), ("expert_feed_forward_length", Fx),
                 ("expert_shared_count", 1), ("expert_gating_func", 2)):
        wr.add_kv(f"afmoe.{k}", np.uint32(v))
    wr.add_kv("afmoe.attention.layer_norm_rms_epsilon", np.float32(1e-5))
    wr.add_kv("afmoe.rope.freq_base", np.float32(10000.0))
    wr.add_kv("afmoe.expert_weights_scale", np.float32(2.826))
    wr.add_array("afmoe.nope_layers", np.asarray([0, 0, 1], np.uint32))
    wr.add_tensor("token_embd.weight", w(V, E), GGMLType.F32)
    wr.add_tensor("output_norm.weight", 1.0 + 0.1 * w(E), GGMLType.F32)
    wr.add_tensor("output.weight", w(V, E), GGMLType.F32)
    for i in range(L):
        p = f"blk.{i}."
        wr.add_tensor(p + "attn_norm.weight", 1.0 + 0.1 * w(E), GGMLType.F32)
        wr.add_tensor(p + "attn_q.weight", w(H * D, E), GGMLType.F32)
        wr.add_tensor(p + "attn_k.weight", w(Hkv * D, E), GGMLType.F32)
        wr.add_tensor(p + "attn_v.weight", w(Hkv * D, E), GGMLType.F32)
        wr.add_tensor(p + "attn_gate.weight", w(H * D, E), GGMLType.F32)
        wr.add_tensor(p + "attn_q_norm.weight", 1.0 + 0.1 * w(D), GGMLType.F32)
        wr.add_tensor(p + "attn_k_norm.weight", 1.0 + 0.1 * w(D), GGMLType.F32)
        wr.add_tensor(p + "attn_output.weight", w(E, H * D), GGMLType.F32)
        wr.add_tensor(p + "attn_post_norm.weight", 1.0 + 0.1 * w(E),
                      GGMLType.F32)
        wr.add_tensor(p + "ffn_norm.weight", 1.0 + 0.1 * w(E), GGMLType.F32)
        wr.add_tensor(p + "ffn_post_norm.weight", 1.0 + 0.1 * w(E),
                      GGMLType.F32)
        if i == 0:  # dense lead
            wr.add_tensor(p + "ffn_up.weight", w(F, E), GGMLType.F32)
            wr.add_tensor(p + "ffn_gate.weight", w(F, E), GGMLType.F32)
            wr.add_tensor(p + "ffn_down.weight", w(E, F), GGMLType.F32)
        else:
            wr.add_tensor(p + "ffn_gate_inp.weight", w(X, E), GGMLType.F32)
            wr.add_tensor(p + "exp_probs_b.bias", w(X), GGMLType.F32)
            wr.add_tensor(p + "ffn_up_exps.weight", w(X, Fx, E), GGMLType.F32)
            wr.add_tensor(p + "ffn_gate_exps.weight", w(X, Fx, E),
                          GGMLType.F32)
            wr.add_tensor(p + "ffn_down_exps.weight", w(X, E, Fx),
                          GGMLType.F32)
            wr.add_tensor(p + "ffn_up_shexp.weight", w(Fx, E), GGMLType.F32)
            wr.add_tensor(p + "ffn_gate_shexp.weight", w(Fx, E), GGMLType.F32)
            wr.add_tensor(p + "ffn_down_shexp.weight", w(E, Fx), GGMLType.F32)
    wr.write()

    model = load_model(str(tmp_path / "afmoe.gguf"), dtype=jnp.float32)
    cfg = model.config
    assert cfg.expert_gating == "sigmoid" and cfg.n_dense_lead == 1
    assert cfg.nope_layers == (0, 0, 1)

    fwd = jax.jit(make_forward(cfg))
    toks = np.random.default_rng(1).integers(0, V, 6).astype(np.int32)
    full, _ = fwd(model.params, jnp.asarray(toks)[None],
                  jnp.arange(6, dtype=jnp.int32)[None],
                  init_cache(cfg, 1, 8, jnp.float32))
    assert np.isfinite(np.asarray(full)).all()
    cache = init_cache(cfg, 1, 8, jnp.float32)
    outs = []
    for t, tok in enumerate(toks):
        lg, cache = fwd(model.params, jnp.asarray([[tok]], jnp.int32),
                        jnp.full((1, 1), t, jnp.int32), cache)
        outs.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.stack(outs), np.asarray(full[0]),
                               rtol=2e-4, atol=2e-4)


def test_grovemoe_smoke(tmp_path):
    """grovemoe (ref src/models/grovemoe.cpp): adjugate chunk experts on
    the routed output, expert id // experts_per_group, group scale."""
    import sys

    sys.path.insert(0, "tests")
    from model_fixtures import make_tiny_llama

    rng = np.random.default_rng(9)
    E, Fx, X, Xc = 64, 96, 4, 2
    extra = {}
    for i in range(2):
        p = f"blk.{i}."
        for nm, shape in (("ffn_up_chexps.weight", (Xc, Fx, E)),
                          ("ffn_gate_chexps.weight", (Xc, Fx, E)),
                          ("ffn_down_chexps.weight", (Xc, E, Fx))):
            extra[p + nm] = (0.08 * rng.standard_normal(shape)).astype(
                np.float32)
    p = tmp_path / "grove.gguf"
    make_tiny_llama(p, arch="grovemoe", n_expert=X, n_expert_used=2,
                    extra_tensors=extra,
                    extra_kv={"grovemoe.experts_per_group": 2,
                              "grovemoe.expert_group_scale": np.float32(0.05)})
    model = load_model(str(p), dtype=jnp.float32)
    cfg = model.config
    assert cfg.n_group_experts == 2 and cfg.expert_group_scale > 0
    assert "w_up_chexps" in model.params["layers"]

    fwd = jax.jit(make_forward(cfg))
    toks = np.random.default_rng(1).integers(0, 199, 6).astype(np.int32)
    full, _ = fwd(model.params, jnp.asarray(toks)[None],
                  jnp.arange(6, dtype=jnp.int32)[None],
                  init_cache(cfg, 1, 8, jnp.float32))
    assert np.isfinite(np.asarray(full)).all()
    # the adjugate path must actually contribute
    cfg0 = cfg
    import dataclasses as dc

    lg0, _ = jax.jit(make_forward(dc.replace(cfg0, expert_group_scale=0.0)))(
        model.params, jnp.asarray(toks)[None],
        jnp.arange(6, dtype=jnp.int32)[None],
        init_cache(cfg, 1, 8, jnp.float32))
    assert np.abs(np.asarray(full) - np.asarray(lg0)).max() > 1e-6


def test_plamo2_hybrid_smoke(tmp_path):
    """plamo2 (ref src/models/plamo2.cpp): per-head mamba with post-conv
    B/C/dt norms + fused-qkv attention, post-norms around both blocks —
    direct GGUF, stepwise == full."""
    from sparkinfer_tpu.gguf.constants import GGMLType
    from sparkinfer_tpu.gguf.writer import GGUFWriter
    from sparkinfer_tpu.models.hybrid import (init_hybrid_cache,
                                              make_hybrid_forward)

    rng = np.random.default_rng(0)
    E, H, Hkv, D, F, V = 64, 4, 2, 16, 96, 120
    DIN, DS, NH, DC, DTD = 64, 8, 8, 4, 64  # dt_dim = max(64, E/16)

    def w(*shape):
        return (rng.standard_normal(shape) * 0.1).astype(np.float32)

    wr = GGUFWriter(str(tmp_path / "plamo2.gguf"), "plamo2")
    wr.add_kv("plamo2.block_count", np.uint32(2))
    wr.add_kv("plamo2.embedding_length", np.uint32(E))
    wr.add_kv("plamo2.attention.head_count", np.uint32(H))
    wr.add_array("plamo2.attention.head_count_kv",
                 np.asarray([0, Hkv], np.uint32))  # [mamba, attention]
    wr.add_kv("plamo2.feed_forward_length", np.uint32(F))
    wr.add_kv("plamo2.vocab_size", np.uint32(V))
    wr.add_kv("plamo2.context_length", np.uint32(128))
    wr.add_kv("plamo2.attention.key_length", np.uint32(D))
    wr.add_kv("plamo2.attention.layer_norm_rms_epsilon", np.float32(1e-5))
    wr.add_kv("plamo2.rope.freq_base", np.float32(10000.0))
    wr.add_kv("plamo2.rope.dimension_count", np.uint32(D))
    wr.add_kv("plamo2.ssm.inner_size", np.uint32(DIN))
    wr.add_kv("plamo2.ssm.state_size", np.uint32(DS))
    wr.add_kv("plamo2.ssm.conv_kernel", np.uint32(DC))
    wr.add_kv("plamo2.ssm.time_step_rank", np.uint32(NH))
    wr.add_tensor("token_embd.weight", w(V, E), GGMLType.F32)
    wr.add_tensor("output_norm.weight", 1.0 + 0.1 * w(E), GGMLType.F32)
    wr.add_tensor("output.weight", w(V, E), GGMLType.F32)
    for i in range(2):
        p = f"blk.{i}."
        wr.add_tensor(p + "attn_norm.weight", 1.0 + 0.1 * w(E), GGMLType.F32)
        wr.add_tensor(p + "attn_post_norm.weight", 1.0 + 0.1 * w(E),
                      GGMLType.F32)
        wr.add_tensor(p + "ffn_norm.weight", 1.0 + 0.1 * w(E), GGMLType.F32)
        wr.add_tensor(p + "ffn_post_norm.weight", 1.0 + 0.1 * w(E),
                      GGMLType.F32)
        wr.add_tensor(p + "ffn_up.weight", w(F, E), GGMLType.F32)
        wr.add_tensor(p + "ffn_gate.weight", w(F, E), GGMLType.F32)
        wr.add_tensor(p + "ffn_down.weight", w(E, F), GGMLType.F32)
    p = "blk.0."
    wr.add_tensor(p + "ssm_in.weight", w(2 * DIN, E), GGMLType.F32)
    wr.add_tensor(p + "ssm_conv1d.weight", w(DIN, DC), GGMLType.F32)
    wr.add_tensor(p + "ssm_x.weight", w(2 * DS + DTD, DIN), GGMLType.F32)
    wr.add_tensor(p + "ssm_dt.weight", w(NH, DTD), GGMLType.F32)
    wr.add_tensor(p + "ssm_dt.bias", w(NH), GGMLType.F32)
    wr.add_tensor(p + "ssm_a", -np.exp(w(NH)), GGMLType.F32)
    wr.add_tensor(p + "ssm_d", 1.0 + 0.1 * w(NH), GGMLType.F32)
    wr.add_tensor(p + "ssm_dt_norm.weight", 1.0 + 0.1 * w(DTD), GGMLType.F32)
    wr.add_tensor(p + "ssm_b_norm.weight", 1.0 + 0.1 * w(DS), GGMLType.F32)
    wr.add_tensor(p + "ssm_c_norm.weight", 1.0 + 0.1 * w(DS), GGMLType.F32)
    wr.add_tensor(p + "ssm_out.weight", w(E, DIN), GGMLType.F32)
    p = "blk.1."
    wr.add_tensor(p + "attn_qkv.weight", w((H + 2 * Hkv) * D, E),
                  GGMLType.F32)
    wr.add_tensor(p + "attn_q_norm.weight", 1.0 + 0.1 * w(D), GGMLType.F32)
    wr.add_tensor(p + "attn_k_norm.weight", 1.0 + 0.1 * w(D), GGMLType.F32)
    wr.add_tensor(p + "attn_output.weight", w(E, H * D), GGMLType.F32)
    wr.write()

    model = load_model(str(tmp_path / "plamo2.gguf"), dtype=jnp.float32)
    cfg = model.config
    assert cfg.arch == "plamo2" and cfg.n_head_kv_arr == (0, 2)

    fwd = jax.jit(make_hybrid_forward(cfg))
    toks = np.random.default_rng(1).integers(0, V, 6).astype(np.int32)
    full, _ = fwd(model.params, jnp.asarray(toks)[None],
                  jnp.arange(6, dtype=jnp.int32)[None],
                  init_hybrid_cache(cfg, 1, 16, jnp.float32))
    assert np.isfinite(np.asarray(full)).all()
    cache = init_hybrid_cache(cfg, 1, 16, jnp.float32)
    outs = []
    for t, tok in enumerate(toks):
        lg, cache = fwd(model.params, jnp.asarray([[tok]], jnp.int32),
                        jnp.full((1, 1), t, jnp.int32), cache)
        outs.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.stack(outs), np.asarray(full[0]),
                               rtol=2e-4, atol=2e-4)


def test_cogvlm_vision_expert_wired(tmp_path):
    """cogvlm vision-expert stream (round-3 arch residue): an image
    ubatch runs the SAME block graph with the vis_* weights
    (src/models/cogvlm.cpp:27-44). Oracle: a second cogvlm GGUF whose
    TEXT weights ARE the vision weights (same seed => identical
    everything else) must produce identical logits through the normal
    text path — two independent loader paths pin the wiring."""
    import sys

    sys.path.insert(0, "tests")
    from model_fixtures import make_tiny_llama

    from sparkinfer_tpu.models.transformer import cogvlm_vision_params

    rng = np.random.default_rng(77)
    E, F, L, H = 64, 96, 2, 4
    D = E // H

    def w(*shape):
        return (rng.standard_normal(shape) * 0.08).astype(np.float32)

    vis = {}
    for i in range(L):
        p = f"blk.{i}."
        vis[p + "vis_attn_qkv.weight"] = w(3 * E, E)
        vis[p + "vis_attn_output.weight"] = w(E, E)
        vis[p + "vis_up.weight"] = w(F, E)
        vis[p + "vis_gate.weight"] = w(F, E)
        vis[p + "vis_down.weight"] = w(E, F)

    pa = tmp_path / "cogvlm-a.gguf"
    make_tiny_llama(pa, arch="cogvlm", fused_qkv=True, n_head=H,
                    n_head_kv=H, n_ff=F, seed=3, extra_tensors=vis)
    # B: text weights OVERRIDDEN with the vision weights, same seed
    overrides = {}
    for i in range(L):
        p = f"blk.{i}."
        overrides[p + "attn_qkv.weight"] = vis[p + "vis_attn_qkv.weight"]
        overrides[p + "attn_output.weight"] = vis[p + "vis_attn_output.weight"]
        overrides[p + "ffn_up.weight"] = vis[p + "vis_up.weight"]
        overrides[p + "ffn_gate.weight"] = vis[p + "vis_gate.weight"]
        overrides[p + "ffn_down.weight"] = vis[p + "vis_down.weight"]
    pb = tmp_path / "cogvlm-b.gguf"
    make_tiny_llama(pb, arch="cogvlm", fused_qkv=True, n_head=H,
                    n_head_kv=H, n_ff=F, seed=3, extra_tensors=overrides)

    ma = load_model(str(pa), dtype=jnp.float32)
    mb = load_model(str(pb), dtype=jnp.float32)
    assert "vis_wq" in ma.params["layers"]
    toks = jnp.asarray([[3, 9, 5]], jnp.int32)
    pos = jnp.arange(3, dtype=jnp.int32)[None]

    img_params = cogvlm_vision_params(ma.params)
    fwd = jax.jit(make_forward(ma.config))
    la, _ = fwd(img_params, toks, pos, init_cache(ma.config, 1, 8,
                                                  jnp.float32))
    lb, _ = fwd(mb.params, toks, pos, init_cache(mb.config, 1, 8,
                                                 jnp.float32))
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=1e-5, atol=1e-5)

    # the image path consumes EMBEDDINGS (no token ids): same logits
    fwd_e = jax.jit(make_forward(ma.config, inputs_embeds=True))
    embd = ma.params["tok_embd"][toks]
    le, _ = fwd_e(img_params, embd, pos, init_cache(ma.config, 1, 8,
                                                    jnp.float32))
    np.testing.assert_allclose(np.asarray(le), np.asarray(la),
                               rtol=1e-5, atol=1e-5)
