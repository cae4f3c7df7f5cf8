"""HF checkpoint -> GGUF converter (ref: convert_hf_to_gguf.py, ~9k LoC).

Covers the sparse-relevant families (LlamaForCausalLM, ProSparseLlama,
Bamboo, Qwen2, OPT, Falcon) plus the SparkInfer additions
(convert_hf_to_gguf.py:4571-4645):
  --pred-path DIR   per-layer ReluMLP predictor checkpoints model_<i>.pt
                    -> blk.i.ffn_pred_{up,down}.{weight,bias} tensors and
                    the `{arch}.pred_lora` per-layer rank KV array
  --pred-bias       predictors carry biases
  transposes ffn_down to {n_embd, n_ff} when predictors are present
  (':2236-2238' — neuron rows contiguous for the sparse down-proj)

Reads config.json + *.safetensors / pytorch_model*.bin directly (no
transformers model instantiation — just tensor IO) and tokenizer metadata
from tokenizer.json / tokenizer.model when present.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.writer import GGUFWriter
from ..models.config import ARCH_REGISTRY

_ARCH_MAP = {
    "LlamaForCausalLM": "llama",
    "MistralForCausalLM": "llama",
    "ProSparseLlamaForCausalLM": "prosparse_llama",
    "SparseLlamaForCausalLM": "prosparse_llama",
    "BambooForCausalLM": "bamboo",
    "Qwen2ForCausalLM": "qwen2",
    "SparseQwen2ForCausalLM": "qwen2",
    "SparsifiedQwen2ForCausalLM": "qwen2",
    "OPTForCausalLM": "opt",
    "FalconForCausalLM": "falcon",
    "RWForCausalLM": "falcon",
    "MambaForCausalLM": "mamba",
    "FalconMambaForCausalLM": "mamba",  # + ssm.dt_b_c_rms flag
    "JambaForCausalLM": "jamba",
    "Mamba2ForCausalLM": "mamba2",
    "FalconH1ForCausalLM": "falcon-h1",
    "GraniteMoeHybridForCausalLM": "granitehybrid",
    "Lfm2ForCausalLM": "lfm2",
    "Qwen3NextForCausalLM": "qwen3next",
    "GPT2LMHeadModel": "gpt2",
    "Rwkv6ForCausalLM": "rwkv6",
    "RwkvForCausalLM": "rwkv6",  # HF arch tag on some v6 world checkpoints
}

# HF name template -> GGUF name template (llama-family layout;
# ref: gguf-py tensor_mapping.py)
_LLAMA_TENSORS = {
    "model.embed_tokens.weight": "token_embd.weight",
    "model.norm.weight": "output_norm.weight",
    "lm_head.weight": "output.weight",
    "model.layers.{i}.input_layernorm.weight": "blk.{i}.attn_norm.weight",
    "model.layers.{i}.self_attn.q_proj.weight": "blk.{i}.attn_q.weight",
    "model.layers.{i}.self_attn.k_proj.weight": "blk.{i}.attn_k.weight",
    "model.layers.{i}.self_attn.v_proj.weight": "blk.{i}.attn_v.weight",
    "model.layers.{i}.self_attn.q_proj.bias": "blk.{i}.attn_q.bias",
    "model.layers.{i}.self_attn.k_proj.bias": "blk.{i}.attn_k.bias",
    "model.layers.{i}.self_attn.v_proj.bias": "blk.{i}.attn_v.bias",
    "model.layers.{i}.self_attn.o_proj.weight": "blk.{i}.attn_output.weight",
    "model.layers.{i}.post_attention_layernorm.weight": "blk.{i}.ffn_norm.weight",
    "model.layers.{i}.mlp.gate_proj.weight": "blk.{i}.ffn_gate.weight",
    "model.layers.{i}.mlp.up_proj.weight": "blk.{i}.ffn_up.weight",
    "model.layers.{i}.mlp.down_proj.weight": "blk.{i}.ffn_down.weight",
}


# --------------------------------------------------------------------------
# Declarative family table (the analogue of convert_hf_to_gguf.py's Model
# subclasses): each entry maps an HF architecture onto the generic llama
# tensor layout with overlays, per-family KVs, and optional transforms.
#
#   arch          GGUF architecture name (must be in ARCH_REGISTRY)
#   tmap          overlay on _LLAMA_TENSORS (value None drops a mapping)
#   permute       override q/k llama-permute (default: rope_mode == "norm")
#   norm_plus_one gemma/nemotron store norm weights as (w - 1) in HF
#   kv            fn(writer, arch, cfgj) for extra KVs
#   moe           "mixtral" | "qwen2moe" style expert tensor collection
#   split         fn(name_template, data, cfgj) -> list[(hf_template, data)]
#                 pre-mapping splitter for fused tensors (phi3)

_QNORM_T = {
    "model.layers.{i}.self_attn.q_norm.weight": "blk.{i}.attn_q_norm.weight",
    "model.layers.{i}.self_attn.k_norm.weight": "blk.{i}.attn_k_norm.weight",
}

_GEMMA2_T = {
    "model.layers.{i}.post_attention_layernorm.weight": "blk.{i}.attn_post_norm.weight",
    "model.layers.{i}.pre_feedforward_layernorm.weight": "blk.{i}.ffn_norm.weight",
    "model.layers.{i}.post_feedforward_layernorm.weight": "blk.{i}.ffn_post_norm.weight",
}


def _kv_gemma2(w, a, c):
    w.add_kv(f"{a}.attention.sliding_window", np.uint32(c.get("sliding_window", 4096)))
    qpas = c.get("query_pre_attn_scalar")
    if qpas:
        w.add_kv(f"{a}.attention.scale", np.float32(qpas ** -0.5))


def _kv_gemma3(w, a, c):
    _kv_gemma2(w, a, c)
    w.add_kv(f"{a}.rope.freq_base_swa",
             np.float32(c.get("rope_local_base_freq", 10000.0)))


def _kv_granite(w, a, c):
    w.add_kv(f"{a}.embedding_scale", np.float32(c.get("embedding_multiplier", 1.0)))
    w.add_kv(f"{a}.residual_scale", np.float32(c.get("residual_multiplier", 1.0)))
    # granite DIVIDES logits by logits_scaling (src/models/granite.cpp);
    # store the reciprocal so the runtime multiplier semantics hold
    w.add_kv(f"{a}.logit_scale", np.float32(1.0 / c.get("logits_scaling", 1.0)))
    w.add_kv(f"{a}.attention.scale", np.float32(c.get("attention_multiplier", 0.0)))


def _kv_cohere(w, a, c):
    w.add_kv(f"{a}.logit_scale", np.float32(c.get("logit_scale", 1.0)))
    w.add_kv(f"{a}.attention.layer_norm_epsilon",
             np.float32(c.get("layer_norm_eps", 1e-5)))


def _split_gptoss(templ, data, cfgj):
    """gpt-oss HF experts store gate/up INTERLEAVED in gate_up_proj
    (X, E, 2F) (even = gate, odd = up); split + transpose to the GGUF
    expert layouts (X, F, E) up/gate and (X, E, F) down."""
    if templ.endswith("mlp.experts.gate_up_proj"):
        return [(templ + ".gate",
                 np.ascontiguousarray(np.swapaxes(data[..., ::2], -1, -2))),
                (templ + ".up",
                 np.ascontiguousarray(np.swapaxes(data[..., 1::2], -1, -2)))]
    if templ.endswith("mlp.experts.gate_up_proj_bias"):
        return [(templ + ".gate", np.ascontiguousarray(data[..., ::2])),
                (templ + ".up", np.ascontiguousarray(data[..., 1::2]))]
    if templ.endswith("mlp.experts.down_proj"):
        return [(templ, np.ascontiguousarray(np.swapaxes(data, -1, -2)))]
    return [(templ, data)]


_GPTOSS_T = {
    "model.layers.{i}.self_attn.sinks": "blk.{i}.attn_sinks.weight",
    "model.layers.{i}.self_attn.o_proj.bias": "blk.{i}.attn_output.bias",
    "model.layers.{i}.mlp.router.weight": "blk.{i}.ffn_gate_inp.weight",
    "model.layers.{i}.mlp.router.bias": "blk.{i}.ffn_gate_inp.bias",
    "model.layers.{i}.mlp.experts.gate_up_proj.gate": "blk.{i}.ffn_gate_exps.weight",
    "model.layers.{i}.mlp.experts.gate_up_proj.up": "blk.{i}.ffn_up_exps.weight",
    "model.layers.{i}.mlp.experts.gate_up_proj_bias.gate": "blk.{i}.ffn_gate_exps.bias",
    "model.layers.{i}.mlp.experts.gate_up_proj_bias.up": "blk.{i}.ffn_up_exps.bias",
    "model.layers.{i}.mlp.experts.down_proj": "blk.{i}.ffn_down_exps.weight",
    "model.layers.{i}.mlp.experts.down_proj_bias": "blk.{i}.ffn_down_exps.bias",
}


def _kv_gptoss(w, a, c):
    w.add_kv(f"{a}.expert_count", np.uint32(c["num_local_experts"]))
    w.add_kv(f"{a}.expert_used_count", np.uint32(c["num_experts_per_tok"]))
    # softmax over the selected top-k logits (llama-hparams.h
    # SOFTMAX_WEIGHT = 3), no top-k renorm
    w.add_kv(f"{a}.expert_gating_func", np.uint32(3))
    w.add_kv(f"{a}.expert_weights_norm", False)


def _split_headwise_qkv(templ, data, cfgj, fused_name):
    """(H, 3, D) head-interleaved fused qkv (gptneox/bloom) -> q/k/v."""
    if not templ.endswith(fused_name + ".weight") and \
            not templ.endswith(fused_name + ".bias"):
        return [(templ, data)]
    H = cfgj["num_attention_heads"]
    E = cfgj["hidden_size"]
    D = E // H
    base, kind = templ.rsplit(fused_name, 1)
    if kind == ".weight":
        w = data.reshape(H, 3, D, E)
        return [(base + "q.weight", np.ascontiguousarray(w[:, 0].reshape(H * D, E))),
                (base + "k.weight", np.ascontiguousarray(w[:, 1].reshape(H * D, E))),
                (base + "v.weight", np.ascontiguousarray(w[:, 2].reshape(H * D, E)))]
    b = data.reshape(H, 3, D)
    return [(base + "q.bias", np.ascontiguousarray(b[:, 0].reshape(H * D))),
            (base + "k.bias", np.ascontiguousarray(b[:, 1].reshape(H * D))),
            (base + "v.bias", np.ascontiguousarray(b[:, 2].reshape(H * D)))]


def _split_neox(templ, data, cfgj):
    return _split_headwise_qkv(templ, data, cfgj, "query_key_value")


def _split_mpt(templ, data, cfgj):
    if templ.endswith("attn.Wqkv.weight"):  # plain [Q;K;V] concat
        E = cfgj["hidden_size"]
        H = cfgj["num_attention_heads"]
        Hkv = cfgj.get("num_key_value_heads", H)
        D = E // H
        base = templ.rsplit("Wqkv", 1)[0]
        return [(base + "q.weight", data[: H * D]),
                (base + "k.weight", data[H * D: (H + Hkv) * D]),
                (base + "v.weight", data[(H + Hkv) * D:])]
    return [(templ, data)]


def _split_glm4(templ, data, cfgj):
    if templ.endswith("mlp.gate_up_proj.weight"):
        F = cfgj["intermediate_size"]
        base = templ.rsplit("gate_up_proj", 1)[0]
        return [(base + "gate_proj.weight", data[:F]),
                (base + "up_proj.weight", data[F:])]
    return [(templ, data)]


_GPTNEOX_T = {
    "gpt_neox.embed_in.weight": "token_embd.weight",
    "gpt_neox.final_layer_norm.weight": "output_norm.weight",
    "gpt_neox.final_layer_norm.bias": "output_norm.bias",
    "embed_out.weight": "output.weight",
    "gpt_neox.layers.{i}.input_layernorm.weight": "blk.{i}.attn_norm.weight",
    "gpt_neox.layers.{i}.input_layernorm.bias": "blk.{i}.attn_norm.bias",
    # parallel-residual: post_attention_layernorm feeds the FFN branch
    "gpt_neox.layers.{i}.post_attention_layernorm.weight": "blk.{i}.attn_norm_2.weight",
    "gpt_neox.layers.{i}.post_attention_layernorm.bias": "blk.{i}.attn_norm_2.bias",
    "gpt_neox.layers.{i}.attention.q.weight": "blk.{i}.attn_q.weight",
    "gpt_neox.layers.{i}.attention.q.bias": "blk.{i}.attn_q.bias",
    "gpt_neox.layers.{i}.attention.k.weight": "blk.{i}.attn_k.weight",
    "gpt_neox.layers.{i}.attention.k.bias": "blk.{i}.attn_k.bias",
    "gpt_neox.layers.{i}.attention.v.weight": "blk.{i}.attn_v.weight",
    "gpt_neox.layers.{i}.attention.v.bias": "blk.{i}.attn_v.bias",
    "gpt_neox.layers.{i}.attention.dense.weight": "blk.{i}.attn_output.weight",
    "gpt_neox.layers.{i}.attention.dense.bias": "blk.{i}.attn_output.bias",
    "gpt_neox.layers.{i}.mlp.dense_h_to_4h.weight": "blk.{i}.ffn_up.weight",
    "gpt_neox.layers.{i}.mlp.dense_h_to_4h.bias": "blk.{i}.ffn_up.bias",
    "gpt_neox.layers.{i}.mlp.dense_4h_to_h.weight": "blk.{i}.ffn_down.weight",
    "gpt_neox.layers.{i}.mlp.dense_4h_to_h.bias": "blk.{i}.ffn_down.bias",
}

_BLOOM_T = {
    "transformer.word_embeddings.weight": "token_embd.weight",
    "transformer.word_embeddings_layernorm.weight": "token_embd_norm.weight",
    "transformer.word_embeddings_layernorm.bias": "token_embd_norm.bias",
    "transformer.ln_f.weight": "output_norm.weight",
    "transformer.ln_f.bias": "output_norm.bias",
    "transformer.h.{i}.input_layernorm.weight": "blk.{i}.attn_norm.weight",
    "transformer.h.{i}.input_layernorm.bias": "blk.{i}.attn_norm.bias",
    "transformer.h.{i}.self_attention.q.weight": "blk.{i}.attn_q.weight",
    "transformer.h.{i}.self_attention.q.bias": "blk.{i}.attn_q.bias",
    "transformer.h.{i}.self_attention.k.weight": "blk.{i}.attn_k.weight",
    "transformer.h.{i}.self_attention.k.bias": "blk.{i}.attn_k.bias",
    "transformer.h.{i}.self_attention.v.weight": "blk.{i}.attn_v.weight",
    "transformer.h.{i}.self_attention.v.bias": "blk.{i}.attn_v.bias",
    "transformer.h.{i}.self_attention.dense.weight": "blk.{i}.attn_output.weight",
    "transformer.h.{i}.self_attention.dense.bias": "blk.{i}.attn_output.bias",
    "transformer.h.{i}.post_attention_layernorm.weight": "blk.{i}.ffn_norm.weight",
    "transformer.h.{i}.post_attention_layernorm.bias": "blk.{i}.ffn_norm.bias",
    "transformer.h.{i}.mlp.dense_h_to_4h.weight": "blk.{i}.ffn_up.weight",
    "transformer.h.{i}.mlp.dense_h_to_4h.bias": "blk.{i}.ffn_up.bias",
    "transformer.h.{i}.mlp.dense_4h_to_h.weight": "blk.{i}.ffn_down.weight",
    "transformer.h.{i}.mlp.dense_4h_to_h.bias": "blk.{i}.ffn_down.bias",
}

_MPT_T = {
    "transformer.wte.weight": "token_embd.weight",
    "transformer.norm_f.weight": "output_norm.weight",
    "transformer.blocks.{i}.norm_1.weight": "blk.{i}.attn_norm.weight",
    "transformer.blocks.{i}.attn.q.weight": "blk.{i}.attn_q.weight",
    "transformer.blocks.{i}.attn.k.weight": "blk.{i}.attn_k.weight",
    "transformer.blocks.{i}.attn.v.weight": "blk.{i}.attn_v.weight",
    "transformer.blocks.{i}.attn.out_proj.weight": "blk.{i}.attn_output.weight",
    "transformer.blocks.{i}.norm_2.weight": "blk.{i}.ffn_norm.weight",
    "transformer.blocks.{i}.ffn.up_proj.weight": "blk.{i}.ffn_up.weight",
    "transformer.blocks.{i}.ffn.down_proj.weight": "blk.{i}.ffn_down.weight",
}

_GPTJ_T = {
    "transformer.wte.weight": "token_embd.weight",
    "transformer.ln_f.weight": "output_norm.weight",
    "transformer.ln_f.bias": "output_norm.bias",
    "lm_head.weight": "output.weight",
    "lm_head.bias": "output.bias",
    "transformer.h.{i}.ln_1.weight": "blk.{i}.attn_norm.weight",
    "transformer.h.{i}.ln_1.bias": "blk.{i}.attn_norm.bias",
    "transformer.h.{i}.attn.q_proj.weight": "blk.{i}.attn_q.weight",
    "transformer.h.{i}.attn.k_proj.weight": "blk.{i}.attn_k.weight",
    "transformer.h.{i}.attn.v_proj.weight": "blk.{i}.attn_v.weight",
    "transformer.h.{i}.attn.out_proj.weight": "blk.{i}.attn_output.weight",
    "transformer.h.{i}.mlp.fc_in.weight": "blk.{i}.ffn_up.weight",
    "transformer.h.{i}.mlp.fc_in.bias": "blk.{i}.ffn_up.bias",
    "transformer.h.{i}.mlp.fc_out.weight": "blk.{i}.ffn_down.weight",
    "transformer.h.{i}.mlp.fc_out.bias": "blk.{i}.ffn_down.bias",
}

_GLM4_T = {
    "model.layers.{i}.post_self_attn_layernorm.weight": "blk.{i}.attn_post_norm.weight",
    "model.layers.{i}.post_mlp_layernorm.weight": "blk.{i}.ffn_post_norm.weight",
}


_NORMBIAS_T = {
    "model.layers.{i}.input_layernorm.bias": "blk.{i}.attn_norm.bias",
    "model.layers.{i}.post_attention_layernorm.bias": "blk.{i}.ffn_norm.bias",
    "model.norm.bias": "output_norm.bias",
}

_PHI2_T = {
    "model.final_layernorm.weight": "output_norm.weight",
    "model.final_layernorm.bias": "output_norm.bias",
    "lm_head.bias": "output.bias",
    "model.layers.{i}.input_layernorm.bias": "blk.{i}.attn_norm.bias",
    "model.layers.{i}.self_attn.dense.weight": "blk.{i}.attn_output.weight",
    "model.layers.{i}.self_attn.dense.bias": "blk.{i}.attn_output.bias",
    "model.layers.{i}.mlp.fc1.weight": "blk.{i}.ffn_up.weight",
    "model.layers.{i}.mlp.fc1.bias": "blk.{i}.ffn_up.bias",
    "model.layers.{i}.mlp.fc2.weight": "blk.{i}.ffn_down.weight",
    "model.layers.{i}.mlp.fc2.bias": "blk.{i}.ffn_down.bias",
}


def _rope_partial(default):
    def f(c):
        hd = c.get("head_dim") or c["hidden_size"] // c["num_attention_heads"]
        return int(c.get("partial_rotary_factor", default) * hd)

    return f


def _kv_cohere2(w, a, c):
    _kv_cohere(w, a, c)
    # every sliding_window_pattern-th layer is global AND rope-less
    p = c.get("sliding_window_pattern", 4)
    L = c["num_hidden_layers"]
    w.add_array(f"{a}.nope_layers",
                np.asarray([1 if (i % p) == (p - 1) else 0 for i in range(L)],
                           np.uint32))


_DEEPSEEK2_T = {
    "model.layers.{i}.self_attn.q_a_proj.weight": "blk.{i}.attn_q_a.weight",
    "model.layers.{i}.self_attn.q_a_layernorm.weight": "blk.{i}.attn_q_a_norm.weight",
    "model.layers.{i}.self_attn.q_b_proj.weight": "blk.{i}.attn_q_b.weight",
    "model.layers.{i}.self_attn.kv_a_proj_with_mqa.weight": "blk.{i}.attn_kv_a_mqa.weight",
    "model.layers.{i}.self_attn.kv_a_layernorm.weight": "blk.{i}.attn_kv_a_norm.weight",
    "model.layers.{i}.self_attn.kv_b_proj.weight": "blk.{i}.attn_kv_b.weight",
    "model.layers.{i}.mlp.gate.weight": "blk.{i}.ffn_gate_inp.weight",
    "model.layers.{i}.mlp.gate.e_score_correction_bias": "blk.{i}.exp_probs_b.bias",
    "model.layers.{i}.mlp.shared_experts.gate_proj.weight": "blk.{i}.ffn_gate_shexp.weight",
    "model.layers.{i}.mlp.shared_experts.up_proj.weight": "blk.{i}.ffn_up_shexp.weight",
    "model.layers.{i}.mlp.shared_experts.down_proj.weight": "blk.{i}.ffn_down_shexp.weight",
}


def _kv_deepseek2(w, a, c):
    if c.get("q_lora_rank"):
        w.add_kv(f"{a}.attention.q_lora_rank", np.uint32(c["q_lora_rank"]))
    w.add_kv(f"{a}.attention.kv_lora_rank", np.uint32(c["kv_lora_rank"]))
    w.add_kv(f"{a}.attention.value_length", np.uint32(c["v_head_dim"]))
    w.add_kv(f"{a}.leading_dense_block_count",
             np.uint32(c.get("first_k_dense_replace", 0)))
    w.add_kv(f"{a}.expert_count", np.uint32(c["n_routed_experts"]))
    w.add_kv(f"{a}.expert_used_count", np.uint32(c["num_experts_per_tok"]))
    w.add_kv(f"{a}.expert_feed_forward_length",
             np.uint32(c["moe_intermediate_size"]))
    w.add_kv(f"{a}.expert_shared_count", np.uint32(c.get("n_shared_experts", 0)))
    w.add_kv(f"{a}.expert_weights_scale",
             np.float32(c.get("routed_scaling_factor", 1.0)))
    w.add_kv(f"{a}.expert_weights_norm", bool(c.get("norm_topk_prob", False)))
    w.add_kv(f"{a}.expert_gating_func",
             np.uint32(2 if c.get("scoring_func") == "sigmoid" else 1))


_GLM4MOE_T = {
    **_QNORM_T,
    "model.layers.{i}.mlp.gate.weight": "blk.{i}.ffn_gate_inp.weight",
    "model.layers.{i}.mlp.gate.e_score_correction_bias": "blk.{i}.exp_probs_b.bias",
    "model.layers.{i}.mlp.shared_experts.gate_proj.weight": "blk.{i}.ffn_gate_shexp.weight",
    "model.layers.{i}.mlp.shared_experts.up_proj.weight": "blk.{i}.ffn_up_shexp.weight",
    "model.layers.{i}.mlp.shared_experts.down_proj.weight": "blk.{i}.ffn_down_shexp.weight",
}


def _kv_glm4moe(w, a, c):
    """GLM-4.5-MoE: sigmoid router + score-correction bias + shared expert
    + leading dense layers (ref src/models/glm4-moe.cpp; Glm4MoeTopkRouter
    in transformers is the deepseek3-style gating)."""
    w.add_kv(f"{a}.leading_dense_block_count",
             np.uint32(c.get("first_k_dense_replace", 0)))
    w.add_kv(f"{a}.expert_count", np.uint32(c["n_routed_experts"]))
    w.add_kv(f"{a}.expert_used_count", np.uint32(c["num_experts_per_tok"]))
    w.add_kv(f"{a}.expert_feed_forward_length",
             np.uint32(c["moe_intermediate_size"]))
    w.add_kv(f"{a}.expert_shared_count", np.uint32(c.get("n_shared_experts", 0)))
    w.add_kv(f"{a}.expert_weights_scale",
             np.float32(c.get("routed_scaling_factor", 1.0)))
    w.add_kv(f"{a}.expert_weights_norm", bool(c.get("norm_topk_prob", True)))
    w.add_kv(f"{a}.expert_gating_func", np.uint32(2))  # sigmoid


def _kv_ernie_moe(w, a, c):
    """Ernie 4.5 MoE (Ernie4_5_MoeSparseMoeBlock): softmax gating,
    correction bias for selection only, leading dense layers."""
    w.add_kv(f"{a}.leading_dense_block_count",
             np.uint32(c.get("moe_layer_start_index", 0)))
    w.add_kv(f"{a}.expert_count", np.uint32(c["moe_num_experts"]))
    w.add_kv(f"{a}.expert_used_count", np.uint32(c["moe_k"]))
    w.add_kv(f"{a}.expert_feed_forward_length",
             np.uint32(c["moe_intermediate_size"]))
    w.add_kv(f"{a}.expert_shared_count",
             np.uint32(c.get("moe_num_shared_experts", 0)))
    w.add_kv(f"{a}.expert_weights_norm", True)


def _split_squeeze_bias(templ, data, cfgj):
    # ernie moe_statics bias ships as (1, n_experts)
    if templ.endswith("e_score_correction_bias"):
        return [(templ, data.reshape(-1))]
    return [(templ, data)]


def _kv_hunyuan_moe(w, a, c):
    topk = c.get("moe_topk", 1)
    if isinstance(topk, (list, tuple)):
        topk = topk[0]
    ne = c.get("num_experts")
    if isinstance(ne, (list, tuple)):
        ne = ne[0]
    w.add_kv(f"{a}.expert_count", np.uint32(ne))
    w.add_kv(f"{a}.expert_used_count", np.uint32(topk))
    w.add_kv(f"{a}.expert_shared_count", np.uint32(1))
    w.add_kv(f"{a}.expert_weights_norm", True)


def _kv_exaone4(w, a, c):
    # global (full-attention) layers skip rope entirely (Exaone4Attention:
    # rope only when is_sliding); emit them as NoPE flags
    lt = c.get("layer_types")
    L = c["num_hidden_layers"]
    pat = c.get("sliding_window_pattern", 4)
    if lt is None and c.get("sliding_window"):
        if isinstance(pat, str):  # "LLLG"
            lt = ["sliding_attention" if ch == "L" else "full_attention"
                  for ch in (pat * L)[:L]]
        else:
            lt = ["sliding_attention" if ((i + 1) % pat) else "full_attention"
                  for i in range(L)]
    if lt and c.get("sliding_window"):
        w.add_array(f"{a}.nope_layers", np.asarray(
            [0 if t == "sliding_attention" else 1 for t in lt], np.uint32))


def _kv_dots1(w, a, c):
    w.add_kv(f"{a}.leading_dense_block_count",
             np.uint32(c.get("first_k_dense_replace", 0)))
    w.add_kv(f"{a}.expert_count", np.uint32(c["n_routed_experts"]))
    w.add_kv(f"{a}.expert_used_count", np.uint32(c["num_experts_per_tok"]))
    w.add_kv(f"{a}.expert_feed_forward_length",
             np.uint32(c["moe_intermediate_size"]))
    w.add_kv(f"{a}.expert_shared_count", np.uint32(c.get("n_shared_experts", 0)))
    w.add_kv(f"{a}.expert_weights_scale",
             np.float32(c.get("routed_scaling_factor", 1.0)))
    w.add_kv(f"{a}.expert_weights_norm", bool(c.get("norm_topk_prob", True)))
    w.add_kv(f"{a}.expert_gating_func", np.uint32(2))  # sigmoid scores


def _split_granitemoe(templ, data, cfgj):
    """granitemoe fuses [gate; up] per expert in input_linear (X, 2F, E)."""
    if templ.endswith("block_sparse_moe.input_linear.weight"):
        F = cfgj["intermediate_size"]
        base = templ.rsplit("input_linear", 1)[0]
        return [(base + "gate_split.weight", np.ascontiguousarray(data[:, :F])),
                (base + "up_split.weight", np.ascontiguousarray(data[:, F:]))]
    return [(templ, data)]


_GRANITEMOE_T = {
    "model.layers.{i}.block_sparse_moe.router.layer.weight": "blk.{i}.ffn_gate_inp.weight",
    "model.layers.{i}.block_sparse_moe.gate_split.weight": "blk.{i}.ffn_gate_exps.weight",
    "model.layers.{i}.block_sparse_moe.up_split.weight": "blk.{i}.ffn_up_exps.weight",
    "model.layers.{i}.block_sparse_moe.output_linear.weight": "blk.{i}.ffn_down_exps.weight",
    # granitemoeshared always-on MLP (same fused [gate;up] layout)
    "model.layers.{i}.shared_mlp.gate_split.weight": "blk.{i}.ffn_gate_shexp.weight",
    "model.layers.{i}.shared_mlp.up_split.weight": "blk.{i}.ffn_up_shexp.weight",
    "model.layers.{i}.shared_mlp.output_linear.weight": "blk.{i}.ffn_down_shexp.weight",
}


def _split_granitemoeshared(templ, data, cfgj):
    """granitemoeshared: expert input_linear fused as in granitemoe, plus
    a shared MLP whose input_linear fuses [gate; up] on dim 0 (2F, E)."""
    if templ.endswith("shared_mlp.input_linear.weight"):
        F = cfgj.get("shared_intermediate_size") or data.shape[0] // 2
        base = templ.rsplit("input_linear", 1)[0]
        return [(base + "gate_split.weight", np.ascontiguousarray(data[:F])),
                (base + "up_split.weight", np.ascontiguousarray(data[F:]))]
    return _split_granitemoe(templ, data, cfgj)


def _kv_granitemoe(w, a, c):
    _kv_granite(w, a, c)
    w.add_kv(f"{a}.expert_count", np.uint32(c["num_local_experts"]))
    w.add_kv(f"{a}.expert_used_count", np.uint32(c["num_experts_per_tok"]))
    # HF GraniteMoeTopKGating: top-k on logits, softmax over the selected
    w.add_kv(f"{a}.expert_gating_func", np.uint32(3))
    w.add_kv(f"{a}.expert_weights_norm", False)


def _kv_smollm3(w, a, c):
    # HF no_rope_layers entries: 1 = rope, 0 = NoPE — store as skip flags
    nrl = c.get("no_rope_layers")
    if nrl:
        w.add_array(f"{a}.nope_layers",
                    np.asarray([1 - int(x) for x in nrl], np.uint32))


def _kv_moe(w, a, c):
    w.add_kv(f"{a}.expert_count", np.uint32(
        c.get("num_local_experts") or c.get("num_experts")))
    w.add_kv(f"{a}.expert_used_count", np.uint32(
        c.get("num_experts_per_tok", 2)))
    if "moe_intermediate_size" in c:
        w.add_kv(f"{a}.expert_feed_forward_length",
                 np.uint32(c["moe_intermediate_size"]))
    if "shared_expert_intermediate_size" in c:
        w.add_kv(f"{a}.expert_shared_feed_forward_length",
                 np.uint32(c["shared_expert_intermediate_size"]))
        w.add_kv(f"{a}.expert_shared_count", np.uint32(1))
    w.add_kv(f"{a}.expert_weights_norm", bool(c.get("norm_topk_prob", True)))


def _split_phi3(templ, data, cfgj):
    E = cfgj["hidden_size"]
    H = cfgj["num_attention_heads"]
    Hkv = cfgj.get("num_key_value_heads", H)
    D = cfgj.get("head_dim") or E // H
    if templ.endswith("self_attn.qkv_proj.weight"):
        base = templ.rsplit("qkv_proj", 1)[0]
        return [
            (base + "q_proj.weight", data[: H * D]),
            (base + "k_proj.weight", data[H * D: (H + Hkv) * D]),
            (base + "v_proj.weight", data[(H + Hkv) * D:]),
        ]
    if templ.endswith("mlp.gate_up_proj.weight"):
        F = cfgj["intermediate_size"]
        base = templ.rsplit("gate_up_proj", 1)[0]
        return [
            (base + "gate_proj.weight", data[:F]),
            (base + "up_proj.weight", data[F:]),
        ]
    return [(templ, data)]


_STARCODER2_T = {
    "model.layers.{i}.input_layernorm.bias": "blk.{i}.attn_norm.bias",
    "model.layers.{i}.post_attention_layernorm.bias": "blk.{i}.ffn_norm.bias",
    "model.layers.{i}.self_attn.o_proj.bias": "blk.{i}.attn_output.bias",
    "model.layers.{i}.mlp.c_fc.weight": "blk.{i}.ffn_up.weight",
    "model.layers.{i}.mlp.c_fc.bias": "blk.{i}.ffn_up.bias",
    "model.layers.{i}.mlp.c_proj.weight": "blk.{i}.ffn_down.weight",
    "model.layers.{i}.mlp.c_proj.bias": "blk.{i}.ffn_down.bias",
    "model.norm.bias": "output_norm.bias",
}

_MOE_ROUTER_T = {
    "model.layers.{i}.mlp.gate.weight": "blk.{i}.ffn_gate_inp.weight",
    "model.layers.{i}.mlp.shared_expert.gate_proj.weight": "blk.{i}.ffn_gate_shexp.weight",
    "model.layers.{i}.mlp.shared_expert.up_proj.weight": "blk.{i}.ffn_up_shexp.weight",
    "model.layers.{i}.mlp.shared_expert.down_proj.weight": "blk.{i}.ffn_down_shexp.weight",
    "model.layers.{i}.mlp.shared_expert_gate.weight": "blk.{i}.ffn_gate_inp_shexp.weight",
}

# bert encoder layout (HF BertModel; prefixed variants cover
# BertForMaskedLM's bert.* names). GGUF names follow the reference's
# bert tensor table (src/llama-arch.cpp LLM_ARCH_BERT: token_types,
# attn_output_norm, layer_output_norm).
_BERT_T = {
    "embeddings.word_embeddings.weight": "token_embd.weight",
    "embeddings.position_embeddings.weight": "position_embd.weight",
    "embeddings.token_type_embeddings.weight": "token_types.weight",
    "embeddings.LayerNorm.weight": "token_embd_norm.weight",
    "embeddings.LayerNorm.bias": "token_embd_norm.bias",
    "encoder.layer.{i}.attention.self.query.weight": "blk.{i}.attn_q.weight",
    "encoder.layer.{i}.attention.self.query.bias": "blk.{i}.attn_q.bias",
    "encoder.layer.{i}.attention.self.key.weight": "blk.{i}.attn_k.weight",
    "encoder.layer.{i}.attention.self.key.bias": "blk.{i}.attn_k.bias",
    "encoder.layer.{i}.attention.self.value.weight": "blk.{i}.attn_v.weight",
    "encoder.layer.{i}.attention.self.value.bias": "blk.{i}.attn_v.bias",
    "encoder.layer.{i}.attention.output.dense.weight": "blk.{i}.attn_output.weight",
    "encoder.layer.{i}.attention.output.dense.bias": "blk.{i}.attn_output.bias",
    "encoder.layer.{i}.attention.output.LayerNorm.weight": "blk.{i}.attn_output_norm.weight",
    "encoder.layer.{i}.attention.output.LayerNorm.bias": "blk.{i}.attn_output_norm.bias",
    "encoder.layer.{i}.intermediate.dense.weight": "blk.{i}.ffn_up.weight",
    "encoder.layer.{i}.intermediate.dense.bias": "blk.{i}.ffn_up.bias",
    "encoder.layer.{i}.output.dense.weight": "blk.{i}.ffn_down.weight",
    "encoder.layer.{i}.output.dense.bias": "blk.{i}.ffn_down.bias",
    "encoder.layer.{i}.output.LayerNorm.weight": "blk.{i}.layer_output_norm.weight",
    "encoder.layer.{i}.output.LayerNorm.bias": "blk.{i}.layer_output_norm.bias",
}
# rank-pooling head (ref llama-model.cpp cls/cls.output -> build_pooling
# LLAMA_POOLING_TYPE_RANK): BertForSequenceClassification's pooler+classifier
_BERT_T.update({
    "pooler.dense.weight": "cls.weight",
    "pooler.dense.bias": "cls.bias",
    "classifier.weight": "cls.output.weight",
    "classifier.bias": "cls.output.bias",
})
_BERT_T.update({"bert." + k: v for k, v in list(_BERT_T.items())})
# the generic llama templates must not leak into the bert map
_BERT_T = {**{k: None for k in _LLAMA_TENSORS}, **_BERT_T}

_BERT_FAM = dict(
    arch="bert", permute=False, tmap=_BERT_T,
    cfg_adapt=lambda c: dict(
        num_key_value_heads=c["num_attention_heads"]))

# starcoder v1 (GPTBigCode): transformer.h.{i} layout, fused c_attn
_STARCODER_T = {
    "transformer.wte.weight": "token_embd.weight",
    "transformer.wpe.weight": "position_embd.weight",
    "transformer.ln_f.weight": "output_norm.weight",
    "transformer.ln_f.bias": "output_norm.bias",
    "lm_head.weight": "output.weight",
    "transformer.h.{i}.ln_1.weight": "blk.{i}.attn_norm.weight",
    "transformer.h.{i}.ln_1.bias": "blk.{i}.attn_norm.bias",
    "transformer.h.{i}.attn.c_attn.weight": "blk.{i}.attn_qkv.weight",
    "transformer.h.{i}.attn.c_attn.bias": "blk.{i}.attn_qkv.bias",
    "transformer.h.{i}.attn.c_proj.weight": "blk.{i}.attn_output.weight",
    "transformer.h.{i}.attn.c_proj.bias": "blk.{i}.attn_output.bias",
    "transformer.h.{i}.ln_2.weight": "blk.{i}.ffn_norm.weight",
    "transformer.h.{i}.ln_2.bias": "blk.{i}.ffn_norm.bias",
    "transformer.h.{i}.mlp.c_fc.weight": "blk.{i}.ffn_up.weight",
    "transformer.h.{i}.mlp.c_fc.bias": "blk.{i}.ffn_up.bias",
    "transformer.h.{i}.mlp.c_proj.weight": "blk.{i}.ffn_down.weight",
    "transformer.h.{i}.mlp.c_proj.bias": "blk.{i}.ffn_down.bias",
}
_STARCODER_T = {**{k: None for k in _LLAMA_TENSORS}, **_STARCODER_T}

# dbrx: transformer.blocks.{i} layout; norm_2 is the FFN pre-norm
# (llama.cpp calls it attn_out_norm); experts are FLAT fused tensors
# (moe_num_experts*F, E) reshaped by _split_dbrx
_DBRX_T = {
    "transformer.wte.weight": "token_embd.weight",
    "transformer.norm_f.weight": "output_norm.weight",
    "lm_head.weight": "output.weight",
    "transformer.blocks.{i}.norm_attn_norm.norm_1.weight": "blk.{i}.attn_norm.weight",
    "transformer.blocks.{i}.norm_attn_norm.attn.Wqkv.weight": "blk.{i}.attn_qkv.weight",
    "transformer.blocks.{i}.norm_attn_norm.attn.out_proj.weight": "blk.{i}.attn_output.weight",
    "transformer.blocks.{i}.norm_attn_norm.norm_2.weight": "blk.{i}.ffn_norm.weight",
    "transformer.blocks.{i}.ffn.router.layer.weight": "blk.{i}.ffn_gate_inp.weight",
    "transformer.blocks.{i}.ffn.experts.mlp.w1": "blk.{i}.ffn_gate_exps.weight",
    "transformer.blocks.{i}.ffn.experts.mlp.v1": "blk.{i}.ffn_up_exps.weight",
    "transformer.blocks.{i}.ffn.experts.mlp.w2": "blk.{i}.ffn_down_exps.weight",
}
_DBRX_T = {**{k: None for k in _LLAMA_TENSORS}, **_DBRX_T}


def _split_dbrx(templ, data, cfgj):
    """Reshape dbrx's flat expert tensors (X*F, E) into stacked 3D:
    w1 -> gate (X,F,E), v1 -> up (X,F,E), w2 -> down (X,E,F)."""
    if templ.endswith((".mlp.w1", ".mlp.v1", ".mlp.w2")):
        X = cfgj["ffn_config"]["moe_num_experts"]
        F = cfgj["ffn_config"]["ffn_hidden_size"]
        E = cfgj["d_model"]
        t = data.reshape(X, F, E)
        if templ.endswith("w2"):
            t = np.ascontiguousarray(np.swapaxes(t, 1, 2))  # (X, E, F)
        return [(templ, t)]
    return [(templ, data)]


def _kv_dbrx(w, a, c):
    fc, ac = c["ffn_config"], c["attn_config"]
    w.add_kv(f"{a}.expert_count", np.uint32(fc["moe_num_experts"]))
    w.add_kv(f"{a}.expert_used_count", np.uint32(fc["moe_top_k"]))
    w.add_kv(f"{a}.attention.clamp_kqv", np.float32(ac.get("clip_qkv") or 0.0))


_FAMILIES: dict[str, dict] = {
    "DbrxForCausalLM": dict(
        arch="dbrx", permute=False, tmap=_DBRX_T, split=_split_dbrx,
        kv=_kv_dbrx,
        cfg_adapt=lambda c: dict(
            num_hidden_layers=c["n_layers"], hidden_size=c["d_model"],
            num_attention_heads=c["n_heads"],
            num_key_value_heads=c["attn_config"]["kv_n_heads"],
            intermediate_size=c["ffn_config"]["ffn_hidden_size"],
            max_position_embeddings=c.get("max_seq_len", 2048),
            rope_theta=c["attn_config"].get("rope_theta", 10000.0),
            vocab_size=c["vocab_size"])),
    "GPTBigCodeForCausalLM": dict(
        arch="starcoder", permute=False, tmap=_STARCODER_T,
        cfg_adapt=lambda c: dict(
            num_hidden_layers=c["n_layer"], hidden_size=c["n_embd"],
            num_attention_heads=c["n_head"],
            num_key_value_heads=1 if c.get("multi_query", True)
            else c["n_head"],
            intermediate_size=c.get("n_inner") or 4 * c["n_embd"],
            max_position_embeddings=c.get("n_positions", 2048),
            vocab_size=c["vocab_size"])),
    "BertModel": _BERT_FAM,
    "BertForMaskedLM": _BERT_FAM,
    "BertForSequenceClassification": _BERT_FAM,
    "Qwen3ForCausalLM": dict(arch="qwen3", tmap=_QNORM_T),
    # olmo v1: non-parametric layernorm (the checkpoint has NO norm
    # tensors; the loader synthesizes unit weights), NEOX rope
    "OlmoForCausalLM": dict(arch="olmo"),
    # arcee (AFM): gateless relu^2 FFN, NORM rope
    "ArceeForCausalLM": dict(arch="arcee"),
    # seed-oss: qkv bias, wide head_dim, NORM rope
    "SeedOssForCausalLM": dict(arch="seed_oss"),
    "GemmaForCausalLM": dict(arch="gemma", norm_plus_one=True),
    "Gemma2ForCausalLM": dict(arch="gemma2", tmap=_GEMMA2_T,
                              norm_plus_one=True, kv=_kv_gemma2),
    "Gemma3ForCausalLM": dict(arch="gemma3", tmap={**_GEMMA2_T, **_QNORM_T},
                              norm_plus_one=True, kv=_kv_gemma3),
    "Olmo2ForCausalLM": dict(
        arch="olmo2",
        tmap={
            **_QNORM_T,
            "model.layers.{i}.input_layernorm.weight": None,
            "model.layers.{i}.post_attention_layernorm.weight": "blk.{i}.attn_post_norm.weight",
            "model.layers.{i}.post_feedforward_layernorm.weight": "blk.{i}.ffn_post_norm.weight",
        },
    ),
    # olmo3: olmo2 post-norm blocks + full-width qk-norm + 3:1 swa pattern
    # (sliding layers keep the unscaled rope via rope_freq_base_swa == base)
    "Olmo3ForCausalLM": dict(
        arch="olmo3",
        tmap={
            **_QNORM_T,
            "model.layers.{i}.input_layernorm.weight": None,
            "model.layers.{i}.post_attention_layernorm.weight": "blk.{i}.attn_post_norm.weight",
            "model.layers.{i}.post_feedforward_layernorm.weight": "blk.{i}.ffn_post_norm.weight",
        }),
    # granitemoe + an always-on fused shared MLP (input_linear = [gate;up])
    "GraniteMoeSharedForCausalLM": dict(
        arch="granitemoe", tmap=_GRANITEMOE_T, split=_split_granitemoeshared,
        kv=_kv_granitemoe),
    # chameleon: per-head LN on q/k with (H, D) affine; weights kept in
    # the HF layout (neox rope) — the reference converter permutes
    # instead (convert_hf_to_gguf.py ChameleonModel); vqmodel skipped
    "ChameleonForConditionalGeneration": dict(
        arch="chameleon", permute=False,
        tmap={
            "model.layers.{i}.self_attn.q_norm.weight": "blk.{i}.attn_q_norm.weight",
            "model.layers.{i}.self_attn.q_norm.bias": "blk.{i}.attn_q_norm.bias",
            "model.layers.{i}.self_attn.k_norm.weight": "blk.{i}.attn_k_norm.weight",
            "model.layers.{i}.self_attn.k_norm.bias": "blk.{i}.attn_k_norm.bias",
        }),
    "CohereForCausalLM": dict(arch="command-r", permute=False, kv=_kv_cohere),
    "GraniteForCausalLM": dict(arch="granite", kv=_kv_granite),
    "Phi3ForCausalLM": dict(arch="phi3", split=_split_phi3),
    "Starcoder2ForCausalLM": dict(arch="starcoder2", tmap=_STARCODER2_T),
    "MixtralForCausalLM": dict(
        arch="mixtral", moe="mixtral", kv=_kv_moe,
        tmap={"model.layers.{i}.block_sparse_moe.gate.weight": "blk.{i}.ffn_gate_inp.weight"},
    ),
    "Qwen2MoeForCausalLM": dict(arch="qwen2moe", moe="qwen2moe", kv=_kv_moe,
                                tmap=_MOE_ROUTER_T),
    "OlmoeForCausalLM": dict(arch="olmoe", moe="qwen2moe", kv=_kv_moe,
                             tmap={**_MOE_ROUTER_T, **_QNORM_T}),
    "SmolLM3ForCausalLM": dict(arch="smollm3", kv=_kv_smollm3),
    "GptOssForCausalLM": dict(arch="gpt-oss", tmap=_GPTOSS_T,
                              split=_split_gptoss, kv=_kv_gptoss),
    "Qwen3MoeForCausalLM": dict(arch="qwen3moe", moe="qwen2moe", kv=_kv_moe,
                                tmap={**_MOE_ROUTER_T, **_QNORM_T}),
    "GPTNeoXForCausalLM": dict(
        arch="gptneox", tmap=_GPTNEOX_T, split=_split_neox,
        rope_dim=lambda c: int(c.get("rotary_pct", 0.25) *
                               (c["hidden_size"] // c["num_attention_heads"]))),
    "BloomForCausalLM": dict(
        arch="bloom", tmap=_BLOOM_T, split=_split_neox,
        cfg_adapt=lambda c: dict(
            num_hidden_layers=c["n_layer"], num_attention_heads=c["n_head"],
            num_key_value_heads=c["n_head"],
            intermediate_size=4 * c["hidden_size"])),
    "MptForCausalLM": dict(
        arch="mpt", tmap=_MPT_T, split=_split_mpt,
        cfg_adapt=lambda c: dict(
            num_hidden_layers=c["n_layers"], hidden_size=c["d_model"],
            num_attention_heads=c["n_heads"],
            num_key_value_heads=(c.get("attn_config") or {}).get(
                "kv_n_heads", c["n_heads"]),
            # HF MptMLP hardcodes a 4x hidden FFN width
            intermediate_size=4 * c["d_model"],
            max_position_embeddings=c.get("max_seq_len", 2048),
            vocab_size=c["vocab_size"])),
    "GPTJForCausalLM": dict(
        arch="gptj", tmap=_GPTJ_T, permute=False,
        rope_dim=lambda c: c.get("rotary_dim") or c["n_embd"] // c["n_head"],
        cfg_adapt=lambda c: dict(
            num_hidden_layers=c["n_layer"], hidden_size=c["n_embd"],
            num_attention_heads=c["n_head"],
            intermediate_size=c.get("n_inner") or 4 * c["n_embd"],
            max_position_embeddings=c.get("n_positions", 2048),
            vocab_size=c["vocab_size"])),
    "Glm4ForCausalLM": dict(
        arch="glm4", tmap=_GLM4_T, split=_split_glm4, permute=False,
        rope_dim=lambda c: int(c.get("partial_rotary_factor", 0.5) *
                               (c.get("head_dim") or
                                c["hidden_size"] // c["num_attention_heads"]))),
    "Cohere2ForCausalLM": dict(arch="cohere2", permute=False, kv=_kv_cohere2),
    "GraniteMoeForCausalLM": dict(arch="granitemoe", tmap=_GRANITEMOE_T,
                                  split=_split_granitemoe,
                                  kv=_kv_granitemoe),
    "NemotronForCausalLM": dict(arch="nemotron", tmap=_NORMBIAS_T,
                                norm_plus_one=True,
                                rope_dim=_rope_partial(0.5)),
    "StableLmForCausalLM": dict(arch="stablelm", tmap=_NORMBIAS_T,
                                rope_dim=_rope_partial(0.25)),
    "PhiForCausalLM": dict(arch="phi2", tmap=_PHI2_T,
                           rope_dim=_rope_partial(0.5)),
    # permute=False: MLA q is [nope;pe] per head — the llama q/k permute
    # would scramble the split (rope rides only the pe slice)
    "DeepseekV2ForCausalLM": dict(
        arch="deepseek2", moe="qwen2moe", kv=_kv_deepseek2, tmap=_DEEPSEEK2_T,
        permute=False,
        head_dim=lambda c: c["qk_nope_head_dim"] + c["qk_rope_head_dim"],
        rope_dim=lambda c: c["qk_rope_head_dim"]),
    "DeepseekV3ForCausalLM": dict(
        arch="deepseek2", moe="qwen2moe", kv=_kv_deepseek2, tmap=_DEEPSEEK2_T,
        permute=False,
        head_dim=lambda c: c["qk_nope_head_dim"] + c["qk_rope_head_dim"],
        rope_dim=lambda c: c["qk_rope_head_dim"]),
    # permute=False: ernie rope is interleaved-NATIVE in the HF layout
    # (modeling_ernie4_5 rotate_half works on 0::2/1::2 pairs; the
    # reference converter likewise does not permute, convert_hf_to_gguf.py
    # Ernie4_5Model)
    "Ernie4_5ForCausalLM": dict(arch="ernie4_5", permute=False),
    # ernie 4.5 MoE: softmax gating, correction bias used for SELECTION
    # only (Ernie4_5_MoeStatics), fused shared expert, leading dense
    # layers via moe_layer_start_index (ref src/models/ernie4-5-moe.cpp)
    "Ernie4_5_MoeForCausalLM": dict(
        arch="ernie4_5-moe", moe="qwen2moe", kv=_kv_ernie_moe,
        split=_split_squeeze_bias, permute=False,
        tmap={
            "model.layers.{i}.mlp.gate.weight": "blk.{i}.ffn_gate_inp.weight",
            "model.layers.{i}.mlp.moe_statics.e_score_correction_bias":
                "blk.{i}.exp_probs_b.bias",
            "model.layers.{i}.mlp.shared_experts.gate_proj.weight":
                "blk.{i}.ffn_gate_shexp.weight",
            "model.layers.{i}.mlp.shared_experts.up_proj.weight":
                "blk.{i}.ffn_up_shexp.weight",
            "model.layers.{i}.mlp.shared_experts.down_proj.weight":
                "blk.{i}.ffn_down_shexp.weight",
        }),
    # hunyuan v1 dense: per-head qk-norm applied AFTER rope
    # (ref src/models/hunyuan-dense.cpp)
    "HunYuanDenseV1ForCausalLM": dict(
        arch="hunyuan-dense", permute=False,
        tmap={
            "model.layers.{i}.self_attn.query_layernorm.weight":
                "blk.{i}.attn_q_norm.weight",
            "model.layers.{i}.self_attn.key_layernorm.weight":
                "blk.{i}.attn_k_norm.weight",
        }),
    # hunyuan v1 moe: + softmax top-k experts and an always-on ungated
    # shared MLP (ref src/models/hunyuan-moe.cpp)
    "HunYuanMoEV1ForCausalLM": dict(
        arch="hunyuan-moe", permute=False, moe="qwen2moe", kv=_kv_hunyuan_moe,
        tmap={
            "model.layers.{i}.self_attn.query_layernorm.weight":
                "blk.{i}.attn_q_norm.weight",
            "model.layers.{i}.self_attn.key_layernorm.weight":
                "blk.{i}.attn_k_norm.weight",
            "model.layers.{i}.mlp.gate.wg.weight": "blk.{i}.ffn_gate_inp.weight",
            "model.layers.{i}.mlp.shared_mlp.gate_proj.weight":
                "blk.{i}.ffn_gate_shexp.weight",
            "model.layers.{i}.mlp.shared_mlp.up_proj.weight":
                "blk.{i}.ffn_up_shexp.weight",
            "model.layers.{i}.mlp.shared_mlp.down_proj.weight":
                "blk.{i}.ffn_down_shexp.weight",
        }),
    # bitnet b1.58: rms sub-norms before o_proj/down_proj, gated relu^2
    # (ref src/models/bitnet.cpp)
    "BitNetForCausalLM": dict(
        arch="bitnet",
        tmap={
            "model.layers.{i}.self_attn.attn_sub_norm.weight":
                "blk.{i}.attn_sub_norm.weight",
            "model.layers.{i}.mlp.ffn_sub_norm.weight":
                "blk.{i}.ffn_sub_norm.weight",
        }),
    # exaone4: 3 sliding:1 global, global layers NoPE, per-head qk-norm,
    # olmo2-style post-norm-only blocks (ref src/models/exaone4.cpp)
    "Exaone4ForCausalLM": dict(
        arch="exaone4", permute=False, kv=_kv_exaone4,
        tmap={
            **_QNORM_T,
            "model.layers.{i}.input_layernorm.weight": None,
            "model.layers.{i}.post_attention_layernorm.weight":
                "blk.{i}.attn_post_norm.weight",
            "model.layers.{i}.post_feedforward_layernorm.weight":
                "blk.{i}.ffn_post_norm.weight",
        }),
    # dots1: per-head qk-norm + deepseek3-style sigmoid router with
    # correction bias, shared experts, dense lead (ref src/models/dots1.cpp)
    "Dots1ForCausalLM": dict(
        arch="dots1", moe="qwen2moe", kv=_kv_dots1,
        tmap={
            **_QNORM_T,
            "model.layers.{i}.mlp.gate.weight": "blk.{i}.ffn_gate_inp.weight",
            "model.layers.{i}.mlp.gate.e_score_correction_bias":
                "blk.{i}.exp_probs_b.bias",
            "model.layers.{i}.mlp.shared_experts.gate_proj.weight":
                "blk.{i}.ffn_gate_shexp.weight",
            "model.layers.{i}.mlp.shared_experts.up_proj.weight":
                "blk.{i}.ffn_up_shexp.weight",
            "model.layers.{i}.mlp.shared_experts.down_proj.weight":
                "blk.{i}.ffn_down_shexp.weight",
        }),
    "Glm4MoeForCausalLM": dict(
        arch="glm4moe", moe="qwen2moe", kv=_kv_glm4moe, tmap=_GLM4MOE_T,
        rope_dim=_rope_partial(0.5)),
}

# kind letter -> (gguf suffix); mixtral w1=gate, w2=down, w3=up
_MIXTRAL_KIND = {"1": "gate", "2": "down", "3": "up"}

import re

_MOE_RE = {
    "mixtral": re.compile(
        r"model\.layers\.(\d+)\.block_sparse_moe\.experts\.(\d+)\.w([123])\.weight"),
    "qwen2moe": re.compile(
        r"model\.layers\.(\d+)\.mlp\.experts\.(\d+)\.(gate|up|down)_proj\.weight"),
}


_LAYER_RE = re.compile(r"^(.*?\.(?:layers|layer|h|blocks)\.)(\d+)\.(.*)$")


def _convert_family(fam: dict, model_dir: Path, out_path: str, cfgj: dict,
                    out_type: str, rename=None) -> dict:
    """Generic family conversion driven by the _FAMILIES table.
    rename(name) -> name | None filters/renames the HF tensor stream
    (used by multimodal wrappers to strip the language_model. prefix)."""
    arch = fam["arch"]
    if "cfg_adapt" in fam:  # normalize non-llama config key names (mpt/gptj)
        cfgj = {**cfgj, **fam["cfg_adapt"](cfgj)}
    L = cfgj["num_hidden_layers"]
    E = cfgj["hidden_size"]
    H = cfgj["num_attention_heads"]
    Hkv = cfgj.get("num_key_value_heads", H)
    F = cfgj["intermediate_size"]
    V = cfgj["vocab_size"]
    D = cfgj.get("head_dim") or E // H

    gtype = {"f32": GGMLType.F32, "f16": GGMLType.F16, "bf16": GGMLType.BF16,
             "q8_0": GGMLType.Q8_0}[out_type]

    w = GGUFWriter(out_path, arch)
    w.add_kv(f"{arch}.block_count", np.uint32(L))
    w.add_kv(f"{arch}.embedding_length", np.uint32(E))
    w.add_kv(f"{arch}.attention.head_count", np.uint32(H))
    w.add_kv(f"{arch}.attention.head_count_kv", np.uint32(Hkv))
    w.add_kv(f"{arch}.feed_forward_length", np.uint32(F))
    w.add_kv(f"{arch}.vocab_size", np.uint32(V))
    w.add_kv(f"{arch}.context_length",
             np.uint32(cfgj.get("max_position_embeddings", 4096)))
    eps = cfgj.get("rms_norm_eps", cfgj.get("layer_norm_epsilon",
                                            cfgj.get("layer_norm_eps",
                                                     cfgj.get("norm_epsilon", 1e-5))))
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", np.float32(eps))
    if "head_dim" in fam:
        D = fam["head_dim"](cfgj)
    w.add_kv(f"{arch}.rope.freq_base", np.float32(cfgj.get("rope_theta", 10000.0)))
    w.add_kv(f"{arch}.attention.key_length", np.uint32(D))
    w.add_kv(f"{arch}.rope.dimension_count",
             np.uint32(fam["rope_dim"](cfgj) if "rope_dim" in fam else D))
    rs = cfgj.get("rope_scaling") or {}
    if rs.get("factor"):
        w.add_kv(f"{arch}.rope.scaling.type",
                 str(rs.get("rope_type", rs.get("type", "linear"))))
        w.add_kv(f"{arch}.rope.scaling.factor", np.float32(rs["factor"]))
        if rs.get("original_max_position_embeddings"):
            w.add_kv(f"{arch}.rope.scaling.original_context_length",
                     np.uint32(rs["original_max_position_embeddings"]))
    if cfgj.get("sliding_window") and "gemma" not in arch:
        w.add_kv(f"{arch}.attention.sliding_window",
                 np.uint32(cfgj["sliding_window"]))
    if fam.get("kv"):
        fam["kv"](w, arch, cfgj)

    tmap = dict(_LLAMA_TENSORS)
    for k, v in fam.get("tmap", {}).items():
        if v is None:
            tmap.pop(k, None)
            tmap[k] = None
        else:
            tmap[k] = v
    permute = fam.get("permute")
    if permute is None:
        permute = ARCH_REGISTRY[arch].rope_mode == "norm"
    plus_one = fam.get("norm_plus_one", False)
    splitter = fam.get("split")
    moe_style = fam.get("moe")
    moe_buf: dict[tuple[int, str], dict[int, np.ndarray]] = {}

    n = 0
    for name, data in _iter_hf_tensors(model_dir):
        if rename is not None:
            name = rename(name)
            if name is None:
                continue
        if moe_style:
            m = _MOE_RE[moe_style].match(name)
            if m:
                i, e, kind = int(m.group(1)), int(m.group(2)), m.group(3)
                if moe_style == "mixtral":
                    kind = _MIXTRAL_KIND[kind]
                moe_buf.setdefault((i, kind), {})[e] = data
                continue
        i = None
        templ = name
        lm = _LAYER_RE.match(name)
        if lm:
            i = int(lm.group(2))
            templ = lm.group(1) + "{i}." + lm.group(3)
        pieces = splitter(templ, data, cfgj) if splitter else [(templ, data)]
        for templ2, data2 in pieces:
            gname = tmap.get(templ2)
            if gname is None:
                continue
            gname = gname.format(i=i) if i is not None else gname
            if permute and gname.endswith("attn_q.weight"):
                data2 = permute_rope(data2, H)
            if permute and gname.endswith("attn_k.weight"):
                data2 = permute_rope(data2, Hkv)
            if permute and gname.endswith("attn_q.bias"):
                data2 = permute_rope(data2[:, None], H)[:, 0]
            if permute and gname.endswith("attn_k.bias"):
                data2 = permute_rope(data2[:, None], Hkv)[:, 0]
            if plus_one and data2.ndim == 1 and "norm" in gname \
                    and gname.endswith(".weight"):
                # gemma/nemotron store norm weights as (w - 1); biases stay
                data2 = data2 + 1.0
            tt = gtype if data2.ndim == 2 and "norm" not in gname else GGMLType.F32
            if tt == GGMLType.Q8_0 and data2.shape[-1] % 32 != 0:
                tt = GGMLType.F16
            w.add_tensor(gname, data2, tt)
            n += 1

    # stacked expert tensors: (n_expert, F_e, E) up/gate, (n_expert, E, F_e) down
    if moe_buf:
        X = (cfgj.get("num_local_experts") or cfgj.get("num_experts")
             or cfgj.get("n_routed_experts") or cfgj.get("moe_num_experts"))
        for (i, kind), by_e in sorted(moe_buf.items()):
            assert len(by_e) == X, f"layer {i} {kind}: {len(by_e)} != {X} experts"
            stacked = np.stack([by_e[e] for e in range(X)])
            w.add_tensor(f"blk.{i}.ffn_{kind}_exps.weight", stacked,
                         gtype if gtype != GGMLType.Q8_0 else GGMLType.F16)
            n += 1

    _write_tokenizer(w, model_dir)
    w.write()
    return {"arch": arch, "n_tensors": n, "n_layer": L}


def _iter_hf_tensors(model_dir: Path):
    """Yield (name, np.ndarray f32) from safetensors or torch .bin shards."""
    st_files = sorted(model_dir.glob("*.safetensors"))
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(str(f), framework="np") as sf:
                for name in sf.keys():
                    t = sf.get_tensor(name)
                    if t.dtype == np.float16 or str(t.dtype) == "bfloat16":
                        t = t.astype(np.float32)
                    yield name, np.asarray(t, np.float32) if t.dtype != np.float32 else t
        return
    bins = sorted(model_dir.glob("pytorch_model*.bin"))
    if not bins:
        raise FileNotFoundError(f"no safetensors/bin shards in {model_dir}")
    import torch

    for f in bins:
        sd = torch.load(str(f), map_location="cpu", weights_only=True)
        for name, t in sd.items():
            yield name, t.float().numpy()


def _load_predictors(pred_path: Path, n_layer: int, pred_bias: bool):
    """ReluMLP predictor per layer: model_<i>.pt with fc1/fc2 weights
    (ref convert_hf_to_gguf.py:4571-4591). Returns list of dicts or None."""
    import torch

    preds = []
    for i in range(n_layer):
        f = pred_path / f"model_{i}.pt"
        if not f.exists():
            preds.append(None)
            continue
        sd = torch.load(str(f), map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        # accept fc1/fc2 or 0/2 (Sequential) naming
        def pick(*names):
            for n in names:
                if n in sd:
                    return sd[n].float().numpy()
            return None

        up_w = pick("fc1.weight", "0.weight", "up.weight")
        down_w = pick("fc2.weight", "2.weight", "down.weight")
        if up_w is None or down_w is None:
            raise ValueError(f"{f}: unrecognized predictor keys {list(sd)[:6]}")
        p = {"up_w": up_w, "down_w": down_w}
        if pred_bias:
            p["up_b"] = pick("fc1.bias", "0.bias", "up.bias")
            p["down_b"] = pick("fc2.bias", "2.bias", "down.bias")
        preds.append(p)
    return preds


def permute_rope(w: np.ndarray, n_head: int) -> np.ndarray:
    """HF llama q/k layout -> GGUF 'norm' rope layout (adjacent pairs):
    the inverse of convert_hf_to_gguf.py LlamaModel.permute."""
    out_d, in_d = w.shape
    D = out_d // n_head
    return (
        w.reshape(n_head, 2, D // 2, in_d).transpose(0, 2, 1, 3).reshape(out_d, in_d)
    )


_CLIP_VISION_T = {
    "vision_model.embeddings.patch_embedding.weight": "v.patch_embd.weight",
    "vision_model.embeddings.class_embedding": "v.class_embd",
    "vision_model.embeddings.position_embedding.weight": "v.position_embd.weight",
    "vision_model.pre_layrnorm.weight": "v.pre_ln.weight",  # HF's typo
    "vision_model.pre_layrnorm.bias": "v.pre_ln.bias",
    "vision_model.post_layernorm.weight": "v.post_ln.weight",
    "vision_model.post_layernorm.bias": "v.post_ln.bias",
}
_CLIP_BLK = {
    "self_attn.q_proj": "attn_q", "self_attn.k_proj": "attn_k",
    "self_attn.v_proj": "attn_v", "self_attn.out_proj": "attn_out",
    "layer_norm1": "ln1", "layer_norm2": "ln2",
    "mlp.fc1": "ffn_up", "mlp.fc2": "ffn_down",
}


def _strip_lm(name):
    """Multimodal wrapper -> bare LM tensor names (vision/projector
    tensors return None and go to the mmproj file)."""
    for pre in ("language_model.model.", "model.language_model."):
        if name.startswith(pre):
            return "model." + name[len(pre):]
    if name.startswith("language_model."):
        return name[len("language_model."):]
    if name == "lm_head.weight" or name.startswith("model.lm_head"):
        return "lm_head.weight"
    return None


def _convert_llava(model_dir: Path, out_path: str, cfgj: dict,
                   out_type: str) -> dict:
    """LlavaForConditionalGeneration -> LLM GGUF + <out>.mmproj.gguf,
    following the reference's split (convert_hf_to_gguf.py --mmproj:
    clip.cpp tensor/KV conventions for the vision side)."""
    if cfgj["vision_config"].get("model_type") == "pixtral":
        return _convert_pixtral(model_dir, out_path, cfgj, out_type)
    tc = dict(cfgj["text_config"])
    tc.setdefault("architectures", ["LlamaForCausalLM"])
    inner = tc["architectures"][0]
    fam = _FAMILIES.get(inner, dict(arch=_ARCH_MAP.get(inner, "llama")))
    strip = _strip_lm

    info = _convert_family(fam, model_dir, out_path, tc, out_type,
                           rename=strip)

    vc = cfgj["vision_config"]
    a = "clip"
    mm_path = str(out_path) + ".mmproj.gguf"
    w = GGUFWriter(mm_path, a)
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.projector_type", "mlp")
    w.add_kv("clip.vision.image_size", np.uint32(vc["image_size"]))
    w.add_kv("clip.vision.patch_size", np.uint32(vc["patch_size"]))
    w.add_kv("clip.vision.embedding_length", np.uint32(vc["hidden_size"]))
    w.add_kv("clip.vision.feed_forward_length", np.uint32(vc["intermediate_size"]))
    w.add_kv("clip.vision.block_count", np.uint32(vc["num_hidden_layers"]))
    w.add_kv("clip.vision.attention.head_count", np.uint32(vc["num_attention_heads"]))
    w.add_kv("clip.vision.attention.layer_norm_epsilon",
             np.float32(vc.get("layer_norm_eps", 1e-5)))
    w.add_kv("clip.use_gelu", vc.get("hidden_act", "quick_gelu") != "quick_gelu")
    pp = model_dir / "preprocessor_config.json"
    if pp.exists():
        ppj = json.loads(pp.read_text())
        if "image_mean" in ppj:
            w.add_array("clip.vision.image_mean",
                        np.asarray(ppj["image_mean"], np.float32))
            w.add_array("clip.vision.image_std",
                        np.asarray(ppj["image_std"], np.float32))

    n = 0
    for name, data in _iter_hf_tensors(model_dir):
        for pre in ("vision_tower.", "model.vision_tower."):
            if name.startswith(pre):
                name = name[len(pre):]
                break
        else:
            if "multi_modal_projector" in name:
                mmname = ("mm.0" if "linear_1" in name else "mm.2") + \
                    (".weight" if name.endswith("weight") else ".bias")
                w.add_tensor(mmname, data, GGMLType.F32)
                n += 1
            continue
        gname = _CLIP_VISION_T.get(name)
        if gname is None and name.startswith("vision_model.encoder.layers."):
            parts = name.split(".")
            i = int(parts[3])
            stem = ".".join(parts[4:-1])
            kind = parts[-1]
            short = _CLIP_BLK.get(stem)
            if short is not None:
                gname = f"v.blk.{i}.{short}.{kind}"
        if gname is None:
            continue
        w.add_tensor(gname, data, GGMLType.F32)
        n += 1
    _write_tokenizer(w, model_dir)
    w.write()
    info["mmproj"] = mm_path
    info["n_mmproj_tensors"] = n
    return info


_PIXTRAL_BLK = {
    "attention.q_proj": "attn_q", "attention.k_proj": "attn_k",
    "attention.v_proj": "attn_v", "attention.o_proj": "attn_out",
    "attention_norm": "ln1", "ffn_norm": "ln2",
    "feed_forward.gate_proj": "ffn_gate", "feed_forward.up_proj": "ffn_up",
    "feed_forward.down_proj": "ffn_down",
}


def _convert_pixtral(model_dir: Path, out_path: str, cfgj: dict,
                     out_type: str) -> dict:
    """Pixtral-style LlavaForConditionalGeneration (vision_config
    model_type "pixtral") -> LLM GGUF + mmproj with clip.cpp's PIXTRAL
    conventions (clip.cpp build_pixtral, convert_hf_to_gguf.py
    LlavaVisionModel): RMS-norm ViT, 2D RoPE (q/k permuted to the ggml
    'norm' rope layout like the text converter), gated FFN, mm.1/mm.2
    projector, [IMG_BREAK] embedding extracted from the text embeddings."""
    tc = dict(cfgj["text_config"])
    tc.setdefault("architectures", ["MistralForCausalLM"])
    inner = tc["architectures"][0]
    fam = _FAMILIES.get(inner, dict(arch=_ARCH_MAP.get(inner, "llama")))
    info = _convert_family(fam, model_dir, out_path, tc, out_type,
                           rename=_strip_lm)

    vc = cfgj["vision_config"]
    Hv = vc["num_attention_heads"]
    mm_path = str(out_path) + ".mmproj.gguf"
    w = GGUFWriter(mm_path, "clip")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.projector_type", "pixtral")
    w.add_kv("clip.vision.image_size", np.uint32(vc["image_size"]))
    w.add_kv("clip.vision.patch_size", np.uint32(vc["patch_size"]))
    w.add_kv("clip.vision.embedding_length", np.uint32(vc["hidden_size"]))
    w.add_kv("clip.vision.feed_forward_length",
             np.uint32(vc["intermediate_size"]))
    w.add_kv("clip.vision.block_count", np.uint32(vc["num_hidden_layers"]))
    w.add_kv("clip.vision.attention.head_count", np.uint32(Hv))
    # layer_norm_eps is hard-coded in modeling_pixtral.py (ref converter)
    w.add_kv("clip.vision.attention.layer_norm_epsilon",
             np.float32(vc.get("layer_norm_eps", 1e-5)))
    if vc.get("hidden_act", "gelu") == "silu":
        w.add_kv("clip.use_silu", True)
    else:
        w.add_kv("clip.use_gelu", True)
    pp = model_dir / "preprocessor_config.json"
    if pp.exists():
        ppj = json.loads(pp.read_text())
        if "image_mean" in ppj:
            w.add_array("clip.vision.image_mean",
                        np.asarray(ppj["image_mean"], np.float32))
            w.add_array("clip.vision.image_std",
                        np.asarray(ppj["image_std"], np.float32))

    # [IMG_BREAK] token id, for the row-separator embedding
    img_break_id = -1
    tk = model_dir / "tokenizer_config.json"
    if tk.exists():
        for tid, td in json.loads(tk.read_text()).get(
                "added_tokens_decoder", {}).items():
            if td.get("content") == "[IMG_BREAK]":
                img_break_id = int(tid)

    n = 0
    for name, data in _iter_hf_tensors(model_dir):
        if img_break_id >= 0 and name.endswith("embed_tokens.weight"):
            w.add_tensor("v.token_embd.img_break",
                         np.ascontiguousarray(data[img_break_id]),
                         GGMLType.F32)
            n += 1
            continue
        if name.startswith("model."):
            name = name[len("model."):]
        if "multi_modal_projector" in name:
            mmname = ("mm.1" if "linear_1" in name else "mm.2") + \
                (".weight" if name.endswith("weight") else ".bias")
            w.add_tensor(mmname, data, GGMLType.F32)
            n += 1
            continue
        if not name.startswith("vision_tower."):
            continue
        name = name[len("vision_tower."):]
        gname = None
        if name == "patch_conv.weight":
            gname = "v.patch_embd.weight"
        elif name == "ln_pre.weight":
            gname = "v.pre_ln.weight"
        elif name.startswith("transformer.layers."):
            parts = name.split(".")
            i = int(parts[2])
            stem = ".".join(parts[3:-1])
            kind = parts[-1]
            short = _PIXTRAL_BLK.get(stem)
            if short is not None:
                if short in ("attn_q", "attn_k") and kind == "weight":
                    # HF rotate-half -> ggml 'norm' adjacent-pair rope
                    # layout, same permute as the text converter (ref
                    # LlavaVisionModel.modify_tensors)
                    data = permute_rope(np.asarray(data), Hv)
                gname = f"v.blk.{i}.{short}.{kind}"
        if gname is None:
            continue
        w.add_tensor(gname, data, GGMLType.F32)
        n += 1
    _write_tokenizer(w, model_dir)
    w.write()
    info["mmproj"] = mm_path
    info["n_mmproj_tensors"] = n
    return info


def _convert_gemma3mm(model_dir: Path, out_path: str, cfgj: dict,
                      out_type: str) -> dict:
    """Gemma3ForConditionalGeneration -> gemma3 text GGUF + mmproj with
    clip.cpp's GEMMA3 conventions (SigLIP ViT + avg-pool projector;
    ref convert_hf_to_gguf.py Gemma3VisionModel: soft_emb_norm stored
    +1-corrected, scale_factor KV for non-default pooling)."""
    tc = dict(cfgj["text_config"])
    tc.setdefault("architectures", ["Gemma3ForCausalLM"])
    fam = _FAMILIES["Gemma3ForCausalLM"]
    info = _convert_family(fam, model_dir, out_path, tc, out_type,
                           rename=_strip_lm)

    vc = cfgj["vision_config"]
    mm_path = str(out_path) + ".mmproj.gguf"
    w = GGUFWriter(mm_path, "clip")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.projector_type", "gemma3")
    w.add_kv("clip.vision.image_size", np.uint32(vc["image_size"]))
    w.add_kv("clip.vision.patch_size", np.uint32(vc["patch_size"]))
    w.add_kv("clip.vision.embedding_length", np.uint32(vc["hidden_size"]))
    w.add_kv("clip.vision.feed_forward_length",
             np.uint32(vc["intermediate_size"]))
    w.add_kv("clip.vision.block_count", np.uint32(vc["num_hidden_layers"]))
    w.add_kv("clip.vision.attention.head_count",
             np.uint32(vc["num_attention_heads"]))
    w.add_kv("clip.vision.attention.layer_norm_epsilon",
             np.float32(vc.get("layer_norm_eps", 1e-6)))
    w.add_kv("clip.use_gelu", True)  # SigLIP gelu_pytorch_tanh
    # pool kernel: patches-per-side / tokens-per-side (clip.cpp reads the
    # KV with default 4; write it so tiny test shapes round-trip)
    pps = vc["image_size"] // vc["patch_size"]
    tps = max(1, int(round(float(cfgj.get("mm_tokens_per_image", 256))
                           ** 0.5)))
    w.add_kv("clip.vision.projector.scale_factor",
             np.uint32(max(1, pps // tps)))
    # gemma3 preprocessor normalizes with mean=std=0.5
    w.add_array("clip.vision.image_mean", np.full(3, 0.5, np.float32))
    w.add_array("clip.vision.image_std", np.full(3, 0.5, np.float32))

    n = 0
    for name, data in _iter_hf_tensors(model_dir):
        if name.startswith("model."):
            name = name[len("model."):]
        if "multi_modal_projector" in name:
            if "mm_input_projection_weight" in name:
                w.add_tensor("mm.input_projection.weight", data, GGMLType.F32)
            elif "mm_soft_emb_norm" in name:
                # Gemma3RMSNorm applies (1 + w); store corrected like the
                # reference converter
                w.add_tensor("mm.soft_emb_norm.weight",
                             np.asarray(data, np.float32) + 1.0,
                             GGMLType.F32)
            else:
                continue
            n += 1
            continue
        if not name.startswith("vision_tower."):
            continue
        name = name[len("vision_tower."):]
        gname = _CLIP_VISION_T.get(name)
        if gname is None and name == "vision_model.embeddings.patch_embedding.bias":
            gname = "v.patch_embd.bias"
        if gname is None and name.startswith("vision_model.encoder.layers."):
            parts = name.split(".")
            i = int(parts[3])
            stem = ".".join(parts[4:-1])
            kind = parts[-1]
            short = _CLIP_BLK.get(stem)
            if short is not None:
                gname = f"v.blk.{i}.{short}.{kind}"
        if gname is None:
            continue
        w.add_tensor(gname, data, GGMLType.F32)
        n += 1
    _write_tokenizer(w, model_dir)
    w.write()
    info["mmproj"] = mm_path
    info["n_mmproj_tensors"] = n
    return info


_INTERNVL_BLK = {
    "attention.q_proj": "attn_q", "attention.k_proj": "attn_k",
    "attention.v_proj": "attn_v", "attention.projection_layer": "attn_out",
    "layernorm_before": "ln1", "layernorm_after": "ln2",
    "mlp.fc1": "ffn_up", "mlp.fc2": "ffn_down",
    "lambda_1": "ls1", "lambda_2": "ls2",
}
_INTERNVL_MM = {
    "multi_modal_projector.layer_norm": "mm.model.mlp.0",
    "multi_modal_projector.linear_1": "mm.model.mlp.1",
    "multi_modal_projector.linear_2": "mm.model.mlp.3",
}


def _convert_internvl(model_dir: Path, out_path: str, cfgj: dict,
                      out_type: str) -> dict:
    """InternVLForConditionalGeneration -> text GGUF + mmproj with
    clip.cpp's INTERNVL conventions (build_internvl: cls token, LN ViT
    with ls1/ls2 layer scales, pixel shuffle by scale_factor =
    1/downsample_ratio, mm.model.mlp.{0,1,3} LN+MLP projector; ref
    convert_hf_to_gguf.py InternVisionModel)."""
    tc = dict(cfgj["text_config"])
    tc.setdefault("architectures", ["Qwen2ForCausalLM"])
    inner = tc["architectures"][0]
    fam = _FAMILIES.get(inner, dict(arch=_ARCH_MAP.get(inner, "llama")))
    info = _convert_family(fam, model_dir, out_path, tc, out_type,
                           rename=_strip_lm)

    vc = cfgj["vision_config"]
    mm_path = str(out_path) + ".mmproj.gguf"
    w = GGUFWriter(mm_path, "clip")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.projector_type", "internvl")
    w.add_kv("clip.vision.image_size", np.uint32(
        vc["image_size"][0] if isinstance(vc["image_size"], list)
        else vc["image_size"]))
    w.add_kv("clip.vision.patch_size", np.uint32(
        vc["patch_size"][0] if isinstance(vc["patch_size"], list)
        else vc["patch_size"]))
    w.add_kv("clip.vision.embedding_length", np.uint32(vc["hidden_size"]))
    w.add_kv("clip.vision.feed_forward_length",
             np.uint32(vc["intermediate_size"]))
    w.add_kv("clip.vision.block_count", np.uint32(vc["num_hidden_layers"]))
    w.add_kv("clip.vision.attention.head_count",
             np.uint32(vc["num_attention_heads"]))
    w.add_kv("clip.vision.attention.layer_norm_epsilon",
             np.float32(vc.get("layer_norm_eps", 1e-6)))
    if vc.get("hidden_act", "gelu") == "silu":
        w.add_kv("clip.use_silu", True)
    else:
        w.add_kv("clip.use_gelu", True)
    w.add_kv("clip.vision.projector.scale_factor",
             np.uint32(int(round(1.0 / cfgj.get("downsample_ratio", 0.5)))))

    n = 0
    for name, data in _iter_hf_tensors(model_dir):
        if name.startswith("model."):
            name = name[len("model."):]
        mmk = None
        for hf, g in _INTERNVL_MM.items():
            if name.startswith(hf):
                mmk = g + (".weight" if name.endswith("weight") else ".bias")
        if mmk is not None:
            w.add_tensor(mmk, data, GGMLType.F32)
            n += 1
            continue
        if not name.startswith("vision_tower."):
            continue
        name = name[len("vision_tower."):]
        gname = None
        if name == "embeddings.cls_token":
            gname, data = "v.class_embd", np.asarray(data).reshape(-1)
        elif name == "embeddings.position_embeddings":
            gname = "v.position_embd.weight"
            data = np.asarray(data).reshape(np.asarray(data).shape[-2:])
        elif name == "embeddings.patch_embeddings.projection.weight":
            gname = "v.patch_embd.weight"
        elif name == "embeddings.patch_embeddings.projection.bias":
            gname = "v.patch_embd.bias"
        elif name.startswith("encoder.layer."):
            parts = name.split(".")
            i = int(parts[2])
            stem = ".".join(parts[3:-1])
            kind = parts[-1]
            if parts[-1] in ("lambda_1", "lambda_2"):
                stem, kind = parts[-1], "weight"
            short = _INTERNVL_BLK.get(stem)
            if short is not None:
                gname = f"v.blk.{i}.{short}.{kind}"
        if gname is None:
            continue
        w.add_tensor(gname, data, GGMLType.F32)
        n += 1
    _write_tokenizer(w, model_dir)
    w.write()
    info["mmproj"] = mm_path
    info["n_mmproj_tensors"] = n
    return info


_WHISPER_BLK = {
    "self_attn.q_proj": ("attn_q", True),
    "self_attn.k_proj": ("attn_k", True),
    "self_attn.v_proj": ("attn_v", True),
    "self_attn.out_proj": ("attn_out", True),
    "self_attn_layer_norm": ("ln1", True),
    "fc1": ("ffn_up", True),
    "fc2": ("ffn_down", True),
    "final_layer_norm": ("ln2", True),
}


def _convert_whisper_mmproj(model_dir: Path, out_path: str, cfgj: dict) -> dict:
    """Whisper encoder -> audio mmproj GGUF (the reference's a.* tensor
    conventions, clip.cpp build_whisper_enc / mtmd-audio.cpp). A bundled
    multimodal projector (qwen2-audio style multi_modal_projector.linear)
    maps to mm.a.fc when present."""
    a = "clip"
    w = GGUFWriter(out_path, a)
    w.add_kv("clip.has_audio_encoder", True)
    w.add_kv("clip.projector_type", "qwen2a")
    w.add_kv("clip.audio.num_mel_bins", np.uint32(cfgj.get("num_mel_bins", 80)))
    w.add_kv("clip.audio.embedding_length", np.uint32(cfgj["d_model"]))
    w.add_kv("clip.audio.attention.head_count",
             np.uint32(cfgj["encoder_attention_heads"]))
    w.add_kv("clip.audio.feed_forward_length", np.uint32(cfgj["encoder_ffn_dim"]))
    w.add_kv("clip.audio.block_count", np.uint32(cfgj["encoder_layers"]))
    w.add_kv("clip.audio.attention.layer_norm_epsilon", np.float32(1e-5))

    n = 0
    for name, data in _iter_hf_tensors(model_dir):
        for pre in ("model.encoder.", "encoder.", "audio_tower."):
            if name.startswith(pre):
                name = name[len(pre):]
                break
        else:
            if "multi_modal_projector" in name and "linear" in name:
                w.add_tensor("mm.a.fc." + name.rsplit(".", 1)[1], data,
                             GGMLType.F32)
                n += 1
            continue
        gname = None
        if name.startswith("conv1."):
            gname = "a.conv1d.1." + name.split(".")[1]
        elif name.startswith("conv2."):
            gname = "a.conv1d.2." + name.split(".")[1]
        elif name == "embed_positions.weight":
            gname = "a.position_embd.weight"
        elif name.startswith("layer_norm."):
            gname = "a.post_ln." + name.split(".")[1]
        elif name.startswith("layers."):
            parts = name.split(".")
            i = int(parts[1])
            stem = ".".join(parts[2:-1])
            mapped = _WHISPER_BLK.get(stem)
            if mapped:
                gname = f"a.blk.{i}.{mapped[0]}.{parts[-1]}"
        if gname is None:
            continue
        w.add_tensor(gname, data, GGMLType.F32)
        n += 1
    w.write()
    return {"arch": "clip-audio", "n_tensors": n,
            "n_layer": cfgj["encoder_layers"]}


# gemma3n per-layer sub-module -> GGUF suffix (llama-arch.cpp GEMMA3N)
_G3N_BLK = {
    "input_layernorm.weight": "attn_norm.weight",
    "post_attention_layernorm.weight": "attn_post_norm.weight",
    "pre_feedforward_layernorm.weight": "ffn_norm.weight",
    "post_feedforward_layernorm.weight": "ffn_post_norm.weight",
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.o_proj.weight": "attn_output.weight",
    "self_attn.q_norm.weight": "attn_q_norm.weight",
    "self_attn.k_norm.weight": "attn_k_norm.weight",
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
    "altup.correct_output_scale": "altup_correct_scale.weight",
    "altup.correction_coefs.weight": "altup_correct_coef.weight",
    "altup.prediction_coefs.weight": "altup_predict_coef.weight",
    "altup.modality_router.weight": "altup_router.weight",
    "altup.router_norm.weight": "altup_router_norm.weight",
    "laurel.linear_left.weight": "laurel_l.weight",
    "laurel.linear_right.weight": "laurel_r.weight",
    "laurel.post_laurel_norm.weight": "laurel_post_norm.weight",
    "per_layer_input_gate.weight": "inp_gate.weight",
    "per_layer_projection.weight": "proj.weight",
    "post_per_layer_input_norm.weight": "post_norm.weight",
}
_G3N_TOP = {
    "model.embed_tokens.weight": "token_embd.weight",
    "model.embed_tokens_per_layer.weight": "per_layer_token_embd.weight",
    "model.per_layer_model_projection.weight": "per_layer_model_proj.weight",
    "model.per_layer_projection_norm.weight": "per_layer_proj_norm.weight",
    "model.norm.weight": "output_norm.weight",
    "lm_head.weight": "output.weight",
}


def _convert_gemma3n(model_dir: Path, out_path: str, cfgj: dict,
                     out_type: str) -> dict:
    """Gemma3nForCausalLM -> GGUF (ref llama-arch.cpp LLM_ARCH_GEMMA3N;
    KV keys from gguf-py: altup.num_inputs/active_idx,
    embedding_length_per_layer_input, attention.shared_kv_layers,
    activation_sparsity_scale). Stacks the altup (un)embed projections
    into single 3D tensors, as the reference converter does."""
    from statistics import NormalDist

    tc = cfgj.get("text_config", cfgj)
    arch = "gemma3n"
    L = tc["num_hidden_layers"]
    E = tc["hidden_size"]
    H = tc["num_attention_heads"]
    Hkv = tc.get("num_key_value_heads", H)
    D = tc.get("head_dim") or E // H
    F = tc["intermediate_size"]
    if isinstance(F, (list, tuple)):
        assert len(set(F)) == 1, "per-layer FFN widths not supported"
        F = F[0]
    gtype = {"f32": GGMLType.F32, "f16": GGMLType.F16, "bf16": GGMLType.BF16,
             "q8_0": GGMLType.Q8_0}[out_type]

    w = GGUFWriter(out_path, arch)
    w.add_kv(f"{arch}.block_count", np.uint32(L))
    w.add_kv(f"{arch}.embedding_length", np.uint32(E))
    w.add_kv(f"{arch}.attention.head_count", np.uint32(H))
    w.add_kv(f"{arch}.attention.head_count_kv", np.uint32(Hkv))
    w.add_kv(f"{arch}.attention.key_length", np.uint32(D))
    w.add_kv(f"{arch}.feed_forward_length", np.uint32(F))
    w.add_kv(f"{arch}.vocab_size", np.uint32(tc["vocab_size"]))
    w.add_kv(f"{arch}.context_length",
             np.uint32(tc.get("max_position_embeddings", 32768)))
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             np.float32(tc.get("rms_norm_eps", 1e-6)))
    w.add_kv(f"{arch}.rope.freq_base",
             np.float32(tc.get("rope_theta", 1000000.0)))
    w.add_kv(f"{arch}.rope.freq_base_swa",
             np.float32(tc.get("rope_local_base_freq", 10000.0)))
    w.add_kv(f"{arch}.rope.dimension_count", np.uint32(D))
    w.add_kv(f"{arch}.attention.sliding_window",
             np.uint32(tc.get("sliding_window", 512)))
    w.add_kv(f"{arch}.altup.num_inputs",
             np.uint32(tc.get("altup_num_inputs", 4)))
    w.add_kv(f"{arch}.altup.active_idx",
             np.uint32(tc.get("altup_active_idx", 0)))
    w.add_kv(f"{arch}.embedding_length_per_layer_input",
             np.uint32(tc["hidden_size_per_layer_input"]))
    w.add_kv(f"{arch}.attention.shared_kv_layers",
             np.uint32(tc.get("num_kv_shared_layers", 0)))
    pat = tc.get("activation_sparsity_pattern") or [0.0] * L
    nd = NormalDist()
    w.add_array(f"{arch}.activation_sparsity_scale", np.asarray(
        [nd.inv_cdf(p) if p > 0.0 else 0.0 for p in pat], np.float32))
    lt = tc.get("layer_types")
    if lt:
        w.add_array(f"{arch}.swa_layers", np.asarray(
            [1 if t == "sliding_attention" else 0 for t in lt], np.uint32))

    altup_proj: dict[int, np.ndarray] = {}
    altup_unembd: dict[int, np.ndarray] = {}
    blk_re = re.compile(r"^model\.layers\.(\d+)\.(.+)$")
    proj_re = re.compile(
        r"^model\.altup_(projections|unembed_projections)\.(\d+)\.weight$")
    n = 0
    for name, data in _iter_hf_tensors(model_dir):
        # HF saves Gemma3nForCausalLM with a "model." -> "model.language_model"
        # key remap that also mangles interior names
        # ("per_layer_model.language_model_projection"); reverse it globally
        name = name.replace("model.language_model", "model")
        m = proj_re.match(name)
        if m:
            tgt = altup_proj if m.group(1) == "projections" else altup_unembd
            tgt[int(m.group(2))] = data
            continue
        gname = _G3N_TOP.get(name)
        if gname is None:
            m = blk_re.match(name)
            if m and m.group(2) in _G3N_BLK:
                gname = f"blk.{m.group(1)}." + _G3N_BLK[m.group(2)]
        if gname is None:
            continue
        tt = gtype if data.ndim == 2 and "norm" not in gname \
            and "coef" not in gname and "router" not in gname else GGMLType.F32
        w.add_tensor(gname, np.ascontiguousarray(data), tt)
        n += 1
    for key, d in (("altup_proj.weight", altup_proj),
                   ("altup_unembd_proj.weight", altup_unembd)):
        if d:
            w.add_tensor(key, np.stack([d[i] for i in sorted(d)]),
                         GGMLType.F32)
            n += 1

    _write_tokenizer(w, model_dir)
    w.write()
    return {"arch": arch, "n_tensors": n, "n_layer": L}


def _kv_qwen3vl(w, a, c):
    rs = c.get("rope_scaling") or {}
    sec = rs.get("mrope_section")
    if sec:
        w.add_array(f"{a}.rope.dimension_sections",
                    np.asarray(list(sec) + [0] * (4 - len(sec)), np.uint32))
    w.add_kv(f"{a}.rope.mrope_interleaved",
             bool(rs.get("mrope_interleaved", True)))


def _split_qwen3vlmoe(templ, data, cfgj):
    """qwen3vl-moe fused experts: gate_up_proj (X, E, 2F) -> gate/up
    (X, F, E); down_proj (X, F, E) -> (X, E, F)."""
    if templ.endswith(".mlp.experts.gate_up_proj"):
        F = cfgj["moe_intermediate_size"]
        base = templ.rsplit("gate_up_proj", 1)[0]
        gate = np.ascontiguousarray(np.swapaxes(data[:, :, :F], 1, 2))
        up = np.ascontiguousarray(np.swapaxes(data[:, :, F:], 1, 2))
        return [(base + "gate_split", gate), (base + "up_split", up)]
    if templ.endswith(".mlp.experts.down_proj"):
        return [(templ, np.ascontiguousarray(np.swapaxes(data, 1, 2)))]
    return [(templ, data)]


def _kv_qwen3vlmoe(w, a, c):
    _kv_qwen3vl(w, a, c)
    w.add_kv(f"{a}.expert_count", np.uint32(c["num_experts"]))
    w.add_kv(f"{a}.expert_used_count", np.uint32(c["num_experts_per_tok"]))
    w.add_kv(f"{a}.expert_feed_forward_length",
             np.uint32(c["moe_intermediate_size"]))
    w.add_kv(f"{a}.expert_weights_norm", bool(c.get("norm_topk_prob", True)))


_Q3VL_MOE_T = {
    **_QNORM_T,
    "model.layers.{i}.mlp.gate.weight": "blk.{i}.ffn_gate_inp.weight",
    "model.layers.{i}.mlp.experts.gate_split": "blk.{i}.ffn_gate_exps.weight",
    "model.layers.{i}.mlp.experts.up_split": "blk.{i}.ffn_up_exps.weight",
    "model.layers.{i}.mlp.experts.down_proj": "blk.{i}.ffn_down_exps.weight",
}


def _convert_qwen3vl(model_dir: Path, out_path: str, cfgj: dict,
                     out_type: str, moe: bool = False) -> dict:
    """Qwen3VL(-Moe)ForConditionalGeneration -> text GGUF with interleaved
    M-RoPE KVs (ref src/models/qwen3vl.cpp). The vision tower (deepstack)
    is not converted yet — text-only decode is exact (equal position
    streams reduce interleaved M-RoPE to plain neox rope)."""
    tc = cfgj.get("text_config", cfgj)

    def strip(name):
        name = name.replace("model.language_model.", "model.")
        if name.startswith(("visual.", "model.visual.")):
            return None
        return name

    if moe:
        fam = dict(arch="qwen3vl-moe", permute=False, tmap=_Q3VL_MOE_T,
                   split=_split_qwen3vlmoe, kv=_kv_qwen3vlmoe)
    else:
        fam = dict(arch="qwen3vl", permute=False, tmap=_QNORM_T,
                   kv=_kv_qwen3vl)
    info = _convert_family(fam, model_dir, out_path, {**cfgj, **tc},
                           out_type, rename=strip)

    vc = cfgj.get("vision_config")
    if not vc:
        return info
    mm_path = str(out_path) + ".mmproj.gguf"
    E = vc["hidden_size"]
    w = GGUFWriter(mm_path, "clip")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.projector_type", "qwen3vl_merger")
    w.add_kv("clip.vision.patch_size", np.uint32(vc["patch_size"]))
    w.add_kv("clip.vision.temporal_patch_size",
             np.uint32(vc.get("temporal_patch_size", 2)))
    w.add_kv("clip.vision.spatial_merge_size",
             np.uint32(vc.get("spatial_merge_size", 2)))
    w.add_kv("clip.vision.embedding_length", np.uint32(E))
    w.add_kv("clip.vision.attention.head_count", np.uint32(vc["num_heads"]))
    w.add_kv("clip.vision.feed_forward_length",
             np.uint32(vc["intermediate_size"]))
    w.add_kv("clip.vision.block_count", np.uint32(vc["depth"]))
    w.add_kv("clip.vision.projection_dim", np.uint32(vc["out_hidden_size"]))
    w.add_kv("clip.vision.num_position_embeddings",
             np.uint32(vc["num_position_embeddings"]))
    w.add_array("clip.vision.deepstack_visual_indexes", np.asarray(
        vc.get("deepstack_visual_indexes", []), np.uint32))

    vblk_re = re.compile(r"^(?:model\.)?visual\.blocks\.(\d+)\.(.+)$")
    ds_re = re.compile(
        r"^(?:model\.)?visual\.deepstack_merger_list\.(\d+)\.(.+)$")
    sub = {"norm1.weight": "ln1.weight", "norm1.bias": "ln1.bias",
           "norm2.weight": "ln2.weight", "norm2.bias": "ln2.bias",
           "attn.proj.weight": "attn_out.weight",
           "attn.proj.bias": "attn_out.bias",
           "mlp.linear_fc1.weight": "ffn_up.weight",
           "mlp.linear_fc1.bias": "ffn_up.bias",
           "mlp.linear_fc2.weight": "ffn_down.weight",
           "mlp.linear_fc2.bias": "ffn_down.bias"}
    mm_map = {"norm.weight": "mm.norm.weight", "norm.bias": "mm.norm.bias",
              "linear_fc1.weight": "mm.0.weight",
              "linear_fc1.bias": "mm.0.bias",
              "linear_fc2.weight": "mm.2.weight",
              "linear_fc2.bias": "mm.2.bias"}
    n = 0
    for name, data in _iter_hf_tensors(model_dir):
        if name.startswith("model.visual."):
            name = name[len("model."):]
        if not name.startswith("visual."):
            continue
        rest = name[len("visual."):]
        gname = None
        if rest == "patch_embed.proj.weight":
            gname, data = "v.patch_embd.weight", data.reshape(E, -1)
        elif rest == "patch_embed.proj.bias":
            gname = "v.patch_embd.bias"
        elif rest == "pos_embed.weight":
            gname = "v.pos_embd.weight"
        elif rest.startswith("merger."):
            key = mm_map.get(rest[len("merger."):])
            gname = key
        else:
            m = ds_re.match(name)
            if m:
                key = mm_map.get(m.group(2))
                if key:
                    gname = f"ds.{m.group(1)}." + key.replace(
                        "mm.norm", "norm").replace("mm.0", "fc1").replace(
                        "mm.2", "fc2")
            else:
                m = vblk_re.match(name)
                if m:
                    i, s2 = m.group(1), m.group(2)
                    if s2 in sub:
                        gname = f"v.blk.{i}." + sub[s2]
                    elif s2 in ("attn.qkv.weight", "attn.qkv.bias"):
                        kind = s2.split(".")[-1]
                        q3, k3, v3 = np.split(data, 3, axis=0)
                        for nm2, d2 in (("attn_q", q3), ("attn_k", k3),
                                        ("attn_v", v3)):
                            w.add_tensor(f"v.blk.{i}.{nm2}.{kind}",
                                         np.ascontiguousarray(d2),
                                         GGMLType.F32)
                            n += 1
                        continue
        if gname is None:
            continue
        w.add_tensor(gname, np.ascontiguousarray(data), GGMLType.F32)
        n += 1
    w.write()
    info["mmproj"] = mm_path
    info["n_mmproj_tensors"] = n
    return info


def _kv_qwen2vl(w, a, c):
    rs = c.get("rope_scaling") or {}
    sec = rs.get("mrope_section")
    if sec:
        w.add_array(f"{a}.rope.dimension_sections",
                    np.asarray(list(sec) + [0] * (4 - len(sec)), np.uint32))


_Q2VL_VBLK = {
    "norm1.weight": "ln1.weight", "norm1.bias": "ln1.bias",
    "norm2.weight": "ln2.weight", "norm2.bias": "ln2.bias",
    "attn.proj.weight": "attn_out.weight", "attn.proj.bias": "attn_out.bias",
    "mlp.fc1.weight": "ffn_up.weight", "mlp.fc1.bias": "ffn_up.bias",
    "mlp.fc2.weight": "ffn_down.weight", "mlp.fc2.bias": "ffn_down.bias",
    # qwen2.5-vl gated MLP
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.gate_proj.bias": "ffn_gate.bias",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.up_proj.bias": "ffn_up.bias",
    "mlp.down_proj.weight": "ffn_down.weight",
    "mlp.down_proj.bias": "ffn_down.bias",
}


def _convert_qwen2vl(model_dir: Path, out_path: str, cfgj: dict,
                     out_type: str, v25: bool = False) -> dict:
    """Qwen2VL / Qwen2.5-VL -> text GGUF (arch qwen2vl, M-RoPE sections KV
    — ref llama-arch.cpp LLM_KV_ROPE_DIMENSION_SECTIONS) +
    <out>.mmproj.gguf vision tower (clip.cpp qwen2vl_merger /
    qwen2.5vl_merger layouts; 2.5 adds rms norms, gated MLP, window
    attention with fullatt_block_indexes)."""
    tc = cfgj.get("text_config", cfgj)
    vc = cfgj["vision_config"]

    def strip(name):
        name = name.replace("model.language_model.", "model.")
        if name.startswith(("visual.", "model.visual.")):
            return None
        return name

    fam = dict(arch="qwen2vl", permute=False, kv=_kv_qwen2vl)
    info = _convert_family(fam, model_dir, out_path, {**cfgj, **tc},
                           out_type, rename=strip)

    mm_path = str(out_path) + ".mmproj.gguf"
    E = vc["hidden_size"] if v25 else vc["embed_dim"]
    w = GGUFWriter(mm_path, "clip")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.projector_type",
             "qwen2.5vl_merger" if v25 else "qwen2vl_merger")
    w.add_kv("clip.vision.patch_size", np.uint32(vc["patch_size"]))
    w.add_kv("clip.vision.temporal_patch_size",
             np.uint32(vc.get("temporal_patch_size", 2)))
    w.add_kv("clip.vision.spatial_merge_size",
             np.uint32(vc.get("spatial_merge_size", 2)))
    w.add_kv("clip.vision.embedding_length", np.uint32(E))
    w.add_kv("clip.vision.attention.head_count", np.uint32(vc["num_heads"]))
    w.add_kv("clip.vision.feed_forward_length",
             np.uint32(vc["intermediate_size"] if v25
                       else int(E * vc.get("mlp_ratio", 4))))
    w.add_kv("clip.vision.block_count", np.uint32(vc["depth"]))
    w.add_kv("clip.vision.projection_dim",
             np.uint32(vc["out_hidden_size"] if v25 else tc["hidden_size"]))
    w.add_kv("clip.vision.attention.layer_norm_epsilon", np.float32(1e-6))
    if v25:
        w.add_kv("clip.vision.window_size", np.uint32(vc["window_size"]))
        w.add_array("clip.vision.fullatt_block_indexes", np.asarray(
            vc.get("fullatt_block_indexes", []), np.uint32))

    n = 0
    vblk_re = re.compile(r"^(?:model\.)?visual\.blocks\.(\d+)\.(.+)$")
    for name, data in _iter_hf_tensors(model_dir):
        if name.startswith("model.visual."):
            name = name[len("model."):]
        if not name.startswith("visual."):
            continue
        rest = name[len("visual."):]
        gname = None
        if rest == "patch_embed.proj.weight":
            gname, data = "v.patch_embd.weight", data.reshape(E, -1)
        elif rest == "merger.ln_q.weight":
            gname = "v.post_ln.weight"
        elif rest == "merger.ln_q.bias":
            gname = "v.post_ln.bias"
        elif rest.startswith("merger.mlp."):
            j, kind = rest.split(".")[2:4]
            gname = f"mm.{j}.{kind}"
        else:
            m = vblk_re.match(name)
            if m:
                i, sub = m.group(1), m.group(2)
                if sub in _Q2VL_VBLK:
                    gname = f"v.blk.{i}." + _Q2VL_VBLK[sub]
                elif sub in ("attn.qkv.weight", "attn.qkv.bias"):
                    # split the fused [q; k; v] projection
                    kind = sub.split(".")[-1]
                    q, k, v = np.split(data, 3, axis=0)
                    for nm2, d2 in (("attn_q", q), ("attn_k", k),
                                    ("attn_v", v)):
                        w.add_tensor(f"v.blk.{i}.{nm2}.{kind}",
                                     np.ascontiguousarray(d2), GGMLType.F32)
                        n += 1
                    continue
        if gname is None:
            continue
        w.add_tensor(gname, np.ascontiguousarray(data), GGMLType.F32)
        n += 1
    w.write()
    info["mmproj"] = mm_path
    info["n_mmproj_tensors"] = n
    return info


_APERTUS_ACT_RE = re.compile(
    r"^model\.layers\.(\d+)\.mlp\.act_fn\.(alpha_n|alpha_p|beta|eps)$")


def _convert_apertus(model_dir: Path, out_path: str, cfgj: dict,
                     out_type: str) -> dict:
    """Apertus (xIELU): per-layer act_fn.{alpha_n,alpha_p,beta,eps} scalar
    tensors become KV arrays, matching the reference converter
    (convert_hf_to_gguf.py ApertusModel add_xielu_*; raw pre-softplus
    values — the loader applies softplus)."""
    acc: dict[str, dict[int, float]] = {
        "alpha_n": {}, "alpha_p": {}, "beta": {}, "eps": {}}
    for name, data in _iter_hf_tensors(model_dir):
        m = _APERTUS_ACT_RE.match(name)
        if m:
            acc[m.group(2)][int(m.group(1))] = float(
                np.asarray(data).reshape(-1)[0])

    def kv(w, a, c):
        for key, d in (("xielu_alpha_n", acc["alpha_n"]),
                       ("xielu_alpha_p", acc["alpha_p"]),
                       ("xielu_beta", acc["beta"]),
                       ("xielu_eps", acc["eps"])):
            if d:
                w.add_array(f"{a}.{key}",
                            np.asarray([d[i] for i in sorted(d)], np.float32))

    fam = dict(arch="apertus", permute=False, kv=kv, tmap={
        **_QNORM_T,
        "model.layers.{i}.attention_layernorm.weight": "blk.{i}.attn_norm.weight",
        "model.layers.{i}.feedforward_layernorm.weight": "blk.{i}.ffn_norm.weight",
        "model.layers.{i}.input_layernorm.weight": None,
        "model.layers.{i}.post_attention_layernorm.weight": None,
    })

    def rename(n):
        return None if ".mlp.act_fn." in n else n

    return _convert_family(fam, model_dir, out_path, cfgj, out_type,
                           rename=rename)


# HF T5 sub-layer names -> GGUF suffixes (ref llama-arch.cpp LLM_ARCH_T5)
_T5_ATTN = {"q": "attn_q", "k": "attn_k", "v": "attn_v", "o": "attn_o"}
_T5_CROSS = {"q": "cross_attn_q", "k": "cross_attn_k",
             "v": "cross_attn_v", "o": "cross_attn_o"}
_T5_FFN = {"wi": "ffn_up", "wi_0": "ffn_gate", "wi_1": "ffn_up",
           "wo": "ffn_down"}

_T5_BLK_RE = re.compile(
    r"^(encoder|decoder)\.block\.(\d+)\.layer\.(\d)\.(.+)$")


def _convert_t5(model_dir: Path, out_path: str, cfgj: dict, out_type: str,
                enc_only: bool = False) -> dict:
    """T5ForConditionalGeneration / T5EncoderModel -> GGUF using the
    reference's t5/t5encoder tensor names (src/llama-arch.cpp) and KVs
    (decoder_block_count, attention.relative_buckets_count,
    decoder_start_token_id — llama-model.cpp:1772-1780)."""
    arch = "t5encoder" if enc_only else "t5"
    L = cfgj["num_layers"]
    Ld = cfgj.get("num_decoder_layers", L)
    E = cfgj["d_model"]
    H = cfgj["num_heads"]
    D = cfgj.get("d_kv", E // H)
    F = cfgj["d_ff"]
    gtype = {"f32": GGMLType.F32, "f16": GGMLType.F16, "bf16": GGMLType.BF16,
             "q8_0": GGMLType.Q8_0}[out_type]

    w = GGUFWriter(out_path, arch)
    w.add_kv(f"{arch}.block_count", np.uint32(L))
    if not enc_only:
        w.add_kv(f"{arch}.decoder_block_count", np.uint32(Ld))
        w.add_kv(f"{arch}.decoder_start_token_id",
                 np.uint32(cfgj.get("decoder_start_token_id")
                           or cfgj.get("pad_token_id") or 0))
    w.add_kv(f"{arch}.embedding_length", np.uint32(E))
    w.add_kv(f"{arch}.attention.head_count", np.uint32(H))
    w.add_kv(f"{arch}.attention.head_count_kv", np.uint32(H))
    w.add_kv(f"{arch}.attention.key_length", np.uint32(D))
    w.add_kv(f"{arch}.feed_forward_length", np.uint32(F))
    w.add_kv(f"{arch}.vocab_size", np.uint32(cfgj["vocab_size"]))
    w.add_kv(f"{arch}.context_length", np.uint32(512))
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             np.float32(cfgj.get("layer_norm_epsilon", 1e-6)))
    w.add_kv(f"{arch}.attention.relative_buckets_count",
             np.uint32(cfgj.get("relative_attention_num_buckets", 32)))
    w.add_kv(f"{arch}.attention.relative_max_distance",
             np.uint32(cfgj.get("relative_attention_max_distance", 128)))

    n = 0
    seen: set[str] = set()
    for name, data in _iter_hf_tensors(model_dir):
        gname = None
        if name in ("shared.weight", "encoder.embed_tokens.weight") \
                and "token_embd.weight" not in seen:
            gname = "token_embd.weight"
        elif name == "lm_head.weight":
            gname = "output.weight"
        elif name == "encoder.final_layer_norm.weight":
            gname = "enc.output_norm.weight"
        elif name == "decoder.final_layer_norm.weight":
            gname = "dec.output_norm.weight"
        else:
            m = _T5_BLK_RE.match(name)
            if m:
                side = "enc" if m.group(1) == "encoder" else "dec"
                i, sub, rest = int(m.group(2)), int(m.group(3)), m.group(4)
                is_dec = side == "dec"
                if rest == "layer_norm.weight":
                    gname = {0: "attn_norm",
                             1: "cross_attn_norm" if is_dec else "ffn_norm",
                             2: "ffn_norm"}[sub] + ".weight"
                elif rest.endswith("relative_attention_bias.weight"):
                    gname = "attn_rel_b.weight"
                elif sub == 0 and rest.startswith("SelfAttention."):
                    gname = _T5_ATTN[rest.split(".")[1]] + ".weight"
                elif is_dec and sub == 1 and rest.startswith("EncDecAttention."):
                    gname = _T5_CROSS[rest.split(".")[1]] + ".weight"
                elif rest.startswith("DenseReluDense."):
                    gname = _T5_FFN[rest.split(".")[1]] + ".weight"
                if gname:
                    gname = f"{side}.blk.{i}.{gname}"
        if gname is None or gname in seen:
            continue
        seen.add(gname)
        tt = gtype if data.ndim == 2 and "norm" not in gname \
            and "rel_b" not in gname else GGMLType.F32
        w.add_tensor(gname, data, tt)
        n += 1

    _write_tokenizer(w, model_dir)
    w.write()
    return {"arch": arch, "n_tensors": n, "n_layer": L}


def convert(
    model_dir: str,
    out_path: str,
    pred_path: str | None = None,
    pred_bias: bool = False,
    out_type: str = "f16",
) -> dict:
    model_dir = Path(model_dir)
    cfgj = json.loads((model_dir / "config.json").read_text())
    hf_arch = (cfgj.get("architectures") or [None])[0]
    if hf_arch is None:
        # composite configs saved without `architectures` — derive from
        # model_type (mirrors transformers' AutoModel mapping)
        hf_arch = {
            "qwen2_vl": "Qwen2VLForConditionalGeneration",
            "qwen2_5_vl": "Qwen2_5_VLForConditionalGeneration",
            "qwen3_vl": "Qwen3VLForConditionalGeneration",
            "qwen3_vl_moe": "Qwen3VLMoeForConditionalGeneration",
            "llava": "LlavaForConditionalGeneration",
            "gemma3n": "Gemma3nForConditionalGeneration",
        }.get(cfgj.get("model_type"), "LlamaForCausalLM")
    if hf_arch in ("LlavaForConditionalGeneration",):
        return _convert_llava(model_dir, out_path, cfgj, out_type)
    if hf_arch == "Gemma3ForConditionalGeneration":
        return _convert_gemma3mm(model_dir, out_path, cfgj, out_type)
    if hf_arch == "InternVLForConditionalGeneration":
        return _convert_internvl(model_dir, out_path, cfgj, out_type)
    if hf_arch in ("WhisperModel", "WhisperForConditionalGeneration"):
        return _convert_whisper_mmproj(model_dir, out_path, cfgj)
    if hf_arch in ("T5ForConditionalGeneration",
                   "MT5ForConditionalGeneration"):
        return _convert_t5(model_dir, out_path, cfgj, out_type)
    if hf_arch == "T5EncoderModel":
        return _convert_t5(model_dir, out_path, cfgj, out_type, enc_only=True)
    if hf_arch == "ApertusForCausalLM":
        return _convert_apertus(model_dir, out_path, cfgj, out_type)
    if hf_arch in ("Gemma3nForCausalLM", "Gemma3nForConditionalGeneration"):
        return _convert_gemma3n(model_dir, out_path, cfgj, out_type)
    if hf_arch == "Qwen2VLForConditionalGeneration":
        return _convert_qwen2vl(model_dir, out_path, cfgj, out_type)
    if hf_arch == "Qwen2_5_VLForConditionalGeneration":
        return _convert_qwen2vl(model_dir, out_path, cfgj, out_type,
                                v25=True)
    if hf_arch in ("Qwen3VLForConditionalGeneration", "Qwen3VLForCausalLM"):
        return _convert_qwen3vl(model_dir, out_path, cfgj, out_type)
    if hf_arch in ("Qwen3VLMoeForConditionalGeneration",
                   "Qwen3VLMoeForCausalLM"):
        return _convert_qwen3vl(model_dir, out_path, cfgj, out_type,
                                moe=True)
    if hf_arch in _FAMILIES:
        return _convert_family(_FAMILIES[hf_arch], model_dir, out_path, cfgj,
                               out_type)
    if hf_arch not in _ARCH_MAP:
        raise NotImplementedError(f"HF arch {hf_arch} not supported")
    arch = _ARCH_MAP[hf_arch]
    if arch == "mamba":
        if hf_arch == "FalconMambaForCausalLM":
            cfgj = {**cfgj, "_dt_b_c_rms": True}
        return _convert_mamba(model_dir, out_path, cfgj, out_type)
    if arch == "jamba":
        return _convert_jamba(model_dir, out_path, cfgj, out_type)
    if arch == "mamba2":
        return _convert_mamba2(model_dir, out_path, cfgj, out_type)
    if arch == "falcon-h1":
        return _convert_falcon_h1(model_dir, out_path, cfgj, out_type)
    if arch == "granitehybrid":
        return _convert_granite_hybrid(model_dir, out_path, cfgj, out_type)
    if arch == "lfm2":
        return _convert_lfm2(model_dir, out_path, cfgj, out_type)
    if arch == "qwen3next":
        return _convert_qwen3next(model_dir, out_path, cfgj, out_type)
    if arch == "rwkv6":
        return _convert_rwkv6(model_dir, out_path, cfgj, out_type)
    if arch == "opt":
        return _convert_opt(model_dir, out_path, cfgj, out_type,
                            pred_path, pred_bias)
    if arch == "falcon":
        return _convert_falcon(model_dir, out_path, cfgj, out_type,
                               pred_path, pred_bias)
    if arch == "gpt2":
        return _convert_gpt2(model_dir, out_path, cfgj, out_type)
    if arch not in ("llama", "prosparse_llama", "bamboo", "qwen2"):
        raise NotImplementedError(
            f"{arch}: only llama-family layouts implemented in this converter"
        )

    L = cfgj["num_hidden_layers"]
    E = cfgj["hidden_size"]
    H = cfgj["num_attention_heads"]
    Hkv = cfgj.get("num_key_value_heads", H)
    F = cfgj["intermediate_size"]
    V = cfgj["vocab_size"]

    preds = None
    if pred_path:
        preds = _load_predictors(Path(pred_path), L, pred_bias)

    gtype = {"f32": GGMLType.F32, "f16": GGMLType.F16, "bf16": GGMLType.BF16,
             "q8_0": GGMLType.Q8_0}[out_type]

    w = GGUFWriter(out_path, arch)
    w.add_kv(f"{arch}.block_count", np.uint32(L))
    w.add_kv(f"{arch}.embedding_length", np.uint32(E))
    w.add_kv(f"{arch}.attention.head_count", np.uint32(H))
    w.add_kv(f"{arch}.attention.head_count_kv", np.uint32(Hkv))
    w.add_kv(f"{arch}.feed_forward_length", np.uint32(F))
    w.add_kv(f"{arch}.vocab_size", np.uint32(V))
    w.add_kv(f"{arch}.context_length",
             np.uint32(cfgj.get("max_position_embeddings", 4096)))
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             np.float32(cfgj.get("rms_norm_eps", 1e-5)))
    w.add_kv(f"{arch}.rope.freq_base", np.float32(cfgj.get("rope_theta", 10000.0)))
    w.add_kv(f"{arch}.rope.dimension_count", np.uint32(E // H))
    if preds is not None:
        ranks = [0 if p is None else p["up_w"].shape[0] for p in preds]
        w.add_array(f"{arch}.pred_lora", np.asarray(ranks, np.uint32))

    # reverse map with layer index substitution
    n_written = 0
    for name, data in _iter_hf_tensors(model_dir):
        parts = name.split(".")
        i = None
        templ = name
        if name.startswith("model.layers."):
            i = int(parts[2])
            templ = ".".join(parts[:2] + ["{i}"] + parts[3:])
        gname = _LLAMA_TENSORS.get(templ)
        if gname is None:
            continue
        gname = gname.format(i=i) if i is not None else gname
        # 'norm'-rope archs store q/k in GGUF adjacent-pair layout (the
        # Llama permute); neox-rope archs (qwen2) keep the HF layout
        # (ref: only LlamaModel.permute in convert_hf_to_gguf.py)
        needs_permute = ARCH_REGISTRY[arch].rope_mode == "norm"
        if needs_permute and gname.endswith("attn_q.weight"):
            data = permute_rope(data, H)
        if needs_permute and gname.endswith("attn_k.weight"):
            data = permute_rope(data, Hkv)
        if needs_permute and gname.endswith("attn_q.bias"):
            data = permute_rope(data[:, None], H)[:, 0]
        if needs_permute and gname.endswith("attn_k.bias"):
            data = permute_rope(data[:, None], Hkv)[:, 0]
        if preds is not None and gname.endswith("ffn_down.weight"):
            # transpose so neuron rows are contiguous (ref :2236-2238)
            data = np.ascontiguousarray(data.T)
        tt = gtype if data.ndim == 2 and "norm" not in gname else GGMLType.F32
        if tt == GGMLType.Q8_0 and data.shape[-1] % 32 != 0:
            tt = GGMLType.F16
        w.add_tensor(gname, data, tt)
        n_written += 1

    if preds is not None:
        for i, p in enumerate(preds):
            if p is None:
                continue
            w.add_tensor(f"blk.{i}.ffn_pred_up.weight", p["up_w"], GGMLType.F32)
            w.add_tensor(f"blk.{i}.ffn_pred_down.weight", p["down_w"], GGMLType.F32)
            if p.get("up_b") is not None:
                w.add_tensor(f"blk.{i}.ffn_pred_up.bias", p["up_b"], GGMLType.F32)
            if p.get("down_b") is not None:
                w.add_tensor(f"blk.{i}.ffn_pred_down.bias", p["down_b"], GGMLType.F32)
            n_written += 2

    # tokenizer metadata (SPM .model file or tokenizer.json BPE)
    _write_tokenizer(w, model_dir)

    w.write()
    return {"arch": arch, "n_tensors": n_written, "n_layer": L}


_OPT_TENSORS = {
    "model.decoder.embed_tokens.weight": "token_embd.weight",
    "model.decoder.embed_positions.weight": "position_embd.weight",
    "model.decoder.final_layer_norm.weight": "output_norm.weight",
    "model.decoder.final_layer_norm.bias": "output_norm.bias",
    "lm_head.weight": "output.weight",
    "model.decoder.layers.{i}.self_attn_layer_norm.weight": "blk.{i}.attn_norm.weight",
    "model.decoder.layers.{i}.self_attn_layer_norm.bias": "blk.{i}.attn_norm.bias",
    "model.decoder.layers.{i}.self_attn.q_proj.weight": "blk.{i}.attn_q.weight",
    "model.decoder.layers.{i}.self_attn.q_proj.bias": "blk.{i}.attn_q.bias",
    "model.decoder.layers.{i}.self_attn.k_proj.weight": "blk.{i}.attn_k.weight",
    "model.decoder.layers.{i}.self_attn.k_proj.bias": "blk.{i}.attn_k.bias",
    "model.decoder.layers.{i}.self_attn.v_proj.weight": "blk.{i}.attn_v.weight",
    "model.decoder.layers.{i}.self_attn.v_proj.bias": "blk.{i}.attn_v.bias",
    "model.decoder.layers.{i}.self_attn.out_proj.weight": "blk.{i}.attn_output.weight",
    "model.decoder.layers.{i}.self_attn.out_proj.bias": "blk.{i}.attn_output.bias",
    "model.decoder.layers.{i}.final_layer_norm.weight": "blk.{i}.ffn_norm.weight",
    "model.decoder.layers.{i}.final_layer_norm.bias": "blk.{i}.ffn_norm.bias",
    "model.decoder.layers.{i}.fc1.weight": "blk.{i}.ffn_up.weight",
    "model.decoder.layers.{i}.fc1.bias": "blk.{i}.ffn_up.bias",
    "model.decoder.layers.{i}.fc2.weight": "blk.{i}.ffn_down.weight",
    "model.decoder.layers.{i}.fc2.bias": "blk.{i}.ffn_down.bias",
}


def _convert_opt(model_dir: Path, out_path: str, cfgj: dict, out_type: str,
                 pred_path: str | None, pred_bias: bool) -> dict:
    """OPT (ReLU FFN, learned positions; a SparkInfer sparse arch —
    ref convert_hf_to_gguf OPT sparse variant)."""
    L = cfgj["num_hidden_layers"]
    E = cfgj["hidden_size"]
    H = cfgj["num_attention_heads"]
    F = cfgj.get("ffn_dim", 4 * E)
    V = cfgj["vocab_size"]
    gtype = {"f32": GGMLType.F32, "f16": GGMLType.F16, "bf16": GGMLType.BF16,
             "q8_0": GGMLType.Q8_0}[out_type]

    preds = None
    if pred_path:
        preds = _load_predictors(Path(pred_path), L, pred_bias)

    w = GGUFWriter(out_path, "opt")
    w.add_kv("opt.block_count", np.uint32(L))
    w.add_kv("opt.embedding_length", np.uint32(E))
    w.add_kv("opt.attention.head_count", np.uint32(H))
    w.add_kv("opt.attention.head_count_kv", np.uint32(H))
    w.add_kv("opt.feed_forward_length", np.uint32(F))
    w.add_kv("opt.vocab_size", np.uint32(V))
    w.add_kv("opt.context_length",
             np.uint32(cfgj.get("max_position_embeddings", 2048)))
    w.add_kv("opt.attention.layer_norm_epsilon", np.float32(1e-5))
    if preds is not None:
        ranks = [0 if p is None else p["up_w"].shape[0] for p in preds]
        w.add_array("opt.pred_lora", np.asarray(ranks, np.uint32))

    n = 0
    for name, data in _iter_hf_tensors(model_dir):
        parts = name.split(".")
        i = None
        templ = name
        if name.startswith("model.decoder.layers."):
            i = int(parts[3])
            templ = ".".join(parts[:3] + ["{i}"] + parts[4:])
        gname = _OPT_TENSORS.get(templ)
        if gname is None:
            continue
        gname = gname.format(i=i) if i is not None else gname
        if preds is not None and gname.endswith("ffn_down.weight"):
            data = np.ascontiguousarray(data.T)  # transposed for sparse rows
        tt = gtype if data.ndim == 2 and "norm" not in gname else GGMLType.F32
        w.add_tensor(gname, np.ascontiguousarray(data), tt)
        n += 1
    if preds is not None:
        for i, p in enumerate(preds):
            if p is None:
                continue
            w.add_tensor(f"blk.{i}.ffn_pred_up.weight", p["up_w"], GGMLType.F32)
            w.add_tensor(f"blk.{i}.ffn_pred_down.weight", p["down_w"], GGMLType.F32)
            if p.get("up_b") is not None:
                w.add_tensor(f"blk.{i}.ffn_pred_up.bias", p["up_b"], GGMLType.F32)
            if p.get("down_b") is not None:
                w.add_tensor(f"blk.{i}.ffn_pred_down.bias", p["down_b"], GGMLType.F32)
            n += 2
    _write_tokenizer(w, model_dir)
    w.write()
    return {"arch": "opt", "n_tensors": n, "n_layer": L}


_GPT2_TENSORS = {
    "wte.weight": "token_embd.weight",
    "wpe.weight": "position_embd.weight",
    "ln_f.weight": "output_norm.weight",
    "ln_f.bias": "output_norm.bias",
    "h.{i}.ln_1.weight": "blk.{i}.attn_norm.weight",
    "h.{i}.ln_1.bias": "blk.{i}.attn_norm.bias",
    "h.{i}.attn.c_attn.weight": "blk.{i}.attn_qkv.weight",
    "h.{i}.attn.c_attn.bias": "blk.{i}.attn_qkv.bias",
    "h.{i}.attn.c_proj.weight": "blk.{i}.attn_output.weight",
    "h.{i}.attn.c_proj.bias": "blk.{i}.attn_output.bias",
    "h.{i}.ln_2.weight": "blk.{i}.ffn_norm.weight",
    "h.{i}.ln_2.bias": "blk.{i}.ffn_norm.bias",
    "h.{i}.mlp.c_fc.weight": "blk.{i}.ffn_up.weight",
    "h.{i}.mlp.c_fc.bias": "blk.{i}.ffn_up.bias",
    "h.{i}.mlp.c_proj.weight": "blk.{i}.ffn_down.weight",
    "h.{i}.mlp.c_proj.bias": "blk.{i}.ffn_down.bias",
}


def _convert_gpt2(model_dir: Path, out_path: str, cfgj: dict, out_type: str) -> dict:
    """GPT-2: HF Conv1D stores weights TRANSPOSED (in, out) — the converter
    transposes back to the GGUF (out, in) convention (ref: GPT2Model in
    convert_hf_to_gguf)."""
    L = cfgj["n_layer"]
    E = cfgj["n_embd"]
    H = cfgj["n_head"]
    F = cfgj.get("n_inner") or 4 * E
    V = cfgj["vocab_size"]
    gtype = {"f32": GGMLType.F32, "f16": GGMLType.F16, "bf16": GGMLType.BF16,
             "q8_0": GGMLType.Q8_0}[out_type]

    w = GGUFWriter(out_path, "gpt2")
    w.add_kv("gpt2.block_count", np.uint32(L))
    w.add_kv("gpt2.embedding_length", np.uint32(E))
    w.add_kv("gpt2.attention.head_count", np.uint32(H))
    w.add_kv("gpt2.attention.head_count_kv", np.uint32(H))
    w.add_kv("gpt2.feed_forward_length", np.uint32(F))
    w.add_kv("gpt2.vocab_size", np.uint32(V))
    w.add_kv("gpt2.context_length", np.uint32(cfgj.get("n_positions", 1024)))
    w.add_kv("gpt2.attention.layer_norm_epsilon",
             np.float32(cfgj.get("layer_norm_epsilon", 1e-5)))

    n = 0
    for name, data in _iter_hf_tensors(model_dir):
        if name.startswith("transformer."):
            name = name[len("transformer."):]
        parts = name.split(".")
        i = None
        templ = name
        if name.startswith("h."):
            i = int(parts[1])
            templ = ".".join(parts[:1] + ["{i}"] + parts[2:])
        gname = _GPT2_TENSORS.get(templ)
        if gname is None:
            continue
        gname = gname.format(i=i) if i is not None else gname
        # Conv1D weights are (in, out); GGUF wants (out, in)
        if data.ndim == 2 and (".attn.c_" in templ or ".mlp.c_" in templ):
            data = np.ascontiguousarray(data.T)
        tt = gtype if data.ndim == 2 and "norm" not in gname and "wpe" not in name             else GGMLType.F32
        w.add_tensor(gname, np.ascontiguousarray(data), tt)
        n += 1
    _write_tokenizer(w, model_dir)
    w.write()
    return {"arch": "gpt2", "n_tensors": n, "n_layer": L}


_FALCON_TENSORS = {
    "transformer.word_embeddings.weight": "token_embd.weight",
    "transformer.ln_f.weight": "output_norm.weight",
    "transformer.ln_f.bias": "output_norm.bias",
    "lm_head.weight": "output.weight",
    "transformer.h.{i}.input_layernorm.weight": "blk.{i}.attn_norm.weight",
    "transformer.h.{i}.input_layernorm.bias": "blk.{i}.attn_norm.bias",
    "transformer.h.{i}.ln_attn.weight": "blk.{i}.attn_norm.weight",
    "transformer.h.{i}.ln_attn.bias": "blk.{i}.attn_norm.bias",
    "transformer.h.{i}.ln_mlp.weight": "blk.{i}.attn_norm_2.weight",
    "transformer.h.{i}.ln_mlp.bias": "blk.{i}.attn_norm_2.bias",
    "transformer.h.{i}.self_attention.query_key_value.weight": "blk.{i}.attn_qkv.weight",
    "transformer.h.{i}.self_attention.query_key_value.bias": "blk.{i}.attn_qkv.bias",
    "transformer.h.{i}.self_attention.dense.weight": "blk.{i}.attn_output.weight",
    "transformer.h.{i}.mlp.dense_h_to_4h.weight": "blk.{i}.ffn_up.weight",
    "transformer.h.{i}.mlp.dense_4h_to_h.weight": "blk.{i}.ffn_down.weight",
}


def _convert_falcon(model_dir: Path, out_path: str, cfgj: dict, out_type: str,
                    pred_path: str | None, pred_bias: bool) -> dict:
    """Falcon (parallel attn+FFN, fused grouped QKV, neox rope; the 4th
    SparkInfer sparse arch — relufalcon-40b in the eval scripts)."""
    L = cfgj["num_hidden_layers"]
    E = cfgj["hidden_size"]
    H = cfgj["num_attention_heads"]
    if cfgj.get("new_decoder_architecture"):
        Hkv = cfgj.get("num_kv_heads", H)
    elif cfgj.get("multi_query", True):
        Hkv = 1
    else:
        Hkv = H
    F = cfgj.get("ffn_hidden_size", 4 * E)
    V = cfgj["vocab_size"]
    gtype = {"f32": GGMLType.F32, "f16": GGMLType.F16, "bf16": GGMLType.BF16,
             "q8_0": GGMLType.Q8_0}[out_type]

    preds = None
    if pred_path:
        preds = _load_predictors(Path(pred_path), L, pred_bias)

    w = GGUFWriter(out_path, "falcon")
    w.add_kv("falcon.block_count", np.uint32(L))
    w.add_kv("falcon.embedding_length", np.uint32(E))
    w.add_kv("falcon.attention.head_count", np.uint32(H))
    w.add_kv("falcon.attention.head_count_kv", np.uint32(Hkv))
    w.add_kv("falcon.feed_forward_length", np.uint32(F))
    w.add_kv("falcon.vocab_size", np.uint32(V))
    w.add_kv("falcon.context_length",
             np.uint32(cfgj.get("max_position_embeddings", 2048)))
    w.add_kv("falcon.attention.layer_norm_epsilon",
             np.float32(cfgj.get("layer_norm_epsilon", 1e-5)))
    w.add_kv("falcon.rope.freq_base", np.float32(cfgj.get("rope_theta", 10000.0)))
    w.add_kv("falcon.rope.dimension_count", np.uint32(E // H))
    if preds is not None:
        ranks = [0 if p is None else p["up_w"].shape[0] for p in preds]
        w.add_array("falcon.pred_lora", np.asarray(ranks, np.uint32))

    n = 0
    for name, data in _iter_hf_tensors(model_dir):
        parts = name.split(".")
        i = None
        templ = name
        if name.startswith("transformer.h."):
            i = int(parts[2])
            templ = ".".join(parts[:2] + ["{i}"] + parts[3:])
        gname = _FALCON_TENSORS.get(templ)
        if gname is None:
            continue
        gname = gname.format(i=i) if i is not None else gname
        if preds is not None and gname.endswith("ffn_down.weight"):
            data = np.ascontiguousarray(data.T)
        tt = gtype if data.ndim == 2 and "norm" not in gname else GGMLType.F32
        w.add_tensor(gname, np.ascontiguousarray(data), tt)
        n += 1
    if preds is not None:
        for i, p in enumerate(preds):
            if p is None:
                continue
            w.add_tensor(f"blk.{i}.ffn_pred_up.weight", p["up_w"], GGMLType.F32)
            w.add_tensor(f"blk.{i}.ffn_pred_down.weight", p["down_w"], GGMLType.F32)
            if p.get("up_b") is not None:
                w.add_tensor(f"blk.{i}.ffn_pred_up.bias", p["up_b"], GGMLType.F32)
            if p.get("down_b") is not None:
                w.add_tensor(f"blk.{i}.ffn_pred_down.bias", p["down_b"], GGMLType.F32)
            n += 2
    _write_tokenizer(w, model_dir)
    w.write()
    return {"arch": "falcon", "n_tensors": n, "n_layer": L}


_MAMBA_TENSORS = {
    "backbone.embeddings.weight": "token_embd.weight",
    "backbone.embedding.weight": "token_embd.weight",
    "backbone.norm_f.weight": "output_norm.weight",
    "lm_head.weight": "output.weight",
    "backbone.layers.{i}.norm.weight": "blk.{i}.attn_norm.weight",
    "backbone.layers.{i}.mixer.in_proj.weight": "blk.{i}.ssm_in.weight",
    "backbone.layers.{i}.mixer.conv1d.weight": "blk.{i}.ssm_conv1d.weight",
    "backbone.layers.{i}.mixer.conv1d.bias": "blk.{i}.ssm_conv1d.bias",
    "backbone.layers.{i}.mixer.x_proj.weight": "blk.{i}.ssm_x.weight",
    "backbone.layers.{i}.mixer.dt_proj.weight": "blk.{i}.ssm_dt.weight",
    "backbone.layers.{i}.mixer.dt_proj.bias": "blk.{i}.ssm_dt.bias",
    "backbone.layers.{i}.mixer.A_log": "blk.{i}.ssm_a",
    "backbone.layers.{i}.mixer.D": "blk.{i}.ssm_d",
    "backbone.layers.{i}.mixer.out_proj.weight": "blk.{i}.ssm_out.weight",
}


def _convert_rwkv6(model_dir: Path, out_path: str, cfgj: dict, out_type: str) -> dict:
    """RWKV6 (Finch) HF checkpoint -> GGUF, matching the reference
    converter's on-disk shapes (convert_hf_to_gguf.py Rwkv6Model:6375-6445:
    w1/decay_w1/decay_w2 transposed, w2 permuted (0,2,1), lerps squeezed and
    fused-stacked [w,k,v,r,g], output/value pre-divided by
    2^(layer//rescale_every))."""
    L = cfgj["num_hidden_layers"]
    E = cfgj["hidden_size"]
    V = cfgj["vocab_size"]
    head_size = cfgj.get("head_size", 64)
    rescale_every = cfgj.get("rescale_every", 6)
    inter = cfgj.get("intermediate_size") or int((E * 3.5) // 32 * 32)
    time_mix_extra_dim = 64 if E == 4096 else 32
    time_decay_extra_dim = 128 if E == 4096 else 64

    w = GGUFWriter(out_path, "rwkv6")
    w.add_kv("rwkv6.block_count", np.uint32(L))
    w.add_kv("rwkv6.embedding_length", np.uint32(E))
    w.add_kv("rwkv6.vocab_size", np.uint32(V))
    w.add_kv("rwkv6.context_length", np.uint32(1 << 20))
    w.add_kv("rwkv6.feed_forward_length", np.uint32(inter))
    w.add_kv("rwkv6.attention.head_count", np.uint32(0))
    w.add_kv("rwkv6.attention.layer_norm_epsilon",
             np.float32(cfgj.get("layer_norm_epsilon", 1e-5)))
    w.add_kv("rwkv6.wkv.head_size", np.uint32(head_size))
    w.add_kv("rwkv6.time_mix_extra_dim", np.uint32(time_mix_extra_dim))
    w.add_kv("rwkv6.time_decay_extra_dim", np.uint32(time_decay_extra_dim))
    w.add_kv("rwkv6.rescale_every_n_layers", np.uint32(rescale_every))
    w.add_kv("rwkv6.token_shift_count", np.uint32(2))

    # HF name templates (ref gguf-py tensor_mapping.py rwkv6 rows)
    att = {
        "time_maa_x": "time_mix_lerp_x", "time_maa_w1": "time_mix_w1",
        "time_maa_w2": "time_mix_w2", "time_decay": "time_mix_decay",
        "time_decay_w1": "time_mix_decay_w1",
        "time_decay_w2": "time_mix_decay_w2", "time_faaaa": "time_mix_first",
        "receptance.weight": "time_mix_receptance.weight",
        "key.weight": "time_mix_key.weight",
        "value.weight": "time_mix_value.weight",
        "gate.weight": "time_mix_gate.weight",
        "output.weight": "time_mix_output.weight",
        "ln_x.weight": "time_mix_ln.weight", "ln_x.bias": "time_mix_ln.bias",
    }
    ffn = {
        "time_maa_k": "channel_mix_lerp_k", "time_maa_r": "channel_mix_lerp_r",
        "key.weight": "channel_mix_key.weight",
        "receptance.weight": "channel_mix_receptance.weight",
        "value.weight": "channel_mix_value.weight",
    }
    top = {
        "rwkv.embeddings.weight": "token_embd.weight",
        "rwkv.ln_out.weight": "output_norm.weight",
        "rwkv.ln_out.bias": "output_norm.bias",
        "head.weight": "output.weight",
    }
    lerp_parts: dict[int, dict[str, np.ndarray]] = {}
    n = 0

    def emit(gname, data):
        nonlocal n
        w.add_tensor(gname, np.ascontiguousarray(data.astype(np.float32)),
                     GGMLType.F32)
        n += 1

    for name, data in _iter_hf_tensors(model_dir):
        if name in top:
            emit(top[name], data)
            continue
        parts = name.split(".")
        if not name.startswith("rwkv.blocks."):
            continue
        i = int(parts[2])
        rest = ".".join(parts[3:])
        if rest in ("pre_ln.weight", "pre_ln.bias"):
            if i == 0:
                emit("token_embd_norm." + parts[-1], data)
            continue
        if rest.startswith("ln1."):
            emit(f"blk.{i}.attn_norm.{parts[-1]}", data)
            continue
        if rest.startswith("ln2."):
            emit(f"blk.{i}.attn_norm_2.{parts[-1]}", data)
            continue
        scope, sub = parts[3], ".".join(parts[4:])
        if scope == "attention" and sub in att:
            g = att[sub]
            if g in ("time_mix_w1", "time_mix_decay_w1", "time_mix_decay_w2"):
                data = data.T
            elif g == "time_mix_w2":
                data = data.transpose(0, 2, 1)
            elif g in ("time_mix_decay", "time_mix_lerp_x"):
                data = data.reshape(-1)
            if g == "time_mix_output.weight" and rescale_every > 0:
                data = data / (2 ** (i // rescale_every))
            gname = g if g.endswith((".weight", ".bias")) else g + ".weight"
            emit(f"blk.{i}.{gname}", data)
            continue
        if scope == "attention" and sub.startswith("time_maa_") and \
                sub[-1] in "wkvrg" and len(sub) == len("time_maa_w"):
            lerp_parts.setdefault(i, {})[sub[-1]] = data.reshape(-1)
            d = lerp_parts[i]
            if len(d) == 5:
                fused = np.stack([d[m] for m in "wkvrg"]).reshape(5, 1, 1, -1)
                emit(f"blk.{i}.time_mix_lerp_fused.weight", fused)
            continue
        if scope == "feed_forward" and sub in ffn:
            g = ffn[sub]
            if g.startswith("channel_mix_lerp"):
                data = data.reshape(-1)
            if g == "channel_mix_value.weight" and rescale_every > 0:
                data = data / (2 ** (i // rescale_every))
            gname = g if g.endswith((".weight", ".bias")) else g + ".weight"
            emit(f"blk.{i}.{gname}", data)
            continue
    _write_tokenizer(w, model_dir)
    w.write()
    return {"arch": "rwkv6", "n_tensors": n, "n_layer": L}


def _convert_mamba(model_dir: Path, out_path: str, cfgj: dict, out_type: str) -> dict:
    """Mamba-1 HF checkpoint -> GGUF (ref: convert_hf_to_gguf MambaModel)."""
    L = cfgj["num_hidden_layers"]
    E = cfgj["hidden_size"]
    V = cfgj["vocab_size"]
    d_inner = cfgj.get("intermediate_size", 2 * E)
    d_conv = cfgj.get("conv_kernel", 4)
    d_state = cfgj.get("state_size", 16)
    dt_rank = cfgj.get("time_step_rank", (E + 15) // 16)

    w = GGUFWriter(out_path, "mamba")
    w.add_kv("mamba.block_count", np.uint32(L))
    w.add_kv("mamba.embedding_length", np.uint32(E))
    w.add_kv("mamba.vocab_size", np.uint32(V))
    w.add_kv("mamba.context_length", np.uint32(cfgj.get("max_position_embeddings", 2**20)))
    w.add_kv("mamba.ssm.conv_kernel", np.uint32(d_conv))
    w.add_kv("mamba.ssm.inner_size", np.uint32(d_inner))
    w.add_kv("mamba.ssm.state_size", np.uint32(d_state))
    w.add_kv("mamba.ssm.time_step_rank", np.uint32(dt_rank))
    w.add_kv("mamba.attention.layer_norm_rms_epsilon",
             np.float32(cfgj.get("layer_norm_epsilon", 1e-5)))
    if cfgj.get("_dt_b_c_rms"):
        # falcon-mamba (ref convert_hf_to_gguf FalconMambaModel:
        # add_ssm_dt_b_c_rms; llama.cpp reads LLM_KV_SSM_DT_B_C_RMS)
        w.add_kv("mamba.ssm.dt_b_c_rms", True)

    n = 0
    for name, data in _iter_hf_tensors(model_dir):
        parts = name.split(".")
        i = None
        templ = name
        if name.startswith("backbone.layers."):
            i = int(parts[2])
            templ = ".".join(parts[:2] + ["{i}"] + parts[3:])
        gname = _MAMBA_TENSORS.get(templ)
        if gname is None:
            continue
        gname = gname.format(i=i) if i is not None else gname
        if gname.endswith("ssm_conv1d.weight") and data.ndim == 3:
            data = data[:, 0, :]  # (d_inner, 1, d_conv) -> (d_inner, d_conv)
        if gname.endswith("ssm_a"):
            # reference GGUF convention: store A = -exp(A_log)
            # (convert_hf_to_gguf.py MambaModel "A_log --> A")
            data = -np.exp(data)
        w.add_tensor(gname, np.ascontiguousarray(data), GGMLType.F32)
        n += 1
    _write_tokenizer(w, model_dir)
    w.write()
    return {"arch": "mamba", "n_tensors": n, "n_layer": L}


_MAMBA2_TENSORS = {
    "backbone.embeddings.weight": "token_embd.weight",
    "backbone.norm_f.weight": "output_norm.weight",
    "lm_head.weight": "output.weight",
    "backbone.layers.{i}.norm.weight": "blk.{i}.attn_norm.weight",
    "backbone.layers.{i}.mixer.in_proj.weight": "blk.{i}.ssm_in.weight",
    "backbone.layers.{i}.mixer.conv1d.weight": "blk.{i}.ssm_conv1d.weight",
    "backbone.layers.{i}.mixer.conv1d.bias": "blk.{i}.ssm_conv1d.bias",
    "backbone.layers.{i}.mixer.dt_bias": "blk.{i}.ssm_dt.bias",
    "backbone.layers.{i}.mixer.A_log": "blk.{i}.ssm_a",
    "backbone.layers.{i}.mixer.D": "blk.{i}.ssm_d",
    "backbone.layers.{i}.mixer.norm.weight": "blk.{i}.ssm_norm.weight",
    "backbone.layers.{i}.mixer.out_proj.weight": "blk.{i}.ssm_out.weight",
}


def _convert_mamba2(model_dir: Path, out_path: str, cfgj: dict, out_type: str) -> dict:
    """Mamba-2 (SSD) HF checkpoint -> GGUF (ref: convert_hf_to_gguf.py
    Mamba2Model:6747-6837; time_step_rank carries n_head, A/D unsqueezed,
    ssm_norm reshaped to (n_group, d_inner/n_group))."""
    L = cfgj["num_hidden_layers"]
    E = cfgj["hidden_size"]
    V = cfgj["vocab_size"]
    d_inner = cfgj.get("intermediate_size") or cfgj.get("expand", 2) * E
    d_conv = cfgj.get("conv_kernel", 4)
    d_state = cfgj.get("state_size", 128)
    head_dim = cfgj.get("head_dim", 64)
    n_head = d_inner // head_dim
    n_group = cfgj.get("n_groups", 1)

    w = GGUFWriter(out_path, "mamba2")
    w.add_kv("mamba2.block_count", np.uint32(L))
    w.add_kv("mamba2.embedding_length", np.uint32(E))
    w.add_kv("mamba2.vocab_size", np.uint32(V))
    w.add_kv("mamba2.context_length",
             np.uint32(cfgj.get("max_position_embeddings", 2**20)))
    w.add_kv("mamba2.ssm.conv_kernel", np.uint32(d_conv))
    w.add_kv("mamba2.ssm.inner_size", np.uint32(d_inner))
    w.add_kv("mamba2.ssm.state_size", np.uint32(d_state))
    w.add_kv("mamba2.ssm.time_step_rank", np.uint32(n_head))
    w.add_kv("mamba2.ssm.group_count", np.uint32(n_group))
    w.add_kv("mamba2.attention.layer_norm_rms_epsilon",
             np.float32(cfgj.get("layer_norm_epsilon", 1e-5)))

    n = 0
    for name, data in _iter_hf_tensors(model_dir):
        parts = name.split(".")
        i = None
        templ = name
        if name.startswith("backbone.layers."):
            i = int(parts[2])
            templ = ".".join(parts[:2] + ["{i}"] + parts[3:])
        gname = _MAMBA2_TENSORS.get(templ)
        if gname is None:
            continue
        gname = gname.format(i=i) if i is not None else gname
        if gname.endswith("ssm_conv1d.weight") and data.ndim == 3:
            data = data[:, 0, :]
        if gname.endswith("ssm_a"):
            data = -np.exp(data).reshape(-1, 1)  # A = -exp(A_log), {1, nh} ne
        if gname.endswith("ssm_d") and data.ndim == 1:
            data = data.reshape(-1, 1)
        if gname.endswith("ssm_norm.weight"):
            data = data.reshape(n_group, d_inner // n_group)
        w.add_tensor(gname, np.ascontiguousarray(data), GGMLType.F32)
        n += 1
    _write_tokenizer(w, model_dir)
    w.write()
    return {"arch": "mamba2", "n_tensors": n, "n_layer": L}


def _convert_falcon_h1(model_dir: Path, out_path: str, cfgj: dict, out_type: str) -> dict:
    """Falcon-H1 (parallel attention + mamba2 every layer) HF checkpoint ->
    GGUF (ref: convert_hf_to_gguf.py FalconH1Model:9320-9424 — every
    multiplier hparam is baked into the weights at conversion)."""
    L = cfgj["num_hidden_layers"]
    E = cfgj["hidden_size"]
    V = cfgj["vocab_size"]
    d_inner = cfgj["mamba_d_ssm"]
    d_conv = cfgj.get("mamba_d_conv", 4)
    d_state = cfgj.get("mamba_d_state", 128)
    d_head = cfgj.get("mamba_d_head", 64)
    n_head_ssm = d_inner // d_head
    n_group = cfgj.get("mamba_n_groups", 1)
    gts = n_group * d_state

    mul = lambda k, d=1.0: cfgj.get(k) if cfgj.get(k) is not None else d
    mlp_m = cfgj.get("mlp_multipliers") or [1.0, 1.0]
    ssm_m = cfgj.get("ssm_multipliers") or [1.0] * 5

    w = GGUFWriter(out_path, "falcon-h1")
    w.add_kv("falcon-h1.block_count", np.uint32(L))
    w.add_kv("falcon-h1.embedding_length", np.uint32(E))
    w.add_kv("falcon-h1.vocab_size", np.uint32(V))
    w.add_kv("falcon-h1.context_length",
             np.uint32(cfgj.get("max_position_embeddings", 8192)))
    w.add_kv("falcon-h1.feed_forward_length", np.uint32(cfgj["intermediate_size"]))
    w.add_kv("falcon-h1.attention.head_count",
             np.uint32(cfgj["num_attention_heads"]))
    w.add_kv("falcon-h1.attention.head_count_kv",
             np.uint32(cfgj["num_key_value_heads"]))
    w.add_kv("falcon-h1.attention.key_length", np.uint32(cfgj["head_dim"]))
    w.add_kv("falcon-h1.attention.value_length", np.uint32(cfgj["head_dim"]))
    w.add_kv("falcon-h1.attention.layer_norm_rms_epsilon",
             np.float32(cfgj.get("rms_norm_eps", 1e-5)))
    w.add_kv("falcon-h1.rope.freq_base", np.float32(cfgj.get("rope_theta", 1e5)))
    w.add_kv("falcon-h1.ssm.conv_kernel", np.uint32(d_conv))
    w.add_kv("falcon-h1.ssm.inner_size", np.uint32(d_inner))
    w.add_kv("falcon-h1.ssm.state_size", np.uint32(d_state))
    w.add_kv("falcon-h1.ssm.time_step_rank", np.uint32(n_head_ssm))
    w.add_kv("falcon-h1.ssm.group_count", np.uint32(n_group))

    _FH1_SUFFIX = {
        "input_layernorm.weight": "attn_norm.weight",
        "pre_ff_layernorm.weight": "ffn_norm.weight",
        "self_attn.q_proj.weight": "attn_q.weight",
        "self_attn.k_proj.weight": "attn_k.weight",
        "self_attn.v_proj.weight": "attn_v.weight",
        "self_attn.o_proj.weight": "attn_output.weight",
        "mamba.in_proj.weight": "ssm_in.weight",
        "mamba.conv1d.weight": "ssm_conv1d.weight",
        "mamba.conv1d.bias": "ssm_conv1d.bias",
        "mamba.dt_bias": "ssm_dt.bias",
        "mamba.A_log": "ssm_a",
        "mamba.D": "ssm_d",
        "mamba.norm.weight": "ssm_norm.weight",
        "mamba.out_proj.weight": "ssm_out.weight",
        "feed_forward.gate_proj.weight": "ffn_gate.weight",
        "feed_forward.up_proj.weight": "ffn_up.weight",
        "feed_forward.down_proj.weight": "ffn_down.weight",
    }
    n = 0

    def emit(gname, data):
        nonlocal n
        w.add_tensor(gname, np.ascontiguousarray(data), GGMLType.F32)
        n += 1

    for name, data in _iter_hf_tensors(model_dir):
        data = np.asarray(data, np.float32)
        if name == "model.embed_tokens.weight":
            emit("token_embd.weight", data * mul("embedding_multiplier"))
            continue
        if name == "model.final_layernorm.weight":
            emit("output_norm.weight", data)
            continue
        if name == "lm_head.weight":
            emit("output.weight", data * mul("lm_head_multiplier"))
            continue
        if not name.startswith("model.layers."):
            continue
        parts = name.split(".")
        i = int(parts[2])
        suffix = ".".join(parts[3:])
        gname = _FH1_SUFFIX.get(suffix)
        if gname is None:
            continue
        # bake the falcon-h1 multiplier zoo into the weights
        # (FalconH1Model.modify_tensors:9364-9399)
        if gname == "ffn_gate.weight":
            data = data * mlp_m[0]
        elif gname == "ffn_down.weight":
            data = data * mlp_m[1]
        elif gname == "attn_q.weight" or gname == "attn_v.weight":
            data = data * mul("attention_in_multiplier")
        elif gname == "attn_k.weight":
            data = data * mul("key_multiplier") * mul("attention_in_multiplier")
        elif gname == "attn_output.weight":
            data = data * mul("attention_out_multiplier")
        elif gname == "ssm_out.weight":
            data = data * mul("ssm_out_multiplier")
        elif gname == "ssm_in.weight":
            data = data * mul("ssm_in_multiplier")
            data[:d_inner] *= ssm_m[0]
            data[d_inner : 2 * d_inner] *= ssm_m[1]
            data[2 * d_inner : 2 * d_inner + gts] *= ssm_m[2]
            data[2 * d_inner + gts : 2 * d_inner + 2 * gts] *= ssm_m[3]
            data[2 * d_inner + 2 * gts :] *= ssm_m[4]
        elif gname == "ssm_conv1d.weight" and data.ndim == 3:
            data = data[:, 0, :]
        elif gname == "ssm_a":
            data = -np.exp(data).reshape(-1, 1)
        elif gname == "ssm_d":
            data = data.reshape(-1, 1)
        elif gname == "ssm_norm.weight":
            data = data.reshape(n_group, d_inner // n_group)
        emit(f"blk.{i}.{gname}", data)
    _write_tokenizer(w, model_dir)
    w.write()
    return {"arch": "falcon-h1", "n_tensors": n, "n_layer": L}


def _convert_granite_hybrid(model_dir: Path, out_path: str, cfgj: dict,
                            out_type: str) -> dict:
    """GraniteMoeHybrid (granite 4.0: interleaved mamba2/attention + fused
    MoE + shared expert + granite multipliers) -> GGUF (ref:
    src/models/granite-hybrid.cpp; arch name 'granitehybrid',
    llama-arch.cpp:89)."""
    L = cfgj["num_hidden_layers"]
    E = cfgj["hidden_size"]
    V = cfgj["vocab_size"]
    F = cfgj["intermediate_size"]
    d_inner = cfgj.get("mamba_expand", 2) * E
    d_conv = cfgj.get("mamba_d_conv", 4)
    d_state = cfgj.get("mamba_d_state", 128)
    n_head_ssm = cfgj.get("mamba_n_heads", 8)
    n_group = cfgj.get("mamba_n_groups", 1)
    layer_types = cfgj.get("layer_types") or ["mamba"] * L
    n_kv = cfgj["num_key_value_heads"]
    kv_vec = [n_kv if t == "attention" else 0 for t in layer_types]
    n_expert = cfgj.get("num_local_experts", 0)
    shared_F = cfgj.get("shared_intermediate_size", 0)

    a = "granitehybrid"
    w = GGUFWriter(out_path, a)
    w.add_kv(f"{a}.block_count", np.uint32(L))
    w.add_kv(f"{a}.embedding_length", np.uint32(E))
    w.add_kv(f"{a}.vocab_size", np.uint32(V))
    w.add_kv(f"{a}.context_length",
             np.uint32(cfgj.get("max_position_embeddings", 8192)))
    w.add_kv(f"{a}.feed_forward_length", np.uint32(F))
    w.add_kv(f"{a}.attention.head_count",
             np.uint32(cfgj["num_attention_heads"]))
    w.add_array(f"{a}.attention.head_count_kv", np.asarray(kv_vec, np.uint32))
    w.add_kv(f"{a}.attention.layer_norm_rms_epsilon",
             np.float32(cfgj.get("rms_norm_eps", 1e-5)))
    w.add_kv(f"{a}.ssm.conv_kernel", np.uint32(d_conv))
    w.add_kv(f"{a}.ssm.inner_size", np.uint32(d_inner))
    w.add_kv(f"{a}.ssm.state_size", np.uint32(d_state))
    w.add_kv(f"{a}.ssm.time_step_rank", np.uint32(n_head_ssm))
    w.add_kv(f"{a}.ssm.group_count", np.uint32(n_group))
    # granite multipliers (same KV semantics as _kv_granite)
    w.add_kv(f"{a}.embedding_scale",
             np.float32(cfgj.get("embedding_multiplier", 1.0)))
    w.add_kv(f"{a}.residual_scale",
             np.float32(cfgj.get("residual_multiplier", 1.0)))
    w.add_kv(f"{a}.logit_scale",
             np.float32(1.0 / cfgj.get("logits_scaling", 1.0)))
    w.add_kv(f"{a}.attention.scale",
             np.float32(cfgj.get("attention_multiplier", 0.0)))
    if n_expert:
        w.add_kv(f"{a}.expert_count", np.uint32(n_expert))
        w.add_kv(f"{a}.expert_used_count",
                 np.uint32(cfgj.get("num_experts_per_tok", 2)))
        # HF GraniteMoeTopKGating: top-k on logits, softmax over selected
        w.add_kv(f"{a}.expert_gating_func", np.uint32(3))
        w.add_kv(f"{a}.expert_weights_norm", False)

    _GH_SUFFIX = {
        "input_layernorm.weight": "attn_norm.weight",
        "post_attention_layernorm.weight": "ffn_norm.weight",
        "self_attn.q_proj.weight": "attn_q.weight",
        "self_attn.k_proj.weight": "attn_k.weight",
        "self_attn.v_proj.weight": "attn_v.weight",
        "self_attn.o_proj.weight": "attn_output.weight",
        "mamba.in_proj.weight": "ssm_in.weight",
        "mamba.conv1d.weight": "ssm_conv1d.weight",
        "mamba.conv1d.bias": "ssm_conv1d.bias",
        "mamba.dt_bias": "ssm_dt.bias",
        "mamba.A_log": "ssm_a",
        "mamba.D": "ssm_d",
        "mamba.norm.weight": "ssm_norm.weight",
        "mamba.out_proj.weight": "ssm_out.weight",
        "block_sparse_moe.router.layer.weight": "ffn_gate_inp.weight",
        "block_sparse_moe.output_linear.weight": "ffn_down_exps.weight",
    }
    n = 0

    def emit(gname, data):
        nonlocal n
        w.add_tensor(gname, np.ascontiguousarray(data), GGMLType.F32)
        n += 1

    for name, data in _iter_hf_tensors(model_dir):
        data = np.asarray(data, np.float32)
        if name == "model.embed_tokens.weight":
            emit("token_embd.weight", data)
            continue
        if name == "model.norm.weight":
            emit("output_norm.weight", data)
            continue
        if name == "lm_head.weight":
            emit("output.weight", data)
            continue
        if not name.startswith("model.layers."):
            continue
        parts = name.split(".")
        i = int(parts[2])
        suffix = ".".join(parts[3:])
        if suffix == "block_sparse_moe.input_linear.weight":
            # fused [gate; up] per expert (granitemoe convention)
            emit(f"blk.{i}.ffn_gate_exps.weight",
                 np.ascontiguousarray(data[:, :F]))
            emit(f"blk.{i}.ffn_up_exps.weight",
                 np.ascontiguousarray(data[:, F:]))
            continue
        if suffix == "shared_mlp.input_linear.weight":
            # fused [gate; up] shared expert
            emit(f"blk.{i}.ffn_gate_shexp.weight",
                 np.ascontiguousarray(data[:shared_F]))
            emit(f"blk.{i}.ffn_up_shexp.weight",
                 np.ascontiguousarray(data[shared_F:]))
            continue
        if suffix == "shared_mlp.output_linear.weight":
            emit(f"blk.{i}.ffn_down_shexp.weight", data)
            continue
        gname = _GH_SUFFIX.get(suffix)
        if gname is None:
            continue
        if gname == "ssm_conv1d.weight" and data.ndim == 3:
            data = data[:, 0, :]
        if gname == "ssm_a":
            data = -np.exp(data).reshape(-1, 1)
        if gname == "ssm_d":
            data = data.reshape(-1, 1)
        if gname == "ssm_norm.weight":
            data = data.reshape(n_group, d_inner // n_group)
        emit(f"blk.{i}.{gname}", data)
    _write_tokenizer(w, model_dir)
    w.write()
    return {"arch": "granitehybrid", "n_tensors": n, "n_layer": L}


def _convert_qwen3next(model_dir: Path, out_path: str, cfgj: dict,
                       out_type: str) -> dict:
    """Qwen3-Next (gated delta net + gated attention hybrid MoE) -> GGUF
    (ref: convert_hf_to_gguf.py Qwen3NextModel:4346-4373 — ssm KVs carry
    the linear-attention geometry, norm weights are zero-centered (+1
    baked) EXCEPT linear_attn.norm, A_log -> -exp)."""
    L = cfgj["num_hidden_layers"]
    E = cfgj["hidden_size"]
    V = cfgj["vocab_size"]
    H = cfgj["num_attention_heads"]
    D = cfgj.get("head_dim") or E // H
    hk = cfgj["linear_key_head_dim"]
    hv = cfgj["linear_value_head_dim"]
    nk = cfgj["linear_num_key_heads"]
    nv = cfgj["linear_num_value_heads"]
    d_conv = cfgj["linear_conv_kernel_dim"]
    layer_types = cfgj.get("layer_types") or [
        "full_attention" if (i + 1) % 4 == 0 else "linear_attention"
        for i in range(L)]
    n_kv = cfgj["num_key_value_heads"]
    kv_vec = [n_kv if t == "full_attention" else 0 for t in layer_types]
    X = cfgj["num_experts"]

    a = "qwen3next"
    w = GGUFWriter(out_path, a)
    w.add_kv(f"{a}.block_count", np.uint32(L))
    w.add_kv(f"{a}.embedding_length", np.uint32(E))
    w.add_kv(f"{a}.vocab_size", np.uint32(V))
    w.add_kv(f"{a}.context_length",
             np.uint32(cfgj.get("max_position_embeddings", 2**18)))
    w.add_kv(f"{a}.feed_forward_length", np.uint32(cfgj["intermediate_size"]))
    w.add_kv(f"{a}.attention.head_count", np.uint32(H))
    w.add_array(f"{a}.attention.head_count_kv", np.asarray(kv_vec, np.uint32))
    w.add_kv(f"{a}.attention.key_length", np.uint32(D))
    w.add_kv(f"{a}.attention.layer_norm_rms_epsilon",
             np.float32(cfgj.get("rms_norm_eps", 1e-6)))
    w.add_kv(f"{a}.rope.freq_base", np.float32(cfgj.get("rope_theta", 1e7)))
    w.add_kv(f"{a}.rope.dimension_count",
             np.uint32(int(D * cfgj.get("partial_rotary_factor", 0.25))))
    w.add_kv(f"{a}.ssm.conv_kernel", np.uint32(d_conv))
    w.add_kv(f"{a}.ssm.state_size", np.uint32(hk))
    w.add_kv(f"{a}.ssm.group_count", np.uint32(nk))
    w.add_kv(f"{a}.ssm.time_step_rank", np.uint32(nv))
    w.add_kv(f"{a}.ssm.inner_size", np.uint32(nv * hv))
    w.add_kv(f"{a}.expert_count", np.uint32(X))
    w.add_kv(f"{a}.expert_used_count",
             np.uint32(cfgj.get("num_experts_per_tok", 8)))
    w.add_kv(f"{a}.expert_feed_forward_length",
             np.uint32(cfgj["moe_intermediate_size"]))
    w.add_kv(f"{a}.expert_weights_norm",
             bool(cfgj.get("norm_topk_prob", True)))

    _Q3N_SUFFIX = {
        "input_layernorm.weight": ("attn_norm.weight", True),
        "post_attention_layernorm.weight": ("attn_post_norm.weight", True),
        "self_attn.q_proj.weight": ("attn_q.weight", False),
        "self_attn.k_proj.weight": ("attn_k.weight", False),
        "self_attn.v_proj.weight": ("attn_v.weight", False),
        "self_attn.o_proj.weight": ("attn_output.weight", False),
        "self_attn.q_norm.weight": ("attn_q_norm.weight", True),
        "self_attn.k_norm.weight": ("attn_k_norm.weight", True),
        "linear_attn.in_proj_qkvz.weight": ("ssm_in.weight", False),
        "linear_attn.in_proj_ba.weight": ("ssm_beta_alpha.weight", False),
        "linear_attn.conv1d.weight": ("ssm_conv1d.weight", False),
        "linear_attn.conv1d.bias": ("ssm_conv1d.bias", False),
        "linear_attn.dt_bias": ("ssm_dt.bias", False),
        "linear_attn.A_log": ("ssm_a", False),
        "linear_attn.norm.weight": ("ssm_norm.weight", False),  # NOT +1
        "linear_attn.out_proj.weight": ("ssm_out.weight", False),
        "mlp.gate.weight": ("ffn_gate_inp.weight", False),
        "mlp.shared_expert.gate_proj.weight": ("ffn_gate_shexp.weight", False),
        "mlp.shared_expert.up_proj.weight": ("ffn_up_shexp.weight", False),
        "mlp.shared_expert.down_proj.weight": ("ffn_down_shexp.weight", False),
        "mlp.shared_expert_gate.weight": ("ffn_gate_inp_shexp.weight", False),
    }
    experts: dict[tuple[int, str], dict[int, np.ndarray]] = {}
    n = 0

    def emit(gname, data):
        nonlocal n
        w.add_tensor(gname, np.ascontiguousarray(np.asarray(data, np.float32)),
                     GGMLType.F32)
        n += 1

    for name, data in _iter_hf_tensors(model_dir):
        if name.startswith("mtp"):
            continue  # multi-token-prediction head (reference skips too)
        if name == "model.embed_tokens.weight":
            emit("token_embd.weight", data)
            continue
        if name == "model.norm.weight":
            emit("output_norm.weight", np.asarray(data, np.float32) + 1.0)
            continue
        if name == "lm_head.weight":
            emit("output.weight", data)
            continue
        if not name.startswith("model.layers."):
            continue
        parts = name.split(".")
        i = int(parts[2])
        suffix = ".".join(parts[3:])
        if ".experts." in suffix:
            j = int(parts[5])
            kind = parts[6].split("_")[0]
            experts.setdefault((i, kind), {})[j] = np.asarray(data, np.float32)
            continue
        ent = _Q3N_SUFFIX.get(suffix)
        if ent is None:
            continue
        gname, plus_one = ent
        data = np.asarray(data, np.float32)
        if plus_one:
            data = data + 1.0  # zero-centered RMSNorm -> standard weights
        if gname == "ssm_conv1d.weight" and data.ndim == 3:
            data = data[:, 0, :]
        if gname == "ssm_a":
            data = -np.exp(data)
        emit(f"blk.{i}.{gname}", data)

    for (i, kind), by_j in sorted(experts.items()):
        emit(f"blk.{i}.ffn_{kind}_exps.weight",
             np.stack([by_j[j] for j in sorted(by_j)]))
    _write_tokenizer(w, model_dir)
    w.write()
    return {"arch": "qwen3next", "n_tensors": n, "n_layer": L}


def _convert_lfm2(model_dir: Path, out_path: str, cfgj: dict, out_type: str) -> dict:
    """LFM2 (gated short-conv + attention hybrid) -> GGUF (ref:
    src/models/lfm2.cpp; shortconv tensors llama-arch.cpp:2340-2342).
    feed_forward_length is derived from the checkpoint (HF auto-adjusts
    the block ff dim), not from config."""
    L = cfgj["num_hidden_layers"]
    E = cfgj["hidden_size"]
    V = cfgj["vocab_size"]
    l_cache = cfgj.get("conv_L_cache", 3)
    layer_types = cfgj.get("layer_types") or ["conv"] * L
    n_kv = cfgj["num_key_value_heads"]
    kv_vec = [n_kv if t == "full_attention" else 0 for t in layer_types]

    a = "lfm2"
    w = GGUFWriter(out_path, a)
    w.add_kv(f"{a}.block_count", np.uint32(L))
    w.add_kv(f"{a}.embedding_length", np.uint32(E))
    w.add_kv(f"{a}.vocab_size", np.uint32(V))
    w.add_kv(f"{a}.context_length",
             np.uint32(cfgj.get("max_position_embeddings", 128000)))
    w.add_kv(f"{a}.attention.head_count",
             np.uint32(cfgj["num_attention_heads"]))
    w.add_array(f"{a}.attention.head_count_kv", np.asarray(kv_vec, np.uint32))
    w.add_kv(f"{a}.attention.layer_norm_rms_epsilon",
             np.float32(cfgj.get("norm_eps", 1e-5)))
    w.add_kv(f"{a}.rope.freq_base", np.float32(cfgj.get("rope_theta", 1e6)))
    w.add_kv(f"{a}.shortconv.l_cache", np.uint32(l_cache))

    _LFM2_SUFFIX = {
        "operator_norm.weight": "attn_norm.weight",
        "ffn_norm.weight": "ffn_norm.weight",
        "self_attn.q_proj.weight": "attn_q.weight",
        "self_attn.k_proj.weight": "attn_k.weight",
        "self_attn.v_proj.weight": "attn_v.weight",
        "self_attn.out_proj.weight": "attn_output.weight",
        "self_attn.q_layernorm.weight": "attn_q_norm.weight",
        "self_attn.k_layernorm.weight": "attn_k_norm.weight",
        "conv.in_proj.weight": "shortconv.in_proj.weight",
        "conv.conv.weight": "shortconv.conv.weight",
        "conv.out_proj.weight": "shortconv.out_proj.weight",
        "feed_forward.w1.weight": "ffn_gate.weight",
        "feed_forward.w3.weight": "ffn_up.weight",
        "feed_forward.w2.weight": "ffn_down.weight",
    }
    n = 0
    n_ff = 0
    for name, data in _iter_hf_tensors(model_dir):
        data = np.asarray(data, np.float32)
        if name == "model.embed_tokens.weight":
            w.add_tensor("token_embd.weight", data, GGMLType.F32)
            n += 1
            continue
        if name == "model.embedding_norm.weight":
            w.add_tensor("output_norm.weight", data, GGMLType.F32)
            n += 1
            continue
        if name == "lm_head.weight":
            w.add_tensor("output.weight", data, GGMLType.F32)
            n += 1
            continue
        if not name.startswith("model.layers."):
            continue
        parts = name.split(".")
        i = int(parts[2])
        suffix = ".".join(parts[3:])
        gname = _LFM2_SUFFIX.get(suffix)
        if gname is None:
            continue
        if gname == "shortconv.conv.weight" and data.ndim == 3:
            data = data[:, 0, :]  # (E, 1, L) -> (E, L)
        if gname == "ffn_gate.weight":
            n_ff = data.shape[0]
        w.add_tensor(f"blk.{i}.{gname}", np.ascontiguousarray(data), GGMLType.F32)
        n += 1
    w.add_kv(f"{a}.feed_forward_length", np.uint32(n_ff))
    _write_tokenizer(w, model_dir)
    w.write()
    return {"arch": "lfm2", "n_tensors": n, "n_layer": L}


def _convert_jamba(model_dir: Path, out_path: str, cfgj: dict, out_type: str) -> dict:
    """Jamba (hybrid attention+mamba+MoE) HF checkpoint -> GGUF
    (ref: convert_hf_to_gguf.py JambaModel:6840-6940; per-layer kv-head
    vector encodes which layers are recurrent)."""
    L = cfgj["num_hidden_layers"]
    E = cfgj["hidden_size"]
    V = cfgj["vocab_size"]
    d_inner = cfgj.get("mamba_expand", 2) * E
    d_conv = cfgj.get("mamba_d_conv", 4)
    d_state = cfgj.get("mamba_d_state", 16)
    dt_rank = cfgj.get("mamba_dt_rank", (E + 15) // 16)
    n_kv = cfgj["num_key_value_heads"]
    a_off = cfgj.get("attn_layer_offset", 4)
    a_per = cfgj.get("attn_layer_period", 8)
    kv_vec = [n_kv if i >= a_off and (i - a_off) % a_per == 0 else 0
              for i in range(L)]
    n_expert = cfgj.get("num_experts", 1)
    moe = n_expert > 1

    w = GGUFWriter(out_path, "jamba")
    w.add_kv("jamba.block_count", np.uint32(L))
    w.add_kv("jamba.embedding_length", np.uint32(E))
    w.add_kv("jamba.vocab_size", np.uint32(V))
    w.add_kv("jamba.context_length",
             np.uint32(cfgj.get("max_position_embeddings", 2**18)))
    w.add_kv("jamba.feed_forward_length", np.uint32(cfgj["intermediate_size"]))
    w.add_kv("jamba.attention.head_count",
             np.uint32(cfgj["num_attention_heads"]))
    w.add_array("jamba.attention.head_count_kv",
                np.asarray(kv_vec, np.uint32))
    w.add_kv("jamba.ssm.conv_kernel", np.uint32(d_conv))
    w.add_kv("jamba.ssm.inner_size", np.uint32(d_inner))
    w.add_kv("jamba.ssm.state_size", np.uint32(d_state))
    w.add_kv("jamba.ssm.time_step_rank", np.uint32(dt_rank))
    w.add_kv("jamba.attention.layer_norm_rms_epsilon",
             np.float32(cfgj.get("rms_norm_eps", 1e-6)))
    if moe:
        w.add_kv("jamba.expert_count", np.uint32(n_expert))
        w.add_kv("jamba.expert_used_count",
                 np.uint32(cfgj.get("num_experts_per_tok", 2)))

    _JAMBA_SUFFIX = {
        "input_layernorm.weight": "attn_norm.weight",
        "pre_ff_layernorm.weight": "ffn_norm.weight",
        "self_attn.q_proj.weight": "attn_q.weight",
        "self_attn.k_proj.weight": "attn_k.weight",
        "self_attn.v_proj.weight": "attn_v.weight",
        "self_attn.o_proj.weight": "attn_output.weight",
        "mamba.in_proj.weight": "ssm_in.weight",
        "mamba.conv1d.weight": "ssm_conv1d.weight",
        "mamba.conv1d.bias": "ssm_conv1d.bias",
        "mamba.x_proj.weight": "ssm_x.weight",
        "mamba.dt_proj.weight": "ssm_dt.weight",
        "mamba.dt_proj.bias": "ssm_dt.bias",
        "mamba.dt_layernorm.weight": "ssm_dt_norm.weight",
        "mamba.b_layernorm.weight": "ssm_b_norm.weight",
        "mamba.c_layernorm.weight": "ssm_c_norm.weight",
        "mamba.A_log": "ssm_a",
        "mamba.D": "ssm_d",
        "mamba.out_proj.weight": "ssm_out.weight",
        "feed_forward.gate_proj.weight": "ffn_gate.weight",
        "feed_forward.up_proj.weight": "ffn_up.weight",
        "feed_forward.down_proj.weight": "ffn_down.weight",
        "feed_forward.router.weight": "ffn_gate_inp.weight",
    }
    experts: dict[tuple[int, str], dict[int, np.ndarray]] = {}
    tok_embd = None
    n = 0

    def emit(gname, data):
        nonlocal n
        w.add_tensor(gname, np.ascontiguousarray(data), GGMLType.F32)
        n += 1

    for name, data in _iter_hf_tensors(model_dir):
        if name == "model.embed_tokens.weight":
            tok_embd = data
            emit("token_embd.weight", data)
            continue
        if name == "model.final_layernorm.weight":
            emit("output_norm.weight", data)
            continue
        if name == "lm_head.weight":
            emit("output.weight", data)
            continue
        if not name.startswith("model.layers."):
            continue
        parts = name.split(".")
        i = int(parts[2])
        suffix = ".".join(parts[3:])
        if ".experts." in suffix:
            # feed_forward.experts.{j}.{gate,up,down}_proj.weight
            j = int(parts[5])
            kind = parts[6].split("_")[0]  # gate | up | down
            experts.setdefault((i, kind), {})[j] = data
            continue
        gname = _JAMBA_SUFFIX.get(suffix)
        if gname is None:
            continue
        if gname == "ssm_conv1d.weight" and data.ndim == 3:
            data = data[:, 0, :]
        if gname == "ssm_a":
            data = -np.exp(data)  # reference GGUF convention (A, not A_log)
        emit(f"blk.{i}.{gname}", data)

    for (i, kind), by_j in sorted(experts.items()):
        stacked = np.stack([by_j[j] for j in sorted(by_j)])  # (X, out, in)
        emit(f"blk.{i}.ffn_{kind}_exps.weight", stacked)
    _write_tokenizer(w, model_dir)
    w.write()
    return {"arch": "jamba", "n_tensors": n, "n_layer": L,
            "tied": tok_embd is not None}


def _write_tokenizer(w: GGUFWriter, model_dir: Path):
    tj = model_dir / "tokenizer.json"
    if not tj.exists():
        return
    try:
        data = json.loads(tj.read_text())
        model = data.get("model", {})
        if model.get("type") == "BPE":
            vocab = model["vocab"]
            tokens = [None] * len(vocab)
            for tok, tid in vocab.items():
                tokens[tid] = tok
            merges = [" ".join(m) if isinstance(m, list) else m
                      for m in model.get("merges", [])]
            w.add_kv("tokenizer.ggml.model", "gpt2")
            w.add_array("tokenizer.ggml.tokens", tokens)
            w.add_array("tokenizer.ggml.merges", merges)
            w.add_array("tokenizer.ggml.token_type",
                        np.ones(len(tokens), np.int32))
    except Exception as e:
        print(f"tokenizer conversion skipped: {e}", file=sys.stderr)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="sparkinfer-convert-hf")
    ap.add_argument("model_dir")
    ap.add_argument("-o", "--outfile", required=True)
    ap.add_argument("--pred-path", default=None,
                    help="dir of per-layer predictor checkpoints model_<i>.pt")
    ap.add_argument("--pred-bias", action="store_true")
    ap.add_argument("--outtype", choices=["f32", "f16", "bf16", "q8_0"],
                    default="f16")
    args = ap.parse_args(argv)
    info = convert(args.model_dir, args.outfile, args.pred_path, args.pred_bias,
                   args.outtype)
    print(json.dumps(info))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
