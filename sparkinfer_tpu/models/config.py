"""Model hyperparameters + architecture traits registry.

The TPU-native analogue of src/llama-arch.{h,cpp} + src/llama-hparams.*:
a declarative per-arch trait table (norm type, activation, rope mode,
attention layout, tensor names) driving one generic transformer forward,
instead of 100 hand-written graph-builder files.

SparkInfer archs carried over (ref: src/llama-arch.h:14-15):
prosparse_llama, bamboo; sparse variants of qwen2/opt/falcon activate via
the predictor tensors + `{arch}.pred_lora` KV (ref: src/llama-hparams.h:54).
"""

from __future__ import annotations

import dataclasses
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from ..gguf.reader import GGUFReader


@dataclasses.dataclass(frozen=True)
class ArchTraits:
    name: str
    norm: str = "rms"  # "rms" | "ln"
    act: str = "silu"  # ops.activations.act_fn key
    rope_mode: str = "norm"  # "norm" | "neox" | "none"
    parallel_blocks: bool = False  # falcon: attn and FFN in parallel
    fused_qkv: bool = False  # falcon: blk.i.attn_qkv
    qkv_bias: bool = False  # qwen2
    attn_out_bias: bool = False
    ffn_bias: bool = False  # opt
    norm_bias: bool = False  # ln archs carry biases
    pos_embd: bool = False  # opt learned positions
    pos_embd_offset: int = 0  # opt: HF offset 2
    final_logit_softcap: float = 0.0
    recurrent: bool = False  # state-space/linear-attention family (mamba)
    wkv_version: int = 0  # RWKV family: 6 | 7 (0 = not RWKV)
    # sparse-FFN activation used when predictors present
    # (ref: src/llama-graph.cpp:1063-1094)
    sparse_act: str = "fatrelu"


ARCH_REGISTRY: dict[str, ArchTraits] = {}


def _reg(t: ArchTraits):
    ARCH_REGISTRY[t.name] = t
    return t


_reg(ArchTraits("llama"))
_reg(ArchTraits("prosparse_llama", act="fatrelu", sparse_act="fatrelu"))
_reg(ArchTraits("bamboo", act="drelu", sparse_act="drelu"))
_reg(ArchTraits("mistral"))
_reg(ArchTraits("qwen2", rope_mode="neox", qkv_bias=True, sparse_act="drelu"))
_reg(ArchTraits("qwen3", rope_mode="neox"))
# diffusion LMs (examples/diffusion): denoised via runtime/diffusion.py
# with non-causal attention; dream is qwen2-flavoured, llada llama-flavoured
_reg(ArchTraits("dream", rope_mode="neox", qkv_bias=True))
_reg(ArchTraits("llada"))
_reg(
    ArchTraits(
        "falcon",
        norm="ln",
        act="gelu",
        rope_mode="neox",
        parallel_blocks=True,
        fused_qkv=True,
        norm_bias=True,
        sparse_act="relu",
    )
)
_reg(
    ArchTraits(
        "opt",
        norm="ln",
        act="relu",
        rope_mode="none",
        qkv_bias=True,
        attn_out_bias=True,
        ffn_bias=True,
        norm_bias=True,
        pos_embd=True,
        pos_embd_offset=2,
        sparse_act="relu",
    )
)
_reg(ArchTraits("gpt2", norm="ln", act="gelu", rope_mode="none", fused_qkv=True,
                qkv_bias=True, attn_out_bias=True, ffn_bias=True, norm_bias=True,
                pos_embd=True))
_reg(ArchTraits("gemma2", rope_mode="neox", act="geglu", final_logit_softcap=30.0))
_reg(ArchTraits("stablelm", rope_mode="neox", norm="ln", norm_bias=True))
# broader llama-family coverage: these archs are trait-compatible with the
# generic forward (ref: per-arch builders in src/models/*.cpp that differ
# only in norm/act/rope/bias choices)
_reg(ArchTraits("qwen2moe", rope_mode="neox", qkv_bias=True))
_reg(ArchTraits("qwen3moe", rope_mode="neox"))
_reg(ArchTraits("mixtral"))  # HF converts as llama; kept for direct GGUFs
_reg(ArchTraits("phi2", norm="ln", act="gelu", rope_mode="neox", qkv_bias=True,
                attn_out_bias=True, ffn_bias=True, norm_bias=True,
                parallel_blocks=True))
_reg(ArchTraits("phi3", rope_mode="neox"))
_reg(ArchTraits("olmo2", rope_mode="neox"))
_reg(ArchTraits("smollm", ))
_reg(ArchTraits("tinyllama", ))
_reg(ArchTraits("internlm2", rope_mode="neox"))
_reg(ArchTraits("starcoder2", norm="ln", act="gelu", rope_mode="neox",
                qkv_bias=True, attn_out_bias=True, ffn_bias=True,
                norm_bias=True))
_reg(ArchTraits("exaone", ))
_reg(ArchTraits("granite", ))
_reg(ArchTraits("minicpm", ))
_reg(ArchTraits("deepseek2", rope_mode="neox"))
_reg(ArchTraits("cohere2", rope_mode="neox", norm="ln"))
_reg(ArchTraits("mamba", rope_mode="none", recurrent=True))
_reg(ArchTraits("rwkv6", norm="ln", rope_mode="none", recurrent=True,
                norm_bias=True, wkv_version=6))
_reg(ArchTraits("rwkv7", norm="ln", rope_mode="none", recurrent=True,
                norm_bias=True, wkv_version=7))


@dataclasses.dataclass
class ModelConfig:
    arch: str
    n_layer: int
    n_embd: int
    n_head: int
    n_head_kv: int
    n_ff: int
    n_vocab: int
    head_dim: int
    n_ctx_train: int = 4096
    norm_eps: float = 1e-5
    rope_dim: int = 0
    rope_freq_base: float = 10000.0
    rope_scale: float = 1.0  # 1/factor linear
    rope_scaling_type: str = "none"
    rope_orig_ctx: int = 0
    tie_embeddings: bool = False
    # sparse predictor ranks per layer (0 = no predictor)
    pred_lora: tuple[int, ...] = ()
    # MoE
    n_expert: int = 0
    n_expert_used: int = 0
    sliding_window: int = 0
    fatrelu_threshold: float = 0.0
    # SSM (mamba) geometry (ref: mamba.ssm.* GGUF keys)
    ssm_d_conv: int = 0
    ssm_d_inner: int = 0
    ssm_d_state: int = 0
    ssm_dt_rank: int = 0
    # RWKV geometry (ref GGUF keys {arch}.wkv.head_size,
    # {arch}.time_mix_extra_dim, {arch}.time_decay_extra_dim,
    # {arch}.rescale_every_n_layers, {arch}.token_shift_count)
    wkv_head_size: int = 0
    time_mix_extra_dim: int = 0
    time_decay_extra_dim: int = 0
    rescale_every_n_layers: int = 0
    token_shift_count: int = 2

    @property
    def traits(self) -> ArchTraits:
        return ARCH_REGISTRY[self.arch]

    @property
    def has_predictors(self) -> bool:
        return any(r > 0 for r in self.pred_lora)

    @property
    def max_pred_rank(self) -> int:
        return max(self.pred_lora) if self.pred_lora else 0

    @classmethod
    def from_gguf(cls, r: "GGUFReader") -> "ModelConfig":
        arch = r.arch()
        if arch not in ARCH_REGISTRY:
            raise NotImplementedError(f"arch {arch!r} not in registry")

        def g(key: str, default=None):
            return r.kv.get(f"{arch}.{key}", default)

        n_embd = int(g("embedding_length"))
        n_head = int(g("attention.head_count", 0) or 0)
        if n_head == 0:  # recurrent archs carry no attention heads
            n_head = 1
        n_head_kv = int(g("attention.head_count_kv", n_head))
        head_dim = int(g("attention.key_length", n_embd // n_head))
        tokens = r.kv.get("tokenizer.ggml.tokens")
        n_vocab = int(g("vocab_size", len(tokens) if tokens is not None else 0))
        pred = g("pred_lora")
        pred_lora = tuple(int(x) for x in pred) if pred is not None else ()
        scaling_type = g("rope.scaling.type", "none")
        factor = float(g("rope.scaling.factor", 1.0))
        has_output = "output.weight" in r.tensors
        return cls(
            arch=arch,
            n_layer=int(g("block_count")),
            n_embd=n_embd,
            n_head=n_head,
            n_head_kv=n_head_kv,
            n_ff=int(g("feed_forward_length", 0) or 0),
            n_vocab=n_vocab,
            head_dim=head_dim,
            n_ctx_train=int(g("context_length", 4096)),
            norm_eps=float(
                g("attention.layer_norm_rms_epsilon", g("attention.layer_norm_epsilon", 1e-5))
            ),
            rope_dim=int(g("rope.dimension_count", head_dim)),
            rope_freq_base=float(g("rope.freq_base", 10000.0)),
            # freq_scale = 1/factor for ANY scaling type (the reference sets
            # rope_freq_scale_train from rope.scaling.factor unconditionally,
            # llama-model.cpp:577-582 — YaRN needs it for interpolation+mscale)
            rope_scale=1.0 / factor if factor not in (0.0, 1.0) else 1.0,
            rope_scaling_type=scaling_type,
            rope_orig_ctx=int(g("rope.scaling.original_context_length", 0)),
            tie_embeddings=not has_output,
            pred_lora=pred_lora,
            n_expert=int(g("expert_count", 0)),
            n_expert_used=int(g("expert_used_count", 0)),
            sliding_window=int(g("attention.sliding_window", 0)),
            ssm_d_conv=int(g("ssm.conv_kernel", 0)),
            ssm_d_inner=int(g("ssm.inner_size", 0)),
            ssm_d_state=int(g("ssm.state_size", 0)),
            ssm_dt_rank=int(g("ssm.time_step_rank", 0)),
            wkv_head_size=int(g("wkv.head_size", 0)),
            time_mix_extra_dim=int(g("time_mix_extra_dim", 0)),
            time_decay_extra_dim=int(g("time_decay_extra_dim", 0)),
            rescale_every_n_layers=int(g("rescale_every_n_layers", 0)),
            token_shift_count=int(g("token_shift_count", 2)),
        )
