"""GGUF -> JAX params loader.

The TPU-native analogue of src/llama-model-loader.cpp + the per-arch
create_tensor tables in src/llama-model.cpp: weights are dequantized (or
kept quantized for the fused Pallas dequant-matmul path), transposed to
(in, out) for `x @ w`, stacked across layers for lax.scan, and device_put
with the requested sharding.

Sparse-model conventions handled here (ref: src/llama-model.cpp:2758-2770):
  - ffn_down may be stored transposed {n_embd, n_ff} so neuron rows are
    contiguous; we canonicalize to (n_ff, n_embd) = (in, out) either way.
  - per-layer predictor ranks (`{arch}.pred_lora`) are zero-padded to the
    max rank so layers stack.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFReader
from .config import ModelConfig

Params = dict[str, Any]


def _as_jnp(x: np.ndarray, dtype) -> jnp.ndarray:
    if x.dtype == np.float16:
        # bf16 conversion via f32 to avoid double-rounding surprises
        x = x.astype(np.float32)
    return jnp.asarray(x, dtype=dtype)


def _pack(w, dtype):
    """numpy array -> jnp (dtype); quant tuple -> QuantTensor."""
    if isinstance(w, tuple) and w[0] == "quant":
        from ..ops.quant_matmul import QuantTensor

        return QuantTensor.from_repack(w[2], w[3], w[1])
    return _as_jnp(w, dtype)


@dataclass
class LoadedModel:
    config: ModelConfig
    params: Params
    vocab: Any = None
    quant_meta: dict[str, GGMLType] = field(default_factory=dict)


def _get(r: GGUFReader, name: str) -> np.ndarray | None:
    t = r.tensors.get(name)
    return None if t is None else t.to_f32()


def _linear(r: GGUFReader, name: str, in_dim: int, out_dim: int) -> np.ndarray | None:
    """Fetch a weight canonicalized to numpy (in_dim, out_dim)."""
    w = _get(r, name)
    if w is None:
        return None
    if w.shape == (out_dim, in_dim):
        return np.ascontiguousarray(w.T)
    if w.shape == (in_dim, out_dim):
        return w
    raise ValueError(f"{name}: shape {w.shape} matches neither ({out_dim},{in_dim}) nor ({in_dim},{out_dim})")


_QUANT_KINDS = {GGMLType.Q4_0: "q4_0", GGMLType.Q8_0: "q8_0"}


def _linear_maybe_quant(
    r: GGUFReader, name: str, in_dim: int, out_dim: int, keep_quantized: bool
):
    """Like _linear, but when keep_quantized and the stored type is Q4_0 /
    Q8_0 with the standard (out, in) row-major orientation, return a host
    tuple ("quant", kind, qw, scales) holding the PACKED rows (repacked to
    the kernel layout) — the fused dequant-matmul path keeps them packed in
    HBM (ops/quant_matmul.py)."""
    t = r.tensors.get(name)
    if t is None:
        return None
    if keep_quantized and t.ggml_type in _QUANT_KINDS and t.shape == (out_dim, in_dim) \
            and in_dim % 32 == 0:
        from ..ops.quant_matmul import repack_q4_0, repack_q8_0

        kind = _QUANT_KINDS[t.ggml_type]
        raw = t.raw()
        if kind == "q4_0":
            qw, sc = repack_q4_0(raw, out_dim, in_dim)
        else:
            qw, sc = repack_q8_0(raw, out_dim, in_dim)
        return ("quant", kind, qw, sc)
    return _linear(r, name, in_dim, out_dim)


def _split_fused_qkv(
    wqkv: np.ndarray, bqkv: np.ndarray | None, cfg: ModelConfig
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray | None, np.ndarray | None, np.ndarray | None]:
    """Split a fused attn_qkv (in=E, out=(H+2*Hkv)*D) into wq/wk/wv.

    Falcon interleaves per kv-group: [q_0..q_{g-1}, k, v] per group
    (ref: falcon graph builder layout); GPT-2 concatenates [Q; K; V].
    """
    E = cfg.n_embd
    H, Hkv, D = cfg.n_head, cfg.n_head_kv, cfg.head_dim
    g = H // Hkv
    total = (H + 2 * Hkv) * D
    assert wqkv.shape == (E, total), wqkv.shape
    if Hkv == H or cfg.traits.fused_qkv_concat:
        # plain concat [Q;K;V]
        wq = wqkv[:, : H * D]
        wk = wqkv[:, H * D : (H + Hkv) * D]
        wv = wqkv[:, (H + Hkv) * D :]
        bq = bk = bv = None
        if bqkv is not None:
            bq = bqkv[: H * D]
            bk = bqkv[H * D : (H + Hkv) * D]
            bv = bqkv[(H + Hkv) * D :]
        return wq, wk, wv, bq, bk, bv
    # grouped interleave
    w = wqkv.reshape(E, Hkv, (g + 2), D)
    wq = np.ascontiguousarray(w[:, :, :g].reshape(E, H * D))
    wk = np.ascontiguousarray(w[:, :, g].reshape(E, Hkv * D))
    wv = np.ascontiguousarray(w[:, :, g + 1].reshape(E, Hkv * D))
    bq = bk = bv = None
    if bqkv is not None:
        b = bqkv.reshape(Hkv, (g + 2), D)
        bq = np.ascontiguousarray(b[:, :g].reshape(H * D))
        bk = np.ascontiguousarray(b[:, g].reshape(Hkv * D))
        bv = np.ascontiguousarray(b[:, g + 1].reshape(Hkv * D))
    return wq, wk, wv, bq, bk, bv


def load_model(
    path: str,
    dtype=jnp.bfloat16,
    device_put_fn: Callable[[str, jnp.ndarray], jnp.ndarray] | None = None,
    keep_quantized: bool = False,
    attn_w8a8: bool = False,
) -> LoadedModel:
    """Load a GGUF model into stacked JAX arrays.

    device_put_fn(name, array) may apply shardings; default puts on the
    default device. keep_quantized=True keeps Q4_0/Q8_0 matmul weights
    packed on device (fused dequant-matmul path) instead of dequantizing.
    attn_w8a8=True re-quantizes the attention projections (wq/wk/wv/wo)
    to row-wise W8A8 (XLA-native int8 MXU dots; ops/quant_matmul
    .W8A8Tensor) — halves attention weight HBM traffic with the prefetch
    pipeline intact; measured the decisive lever for the 13B beyond-HBM
    2x (BENCH_NOTES round 3)."""
    r = GGUFReader(path)
    cfg = ModelConfig.from_gguf(r)
    tr = cfg.traits
    if tr.altup or tr.enc_dec:
        if tr.altup:
            from .gemma3n import load_gemma3n as _load
        else:
            from .t5 import load_t5 as _load

        model = LoadedModel(config=cfg, params=_load(r, cfg, dtype))
        try:
            from ..tokenizer import Vocab

            if "tokenizer.ggml.tokens" in r.kv:
                model.vocab = Vocab.from_gguf(r)
        except Exception:
            pass
        r.close()
        return model
    if tr.recurrent:
        tok = _get(r, "token_embd.weight")
        params: Params = {
            "tok_embd": _as_jnp(tok, dtype),
            "output_norm_w": _as_jnp(_get(r, "output_norm.weight"), jnp.float32),
        }
        onb = _get(r, "output_norm.bias")
        if onb is not None:
            params["output_norm_b"] = _as_jnp(onb, jnp.float32)
        out_w = _linear(r, "output.weight", cfg.n_embd, cfg.n_vocab)
        params["output"] = _as_jnp(
            out_w if out_w is not None else np.ascontiguousarray(tok.T), dtype
        )
        if cfg.arch == "rwkv6qwen2":
            # qrwkv: no post-embedding LN, rms-normed qwen2-shaped blocks
            from .rwkv6 import load_rwkv6qwen2_layers

            params["layers"] = load_rwkv6qwen2_layers(r, cfg, dtype)
        elif cfg.arch == "arwkv7":
            from .rwkv7 import load_arwkv7_layers

            params["layers"] = load_arwkv7_layers(r, cfg, dtype)
        elif tr.wkv_version in (6, 7):
            if tr.wkv_version == 6:
                from .rwkv6 import load_rwkv6_layers as load_wkv_layers
            else:
                from .rwkv7 import load_rwkv7_layers as load_wkv_layers

            params["tok_norm_w"] = _as_jnp(_get(r, "token_embd_norm.weight"), jnp.float32)
            params["tok_norm_b"] = _as_jnp(_get(r, "token_embd_norm.bias"), jnp.float32)
            params["layers"] = load_wkv_layers(r, cfg, dtype)
        elif tr.ssm_hybrid:
            from .hybrid import load_hybrid_layers

            params["layers"] = load_hybrid_layers(r, cfg, dtype)
        else:
            from .mamba import load_mamba_layers

            params["layers"] = load_mamba_layers(r, cfg)
        model = LoadedModel(config=cfg, params=params)
        try:
            from ..tokenizer import Vocab

            if "tokenizer.ggml.tokens" in r.kv:
                model.vocab = Vocab.from_gguf(r)
        except Exception:
            pass
        r.close()
        return model
    E, H, Hkv, D, F, L = cfg.n_embd, cfg.n_head, cfg.n_head_kv, cfg.head_dim, cfg.n_ff, cfg.n_layer
    kq = keep_quantized and not tr.fused_qkv  # fused qkv must split -> dense

    def _lin(name, in_dim, out_dim):
        return _linear_maybe_quant(r, name, in_dim, out_dim, kq)

    put = device_put_fn or (lambda name, x: x)

    params: Params = {}
    tok = _get(r, "token_embd.weight")
    params["tok_embd"] = put("tok_embd", _as_jnp(tok, dtype))
    # bloom-style post-embedding LayerNorm
    tn = _get(r, "token_embd_norm.weight")
    if tn is not None:
        params["tok_norm_w"] = put("tok_norm_w", _as_jnp(tn, jnp.float32))
        tnb = _get(r, "token_embd_norm.bias")
        if tnb is not None:
            params["tok_norm_b"] = put("tok_norm_b", _as_jnp(tnb, jnp.float32))
    if tr.pos_embd:
        params["pos_embd"] = put("pos_embd", _as_jnp(_get(r, "position_embd.weight"), dtype))
    tte = _get(r, "token_types.weight")  # bert segment embeddings
    if tte is not None:
        params["type_embd"] = put("type_embd", _as_jnp(tte, dtype))
    onw = _get(r, "output_norm.weight")
    if onw is None and not tr.post_norm:
        onw = np.ones(E, np.float32)  # olmo v1 non-parametric final norm
    if onw is not None:
        # post-norm encoders (bert) carry no final norm at all: the last
        # block's layer_output_norm already normalized the stream
        params["output_norm_w"] = put("output_norm_w", _as_jnp(onw, jnp.float32))
        onb = _get(r, "output_norm.bias")
        if onb is not None:
            params["output_norm_b"] = put("output_norm_b", _as_jnp(onb, jnp.float32))
    out_w = _lin("output.weight", E, cfg.n_vocab)
    if out_w is None:
        out_w = np.ascontiguousarray(tok.T)  # tied embeddings
    params["output"] = put("output", _pack(out_w, dtype))
    ob = _get(r, "output.bias")  # gptj lm_head bias
    if ob is not None:
        params["output_b"] = put("output_b", _as_jnp(ob, jnp.float32))
    # classification head for rank pooling / rerankers
    # (ref: llama-model.cpp cls/cls_b/cls_out/cls_out_b -> build_pooling)
    for nm, key in (("cls.weight", "cls_w"), ("cls.bias", "cls_b"),
                    ("cls.output.weight", "cls_out_w"),
                    ("cls.output.bias", "cls_out_b")):
        w = _get(r, nm)
        if w is not None:
            params[key] = put(key, _as_jnp(w, jnp.float32))

    max_rank = cfg.max_pred_rank

    per_layer: dict[str, list[np.ndarray]] = {}
    per_layer_idx: dict[str, list[int]] = {}
    _cur = [0]

    def add(key: str, arr: np.ndarray | None):
        if arr is not None:
            per_layer.setdefault(key, []).append(arr)
            per_layer_idx.setdefault(key, []).append(_cur[0])

    for i in range(L):
        _cur[0] = i
        p = f"blk.{i}."
        # per-layer NAS dims (deci): head counts and ffn widths vary;
        # attention-free layers (H_i == 0) carry no attention tensors
        H_i = cfg.n_head_arr[i] if cfg.n_head_arr else H
        Hkv_i = cfg.n_head_kv_arr[i] if cfg.n_head_kv_arr else Hkv
        F_i = cfg.n_ff_arr[i] if cfg.n_ff_arr else F
        if tr.post_norm:
            # bert: attn_output_norm / layer_output_norm ride the
            # attn_norm / ffn_norm slots (post-SUM semantics in the body)
            add("attn_norm_w", _get(r, p + "attn_output_norm.weight"))
            add("attn_norm_b", _get(r, p + "attn_output_norm.bias"))
            anw = None
        else:
            anw = _get(r, p + "attn_norm.weight")
            if anw is None and _get(r, p + "attn_post_norm.weight") is None:
                # olmo v1: non-parametric layernorm — the GGUF carries no
                # norm tensors at all (llama-model.cpp "norm params
                # removed"). post-norm-only archs (olmo2) keep attn_norm
                # absent on purpose.
                anw = np.ones(E, np.float32)
            add("attn_norm_w", anw)
            add("attn_norm_b", _get(r, p + "attn_norm.bias"))
        add("attn_norm2_w", _get(r, p + "attn_norm_2.weight"))
        add("attn_norm2_b", _get(r, p + "attn_norm_2.bias"))
        if cfg.kv_lora_rank > 0:
            # MLA (deepseek2): low-rank latent projections replace wk/wv
            # (ref llama-model.cpp DEEPSEEK2 attn_q_a/attn_kv_a_mqa/...)
            Rkv = cfg.kv_lora_rank
            Dr = cfg.rope_dim
            Dv = cfg.v_head_dim or D
            if cfg.q_lora_rank > 0:
                add("wq_a", _lin(p + "attn_q_a.weight", E, cfg.q_lora_rank))
                add("q_a_norm_w", _get(r, p + "attn_q_a_norm.weight"))
                add("wq_b", _lin(p + "attn_q_b.weight", cfg.q_lora_rank, H * D))
            else:
                add("wq", _lin(p + "attn_q.weight", E, H * D))
            add("wkv_a", _lin(p + "attn_kv_a_mqa.weight", E, Rkv + Dr))
            add("kv_a_norm_w", _get(r, p + "attn_kv_a_norm.weight"))
            # split the latent decompressor for ABSORBED attention (score
            # and output computed in latent space; the cache holds only
            # c_kv + k_pe — the llama.cpp MLA wk_b/wv_b split)
            wkv_b = _lin(p + "attn_kv_b.weight", Rkv, H * (D - Dr + Dv))
            if wkv_b is not None:
                wb = wkv_b.reshape(Rkv, H, D - Dr + Dv)
                add("wk_b", np.ascontiguousarray(wb[:, :, : D - Dr]))
                add("wv_b", np.ascontiguousarray(wb[:, :, D - Dr:]))
            wq = wk = wv = bq = bk = bv = None
        elif tr.fused_qkv:
            wqkv = _linear(r, p + "attn_qkv.weight", E, (H + 2 * Hkv) * D)
            bqkv = _get(r, p + "attn_qkv.bias")
            wq, wk, wv, bq, bk, bv = _split_fused_qkv(wqkv, bqkv, cfg)
        else:
            wq = _lin(p + "attn_q.weight", E, H_i * D)
            wk = _lin(p + "attn_k.weight", E, Hkv_i * D)
            wv = _lin(p + "attn_v.weight", E, Hkv_i * D)
            bq = _get(r, p + "attn_q.bias")
            bk = _get(r, p + "attn_k.bias")
            bv = _get(r, p + "attn_v.bias")
        add("wq", wq)
        add("wk", wk)
        add("wv", wv)
        add("bq", bq)
        add("bk", bk)
        add("bv", bv)
        if cfg.arch == "cogvlm":
            # vision-expert stream (src/models/cogvlm.cpp:27-44): the SAME
            # block graph runs with these weights when the ubatch is an
            # image embedding batch — selected by cogvlm_vision_params
            vqkv = _linear(r, p + "vis_attn_qkv.weight", E, (H + 2 * Hkv) * D)
            if vqkv is not None:
                vq, vk, vv, _, _, _ = _split_fused_qkv(vqkv, None, cfg)
                add("vis_wq", vq)
                add("vis_wk", vk)
                add("vis_wv", vv)
                add("vis_wo", _lin(p + "vis_attn_output.weight", H * D, E))
                add("vis_w_up", _lin(p + "vis_up.weight", E, cfg.n_ff))
                add("vis_w_gate", _lin(p + "vis_gate.weight", E, cfg.n_ff))
                add("vis_w_down", _lin(p + "vis_down.weight", cfg.n_ff, E))
        # q/k norms (qwen3/gemma3 per-head, olmo2/cohere full-width)
        add("attn_q_norm_w", _get(r, p + "attn_q_norm.weight"))
        add("attn_q_norm_b", _get(r, p + "attn_q_norm.bias"))
        add("attn_k_norm_w", _get(r, p + "attn_k_norm.weight"))
        add("attn_k_norm_b", _get(r, p + "attn_k_norm.bias"))
        # gpt-oss learned attention sinks (per-head logits)
        add("attn_sinks", _get(r, p + "attn_sinks.weight"))
        # afmoe sigmoid attention gate (pre-o_proj, from the normed stream)
        add("w_attn_gate", _lin(p + "attn_gate.weight", E, H_i * D))
        wo_in = H * (cfg.v_head_dim or D) if cfg.kv_lora_rank > 0 else H_i * D
        add("wo", _lin(p + "attn_output.weight", wo_in, E))
        add("bo", _get(r, p + "attn_output.bias"))
        # bitnet sub-norms (pre-o_proj / pre-down_proj rms)
        add("attn_sub_norm_w", _get(r, p + "attn_sub_norm.weight"))
        add("ffn_sub_norm_w", _get(r, p + "ffn_sub_norm.weight"))
        # apertus xIELU per-layer coefficients (softplus applied here so
        # the kernel uses effective alphas: a_p = sp(raw), a_n = b + sp(raw))
        if cfg.xielu_alpha_p:
            b = cfg.xielu_beta[i] if cfg.xielu_beta else 0.5
            add("xielu_ap", np.logaddexp(0.0, np.float32(cfg.xielu_alpha_p[i]))[None].astype(np.float32))
            add("xielu_an", (b + np.logaddexp(0.0, np.float32(cfg.xielu_alpha_n[i])))[None].astype(np.float32))
            add("xielu_beta", np.asarray([b], np.float32))
            add("xielu_eps", np.asarray(
                [cfg.xielu_eps[i] if cfg.xielu_eps else -1e-6], np.float32))
        # post-norms (gemma2 sandwich, olmo2 post-norm-only)
        add("attn_post_norm_w", _get(r, p + "attn_post_norm.weight"))
        add("attn_post_norm_b", _get(r, p + "attn_post_norm.bias"))
        add("ffn_post_norm_w", _get(r, p + "ffn_post_norm.weight"))
        add("ffn_post_norm_b", _get(r, p + "ffn_post_norm.bias"))
        if tr.post_norm:
            add("ffn_norm_w", _get(r, p + "layer_output_norm.weight"))
            add("ffn_norm_b", _get(r, p + "layer_output_norm.bias"))
        else:
            fnw = _get(r, p + "ffn_norm.weight")
            if fnw is None and not tr.parallel_blocks and                 _get(r, p + "ffn_post_norm.weight") is None:
                fnw = np.ones(E, np.float32)  # olmo non-parametric norm
            add("ffn_norm_w", fnw)
            add("ffn_norm_b", _get(r, p + "ffn_norm.bias"))
        # arctic: second pre-MoE norm over the layer input
        add("ffn_norm_exps_w", _get(r, p + "ffn_norm_exps.weight"))
        # MoE expert tensors (3D); canonicalized to (X, E, F)/(X, F, E)
        gi = _get(r, p + "ffn_gate_inp.weight")  # (X, E)
        if gi is not None:
            add("w_router", np.ascontiguousarray(gi.T))  # (E, X)
            add("w_router_b", _get(r, p + "ffn_gate_inp.bias"))
            # gpt-oss per-expert biases
            add("w_up_exps_b", _get(r, p + "ffn_up_exps.bias"))
            add("w_gate_exps_b", _get(r, p + "ffn_gate_exps.bias"))
            add("w_down_exps_b", _get(r, p + "ffn_down_exps.bias"))
            ue = _get(r, p + "ffn_up_exps.weight")  # (X, F, E)
            add("w_up_exps", np.ascontiguousarray(np.swapaxes(ue, -1, -2)))
            ge = _get(r, p + "ffn_gate_exps.weight")
            if ge is not None:
                add("w_gate_exps", np.ascontiguousarray(np.swapaxes(ge, -1, -2)))
            de = _get(r, p + "ffn_down_exps.weight")  # (X, E, F)
            add("w_down_exps", np.ascontiguousarray(np.swapaxes(de, -1, -2)))
            # deepseek3 router score-correction bias (selection only)
            add("router_bias", _get(r, p + "exp_probs_b.bias"))
            # grovemoe adjugate chunk experts (same orientation as exps)
            for nm, key in (("ffn_up_chexps.weight", "w_up_chexps"),
                            ("ffn_gate_chexps.weight", "w_gate_chexps"),
                            ("ffn_down_chexps.weight", "w_down_chexps")):
                ce = _get(r, p + nm)
                if ce is not None:
                    add(key, np.ascontiguousarray(np.swapaxes(ce, -1, -2)))
            # shared (always-on) experts — qwen2moe/deepseek2 ffn_*_shexp;
            # orient by n_embd since the shexp width differs from n_ff
            for nm, key in (("ffn_up_shexp.weight", "w_up_shexp"),
                            ("ffn_gate_shexp.weight", "w_gate_shexp"),
                            ("ffn_down_shexp.weight", "w_down_shexp")):
                ws = _get(r, p + nm)
                if ws is not None:
                    if key == "w_down_shexp":
                        if ws.shape[0] == E:  # (E, Fs) -> (Fs, E)
                            ws = np.ascontiguousarray(ws.T)
                    elif ws.shape[1] == E:  # (Fs, E) -> (E, Fs)
                        ws = np.ascontiguousarray(ws.T)
                    add(key, ws)
            gis = _get(r, p + "ffn_gate_inp_shexp.weight")  # (1, E)
            if gis is not None:  # qwen2moe sigmoid gate on the shared expert
                add("w_gate_inp_shexp", np.ascontiguousarray(gis.reshape(-1)))
        add("w_up", _lin(p + "ffn_up.weight", E, F_i))
        add("b_up", _get(r, p + "ffn_up.bias"))
        add("w_gate", _lin(p + "ffn_gate.weight", E, F_i))
        # ffn_down: sparse GGUFs store it transposed; _linear canonicalizes
        add("w_down", _lin(p + "ffn_down.weight", F_i, E))
        add("b_down", _get(r, p + "ffn_down.bias"))
        # predictors (low-rank ReLU MLP), zero-padded to max rank
        pu = _linear(r, p + "ffn_pred_up.weight", E, cfg.pred_lora[i] if cfg.pred_lora else 0)
        if pu is not None:
            rank = pu.shape[1]
            pub = _get(r, p + "ffn_pred_up.bias")
            pd = _linear(r, p + "ffn_pred_down.weight", rank, F)
            pdb = _get(r, p + "ffn_pred_down.bias")
            if rank < max_rank:
                pu = np.pad(pu, ((0, 0), (0, max_rank - rank)))
                pd = np.pad(pd, ((0, max_rank - rank), (0, 0)))
                if pub is not None:
                    pub = np.pad(pub, (0, max_rank - rank))
            add("pred_up", pu)
            add("pred_up_b", pub if pub is not None else np.zeros(max_rank, np.float32))
            add("pred_down", pd)
            add("pred_down_b", pdb if pdb is not None else np.zeros(F, np.float32))

    def _stack(k: str, arrs: list):
        if isinstance(arrs[0], tuple) and arrs[0][0] == "quant":
            from ..ops.quant_matmul import QuantTensor

            kind = arrs[0][1]
            assert all(a[1] == kind for a in arrs), f"{k}: mixed quant kinds"
            return put(f"layers.{k}", QuantTensor.from_repack(
                np.stack([a[2] for a in arrs]),
                np.stack([a[3] for a in arrs]),
                kind,
            ))
        stacked = np.stack(arrs)
        want = (jnp.float32 if ("norm" in k or k.startswith("b")
                                or k.startswith("xielu")
                                or k in ("router_bias", "attn_sinks"))
                else dtype)
        return put(f"layers.{k}", _as_jnp(stacked, want))

    if all(len(a) == L for a in per_layer.values()):
        params["layers"] = {k: _stack(k, arrs) for k, arrs in per_layer.items()}
    else:
        # Heterogeneous layers (deepseek2 first_k_dense_replace: leading
        # dense FFN layers, MoE for the rest): group contiguous runs of
        # identical tensor signatures into separate stacks the forward
        # scans sequentially (params["layer_segments"]).
        sigs = [frozenset(k for k, idxs in per_layer_idx.items() if i in set(idxs))
                for i in range(L)]
        segments = []
        start = 0
        for i in range(1, L + 1):
            if i == L or sigs[i] != sigs[start]:
                seg = {}
                for k in sorted(sigs[start]):
                    idxs = per_layer_idx[k]
                    arrs = [per_layer[k][idxs.index(j)] for j in range(start, i)]
                    seg[k] = _stack(k, arrs)
                segments.append(seg)
                start = i
        params["layers"] = segments[0]  # compat: first stack
        params["layer_segments"] = segments

    if attn_w8a8:
        from ..ops.quant_matmul import W8A8Tensor

        def _w8(lay):
            for k in ("wq", "wk", "wv", "wo"):
                w = lay.get(k)
                if w is not None and not hasattr(w, "kind"):
                    lay[k] = W8A8Tensor.from_float(np.asarray(w))
            return lay

        params["layers"] = _w8(dict(params["layers"]))
        if params.get("layer_segments") is not None:
            params["layer_segments"] = [
                _w8(dict(s)) for s in params["layer_segments"]]
            params["layers"] = params["layer_segments"][0]

    model = LoadedModel(config=cfg, params=params)
    try:
        from ..tokenizer import Vocab

        if "tokenizer.ggml.tokens" in r.kv:
            model.vocab = Vocab.from_gguf(r)
    except Exception:
        pass
    r.close()
    return model
