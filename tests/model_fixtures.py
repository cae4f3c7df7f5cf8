"""Test fixtures: tiny random GGUF models + an independent numpy reference
forward pass (the role the CPU backend plays in the reference's
test-backend-ops: a slow, obviously-correct oracle)."""

from __future__ import annotations

import numpy as np

from sparkinfer_tpu.gguf.constants import GGMLType
from sparkinfer_tpu.gguf.writer import GGUFWriter


def make_tiny_llama(
    path,
    *,
    arch: str = "llama",
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 96,
    n_vocab: int = 199,
    n_ctx: int = 256,
    rope_freq_base: float = 10000.0,
    pred_rank: int = 0,
    n_expert: int = 0,
    n_expert_used: int = 0,
    seed: int = 0,
    scale: float = 0.08,
    with_vocab: bool = False,
    chat_template: str | None = None,
    quant_type: str | None = None,  # "q4_0" | "q8_0": store matmul weights quantized
    extra_kv: dict | None = None,
    extra_tensors: dict | None = None,  # e.g. cls head for rank pooling
    extra_control_pieces: list[str] | None = None,  # extra CONTROL vocab pieces
    fused_qkv: bool = False,  # write attn_qkv [Q;K;V] instead of q/k/v (qwen v1)
) -> dict[str, np.ndarray]:
    """Write a tiny llama-family GGUF; returns the raw f32 weights (llama.cpp
    orientation: weights are (out_dim, in_dim) in numpy order)."""
    rng = np.random.default_rng(seed)
    D = n_embd // n_head

    def w(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    tensors: dict[str, np.ndarray] = {}
    tensors["token_embd.weight"] = w(n_vocab, n_embd)
    moe = n_expert > 0
    tensors["output_norm.weight"] = 1.0 + w(n_embd) * 0.1
    tensors["output.weight"] = w(n_vocab, n_embd)
    for i in range(n_layer):
        p = f"blk.{i}."
        tensors[p + "attn_norm.weight"] = 1.0 + w(n_embd) * 0.1
        if fused_qkv:
            assert n_head_kv == n_head, "fused fixture supports MHA concat only"
            tensors[p + "attn_qkv.weight"] = w((n_head + 2 * n_head_kv) * D, n_embd)
            tensors[p + "attn_qkv.bias"] = w((n_head + 2 * n_head_kv) * D)
        else:
            tensors[p + "attn_q.weight"] = w(n_head * D, n_embd)
            tensors[p + "attn_k.weight"] = w(n_head_kv * D, n_embd)
            tensors[p + "attn_v.weight"] = w(n_head_kv * D, n_embd)
        tensors[p + "attn_output.weight"] = w(n_embd, n_head * D)
        tensors[p + "ffn_norm.weight"] = 1.0 + w(n_embd) * 0.1
        if moe:
            tensors[p + "ffn_gate_inp.weight"] = w(n_expert, n_embd)
            tensors[p + "ffn_up_exps.weight"] = w(n_expert, n_ff, n_embd)
            tensors[p + "ffn_gate_exps.weight"] = w(n_expert, n_ff, n_embd)
            tensors[p + "ffn_down_exps.weight"] = w(n_expert, n_embd, n_ff)
        else:
            tensors[p + "ffn_up.weight"] = w(n_ff, n_embd)
            tensors[p + "ffn_gate.weight"] = w(n_ff, n_embd)
            tensors[p + "ffn_down.weight"] = w(n_embd, n_ff)
        if pred_rank > 0:
            tensors[p + "ffn_pred_up.weight"] = w(pred_rank, n_embd)
            tensors[p + "ffn_pred_up.bias"] = w(pred_rank)
            pd_w = w(n_ff, pred_rank) * 20.0
            pd_b = w(n_ff) - 1.0
            # structurally sparse predictor: the last third of neurons can
            # never fire, so some groups are always inactive and the
            # fixed-capacity top-k path has real headroom to be exact.
            cold = slice(2 * n_ff // 3, n_ff)
            pd_w[cold] = 0.0
            pd_b[cold] = -6.0
            tensors[p + "ffn_pred_down.weight"] = pd_w
            tensors[p + "ffn_pred_down.bias"] = pd_b

    for k, v in (extra_tensors or {}).items():
        tensors[k] = np.asarray(v, np.float32)

    wr = GGUFWriter(path, arch)
    if with_vocab:
        # minimal SPM vocab: specials + byte fallback + a few word pieces;
        # any text tokenizes via byte tokens
        tokens = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(256)]
        # word pieces with full bigram-merge chains so SPM can build them
        words = ["▁h", "▁he", "▁hel", "▁hell", "▁hello",
                 "▁w", "▁wo", "▁wor", "▁worl", "▁world",
                 "▁t", "▁th", "▁the", "he", "ll", "o", "el"]
        n_words = len(words)
        tokens += words
        # caller-supplied control pieces (e.g. OuteTTS <|text_start|>/<|N|>
        # audio-code tokens), placed right after the word pieces
        n_extra_ctl = len(extra_control_pieces or [])
        extra_ctl_base = len(tokens)
        tokens += list(extra_control_pieces or [])
        assert len(tokens) <= n_vocab, (len(tokens), n_vocab)
        tokens += [f"<extra_{i}>" for i in range(n_vocab - len(tokens))]
        scores = np.zeros(n_vocab, np.float32)
        scores[259 : 259 + n_words] = -1.0
        ttypes = np.full(n_vocab, 1, np.int32)  # NORMAL
        ttypes[0] = 2  # UNKNOWN
        ttypes[1] = ttypes[2] = 3  # CONTROL
        ttypes[extra_ctl_base : extra_ctl_base + n_extra_ctl] = 3  # CONTROL
        ttypes[3:259] = 6  # BYTE
        wr.add_kv("tokenizer.ggml.model", "llama")
        wr.add_array("tokenizer.ggml.tokens", tokens)
        wr.add_array("tokenizer.ggml.scores", scores)
        wr.add_array("tokenizer.ggml.token_type", ttypes)
        wr.add_kv("tokenizer.ggml.bos_token_id", np.uint32(1))
        wr.add_kv("tokenizer.ggml.eos_token_id", np.uint32(2))
        wr.add_kv("tokenizer.ggml.unknown_token_id", np.uint32(0))
        if chat_template:
            wr.add_kv("tokenizer.chat_template", chat_template)
    for k, v in (extra_kv or {}).items():
        wr.add_kv(k, np.uint32(v) if isinstance(v, int) else v)
    wr.add_kv(f"{arch}.block_count", np.uint32(n_layer))
    wr.add_kv(f"{arch}.embedding_length", np.uint32(n_embd))
    wr.add_kv(f"{arch}.attention.head_count", np.uint32(n_head))
    wr.add_kv(f"{arch}.attention.head_count_kv", np.uint32(n_head_kv))
    wr.add_kv(f"{arch}.feed_forward_length", np.uint32(n_ff))
    wr.add_kv(f"{arch}.vocab_size", np.uint32(n_vocab))
    wr.add_kv(f"{arch}.context_length", np.uint32(n_ctx))
    wr.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", np.float32(1e-5))
    wr.add_kv(f"{arch}.rope.freq_base", np.float32(rope_freq_base))
    wr.add_kv(f"{arch}.rope.dimension_count", np.uint32(D))
    if pred_rank > 0:
        wr.add_array(f"{arch}.pred_lora", np.full(n_layer, pred_rank, np.uint32))
    if moe:
        wr.add_kv(f"{arch}.expert_count", np.uint32(n_expert))
        wr.add_kv(f"{arch}.expert_used_count", np.uint32(n_expert_used))
    qt = getattr(GGMLType, (quant_type or "").upper(), None)
    from sparkinfer_tpu.gguf.constants import GGML_TYPE_TRAITS

    qbs = GGML_TYPE_TRAITS[qt][0] if qt is not None else 0
    for name, data in tensors.items():
        gt = GGMLType.F32
        if (
            qt is not None
            and data.ndim == 2
            and name.endswith(".weight")
            and "norm" not in name
            and "pred" not in name
            and name != "token_embd.weight"
            and data.shape[1] % qbs == 0
        ):
            gt = qt
        wr.add_tensor(name, data, gt)
    wr.write()
    return tensors


# ---------------------------------------------------------------------------
# numpy oracle


def _np_rms_norm(x, w, eps=1e-5):
    var = np.mean(x * x, axis=-1, keepdims=True)
    return x / np.sqrt(var + eps) * w


def _np_rope_norm(x, pos, freq_base):
    """x (T, H, D): rotate adjacent pairs."""
    T, H, D = x.shape
    half = D // 2
    inv_freq = freq_base ** (-np.arange(half) / half)
    theta = pos[:, None] * inv_freq  # (T, half)
    cos, sin = np.cos(theta)[:, None, :], np.sin(theta)[:, None, :]
    x1, x2 = x[..., 0::2], x[..., 1::2]
    o1 = x1 * cos - x2 * sin
    o2 = x1 * sin + x2 * cos
    out = np.empty_like(x)
    out[..., 0::2] = o1
    out[..., 1::2] = o2
    return out


def _np_softmax(x, axis=-1):
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / np.sum(e, axis=axis, keepdims=True)


def ref_llama_forward(
    tensors: dict[str, np.ndarray],
    tokens: np.ndarray,  # (T,) int
    *,
    n_head: int,
    n_head_kv: int,
    rope_freq_base: float = 10000.0,
    eps: float = 1e-5,
    sparse_mask: list[np.ndarray] | None = None,
    act: str = "silu",
) -> np.ndarray:
    """Dense full-attention llama forward in f64-ish numpy. Returns (T, V)
    logits. If sparse_mask is given (per layer, (T, n_ff) {0,1}), the FFN
    hidden activations are masked — the oracle for predictor-gated FFN."""
    x = tensors["token_embd.weight"][tokens].astype(np.float64)
    T = x.shape[0]
    E = x.shape[1]
    D = E // n_head
    pos = np.arange(T, dtype=np.float64)
    n_layer = max(int(k.split(".")[1]) for k in tensors if k.startswith("blk.")) + 1
    causal = np.tril(np.ones((T, T), bool))
    for i in range(n_layer):
        p = f"blk.{i}."
        h = _np_rms_norm(x, tensors[p + "attn_norm.weight"].astype(np.float64), eps)
        q = (h @ tensors[p + "attn_q.weight"].T.astype(np.float64)).reshape(T, n_head, D)
        k = (h @ tensors[p + "attn_k.weight"].T.astype(np.float64)).reshape(T, n_head_kv, D)
        v = (h @ tensors[p + "attn_v.weight"].T.astype(np.float64)).reshape(T, n_head_kv, D)
        q = _np_rope_norm(q, pos, rope_freq_base)
        k = _np_rope_norm(k, pos, rope_freq_base)
        g = n_head // n_head_kv
        kk = np.repeat(k, g, axis=1)  # (T, H, D)
        vv = np.repeat(v, g, axis=1)
        att = np.einsum("thd,shd->hts", q, kk) / np.sqrt(D)
        att = np.where(causal[None], att, -np.inf)
        att = _np_softmax(att, axis=-1)
        out = np.einsum("hts,shd->thd", att, vv).reshape(T, E)
        x = x + out @ tensors[p + "attn_output.weight"].T.astype(np.float64)
        h = _np_rms_norm(x, tensors[p + "ffn_norm.weight"].astype(np.float64), eps)
        up = h @ tensors[p + "ffn_up.weight"].T.astype(np.float64)
        gate = h @ tensors[p + "ffn_gate.weight"].T.astype(np.float64)
        if act == "silu":
            hidden = gate / (1.0 + np.exp(-gate)) * up
        elif act == "fatrelu":
            hidden = np.where(gate > 0.0, gate, 0.0) * up
        elif act == "drelu":
            hidden = np.maximum(gate, 0.0) * np.maximum(up, 0.0)
        else:
            raise ValueError(act)
        if sparse_mask is not None:
            hidden = hidden * sparse_mask[i]
        x = x + hidden @ tensors[p + "ffn_down.weight"].T.astype(np.float64)
    x = _np_rms_norm(x, tensors["output_norm.weight"].astype(np.float64), eps)
    return x @ tensors["output.weight"].T.astype(np.float64)


def ref_predictor(tensors: dict[str, np.ndarray], layer: int, h_normed: np.ndarray) -> np.ndarray:
    """sigmoid(pred_down @ relu(pred_up @ x + b) + b) — ref build_predictor
    (src/llama-graph.cpp:865-894). h_normed (T, E) -> (T, n_ff) probs."""
    p = f"blk.{layer}."
    z = h_normed @ tensors[p + "ffn_pred_up.weight"].T + tensors[p + "ffn_pred_up.bias"]
    z = np.maximum(z, 0.0)
    z = z @ tensors[p + "ffn_pred_down.weight"].T + tensors[p + "ffn_pred_down.bias"]
    return 1.0 / (1.0 + np.exp(-z))


# ---------------------------------------------------------------------------
# RWKV6 fixture + oracle


def make_tiny_rwkv6(
    path,
    *,
    n_layer: int = 2,
    n_embd: int = 32,
    head_size: int = 8,
    n_ff: int = 56,
    n_vocab: int = 97,
    ed: int = 6,  # time_mix_extra_dim
    dd: int = 7,  # time_decay_extra_dim
    rescale_every: int = 2,
    seed: int = 0,
    scale: float = 0.3,
) -> dict[str, np.ndarray]:
    """Write a tiny rwkv6 GGUF with the reference converter's on-disk shapes
    (convert_hf_to_gguf.py Rwkv6Model); returns the raw f32 tensors."""
    rng = np.random.default_rng(seed)
    E = n_embd

    def w(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    t: dict[str, np.ndarray] = {}
    t["token_embd.weight"] = w(n_vocab, E)
    t["token_embd_norm.weight"] = 1.0 + w(E) * 0.1
    t["token_embd_norm.bias"] = w(E) * 0.1
    t["output_norm.weight"] = 1.0 + w(E) * 0.1
    t["output_norm.bias"] = w(E) * 0.1
    t["output.weight"] = w(n_vocab, E)
    for i in range(n_layer):
        p = f"blk.{i}."
        t[p + "attn_norm.weight"] = 1.0 + w(E) * 0.1
        t[p + "attn_norm.bias"] = w(E) * 0.1
        t[p + "attn_norm_2.weight"] = 1.0 + w(E) * 0.1
        t[p + "attn_norm_2.bias"] = w(E) * 0.1
        t[p + "time_mix_lerp_x.weight"] = w(E)
        t[p + "time_mix_lerp_fused.weight"] = w(5, 1, 1, E)
        t[p + "time_mix_w1.weight"] = w(5 * ed, E)
        t[p + "time_mix_w2.weight"] = w(5, E, ed)
        t[p + "time_mix_decay_w1.weight"] = w(dd, E)
        t[p + "time_mix_decay_w2.weight"] = w(E, dd)
        t[p + "time_mix_decay.weight"] = w(E) - 4.0
        t[p + "time_mix_first.weight"] = w(E // head_size, head_size)
        for nm in ("receptance", "key", "value", "gate", "output"):
            t[p + f"time_mix_{nm}.weight"] = w(E, E)
        t[p + "time_mix_ln.weight"] = 1.0 + w(E) * 0.1
        t[p + "time_mix_ln.bias"] = w(E) * 0.1
        t[p + "channel_mix_lerp_k.weight"] = w(E)
        t[p + "channel_mix_lerp_r.weight"] = w(E)
        t[p + "channel_mix_key.weight"] = w(n_ff, E)
        t[p + "channel_mix_receptance.weight"] = w(E, E)
        t[p + "channel_mix_value.weight"] = w(E, n_ff)

    wr = GGUFWriter(path, "rwkv6")
    a = "rwkv6"
    wr.add_kv(f"{a}.block_count", np.uint32(n_layer))
    wr.add_kv(f"{a}.embedding_length", np.uint32(E))
    wr.add_kv(f"{a}.vocab_size", np.uint32(n_vocab))
    wr.add_kv(f"{a}.context_length", np.uint32(1 << 20))
    wr.add_kv(f"{a}.feed_forward_length", np.uint32(n_ff))
    wr.add_kv(f"{a}.attention.head_count", np.uint32(0))
    wr.add_kv(f"{a}.attention.layer_norm_epsilon", np.float32(1e-5))
    wr.add_kv(f"{a}.wkv.head_size", np.uint32(head_size))
    wr.add_kv(f"{a}.time_mix_extra_dim", np.uint32(ed))
    wr.add_kv(f"{a}.time_decay_extra_dim", np.uint32(dd))
    wr.add_kv(f"{a}.rescale_every_n_layers", np.uint32(rescale_every))
    wr.add_kv(f"{a}.token_shift_count", np.uint32(2))
    for name, data in t.items():
        wr.add_tensor(name, data, GGMLType.F32)
    wr.write()
    return t


def _np_ln(x, w, b, eps=1e-5):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) / np.sqrt(v + eps) * w + b


def ref_rwkv6_forward(
    t: dict[str, np.ndarray],
    tokens: np.ndarray,
    *,
    n_layer: int,
    head_size: int,
    ed: int,
    rescale_every: int = 0,
    eps: float = 1e-5,
    state=None,
):
    """Slow numpy oracle for rwkv6: per-token loops straight from the ggml
    kernel semantics (ggml_compute_forward_rwkv_wkv6_f32: out[j] += r_i *
    (tf_i*k_i*v_j + S_ij); S_ij = S_ij*w_i + k_i*v_j) and the rwkv6 graph
    builder (src/models/rwkv6.cpp). Returns (logits (T, V), state)."""
    T = len(tokens)
    E = t["token_embd.weight"].shape[1]
    H = E // head_size
    N = head_size
    x = t["token_embd.weight"][tokens].astype(np.float64)
    x = _np_ln(x, t["token_embd_norm.weight"], t["token_embd_norm.bias"], eps)
    if state is None:
        state = {
            i: {
                "att": np.zeros(E), "ffn": np.zeros(E),
                "S": np.zeros((H, N, N)),
            }
            for i in range(n_layer)
        }
    for i in range(n_layer):
        p = f"blk.{i}."
        st = state[i]
        att_norm = _np_ln(x, t[p + "attn_norm.weight"], t[p + "attn_norm.bias"], eps)
        att_out = np.zeros_like(x)
        fused = t[p + "time_mix_lerp_fused.weight"].reshape(5, E).astype(np.float64)
        w2 = t[p + "time_mix_w2.weight"].astype(np.float64)  # (5, E, ed)
        for tt in range(T):
            xn = att_norm[tt]
            x_prev = st["att"] if tt == 0 else att_norm[tt - 1]
            sx = x_prev - xn
            xxx = xn + sx * t[p + "time_mix_lerp_x.weight"]
            tm = np.tanh(t[p + "time_mix_w1.weight"].astype(np.float64) @ xxx)
            xm = []
            for m in range(5):
                # ggml mul_mat(w2_m, tm_m): out_j = sum_e w2[m, j, e] * tm_m[e]
                delta = w2[m] @ tm[m * ed : (m + 1) * ed]
                xm.append(xn + sx * (delta + fused[m]))
            xw, xk, xv, xr, xg = xm
            r = t[p + "time_mix_receptance.weight"].astype(np.float64) @ xr
            k = t[p + "time_mix_key.weight"].astype(np.float64) @ xk
            v = t[p + "time_mix_value.weight"].astype(np.float64) @ xv
            g = t[p + "time_mix_gate.weight"].astype(np.float64) @ xg
            g = g / (1.0 + np.exp(-g))  # silu
            dec = np.tanh(t[p + "time_mix_decay_w1.weight"].astype(np.float64) @ xw)
            dec = t[p + "time_mix_decay_w2.weight"].astype(np.float64) @ dec
            dec = dec + t[p + "time_mix_decay.weight"]
            wdk = np.exp(-np.exp(dec)).reshape(H, N)
            rr, kk, vv = r.reshape(H, N), k.reshape(H, N), v.reshape(H, N)
            tf = t[p + "time_mix_first.weight"].astype(np.float64)  # (H, N)
            out = np.zeros((H, N))
            for h in range(H):
                for ii in range(N):
                    kv = kk[h, ii] * vv[h]  # (N,) over j
                    out[h] += rr[h, ii] * (tf[h, ii] * kv + st["S"][h, ii])
                    st["S"][h, ii] = st["S"][h, ii] * wdk[h, ii] + kv
            y = _np_ln(out, 1.0, 0.0, 64e-5).reshape(E)
            y = y * t[p + "time_mix_ln.weight"] + t[p + "time_mix_ln.bias"]
            y = y * g
            att_out[tt] = t[p + "time_mix_output.weight"].astype(np.float64) @ y
        st["att"] = att_norm[T - 1].copy()
        x = x + att_out
        ffn_norm = _np_ln(x, t[p + "attn_norm_2.weight"], t[p + "attn_norm_2.bias"], eps)
        cm_out = np.zeros_like(x)
        for tt in range(T):
            xn = ffn_norm[tt]
            x_prev = st["ffn"] if tt == 0 else ffn_norm[tt - 1]
            sx = x_prev - xn
            xk = xn + sx * t[p + "channel_mix_lerp_k.weight"]
            xr = xn + sx * t[p + "channel_mix_lerp_r.weight"]
            rr = 1.0 / (1.0 + np.exp(-(t[p + "channel_mix_receptance.weight"].astype(np.float64) @ xr)))
            kk = np.maximum(t[p + "channel_mix_key.weight"].astype(np.float64) @ xk, 0.0) ** 2
            cm_out[tt] = rr * (t[p + "channel_mix_value.weight"].astype(np.float64) @ kk)
        st["ffn"] = ffn_norm[T - 1].copy()
        x = x + cm_out
        if rescale_every and (i + 1) % rescale_every == 0:
            x = x * 0.5
    x = _np_ln(x, t["output_norm.weight"], t["output_norm.bias"], eps)
    return x @ t["output.weight"].T.astype(np.float64), state


def make_tiny_rwkv7(
    path,
    *,
    n_layer: int = 3,
    n_embd: int = 32,
    head_size: int = 8,
    n_ff: int = 48,
    n_vocab: int = 97,
    dr: int = 6,  # decay lora rank
    ir: int = 5,  # iclr (a) lora rank
    vr: int = 4,  # value-residual-mix lora rank
    gr: int = 7,  # gate lora rank
    seed: int = 0,
    scale: float = 0.3,
) -> dict[str, np.ndarray]:
    """Write a tiny rwkv7 GGUF with the reference's on-disk shapes
    (llama-model.cpp LLM_ARCH_RWKV7 create_tensor dims, ggml ne order
    reversed to numpy); returns the raw f32 tensors."""
    rng = np.random.default_rng(seed)
    E = n_embd

    def w(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    t: dict[str, np.ndarray] = {}
    t["token_embd.weight"] = w(n_vocab, E)
    t["token_embd_norm.weight"] = 1.0 + w(E) * 0.1
    t["token_embd_norm.bias"] = w(E) * 0.1
    t["output_norm.weight"] = 1.0 + w(E) * 0.1
    t["output_norm.bias"] = w(E) * 0.1
    t["output.weight"] = w(n_vocab, E)
    for i in range(n_layer):
        p = f"blk.{i}."
        t[p + "attn_norm.weight"] = 1.0 + w(E) * 0.1
        t[p + "attn_norm.bias"] = w(E) * 0.1
        t[p + "attn_norm_2.weight"] = 1.0 + w(E) * 0.1
        t[p + "attn_norm_2.bias"] = w(E) * 0.1
        t[p + "time_mix_lerp_fused.weight"] = w(6, 1, 1, E)
        t[p + "time_mix_w0.weight"] = w(E) - 2.0
        t[p + "time_mix_w1.weight"] = w(dr, E)
        t[p + "time_mix_w2.weight"] = w(E, dr)
        t[p + "time_mix_a0.weight"] = w(E)
        t[p + "time_mix_a1.weight"] = w(ir, E)
        t[p + "time_mix_a2.weight"] = w(E, ir)
        # layer 0 carries placeholder v-lora (unused; defines v_first)
        t[p + "time_mix_v0.weight"] = w(E)
        t[p + "time_mix_v1.weight"] = w(ir if i == 0 else vr, E)
        t[p + "time_mix_v2.weight"] = w(E, ir if i == 0 else vr)
        t[p + "time_mix_g1.weight"] = w(gr, E)
        t[p + "time_mix_g2.weight"] = w(E, gr)
        t[p + "time_mix_k_k.weight"] = w(E)
        t[p + "time_mix_k_a.weight"] = w(E)
        t[p + "time_mix_r_k.weight"] = w(E)
        for nm in ("receptance", "key", "value", "output"):
            t[p + f"time_mix_{nm}.weight"] = w(E, E)
        t[p + "time_mix_ln.weight"] = 1.0 + w(E) * 0.1
        t[p + "time_mix_ln.bias"] = w(E) * 0.1
        t[p + "channel_mix_lerp_k.weight"] = w(1, 1, E)
        t[p + "channel_mix_key.weight"] = w(n_ff, E)
        t[p + "channel_mix_value.weight"] = w(E, n_ff)

    wr = GGUFWriter(path, "rwkv7")
    a = "rwkv7"
    wr.add_kv(f"{a}.block_count", np.uint32(n_layer))
    wr.add_kv(f"{a}.embedding_length", np.uint32(E))
    wr.add_kv(f"{a}.vocab_size", np.uint32(n_vocab))
    wr.add_kv(f"{a}.context_length", np.uint32(1 << 20))
    wr.add_kv(f"{a}.feed_forward_length", np.uint32(n_ff))
    wr.add_kv(f"{a}.attention.head_count", np.uint32(0))
    wr.add_kv(f"{a}.attention.layer_norm_epsilon", np.float32(1e-5))
    wr.add_kv(f"{a}.wkv.head_size", np.uint32(head_size))
    wr.add_kv(f"{a}.attention.decay_lora_rank", np.uint32(dr))
    wr.add_kv(f"{a}.attention.iclr_lora_rank", np.uint32(ir))
    wr.add_kv(f"{a}.attention.value_residual_mix_lora_rank", np.uint32(vr))
    wr.add_kv(f"{a}.attention.gate_lora_rank", np.uint32(gr))
    wr.add_kv(f"{a}.token_shift_count", np.uint32(2))
    for name, data in t.items():
        wr.add_tensor(name, data, GGMLType.F32)
    wr.write()
    return t


def _np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def ref_rwkv7_forward(
    t: dict[str, np.ndarray],
    tokens: np.ndarray,
    *,
    n_layer: int,
    head_size: int,
    eps: float = 1e-5,
):
    """Numpy rwkv7 oracle, transcribed INDEPENDENTLY from
    ggml_compute_forward_rwkv_wkv7_f32 + src/models/rwkv7-base.cpp.
    f64 accumulation; returns (logits (T, V), final wkv states)."""
    E = t["token_embd.weight"].shape[1]
    H = E // head_size
    N = head_size
    T = len(tokens)
    x = t["token_embd.weight"][tokens].astype(np.float64)
    x = _np_ln(x, t["token_embd_norm.weight"], t["token_embd_norm.bias"], eps)
    states = []
    v_first = None
    for i in range(n_layer):
        p = f"blk.{i}."
        xn = _np_ln(x, t[p + "attn_norm.weight"], t[p + "attn_norm.bias"], eps)
        x_prev = np.concatenate([np.zeros((1, E)), xn[:-1]], 0)
        sx = x_prev - xn
        lf = t[p + "time_mix_lerp_fused.weight"].reshape(6, E).astype(np.float64)
        xr, xw, xk, xv, xa, xg = [xn + sx * lf[m] for m in range(6)]

        r = xr @ t[p + "time_mix_receptance.weight"].T.astype(np.float64)
        wl = np.tanh(xw @ t[p + "time_mix_w1.weight"].T.astype(np.float64)) \
            @ t[p + "time_mix_w2.weight"].T.astype(np.float64) \
            + t[p + "time_mix_w0.weight"]
        w = np.exp(-0.606531 * _np_sigmoid(wl))
        k = xk @ t[p + "time_mix_key.weight"].T.astype(np.float64)
        v = xv @ t[p + "time_mix_value.weight"].T.astype(np.float64)
        if i == 0:
            v_first = v
        else:
            mix = _np_sigmoid(
                xv @ t[p + "time_mix_v1.weight"].T.astype(np.float64)
                @ t[p + "time_mix_v2.weight"].T.astype(np.float64)
                + t[p + "time_mix_v0.weight"])
            v = v + (v_first - v) * mix
        g = _np_sigmoid(xg @ t[p + "time_mix_g1.weight"].T.astype(np.float64)) \
            @ t[p + "time_mix_g2.weight"].T.astype(np.float64)
        a = _np_sigmoid(
            xa @ t[p + "time_mix_a1.weight"].T.astype(np.float64)
            @ t[p + "time_mix_a2.weight"].T.astype(np.float64)
            + t[p + "time_mix_a0.weight"])

        kk = (k * t[p + "time_mix_k_k.weight"]).reshape(T, H, N)
        kk = kk / np.maximum(np.linalg.norm(kk, axis=-1, keepdims=True), 1e-12)
        k = k + k * t[p + "time_mix_k_a.weight"] * (a - 1.0)

        rh = r.reshape(T, H, N)
        wh = w.reshape(T, H, N)
        khh = k.reshape(T, H, N)
        vh = v.reshape(T, H, N)
        ah = (-kk)
        bh = kk * a.reshape(T, H, N)
        S = np.zeros((H, N, N))  # [i=value, j=key]
        out = np.zeros((T, H, N))
        for tt in range(T):
            for h in range(H):
                sa = S[h] @ ah[tt, h]  # (N,) over i
                S[h] = S[h] * wh[tt, h][None, :] \
                    + np.outer(vh[tt, h], khh[tt, h]) \
                    + np.outer(sa, bh[tt, h])
                out[tt, h] = S[h] @ rh[tt, h]
        states.append(S.copy())

        y = out.reshape(T, H, N)
        m = y.mean(-1, keepdims=True)
        var = ((y - m) ** 2).mean(-1, keepdims=True)
        y = (y - m) / np.sqrt(var + 64e-5)
        y = y.reshape(T, E) * t[p + "time_mix_ln.weight"] + t[p + "time_mix_ln.bias"]
        rk = (rh * khh * t[p + "time_mix_r_k.weight"].reshape(H, N)).sum(-1)
        y = y + (vh * rk[..., None]).reshape(T, E)
        y = y * g
        x = x + y @ t[p + "time_mix_output.weight"].T.astype(np.float64)

        xn2 = _np_ln(x, t[p + "attn_norm_2.weight"], t[p + "attn_norm_2.bias"], eps)
        x_prev2 = np.concatenate([np.zeros((1, E)), xn2[:-1]], 0)
        xk2 = xn2 + (x_prev2 - xn2) * t[p + "channel_mix_lerp_k.weight"].reshape(E)
        k2 = np.square(np.maximum(
            xk2 @ t[p + "channel_mix_key.weight"].T.astype(np.float64), 0.0))
        x = x + k2 @ t[p + "channel_mix_value.weight"].T.astype(np.float64)
    x = _np_ln(x, t["output_norm.weight"], t["output_norm.bias"], eps)
    return x @ t["output.weight"].T.astype(np.float64), states
