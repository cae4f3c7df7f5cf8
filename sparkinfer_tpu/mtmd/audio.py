"""Whisper-style audio encoder + projector — the TPU-native analogue of
tools/mtmd/mtmd-audio.cpp + clip.cpp build_whisper_enc (the reference's
audio modality: ultravox/qwen2-audio/voxtral towers).

Reads the reference's audio-mmproj GGUF conventions: tensors
a.conv1d.{1,2}.{weight,bias}, a.position_embd.weight, a.blk.{i}.* (same
block names as the vision tower; k has NO bias), a.post_ln.*, projector
mm.a.fc.* (qwen2a single fc) — so mmproj files produced for llama.cpp
interoperate.

TPU-first: the two conv1d stages are XLA convolutions (stride 1 then 2,
SAME padding) feeding one lax.scan over stacked encoder blocks; exact
(erf) gelu throughout, matching ggml_gelu_erf.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader


@dataclass
class AudioConfig:
    n_mel: int
    n_embd: int
    n_head: int
    n_ff: int
    n_layer: int
    eps: float
    proj_type: str  # "qwen2a" single fc (mm.a.fc)


def load_mmproj_audio(path: str, dtype=jnp.float32):
    """audio-mmproj GGUF -> (AudioConfig, params)."""
    r = GGUFReader(path)
    kv = r.kv

    def g(key, default=None):
        return kv.get(f"clip.audio.{key}", kv.get(f"clip.{key}", default))

    cfg = AudioConfig(
        n_mel=int(g("num_mel_bins")),
        n_embd=int(g("embedding_length")),
        n_head=int(g("attention.head_count")),
        n_ff=int(g("feed_forward_length")),
        n_layer=int(g("block_count")),
        eps=float(g("attention.layer_norm_epsilon", 1e-5)),
        proj_type=str(kv.get("clip.projector_type", "qwen2a")),
    )

    def t(name):
        x = r.tensors.get(name)
        return None if x is None else jnp.asarray(x.to_f32(), dtype)

    params = {
        "conv1_w": t("a.conv1d.1.weight"),  # (E, n_mel, 3)
        "conv1_b": t("a.conv1d.1.bias"),
        "conv2_w": t("a.conv1d.2.weight"),  # (E, E, 3)
        "conv2_b": t("a.conv1d.2.bias"),
        "pos_embd": t("a.position_embd.weight"),
        "post_ln_w": t("a.post_ln.weight"),
        "post_ln_b": t("a.post_ln.bias"),
        "fc_w": t("mm.a.fc.weight"),
        "fc_b": t("mm.a.fc.bias"),
    }
    if params["fc_w"] is not None:  # stored (out, in) -> (in, out)
        params["fc_w"] = params["fc_w"].T
    per: dict[str, list] = {}
    names = {"attn_q": "q", "attn_k": "k", "attn_v": "v", "attn_out": "o",
             "ffn_up": "up", "ffn_down": "down"}
    for i in range(cfg.n_layer):
        p = f"a.blk.{i}."
        for gg, short in names.items():
            w = r.tensors[p + gg + ".weight"].to_f32()
            per.setdefault(short + "_w", []).append(np.ascontiguousarray(w.T))
            b = r.tensors.get(p + gg + ".bias")
            if b is not None:  # whisper: k_proj has no bias
                per.setdefault(short + "_b", []).append(b.to_f32())
        for ln in ("ln1", "ln2"):
            per.setdefault(ln + "_w", []).append(r.tensors[p + ln + ".weight"].to_f32())
            per.setdefault(ln + "_b", []).append(r.tensors[p + ln + ".bias"].to_f32())
    params["layers"] = {k: jnp.asarray(np.stack(v), dtype) for k, v in per.items()}
    r.close()
    return cfg, params


def _ln(x, w, b, eps):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.mean(jnp.square(x - m), -1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * w + b


def make_audio_forward(cfg: AudioConfig):
    """fwd(params, mel (B, n_mel, n_frames)) -> (B, n_frames//2, E_out):
    encoded (and projected, when mm.a.fc is present) audio embeddings."""
    E, H = cfg.n_embd, cfg.n_head
    D = E // H
    eps = cfg.eps

    def conv1d(x, w, b, stride):
        # x (B, C_in, T), w (C_out, C_in, K) -> (B, C_out, T/stride);
        # SYMMETRIC K//2 padding (torch Conv1d padding=1 / ggml
        # conv_1d_ph semantics — XLA's strided "SAME" pads right-heavy
        # and would shift the frames by one)
        k = w.shape[-1]
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(stride,), padding=[(k // 2, k // 2)],
            dimension_numbers=("NCH", "OIH", "NCH"))
        return y + b[None, :, None]

    def fwd(params, mel):
        x = jax.nn.gelu(conv1d(mel, params["conv1_w"], params["conv1_b"], 1),
                        approximate=False)
        x = jax.nn.gelu(conv1d(x, params["conv2_w"], params["conv2_b"], 2),
                        approximate=False)
        x = jnp.swapaxes(x, 1, 2)  # (B, T, E)
        B, T, _ = x.shape
        x = x + params["pos_embd"][None, :T]

        def block(x, lp):
            h = _ln(x, lp["ln1_w"], lp["ln1_b"], eps)
            q = (h @ lp["q_w"] + lp["q_b"]).reshape(B, T, H, D)
            k = (h @ lp["k_w"]).reshape(B, T, H, D)  # whisper: no k bias
            v = (h @ lp["v_w"] + lp["v_b"]).reshape(B, T, H, D)
            s = jnp.einsum("bthd,bshd->bhts", q, k,
                           preferred_element_type=jnp.float32) * (D ** -0.5)
            p = jax.nn.softmax(s, -1).astype(h.dtype)
            o = jnp.einsum("bhts,bshd->bthd", p, v).reshape(B, T, E)
            x = x + (o @ lp["o_w"] + lp["o_b"])
            h2 = _ln(x, lp["ln2_w"], lp["ln2_b"], eps)
            y = jax.nn.gelu(h2 @ lp["up_w"] + lp["up_b"], approximate=False)
            x = x + (y @ lp["down_w"] + lp["down_b"])
            return x, ()

        x, _ = jax.lax.scan(block, x, params["layers"])
        x = _ln(x, params["post_ln_w"], params["post_ln_b"], eps)
        if params.get("fc_w") is not None:  # qwen2a-style projector
            x = x @ params["fc_w"]
            if params.get("fc_b") is not None:
                x = x + params["fc_b"]
        return x

    return fwd
