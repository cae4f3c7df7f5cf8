"""Rotary position embeddings.

Two layouts, matching ggml_rope modes (ref: ggml GGML_ROPE_TYPE_*):
  - "norm": rotate adjacent pairs (x[2i], x[2i+1]) — llama-family GGUF
    weights (the HF->GGUF converter permutes Q/K so this layout applies).
  - "neox": rotate split halves (x[i], x[i+d/2]) — qwen2/falcon/gpt-neox.

Supports linear and YaRN frequency scaling (ref: llama.cpp rope_scaling,
include/llama.h:329-341).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class RopeParams:
    dim: int  # rotary dimensions (<= head_dim)
    mode: str = "norm"  # "norm" | "neox" | "none"
    freq_base: float = 10000.0
    freq_scale: float = 1.0  # linear scaling (1/factor)
    # YaRN
    yarn_orig_ctx: int = 0
    yarn_ext_factor: float = 0.0
    yarn_attn_factor: float = 1.0
    yarn_beta_fast: float = 32.0
    yarn_beta_slow: float = 1.0


def _yarn_ramp(low: float, high: float, dim: int) -> jnp.ndarray:
    i = jnp.arange(dim // 2, dtype=jnp.float32)
    y = (i - low) / max(0.001, high - low)
    return 1.0 - jnp.clip(y, 0.0, 1.0)


def rope_freqs(p: RopeParams) -> tuple[jnp.ndarray, float]:
    """Per-pair inverse frequencies (already scaled) and magnitude scale."""
    half = p.dim // 2
    inv_freq = p.freq_base ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    mscale = 1.0
    if p.yarn_ext_factor != 0.0 and p.yarn_orig_ctx > 0:
        # YaRN: per-dim interpolation between scaled and unscaled freqs
        def corr_dim(n_rot: float) -> float:
            return (
                p.dim
                * math.log(p.yarn_orig_ctx / (n_rot * 2 * math.pi))
                / (2 * math.log(p.freq_base))
            )

        low = max(0.0, math.floor(corr_dim(p.yarn_beta_fast)))
        high = min(half - 1.0, math.ceil(corr_dim(p.yarn_beta_slow)))
        ramp = _yarn_ramp(low, high, p.dim) * p.yarn_ext_factor
        inv_freq = inv_freq * p.freq_scale * (1 - ramp) + inv_freq * ramp
        mscale = p.yarn_attn_factor * (1.0 + 0.1 * math.log(1.0 / p.freq_scale))
    else:
        inv_freq = inv_freq * p.freq_scale
    return inv_freq, float(mscale)


def apply_mrope(
    x: jnp.ndarray,  # (B, T, H, D)
    pos3: jnp.ndarray,  # (3, B, T) — temporal / height / width streams
    sections: tuple[int, ...],  # per-stream half-dim widths (sum == D/2)
    p: RopeParams,
    interleaved: bool = False,
) -> jnp.ndarray:
    """Qwen2-VL multimodal rope (M-RoPE): the rotary half-dims are split
    into 3 sections, each rotated by a different position stream
    (ref: LLM_KV_ROPE_DIMENSION_SECTIONS llama-arch.cpp:217,
    ggml_rope_multi; HF apply_multimodal_rotary_pos_emb). With all three
    streams equal this reduces exactly to neox rope.

    interleaved=True uses the qwen3vl layout (Qwen3VLTextRotaryEmbedding
    .apply_interleaved_mrope): T everywhere, then H at dims 1,4,7,… and
    W at dims 2,5,8,… within their section spans."""
    inv_freq, mscale = rope_freqs(p)
    half = p.dim // 2
    # stream index per half-dim
    if interleaved:
        sel = np.zeros(half, np.int32)
        for stream, off in ((1, 1), (2, 2)):
            sel[off:sections[stream] * 3:3] = stream
    else:
        sel = np.concatenate([np.full(s, i, np.int32)
                              for i, s in enumerate(sections)])
    assert sel.shape[0] == half, (sections, half)
    theta3 = pos3[..., None].astype(jnp.float32) * inv_freq  # (3, B, T, half)
    # theta[b,t,k] = theta3[sel[k], b, t, k]
    theta = theta3[jnp.asarray(sel), :, :, jnp.arange(half)]  # (half, B, T)
    theta = jnp.moveaxis(theta, 0, -1)  # (B, T, half)
    cos = (jnp.cos(theta) * mscale)[..., :, None, :]
    sin = (jnp.sin(theta) * mscale)[..., :, None, :]
    rot, rest = x[..., : p.dim], x[..., p.dim:]
    rf = rot.astype(jnp.float32)
    x1 = rf[..., :half]
    x2 = rf[..., half:]
    o1 = x1 * cos - x2 * sin
    o2 = x1 * sin + x2 * cos
    out = jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)
    return jnp.concatenate([out, rest], axis=-1) if rest.shape[-1] else out


def apply_rope(
    x: jnp.ndarray,  # (..., seq, n_head, head_dim)
    positions: jnp.ndarray,  # broadcastable to (..., seq)
    p: RopeParams,
) -> jnp.ndarray:
    if p.mode == "none":
        return x
    inv_freq, mscale = rope_freqs(p)
    theta = positions[..., None].astype(jnp.float32) * inv_freq  # (..., seq, half)
    cos = (jnp.cos(theta) * mscale)[..., :, None, :]  # (..., seq, 1, half)
    sin = (jnp.sin(theta) * mscale)[..., :, None, :]
    rot, rest = x[..., : p.dim], x[..., p.dim :]
    rf = rot.astype(jnp.float32)
    if p.mode == "norm":
        x1 = rf[..., 0::2]
        x2 = rf[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x1 * sin + x2 * cos
        out = jnp.stack([o1, o2], axis=-1).reshape(rf.shape)
    elif p.mode == "neox":
        half = p.dim // 2
        x1 = rf[..., :half]
        x2 = rf[..., half:]
        o1 = x1 * cos - x2 * sin
        o2 = x1 * sin + x2 * cos
        out = jnp.concatenate([o1, o2], axis=-1)
    else:
        raise ValueError(f"rope mode {p.mode}")
    out = out.astype(x.dtype)
    return jnp.concatenate([out, rest], axis=-1) if rest.shape[-1] else out
