"""KV cache for continuous-batching decode.

The TPU-native re-design of src/llama-kv-cache.cpp: instead of a cell
allocator with defrag/shift over one shared buffer, each batch slot owns a
static (max_seq, n_head_kv, head_dim) region — slot s, position p lives at
cache[:, s, p]. Continuous batching reuses slots; "freeing" a sequence is
just resetting its length. This keeps every shape static for XLA and makes
the cache a plain pytree carried through the jitted step.

Supports bf16 or int8 (per-head-block scaled) storage; int8 is the
analogue of llama.cpp's quantized KV (-ctk/-ctv, common/arg.cpp:1665).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, NamedTuple

import jax
import jax.numpy as jnp

if TYPE_CHECKING:
    from ..models.config import ModelConfig


class KVCache(NamedTuple):
    k: jnp.ndarray  # (L, B, S, Hkv, D) storage dtype — or, in iSWA mode,
    # a tuple of per-run buffers (run = contiguous layers with the same
    # SWA flag): SWA runs hold a small ring (window+chunk wide), full
    # runs the whole S (ref: src/llama-kv-cache-iswa.cpp dual caches)
    v: jnp.ndarray  # (L, B, S, Hkv, D)
    k_scale: jnp.ndarray | None = None  # (L, B, S, Hkv, 1) f32, int8 mode
    v_scale: jnp.ndarray | None = None

    @property
    def iswa(self) -> bool:
        return isinstance(self.k, tuple)

    @property
    def max_seq(self) -> int:
        if self.iswa:
            return max(a.shape[2] for a in self.k)
        return self.k.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def init_cache(
    cfg: "ModelConfig", batch: int, max_seq: int, dtype=jnp.bfloat16,
    quantized: bool = False, v_dtype=None,
) -> KVCache:
    """v_dtype: separate V-cache storage dtype (-ctv; default = dtype).
    Reads cast to the compute dtype, so K/V float types mix freely."""
    v_dtype = dtype if v_dtype is None else v_dtype
    if cfg.kv_lora_rank > 0:
        # MLA absorbed cache: ONE latent slot [c_kv; k_pe] per token
        # (kv_lora_rank + rope_dim wide, independent of n_head); the
        # v-side buffer is zero-width (values decompress from c_kv)
        kshape = (cfg.n_layer, batch, max_seq, 1,
                  cfg.kv_lora_rank + cfg.rope_dim)
        vshape = kshape[:-1] + (0,)
        assert not quantized, "int8 KV not supported for the MLA latent cache"
        return KVCache(k=jnp.zeros(kshape, dtype), v=jnp.zeros(vshape, dtype))
    shape = (cfg.n_layer, batch, max_seq, cfg.n_head_kv, cfg.head_dim)
    if quantized:
        return KVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(shape[:-1] + (1,), jnp.float32),
            v_scale=jnp.zeros(shape[:-1] + (1,), jnp.float32),
        )
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, v_dtype))


def swa_runs(cfg: "ModelConfig") -> list[tuple[int, int, bool]]:
    """Contiguous (start, end, is_swa) layer runs of cfg.swa_layers."""
    flags = cfg.swa_layers
    runs = []
    s = 0
    for i in range(1, cfg.n_layer + 1):
        if i == cfg.n_layer or flags[i] != flags[s]:
            runs.append((s, i, flags[s]))
            s = i
    return runs


def init_cache_iswa(
    cfg: "ModelConfig", batch: int, max_seq: int, chunk: int = 64,
    dtype=jnp.bfloat16, v_dtype=None,
) -> KVCache:
    """iSWA dual cache (ref src/llama-kv-cache-iswa.cpp): SWA layers get
    a ring of sliding_window + chunk slots (chunk = largest prefill
    ubatch the caller will feed — keys written this chunk must not
    overwrite keys its own earliest query still needs); full-attention
    layers get the whole max_seq. For gemma-style patterns this cuts KV
    memory by ~n_swa_layers * (1 - ring/max_seq)."""
    v_dtype = dtype if v_dtype is None else v_dtype
    ring = min(max_seq, cfg.sliding_window + chunk)
    ks, vs = [], []
    for s, e, is_swa in swa_runs(cfg):
        S = ring if is_swa else max_seq
        shape = (e - s, batch, S, cfg.n_head_kv, cfg.head_dim)
        ks.append(jnp.zeros(shape, dtype))
        vs.append(jnp.zeros(shape, v_dtype))
    return KVCache(k=tuple(ks), v=tuple(vs))


def quantize_kv(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(token, head) symmetric int8: x (..., D) -> (q, scale(...,1))."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = amax / 127.0
    q = jnp.round(x.astype(jnp.float32) / jnp.maximum(scale, 1e-12)).astype(jnp.int8)
    return q, scale


def dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale).astype(dtype)


def write_layer(
    kc: jnp.ndarray,  # (B, S, Hkv, D) one layer's K or V storage
    sc: jnp.ndarray | None,  # (B, S, Hkv, 1) scales when quantized
    new: jnp.ndarray,  # (B, T, Hkv, D) compute-dtype values
    positions: jnp.ndarray,  # (B, T) int32
) -> tuple[jnp.ndarray, jnp.ndarray | None]:
    B, T = positions.shape
    b_idx = jnp.arange(B, dtype=jnp.int32)[:, None] * jnp.ones((1, T), jnp.int32)
    # clamp to keep OOB writes in-bounds (slots past max_seq are rejected upstream)
    pos = jnp.clip(positions, 0, kc.shape[1] - 1)
    if sc is not None:
        q, s = quantize_kv(new)
        return kc.at[b_idx, pos].set(q), sc.at[b_idx, pos].set(s)
    return kc.at[b_idx, pos].set(new.astype(kc.dtype)), None


def read_layer(
    kc: jnp.ndarray, sc: jnp.ndarray | None, dtype=jnp.bfloat16
) -> jnp.ndarray:
    if sc is not None:
        return dequantize_kv(kc, sc, dtype)
    return kc.astype(dtype)


def shift_cache(
    cache: KVCache,
    rp,  # RopeParams of the model
    keep: int,
    discard: int,
    n_past: int,
) -> KVCache:
    """Context shift (ref: llama.cpp context shift / llama_kv_cache_seq_add):
    drop rows [keep, keep+discard) and slide [keep+discard, n_past) down by
    `discard`, re-rotating K by -discard positions (RoPE is additive in the
    position angle, so a constant negative rotation relabels the rows).
    Applies to ALL batch slots; static sizes -> jit-compatible."""
    from ..ops.rope import apply_rope

    def move_k(k):  # (L, B, S, Hkv, D)
        seg = k[:, :, keep + discard : n_past]
        segf = seg.astype(jnp.float32)
        # rotate by a constant -discard: positions array of that constant
        L, B, n, Hkv, D = seg.shape
        pos = jnp.full((L, B, n), -discard, jnp.int32)
        seg2 = apply_rope(segf, pos, rp).astype(k.dtype)
        return k.at[:, :, keep : n_past - discard].set(seg2)

    def move_v(v):
        seg = v[:, :, keep + discard : n_past]
        return v.at[:, :, keep : n_past - discard].set(seg)

    if cache.quantized:
        # dequantize K segment, rotate, requantize
        kseg = dequantize_kv(
            cache.k[:, :, keep + discard : n_past],
            cache.k_scale[:, :, keep + discard : n_past],
            jnp.float32,
        )
        L, B, n, Hkv, D = kseg.shape
        pos = jnp.full((L, B, n), -discard, jnp.int32)
        kseg = apply_rope(kseg, pos, rp)
        q, s = quantize_kv(kseg)
        k = cache.k.at[:, :, keep : n_past - discard].set(q)
        ks = cache.k_scale.at[:, :, keep : n_past - discard].set(s)
        v = move_v(cache.v)
        vs = cache.v_scale.at[:, :, keep : n_past - discard].set(
            cache.v_scale[:, :, keep + discard : n_past]
        )
        return KVCache(k=k, v=v, k_scale=ks, v_scale=vs)
    return KVCache(k=move_k(cache.k), v=move_v(cache.v))
