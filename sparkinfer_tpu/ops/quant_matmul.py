"""Fused dequant+matmul Pallas kernels for block-quantized weights.

The TPU analogue of the reference's quantized matmul kernels (CUDA mmq/
mmvq, CPU vec_dot over ggml-quants blocks): weights stay PACKED in HBM
(4.5 / 8.5 bits per weight incl. scales) and are dequantized in VMEM tiles
on the way into the MXU — HBM traffic is the packed size, which is the
whole speedup for bandwidth-bound decode.

Device layout (host-side repack at load, ops/quant_matmul.repack_*):
  Q4_0: qw  (out, in/2) uint8 — SEQUENTIAL nibbles (byte j = q[2j] | q[2j+1]<<4),
        repacked from ggml's interleaved order (byte j = q[j] | q[j+16]<<4,
        ggml-common.h block_q4_0) so the kernel unpack is a cheap
        deinterleave; value = (nibble - 8) * scale
  Q8_0: qw  (out, in) int8
  both: scales (out, in/32) f32 (one per 32-weight block, ggml block size)

Out-of-tile-alignment shapes fall back to an XLA dequant+matmul (still
device-resident packed storage, just no pallas tiling).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QK = 32  # ggml block size for q4_0/q8_0


# --------------------------------------------------------------------------
# host-side repack (numpy, at load time)


def repack_q4_0(raw: np.ndarray, out_dim: int, in_dim: int):
    """raw: ggml q4_0 blocks for a (out, in) row-major tensor
    (uint8 (nblocks, 18): 2B f16 scale + 16B packed). Returns
    (qw uint8 (out, in/2) sequential nibbles, scales f32 (out, in/32)).
    Uses the native OpenMP repack when available."""
    from .. import native

    if native.available():
        return native.repack_q4_0(np.asarray(raw, np.uint8), out_dim, in_dim)
    nb = out_dim * in_dim // QK
    blocks = raw.reshape(nb, 18)
    scales = blocks[:, :2].copy().view(np.float16).astype(np.float32).reshape(out_dim, in_dim // QK)
    packed = blocks[:, 2:]  # (nb, 16): byte j = q[j] | q[j+16] << 4
    low = packed & 0x0F  # q[0..15]
    high = packed >> 4  # q[16..31]
    seq = np.concatenate([low, high], axis=1)  # (nb, 32) values 0..15
    # sequential nibble pack: byte j = q[2j] | q[2j+1] << 4
    qw = (seq[:, 0::2] | (seq[:, 1::2] << 4)).astype(np.uint8)  # (nb, 16)
    return qw.reshape(out_dim, in_dim // 2), scales


def repack_q8_0(raw: np.ndarray, out_dim: int, in_dim: int):
    """ggml q8_0 blocks (nblocks, 34): 2B f16 scale + 32B int8."""
    from .. import native

    if native.available():
        return native.repack_q8_0(np.asarray(raw, np.uint8), out_dim, in_dim)
    nb = out_dim * in_dim // QK
    blocks = raw.reshape(nb, 34)
    scales = blocks[:, :2].copy().view(np.float16).astype(np.float32).reshape(out_dim, in_dim // QK)
    qw = blocks[:, 2:].copy().view(np.int8).reshape(out_dim, in_dim)
    return qw, scales


# --------------------------------------------------------------------------
# in-kernel dequant helpers


def _unpack_q4(qtile: jnp.ndarray) -> jnp.ndarray:
    """(TO, TI/2) uint8 sequential nibbles -> (TO, TI) f32 centred values."""
    b = qtile.astype(jnp.int32)
    low = (b & 15) - 8
    high = ((b >> 4) & 15) - 8
    TO, TIH = qtile.shape
    inter = jnp.stack([low, high], axis=-1).reshape(TO, TIH * 2)
    return inter.astype(jnp.float32)


def _scale_rows(w: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    TO, TI = w.shape
    return (w.reshape(TO, TI // QK, QK) * scales[..., None]).reshape(TO, TI)


# --------------------------------------------------------------------------
# pallas kernels


def _q_matmul_kernel(kind, x_ref, qw_ref, sc_ref, out_ref):
    j = pl.program_id(1)
    if kind == "q4_0":
        w = _unpack_q4(qw_ref[:])
    else:  # q8_0
        w = qw_ref[:].astype(jnp.float32)
    w = _scale_rows(w, sc_ref[:])  # (TO, TI) f32
    part = jax.lax.dot_general(
        x_ref[:], w.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, TO)

    @pl.when(j == 0)
    def _():
        out_ref[:] = part

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + part


def _pick_tile(dim: int, targets=(512, 256, 128, 64, 32, 16, 8)) -> int:
    for t in targets:
        if dim % t == 0:
            return t
    return dim


@functools.partial(jax.jit, static_argnames=("kind", "interpret"))
def quant_matmul_2d(
    x: jnp.ndarray,  # (N, in) bf16/f32
    qw: jnp.ndarray,  # packed (out, in/2) u8 or (out, in) i8
    scales: jnp.ndarray,  # (out, in/32) f32
    *,
    kind: str,
    interpret: bool | None = None,
) -> jnp.ndarray:  # (N, out) f32
    N, IN = x.shape
    OUT = qw.shape[0]
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except Exception:
            interpret = True

    TO = _pick_tile(OUT)
    TI = _pick_tile(IN, (1024, 512, 256, 128, 64, 32))
    if TI % QK != 0 or IN % TI != 0 or OUT % TO != 0:
        return _xla_fallback(x, qw, scales, kind)

    div = 2 if kind == "q4_0" else 1
    grid = (OUT // TO, IN // TI)
    out = pl.pallas_call(
        functools.partial(_q_matmul_kernel, kind),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, TI), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, TI // div), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, TI // QK), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, TO), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, OUT), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * OUT * IN,
            bytes_accessed=qw.size + scales.size * 4 + N * IN * 2 + N * OUT * 4,
            transcendentals=0,
        ),
    )(x, qw, scales)
    return out


def _xla_fallback(x, qw, scales, kind):
    if kind == "q4_0":
        b = qw.astype(jnp.int32)
        low = (b & 15) - 8
        high = ((b >> 4) & 15) - 8
        OUT, TIH = qw.shape
        w = jnp.stack([low, high], axis=-1).reshape(OUT, TIH * 2).astype(jnp.float32)
    else:
        w = qw.astype(jnp.float32)
    OUT, IN = w.shape
    w = (w.reshape(OUT, IN // QK, QK) * scales[..., None]).reshape(OUT, IN)
    return jax.lax.dot_general(
        x, w.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# --------------------------------------------------------------------------
# pytree-friendly quantized linear


@jax.tree_util.register_pytree_node_class
class QuantTensor:
    """Packed quantized weight as a pytree node (kind is static aux data so
    it survives jit/scan). Represents W(in, out) for x @ W; storage is
    out-major packed rows + per-block scales."""

    def __init__(self, q: jnp.ndarray, s: jnp.ndarray, kind: str):
        self.q = q
        self.s = s
        self.kind = kind

    def tree_flatten(self):
        return (self.q, self.s), self.kind

    @classmethod
    def tree_unflatten(cls, kind, children):
        return cls(children[0], children[1], kind)

    @property
    def shape(self):  # logical (in, out) — trailing dims for stacked use
        out = self.q.shape[-2]
        infeat = self.q.shape[-1] * (2 if self.kind == "q4_0" else 1)
        return self.q.shape[:-2] + (infeat, out)

    @property
    def ndim(self):
        return len(self.shape)

    def __getitem__(self, idx):  # supports per-layer slicing lp["w_up"][l]
        return QuantTensor(self.q[idx], self.s[idx], self.kind)


def is_quantized(w) -> bool:
    return isinstance(w, QuantTensor)


def quant_linear(x: jnp.ndarray, w) -> jnp.ndarray:
    """x (..., in) @ W(in, out); w is a plain (in, out) array or QuantTensor.
    Returns (..., out) in x.dtype (f32 accumulate inside)."""
    if not is_quantized(w):
        return x @ w
    lead = x.shape[:-1]
    IN = x.shape[-1]
    x2 = x.reshape(-1, IN)
    out = quant_matmul_2d(x2.astype(jnp.bfloat16), w.q, w.s, kind=w.kind)
    return out.reshape(lead + (out.shape[-1],)).astype(x.dtype)
