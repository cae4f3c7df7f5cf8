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
# flat (layer-stacked) quantized matmul: scalar-prefetch layer offset
#
# Why this exists: weights consumed by a Pallas call must NOT ride a layer
# scan's xs — the per-layer dynamic-slice cannot fuse into the custom call
# and XLA materializes a copy of the slice every layer, every step (the
# round-1 0.84x bug, BENCH_NOTES.md). The flat form keeps ONE loop-
# invariant (L*OUT, IN) packed store and block-indexes it inside the
# kernel with the layer id delivered via scalar prefetch — zero-copy, the
# same trick as ops/sparse_ffn_pallas.sparse_ffn_block_v6.


def _q_matmul_flat_kernel(kind, il_ref, x_ref, qw_ref, sc_ref, out_ref):
    # identical math to _q_matmul_kernel; the layer offset (il_ref, the
    # scalar-prefetch operand) lives entirely in the BlockSpec index maps
    j = pl.program_id(1)
    if kind == "q4_0":
        w = _unpack_q4(qw_ref[:])
    else:
        w = qw_ref[:].astype(jnp.float32)
    w = _scale_rows(w, sc_ref[:])
    part = jax.lax.dot_general(
        x_ref[:], w.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _():
        out_ref[:] = part

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + part


@functools.partial(jax.jit,
                   static_argnames=("kind", "out_dim", "interpret"))
def quant_matmul_flat(
    x: jnp.ndarray,  # (N, in) bf16/f32
    qw: jnp.ndarray,  # packed flat (L*out, in/2) u8 or (L*out, in) i8
    scales: jnp.ndarray,  # (L*out, in/32) f32
    il: jnp.ndarray,  # () int32 layer index
    *,
    kind: str,
    out_dim: int,
    interpret: bool | None = None,
) -> jnp.ndarray:  # (N, out) f32
    N, IN = x.shape
    OUT = out_dim
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except Exception:
            interpret = True

    TO = _pick_tile(OUT)
    TI = _pick_tile(IN, (1024, 512, 256, 128, 64, 32))
    if TI % QK != 0 or IN % TI != 0 or OUT % TO != 0:
        # slice fallback (CPU tests / odd shapes): dynamic-slice the layer
        # then the plain XLA dequant path — correctness only
        row0 = il * OUT
        qw_l = jax.lax.dynamic_slice_in_dim(qw, row0, OUT, 0)
        sc_l = jax.lax.dynamic_slice_in_dim(scales, row0, OUT, 0)
        return _xla_fallback(x, qw_l, sc_l, kind)

    div = 2 if kind == "q4_0" else 1
    nbo = OUT // TO
    grid = (nbo, IN // TI)
    w_map = lambda i, j, il_ref: (il_ref[0] * nbo + i, j)
    out = pl.pallas_call(
        functools.partial(_q_matmul_flat_kernel, kind),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((N, TI), lambda i, j, il_ref: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TO, TI // div), w_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TO, TI // QK), w_map,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((N, TO), lambda i, j, il_ref: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((N, OUT), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * OUT * IN,
            bytes_accessed=OUT * IN // div + OUT * (IN // QK) * 4
            + N * IN * 2 + N * OUT * 4,
            transcendentals=0,
        ),
    )(jnp.asarray(il, jnp.int32).reshape(1), x, qw, scales)
    return out


@jax.tree_util.register_pytree_node_class
class FlatQuantTensor:
    """Layer-stacked packed quantized weight, consumed as ONE loop-
    invariant operand with the layer index bound late (transformer body
    calls .with_il(il) when merging params['sparse_flat'] into the layer
    dict). Logical per-layer shape is W(in, out) for x @ W; storage is
    (L*out, in)-packed rows + per-32-block scales."""

    def __init__(self, q: jnp.ndarray, s: jnp.ndarray, kind: str,
                 out_dim: int, il=None):
        self.q = q
        self.s = s
        self.kind = kind
        self.out_dim = out_dim
        self.il = il

    def tree_flatten(self):
        if self.il is None:
            return (self.q, self.s), (self.kind, self.out_dim, False)
        return (self.q, self.s, self.il), (self.kind, self.out_dim, True)

    @classmethod
    def tree_unflatten(cls, aux, children):
        kind, out_dim, has_il = aux
        il = children[2] if has_il else None
        return cls(children[0], children[1], kind, out_dim, il)

    def with_il(self, il):
        return FlatQuantTensor(self.q, self.s, self.kind, self.out_dim, il)

    @property
    def shape(self):  # logical per-layer (in, out)
        infeat = self.q.shape[-1] * (2 if self.kind == "q4_0" else 1)
        return (infeat, self.out_dim)


def flat_quantize(w_stack, kind: str = "q8_0"):
    """(L, in, out) f32/bf16 host/device array -> FlatQuantTensor with
    (L*out, in) packed storage (q8_0 only for now; numpy, host-side)."""
    assert kind == "q8_0"
    w = np.asarray(w_stack, np.float32)
    L, IN, OUT = w.shape
    rows = np.ascontiguousarray(w.transpose(0, 2, 1)).reshape(L * OUT, IN)
    blk = rows.reshape(L * OUT, IN // QK, QK)
    amax = np.abs(blk).max(-1)
    s = (amax / 127.0).astype(np.float32)
    inv = np.where(s > 0, 1.0 / np.maximum(s, 1e-30), 0.0)
    q = np.rint(blk * inv[..., None]).clip(-127, 127).astype(np.int8)
    return FlatQuantTensor(jnp.asarray(q.reshape(L * OUT, IN)),
                           jnp.asarray(s), kind, OUT)


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
    """x (..., in) @ W(in, out); w is a plain (in, out) array, QuantTensor,
    or FlatQuantTensor (layer index pre-bound via .with_il).
    Returns (..., out) in x.dtype (f32 accumulate inside)."""
    if isinstance(w, FlatQuantTensor):
        if w.il is None:
            raise ValueError("FlatQuantTensor used without a bound layer "
                             "index; pass it via params['sparse_flat'] so "
                             "the transformer body binds il")
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        out = quant_matmul_flat(x2.astype(jnp.bfloat16), w.q, w.s, w.il,
                                kind=w.kind, out_dim=w.out_dim)
        return out.reshape(lead + (out.shape[-1],)).astype(x.dtype)
    if not is_quantized(w):
        return x @ w
    lead = x.shape[:-1]
    IN = x.shape[-1]
    x2 = x.reshape(-1, IN)
    out = quant_matmul_2d(x2.astype(jnp.bfloat16), w.q, w.s, kind=w.kind)
    return out.reshape(lead + (out.shape[-1],)).astype(x.dtype)
