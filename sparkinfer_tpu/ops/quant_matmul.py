"""Fused dequant+matmul Pallas kernels for block-quantized weights.

The TPU analogue of the reference's quantized matmul kernels (CUDA mmq/
mmvq, CPU vec_dot over ggml-quants blocks): weights stay PACKED in HBM
(4.5 / 8.5 bits per weight incl. scales) and are dequantized in VMEM tiles
on the way into the MXU — HBM traffic is the packed size, which is the
whole speedup for bandwidth-bound decode.

Wire repack (host, at load, ops/quant_matmul.repack_*): out-major
  Q4_0: qw  (out, in/2) uint8 — SEQUENTIAL nibbles (byte j = q[2j] | q[2j+1]<<4),
        repacked from ggml's interleaved order (byte j = q[j] | q[j+16]<<4,
        ggml-common.h block_q4_0) so the kernel unpack is a cheap
        deinterleave; value = (nibble - 8) * scale
  Q8_0: qw  (out, in) int8
  both: scales (out, in/32) f32 (one per 32-weight block, ggml block size)

Device layout (QuantTensor.from_repack): IN-MAJOR (transposed) —
  qw (in/div, out), scales (in/32, out). Load-bearing for Mosaic: the
  per-32-block scale broadcast is a reshape that splits the SUBLANE dim
  ((in, out) -> (in/32, 32, out)), which the TPU vector layout supports;
  the out-major orientation would need a lane-dim-splitting reshape
  ((out, in) -> (out, in/32, 32)) that Mosaic rejects ("unsupported shape
  cast"). IN-major is also the natural (non-transposed RHS) MXU feed.

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
# in-kernel dequant helpers (IN-major tiles)


def _unpack_q4_T(qtile: jnp.ndarray) -> jnp.ndarray:
    """(TI/2, TO) uint8 sequential nibbles -> (TI, TO) f32 centred values
    (low nibble = even in-dim, high = odd; interleave along the SUBLANE
    axis — the lane-dim variant is an unsupported Mosaic shape cast)."""
    b = qtile.astype(jnp.int32)
    low = (b & 15) - 8
    high = ((b >> 4) & 15) - 8
    TIH, TO = qtile.shape
    inter = jnp.stack([low, high], axis=1).reshape(TIH * 2, TO)
    return inter.astype(jnp.float32)


def _scale_cols(w: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """w (TI, TO), scales (TI//QK, TO): per-32-IN-block scaling via a
    sublane-splitting reshape (Mosaic-supported). Dequant runs in BF16
    (int8 values are exact in bf16; the scale product rounds to bf16,
    which the MXU dot would do anyway) — half the VPU work and scoped
    VMEM of the f32 round-trip."""
    TI, TO = w.shape
    w3 = w.reshape(TI // QK, QK, TO)
    return (w3 * scales.astype(w.dtype)[:, None, :]).reshape(TI, TO)


# --------------------------------------------------------------------------
# pallas kernels


def _q_matmul_kernel(kind, x_ref, qw_ref, sc_ref, out_ref):
    # full-IN column stripes: each grid step owns a (IN, TO) stripe, so
    # the scale block spans the whole IN//32 axis in one piece
    if kind == "q4_0":
        w = _unpack_q4_T(qw_ref[:]).astype(jnp.bfloat16)
    else:  # q8_0
        w = qw_ref[:].astype(jnp.bfloat16)
    w = _scale_cols(w, sc_ref[:])  # (IN, TO) bf16
    out_ref[:] = jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TN, TO)


def _pick_tile(dim: int, targets=(512, 256, 128, 64, 32, 16, 8)) -> int:
    for t in targets:
        if dim % t == 0:
            return t
    return dim


# full-IN column stripes keep VMEM bounded up to this reduction width
# (TO=512 int8 stripe at 16384 = 8 MB, double-buffered)
_MAX_FULL_IN = 16384
# the dequantized f32 intermediate is IN*TO*4 bytes of scoped VMEM, well
# past Mosaic's conservative 16 MB default at IN~14k — raise the limit
# and cap the stripe so packed+f32+bf16 (~7 bytes/weight) stays bounded
_VMEM_LIMIT = 100 * 1024 * 1024


def _pick_stripe(out: int, in_: int) -> int:
    for t in (512, 256, 128, 64, 32, 16, 8):
        if out % t == 0 and in_ * t * 7 <= 48 * 1024 * 1024:
            return t
    return _pick_tile(out)


@functools.partial(jax.jit, static_argnames=("kind", "interpret"))
def quant_matmul_2d(
    x: jnp.ndarray,  # (N, in) bf16/f32
    qw: jnp.ndarray,  # packed IN-major (in/2, out) u8 or (in, out) i8
    scales: jnp.ndarray,  # (in/32, out) f32/bf16
    *,
    kind: str,
    interpret: bool | None = None,
) -> jnp.ndarray:  # (N, out) f32
    N, IN = x.shape
    OUT = qw.shape[1]
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except Exception:
            interpret = True

    TO = _pick_stripe(OUT, IN)
    TN = _pick_tile(N, (256, 128, 64, 32, 16, 8, 4, 2, 1))
    if (IN % QK != 0 or OUT % TO != 0 or IN > _MAX_FULL_IN
            or ((TO % 128 != 0 or not (TN % 8 == 0 or TN == N))
                and not interpret)):
        return _xla_fallback(x, qw, scales, kind)

    div = 2 if kind == "q4_0" else 1
    grid = (N // TN, OUT // TO)
    out = pl.pallas_call(
        functools.partial(_q_matmul_kernel, kind),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN, IN), lambda n, i: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((IN // div, TO), lambda n, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((IN // QK, TO), lambda n, i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, TO), lambda n, i: (n, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, OUT), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * OUT * IN,
            bytes_accessed=qw.size + scales.size * 4 + N * IN * 2 + N * OUT * 4,
            transcendentals=0,
        ),
    )(x, qw, scales)
    return out


def _xla_fallback(x, qw, scales, kind):
    # qw/scales IN-major: (in/div, out), (in/32, out)
    if kind == "q4_0":
        b = qw.astype(jnp.int32)
        low = (b & 15) - 8
        high = ((b >> 4) & 15) - 8
        TIH, OUT = qw.shape
        w = jnp.stack([low, high], axis=1).reshape(TIH * 2, OUT).astype(jnp.float32)
    else:
        w = qw.astype(jnp.float32)
    IN, OUT = w.shape
    w = (w.reshape(IN // QK, QK, OUT)
         * scales.astype(jnp.float32)[:, None, :]).reshape(IN, OUT)
    return jax.lax.dot_general(
        x, w.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
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
    if kind == "q4_0":
        w = _unpack_q4_T(qw_ref[:]).astype(jnp.bfloat16)
    else:
        w = qw_ref[:].astype(jnp.bfloat16)
    w = _scale_cols(w, sc_ref[:])
    out_ref[:] = jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit,
                   static_argnames=("kind", "out_dim", "interpret"))
def quant_matmul_flat(
    x: jnp.ndarray,  # (N, in) bf16/f32
    qw: jnp.ndarray,  # packed IN-major flat (in/2, L*out) u8 or (in, L*out) i8
    scales: jnp.ndarray,  # (in/32, L*out) f32/bf16
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

    TO = _pick_stripe(OUT, IN)
    TN = _pick_tile(N, (256, 128, 64, 32, 16, 8, 4, 2, 1))
    if (IN % QK != 0 or OUT % TO != 0 or IN > _MAX_FULL_IN
            or ((TO % 128 != 0 or not (TN % 8 == 0 or TN == N))
                and not interpret)):
        # slice fallback (CPU tests / odd shapes): dynamic-slice the layer
        # then the plain XLA dequant path — correctness only
        col0 = il * OUT
        qw_l = jax.lax.dynamic_slice_in_dim(qw, col0, OUT, 1)
        sc_l = jax.lax.dynamic_slice_in_dim(scales, col0, OUT, 1)
        return _xla_fallback(x, qw_l, sc_l, kind)

    div = 2 if kind == "q4_0" else 1
    nbo = OUT // TO
    grid = (N // TN, nbo)
    w_map = lambda n, i, il_ref: (0, il_ref[0] * nbo + i)
    out = pl.pallas_call(
        functools.partial(_q_matmul_flat_kernel, kind),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TN, IN), lambda n, i, il_ref: (n, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((IN // div, TO), w_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((IN // QK, TO), w_map,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TN, TO), lambda n, i, il_ref: (n, i),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((N, OUT), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
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
    IN-MAJOR: (in/div, L*out) packed + (in/32, L*out) scales (layer l =
    column stripe l*out..(l+1)*out; see module docstring for why
    IN-major)."""

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
        infeat = self.q.shape[-2] * (2 if self.kind == "q4_0" else 1)
        return (infeat, self.out_dim)


def flat_quantize(w_stack, kind: str = "q8_0"):
    """(L, in, out) f32/bf16 host/device array -> FlatQuantTensor with
    IN-major (in, L*out) packed storage (q8_0 only; numpy, host-side)."""
    assert kind == "q8_0"
    w = np.asarray(w_stack, np.float32)
    L, IN, OUT = w.shape
    cols = np.ascontiguousarray(w.transpose(1, 0, 2)).reshape(IN, L * OUT)
    blk = cols.reshape(IN // QK, QK, L * OUT)
    amax = np.abs(blk).max(1)
    s = (amax / 127.0).astype(np.float32)
    inv = np.where(s > 0, 1.0 / np.maximum(s, 1e-30), 0.0)
    q = np.rint(blk * inv[:, None, :]).clip(-127, 127).astype(np.int8)
    return FlatQuantTensor(jnp.asarray(q.reshape(IN, L * OUT)),
                           jnp.asarray(s), kind, OUT)


# --------------------------------------------------------------------------
# W8A8 row-wise (TPU-native): int8 x int8 MXU dots with XLA fusion
#
# The ggml block formats (32-elem scales) force a dequant step that on
# TPU must either materialize (XLA) or run in a Pallas call — and custom
# calls break XLA's cross-op DMA prefetch (measured: q8full attention
# SLOWER than bf16, BENCH_NOTES round 3). Row-wise scales instead FOLD
# algebraically out of the dot: y = (x_q @ w_q) * (s_x * s_row), so the
# whole thing stays native XLA — int8 weights ride lax.scan xs (the
# slice fuses into the dot), the MXU runs its int8 path, and the
# per-token activation quant + epilogue scale are fused elementwise ops.
# This is the TPU-first analogue of W8A8 inference quantization, offered
# alongside the ggml-compatible block formats.


@jax.tree_util.register_pytree_node_class
class W8A8Tensor:
    """Row-wise int8 weight for x @ W(in, out): q (..., in, out) int8 +
    s (..., out) f32 per-OUTPUT-channel scales. Stackable on a leading
    layer axis (scan xs slice per layer, like any dense weight)."""

    def __init__(self, q: jnp.ndarray, s: jnp.ndarray):
        self.q = q
        self.s = s

    @classmethod
    def from_float(cls, w) -> "W8A8Tensor":
        w = np.asarray(w, np.float32)
        amax = np.abs(w).max(axis=-2, keepdims=True)  # per out column
        s = (amax / 127.0).astype(np.float32)
        inv = np.where(s > 0, 1.0 / np.maximum(s, 1e-30), 0.0)
        q = np.rint(w * inv).clip(-127, 127).astype(np.int8)
        return cls(jnp.asarray(q), jnp.asarray(s[..., 0, :]))

    def tree_flatten(self):
        return (self.q, self.s), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1])

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    def __getitem__(self, idx):
        return W8A8Tensor(self.q[idx], self.s[idx])


def w8a8_linear(x: jnp.ndarray, w: W8A8Tensor, out_dtype=None) -> jnp.ndarray:
    """x (..., in) @ W8A8(in, out): per-token symmetric activation quant,
    native int8 MXU dot, folded scales. Accuracy: ~Q8_0-class on weights
    (coarser: per-row vs per-32) plus per-token activation rounding.
    out_dtype defaults to x.dtype; pass jnp.float32 for logit heads."""
    xf = x.astype(jnp.float32)
    ax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(ax, 1e-20) / 127.0
    xq = jnp.round(xf / sx).clip(-127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, w.q, (((xq.ndim - 1,), (w.q.ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32)
    yf = y.astype(jnp.float32) * sx * w.s
    return yf.astype(out_dtype or x.dtype)


# --------------------------------------------------------------------------
# pytree-friendly quantized linear


@jax.tree_util.register_pytree_node_class
class QuantTensor:
    """Packed quantized weight as a pytree node (kind is static aux data so
    it survives jit/scan). Represents W(in, out) for x @ W; storage is
    IN-MAJOR: q (..., in/div, out) packed + s (..., in/32, out) scales
    (see module docstring — Mosaic supports the sublane-splitting scale
    broadcast only in this orientation). Build from the out-major wire
    repack with `QuantTensor.from_repack`."""

    def __init__(self, q: jnp.ndarray, s: jnp.ndarray, kind: str):
        self.q = q
        self.s = s
        self.kind = kind

    @classmethod
    def from_repack(cls, qw: np.ndarray, sc: np.ndarray, kind: str):
        """From repack_q*_0 output ((..., out, in/div) packed rows +
        (..., out, in/32) scales): transpose to device layout (host numpy,
        one-time at load)."""
        qT = np.ascontiguousarray(np.swapaxes(np.asarray(qw), -1, -2))
        sT = np.ascontiguousarray(np.swapaxes(np.asarray(sc), -1, -2))
        return cls(jnp.asarray(qT), jnp.asarray(sT), kind)

    def tree_flatten(self):
        return (self.q, self.s), self.kind

    @classmethod
    def tree_unflatten(cls, kind, children):
        return cls(children[0], children[1], kind)

    @property
    def shape(self):  # logical (in, out) — trailing dims for stacked use
        out = self.q.shape[-1]
        infeat = self.q.shape[-2] * (2 if self.kind == "q4_0" else 1)
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
    if isinstance(w, W8A8Tensor):
        return w8a8_linear(x, w)
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
