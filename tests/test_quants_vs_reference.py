"""Cross-implementation quant checks against the reference's gguf-py.

The reference tree's gguf-py package (read-only, used purely as a numerical
oracle — the analogue of the reference using the CPU backend as the
universal oracle, SURVEY.md §4) is imported from /root/reference/gguf-py.

Two directions:
  1. decode parity: identical random raw block bytes must decode to
     identical floats in both implementations (covers every decode type,
     including ones gguf-py cannot encode);
  2. encode validity: the oracle decodes our encodings to the same values
     our decoder does.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/gguf-py")

try:
    from gguf import GGMLQuantizationType as RefType
    from gguf.quants import dequantize as ref_dequantize
    from gguf.quants import quantize as ref_quantize

    HAVE_REF = True
except Exception:  # pragma: no cover
    HAVE_REF = False

from sparkinfer_tpu.gguf import GGMLType, dequantize, quantize
from sparkinfer_tpu.gguf.constants import GGML_TYPE_TRAITS

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference gguf-py unavailable")

RNG = np.random.default_rng(7)

DECODE_TYPES = [
    GGMLType.Q4_0,
    GGMLType.Q4_1,
    GGMLType.Q5_0,
    GGMLType.Q5_1,
    GGMLType.Q8_0,
    GGMLType.Q2_K,
    GGMLType.Q3_K,
    GGMLType.Q4_K,
    GGMLType.Q5_K,
    GGMLType.Q6_K,
    GGMLType.IQ4_NL,
    GGMLType.IQ4_XS,
    GGMLType.IQ2_XXS,
    GGMLType.IQ2_XS,
    GGMLType.IQ2_S,
    GGMLType.IQ3_XXS,
    GGMLType.IQ3_S,
    GGMLType.IQ1_S,
    GGMLType.IQ1_M,
    GGMLType.TQ1_0,
    GGMLType.TQ2_0,
    GGMLType.MXFP4,
    GGMLType.BF16,
]

ENCODE_TYPES = [
    GGMLType.Q4_0,
    GGMLType.Q4_1,
    GGMLType.Q5_0,
    GGMLType.Q5_1,
    GGMLType.Q8_0,
    GGMLType.Q2_K,
    GGMLType.Q3_K,
    GGMLType.Q4_K,
    GGMLType.Q5_K,
    GGMLType.Q6_K,
    GGMLType.IQ4_NL,
    GGMLType.IQ4_XS,
]

# acceptable encode RMSE on standard-normal data (wider grids -> lower);
# our K/IQ encoders are simple affine/nearest-grid, not the reference's
# weighted search, so low-bit thresholds sit slightly above ggml's
_ENC_RMSE = {GGMLType.Q2_K: 0.55, GGMLType.Q3_K: 0.35}


def _sane_random_blocks(ttype: GGMLType, n_blocks: int) -> np.ndarray:
    """Random raw block bytes whose f16/e8m0 scale fields are finite."""
    x = RNG.standard_normal((n_blocks, GGML_TYPE_TRAITS[ttype][0])).astype(np.float32)
    ref_t = RefType(int(ttype))
    try:
        return np.asarray(ref_quantize(x, ref_t)).reshape(-1).view(np.uint8)
    except NotImplementedError:
        # oracle cannot encode (K-quants other than via C): use our encoder
        # if we have one, else synthesize byte patterns with finite scales
        try:
            return quantize(x, ttype)
        except NotImplementedError:
            pass
    bs, tsz = GGML_TYPE_TRAITS[ttype]
    raw = RNG.integers(0, 256, (n_blocks, tsz), dtype=np.uint8)
    fin = lambda n: RNG.uniform(0.001, 0.1, (n_blocks, n)).astype(np.float16)
    if ttype in (GGMLType.Q4_K, GGMLType.Q5_K):
        # d/dmin are the first two f16s: replace with small finite values
        raw[:, 0:4] = fin(2).view(np.uint8)
    elif ttype == GGMLType.Q6_K:
        raw[:, 208:210] = fin(1).view(np.uint8)
    elif ttype == GGMLType.Q2_K:
        raw[:, 80:84] = fin(2).view(np.uint8)
    elif ttype == GGMLType.Q3_K:
        raw[:, 108:110] = fin(1).view(np.uint8)
    elif ttype in (GGMLType.IQ4_NL,):
        raw[:, 0:2] = fin(1).view(np.uint8)
    elif ttype == GGMLType.IQ4_XS:
        raw[:, 0:2] = fin(1).view(np.uint8)
    elif ttype == GGMLType.TQ1_0:
        raw[:, 52:54] = fin(1).view(np.uint8)
    elif ttype == GGMLType.TQ2_0:
        raw[:, 64:66] = fin(1).view(np.uint8)
    elif ttype == GGMLType.MXFP4:
        raw[:, 0] = RNG.integers(100, 140, n_blocks, dtype=np.uint8)
    elif ttype in (GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
                   GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S):
        raw[:, 0:2] = fin(1).view(np.uint8)
    elif ttype == GGMLType.IQ1_M:
        # the f16 block scale rides the TOP nibble of each of the 4 scale
        # u16s (bytes 48:56): plant a finite f16's nibbles there
        h = fin(1).view(np.uint16).reshape(-1)  # (n_blocks,)
        sc = raw[:, 48:56].copy().view(np.uint16)
        for i in range(4):
            nib = (h >> np.uint16(4 * i)) & np.uint16(0xF)
            sc[:, i] = (sc[:, i] & np.uint16(0x0FFF)) | (nib << np.uint16(12))
        raw[:, 48:56] = sc.view(np.uint8)
    return raw.reshape(-1)


@pytest.mark.parametrize("ttype", DECODE_TYPES, ids=[t.name for t in DECODE_TYPES])
def test_decode_parity_on_raw_blocks(ttype):
    """Identical raw bytes -> identical floats in ours vs gguf-py."""
    bs, tsz = GGML_TYPE_TRAITS[ttype]
    n_blocks = 64
    raw = _sane_random_blocks(ttype, n_blocks)
    n_elems = n_blocks * bs
    ours = dequantize(raw, ttype, n_elems)
    theirs = ref_dequantize(raw.reshape(n_blocks, tsz), RefType(int(ttype))).reshape(-1)
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=0)


@pytest.mark.parametrize("ttype", ENCODE_TYPES, ids=[t.name for t in ENCODE_TYPES])
def test_reference_decodes_our_encodings(ttype):
    """gguf-py decodes our encodings to the same values we do (layout parity)."""
    x = RNG.standard_normal((2, 1024)).astype(np.float32)
    encoded = quantize(x, ttype)
    ours = dequantize(encoded, ttype, x.size).reshape(x.shape)
    theirs = ref_dequantize(encoded.reshape(2, -1), RefType(int(ttype)))
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=0)
    # and quality is sane
    rmse = np.sqrt(np.mean((ours - x) ** 2))
    assert rmse < _ENC_RMSE.get(ttype, 0.25)


def test_q8_k_roundtrip():
    """Q8_K (the K-quant dot-product activation type) has no gguf-py
    oracle; verify our encode->decode roundtrip and the bsums field
    (ggml-common.h block_q8_K: f32 d + 256 int8 + 16 int16 bsums)."""
    x = RNG.standard_normal((4, 256)).astype(np.float32)
    enc = quantize(x, GGMLType.Q8_K)
    dec = dequantize(enc, GGMLType.Q8_K, x.size).reshape(x.shape)
    assert np.sqrt(np.mean((dec - x) ** 2)) < 0.02
    blocks = enc.reshape(4, 292)
    q = blocks[:, 4:260].view(np.int8).astype(np.int32)
    bsums = blocks[:, 260:292].view(np.int16)
    np.testing.assert_array_equal(q.reshape(4, 16, 16).sum(axis=2), bsums)


_REF_CANNOT_ENCODE = (GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
                      GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.IQ4_NL,
                      GGMLType.IQ4_XS)


@pytest.mark.parametrize(
    "ttype", [t for t in ENCODE_TYPES if t not in _REF_CANNOT_ENCODE],
    ids=[t.name for t in ENCODE_TYPES if t not in _REF_CANNOT_ENCODE],
)
def test_decode_reference_encodings(ttype):
    """Our decoder reproduces gguf-py's dequantization bit-exactly."""
    x = RNG.standard_normal((4, 512)).astype(np.float32)
    ref_t = RefType(int(ttype))
    encoded = np.asarray(ref_quantize(x, ref_t))
    ours = dequantize(encoded.reshape(-1).view(np.uint8), ttype, x.size).reshape(x.shape)
    theirs = ref_dequantize(encoded, ref_t)
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=0)
