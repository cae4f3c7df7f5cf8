"""Fused dequant-matmul path: repack fidelity, kernel vs dequantized
reference, QuantTensor pytree behavior, end-to-end quantized model forward.

The analogue of the reference's test-backend-ops coverage for mmq/mmvq."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sparkinfer_tpu.gguf.constants import GGMLType
from sparkinfer_tpu.gguf.quants import dequantize_tensor, quantize
from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.ops.quant_matmul import (
    QuantTensor,
    quant_linear,
    quant_matmul_2d,
    repack_q4_0,
    repack_q8_0,
)

from model_fixtures import make_tiny_llama


def _mk_quant(rng, out_d, in_d, gtype):
    w = (rng.standard_normal((out_d, in_d)) * 0.3).astype(np.float32)
    raw = quantize(w, gtype)
    wdq = dequantize_tensor(raw, gtype, (out_d, in_d))  # what the codec stores
    return raw, wdq


@pytest.mark.parametrize("gtype,repack,kind", [
    (GGMLType.Q4_0, repack_q4_0, "q4_0"),
    (GGMLType.Q8_0, repack_q8_0, "q8_0"),
])
def test_repack_preserves_values(gtype, repack, kind):
    rng = np.random.default_rng(0)
    out_d, in_d = 16, 64
    raw, wdq = _mk_quant(rng, out_d, in_d, gtype)
    qw, sc = repack(raw, out_d, in_d)
    # dequantize the repacked layout by hand
    if kind == "q4_0":
        b = qw.astype(np.int32)
        seq = np.stack([(b & 15) - 8, ((b >> 4) & 15) - 8], axis=-1).reshape(out_d, in_d)
    else:
        seq = qw.astype(np.int32)
    wre = (seq.reshape(out_d, in_d // 32, 32) * sc[..., None]).reshape(out_d, in_d)
    np.testing.assert_allclose(wre, wdq, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("gtype,repack,kind", [
    (GGMLType.Q4_0, repack_q4_0, "q4_0"),
    (GGMLType.Q8_0, repack_q8_0, "q8_0"),
])
def test_kernel_matches_dequant_matmul(gtype, repack, kind):
    rng = np.random.default_rng(1)
    N, in_d, out_d = 4, 128, 32
    raw, wdq = _mk_quant(rng, out_d, in_d, gtype)
    qw, sc = repack(raw, out_d, in_d)
    x = (rng.standard_normal((N, in_d)) * 0.5).astype(np.float32)
    want = x.astype(np.float32) @ wdq.T
    got = np.asarray(
        quant_matmul_2d(jnp.asarray(x, jnp.bfloat16),
                        jnp.asarray(np.ascontiguousarray(qw.T)),
                        jnp.asarray(np.ascontiguousarray(sc.T)),
                        kind=kind)
    )
    # bf16 inputs in the MXU: tolerance ~1e-2 relative
    np.testing.assert_allclose(got, want, rtol=0.03, atol=0.05)


def test_fallback_path_unaligned():
    """Shapes not divisible by tile sizes take the XLA fallback."""
    rng = np.random.default_rng(2)
    N, in_d, out_d = 3, 96, 24  # 96 % 32 == 0 but 24 not in tile targets -> TO=24?
    raw, wdq = _mk_quant(rng, out_d, in_d, GGMLType.Q8_0)
    qw, sc = repack_q8_0(raw, out_d, in_d)
    x = (rng.standard_normal((N, in_d)) * 0.5).astype(np.float32)
    got = np.asarray(
        quant_matmul_2d(jnp.asarray(x, jnp.bfloat16),
                        jnp.asarray(np.ascontiguousarray(qw.T)),
                        jnp.asarray(np.ascontiguousarray(sc.T)),
                        kind="q8_0")
    )
    want = x @ wdq.T
    np.testing.assert_allclose(got, want, rtol=0.03, atol=0.05)


def test_quant_tensor_pytree_and_slicing():
    rng = np.random.default_rng(3)
    raw, wdq = _mk_quant(rng, 16, 64, GGMLType.Q8_0)
    qw, sc = repack_q8_0(raw, 16, 64)
    L = 2
    qt = QuantTensor.from_repack(
        np.stack([qw] * L), np.stack([sc] * L), "q8_0"
    )
    assert qt.shape == (L, 64, 16)
    leaves, treedef = jax.tree.flatten(qt)
    assert len(leaves) == 2
    rt = jax.tree.unflatten(treedef, leaves)
    assert rt.kind == "q8_0"
    sl = qt[0]
    assert sl.shape == (64, 16)
    x = jnp.asarray(rng.standard_normal((3, 64)), jnp.float32)
    y = quant_linear(x, sl)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ wdq.T, rtol=0.03, atol=0.05)


def test_quantized_model_forward_matches_dequant(tmp_path):
    """End-to-end: Q8_0 GGUF loaded keep_quantized vs dequantized — same
    logits within bf16 matmul tolerance; argmax path identical."""
    path = tmp_path / "tiny-q8.gguf"
    make_tiny_llama(path, quant_type="q8_0")
    ref_model = load_model(str(path), dtype=jnp.float32)
    q_model = load_model(str(path), dtype=jnp.float32, keep_quantized=True)
    assert hasattr(q_model.params["layers"]["w_up"], "kind")

    from sparkinfer_tpu.models.transformer import make_forward
    from sparkinfer_tpu.runtime.kv_cache import init_cache

    cfg = ref_model.config
    fwd = jax.jit(make_forward(cfg))
    rng = np.random.default_rng(4)
    toks = rng.integers(0, cfg.n_vocab, 6).astype(np.int32)
    pos = jnp.arange(6, dtype=jnp.int32)[None]
    ref, _ = fwd(ref_model.params, jnp.asarray(toks)[None], pos, init_cache(cfg, 1, 16, jnp.float32))
    got, _ = fwd(q_model.params, jnp.asarray(toks)[None], pos, init_cache(cfg, 1, 16, jnp.float32))
    ref, got = np.asarray(ref), np.asarray(got)
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.08)
    assert (np.argmax(got[0, -1]) == np.argmax(ref[0, -1]))
