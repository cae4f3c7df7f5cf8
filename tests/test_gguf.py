"""GGUF container + quant codec tests.

Mirrors the reference's test strategy (SURVEY.md §4: test-gguf round-trip,
gguf-py/tests/test_quants.py) — round-trip our writer through our reader,
check quant encode/decode error bounds, and parse real GGUF fixtures
produced by the reference's gguf-py (the vocab files under
/root/reference/models)."""

import numpy as np
import pytest

from sparkinfer_tpu.gguf import (
    GGMLType,
    GGUFReader,
    GGUFWriter,
    dequantize,
    quantize,
    tensor_nbytes,
)

RNG = np.random.default_rng(42)


def test_read_reference_vocab_gguf(vocab_gguf_spm):
    r = GGUFReader(vocab_gguf_spm)
    assert r.arch() == "llama"
    toks = r.kv["tokenizer.ggml.tokens"]
    assert len(toks) == 32000
    assert toks[1] == "<s>"
    r.close()


def test_roundtrip_container(tmp_path):
    path = tmp_path / "t.gguf"
    w = GGUFWriter(path, "llama")
    w.add_kv("general.name", "test-model")
    w.add_kv("llama.block_count", 2)
    w.add_kv("llama.rope.freq_base", 10000.0)
    w.add_kv("flag", True)
    w.add_array("llama.pred_lora", np.array([64, 64], dtype=np.int32))
    w.add_array("strs", ["a", "bc", "def"])
    x32 = RNG.standard_normal((8, 64)).astype(np.float32)
    x16 = RNG.standard_normal((4, 32)).astype(np.float16)
    xi = RNG.integers(0, 100, (3, 5)).astype(np.int32)
    w.add_tensor("w32", x32)
    w.add_tensor("w16", x16)
    w.add_tensor("wi32", xi)
    xq = RNG.standard_normal((4, 256)).astype(np.float32)
    w.add_tensor("wq4", xq, GGMLType.Q4_0)
    w.write()

    r = GGUFReader(path)
    assert r.arch() == "llama"
    assert r.kv["general.name"] == "test-model"
    assert r.kv["llama.block_count"] == 2
    assert r.kv["flag"] is True or r.kv["flag"] == 1
    assert abs(r.kv["llama.rope.freq_base"] - 10000.0) < 1e-6
    assert list(r.kv["llama.pred_lora"]) == [64, 64]
    assert r.kv["strs"] == ["a", "bc", "def"]
    np.testing.assert_array_equal(r.tensors["w32"].astype_np(), x32)
    np.testing.assert_array_equal(r.tensors["w16"].astype_np(), x16)
    np.testing.assert_array_equal(r.tensors["wi32"].astype_np(), xi)
    assert r.tensors["wq4"].shape == (4, 256)
    assert r.tensors["wq4"].ggml_type == GGMLType.Q4_0
    dq = r.tensors["wq4"].to_f32()
    # q4_0 at ~N(0,1): rough bound on abs error
    assert np.abs(dq - xq).max() < 0.4
    r.close()


QUANT_CASES = [
    # (type, rel rmse bound at N(0,1))
    (GGMLType.Q4_0, 0.20),
    (GGMLType.Q4_1, 0.15),
    (GGMLType.Q5_0, 0.10),
    (GGMLType.Q5_1, 0.08),
    (GGMLType.Q8_0, 0.01),
    (GGMLType.Q4_K, 0.15),
    (GGMLType.Q6_K, 0.05),
]


@pytest.mark.parametrize("ttype,bound", QUANT_CASES, ids=[c[0].name for c in QUANT_CASES])
def test_quant_roundtrip_error(ttype, bound):
    x = RNG.standard_normal(4096).astype(np.float32)
    buf = quantize(x, ttype)
    assert buf.nbytes == tensor_nbytes(x.size, ttype)
    y = dequantize(buf, ttype, x.size)
    rmse = np.sqrt(np.mean((x - y) ** 2))
    assert rmse < bound, f"{ttype.name} rmse {rmse}"


@pytest.mark.parametrize("ttype,bound", QUANT_CASES, ids=[c[0].name for c in QUANT_CASES])
def test_quant_idempotent(ttype, bound):
    """quantize(dequantize(q)) == q: the decoded points lie on the grid."""
    x = RNG.standard_normal(1024).astype(np.float32)
    buf1 = quantize(x, ttype)
    y1 = dequantize(buf1, ttype, x.size)
    buf2 = quantize(y1, ttype)
    y2 = dequantize(buf2, ttype, x.size)
    np.testing.assert_allclose(y1, y2, rtol=0, atol=2e-3)


def test_bf16_roundtrip():
    x = RNG.standard_normal(256).astype(np.float32)
    buf = quantize(x, GGMLType.BF16)
    y = dequantize(buf, GGMLType.BF16, x.size)
    assert np.abs(x - y).max() < 0.01
    # exactly representable values survive
    x2 = np.array([1.0, -2.0, 0.5, 0.0, 65280.0], dtype=np.float32)
    y2 = dequantize(quantize(x2, GGMLType.BF16), GGMLType.BF16, x2.size)
    np.testing.assert_array_equal(x2, y2)


def test_q4k_scale_packing():
    from sparkinfer_tpu.gguf.quants import _pack_kscales, _unpack_kscales

    sc = RNG.integers(0, 64, (5, 8)).astype(np.uint8)
    mn = RNG.integers(0, 64, (5, 8)).astype(np.uint8)
    sc2, mn2 = _unpack_kscales(_pack_kscales(sc, mn))
    np.testing.assert_array_equal(sc, sc2)
    np.testing.assert_array_equal(mn, mn2)


@pytest.mark.parametrize("tname", ["IQ2_XXS", "IQ2_XS", "IQ2_S", "IQ3_XXS",
                                   "IQ3_S", "IQ1_S", "IQ1_M"])
def test_iq_lattice_types_container_roundtrip(tmp_path, tname):
    """The IQ lattice formats (decode-only: neither we nor gguf-py encode
    them — producing them needs ggml's weighted codebook search) ride the
    GGUF container end-to-end: raw blocks written via the writer's raw path
    read back and dequantize identically to the flat codec."""
    from sparkinfer_tpu.gguf import GGUFWriter, dequantize
    from sparkinfer_tpu.gguf.constants import GGML_TYPE_TRAITS
    from sparkinfer_tpu.gguf.reader import GGUFReader

    ttype = getattr(GGMLType, tname)
    bs, tsz = GGML_TYPE_TRAITS[ttype]
    nb = 8
    raw = RNG.integers(0, 256, (nb, tsz), dtype=np.uint8)
    # keep the f16 block scale finite (IQ1_M packs it in the top nibble of
    # each of its four scale u16s; all others lead with a plain f16 d)
    fin = RNG.uniform(0.01, 0.1, (nb, 1)).astype(np.float16)
    if ttype == GGMLType.IQ1_M:
        h = fin.view(np.uint16).reshape(-1)
        sc = raw[:, 48:56].copy().view(np.uint16)
        for i in range(4):
            nib = (h >> np.uint16(4 * i)) & np.uint16(0xF)
            sc[:, i] = (sc[:, i] & np.uint16(0x0FFF)) | (nib << np.uint16(12))
        raw[:, 48:56] = sc.view(np.uint8)
    else:
        raw[:, 0:2] = fin.view(np.uint8)

    p = tmp_path / f"iq-{tname}.gguf"
    w = GGUFWriter(str(p), arch="llama")
    w.add_tensor("w", raw.reshape(-1), ne=(nb * bs,), ggml_type=ttype, raw=True)
    w.write()
    r = GGUFReader(str(p))
    t = r.tensors["w"]
    assert t.ggml_type == ttype
    np.testing.assert_array_equal(
        t.to_f32(), dequantize(raw.reshape(-1), ttype, nb * bs))
    r.close()


def test_decode_vs_reference_fixture_types(vocab_gguf_spm):
    """All tensors in the fixture decode without error (there are none, but
    KV-only files must parse); also verify data_offset alignment."""
    r = GGUFReader(vocab_gguf_spm)
    assert r.data_offset % r.alignment == 0
    r.close()


@pytest.mark.parametrize("qtype", ["q2_k", "q3_k", "q5_k", "iq4_nl", "iq4_xs"])
def test_quant_tail_types_load_and_run(tmp_path, qtype):
    """Round-3 quant decode tail (VERDICT item 8): the common low-bit
    community formats load through the standard loader (dequantized to
    dense) and a forward runs end-to-end on the tiny fixture. K/IQ
    super-blocks need 256-multiple in_dims."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    import jax.numpy as jnp
    from model_fixtures import make_tiny_llama

    from sparkinfer_tpu.models.loader import load_model
    from sparkinfer_tpu.models.transformer import make_forward
    from sparkinfer_tpu.runtime.kv_cache import init_cache

    path = tmp_path / f"tiny-{qtype}.gguf"
    ref = make_tiny_llama(path, n_embd=256, n_head=4, n_head_kv=2,
                          n_ff=256, n_layer=1, quant_type=qtype)
    model = load_model(str(path), dtype=jnp.float32)
    # the quantized tensors really were stored in the target format
    # (loader dequantized them) — check one against our codec directly
    from sparkinfer_tpu.gguf import GGMLType, dequantize_tensor, quantize

    gt = getattr(GGMLType, qtype.upper())
    w = ref["blk.0.ffn_up.weight"]
    dec = dequantize_tensor(quantize(w, gt), gt, w.shape)
    got = np.asarray(model.params["layers"]["w_up"][0]).T  # (out, in)
    np.testing.assert_allclose(got, dec, rtol=1e-5, atol=1e-5)
    fwd = make_forward(model.config)
    cache = init_cache(model.config, 1, 8, jnp.float32)
    logits, _ = fwd(model.params, jnp.asarray([[1, 5, 9]], jnp.int32),
                    jnp.arange(3, dtype=jnp.int32)[None], cache)
    assert np.isfinite(np.asarray(logits)).all()
