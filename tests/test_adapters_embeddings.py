"""LoRA adapters, control vectors, embeddings, bench tool smoke."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sparkinfer_tpu.gguf.constants import GGMLType
from sparkinfer_tpu.gguf.writer import GGUFWriter
from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.models.lora import apply_control_vector, apply_lora
from sparkinfer_tpu.models.transformer import make_forward
from sparkinfer_tpu.runtime.embeddings import Embedder
from sparkinfer_tpu.runtime.kv_cache import init_cache

from model_fixtures import make_tiny_llama


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny.gguf"
    make_tiny_llama(path)
    return str(path)


def _fwd_logits(model, toks):
    fwd = jax.jit(make_forward(model.config))
    pos = jnp.arange(len(toks), dtype=jnp.int32)[None]
    lg, _ = fwd(model.params, jnp.asarray(toks, jnp.int32)[None], pos,
                init_cache(model.config, 1, 16, jnp.float32))
    return np.asarray(lg)[0]


def _write_lora(path, L, E, F, rank=4, alpha=8.0, seed=0):
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, "llama")
    w.add_kv("general.type", "adapter")
    w.add_kv("adapter.type", "lora")
    w.add_kv("adapter.lora.alpha", np.float32(alpha))
    tensors = {}
    for l in range(L):
        for name, (out_d, in_d) in {"attn_q": (E, E), "ffn_up": (F, E)}.items():
            A = (rng.standard_normal((rank, in_d)) * 0.05).astype(np.float32)
            B = (rng.standard_normal((out_d, rank)) * 0.05).astype(np.float32)
            w.add_tensor(f"blk.{l}.{name}.lora_a", A, GGMLType.F32)
            w.add_tensor(f"blk.{l}.{name}.lora_b", B, GGMLType.F32)
            tensors[(l, name)] = (A, B)
    w.write()
    return tensors, alpha, rank


def test_lora_merge_changes_logits_correctly(model_path, tmp_path):
    model = load_model(model_path, dtype=jnp.float32)
    base = _fwd_logits(model, [3, 5, 7])

    lora_path = tmp_path / "adapter.gguf"
    tensors, alpha, rank = _write_lora(str(lora_path), 2, 64, 96)
    params2 = apply_lora(model.params, model.config, str(lora_path))

    # manual expectation on one weight: wq' = wq + (alpha/r)*(B@A)^T
    wq0 = np.asarray(model.params["layers"]["wq"][0])
    A, B = tensors[(0, "attn_q")]
    want = wq0 + (alpha / rank) * (B @ A).T
    got = np.asarray(params2["layers"]["wq"][0])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # logits actually change
    model.params = params2
    tuned = _fwd_logits(model, [3, 5, 7])
    assert np.abs(tuned - base).max() > 1e-4


def test_lora_missing_tensors_rejected(model_path, tmp_path):
    model = load_model(model_path, dtype=jnp.float32)
    p = tmp_path / "empty.gguf"
    w = GGUFWriter(str(p), "llama")
    w.add_kv("adapter.type", "lora")
    w.write()
    with pytest.raises(ValueError, match="no LoRA tensors"):
        apply_lora(model.params, model.config, str(p))


def test_control_vector_shifts_hidden(model_path):
    model = load_model(model_path, dtype=jnp.float32)
    base = _fwd_logits(model, [3, 5, 7])
    cv = np.zeros((2, 64), np.float32)
    cv[:, 0] = 0.5
    model.params = apply_control_vector(model.params, model.config, cv)
    shifted = _fwd_logits(model, [3, 5, 7])
    assert np.abs(shifted - base).max() > 1e-4


def test_embedder_pooling(model_path):
    model = load_model(model_path, dtype=jnp.float32)
    emb = Embedder(model, max_seq=64, pooling="mean")
    vecs = emb.embed_tokens([[1, 2, 3], [4, 5, 6, 7]])
    assert vecs.shape == (2, 64)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, rtol=1e-5)
    # identical inputs -> identical embedding; different inputs differ
    v2 = emb.embed_tokens([[1, 2, 3]])
    np.testing.assert_allclose(v2[0], vecs[0], rtol=1e-5)
    assert np.abs(vecs[0] - vecs[1]).max() > 1e-4


def test_bench_matrix_tool(model_path, capsys):
    from sparkinfer_tpu.tools.bench_matrix import main

    rc = main(["-m", model_path, "-pp", "32", "-tg", "4", "-r", "1",
               "-c", "64", "-ctk", "f32", "-o", "json"])
    assert rc == 0
    import json

    out = json.loads(capsys.readouterr().out)
    assert len(out["results"]) == 2
    assert all(r["t/s"] > 0 for r in out["results"])


def test_retrieval_chunking_and_topk(model_path, tmp_path):
    """examples/retrieval analogue: chunking semantics + self-retrieval
    (a chunk's own text must be its best cosine match)."""
    from sparkinfer_tpu.models.loader import load_model
    from sparkinfer_tpu.tools.retrieval import Retriever, chunk_text

    chunks = chunk_text("aa bb. cc dd. ee ff. gg hh.", chunk_size=10, separator=".")
    assert len(chunks) >= 2
    assert all(len(c) > 0 for c in chunks)
    assert "".join(c.replace(" ", "") for c in chunks).replace(".", "") == \
        "aabbccddeeffgghh"

    vp = tmp_path / "tv.gguf"
    make_tiny_llama(vp, n_vocab=300, with_vocab=True)
    model = load_model(str(vp), dtype=jnp.float32)
    r = Retriever(model)
    docs = ["the cat sat on the mat", "stock markets fell today",
            "jax compiles to XLA"]
    r.add(docs)
    for d in docs:
        hits = r.query(d, top_k=1)
        assert hits[0][1] == d and hits[0][0] > 0.99  # self-match, cos≈1
