"""CLI tools: sparkinfer-cli generate + bench mode, perplexity evaluator."""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.tools.cli import main as cli_main
from sparkinfer_tpu.tools.perplexity import compute_ppl

from model_fixtures import make_tiny_llama


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny-vocab.gguf"
    make_tiny_llama(path, n_vocab=300, with_vocab=True)
    return str(path)


def test_cli_generate(model_path, capsys):
    rc = cli_main(["-m", model_path, "-p", "hello world", "-n", "4",
                   "--temp", "0", "-c", "64", "-ctk", "f32"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith("hello world")


def test_cli_bench_mode(model_path, tmp_path, capsys):
    pf = tmp_path / "prompts.txt"
    pf.write_text("hello world\nthe hello\n")
    rc = cli_main(["-m", model_path, "-f", str(pf), "-nps", "2", "-n", "4",
                   "--temp", "0", "-c", "64", "--json", "-ctk", "f32"])
    assert rc == 0
    rows = json.loads(capsys.readouterr().out)
    assert len(rows) == 2
    assert all(r["decode_tokens"] >= 1 for r in rows)


def test_cli_missing_prompt(model_path):
    rc = cli_main(["-m", model_path])
    assert rc == 1


def test_perplexity_basic(model_path):
    model = load_model(model_path, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, model.config.n_vocab, 80).astype(np.int32)
    out = compute_ppl(model, ids, ctx=32)
    assert out["n_tokens"] > 0
    assert out["ppl"] > 1.0
    # random tokens under a random model: ppl near vocab size magnitude
    assert out["ppl"] < 10 * model.config.n_vocab


def test_quantize_tool_roundtrip(model_path, tmp_path):
    """GGUF->GGUF q8_0 requantize; quantized model loads + generates."""
    from sparkinfer_tpu.gguf.constants import GGMLType
    from sparkinfer_tpu.gguf.reader import GGUFReader
    from sparkinfer_tpu.tools.quantize import quantize_file

    dst = tmp_path / "tiny-q8.gguf"
    stats = quantize_file(model_path, str(dst), GGMLType.Q8_0)
    assert stats["bytes_out"] < stats["bytes_in"]
    r = GGUFReader(str(dst))
    assert r.tensors["blk.0.ffn_up.weight"].ggml_type == GGMLType.Q8_0
    assert r.tensors["blk.0.attn_norm.weight"].ggml_type == GGMLType.F32
    assert r.kv["tokenizer.ggml.model"] == "llama"
    r.close()

    m = load_model(str(dst), dtype=jnp.float32, keep_quantized=True)
    from sparkinfer_tpu.runtime.engine import Engine
    from sparkinfer_tpu.runtime.sampling import SamplerConfig

    eng = Engine(m, max_seq=64, sampler=SamplerConfig(temp=0.0), kv_dtype=jnp.float32)
    out = eng.generate([5, 9, 42], max_new_tokens=4)
    assert len(out) == 4


def test_quantize_q4_keeps_head_q8(model_path, tmp_path):
    from sparkinfer_tpu.gguf.constants import GGMLType
    from sparkinfer_tpu.gguf.reader import GGUFReader
    from sparkinfer_tpu.tools.quantize import quantize_file

    dst = tmp_path / "tiny-q4.gguf"
    quantize_file(model_path, str(dst), GGMLType.Q4_0)
    r = GGUFReader(str(dst))
    assert r.tensors["blk.0.ffn_up.weight"].ggml_type == GGMLType.Q4_0
    assert r.tensors["output.weight"].ggml_type == GGMLType.Q8_0
    r.close()


def test_gguf_split_merge_roundtrip(model_path, tmp_path):
    from sparkinfer_tpu.gguf.reader import GGUFReader
    from sparkinfer_tpu.tools.gguf_split import merge_files, split_file

    shards = split_file(model_path, str(tmp_path / "m.gguf"), max_tensors=7)
    assert len(shards) > 1
    merged = tmp_path / "merged.gguf"
    n = merge_files(shards[0], str(merged))

    a = GGUFReader(model_path)
    b = GGUFReader(str(merged))
    assert set(a.tensors) == set(b.tensors)
    assert n == len(a.tensors)
    import numpy as np
    for name in list(a.tensors)[:5]:
        np.testing.assert_array_equal(a.tensors[name].raw(), b.tensors[name].raw())
    assert b.kv["tokenizer.ggml.model"] == "llama"
    a.close(); b.close()

    m = load_model(str(merged), dtype=jnp.float32)
    assert m.config.n_layer == 2


def test_imatrix_collection(model_path, tmp_path):
    from sparkinfer_tpu.tools.imatrix import collect_imatrix, read_imatrix, write_imatrix

    model = load_model(model_path, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    batches = [rng.integers(0, model.config.n_vocab, 16) for _ in range(2)]
    data = collect_imatrix(model, batches)
    assert data["n_tokens"] == 32
    assert data["blk.0.ffn_up.weight.imatrix"].shape == (64,)
    assert (data["blk.0.ffn_down.weight.imatrix"] >= 0).all()
    p = tmp_path / "im.gguf"
    write_imatrix(str(p), data, model.config.arch)
    rt = read_imatrix(str(p))
    np.testing.assert_allclose(rt["blk.1.ffn_up.weight.imatrix"],
                               data["blk.1.ffn_up.weight.imatrix"], rtol=1e-6)


def test_tokenize_tool(model_path, capsys):
    from sparkinfer_tpu.tools.tokenize import main as tok_main

    rc = tok_main(["-m", model_path, "-p", "hello world", "--ids"])
    assert rc == 0
    ids = json.loads(capsys.readouterr().out)
    assert isinstance(ids, list) and len(ids) >= 2


def test_hf_repo_resolution(tmp_path, monkeypatch):
    """-hf user/repo[:quant] resolves GGUFs from the local hub cache layout
    (offline analogue of the reference downloader)."""
    from sparkinfer_tpu.tools.hf import resolve_hf_gguf

    snap = tmp_path / "hub" / "models--acme--tiny" / "snapshots" / "abc123"
    snap.mkdir(parents=True)
    (snap / "tiny-Q4_0.gguf").write_bytes(b"x")
    (snap / "tiny-F16.gguf").write_bytes(b"x")
    monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path / "hub"))

    assert resolve_hf_gguf("acme/tiny:Q4_0").endswith("tiny-Q4_0.gguf")
    assert resolve_hf_gguf("acme/tiny:f16").endswith("tiny-F16.gguf")
    assert resolve_hf_gguf("acme/tiny").endswith(".gguf")
    with pytest.raises(FileNotFoundError, match="offline"):
        resolve_hf_gguf("acme/tiny:Q8_0")  # quant not cached
    with pytest.raises(FileNotFoundError, match="offline"):
        resolve_hf_gguf("nobody/nothing")


def test_kl_divergence_self_is_zero(model_path, tmp_path):
    """KL of a model against its own saved base must be ~0 with full
    top-1 agreement (validates the save/load + alignment machinery)."""
    from sparkinfer_tpu.tools.perplexity import compute_kl

    model = load_model(model_path, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, model.config.n_vocab, 80).astype(np.int32)
    base = tmp_path / "base.npz"
    ref = compute_ppl(model, ids, ctx=32, save_logits=str(base))
    out = compute_kl(model, ids, str(base))
    assert out["n_tokens"] == ref["n_tokens"]
    # base logits are stored f16 -> tiny but nonzero KL
    assert 0.0 <= out["kl_mean"] < 1e-2
    assert out["top1_agreement"] == 1.0
    assert abs(out["ppl"] - ref["ppl"]) / ref["ppl"] < 0.05

    # a DIFFERENT token stream must be rejected
    with pytest.raises(ValueError):
        compute_kl(model, ids[:-1], str(base))


def test_hellaswag_winogrande_scoring(model_path):
    """Multiple-choice harness runs end-to-end; a duplicate-ending task
    where one choice IS the argmax continuation sanity-checks scoring."""
    from sparkinfer_tpu.tokenizer import build_tokenizer
    from sparkinfer_tpu.tools.perplexity import (
        hellaswag_score,
        winogrande_score,
    )

    model = load_model(model_path, dtype=jnp.float32)
    tk = build_tokenizer(model.vocab)
    tasks = [
        {"context": "hello world", "endings": ["the hello", "world the",
                                               "hello", "world world"],
         "label": 1},
        {"context": "the world", "endings": ["hello", "world"], "label": 0},
    ]
    out = hellaswag_score(model, tk, tasks)
    assert out["n_tasks"] == 2
    assert 0.0 <= out["accuracy"] <= 1.0

    wtasks = [
        {"sentence": "the _ said hello", "option1": "world",
         "option2": "hello", "answer": "1"},
    ]
    wout = winogrande_score(model, tk, wtasks)
    assert wout["n_tasks"] == 1
    assert wout["accuracy"] in (0.0, 1.0)


def test_perplexity_cli_quality_modes(model_path, tmp_path, capsys):
    """CLI: --save-logits then --kl-divergence, plus --hellaswag."""
    from sparkinfer_tpu.tools.perplexity import main as ppl_main

    corpus = tmp_path / "c.txt"
    corpus.write_text("hello world the hello world hello the world " * 20)
    base = tmp_path / "base.npz"
    rc = ppl_main(["-m", model_path, "-f", str(corpus), "-c", "32",
                   "--save-logits", str(base)])
    assert rc == 0
    capsys.readouterr()
    tasks = tmp_path / "hs.json"
    tasks.write_text(json.dumps([
        {"context": "hello", "endings": ["world", "the"], "label": 0}]))
    rc = ppl_main(["-m", model_path, "-f", str(corpus), "-c", "32",
                   "--kl-divergence", str(base), "--hellaswag", str(tasks)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["kl"]["top1_agreement"] == 1.0
    assert "hellaswag" in out


def test_perplexity_cli_tiered_fetch(tmp_path, capsys):
    """--cold-mode fetch (the headline tier) through the product tool:
    all-hot fetch must reproduce the exact sparse logits (KL ~ 0), and at
    a small hot set the balancer's demand-fetching must not do worse than
    drop mode on the same corpus."""
    from sparkinfer_tpu.tools.perplexity import main as ppl_main

    p = tmp_path / "ps.gguf"
    make_tiny_llama(p, arch="prosparse_llama", pred_rank=8, n_ff=96,
                    n_vocab=300, with_vocab=True)
    corpus = tmp_path / "c.txt"
    corpus.write_text("hello world the hello world hello the world " * 20)
    base = tmp_path / "sparse_base.npz"
    rc = ppl_main(["-m", str(p), "-f", str(corpus), "-c", "32", "--sparse",
                   "--group-size", "16", "--capacity-groups", "6",
                   "--save-logits", str(base)])
    assert rc == 0
    capsys.readouterr()

    # all-hot fetch == exact sparse (no cold groups to miss)
    rc = ppl_main(["-m", str(p), "-f", str(corpus), "-c", "32",
                   "--group-size", "16", "--capacity-groups", "6",
                   "--hot-groups", "6", "--cold-mode", "fetch",
                   "--kl-divergence", str(base)])
    assert rc == 0
    allhot = json.loads(capsys.readouterr().out)["kl"]
    assert allhot["kl_mean"] < 1e-4
    assert allhot["top1_agreement"] == 1.0

    def run(mode):
        rc = ppl_main(["-m", str(p), "-f", str(corpus), "-c", "32",
                       "--group-size", "16", "--capacity-groups", "6",
                       "--hot-groups", "2", "--cold-mode", mode,
                       "--kl-divergence", str(base)])
        assert rc == 0
        return json.loads(capsys.readouterr().out)["kl"]

    drop, fetch = run("drop"), run("fetch")
    assert np.isfinite(fetch["ppl"]) and np.isfinite(drop["ppl"])
    # demand-fetching misses converges toward exact; drop never recovers
    # the cold-active contributions it throws away
    assert fetch["kl_mean"] <= drop["kl_mean"] + 1e-6


def test_perplexity_cli_fetch_rejects_mc(tmp_path):
    """fetch tier is corpus-only: multiple-choice scoring would leak
    stateful hot-set churn across reused contexts."""
    from sparkinfer_tpu.tools.perplexity import main as ppl_main

    p = tmp_path / "ps2.gguf"
    make_tiny_llama(p, arch="prosparse_llama", pred_rank=8, n_ff=96,
                    n_vocab=300, with_vocab=True)
    tasks = tmp_path / "hs.json"
    tasks.write_text(json.dumps(
        [{"context": "hello", "endings": ["world", "the"], "label": 0}]))
    with pytest.raises(SystemExit):
        ppl_main(["-m", str(p), "--hellaswag", str(tasks),
                  "--group-size", "16", "--capacity-groups", "6",
                  "--hot-groups", "2", "--cold-mode", "fetch"])
