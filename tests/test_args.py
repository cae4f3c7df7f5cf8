"""Declarative arg table (sparkinfer_tpu/common/args.py — the analogue of
the reference's common/arg.cpp table): scope filtering, env-var mirrors
(env provides default, CLI wins), shared sampler/grammar/adapter helpers,
and the CLI wiring they feed (grammar-constrained generation, LoRA /
control-vector apply, server --api-key auth)."""

import json
import urllib.error
import urllib.request

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sparkinfer_tpu.common.args import (
    adapters_from_args,
    build_parser,
    grammar_from_args,
    sampler_from_args,
)

from model_fixtures import make_tiny_llama


def test_scope_filtering():
    cli = build_parser("cli", prog="t")
    srv = build_parser("server", prog="t")
    # server-only flags absent from cli and vice versa
    with pytest.raises(SystemExit):
        cli.parse_args(["--port", "1"])
    args = srv.parse_args(["--port", "1", "-m", "x"])
    assert args.port == 1
    with pytest.raises(SystemExit):
        srv.parse_args(["-p", "hi"])  # --prompt is cli-scoped
    a = cli.parse_args(["-p", "hi"])
    assert a.prompt == "hi"


def test_env_mirror_default_and_cli_override(monkeypatch):
    monkeypatch.setenv("SPARK_ARG_CTX_SIZE", "4096")
    ap = build_parser("cli", prog="t")
    assert ap.parse_args([]).ctx_size == 4096  # env provides the default
    assert ap.parse_args(["-c", "128"]).ctx_size == 128  # CLI wins
    monkeypatch.setenv("SPIF_MS", "/tmp/split.gguf")
    ap2 = build_parser("cli", prog="t")
    assert ap2.parse_args([]).split == "/tmp/split.gguf"
    monkeypatch.setenv("SPARK_ARG_KV_ISWA", "1")
    ap3 = build_parser("cli", prog="t")
    assert ap3.parse_args([]).kv_iswa is True
    monkeypatch.setenv("SPARK_ARG_KV_ISWA", "0")
    ap4 = build_parser("cli", prog="t")
    assert ap4.parse_args([]).kv_iswa is False


def test_sampler_from_args_full_chain():
    ap = build_parser("cli", prog="t")
    a = ap.parse_args([
        "--temp", "0.5", "--top-k", "7", "--typical", "0.9",
        "--repeat-last-n", "32", "--frequency-penalty", "0.3",
        "--presence-penalty", "0.2", "--mirostat", "2",
        "--mirostat-ent", "4.0", "--mirostat-lr", "0.2",
        "--xtc-probability", "0.1", "-s", "9",
    ])
    s = sampler_from_args(a)
    assert (s.temp, s.top_k, s.typical_p) == (0.5, 7, 0.9)
    assert (s.penalty_last_n, s.penalty_freq, s.penalty_present) == (32, 0.3, 0.2)
    assert (s.mirostat, s.mirostat_tau, s.mirostat_eta) == (2, 4.0, 0.2)
    assert s.xtc_probability == 0.1 and s.seed == 9


def test_grammar_from_args(tmp_path):
    ap = build_parser("cli", prog="t")
    src = 'root ::= "yes" | "no"'
    assert grammar_from_args(ap.parse_args(["--grammar", src])) == src
    f = tmp_path / "g.gbnf"
    f.write_text(src)
    assert grammar_from_args(ap.parse_args(["--grammar-file", str(f)])) == src
    g = grammar_from_args(ap.parse_args(
        ["-j", json.dumps({"type": "object",
                           "properties": {"a": {"type": "integer"}},
                           "required": ["a"]})]))
    assert "root" in g  # converted GBNF
    assert grammar_from_args(ap.parse_args([])) is None


def test_adapters_from_args():
    ap = build_parser("cli", prog="t")
    a = ap.parse_args(["--lora", "x.gguf", "--lora-scaled", "y.gguf", "0.5"])
    assert adapters_from_args(a) == [("x.gguf", 1.0), ("y.gguf", 0.5)]


def test_cli_grammar_generation(tmp_path, capsys):
    """--grammar routes through the 1-slot Scheduler's on-device masking
    path and emits only grammar-legal text."""
    from sparkinfer_tpu.tools import cli

    p = tmp_path / "t.gguf"
    make_tiny_llama(p, n_vocab=300, with_vocab=True)
    rc = cli.main(["-m", str(p), "-p", "q", "-n", "8", "--temp", "0",
                   "-c", "32", "-ctk", "f32",
                   "--grammar", 'root ::= [a-z]*'])
    assert rc == 0


def test_cli_control_vector_apply(tmp_path):
    """--control-vector-scaled loads direction.* tensors and biases the
    residual stream (cvec lands in params['layers'])."""
    from sparkinfer_tpu.gguf.constants import GGMLType
    from sparkinfer_tpu.gguf.writer import GGUFWriter
    from sparkinfer_tpu.models.loader import load_model
    from sparkinfer_tpu.tools.cli import apply_adapters, build_parser

    p = tmp_path / "t.gguf"
    make_tiny_llama(p)
    model = load_model(str(p), dtype=jnp.float32)
    cvp = tmp_path / "cv.gguf"
    w = GGUFWriter(str(cvp), "controlvector")
    w.add_kv("general.type", "control_vector")
    rng = np.random.default_rng(0)
    for l in range(model.config.n_layer):
        w.add_tensor(f"direction.{l}",
                     rng.normal(size=model.config.n_embd).astype(np.float32),
                     GGMLType.F32)
    w.write()
    args = build_parser().parse_args(
        ["-m", str(p), "--control-vector-scaled", str(cvp), "0.25"])
    apply_adapters(args, model)
    assert "cvec" in model.params["layers"]
    assert model.params["layers"]["cvec"].shape == (
        model.config.n_layer, model.config.n_embd)


def test_server_api_key(tmp_path):
    """--api-key: 401 without bearer, 200 with; /health stays open."""
    from sparkinfer_tpu.models.loader import load_model
    from sparkinfer_tpu.runtime.sampling import SamplerConfig
    from sparkinfer_tpu.server import ServerConfig, SparkServer

    p = tmp_path / "t.gguf"
    make_tiny_llama(p, n_vocab=300, with_vocab=True)
    model = load_model(str(p), dtype=jnp.float32)
    srv = SparkServer(model,
                      ServerConfig(port=0, n_slots=1, max_seq=64,
                                   kv_dtype="f32", api_key="sk-test"),
                      sampler=SamplerConfig(temp=0.0))
    srv.serve(block=False)
    try:
        base = f"http://127.0.0.1:{srv.port}"
        with urllib.request.urlopen(base + "/health", timeout=30) as r:
            assert r.status == 200  # open path
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(base + "/props", timeout=30)
        assert ei.value.code == 401
        req = urllib.request.Request(
            base + "/props", headers={"Authorization": "Bearer sk-test"})
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.status == 200
    finally:
        srv.shutdown()


def test_server_main_parser_sparse_flags(monkeypatch):
    """The server entry point exposes the SparkInfer surface via the table."""
    ap = build_parser("server", prog="t")
    a = ap.parse_args(["-m", "x", "--spif-ms", "s.gguf", "-vb", "2.5",
                       "--cold-mode", "drop", "--api-key", "k",
                       "--models", "small=tiny.gguf"])
    assert a.split == "s.gguf" and a.hbm_budget == 2.5
    assert a.cold_mode == "drop" and a.models == ["small=tiny.gguf"]
