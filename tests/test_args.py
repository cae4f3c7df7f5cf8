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


# --- round-4 flag-surface additions (VERDICT r3 item 9) ---------------------

def test_rope_yarn_override_flags_apply_to_config():
    ap = build_parser("cli", prog="t")
    a = ap.parse_args([
        "-m", "x", "--rope-scaling", "yarn", "--rope-freq-base", "1e6",
        "--rope-scale", "4", "--yarn-orig-ctx", "0",
        "--yarn-attn-factor", "1.3", "--yarn-beta-fast", "24",
        "--yarn-beta-slow", "2", "--yarn-ext-factor", "0.5",
    ])

    class M:
        pass

    from sparkinfer_tpu.common.args import apply_model_overrides
    from sparkinfer_tpu.models.config import ModelConfig

    m = M()
    m.config = ModelConfig(arch="llama", n_layer=1, n_embd=8, n_head=2,
                           n_head_kv=2, n_ff=16, n_vocab=10, head_dim=4,
                           n_ctx_train=4096)
    apply_model_overrides(a, m)
    cfg = m.config
    assert cfg.rope_scaling_type == "yarn"
    assert cfg.rope_freq_base == 1e6
    assert cfg.rope_scale == 0.25  # --rope-scale N -> freq_scale 1/N
    assert cfg.rope_orig_ctx == 4096  # 0 -> n_ctx_train
    assert cfg.yarn_attn_factor == 1.3
    assert cfg.yarn_beta_fast == 24 and cfg.yarn_beta_slow == 2
    assert cfg.yarn_ext_factor == 0.5
    # the override changes the rope table the forward actually uses
    from sparkinfer_tpu.models.transformer import rope_params

    rp = rope_params(cfg)
    assert rp.freq_base == 1e6 and rp.yarn_ext_factor == 0.5
    assert rp.yarn_attn_factor == 1.3


def test_ctv_separate_v_dtype():
    import jax.numpy as jnp

    from sparkinfer_tpu.common.args import kv_dtypes_from_args

    ap = build_parser("cli", prog="t")
    a = ap.parse_args(["-m", "x", "-ctk", "f32", "-ctv", "bf16"])
    k, v, q = kv_dtypes_from_args(a)
    assert k == jnp.float32 and v == jnp.bfloat16 and not q
    # default: v follows k
    a = ap.parse_args(["-m", "x", "-ctk", "f32"])
    k, v, q = kv_dtypes_from_args(a)
    assert v == jnp.float32
    # mixed float/quantized rejected
    a = ap.parse_args(["-m", "x", "-ctk", "q8", "-ctv", "bf16"])
    with pytest.raises(SystemExit):
        kv_dtypes_from_args(a)


def test_ctv_cache_dtypes_end_to_end(tmp_path):
    import jax.numpy as jnp

    from sparkinfer_tpu.models.loader import load_model
    from sparkinfer_tpu.runtime.engine import Engine

    p = tmp_path / "t.gguf"
    make_tiny_llama(p)
    eng = Engine(load_model(str(p), dtype=jnp.float32), max_seq=32,
                 kv_dtype=jnp.float32, kv_dtype_v=jnp.bfloat16,
                 donate_cache=False)
    c = eng.new_cache()
    assert c.k.dtype == jnp.float32 and c.v.dtype == jnp.bfloat16
    out = eng.generate([3, 5, 7], max_new_tokens=4)
    assert len(out) == 4


def test_server_flag_table_round4():
    ap = build_parser("server", prog="t")
    a = ap.parse_args(["-m", "x", "-to", "30", "-sps", "0.4", "-n", "64",
                       "-ctv", "f32", "-b", "256"])
    assert a.timeout == 30.0 and a.slot_prompt_similarity == 0.4
    assert a.n_predict_default == 64 and a.cache_type_v == "f32"
    assert a.batch_size == 256


def test_slot_similarity_routing(tmp_path):
    """-sps: a request re-using a long prompt prefix lands on the slot that
    cached it, not the first free slot."""
    import jax.numpy as jnp

    from sparkinfer_tpu.models.loader import load_model
    from sparkinfer_tpu.runtime.scheduler import Scheduler

    p = tmp_path / "t.gguf"
    make_tiny_llama(p)
    sched = Scheduler(load_model(str(p), dtype=jnp.float32), n_slots=3,
                      max_seq=48, slot_similarity=0.5)
    prompt = [3, 5, 7, 9, 11, 13]
    sched.slots[2].cached_tokens = list(prompt) + [15]
    # slot 2 idle, caches our prompt entirely -> must be picked
    class R:
        prompt_tokens = prompt
        n_prompt = len(prompt)

    assert sched._pick_slot([0, 1, 2], R()) == 2
    # below threshold -> first free
    sched.slots[2].cached_tokens = [99]
    assert sched._pick_slot([0, 1, 2], R()) == 0
    # disabled -> first free even with a perfect match
    sched.slot_similarity = 0.0
    sched.slots[2].cached_tokens = list(prompt)
    assert sched._pick_slot([0, 1, 2], R()) == 0


def test_keep_flag_in_parser_and_engine(tmp_path):
    import jax.numpy as jnp

    from sparkinfer_tpu.models.loader import load_model
    from sparkinfer_tpu.runtime.engine import Engine
    from sparkinfer_tpu.runtime.sampling import SamplerConfig

    ap = build_parser("cli", prog="t")
    a = ap.parse_args(["-m", "x", "--keep", "2", "--ignore-eos"])
    assert a.keep == 2 and a.ignore_eos

    p = tmp_path / "t.gguf"
    make_tiny_llama(p)
    eng = Engine(load_model(str(p), dtype=jnp.float32), max_seq=16,
                 sampler=SamplerConfig(temp=0.0), donate_cache=False,
                 kv_dtype=jnp.float32)
    # generation runs past max_seq via context shift honoring n_keep=2
    out = eng.generate([3, 5, 7, 9], max_new_tokens=20, n_keep=2)
    assert len(out) == 20
