"""CLI sparse flag plumbing: -vb budget conversion, --spif-ms split flow,
group-size fallback for non-128-divisible FFN."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sparkinfer_tpu.tools.cli import build_parser, hbm_budget_to_hot_groups, make_engine

from model_fixtures import make_tiny_llama


def test_hbm_budget_conversion():
    class Cfg:
        n_embd = 4096
        n_layer = 32

    # 8 GiB / (3*128*4096*2 B per group) / 32 layers
    hot = hbm_budget_to_hot_groups(8.0, Cfg, 128)
    per_group = 3 * 128 * 4096 * 2
    assert hot == int(8 * (1 << 30) / per_group) // 32
    assert hot >= 1


def test_cli_sparse_engine_with_split(tmp_path):
    """Full -spif-ms flow: profile -> split file -> CLI-built engine."""
    from sparkinfer_tpu.models.loader import load_model
    from sparkinfer_tpu.sparse import SparseConfig
    from sparkinfer_tpu.sparse.split import build_split, profile_firing, write_split

    p = tmp_path / "sp.gguf"
    make_tiny_llama(p, arch="prosparse_llama", pred_rank=8, n_ff=96)
    model = load_model(str(p), dtype=jnp.float32)
    scfg = SparseConfig(group_size=16, capacity_groups=4)
    firing = profile_firing(model, [np.arange(8) % 199], scfg)
    split_path = tmp_path / "split.gguf"
    write_split(str(split_path), build_split(firing, scfg), arch="prosparse_llama")

    args = build_parser().parse_args([
        "-m", str(p), "--spif-ms", str(split_path), "--hot-groups", "2",
        "--group-size", "16", "--capacity-groups", "4", "--temp", "0",
        "-c", "32", "-ctk", "f32",
    ])
    model2 = load_model(str(p), dtype=jnp.float32)
    eng = make_engine(args, model2)
    assert eng.tiered
    out = eng.generate([3, 5, 7], max_new_tokens=4)
    assert len(out) == 4


def test_group_size_fallback_non_divisible(tmp_path):
    """F=96 is not divisible by the default 128: CLI falls back to a
    power-of-two divisor instead of crashing."""
    from sparkinfer_tpu.models.loader import load_model

    p = tmp_path / "sp2.gguf"
    make_tiny_llama(p, arch="prosparse_llama", pred_rank=8, n_ff=96)
    model = load_model(str(p), dtype=jnp.float32)
    args = build_parser().parse_args(["-m", str(p), "--temp", "0", "-c", "32",
                                      "-ctk", "f32"])
    eng = make_engine(args, model)  # group_size default 128 -> fallback
    assert eng.sparse is not None
    assert model.config.n_ff % eng.sparse.group_size == 0
    out = eng.generate([3, 5, 7], max_new_tokens=3)
    assert len(out) == 3


def test_attn_w8a8_flag_loads_and_generates(tmp_path, capsys):
    """--attn-w8a8 re-quantizes attention to row-wise W8A8 at load and
    the CLI generates end-to-end (round-3 13B lever as a product flag)."""
    import sys as _sys

    _sys.path.insert(0, "tests")
    from model_fixtures import make_tiny_llama

    from sparkinfer_tpu.tools.cli import main

    p = tmp_path / "t.gguf"
    make_tiny_llama(p)
    rc = main(["-m", str(p), "-p", "3 4 5", "-n", "4", "--temp", "0",
               "--attn-w8a8"])
    assert rc == 0
    out = capsys.readouterr().out
    assert len(out.split()) >= 4


def test_cold_mode_fetch_engine_e2e(tmp_path):
    """--cold-mode fetch builds a fetch-tier Engine (per-group miss
    tracking, balancer demand-entry) and generates; misses accrue in the
    DFR state."""
    from sparkinfer_tpu.models.loader import load_model
    from sparkinfer_tpu.runtime.sampling import SamplerConfig

    p = tmp_path / "cf.gguf"
    make_tiny_llama(p, arch="prosparse_llama", pred_rank=8, n_ff=96)
    ap = build_parser()
    args = ap.parse_args(["-m", str(p), "-p", "x", "--temp", "0",
                          "--cold-mode", "fetch", "--hot-groups", "2",
                          "--capacity-groups", "4", "--group-size", "16",
                          "-c", "48"])
    assert args.cold_mode == "fetch"
    model = load_model(str(p), dtype=jnp.float32)
    eng = make_engine(args, model)
    out = eng.generate([7, 30, 99], max_new_tokens=6)
    assert len(out) == 6
    assert eng._fstate is not None and eng._fstate.miss_g is not None
