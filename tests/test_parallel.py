"""Sharding: dense forward over a (dp, tp) mesh on the virtual 8-CPU mesh
must match the single-device result (GSPMD-inserted collectives are exact)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.models.transformer import make_forward
from sparkinfer_tpu.parallel.mesh import data_sharding, make_mesh, shard_cache, shard_params
from sparkinfer_tpu.runtime.kv_cache import init_cache

from model_fixtures import make_tiny_llama


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny.gguf"
    # n_ff=128 so tp=2/4 divides; n_head=4, n_head_kv=2
    make_tiny_llama(path, n_ff=128, n_head=4, n_head_kv=2)
    return load_model(str(path), dtype=jnp.float32)


def _run(model, mesh=None, batch=2):
    cfg = model.config
    fwd = jax.jit(make_forward(cfg))
    rng = np.random.default_rng(0)
    T = 6
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (batch, T)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (batch, T))
    cache = init_cache(cfg, batch, 16, jnp.float32)
    params = model.params
    if mesh is not None:
        params = shard_params(mesh, cfg, params)
        cache = shard_cache(mesh, cache)
        toks = jax.device_put(toks, data_sharding(mesh, batch))
        pos = jax.device_put(pos, data_sharding(mesh, batch))
        with mesh:
            logits, _ = fwd(params, toks, pos, cache)
    else:
        logits, _ = fwd(params, toks, pos, cache)
    return np.asarray(logits)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("dp,tp", [(1, 2), (2, 1), (2, 2), (2, 4), (8, 1)])
def test_sharded_matches_single_device(tiny, dp, tp):
    ref = _run(tiny)
    got = _run(tiny, make_mesh(dp=dp, tp=tp))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_graft_entry_single():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    logits, cache = jax.jit(fn)(*args)
    assert logits.shape[0] == 1


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_graft_entry_multichip():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry2", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


@pytest.fixture(scope="module")
def tiny_moe(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny_moe.gguf"
    # 4 experts so ep=2/4 divides the expert dim
    make_tiny_llama(path, n_ff=64, n_head=4, n_head_kv=2, n_expert=4,
                    n_expert_used=2)
    return load_model(str(path), dtype=jnp.float32)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("dp,tp,ep", [(1, 1, 4), (2, 1, 2), (1, 2, 2)])
def test_expert_parallel_matches_single_device(tiny_moe, dp, tp, ep):
    ref = _run(tiny_moe)
    got = _run(tiny_moe, make_mesh(dp=dp, tp=tp, ep=ep))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)
