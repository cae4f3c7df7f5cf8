"""Pipeline parallelism over the `pp` mesh axis (GPipe microbatching via
ppermute): exact logit + KV-cache parity with the single-device forward
on the virtual 8-device CPU mesh, for both 1 and multiple microbatches.
Ref: ggml-backend.cpp:692 pipeline-parallel scheduling."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

if len(jax.devices()) < 4:
    pytest.skip("needs the 8-device virtual CPU mesh", allow_module_level=True)

import jax.numpy as jnp
from jax.sharding import Mesh

from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.models.transformer import make_forward
from sparkinfer_tpu.parallel.pp import make_pp_forward, place_params
from sparkinfer_tpu.runtime.kv_cache import init_cache

from model_fixtures import make_tiny_llama

STAGES = 4


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = tmp_path_factory.mktemp("pp") / "tiny.gguf"
    make_tiny_llama(p, n_layer=4)
    return load_model(str(p), dtype=jnp.float32)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:STAGES]), ("pp",))


@pytest.mark.parametrize("n_micro,batch", [(1, 1), (2, 2), (4, 1)])
def test_pp_matches_single_device(model, mesh, n_micro, batch):
    cfg = model.config
    MB = n_micro * batch
    rng = np.random.default_rng(0)
    T = 6
    toks = rng.integers(0, cfg.n_vocab, (MB, T)).astype(np.int32)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (MB, T))

    ref_fwd = jax.jit(make_forward(cfg))
    want, want_cache = ref_fwd(model.params, jnp.asarray(toks), pos,
                               init_cache(cfg, MB, 16, jnp.float32))

    with mesh:
        params = place_params(mesh, model.params)
        pp_fwd = jax.jit(make_pp_forward(cfg, mesh, n_micro=n_micro))
        got, got_cache = pp_fwd(params, jnp.asarray(toks), pos,
                                init_cache(cfg, MB, 16, jnp.float32))

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_cache.k), np.asarray(want_cache.k),
                               rtol=2e-5, atol=2e-5)


def test_pp_decode_continues_from_cache(model, mesh):
    """Prefill then single-token decode steps through the pipeline must
    track the single-device engine exactly."""
    cfg = model.config
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, cfg.n_vocab, (1, 5)).astype(np.int32)

    ref_fwd = jax.jit(make_forward(cfg))
    cache_r = init_cache(cfg, 1, 16, jnp.float32)
    pos = jnp.arange(5, dtype=jnp.int32)[None]
    lr, cache_r = ref_fwd(model.params, jnp.asarray(prompt), pos, cache_r)

    with mesh:
        params = place_params(mesh, model.params)
        pp_fwd = jax.jit(make_pp_forward(cfg, mesh, n_micro=1))
        cache_p = init_cache(cfg, 1, 16, jnp.float32)
        lp_, cache_p = pp_fwd(params, jnp.asarray(prompt), pos, cache_p)
        np.testing.assert_allclose(np.asarray(lp_), np.asarray(lr),
                                   rtol=2e-5, atol=2e-5)
        tok = int(np.argmax(np.asarray(lr)[0, -1]))
        for t in range(5, 8):
            tk = jnp.asarray([[tok]], jnp.int32)
            ps = jnp.full((1, 1), t, jnp.int32)
            lr, cache_r = ref_fwd(model.params, tk, ps, cache_r)
            lp_, cache_p = pp_fwd(params, tk, ps, cache_p)
            np.testing.assert_allclose(np.asarray(lp_), np.asarray(lr),
                                       rtol=2e-5, atol=2e-5)
            tok = int(np.argmax(np.asarray(lr)[0, -1]))
