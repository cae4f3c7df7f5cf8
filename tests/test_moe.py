"""MoE FFN: router semantics, dense path vs numpy oracle, fused-kernel path
vs dense (used-expert-only reads), end-to-end MoE model generation."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.models.transformer import make_forward
from sparkinfer_tpu.runtime.kv_cache import init_cache
from sparkinfer_tpu.sparse.moe import make_moe_ffn, moe_layout, route

from model_fixtures import make_tiny_llama

X, K = 4, 2  # experts, used


@pytest.fixture(scope="module")
def moe_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny-moe.gguf"
    tensors = make_tiny_llama(path, n_expert=X, n_expert_used=K, n_ff=64, seed=7)
    model = load_model(str(path), dtype=jnp.float32)
    return model, tensors


def test_moe_config_and_tensors(moe_model):
    model, _ = moe_model
    cfg = model.config
    assert cfg.n_expert == X and cfg.n_expert_used == K
    lay = model.params["layers"]
    assert lay["w_router"].shape == (2, 64, X)
    assert lay["w_up_exps"].shape == (2, X, 64, 64)
    assert lay["w_down_exps"].shape == (2, X, 64, 64)


def test_moe_dense_matches_numpy(moe_model):
    model, tensors = moe_model
    cfg = model.config
    lp = jax.tree.map(lambda a: a[0], model.params["layers"])
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 64)).astype(np.float32)
    got = np.asarray(make_moe_ffn(cfg, mode="dense")(lp, jnp.asarray(x)))[0]

    # numpy oracle
    xt = x[0].astype(np.float64)
    router = tensors["blk.0.ffn_gate_inp.weight"].astype(np.float64)  # (X, E)
    logits = xt @ router.T
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    want = np.zeros_like(xt)
    for n in range(xt.shape[0]):
        topk = np.argsort(-probs[n])[:K]
        wsum = probs[n, topk].sum()
        for ei in topk:
            up = xt[n] @ tensors["blk.0.ffn_up_exps.weight"][ei].T.astype(np.float64)
            gate = xt[n] @ tensors["blk.0.ffn_gate_exps.weight"][ei].T.astype(np.float64)
            hidden = gate / (1 + np.exp(-gate)) * up
            want[n] += (probs[n, ei] / wsum) * (
                hidden @ tensors["blk.0.ffn_down_exps.weight"][ei].T.astype(np.float64)
            )
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_moe_pallas_matches_dense(moe_model):
    model, _ = moe_model
    cfg = model.config
    lp = jax.tree.map(lambda a: a[0], model.params["layers"])
    lp = moe_layout(lp, cfg, group_size=16)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 2, 64)).astype(np.float32))
    dense = make_moe_ffn(cfg, mode="dense")(lp, x)
    pallas = make_moe_ffn(cfg, group_size=16, mode="pallas")(lp, x)
    np.testing.assert_allclose(np.asarray(pallas), np.asarray(dense),
                               rtol=1e-4, atol=1e-4)


def test_route_topk_normalized(moe_model):
    model, _ = moe_model
    cfg = model.config
    lp = jax.tree.map(lambda a: a[0], model.params["layers"])
    rng = np.random.default_rng(2)
    xt = jnp.asarray(rng.standard_normal((5, 64)).astype(np.float32))
    idx, w = route(cfg, lp, xt)
    assert idx.shape == (5, K) and w.shape == (5, K)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, rtol=1e-5)
    assert (np.asarray(idx) < X).all()


def test_moe_end_to_end_generation(moe_model):
    from sparkinfer_tpu.runtime.engine import Engine
    from sparkinfer_tpu.runtime.sampling import SamplerConfig

    model, _ = moe_model
    eng = Engine(model, max_seq=32, sampler=SamplerConfig(temp=0.0),
                 kv_dtype=jnp.float32)
    out = eng.generate([3, 5, 7], max_new_tokens=5)
    assert len(out) == 5
    out2 = eng.generate([3, 5, 7], max_new_tokens=5)
    assert out == out2


def test_moe_pallas_matches_dense_with_biases(moe_model):
    """gpt-oss-style per-expert biases + clamped swiglu through the fused
    kernel (bu/bg ride as pre-gathered row stores, down bias mixed outside;
    ref ggml_swiglu_oai + mmq bias adds)."""
    import dataclasses

    model, _ = moe_model
    cfg = dataclasses.replace(model.config, arch="gpt-oss")
    assert cfg.traits.act == "swiglu_oai"
    lp = jax.tree.map(lambda a: a[0], model.params["layers"])
    rng = np.random.default_rng(3)
    F, E = 64, 64
    lp = dict(lp)
    lp["w_up_exps_b"] = jnp.asarray(rng.standard_normal((X, F)) * 0.1, jnp.float32)
    lp["w_gate_exps_b"] = jnp.asarray(rng.standard_normal((X, F)) * 0.1, jnp.float32)
    lp["w_down_exps_b"] = jnp.asarray(rng.standard_normal((X, E)) * 0.1, jnp.float32)
    lp = moe_layout(lp, cfg, group_size=16)
    x = jnp.asarray(rng.standard_normal((2, 2, E)).astype(np.float32))
    dense = make_moe_ffn(cfg, mode="dense")(lp, x)
    pallas = make_moe_ffn(cfg, group_size=16, mode="pallas")(lp, x)
    np.testing.assert_allclose(np.asarray(pallas), np.asarray(dense),
                               rtol=1e-4, atol=1e-4)


def test_engine_moe_mode_pallas_matches_dense(moe_model, tmp_path):
    """Engine(moe_mode='pallas') must emit the same greedy tokens as the
    dense-gather MoE path (the row stores replace the stacked exps)."""
    from sparkinfer_tpu.runtime.engine import Engine
    from sparkinfer_tpu.runtime.sampling import SamplerConfig

    path = str(tmp_path / "tiny-moe2.gguf")
    make_tiny_llama(path, n_expert=X, n_expert_used=K, n_ff=64, seed=7)
    a = Engine(load_model(path, dtype=jnp.float32), max_seq=64,
               sampler=SamplerConfig(temp=0.0), kv_dtype=jnp.float32)
    b = Engine(load_model(path, dtype=jnp.float32), max_seq=64,
               sampler=SamplerConfig(temp=0.0), kv_dtype=jnp.float32,
               moe_mode="pallas")
    assert "w_up_exps" not in b.model.params["layers"]  # rows replaced exps
    assert "moe_up_rows" in b.model.params["layers"]
    ta = a.generate([5, 9, 42], max_new_tokens=12)
    tb = b.generate([5, 9, 42], max_new_tokens=12)
    assert ta == tb
