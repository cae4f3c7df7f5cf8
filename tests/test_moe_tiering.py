"""Expert hot/cold tiering for MoE — the analogue of the reference's
used-expert-only weight handling (-cmoe, ggml-backend.cpp:1604-1688),
re-designed as group tiering at expert-row granularity: the existing
init_tiered/Balancer machinery drives whole-expert HBM swaps off the
routed-frequency DFR.

Covers: exactness vs the dense MoE when the hot set covers all routed
experts, host-complement exactness with a partial hot set, drop-mode
zeroing, and end-to-end balancer convergence onto a skewed router."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sparkinfer_tpu.models.config import ModelConfig
from sparkinfer_tpu.models.transformer import make_forward
from sparkinfer_tpu.runtime.kv_cache import init_cache
from sparkinfer_tpu.sparse import SparseConfig
from sparkinfer_tpu.sparse.balancer import Balancer
from sparkinfer_tpu.sparse.moe import (
    MoEColdStore,
    make_moe_ffn,
    make_tiered_moe_ffn,
    moe_rows_layout,
)
from sparkinfer_tpu.sparse.tiering import init_tiered, tiered_layer_params

X, K, G = 4, 2, 16
E, FE, L, V = 32, 32, 2, 120


@pytest.fixture(scope="module")
def moe_model():
    rng = np.random.default_rng(0)

    def w(*s, scale=0.2):
        return jnp.asarray(rng.standard_normal(s) * scale, jnp.float32)

    cfg = ModelConfig(arch="mixtral", n_layer=L, n_embd=E, n_head=4,
                      n_head_kv=2, n_ff=FE, n_vocab=V, head_dim=8,
                      n_expert=X, n_expert_used=K)
    layers = {
        "attn_norm_w": jnp.ones((L, E), jnp.float32),
        "ffn_norm_w": jnp.ones((L, E), jnp.float32),
        "wq": w(L, E, 32), "wk": w(L, E, 16), "wv": w(L, E, 16),
        "wo": w(L, 32, E),
        # router skewed: experts 1 and 3 dominate
        "w_router": jnp.asarray(
            np.tile(np.array([[-2.0, 1.5, -2.0, 1.0]]), (L, E, 1))
            + rng.standard_normal((L, E, X)) * 0.3, jnp.float32),
        "w_up_exps": w(L, X, E, FE),
        "w_gate_exps": w(L, X, E, FE),
        "w_down_exps": w(L, X, FE, E),
    }
    params = {
        "tok_embd": w(V, E),
        "output_norm_w": jnp.ones((E,), jnp.float32),
        "output": w(E, V),
        "layers": layers,
    }
    return cfg, params


def _mk_tiered(cfg, params, hot_groups, mode, init_hot=None):
    scfg = SparseConfig(group_size=G)
    layers = moe_rows_layout(params["layers"], cfg, G)
    tp, st = init_tiered(cfg, scfg, layers, hot_groups, init_hot=init_hot)
    cold = MoEColdStore(cfg, scfg,
                        {k: np.asarray(v) for k, v in layers.items()
                         if k.endswith("_rows")}, dtype=np.float32)
    ffn = make_tiered_moe_ffn(cfg, scfg, cold, mode=mode)
    p2 = dict(params)
    p2["layers"], p2["sparse_flat"] = tiered_layer_params(layers, tp)
    fwd = jax.jit(make_forward(cfg, ffn_fn=ffn, stateful_ffn=True))
    return fwd, p2, tp, st, cold, scfg


def _dense_logits(cfg, params, toks):
    fwd = jax.jit(make_forward(cfg, ffn_fn=make_moe_ffn(cfg, mode="dense")))
    cache = init_cache(cfg, 1, 16, jnp.float32)
    pos = jnp.arange(len(toks), dtype=jnp.int32)[None]
    lg, _ = fwd(params, jnp.asarray(toks)[None], pos, cache)
    return np.asarray(lg)


def test_all_hot_exact(moe_model):
    """Hot set covering every expert == dense MoE, bit-for-bit-ish."""
    cfg, params = moe_model
    ng = X * (FE // G)
    toks = np.arange(5, dtype=np.int32) * 7 % V
    want = _dense_logits(cfg, params, toks)
    fwd, p2, tp, st, _, _ = _mk_tiered(cfg, params, ng, "drop")
    cache = init_cache(cfg, 1, 16, jnp.float32)
    pos = jnp.arange(5, dtype=jnp.int32)[None]
    got, _, st2 = fwd(p2, jnp.asarray(toks)[None], pos, cache, st)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
    assert float(np.asarray(st2.miss).sum()) == 0.0


def test_host_mode_exact_partial_hot(moe_model):
    """Cold experts computed on host must recover dense exactly."""
    cfg, params = moe_model
    ng_e = FE // G
    # hot set = only expert 0's groups (the router rarely picks it)
    init_hot = np.tile(np.arange(ng_e, dtype=np.int32), (L, 1))
    toks = np.arange(5, dtype=np.int32) * 11 % V
    want = _dense_logits(cfg, params, toks)
    fwd, p2, tp, st, _, _ = _mk_tiered(cfg, params, ng_e, "host",
                                       init_hot=init_hot)
    cache = init_cache(cfg, 1, 16, jnp.float32)
    pos = jnp.arange(5, dtype=jnp.int32)[None]
    got, _, st2 = fwd(p2, jnp.asarray(toks)[None], pos, cache, st)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
    assert float(np.asarray(st2.miss).sum()) > 0  # cold experts were routed


def test_balancer_converges_to_routed_experts(moe_model):
    """Drop-mode decode with rebalancing: misses vanish once the balancer
    swaps the routed (skewed) experts hot."""
    cfg, params = moe_model
    ng_e = FE // G
    # start hot = expert 0 only; router prefers experts 1 and 3
    init_hot = np.tile(np.arange(ng_e, dtype=np.int32), (L, 1))
    fwd, p2, tp, st, cold, scfg = _mk_tiered(
        cfg, params, 2 * ng_e, "drop",
        init_hot=np.tile(np.arange(2 * ng_e, dtype=np.int32), (L, 1)))
    bal = Balancer(cold=cold, scfg=scfg, window=8)
    layers = moe_rows_layout(params["layers"], cfg, G)
    cache = init_cache(cfg, 1, 32, jnp.float32)
    miss_t = []
    prev = 0.0
    for t in range(8):
        tok = jnp.asarray([[int(t * 13 % V)]], jnp.int32)
        pos = jnp.full((1, 1), t, jnp.int32)
        _, cache, st = fwd(p2, tok, pos, cache, st)
        cur = float(np.asarray(st.miss).sum())
        miss_t.append(cur - prev)
        prev = cur
        tp = bal.rebalance(tp, np.asarray(st.dfr))
        p2["layers"], p2["sparse_flat"] = tiered_layer_params(layers, tp)
    assert miss_t[-1] == 0.0, miss_t
    assert bal.total_swaps > 0
