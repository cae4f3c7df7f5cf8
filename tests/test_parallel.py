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


# ---------------------------------------------------------------------------
# round-3: TP over the FAST path (v6 Pallas flat stores under shard_map)


@pytest.fixture(scope="module")
def sparse_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny-prosparse-tp.gguf"
    make_tiny_llama(path, arch="prosparse_llama", pred_rank=8, n_ff=128,
                    seed=9)
    return load_model(str(path), dtype=jnp.float32)


def _decode_tokens(fwd, params, cfg, stateful=False, fstate=None):
    cache = init_cache(cfg, 1, 16, jnp.float32)
    toks = jnp.asarray([[3, 7, 11, 2]], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    if stateful:
        logits, _, _ = jax.jit(fwd)(params, toks, pos, cache, fstate)
    else:
        logits, _ = jax.jit(fwd)(params, toks, pos, cache)
    return np.asarray(logits)


def test_tp_sparse_fast_path_matches_single_device(sparse_model):
    """The v6 Pallas path under shard_map (group-major sharded flat
    stores, Cl=C exact mode) == the single-device pipelined pallas path."""
    from sparkinfer_tpu.parallel.sparse_tp import (
        make_tp_sparse_ffn,
        shard_tp_flat,
        tp_flat_layout,
    )
    from sparkinfer_tpu.sparse import SparseConfig
    from sparkinfer_tpu.sparse.ffn import (
        make_pipelined_sparse_ffn,
        prepare_pipelined_params,
    )

    model = sparse_model
    cfg = model.config
    scfg = SparseConfig(group_size=16, capacity_groups=4)
    sp = prepare_pipelined_params(dict(model.params), cfg, scfg, layout="v6")

    ffn1, ci1 = make_pipelined_sparse_ffn(cfg, scfg, mode="pallas")
    ref = _decode_tokens(make_forward(cfg, ffn_fn=ffn1, ffn_carry_init=ci1),
                         sp, cfg)

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("tp",))
    sp_tp = dict(sp)
    sp_tp["sparse_flat"] = shard_tp_flat(
        mesh, tp_flat_layout(sp["sparse_flat"], cfg.n_layer))
    ffn2, ci2 = make_tp_sparse_ffn(cfg, scfg, mesh)
    with mesh:
        got = _decode_tokens(
            make_forward(cfg, ffn_fn=ffn2, ffn_carry_init=ci2), sp_tp, cfg)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_tp_tiered_fast_path_matches_single_device(sparse_model):
    """Tiered drop-mode decode with the hot store sharded over tp ==
    the single-device tiered pallas path (same hot set, same misses)."""
    from sparkinfer_tpu.parallel.sparse_tp import (
        make_tp_tiered_ffn,
        shard_tp_flat,
        tp_flat_layout,
    )
    from sparkinfer_tpu.sparse import SparseConfig
    from sparkinfer_tpu.sparse.ffn import sparse_layout
    from sparkinfer_tpu.sparse.tiering import (
        DFRState,
        init_tiered,
        make_tiered_ffn,
        tiered_layer_params,
    )

    model = sparse_model
    cfg = model.config
    scfg = SparseConfig(group_size=16, capacity_groups=4)
    layers = sparse_layout(model.params["layers"], cfg, scfg)
    tp_, st = init_tiered(cfg, scfg, layers, 4)  # 4 hot slots / 8 groups
    lp, flat = tiered_layer_params(layers, tp_)
    params = dict(model.params)
    params["layers"] = lp
    params["sparse_flat"] = flat
    ffn1 = make_tiered_ffn(cfg, scfg, None, mode="drop", kernel="pallas")
    ref = _decode_tokens(make_forward(cfg, ffn_fn=ffn1, stateful_ffn=True),
                         params, cfg, stateful=True, fstate=st)

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), ("tp",))
    params_tp = dict(params)
    params_tp["sparse_flat"] = shard_tp_flat(
        mesh, tp_flat_layout(flat, cfg.n_layer))
    ffn2 = make_tp_tiered_ffn(cfg, scfg, mesh)
    with mesh:
        got = _decode_tokens(
            make_forward(cfg, ffn_fn=ffn2, stateful_ffn=True), params_tp,
            cfg, stateful=True, fstate=st)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_tp_sparse_capacity_factor_bounds_local_stream(sparse_model):
    """With a capacity factor the local stream is bounded (Cl < C) and the
    result still matches wherever no device overflows — here the skew is
    mild so Cl = C//2 stays exact for this input."""
    from sparkinfer_tpu.parallel.sparse_tp import (
        _local_capacity,
        make_tp_sparse_ffn,
        shard_tp_flat,
        tp_flat_layout,
    )
    from sparkinfer_tpu.sparse import SparseConfig
    from sparkinfer_tpu.sparse.ffn import (
        make_pipelined_sparse_ffn,
        prepare_pipelined_params,
    )

    assert _local_capacity(16, 4, 2.0) == 8
    assert _local_capacity(16, 4, None) == 16
    model = sparse_model
    cfg = model.config
    scfg = SparseConfig(group_size=16, capacity_groups=4)
    sp = prepare_pipelined_params(dict(model.params), cfg, scfg, layout="v6")
    ffn1, ci1 = make_pipelined_sparse_ffn(cfg, scfg, mode="pallas")
    ref = _decode_tokens(make_forward(cfg, ffn_fn=ffn1, ffn_carry_init=ci1),
                         sp, cfg)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), ("tp",))
    sp_tp = dict(sp)
    sp_tp["sparse_flat"] = shard_tp_flat(
        mesh, tp_flat_layout(sp["sparse_flat"], cfg.n_layer))
    ffn2, ci2 = make_tp_sparse_ffn(cfg, scfg, mesh, capacity_factor=2.0)
    with mesh:
        got = _decode_tokens(
            make_forward(cfg, ffn_fn=ffn2, ffn_carry_init=ci2), sp_tp, cfg)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_tiered_fetch_balancer_updates_sharded_hot_store(sparse_model):
    """Fetch tier over tp (VERDICT r3 item 7): step -> host rebalance from
    (dfr, miss_g) -> reshard -> step. The tp-path misses must match the
    single-chip fetch path, the balancer must pull missed groups into the
    hot set, and the post-rebalance step must run on the updated shards."""
    from sparkinfer_tpu.parallel.sparse_tp import (
        make_tp_tiered_ffn,
        shard_tp_flat,
        tp_flat_layout,
    )
    from sparkinfer_tpu.sparse import SparseConfig
    from sparkinfer_tpu.sparse.balancer import Balancer
    from sparkinfer_tpu.sparse.ffn import sparse_layout
    from sparkinfer_tpu.sparse.tiering import (
        ColdStore,
        init_tiered,
        make_tiered_ffn,
        tiered_layer_params,
    )

    model = sparse_model
    cfg = model.config
    scfg = SparseConfig(group_size=16, capacity_groups=4)
    layers = sparse_layout(model.params["layers"], cfg, scfg)
    tp_, st = init_tiered(cfg, scfg, layers, 4, track_miss_groups=True)
    cold_np = {k: np.asarray(v) for k, v in layers.items()
               if k.endswith("_rows") or k == "b_up"}
    bal = Balancer(cold=ColdStore(cfg, scfg, cold_np), scfg=scfg)

    # single-chip fetch reference
    ffn1 = make_tiered_ffn(cfg, scfg, bal.cold, mode="fetch",
                           kernel="pallas")
    fwd1 = make_forward(cfg, ffn_fn=ffn1, stateful_ffn=True)
    cache = init_cache(cfg, 1, 16, jnp.float32)
    toks = jnp.asarray([[3, 7, 11, 2]], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    lp, flat = tiered_layer_params(layers, tp_)
    params = dict(model.params)
    params["layers"] = lp
    params["sparse_flat"] = flat
    ref, _, st_ref = jax.jit(fwd1)(params, toks, pos, cache, st)

    # tp fetch path
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), ("tp",))
    params_tp = dict(params)
    params_tp["sparse_flat"] = shard_tp_flat(
        mesh, tp_flat_layout(flat, cfg.n_layer))
    ffn2 = make_tp_tiered_ffn(cfg, scfg, mesh, mode="fetch")
    fwd2 = make_forward(cfg, ffn_fn=ffn2, stateful_ffn=True)
    with mesh:
        got, _, st_tp = jax.jit(fwd2)(params_tp, toks, pos, cache, st)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(st_tp.miss_g),
                                  np.asarray(st_ref.miss_g))

    # host rebalance pulls missed groups into the hot set
    miss_g = np.asarray(st_tp.miss_g)
    hot_before = np.asarray(tp_.hot_ids).copy()
    tp2 = bal.rebalance(tp_, np.asarray(st_tp.dfr), miss_g=miss_g)
    hot_after = np.asarray(tp2.hot_ids)
    if miss_g.sum() > 0:
        assert not np.array_equal(hot_before, hot_after)
        for l in range(cfg.n_layer):
            missed = set(np.nonzero(miss_g[l])[0])
            entered = set(hot_after[l]) - set(hot_before[l])
            if entered:
                assert entered <= missed | set(
                    np.argsort(-np.asarray(st_tp.dfr)[l])[:4])

    # post-rebalance step on the UPDATED tp-sharded hot store
    lp2, flat2 = tiered_layer_params(layers, tp2)
    params2 = dict(model.params)
    params2["layers"] = lp2
    params2["sparse_flat"] = shard_tp_flat(
        mesh, tp_flat_layout(flat2, cfg.n_layer))
    st2 = st_tp._replace(miss_g=jnp.zeros_like(st_tp.miss_g))
    with mesh:
        out2, _, st3 = jax.jit(fwd2)(params2, toks, pos, cache, st2)
    assert np.asarray(out2).shape == (1, 4, cfg.n_vocab)
    # every previously-missed group that ENTERED the hot set stops
    # missing (entries may evict other firing groups — with a working set
    # larger than H the total can shift, but fetched groups are hits now)
    if miss_g.sum() > 0:
        miss2 = np.asarray(st3.miss_g)
        for l in range(cfg.n_layer):
            entered = set(hot_after[l]) - set(hot_before[l])
            for g in entered:
                assert miss2[l, g] == 0.0, (l, g)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_cp_ring_prefill_matches_dense(tmp_path):
    """Ring-attention context-parallel prefill over a 4-device cp axis ==
    the single-device dense prefill (logits AND produced KV), with the
    sequence sharded 4-way (parallel/cp.py — EXCEEDS the reference:
    SURVEY §2.7 has no SP/CP)."""
    from sparkinfer_tpu.models.loader import load_model
    from sparkinfer_tpu.parallel.cp import make_cp_prefill

    p = tmp_path / "cp.gguf"
    make_tiny_llama(p, n_layer=2, n_embd=64, n_head=4, n_head_kv=2,
                    n_ff=96, seed=5)
    model = load_model(str(p), dtype=jnp.float32)
    cfg = model.config

    T = 32
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (1, T)), jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)[None]

    ref_fwd = make_forward(cfg)
    cache = init_cache(cfg, 1, T, jnp.float32)
    ref_logits, ref_cache = jax.jit(ref_fwd)(model.params, toks, pos, cache)

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("cp",))
    with mesh:
        cp_fwd = jax.jit(make_cp_prefill(cfg, mesh))
        got_logits, (k_all, v_all) = cp_fwd(model.params, toks, pos)

    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(ref_logits), rtol=2e-3, atol=2e-3)
    # the gathered KV equals the dense prefill's cache content
    np.testing.assert_allclose(np.asarray(k_all),
                               np.asarray(ref_cache.k[:, :, :T]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(v_all),
                               np.asarray(ref_cache.v[:, :, :T]),
                               rtol=2e-3, atol=2e-3)
