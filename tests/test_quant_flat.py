"""Flat (layer-stacked, scalar-prefetch) quantized stores: the
quant_matmul_flat kernel, FlatQuantTensor forwards, Q8_0 predictor
stacks, and the Q8_0 tiered hot store + balancer swaps.

Why flat: weights consumed by a Pallas call must not ride a lax.scan's
xs (the per-layer dynamic-slice cannot fuse into the custom call and XLA
materializes a copy every layer, every step — BENCH_NOTES round-1 bug).
These paths carry ONE loop-invariant (L*out, in) packed store and
block-index it with the layer id (ref: quantized sparse weight types,
src/llama-sparkinfer.cpp:178)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.models.transformer import make_forward
from sparkinfer_tpu.ops.quant_matmul import (
    FlatQuantTensor,
    flat_quantize,
    quant_matmul_flat,
)
from sparkinfer_tpu.runtime.kv_cache import init_cache
from sparkinfer_tpu.sparse import SparseConfig
from sparkinfer_tpu.sparse.balancer import Balancer
from sparkinfer_tpu.sparse.ffn import sparse_layout
from sparkinfer_tpu.sparse.predictor import predict_from
from sparkinfer_tpu.sparse.tiering import (
    ColdStore,
    DFRState,
    init_tiered,
    make_tiered_ffn,
    tiered_layer_params,
)

from model_fixtures import make_tiny_llama

G = 32  # q8_0 sublane block needs >= 32


def _dequant_flat(ft: FlatQuantTensor, L: int):
    """FlatQuantTensor (IN-major (in, L*out)) -> (L, in, out) f32."""
    q = np.asarray(ft.q, np.float32)
    s = np.asarray(ft.s, np.float32)
    IN = q.shape[0]
    cols = (q.reshape(IN // 32, 32, -1) * s[:, None, :]).reshape(q.shape)
    OUT = ft.out_dim
    return cols.reshape(IN, L, OUT).transpose(1, 0, 2)


def test_quant_matmul_flat_matches_dequant():
    rng = np.random.default_rng(0)
    L, IN, OUT, N = 3, 64, 128, 2
    w = rng.standard_normal((L, IN, OUT), dtype=np.float32) * 0.3
    ft = flat_quantize(w, "q8_0")
    wref = _dequant_flat(ft, L)
    x = rng.standard_normal((N, IN), dtype=np.float32)
    for il in range(L):
        got = quant_matmul_flat(jnp.asarray(x, jnp.bfloat16), ft.q, ft.s,
                                jnp.int32(il), kind="q8_0", out_dim=OUT)
        exp = x.astype(np.float32) @ wref[il]
        np.testing.assert_allclose(np.asarray(got), exp, rtol=2e-2, atol=2e-2)


def test_quant_matmul_flat_unaligned_fallback():
    # IN=48 is not a multiple of any pallas tile with QK|TI -> slice fallback
    rng = np.random.default_rng(1)
    L, IN, OUT, N = 2, 96, 24, 1
    w = rng.standard_normal((L, IN, OUT), dtype=np.float32) * 0.3
    ft = flat_quantize(w, "q8_0")
    wref = _dequant_flat(ft, L)
    x = rng.standard_normal((N, IN), dtype=np.float32)
    got = quant_matmul_flat(jnp.asarray(x, jnp.bfloat16), ft.q, ft.s,
                            jnp.int32(1), kind="q8_0", out_dim=OUT)
    np.testing.assert_allclose(np.asarray(got), x @ wref[1],
                               rtol=2e-2, atol=2e-2)


def test_flat_quant_attention_forward(tmp_path):
    """A dense forward with ALL big matmul weights as FlatQuantTensor
    stores in params['sparse_flat'] matches the same forward run on the
    dequantized weights — the measured-Q8_0-dense baseline path."""
    path = tmp_path / "tiny.gguf"
    make_tiny_llama(path, n_ff=128, seed=3)
    model = load_model(str(path), dtype=jnp.float32)
    cfg = model.config
    L = cfg.n_layer

    params = {k: v for k, v in model.params.items()}
    layers = dict(params["layers"])
    flat = {}
    ref_layers = dict(layers)
    for k in ("wq", "wk", "wv", "wo", "w_up", "w_gate", "w_down"):
        ft = flat_quantize(np.asarray(layers.pop(k)), "q8_0")
        flat[k] = ft
        ref_layers[k] = jnp.asarray(_dequant_flat(ft, L))
    qparams = dict(params)
    qparams["layers"] = layers
    qparams["sparse_flat"] = flat
    rparams = dict(params)
    rparams["layers"] = ref_layers

    fwd = jax.jit(make_forward(cfg))
    toks = jnp.asarray([[1, 5, 9]], jnp.int32)
    pos = jnp.arange(3, dtype=jnp.int32)[None]
    lq, _ = fwd(qparams, toks, pos, init_cache(cfg, 1, 8, jnp.float32))
    lr, _ = fwd(rparams, toks, pos, init_cache(cfg, 1, 8, jnp.float32))
    # quant path dots in bf16; dequant reference in f32
    np.testing.assert_allclose(np.asarray(lq), np.asarray(lr),
                               rtol=5e-2, atol=5e-2)


def test_quant_predictor_matches_dequant():
    rng = np.random.default_rng(2)
    L, E, R, F, N = 2, 64, 32, 128, 4
    pu = rng.standard_normal((L, E, R), dtype=np.float32) * 0.2
    pd = rng.standard_normal((L, R, F), dtype=np.float32) * 0.4
    pub = rng.standard_normal((L, R), dtype=np.float32) * 0.1
    pdb = rng.standard_normal((L, F), dtype=np.float32) * 0.1
    fpu = flat_quantize(pu, "q8_0")
    fpd = flat_quantize(pd, "q8_0")
    pu_ref = _dequant_flat(fpu, L)
    pd_ref = _dequant_flat(fpd, L)
    x = rng.standard_normal((N, E), dtype=np.float32)
    for il in range(L):
        got = predict_from(fpu.with_il(jnp.int32(il)), jnp.asarray(pub[il]),
                           fpd.with_il(jnp.int32(il)), jnp.asarray(pdb[il]),
                           jnp.asarray(x))
        h = np.maximum(x @ pu_ref[il] + pub[il], 0.0)
        import scipy.special as sps

        exp = sps.expit(h @ pd_ref[il] + pdb[il])
        np.testing.assert_allclose(np.asarray(got), exp, rtol=3e-2, atol=3e-2)


@pytest.fixture(scope="module")
def spq(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny-prosparse-q8.gguf"
    make_tiny_llama(path, arch="prosparse_llama", pred_rank=8, n_ff=128,
                    seed=5)
    model = load_model(str(path), dtype=jnp.float32)
    scfg = SparseConfig(group_size=G, capacity_groups=3)
    model.params["layers"] = sparse_layout(model.params["layers"],
                                           model.config, scfg)
    return model, scfg


def _dequant_store(q, s, transposed):
    q = np.asarray(q, np.float32)
    s = np.asarray(s)
    B = q.shape[-2]
    blk = q.reshape(q.shape[:-2] + (B // 32, 32, q.shape[-1]))
    return (blk * s[..., :, None, :]).reshape(q.shape)


def _run_tiered(model, scfg, tp, st, kernel):
    cfg = model.config
    ffn = make_tiered_ffn(cfg, scfg, None, mode="drop", kernel=kernel)
    params = dict(model.params)
    params["layers"], params["sparse_flat"] = tiered_layer_params(
        model.params["layers"], tp)
    fwd = jax.jit(make_forward(cfg, ffn_fn=ffn, stateful_ffn=True))
    toks = jnp.asarray([[2, 7, 11, 3, 8]], jnp.int32)
    pos = jnp.arange(5, dtype=jnp.int32)[None]
    cache = init_cache(cfg, 1, 16, jnp.float32)
    logits, _, st2 = fwd(params, toks, pos, cache, st)
    return np.asarray(logits), st2


def test_tiered_q8_store_matches_dequant_reference(spq):
    """Drop-mode decode through the Q8_0 hot store == the bf16 tiered path
    run on the DEQUANTIZED weights (same hot set, same selection)."""
    model, scfg = spq
    cfg = model.config
    layers = model.params["layers"]
    ng = cfg.n_ff // G
    H = ng  # all groups hot: pure store-format comparison, no drops
    tpq, st = init_tiered(cfg, scfg, layers, H, quant="q8_0")

    # reference: unquantized tiered params whose stores ARE the dequantized
    # q8 values
    tpr, _ = init_tiered(cfg, scfg, layers, H)
    tpr = tpr._replace(
        hot_upT=jnp.asarray(_dequant_store(tpq.hot_upT, tpq.s_upT, True)),
        hot_gateT=jnp.asarray(_dequant_store(tpq.hot_gateT, tpq.s_gateT,
                                             True)),
        hot_down=jnp.asarray(_dequant_store(tpq.hot_down, tpq.s_down,
                                            False)),
    )
    lq, _ = _run_tiered(model, scfg, tpq, st, "gather")
    lr, _ = _run_tiered(model, scfg, tpr, st, "gather")
    np.testing.assert_allclose(lq, lr, rtol=1e-4, atol=1e-4)


def test_tiered_q8_pallas_interpret_matches_gather(spq):
    model, scfg = spq
    cfg = model.config
    layers = model.params["layers"]
    tpq, st = init_tiered(cfg, scfg, layers, cfg.n_ff // G, quant="q8_0")
    lp, _ = _run_tiered(model, scfg, tpq, st, "pallas")
    lg, _ = _run_tiered(model, scfg, tpq, st, "gather")
    np.testing.assert_allclose(lp, lg, rtol=1e-3, atol=1e-3)


def test_balancer_q8_swaps_quantize_entering_blocks(spq):
    """After a rebalance of a Q8_0 store, the entered slot's packed bytes
    and scales equal quantize_rows_q8_0 of the cold group's rows."""
    from sparkinfer_tpu.ops.sparse_ffn_pallas import quantize_rows_q8_0

    model, scfg = spq
    cfg = model.config
    layers = model.params["layers"]
    ng = cfg.n_ff // G
    H = 2
    tpq, st = init_tiered(cfg, scfg, layers, H, quant="q8_0")
    cold = ColdStore(cfg, scfg,
                     {k: np.asarray(v) for k, v in layers.items()
                      if k.endswith("_rows")},
                     dtype=np.float32)
    bal = Balancer(cold=cold, scfg=scfg, window=8)
    # force group ng-1 hottest everywhere
    dfr = np.zeros((cfg.n_layer, ng), np.float32)
    dfr[:, ng - 1] = 1.0
    dfr[:, 0] = 0.5  # keep group 0 in
    tp2 = bal.rebalance(tpq, dfr)
    assert tp2.quantized
    # slot 1 (held group 1, now evicted) should hold group ng-1
    l = 0
    slot = int(np.asarray(tp2.group_map)[l, ng - 1])
    assert slot >= 0
    upT = np.swapaxes(cold.up[l, ng - 1], -1, -2)
    qexp, sexp = quantize_rows_q8_0(upT, True)
    fj = l * H + slot
    np.testing.assert_array_equal(np.asarray(tp2.hot_upT)[fj], qexp)
    np.testing.assert_allclose(np.asarray(tp2.s_upT)[fj], sexp, rtol=1e-6)
    # function stays well-defined: a decode step runs and misses drop
    lq, st2 = _run_tiered(model, scfg, tp2, st, "gather")
    assert np.isfinite(lq).all()


def test_w8a8_linear_matches_float():
    """Row-wise W8A8 (native int8 MXU path): matches the float matmul
    within combined weight+activation int8 rounding."""
    from sparkinfer_tpu.ops.quant_matmul import W8A8Tensor, quant_linear

    rng = np.random.default_rng(5)
    IN, OUT, N = 64, 128, 4
    w = rng.standard_normal((IN, OUT)).astype(np.float32) * 0.2
    x = rng.standard_normal((N, IN)).astype(np.float32)
    wt = W8A8Tensor.from_float(w)
    got = np.asarray(quant_linear(jnp.asarray(x), wt))
    np.testing.assert_allclose(got, x @ w, rtol=0.05, atol=0.05)


def test_w8a8_stacked_forward(tmp_path):
    """W8A8 attention weights ride the layer scan xs like dense weights
    (no flat store, no pallas): forward matches the dequantized
    reference within quant tolerance."""
    from sparkinfer_tpu.ops.quant_matmul import W8A8Tensor

    path = tmp_path / "tiny-w8a8.gguf"
    make_tiny_llama(path, n_ff=128, seed=8)
    model = load_model(str(path), dtype=jnp.float32)
    cfg = model.config
    layers = dict(model.params["layers"])
    ref_layers = dict(layers)
    for k in ("wq", "wk", "wv", "wo"):
        wt = W8A8Tensor.from_float(np.asarray(layers[k]))
        layers[k] = wt
        ref_layers[k] = jnp.asarray(
            np.asarray(wt.q, np.float32) * np.asarray(wt.s)[:, None, :])
    qp = dict(model.params)
    qp["layers"] = layers
    rp = dict(model.params)
    rp["layers"] = ref_layers
    fwd = jax.jit(make_forward(cfg))
    toks = jnp.asarray([[2, 6, 9]], jnp.int32)
    pos = jnp.arange(3, dtype=jnp.int32)[None]
    lq, _ = fwd(qp, toks, pos, init_cache(cfg, 1, 8, jnp.float32))
    lr, _ = fwd(rp, toks, pos, init_cache(cfg, 1, 8, jnp.float32))
    np.testing.assert_allclose(np.asarray(lq), np.asarray(lr),
                               rtol=0.05, atol=0.05)


def test_w8a8_predictor_matches_float():
    """W8A8 predictor stacks (pred_up_w8/pred_down_w8, probe #13 lever):
    activation probabilities match the f32 predictor within int8
    rounding, and the top-k group selection is near-identical."""
    from sparkinfer_tpu.ops.quant_matmul import W8A8Tensor
    from sparkinfer_tpu.sparse.predictor import predict_activations

    rng = np.random.default_rng(9)
    L, E, R, F = 3, 64, 16, 256
    pu = rng.standard_normal((L, E, R)).astype(np.float32) * 0.05
    pd = rng.standard_normal((L, R, F)).astype(np.float32) * 0.6
    pub = np.zeros((L, R), np.float32)
    pdb = rng.standard_normal((L, F)).astype(np.float32) * 0.5 - 1.2
    x = rng.standard_normal((4, E)).astype(np.float32)

    lp_w8 = {
        "pred_up_w8": W8A8Tensor.from_float(pu),
        "pred_down_w8": W8A8Tensor.from_float(pd),
        "pred_up_b_all": jnp.asarray(pub),
        "pred_down_b_all": jnp.asarray(pdb),
    }
    for il in range(L):
        lp_f = {"pred_up": jnp.asarray(pu[il]), "pred_up_b": jnp.asarray(pub[il]),
                "pred_down": jnp.asarray(pd[il]), "pred_down_b": jnp.asarray(pdb[il])}
        want = np.asarray(predict_activations(lp_f, jnp.asarray(x)))
        got = np.asarray(predict_activations({**lp_w8, "flat_il": il},
                                             jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=0.08, atol=0.03)
        # selection agreement: top-8 of 16 groups overlap >= 7/8
        gw = want.reshape(4, 16, 16).max(-1)
        gg = got.reshape(4, 16, 16).max(-1)
        for n in range(4):
            overlap = len(set(np.argsort(gw[n])[-8:])
                          & set(np.argsort(gg[n])[-8:]))
            assert overlap >= 7, (il, n, overlap)


def test_w8a8_head_matches_float(tmp_path):
    """W8A8 lm head (native int8 MXU, f32 logits out): argmax chain
    matches the float head on a tiny model."""
    from sparkinfer_tpu.ops.quant_matmul import W8A8Tensor

    path = tmp_path / "tiny-w8h.gguf"
    make_tiny_llama(path, n_ff=128, seed=3)
    model = load_model(str(path), dtype=jnp.float32)
    cfg = model.config
    qp = dict(model.params)
    wt = W8A8Tensor.from_float(np.asarray(model.params["output"]))
    qp["output"] = wt
    rp = dict(model.params)
    rp["output"] = jnp.asarray(
        np.asarray(wt.q, np.float32) * np.asarray(wt.s)[None, :])
    fwd = jax.jit(make_forward(cfg))
    toks = jnp.asarray([[2, 6, 9, 11]], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    lq, _ = fwd(qp, toks, pos, init_cache(cfg, 1, 8, jnp.float32))
    lr, _ = fwd(rp, toks, pos, init_cache(cfg, 1, 8, jnp.float32))
    np.testing.assert_allclose(np.asarray(lq), np.asarray(lr),
                               rtol=0.05, atol=0.05)
    assert np.argmax(np.asarray(lq)[0, -1]) == np.argmax(np.asarray(lr)[0, -1])
