"""Sparse-FFN subsystem: predictor parity, thresholded-FFN semantics vs the
numpy oracle, capacity top-k exactness, and the fused Pallas kernel
(interpret mode) vs the jnp gather path.

This closes the test gap the reference left open: it ships ZERO test cases
for its sparse ops (SURVEY.md §4, test-backend-ops has no
MUL_MAT_SPARSE/AXPY_SPARSE coverage)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sparkinfer_tpu.models.config import ModelConfig
from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.models.transformer import make_forward
from sparkinfer_tpu.runtime.kv_cache import init_cache
from sparkinfer_tpu.sparse import (
    SparseConfig,
    make_sparse_ffn,
    predict_activations,
    prepare_sparse_params,
    select_groups,
    sparse_layout,
)

from model_fixtures import make_tiny_llama, ref_llama_forward, ref_predictor

G = 16  # tiny group size for tests (real models use 128)
PRED_RANK = 8


@pytest.fixture(scope="module")
def sparse_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny-prosparse.gguf"
    tensors = make_tiny_llama(
        path, arch="prosparse_llama", pred_rank=PRED_RANK, n_ff=96, seed=5
    )
    model = load_model(str(path), dtype=jnp.float32)
    return model, tensors


def test_config_reads_pred_lora(sparse_model):
    model, _ = sparse_model
    cfg = model.config
    assert cfg.arch == "prosparse_llama"
    assert cfg.pred_lora == (PRED_RANK, PRED_RANK)
    assert cfg.has_predictors
    assert cfg.traits.sparse_act == "fatrelu"


def test_predictor_matches_oracle(sparse_model):
    model, tensors = sparse_model
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 64)).astype(np.float32)
    lp0 = jax.tree.map(lambda a: a[0], model.params["layers"])
    got = np.asarray(predict_activations(lp0, jnp.asarray(x)))
    ref = ref_predictor(tensors, 0, x.astype(np.float64))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def _layer0(model, scfg):
    lp = jax.tree.map(lambda a: a[0], model.params["layers"])
    return sparse_layout(lp, model.config, scfg)


def test_dense_masked_ffn_matches_manual(sparse_model):
    """dense mode == act(gate)*up masked by predictor>=thr, down-projected."""
    model, tensors = sparse_model
    cfg = model.config
    scfg = SparseConfig(group_size=G)
    ffn = make_sparse_ffn(cfg, scfg, mode="dense")
    lp = _layer0(model, scfg)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 5, 64)).astype(np.float32)
    got = np.asarray(ffn(lp, jnp.asarray(x)))[0]

    xf = x[0].astype(np.float64)
    probs = ref_predictor(tensors, 0, xf)
    up = xf @ tensors["blk.0.ffn_up.weight"].T
    gate = xf @ tensors["blk.0.ffn_gate.weight"].T
    hidden = np.where(gate > 0, gate, 0.0) * up * (probs >= 0.5)
    want = hidden @ tensors["blk.0.ffn_down.weight"].T
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_gather_equals_dense_at_full_capacity(sparse_model):
    model, _ = sparse_model
    cfg = model.config
    scfg = SparseConfig(group_size=G, capacity_groups=0)  # all groups
    lp = _layer0(model, scfg)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 3, 64)).astype(np.float32))
    dense = make_sparse_ffn(cfg, scfg, mode="dense")(lp, x)
    gather = make_sparse_ffn(cfg, scfg, mode="gather")(lp, x)
    np.testing.assert_allclose(np.asarray(gather), np.asarray(dense), rtol=1e-4, atol=1e-4)


def test_gather_exact_when_capacity_covers_active(sparse_model):
    """With capacity >= #active groups the top-k path is EXACTLY the
    thresholded function (no approximation)."""
    model, tensors = sparse_model
    cfg = model.config
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 4, 64)).astype(np.float32)
    probs = ref_predictor(tensors, 0, x[0].astype(np.float64))
    active = probs >= 0.5  # (T, F)
    ng = cfg.n_ff // G
    act_groups = active.reshape(-1, ng, G).any(-1).sum(-1).max()
    assert act_groups < ng, "fixture should be sparse enough"

    scfg = SparseConfig(group_size=G, capacity_groups=int(act_groups))
    lp = _layer0(model, scfg)
    dense = make_sparse_ffn(cfg, SparseConfig(group_size=G), mode="dense")(lp, jnp.asarray(x))
    gather = make_sparse_ffn(cfg, scfg, mode="gather")(lp, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gather), np.asarray(dense), rtol=1e-4, atol=1e-4)


def test_select_groups_prefers_active_count():
    scfg = SparseConfig(group_size=4, capacity_groups=2)
    probs = jnp.asarray(
        [[0.9, 0.9, 0.9, 0.1,  0.1, 0.0, 0.0, 0.0,  0.6, 0.6, 0.6, 0.6]], jnp.float32
    )  # groups: 3 active, 0 active, 4 active
    idx = np.asarray(select_groups(probs, scfg, 12))
    assert set(idx[0].tolist()) == {0, 2}


def test_pallas_kernel_matches_gather(sparse_model):
    model, _ = sparse_model
    cfg = model.config
    scfg = SparseConfig(group_size=G, capacity_groups=3)
    lp = _layer0(model, scfg)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 2, 64)).astype(np.float32))
    gather = make_sparse_ffn(cfg, scfg, mode="gather")(lp, x)
    pallas = make_sparse_ffn(cfg, scfg, mode="pallas")(lp, x)
    np.testing.assert_allclose(np.asarray(pallas), np.asarray(gather), rtol=1e-4, atol=1e-4)


def test_pallas_kernel_ungated():
    """relu (OPT/falcon-style) path with bias, no gate."""
    from sparkinfer_tpu.ops.sparse_ffn_pallas import sparse_ffn_block

    rng = np.random.default_rng(6)
    N, E, ng, C = 2, 32, 6, 3
    F = ng * G
    x = jnp.asarray(rng.standard_normal((N, E)).astype(np.float32))
    wu = jnp.asarray(rng.standard_normal((ng, G, E)).astype(np.float32) * 0.1)
    wd = jnp.asarray(rng.standard_normal((ng, G, E)).astype(np.float32) * 0.1)
    bu = jnp.asarray(rng.standard_normal((F,)).astype(np.float32) * 0.1)
    gp = jnp.asarray(rng.uniform(0, 1, (N, ng, G)).astype(np.float32))
    idx = jnp.asarray(rng.permutation(ng)[:C])[None].repeat(N, 0).astype(jnp.int32)

    gp_sel = jnp.take_along_axis(gp, idx[..., None], axis=1)
    bu_sel = jnp.take(bu.reshape(ng, G), idx, axis=0)
    out = sparse_ffn_block(
        x, idx, gp_sel, wu, None, wd, act="relu", prob_threshold=0.5, bu_sel=bu_sel
    )
    # manual
    want = np.zeros((N, E))
    for n in range(N):
        for c in range(C):
            g = int(idx[n, c])
            up = np.asarray(x)[n] @ np.asarray(wu)[g].T + np.asarray(bu).reshape(ng, G)[g]
            h = np.maximum(up, 0) * (np.asarray(gp)[n, g] >= 0.5)
            want[n] += h @ np.asarray(wd)[g]
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)


def test_full_model_sparse_forward_matches_oracle(sparse_model):
    """End-to-end: prosparse model with dense-masked sparse FFN vs the
    oracle with the predictor-derived mask."""
    model, tensors = sparse_model
    cfg = model.config
    scfg = SparseConfig(group_size=G)
    params = prepare_sparse_params(model.params, cfg, scfg)
    ffn = make_sparse_ffn(cfg, scfg, mode="dense")
    fwd = jax.jit(make_forward(cfg, ffn_fn=ffn))
    rng = np.random.default_rng(8)
    T = 6
    toks = rng.integers(0, cfg.n_vocab, T).astype(np.int32)
    cache = init_cache(cfg, 1, 16, jnp.float32)
    logits, _ = fwd(
        params, jnp.asarray(toks)[None], jnp.arange(T, dtype=jnp.int32)[None], cache
    )

    # oracle: compute per-layer masks by replaying the reference math
    x = tensors["token_embd.weight"][toks].astype(np.float64)
    masks = []
    h_cur = x
    # build masks layer by layer by running the oracle incrementally is
    # complex; instead compute masks from the jax-side h (trusted via
    # test_predictor_matches_oracle) — here recompute via numpy oracle pass
    # that applies masks as it goes.
    from model_fixtures import _np_rms_norm

    # replicate ref_llama_forward but capturing masks
    def full_with_masks():
        import model_fixtures as mf

        xx = tensors["token_embd.weight"][toks].astype(np.float64)
        T_ = len(toks)
        masks = []
        causal = np.tril(np.ones((T_, T_), bool))
        pos = np.arange(T_, dtype=np.float64)
        for i in range(cfg.n_layer):
            p = f"blk.{i}."
            h = mf._np_rms_norm(xx, tensors[p + "attn_norm.weight"].astype(np.float64))
            q = (h @ tensors[p + "attn_q.weight"].T).reshape(T_, 4, 16)
            k = (h @ tensors[p + "attn_k.weight"].T).reshape(T_, 2, 16)
            v = (h @ tensors[p + "attn_v.weight"].T).reshape(T_, 2, 16)
            q = mf._np_rope_norm(q, pos, 10000.0)
            k = mf._np_rope_norm(k, pos, 10000.0)
            kk = np.repeat(k, 2, axis=1)
            vv = np.repeat(v, 2, axis=1)
            att = np.einsum("thd,shd->hts", q, kk) / 4.0
            att = np.where(causal[None], att, -np.inf)
            att = mf._np_softmax(att)
            out = np.einsum("hts,shd->thd", att, vv).reshape(T_, 64)
            xx = xx + out @ tensors[p + "attn_output.weight"].T
            h = mf._np_rms_norm(xx, tensors[p + "ffn_norm.weight"].astype(np.float64))
            probs = ref_predictor(tensors, i, h)
            mask = (probs >= 0.5).astype(np.float64)
            masks.append(mask)
            up = h @ tensors[p + "ffn_up.weight"].T
            gate = h @ tensors[p + "ffn_gate.weight"].T
            hidden = np.where(gate > 0, gate, 0.0) * up * mask
            xx = xx + hidden @ tensors[p + "ffn_down.weight"].T
        xx = mf._np_rms_norm(xx, tensors["output_norm.weight"].astype(np.float64))
        return xx @ tensors["output.weight"].T

    ref = full_with_masks()
    np.testing.assert_allclose(np.asarray(logits)[0], ref, rtol=5e-4, atol=5e-4)


def test_engine_sparse_decode_matches_dense_masked(sparse_model):
    """Engine with sparse decode (gather path, full capacity) must generate
    the same tokens as the masked-dense FFN used for both phases."""
    from sparkinfer_tpu.runtime.engine import Engine
    from sparkinfer_tpu.runtime.sampling import SamplerConfig

    model, _ = sparse_model
    cfg = model.config
    scfg = SparseConfig(group_size=G, capacity_groups=0)

    params_backup = model.params
    ffn = make_sparse_ffn(cfg, scfg, mode="dense")
    import copy

    eng_ref = Engine(model, max_seq=64, sampler=SamplerConfig(temp=0.0),
                     kv_dtype=jnp.float32, ffn_fn=ffn)
    prompt = [7, 30, 99]
    ref = eng_ref.generate(prompt, max_new_tokens=6)

    eng_sp = Engine(model, max_seq=64, sampler=SamplerConfig(temp=0.0),
                    kv_dtype=jnp.float32, sparse=scfg, sparse_decode_mode="gather",
                    sparse_pipelined=False)
    got = eng_sp.generate(prompt, max_new_tokens=6)
    model.params = params_backup
    assert got == ref


def test_pipelined_selection_l1_equals_gather(tmp_path):
    """With n_layer=1 the one-layer-ahead pipeline degenerates to same-layer
    selection — outputs must match the gather path exactly."""
    from sparkinfer_tpu.sparse.ffn import (
        make_pipelined_sparse_ffn,
        prepare_pipelined_params,
    )

    p = tmp_path / "l1.gguf"
    make_tiny_llama(p, arch="prosparse_llama", pred_rank=8, n_ff=96, n_layer=1, seed=5)
    model = load_model(str(p), dtype=jnp.float32)
    cfg = model.config
    scfg = SparseConfig(group_size=G, capacity_groups=4)
    params = prepare_pipelined_params(model.params, cfg, scfg)

    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.n_vocab, 5).astype(np.int32)
    pos = jnp.arange(5, dtype=jnp.int32)[None]

    ffn_p, carry_init = make_pipelined_sparse_ffn(cfg, scfg, mode="gather")
    fwd_p = jax.jit(make_forward(cfg, ffn_fn=ffn_p, ffn_carry_init=carry_init))
    got, _ = fwd_p(params, jnp.asarray(toks)[None], pos, init_cache(cfg, 1, 16, jnp.float32))

    fwd_g = jax.jit(make_forward(cfg, ffn_fn=make_sparse_ffn(cfg, scfg, mode="gather")))
    want, _ = fwd_g(params, jnp.asarray(toks)[None], pos, init_cache(cfg, 1, 16, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_pipelined_multilayer_runs_deterministically(sparse_model):
    from sparkinfer_tpu.sparse.ffn import (
        make_pipelined_sparse_ffn,
        prepare_pipelined_params,
    )

    model, _, = sparse_model[0], sparse_model[1]
    cfg = model.config
    scfg = SparseConfig(group_size=G, capacity_groups=4)
    params = prepare_pipelined_params(
        {"tok_embd": model.params["tok_embd"],
         "output_norm_w": model.params["output_norm_w"],
         "output": model.params["output"],
         "layers": {k: v for k, v in model.params["layers"].items()
                    if not k.endswith("_nx")}},
        cfg, scfg)
    ffn_p, carry_init = make_pipelined_sparse_ffn(cfg, scfg, mode="gather")
    fwd = jax.jit(make_forward(cfg, ffn_fn=ffn_p, ffn_carry_init=carry_init))
    rng = np.random.default_rng(1)
    toks = rng.integers(0, cfg.n_vocab, 6).astype(np.int32)
    pos = jnp.arange(6, dtype=jnp.int32)[None]
    a, _ = fwd(params, jnp.asarray(toks)[None], pos, init_cache(cfg, 1, 16, jnp.float32))
    b, _ = fwd(params, jnp.asarray(toks)[None], pos, init_cache(cfg, 1, 16, jnp.float32))
    assert np.isfinite(np.asarray(a)).all()
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_engine_pipelined_sparse_generates(sparse_model):
    """Engine default sparse decode = pipelined selection; generation is
    deterministic and close to the same-layer path (approximation differs
    only where the one-layer-stale selection differs)."""
    from sparkinfer_tpu.runtime.engine import Engine
    from sparkinfer_tpu.runtime.sampling import SamplerConfig as SC

    model, _ = sparse_model
    scfg = SparseConfig(group_size=G, capacity_groups=4)
    eng = Engine(model, max_seq=64, sampler=SC(temp=0.0), kv_dtype=jnp.float32,
                 sparse=scfg, sparse_decode_mode="gather", sparse_pipelined=True)
    out = eng.generate([7, 30, 99], max_new_tokens=6)
    assert len(out) == 6
    assert out == eng.generate([7, 30, 99], max_new_tokens=6)


def test_pipelined_pallas_v2_matches_gather(sparse_model, monkeypatch):
    """The deep single-stream kernel (v2) must equal the gather math."""
    monkeypatch.setenv("SPIF_KERNEL_V2", "1")
    from sparkinfer_tpu.sparse.ffn import (
        make_pipelined_sparse_ffn,
        prepare_pipelined_params,
    )

    model, _ = sparse_model
    cfg = model.config
    scfg = SparseConfig(group_size=G, capacity_groups=4)
    base = {"tok_embd": model.params["tok_embd"],
            "output_norm_w": model.params["output_norm_w"],
            "output": model.params["output"],
            "layers": {k: v for k, v in model.params["layers"].items()
                       if not (k.endswith("_nx") or k.endswith("_rows") or k == "w_all_rows")}}
    params = prepare_pipelined_params(base, cfg, scfg)
    assert "w_all_rows" in params["layers"]

    rng = np.random.default_rng(9)
    toks = rng.integers(0, cfg.n_vocab, 5).astype(np.int32)
    pos = jnp.arange(5, dtype=jnp.int32)[None]

    outs = {}
    for mode in ("gather", "pallas"):
        ffn, ci = make_pipelined_sparse_ffn(cfg, scfg, mode=mode)
        fwd = jax.jit(make_forward(cfg, ffn_fn=ffn, ffn_carry_init=ci))
        lg, _ = fwd(params, jnp.asarray(toks)[None], pos,
                    init_cache(cfg, 1, 16, jnp.float32))
        outs[mode] = np.asarray(lg)
    np.testing.assert_allclose(outs["pallas"], outs["gather"], rtol=1e-4, atol=1e-4)


def test_pipelined_pallas_v6_matches_gather(sparse_model):
    """v6 (transposed-store VPU-matvec kernel, interpret mode on CPU) must
    equal the gather math; also checks the transposed stores replaced the
    untransposed up/gate rows (same-HBM guarantee)."""
    from sparkinfer_tpu.sparse.ffn import (
        make_pipelined_sparse_ffn,
        prepare_pipelined_params,
    )

    model, _ = sparse_model
    cfg = model.config
    scfg = SparseConfig(group_size=G, capacity_groups=4)
    base = {"tok_embd": model.params["tok_embd"],
            "output_norm_w": model.params["output_norm_w"],
            "output": model.params["output"],
            "layers": {k: v for k, v in model.params["layers"].items()
                       if not (k.endswith("_nx") or k.endswith("_rows") or k == "w_all_rows")}}
    params_v1 = prepare_pipelined_params(base, cfg, scfg)
    params_v6 = prepare_pipelined_params(base, cfg, scfg, layout="v6")
    fl = params_v6["sparse_flat"]
    ng = scfg.n_groups(cfg.n_ff)
    assert "w_up_rows" not in params_v6["layers"]  # moved out of scan xs
    assert fl["w_upT_flat"].shape == (cfg.n_layer * ng, cfg.n_embd, G)

    rng = np.random.default_rng(11)
    toks = rng.integers(0, cfg.n_vocab, 5).astype(np.int32)
    pos = jnp.arange(5, dtype=jnp.int32)[None]

    ffn_g, ci = make_pipelined_sparse_ffn(cfg, scfg, mode="gather")
    fwd_g = jax.jit(make_forward(cfg, ffn_fn=ffn_g, ffn_carry_init=ci))
    ref, _ = fwd_g(params_v1, jnp.asarray(toks)[None], pos,
                   init_cache(cfg, 1, 16, jnp.float32))

    ffn_6, ci6 = make_pipelined_sparse_ffn(cfg, scfg, mode="pallas")
    fwd_6 = jax.jit(make_forward(cfg, ffn_fn=ffn_6, ffn_carry_init=ci6))
    got, _ = fwd_6(params_v6, jnp.asarray(toks)[None], pos,
                   init_cache(cfg, 1, 16, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pipelined_pallas_v6q_matches_dequant_gather(sparse_model):
    """Q8_0 sparse path (fused dequant kernel, interpret on CPU) must equal
    the gather math run on the DEQUANTIZED weights — the dequant oracle the
    reference uses for its quantized sparse kernels (mmq-sparse.cu vs the
    f32 path)."""
    from sparkinfer_tpu.ops.sparse_ffn_pallas import quantize_rows_q8_0
    from sparkinfer_tpu.sparse.ffn import (
        _dequant_sub_nd,
        make_pipelined_sparse_ffn,
        prepare_pipelined_params,
    )

    model, _ = sparse_model
    cfg = model.config
    # ggml q8_0 blocks are 32 wide: group_size must be a multiple of 32
    scfg = SparseConfig(group_size=32, capacity_groups=2)
    base = {"tok_embd": model.params["tok_embd"],
            "output_norm_w": model.params["output_norm_w"],
            "output": model.params["output"],
            "layers": {k: v for k, v in model.params["layers"].items()
                       if not (k.endswith("_nx") or k.endswith("_rows") or k == "w_all_rows")}}
    params_q = prepare_pipelined_params(base, cfg, scfg, layout="v6",
                                        quant="q8_0")
    lq = params_q["sparse_flat"]
    assert "qw_upT_flat" in lq and lq["qw_upT_flat"].dtype == jnp.int8
    assert "w_upT_flat" not in lq and "w_down_flat" not in lq
    L, ng = cfg.n_layer, scfg.n_groups(cfg.n_ff)

    # round-trip check on the quantizer itself
    w = np.asarray(
        prepare_pipelined_params(base, cfg, scfg, layout="v6")["sparse_flat"]["w_upT_flat"],
        np.float32)
    q, s = quantize_rows_q8_0(w, transposed=True)
    deq = np.asarray(_dequant_sub_nd(jnp.asarray(q), jnp.asarray(s)))
    amax = np.abs(w).max()
    assert np.abs(deq - w).max() <= amax / 127 * 0.51 + 1e-7

    # reference: gather math on dequantized row stores
    def unflat(a):  # (L*ng, A, B) -> (L, ng, A, B)
        return a.reshape((L, ng) + a.shape[1:])

    params_ref = prepare_pipelined_params(base, cfg, scfg)
    lr = dict(params_ref["layers"])
    lr["w_up_rows"] = unflat(jnp.swapaxes(
        _dequant_sub_nd(lq["qw_upT_flat"], lq["s_upT_flat"]), -1, -2))
    if "qw_gateT_flat" in lq:
        lr["w_gate_rows"] = unflat(jnp.swapaxes(
            _dequant_sub_nd(lq["qw_gateT_flat"], lq["s_gateT_flat"]), -1, -2))
    lr["w_down_rows"] = unflat(
        _dequant_sub_nd(lq["qw_down_flat"], lq["s_down_flat"]))
    params_ref = dict(params_ref)
    params_ref["layers"] = lr

    rng = np.random.default_rng(13)
    toks = rng.integers(0, cfg.n_vocab, 5).astype(np.int32)
    pos = jnp.arange(5, dtype=jnp.int32)[None]

    ffn_g, ci = make_pipelined_sparse_ffn(cfg, scfg, mode="gather")
    fwd_g = jax.jit(make_forward(cfg, ffn_fn=ffn_g, ffn_carry_init=ci))
    ref, _ = fwd_g(params_ref, jnp.asarray(toks)[None], pos,
                   init_cache(cfg, 1, 16, jnp.float32))

    ffn_q, ciq = make_pipelined_sparse_ffn(cfg, scfg, mode="pallas")
    fwd_q = jax.jit(make_forward(cfg, ffn_fn=ffn_q, ffn_carry_init=ciq))
    got, _ = fwd_q(params_q, jnp.asarray(toks)[None], pos,
                   init_cache(cfg, 1, 16, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_dense_prefill_from_v6_transposed_rows(sparse_model):
    """drop_dense v6 layout: masked-dense prefill computes from the
    TRANSPOSED stores and must match the dense-weight path."""
    from sparkinfer_tpu.sparse.ffn import make_sparse_ffn, prepare_pipelined_params

    model, _ = sparse_model
    cfg = model.config
    scfg = SparseConfig(group_size=G, capacity_groups=4)
    base = {"tok_embd": model.params["tok_embd"],
            "output_norm_w": model.params["output_norm_w"],
            "output": model.params["output"],
            "layers": {k: v for k, v in model.params["layers"].items()
                       if not (k.endswith("_nx") or k.endswith("_rows") or k == "w_all_rows")}}
    dense_ffn = make_sparse_ffn(cfg, scfg, mode="dense")
    fwd = jax.jit(make_forward(cfg, ffn_fn=dense_ffn))
    rng = np.random.default_rng(12)
    toks = rng.integers(0, cfg.n_vocab, 5).astype(np.int32)
    pos = jnp.arange(5, dtype=jnp.int32)[None]
    ref, _ = fwd(base, jnp.asarray(toks)[None], pos,
                 init_cache(cfg, 1, 16, jnp.float32))

    tight = prepare_pipelined_params(base, cfg, scfg, drop_dense=True,
                                     layout="v6")
    assert "w_up" not in tight["layers"] and "w_up_rows" not in tight["layers"]
    assert "w_upT_flat" in tight["sparse_flat"]
    got, _ = fwd(tight, jnp.asarray(toks)[None], pos,
                 init_cache(cfg, 1, 16, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pipelined_pred_stacks_match_per_layer(sparse_model):
    """Loop-invariant predictor stacks (pred_up_all in sparse_flat; the
    HBM-tight form that avoids the rolled `_nx` duplicate) produce
    IDENTICAL logits to the per-layer xs form."""
    from sparkinfer_tpu.sparse.ffn import (
        make_pipelined_sparse_ffn,
        prepare_pipelined_params,
    )

    model, _ = sparse_model
    cfg = model.config
    scfg = SparseConfig(group_size=G, capacity_groups=4)
    base = {"tok_embd": model.params["tok_embd"],
            "output_norm_w": model.params["output_norm_w"],
            "output": model.params["output"],
            "layers": {k: v for k, v in model.params["layers"].items()
                       if not k.endswith("_nx")}}
    params = prepare_pipelined_params(base, cfg, scfg)

    # stack form: move predictor weights out of layers into sparse_flat
    slayers = {k: v for k, v in params["layers"].items()
               if not k.startswith("pred_")}
    stacked = dict(params)
    stacked["layers"] = slayers
    stacked["sparse_flat"] = {
        k + "_all": params["layers"][k]
        for k in ("pred_up", "pred_up_b", "pred_down", "pred_down_b")}

    ffn_p, carry_init = make_pipelined_sparse_ffn(cfg, scfg, mode="gather")
    fwd = jax.jit(make_forward(cfg, ffn_fn=ffn_p, ffn_carry_init=carry_init))
    rng = np.random.default_rng(3)
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, 6).astype(np.int32))[None]
    pos = jnp.arange(6, dtype=jnp.int32)[None]
    a, _ = fwd(params, toks, pos, init_cache(cfg, 1, 16, jnp.float32))
    b, _ = fwd(stacked, toks, pos, init_cache(cfg, 1, 16, jnp.float32))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_union_batch_matches_per_token(sparse_model):
    """v7u union kernel + gather_union (round-3 batched sparse): with
    union capacity covering the cross-token union, both equal the
    per-token pallas/gather result on a batched forward."""
    from sparkinfer_tpu.sparse.ffn import (
        make_pipelined_sparse_ffn,
        prepare_pipelined_params,
    )

    model, _ = sparse_model
    cfg = model.config
    scfg = SparseConfig(group_size=G, capacity_groups=4)
    ng = scfg.n_groups(cfg.n_ff)
    base = {"tok_embd": model.params["tok_embd"],
            "output_norm_w": model.params["output_norm_w"],
            "output": model.params["output"],
            "layers": {k: v for k, v in model.params["layers"].items()
                       if not (k.endswith("_nx") or k.endswith("_rows")
                               or k == "w_all_rows")}}
    params_v6 = prepare_pipelined_params(base, cfg, scfg, layout="v6")

    rng = np.random.default_rng(17)
    B, T = 3, 4
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (B, T)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))

    # FFN-level comparison at a MATCHED selection (full-forward logits
    # diverge chaotically: ~1e-9 output differences flip top-k ties in
    # the next layer's carried selection)
    lp = {k: v[1] for k, v in params_v6["layers"].items()}
    lp.update(params_v6["sparse_flat"])
    xt = jnp.asarray(rng.standard_normal((B * T, cfg.n_embd)) * 0.3,
                     jnp.float32)
    from sparkinfer_tpu.sparse.predictor import predict_activations

    probs = predict_activations(
        {k: lp[k] for k in ("pred_up", "pred_up_b", "pred_down",
                            "pred_down_b")}, xt)
    from sparkinfer_tpu.sparse.ffn import select_groups

    idx = select_groups(probs, scfg, cfg.n_ff)
    gp = probs.reshape(B * T, ng, G)
    carry = {"idx": idx,
             "gp_sel": jnp.take_along_axis(gp, idx[..., None], axis=1)}
    x3 = xt.reshape(1, B * T, cfg.n_embd)
    il = jnp.int32(1)  # != 0 so every mode consumes the shared carry

    def run_ffn(mode, union_groups=None):
        ffn, _ = make_pipelined_sparse_ffn(cfg, scfg, mode=mode,
                                           union_groups=union_groups)
        y, _ = ffn(lp, x3, carry, il)
        return np.asarray(y)

    ref = run_ffn("pallas")
    got_g = run_ffn("gather_union", union_groups=ng)  # full union: exact
    np.testing.assert_allclose(got_g, ref, rtol=1e-4, atol=1e-4)
    got_p = run_ffn("pallas_union", union_groups=ng)
    np.testing.assert_allclose(got_p, ref, rtol=1e-3, atol=1e-3)

    # full forward with a truncated union still runs end-to-end
    ffn_t, ci_t = make_pipelined_sparse_ffn(cfg, scfg, mode="pallas_union",
                                            union_groups=4)
    fwd_t = jax.jit(make_forward(cfg, ffn_fn=ffn_t, ffn_carry_init=ci_t))
    lg, _ = fwd_t(params_v6, toks, pos, init_cache(cfg, B, 16, jnp.float32))
    assert np.isfinite(np.asarray(lg)).all()
