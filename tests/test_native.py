"""Native C++ host kernels vs their numpy oracles (build via make at import).

Mirrors the reference's test-backend-ops role for its native CPU kernels."""

import numpy as np
import pytest

from sparkinfer_tpu import native
from sparkinfer_tpu.gguf.constants import GGMLType
from sparkinfer_tpu.gguf.quants import dequantize, quantize

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_dequant_q4_0_matches_python():
    rng = np.random.default_rng(0)
    w = (rng.standard_normal(512) * 0.3).astype(np.float32)
    raw = quantize(w, GGMLType.Q4_0)
    want = dequantize(raw, GGMLType.Q4_0, 512)
    got = native.dequant_q4_0(raw, 512)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_dequant_q8_0_matches_python():
    rng = np.random.default_rng(1)
    w = (rng.standard_normal(512) * 0.3).astype(np.float32)
    raw = quantize(w, GGMLType.Q8_0)
    want = dequantize(raw, GGMLType.Q8_0, 512)
    got = native.dequant_q8_0(raw, 512)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_repack_matches_codec_oracle():
    from sparkinfer_tpu.gguf.quants import dequantize_tensor

    rng = np.random.default_rng(2)
    out_d, in_d = 8, 64
    w = (rng.standard_normal((out_d, in_d)) * 0.3).astype(np.float32)
    for gtype, nat, kind in [
        (GGMLType.Q4_0, native.repack_q4_0, "q4_0"),
        (GGMLType.Q8_0, native.repack_q8_0, "q8_0"),
    ]:
        raw = quantize(w, gtype)
        wdq = dequantize_tensor(raw, gtype, (out_d, in_d))
        qw, sc = nat(raw, out_d, in_d)
        if kind == "q4_0":
            b = qw.astype(np.int32)
            seq = np.stack([(b & 15) - 8, ((b >> 4) & 15) - 8], axis=-1).reshape(out_d, in_d)
        else:
            seq = qw.astype(np.int32)
        wre = (seq.reshape(out_d, in_d // 32, 32) * sc[..., None]).reshape(out_d, in_d)
        np.testing.assert_allclose(wre, wdq, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("act,gated", [("relu", False), ("fatrelu", True), ("drelu", True)])
def test_sparse_complement_matches_numpy(act, gated):
    rng = np.random.default_rng(3)
    N, ng, G, E = 3, 5, 8, 16
    x = rng.standard_normal((N, E)).astype(np.float32)
    up = rng.standard_normal((ng, G, E)).astype(np.float32)
    gate = rng.standard_normal((ng, G, E)).astype(np.float32) if gated else None
    down = rng.standard_normal((ng, G, E)).astype(np.float32)
    b_up = rng.standard_normal((ng, G)).astype(np.float32)
    probs = rng.uniform(0, 1, (N, ng, G)).astype(np.float32)
    cold = rng.uniform(0, 1, (N, ng)) > 0.5

    got = native.sparse_complement(x, up, gate, down, b_up, probs, cold, act,
                                   fatrelu_thr=0.1, prob_thr=0.5)

    want = np.zeros((N, E), np.float32)
    for n in range(N):
        for g in range(ng):
            if not cold[n, g]:
                continue
            u = x[n] @ up[g].reshape(G, E).T + b_up[g]
            if act == "relu":
                h = np.maximum(u, 0)
            elif act == "fatrelu":
                gt = x[n] @ gate[g].reshape(G, E).T
                h = np.where(gt > 0.1, gt, 0.0) * u
            else:
                gt = x[n] @ gate[g].reshape(G, E).T
                h = np.maximum(gt, 0) * np.maximum(u, 0)
            h = h * (probs[n, g] >= 0.5)
            want[n] += h @ down[g].reshape(G, E)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_reload_plan_matches_python():
    from sparkinfer_tpu.sparse.balancer import reload_plan as py_plan

    cur = np.asarray([3, 7, 9, 1], np.int32)
    want_set = np.asarray([3, 2, 9, 5], np.int32)
    nat = native.reload_plan(cur, want_set, 8)
    py = py_plan(cur, want_set, 8)
    assert sorted(nat) == sorted(py)
    assert native.reload_plan(cur, cur, 8) == []
    assert len(native.reload_plan(cur, want_set, 1)) == 1


def test_cold_store_uses_native():
    """ColdStore picks up the native path and still matches the jnp gather
    reference (exercised through test_tiering host-mode tests; here just
    assert wiring)."""
    from sparkinfer_tpu.sparse.tiering import ColdStore

    assert native.available()
    assert native.get_lib().spif_num_threads() >= 1
