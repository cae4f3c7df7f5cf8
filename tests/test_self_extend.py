"""Self-Extend group attention: label-map parity vs a direct port of the
reference's seq_add/seq_div loop (tools/main/main.cpp:992-1004),
re-rotation exactness, and engine e2e."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sparkinfer_tpu.runtime.self_extend import (SelfExtendState, advance,
                                                apply_to_cache)


def ref_self_extend_labels(n_tokens: int, ga_n: int, ga_w: int) -> np.ndarray:
    """Direct port of the reference loop: positions array mutated by the
    seq_add / seq_div / seq_add triplet as n_past grows token by token."""
    pos = []
    ga_i = 0
    n_past = 0
    for _ in range(n_tokens):
        pos.append(n_past)  # new token's label
        n_past += 1
        while n_past >= ga_i + ga_w:
            ib = (ga_n * ga_i) // ga_w
            bd = (ga_w // ga_n) * (ga_n - 1)
            dd = (ga_w // ga_n) - ib * bd - ga_w
            p = np.asarray(pos)
            # seq_add(ga_i, n_past, ib*bd)
            m1 = (p >= ga_i) & (p < n_past)
            p = np.where(m1, p + ib * bd, p)
            # seq_div(ga_i+ib*bd, ga_i+ib*bd+ga_w, ga_n)
            m2 = (p >= ga_i + ib * bd) & (p < ga_i + ib * bd + ga_w)
            p = np.where(m2, p // ga_n, p)
            # seq_add(ga_i+ib*bd+ga_w, n_past+ib*bd, dd)
            m3 = (p >= ga_i + ib * bd + ga_w) & (p < n_past + ib * bd)
            p = np.where(m3, p + dd, p)
            pos = list(p)
            n_past -= bd
            ga_i += ga_w // ga_n
    return np.asarray(pos), n_past


@pytest.mark.parametrize("ga_n,ga_w,n", [(2, 8, 40), (4, 16, 100), (2, 4, 9)])
def test_label_map_matches_reference_loop(ga_n, ga_w, n):
    st = SelfExtendState(ga_n=ga_n, ga_w=ga_w)
    # feed tokens one at a time, mirroring the decode loop
    for t in range(1, n + 1):
        advance(st, t)
    ref, ref_n_past = ref_self_extend_labels(n, ga_n, ga_w)
    np.testing.assert_array_equal(st.labels[:n], ref)
    assert n - st.gamma == ref_n_past
    # labels stay within the compressed budget
    assert st.labels.max() < n


def test_labels_incremental_equals_batch():
    """Advancing once over N tokens equals advancing token-by-token."""
    a = SelfExtendState(ga_n=2, ga_w=8)
    for t in range(1, 61):
        advance(a, t)
    b = SelfExtendState(ga_n=2, ga_w=8)
    advance(b, 60)
    np.testing.assert_array_equal(a.labels[:60], b.labels[:60])
    assert a.gamma == b.gamma and a.ga_i == b.ga_i


def test_rerotation_exactness():
    """After advances, slot keys must equal roping the RAW keys directly at
    label+gamma — i.e. the incremental re-rotations compose exactly."""
    from sparkinfer_tpu.ops.rope import RopeParams, apply_rope
    from sparkinfer_tpu.runtime.kv_cache import KVCache

    rng = np.random.default_rng(0)
    L, B, S, H, D = 2, 1, 64, 2, 16
    raw_k = rng.standard_normal((L, B, S, H, D)).astype(np.float32)
    rp = RopeParams(dim=D, freq_base=10000.0, mode="neox")
    st = SelfExtendState(ga_n=2, ga_w=8)

    # simulate: token t written roped at physical position t, then advance
    k = jnp.zeros((L, B, S, H, D), jnp.float32)
    cache = KVCache(k=k, v=jnp.zeros_like(k))
    n = 40
    for t in range(n):
        pos = jnp.full((L, B, 1), t, jnp.int32)
        kt = apply_rope(jnp.asarray(raw_k[:, :, t : t + 1]), pos, rp)
        cache = cache._replace(k=cache.k.at[:, :, t : t + 1].set(kt))
        delta = advance(st, t + 1)
        if delta is not None:
            cache = apply_to_cache(cache, rp, delta)

    # oracle: rope raw keys directly at their final label+gamma
    rot = jnp.asarray(st.labels[:n] + st.gamma, jnp.int32)
    rot = jnp.broadcast_to(rot[None, None, :], (L, B, n))
    want = apply_rope(jnp.asarray(raw_k[:, :, :n]), rot, rp)
    np.testing.assert_allclose(np.asarray(cache.k[:, :, :n]), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_engine_self_extend_e2e(tmp_path):
    import sys

    sys.path.insert(0, "tests")
    from model_fixtures import make_tiny_llama

    from sparkinfer_tpu.models.loader import load_model
    from sparkinfer_tpu.runtime.engine import Engine
    from sparkinfer_tpu.runtime.sampling import SamplerConfig

    path = str(tmp_path / "t.gguf")
    make_tiny_llama(path)
    model = load_model(path, dtype=jnp.float32)
    eng = Engine(model, max_seq=96, sampler=SamplerConfig(temp=0.0),
                 self_extend=(2, 8))
    toks = eng.generate([5, 9, 42, 7], max_new_tokens=40)
    assert len(toks) == 40
    se = eng.self_extend
    assert se.ga_i > 0 and se.gamma > 0  # the loop actually fired
    # rope labels stayed compressed well below the physical position
    n_phys = 4 + 40
    assert se.labels[: n_phys - 1].max() < n_phys - se.gamma + se.ga_w

    # self-extend must be a no-op on SHORT generations (window never hit):
    eng2 = Engine(model, max_seq=96, sampler=SamplerConfig(temp=0.0),
                  self_extend=(2, 64))
    eng3 = Engine(model, max_seq=96, sampler=SamplerConfig(temp=0.0),
                  fused_chunk=0)
    a = eng2.generate([5, 9, 42, 7], max_new_tokens=12)
    b = eng3.generate([5, 9, 42, 7], max_new_tokens=12)
    assert a == b
