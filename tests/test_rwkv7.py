"""RWKV7 (Goose): GGUF load + logit parity vs the numpy oracle (math
transcribed from ggml_compute_forward_rwkv_wkv7_f32 +
src/models/rwkv7-base.cpp), stepwise decode vs full-sequence state
consistency, and Engine generation. transformers has no Rwkv7 class, so
the oracle plays the role the CPU backend plays in the reference's
test-backend-ops."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from model_fixtures import make_tiny_rwkv7, ref_rwkv7_forward
from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.models.rwkv7 import (
    init_rwkv7_cache,
    make_rwkv7_forward,
)

HS = 8


@pytest.fixture(scope="module")
def rwkv7_model(tmp_path_factory):
    p = tmp_path_factory.mktemp("rwkv7") / "tiny.gguf"
    raw = make_tiny_rwkv7(p, head_size=HS)
    model = load_model(str(p), dtype=jnp.float32)
    return model, raw


def test_config_and_load(rwkv7_model):
    model, _ = rwkv7_model
    cfg = model.config
    assert cfg.traits.recurrent and cfg.traits.wkv_version == 7
    assert cfg.wkv_head_size == HS
    layers = model.params["layers"]
    assert layers["lerp_fused"].shape == (cfg.n_layer, 6, cfg.n_embd)
    assert layers["tm_w1"].shape[1] == cfg.n_embd  # (L, E, dr)


def test_logit_parity_vs_oracle(rwkv7_model):
    model, raw = rwkv7_model
    cfg = model.config
    rng = np.random.default_rng(3)
    toks = rng.integers(0, cfg.n_vocab, 7).astype(np.int32)

    ref, _ = ref_rwkv7_forward(raw, toks, n_layer=cfg.n_layer, head_size=HS)

    fwd = jax.jit(make_rwkv7_forward(cfg))
    cache = init_rwkv7_cache(cfg, 1)
    got, _ = fwd(model.params, jnp.asarray(toks)[None], None, cache)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=2e-4, atol=2e-4)


def test_stepwise_matches_full(rwkv7_model):
    """Decode one token at a time (carrying state) must equal the full
    parallel prefill — the recurrent-state analogue of KV-cache parity."""
    model, _ = rwkv7_model
    cfg = model.config
    rng = np.random.default_rng(5)
    toks = rng.integers(0, cfg.n_vocab, 6).astype(np.int32)

    fwd = jax.jit(make_rwkv7_forward(cfg))
    cache = init_rwkv7_cache(cfg, 1)
    full, cache_full = fwd(model.params, jnp.asarray(toks)[None], None, cache)

    cache = init_rwkv7_cache(cfg, 1)
    outs = []
    for tok in toks:
        lg, cache = fwd(model.params, jnp.asarray([[tok]]), None, cache)
        outs.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(
        np.stack(outs), np.asarray(full[0]), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(cache.wkv), np.asarray(cache_full.wkv), rtol=2e-4, atol=2e-4
    )


def test_padding_invariance(rwkv7_model):
    """Trailing -1 padding must not perturb logits or carried state."""
    model, _ = rwkv7_model
    cfg = model.config
    toks = np.array([5, 11, 42], np.int32)
    fwd = jax.jit(make_rwkv7_forward(cfg))
    a, ca = fwd(model.params, jnp.asarray(toks)[None], None,
                init_rwkv7_cache(cfg, 1))
    padded = np.concatenate([toks, -np.ones(3, np.int32)])
    b, cb = fwd(model.params, jnp.asarray(padded)[None], None,
                init_rwkv7_cache(cfg, 1))
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0, :3]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ca.wkv), np.asarray(cb.wkv),
                               rtol=1e-5, atol=1e-5)


def test_engine_generation(rwkv7_model, tmp_path):
    model, _ = rwkv7_model
    from sparkinfer_tpu.runtime.engine import Engine
    from sparkinfer_tpu.runtime.sampling import SamplerConfig

    eng = Engine(model, max_seq=64, sampler=SamplerConfig(temp=0.0))
    out = eng.generate([5, 9, 42], max_new_tokens=8)
    assert len(out) == 8
    out2 = eng.generate([5, 9, 42], max_new_tokens=8)
    assert out == out2


# ---------------------------------------------------------------------------
# arwkv7 (rwkv7 time-mix in a qwen-shaped block)


def _make_tiny_arwkv7(path, L=2, E=32, N=8, F=48, V=96, dr=4, seed=0):
    from sparkinfer_tpu.gguf.constants import GGMLType
    from sparkinfer_tpu.gguf.writer import GGUFWriter

    H = E // N
    rng = np.random.default_rng(seed)

    def w(*shape, s=0.2):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    tensors = {"token_embd.weight": w(V, E),
               "output_norm.weight": 1.0 + 0.1 * w(E),
               "output.weight": w(V, E)}
    for i in range(L):
        p = f"blk.{i}."
        tensors[p + "attn_norm.weight"] = 1.0 + 0.1 * w(E)
        tensors[p + "ffn_norm.weight"] = 1.0 + 0.1 * w(E)
        tensors[p + "time_mix_lerp_fused.weight"] = 0.5 + 0.1 * w(6, 1, 1, E)
        tensors[p + "time_mix_w0.weight"] = w(E) - 0.5
        tensors[p + "time_mix_w1.weight"] = w(dr, E)
        tensors[p + "time_mix_w2.weight"] = w(E, dr)
        tensors[p + "time_mix_a0.weight"] = w(E)
        tensors[p + "time_mix_a1.weight"] = w(dr, E)
        tensors[p + "time_mix_a2.weight"] = w(E, dr)
        tensors[p + "time_mix_v0.weight"] = w(E)
        tensors[p + "time_mix_v1.weight"] = w(dr, E)
        tensors[p + "time_mix_v2.weight"] = w(E, dr)
        tensors[p + "time_mix_g1.weight"] = w(dr, E)
        tensors[p + "time_mix_g2.weight"] = w(E, dr)
        tensors[p + "time_mix_k_k.weight"] = 0.5 + 0.1 * w(E)
        tensors[p + "time_mix_k_a.weight"] = 0.5 + 0.1 * w(E)
        tensors[p + "time_mix_r_k.weight"] = w(E)
        tensors[p + "time_mix_receptance.weight"] = w(E, E)
        tensors[p + "time_mix_key.weight"] = w(E, E)
        tensors[p + "time_mix_value.weight"] = w(E, E)
        tensors[p + "time_mix_output.weight"] = w(E, E)
        tensors[p + "ffn_up.weight"] = w(F, E)
        tensors[p + "ffn_gate.weight"] = w(F, E)
        tensors[p + "ffn_down.weight"] = w(E, F)

    wr = GGUFWriter(str(path), "arwkv7")
    for k, v in (("block_count", L), ("embedding_length", E),
                 ("feed_forward_length", F), ("vocab_size", V),
                 ("context_length", 128), ("wkv.head_size", N),
                 ("attention.head_count", H)):
        wr.add_kv(f"arwkv7.{k}", np.uint32(v))
    wr.add_kv("arwkv7.attention.layer_norm_rms_epsilon", np.float32(1e-5))
    for name, data in tensors.items():
        wr.add_tensor(name, data, GGMLType.F32)
    wr.write()
    return tensors


def _sig(x):
    return 1.0 / (1.0 + np.exp(-x))


def _ref_arwkv7(tensors, toks, L=2, E=32, N=8):
    """Independent numpy oracle: arwkv7.cpp + rwkv7-base.cpp math."""
    H = E // N

    def rms(x, w, eps=1e-5):
        return x / np.sqrt(np.mean(x * x, -1, keepdims=True) + eps) * w

    x = tensors["token_embd.weight"][toks]
    T = x.shape[0]
    v_first = None
    for i in range(L):
        p = f"blk.{i}."
        xn = rms(x, tensors[p + "attn_norm.weight"])
        x_prev = np.concatenate([np.zeros((1, E), np.float32), xn[:-1]], 0)
        sx = x_prev - xn
        mu = tensors[p + "time_mix_lerp_fused.weight"].reshape(6, E)
        xm = xn[:, None] + sx[:, None] * mu[None]
        xr, xw, xk, xv, xa, xg = [xm[:, m] for m in range(6)]
        r = xr @ tensors[p + "time_mix_receptance.weight"].T
        wl = np.tanh(xw @ tensors[p + "time_mix_w1.weight"].T) \
            @ tensors[p + "time_mix_w2.weight"].T \
            + tensors[p + "time_mix_w0.weight"]
        wdec = np.exp(-0.606531 * _sig(wl))
        k = xk @ tensors[p + "time_mix_key.weight"].T
        v = xv @ tensors[p + "time_mix_value.weight"].T
        if v_first is None:
            v_first = v
        else:
            vm = _sig(xv @ tensors[p + "time_mix_v1.weight"].T
                      @ tensors[p + "time_mix_v2.weight"].T
                      + tensors[p + "time_mix_v0.weight"])
            v = v + (v_first - v) * vm
        g = _sig(xg @ tensors[p + "time_mix_g1.weight"].T) \
            @ tensors[p + "time_mix_g2.weight"].T
        a = _sig(xa @ tensors[p + "time_mix_a1.weight"].T
                 @ tensors[p + "time_mix_a2.weight"].T
                 + tensors[p + "time_mix_a0.weight"])
        kk = (k * tensors[p + "time_mix_k_k.weight"]).reshape(T, H, N)
        kk = kk / np.maximum(np.linalg.norm(kk, axis=-1, keepdims=True),
                             1e-12)
        kf = k + k * tensors[p + "time_mix_k_a.weight"] * (a - 1.0)
        rr = r.reshape(T, H, N)
        ww = wdec.reshape(T, H, N)
        kh = kf.reshape(T, H, N)
        vh = v.reshape(T, H, N)
        ah = (-kk)
        bh = kk * a.reshape(T, H, N)
        S = np.zeros((H, N, N), np.float32)  # [i=value, j=key]
        outs = []
        for t in range(T):
            sa = np.einsum("hij,hj->hi", S, ah[t])
            S = (S * ww[t][:, None, :] + vh[t][:, :, None] * kh[t][:, None, :]
                 + sa[:, :, None] * bh[t][:, None, :])
            outs.append(np.einsum("hij,hj->hi", S, rr[t]))
        y = np.stack(outs).reshape(T, E)
        rk = (rr * kh * tensors[p + "time_mix_r_k.weight"].reshape(H, N)
              ).sum(-1, keepdims=True)
        y = y + (vh * rk).reshape(T, E)
        y = y * g
        x = x + y @ tensors[p + "time_mix_output.weight"].T
        h = rms(x, tensors[p + "ffn_norm.weight"])
        up = h @ tensors[p + "ffn_up.weight"].T
        gate = h @ tensors[p + "ffn_gate.weight"].T
        x = x + (gate * _sig(gate) * up) @ tensors[p + "ffn_down.weight"].T
    x = rms(x, tensors["output_norm.weight"])
    return x @ tensors["output.weight"].T


def test_arwkv7_oracle_parity(tmp_path):
    from sparkinfer_tpu.models.loader import load_model
    from sparkinfer_tpu.models.rwkv7 import (init_rwkv7_cache,
                                             make_arwkv7_forward)

    p = tmp_path / "arwkv7.gguf"
    tensors = _make_tiny_arwkv7(p)
    model = load_model(str(p), dtype=jnp.float32)
    cfg = model.config
    assert cfg.arch == "arwkv7"

    toks = np.random.default_rng(1).integers(0, 96, 7)
    ref = _ref_arwkv7(tensors, toks)
    fwd = jax.jit(make_arwkv7_forward(cfg))
    logits, _ = fwd(model.params, jnp.asarray(toks, jnp.int32)[None],
                    jnp.arange(7, dtype=jnp.int32)[None],
                    init_rwkv7_cache(cfg, 1))
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=2e-4, atol=2e-4)


def test_arwkv7_stepwise_and_engine(tmp_path):
    from sparkinfer_tpu.models.loader import load_model
    from sparkinfer_tpu.models.rwkv7 import (init_rwkv7_cache,
                                             make_arwkv7_forward)
    from sparkinfer_tpu.runtime import SamplerConfig
    from sparkinfer_tpu.runtime.engine import Engine

    p = tmp_path / "arwkv7.gguf"
    _make_tiny_arwkv7(p)
    model = load_model(str(p), dtype=jnp.float32)
    cfg = model.config
    fwd = jax.jit(make_arwkv7_forward(cfg))
    toks = np.random.default_rng(2).integers(0, 96, 6).astype(np.int32)
    full, _ = fwd(model.params, jnp.asarray(toks)[None],
                  jnp.arange(6, dtype=jnp.int32)[None],
                  init_rwkv7_cache(cfg, 1))
    cache = init_rwkv7_cache(cfg, 1)
    outs = []
    for t, tok in enumerate(toks):
        lg, cache = fwd(model.params, jnp.asarray([[tok]], jnp.int32),
                        jnp.full((1, 1), t, jnp.int32), cache)
        outs.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.stack(outs), np.asarray(full[0]),
                               rtol=2e-4, atol=2e-4)

    eng = Engine(model, max_seq=32, sampler=SamplerConfig(temp=0.0))
    out = eng.generate(list(map(int, toks)), max_new_tokens=4)
    assert len(out) == 4 and all(0 <= t < 96 for t in out)
