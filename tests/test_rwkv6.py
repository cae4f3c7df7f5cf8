"""RWKV6: GGUF load + logit parity vs the numpy oracle (math transcribed
from ggml_compute_forward_rwkv_wkv6_f32 + src/models/rwkv6.cpp), stepwise
decode vs full-sequence state consistency, padding invariance, Engine
generation. transformers has no Rwkv6 class, so the oracle plays the role
the CPU backend plays in the reference's test-backend-ops."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from model_fixtures import make_tiny_rwkv6, ref_rwkv6_forward
from sparkinfer_tpu.gguf.constants import GGMLType
from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.models.rwkv6 import init_rwkv6_cache, make_rwkv6_forward

HS, ED, DD, RE = 8, 6, 7, 2


@pytest.fixture(scope="module")
def rwkv6_model(tmp_path_factory):
    p = tmp_path_factory.mktemp("rwkv6") / "tiny.gguf"
    raw = make_tiny_rwkv6(p, head_size=HS, ed=ED, dd=DD, rescale_every=RE)
    model = load_model(str(p), dtype=jnp.float32)
    return model, raw


def test_config_and_load(rwkv6_model):
    model, _ = rwkv6_model
    cfg = model.config
    assert cfg.traits.recurrent and cfg.traits.wkv_version == 6
    assert cfg.wkv_head_size == HS
    assert cfg.time_mix_extra_dim == ED and cfg.time_decay_extra_dim == DD
    assert cfg.rescale_every_n_layers == RE
    layers = model.params["layers"]
    assert layers["tm_w1"].shape == (cfg.n_layer, cfg.n_embd, 5 * ED)
    assert layers["tm_w2"].shape == (cfg.n_layer, 5, ED, cfg.n_embd)
    assert layers["tm_first"].shape == (cfg.n_layer, cfg.n_embd // HS, HS)


def test_logit_parity_vs_oracle(rwkv6_model):
    model, raw = rwkv6_model
    cfg = model.config
    rng = np.random.default_rng(3)
    toks = rng.integers(0, cfg.n_vocab, 7).astype(np.int32)

    ref, _ = ref_rwkv6_forward(
        raw, toks, n_layer=cfg.n_layer, head_size=HS, ed=ED, rescale_every=RE
    )

    fwd = jax.jit(make_rwkv6_forward(cfg))
    cache = init_rwkv6_cache(cfg, 1)
    got, _ = fwd(model.params, jnp.asarray(toks)[None], None, cache)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=2e-4, atol=2e-4)


def test_stepwise_matches_full(rwkv6_model):
    """Decode one token at a time (carrying state) must equal the full
    parallel prefill — the recurrent-state analogue of KV-cache parity."""
    model, _ = rwkv6_model
    cfg = model.config
    rng = np.random.default_rng(5)
    toks = rng.integers(0, cfg.n_vocab, 6).astype(np.int32)

    fwd = jax.jit(make_rwkv6_forward(cfg))
    full, _ = fwd(model.params, jnp.asarray(toks)[None], None,
                  init_rwkv6_cache(cfg, 1))

    cache = init_rwkv6_cache(cfg, 1)
    steps = []
    for tk in toks:
        lg, cache = fwd(model.params, jnp.full((1, 1), tk, jnp.int32), None, cache)
        steps.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.stack(steps), np.asarray(full[0]),
                               rtol=1e-4, atol=1e-4)


def test_trailing_padding_preserves_state(rwkv6_model):
    """tokens = -1 (bucket padding) must leave shift and wkv state exactly
    as if the padded tail were absent (ref: recurrent memory consumes every
    token, so padding must be a no-op)."""
    model, _ = rwkv6_model
    cfg = model.config
    rng = np.random.default_rng(7)
    toks = rng.integers(0, cfg.n_vocab, 4).astype(np.int32)
    fwd = jax.jit(make_rwkv6_forward(cfg))

    _, c_ref = fwd(model.params, jnp.asarray(toks)[None], None,
                   init_rwkv6_cache(cfg, 1))
    padded = np.concatenate([toks, np.full(3, -1, np.int32)])
    _, c_pad = fwd(model.params, jnp.asarray(padded)[None], None,
                   init_rwkv6_cache(cfg, 1))
    np.testing.assert_allclose(np.asarray(c_pad.shift), np.asarray(c_ref.shift),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_pad.wkv), np.asarray(c_ref.wkv),
                               rtol=1e-5, atol=1e-5)


def test_engine_generation(rwkv6_model, tmp_path):
    from sparkinfer_tpu.runtime import SamplerConfig
    from sparkinfer_tpu.runtime.engine import Engine

    model, _ = rwkv6_model
    eng = Engine(model, max_seq=64, sampler=SamplerConfig(temp=0.0))
    out = eng.generate([5, 9, 42], max_new_tokens=8)
    assert len(out) == 8
    assert all(0 <= t < model.config.n_vocab for t in out)
    # greedy is deterministic
    assert out == eng.generate([5, 9, 42], max_new_tokens=8)


def test_hf_converter_roundtrip(tmp_path):
    """Synthetic HF Rwkv6ForCausalLM checkpoint -> convert -> GGUF raw
    tensors feed the oracle; load_model logits must match (transformers has
    no Rwkv6 class, so the oracle is the parity target — its math is the
    ggml wkv6 kernel)."""
    import json as _json

    from safetensors.numpy import save_file

    from sparkinfer_tpu.gguf.reader import GGUFReader
    from sparkinfer_tpu.tools.convert_hf import convert

    rng = np.random.default_rng(21)
    L, E, V, F = 2, 64, 88, 96
    head_size, ed, dd = 16, 32, 64  # ed/dd are the converter's E<4096 defaults
    H = E // head_size
    rescale_every = 1  # exercises both the pre-divide and the runtime *0.5

    sd = {}
    w = lambda *s: (rng.standard_normal(s) * 0.3).astype(np.float32)
    sd["rwkv.embeddings.weight"] = w(V, E)
    sd["rwkv.blocks.0.pre_ln.weight"] = 1.0 + w(E) * 0.1
    sd["rwkv.blocks.0.pre_ln.bias"] = w(E) * 0.1
    sd["rwkv.ln_out.weight"] = 1.0 + w(E) * 0.1
    sd["rwkv.ln_out.bias"] = w(E) * 0.1
    sd["head.weight"] = w(V, E)
    for i in range(L):
        p = f"rwkv.blocks.{i}."
        sd[p + "ln1.weight"] = 1.0 + w(E) * 0.1
        sd[p + "ln1.bias"] = w(E) * 0.1
        sd[p + "ln2.weight"] = 1.0 + w(E) * 0.1
        sd[p + "ln2.bias"] = w(E) * 0.1
        a = p + "attention."
        sd[a + "time_maa_x"] = w(1, 1, E)
        for m in "wkvrg":
            sd[a + f"time_maa_{m}"] = w(1, 1, E)
        sd[a + "time_maa_w1"] = w(E, 5 * ed)
        sd[a + "time_maa_w2"] = w(5, ed, E)
        sd[a + "time_decay"] = w(1, 1, E) - 4.0
        sd[a + "time_decay_w1"] = w(E, dd)
        sd[a + "time_decay_w2"] = w(dd, E)
        sd[a + "time_faaaa"] = w(H, head_size)
        for nm in ("receptance", "key", "value", "gate", "output"):
            sd[a + nm + ".weight"] = w(E, E)
        sd[a + "ln_x.weight"] = 1.0 + w(E) * 0.1
        sd[a + "ln_x.bias"] = w(E) * 0.1
        f = p + "feed_forward."
        sd[f + "time_maa_k"] = w(1, 1, E)
        sd[f + "time_maa_r"] = w(1, 1, E)
        sd[f + "key.weight"] = w(F, E)
        sd[f + "receptance.weight"] = w(E, E)
        sd[f + "value.weight"] = w(E, F)

    d = tmp_path / "hf-rwkv6"
    d.mkdir()
    save_file(sd, str(d / "model.safetensors"))
    (d / "config.json").write_text(_json.dumps({
        "architectures": ["Rwkv6ForCausalLM"],
        "num_hidden_layers": L, "hidden_size": E, "vocab_size": V,
        "head_size": head_size, "rescale_every": rescale_every,
        "intermediate_size": F, "layer_norm_epsilon": 1e-5,
    }))

    out = tmp_path / "rwkv6.gguf"
    info = convert(str(d), str(out), out_type="f32")
    assert info["arch"] == "rwkv6"

    # oracle on the converted GGUF's raw tensors
    r = GGUFReader(str(out))
    raw = {name: t.to_f32() for name, t in r.tensors.items()}
    r.close()
    toks = rng.integers(0, V, 6).astype(np.int32)
    ref, _ = ref_rwkv6_forward(raw, toks, n_layer=L, head_size=head_size,
                               ed=ed, rescale_every=rescale_every)

    model = load_model(str(out), dtype=jnp.float32)
    assert model.config.rescale_every_n_layers == rescale_every
    fwd = jax.jit(make_rwkv6_forward(model.config))
    got, _ = fwd(model.params, jnp.asarray(toks)[None], None,
                 init_rwkv6_cache(model.config, 1))
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# rwkv6qwen2 (qrwkv)


def _make_tiny_rwkv6qwen2(path, L=2, E=32, N=8, Hkv=2, F=48, V=96,
                          ed=4, dd=6, seed=0):
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
        tensors[p + "time_mix_lerp_x.weight"] = 0.5 + 0.1 * w(E)
        tensors[p + "time_mix_lerp_fused.weight"] = (
            0.5 + 0.1 * w(5, 1, 1, E)).astype(np.float32)
        tensors[p + "time_mix_w1.weight"] = w(5 * ed, E)
        tensors[p + "time_mix_w2.weight"] = w(5, E, ed)
        tensors[p + "time_mix_decay_w1.weight"] = w(dd, E)
        tensors[p + "time_mix_decay_w2.weight"] = w(E, dd)
        tensors[p + "time_mix_decay.weight"] = w(E) - 0.5
        tensors[p + "time_mix_receptance.weight"] = w(H * N, E)
        tensors[p + "time_mix_key.weight"] = w(Hkv * N, E)
        tensors[p + "time_mix_value.weight"] = w(Hkv * N, E)
        tensors[p + "time_mix_receptance.bias"] = w(H * N, s=0.05)
        tensors[p + "time_mix_key.bias"] = w(Hkv * N, s=0.05)
        tensors[p + "time_mix_value.bias"] = w(Hkv * N, s=0.05)
        tensors[p + "time_mix_gate.weight"] = w(E, E)
        tensors[p + "time_mix_output.weight"] = w(E, E)
        tensors[p + "ffn_up.weight"] = w(F, E)
        tensors[p + "ffn_gate.weight"] = w(F, E)
        tensors[p + "ffn_down.weight"] = w(E, F)

    wr = GGUFWriter(str(path), "rwkv6qwen2")
    for k, v in (("block_count", L), ("embedding_length", E),
                 ("feed_forward_length", F), ("vocab_size", V),
                 ("context_length", 128), ("wkv.head_size", N),
                 ("attention.head_count", H),
                 ("attention.head_count_kv", Hkv),
                 ("time_mix_extra_dim", ed),
                 ("time_decay_extra_dim", dd)):
        wr.add_kv(f"rwkv6qwen2.{k}", np.uint32(v))
    wr.add_kv("rwkv6qwen2.attention.layer_norm_rms_epsilon", np.float32(1e-5))
    for name, data in tensors.items():
        wr.add_tensor(name, data, GGMLType.F32)
    wr.write()
    return tensors


def _np_rms(x, w, eps=1e-5):
    return x / np.sqrt(np.mean(x * x, -1, keepdims=True) + eps) * w


def _ref_rwkv6qwen2(tensors, toks, L=2, E=32, N=8, Hkv=2):
    """Independent numpy oracle following rwkv6qwen2.cpp +
    rwkv6-base.cpp is_qrwkv semantics directly."""
    H = E // N
    rep = H // Hkv
    x = tensors["token_embd.weight"][toks]  # (T, E)
    T = x.shape[0]
    for i in range(L):
        p = f"blk.{i}."
        xn = _np_rms(x, tensors[p + "attn_norm.weight"])
        x_prev = np.concatenate([np.zeros((1, E), np.float32), xn[:-1]], 0)
        sx = x_prev - xn
        xxx = xn + sx * tensors[p + "time_mix_lerp_x.weight"]
        tm = np.tanh(xxx @ tensors[p + "time_mix_w1.weight"].T)
        ed = tm.shape[-1] // 5
        tm = tm.reshape(T, 5, ed)
        w2 = tensors[p + "time_mix_w2.weight"]  # (5, E, ed)
        deltas = np.einsum("tme,med->tmd", tm, np.swapaxes(w2, 1, 2))
        mu = tensors[p + "time_mix_lerp_fused.weight"].reshape(5, E)
        xm = xn[:, None] + sx[:, None] * (deltas + mu[None])
        xw, xk, xv, xr, xg = [xm[:, m] for m in range(5)]
        r = xr @ tensors[p + "time_mix_receptance.weight"].T \
            + tensors[p + "time_mix_receptance.bias"]
        k = xk @ tensors[p + "time_mix_key.weight"].T \
            + tensors[p + "time_mix_key.bias"]
        v = xv @ tensors[p + "time_mix_value.weight"].T \
            + tensors[p + "time_mix_value.bias"]
        g = 1.0 / (1.0 + np.exp(-(xg @ tensors[p + "time_mix_gate.weight"].T)))
        dec = np.tanh(xw @ tensors[p + "time_mix_decay_w1.weight"].T) \
            @ tensors[p + "time_mix_decay_w2.weight"].T \
            + tensors[p + "time_mix_decay.weight"]
        wdec = np.exp(-np.exp(dec)).reshape(T, H, N)
        k = np.repeat(k.reshape(T, Hkv, N), rep, axis=1) * (1.0 - wdec)
        v = np.repeat(v.reshape(T, Hkv, N), rep, axis=1)
        rr = r.reshape(T, H, N)
        S = np.zeros((H, N, N), np.float32)
        outs = []
        for t in range(T):
            S = S * wdec[t][:, :, None] + k[t][:, :, None] * v[t][:, None, :]
            outs.append(N ** -0.5 * np.einsum("hi,hij->hj", rr[t], S))
        y = np.stack(outs).reshape(T, E) * g
        x = x + y @ tensors[p + "time_mix_output.weight"].T
        h = _np_rms(x, tensors[p + "ffn_norm.weight"])
        up = h @ tensors[p + "ffn_up.weight"].T
        gate = h @ tensors[p + "ffn_gate.weight"].T
        gate = gate / (1.0 + np.exp(-gate))
        x = x + (gate * up) @ tensors[p + "ffn_down.weight"].T
    x = _np_rms(x, tensors["output_norm.weight"])
    return x @ tensors["output.weight"].T


def test_rwkv6qwen2_oracle_parity(tmp_path):
    from sparkinfer_tpu.models.loader import load_model
    from sparkinfer_tpu.models.rwkv6 import (init_rwkv6_cache,
                                             make_rwkv6qwen2_forward)

    p = tmp_path / "qrwkv.gguf"
    tensors = _make_tiny_rwkv6qwen2(p)
    model = load_model(str(p), dtype=jnp.float32)
    cfg = model.config
    assert cfg.arch == "rwkv6qwen2" and cfg.n_head_kv == 2

    toks = np.random.default_rng(1).integers(0, 96, 7)
    ref = _ref_rwkv6qwen2(tensors, toks)
    fwd = jax.jit(make_rwkv6qwen2_forward(cfg))
    cache = init_rwkv6_cache(cfg, 1)
    logits, _ = fwd(model.params, jnp.asarray(toks, jnp.int32)[None],
                    jnp.arange(7, dtype=jnp.int32)[None], cache)
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=2e-4, atol=2e-4)


def test_rwkv6qwen2_stepwise_and_engine(tmp_path):
    from sparkinfer_tpu.models.loader import load_model
    from sparkinfer_tpu.models.rwkv6 import (init_rwkv6_cache,
                                             make_rwkv6qwen2_forward)
    from sparkinfer_tpu.runtime import SamplerConfig
    from sparkinfer_tpu.runtime.engine import Engine

    p = tmp_path / "qrwkv.gguf"
    _make_tiny_rwkv6qwen2(p)
    model = load_model(str(p), dtype=jnp.float32)
    cfg = model.config
    fwd = jax.jit(make_rwkv6qwen2_forward(cfg))
    toks = np.random.default_rng(2).integers(0, 96, 6).astype(np.int32)
    full, _ = fwd(model.params, jnp.asarray(toks)[None],
                  jnp.arange(6, dtype=jnp.int32)[None],
                  init_rwkv6_cache(cfg, 1))
    cache = init_rwkv6_cache(cfg, 1)
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
