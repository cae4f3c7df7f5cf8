"""Dense engine end-to-end: tiny GGUF -> loader -> jitted forward vs numpy
oracle, plus prefill/decode KV-cache consistency.

Mirrors the reference's test strategy (SURVEY.md §4): CPU oracle as the
universal numerical reference, tiny models as the universal fixture."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.models.transformer import make_forward
from sparkinfer_tpu.runtime.engine import Engine
from sparkinfer_tpu.runtime.kv_cache import init_cache
from sparkinfer_tpu.runtime.sampling import SamplerConfig

from model_fixtures import make_tiny_llama, ref_llama_forward

N_HEAD, N_HEAD_KV = 4, 2


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny-llama.gguf"
    tensors = make_tiny_llama(path, n_head=N_HEAD, n_head_kv=N_HEAD_KV)
    model = load_model(str(path), dtype=jnp.float32)
    return model, tensors


def test_config_from_gguf(tiny_model):
    model, _ = tiny_model
    cfg = model.config
    assert cfg.arch == "llama"
    assert cfg.n_layer == 2
    assert cfg.n_embd == 64
    assert cfg.n_head == N_HEAD
    assert cfg.n_head_kv == N_HEAD_KV
    assert cfg.n_vocab == 199
    assert cfg.head_dim == 16
    assert not cfg.has_predictors


def test_forward_matches_numpy_oracle(tiny_model):
    model, tensors = tiny_model
    cfg = model.config
    T = 7
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, cfg.n_vocab, size=T).astype(np.int32)

    ref = ref_llama_forward(tensors, tokens, n_head=N_HEAD, n_head_kv=N_HEAD_KV)

    fwd = make_forward(cfg)
    cache = init_cache(cfg, batch=1, max_seq=16, dtype=jnp.float32)
    logits, _ = jax.jit(fwd)(
        model.params,
        jnp.asarray(tokens)[None, :],
        jnp.arange(T, dtype=jnp.int32)[None, :],
        cache,
    )
    got = np.asarray(logits)[0]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_prefill_then_decode_matches_full_forward(tiny_model):
    """KV-cache path: forward(prompt) then stepwise decode must equal one
    full forward over the whole sequence (the cache is exact)."""
    model, tensors = tiny_model
    cfg = model.config
    rng = np.random.default_rng(11)
    full = rng.integers(0, cfg.n_vocab, size=9).astype(np.int32)
    n_pre = 5

    fwd = jax.jit(make_forward(cfg))
    # full forward
    cache = init_cache(cfg, 1, 16, jnp.float32)
    logits_full, _ = fwd(
        model.params, jnp.asarray(full)[None], jnp.arange(9, dtype=jnp.int32)[None], cache
    )
    # prefill + stepwise
    cache = init_cache(cfg, 1, 16, jnp.float32)
    logits_pre, cache = fwd(
        model.params,
        jnp.asarray(full[:n_pre])[None],
        jnp.arange(n_pre, dtype=jnp.int32)[None],
        cache,
    )
    step_logits = [np.asarray(logits_pre)[0, -1]]
    for t in range(n_pre, 9):
        lg, cache = fwd(
            model.params,
            jnp.asarray(full[t : t + 1])[None],
            jnp.full((1, 1), t, jnp.int32),
            cache,
        )
        step_logits.append(np.asarray(lg)[0, -1])

    ref_rows = np.asarray(logits_full)[0, n_pre - 1 :]
    np.testing.assert_allclose(np.stack(step_logits), ref_rows, rtol=1e-4, atol=1e-4)


def test_prefill_padding_is_harmless(tiny_model):
    """Engine pads prompts to bucket lengths; padded tail must not change
    the sampled logits (padding KV writes are masked/overwritten)."""
    model, _ = tiny_model
    cfg = model.config
    fwd = jax.jit(make_forward(cfg))
    rng = np.random.default_rng(5)
    n = 6
    toks = rng.integers(0, cfg.n_vocab, size=n).astype(np.int32)

    cache = init_cache(cfg, 1, 32, jnp.float32)
    exact, _ = fwd(model.params, jnp.asarray(toks)[None], jnp.arange(n, dtype=jnp.int32)[None], cache)

    pad_to = 16
    padded = np.zeros(pad_to, np.int32)
    padded[:n] = toks
    cache = init_cache(cfg, 1, 32, jnp.float32)
    pl, _ = fwd(
        model.params, jnp.asarray(padded)[None], jnp.arange(pad_to, dtype=jnp.int32)[None], cache
    )
    np.testing.assert_allclose(
        np.asarray(pl)[0, n - 1], np.asarray(exact)[0, n - 1], rtol=1e-4, atol=1e-4
    )


def test_engine_greedy_generation_deterministic(tiny_model):
    model, _ = tiny_model
    eng = Engine(model, max_seq=64, sampler=SamplerConfig(temp=0.0), kv_dtype=jnp.float32)
    prompt = [3, 14, 15, 92]
    out1 = eng.generate(prompt, max_new_tokens=8)
    out2 = eng.generate(prompt, max_new_tokens=8)
    assert out1 == out2
    assert len(out1) == 8
    assert all(0 <= t < model.config.n_vocab for t in out1)


def test_readback_batch_stream_parity(tiny_model, monkeypatch):
    """The pipelined generator's batched D2H readback (one round trip per
    readback_batch tokens — the relay-latency amortization) must emit the
    identical stream at every batch size, including stop-id truncation
    and the max_new_tokens cap."""
    model, _ = tiny_model
    ref = None
    for rb in ("1", "3", "16", "64"):
        monkeypatch.setenv("SPARK_READBACK_BATCH", rb)
        eng = Engine(model, max_seq=64, sampler=SamplerConfig(temp=0.0),
                     kv_dtype=jnp.float32)
        out = eng.generate([5, 9, 42], max_new_tokens=11)
        assert len(out) == 11
        if ref is None:
            ref = out
        assert out == ref, rb
        # stop at the first token that is not also an earlier token
        stop_i = next(i for i in range(1, 11) if ref[i] not in ref[:i])
        assert eng.generate([5, 9, 42], max_new_tokens=11,
                            stop_ids={ref[stop_i]}) == ref[:stop_i], rb
        assert eng.generate([5, 9, 42], max_new_tokens=5) == ref[:5], rb


def test_engine_greedy_matches_stepwise_argmax(tiny_model):
    """Engine output must equal argmax over the oracle's logits chain."""
    model, tensors = tiny_model
    eng = Engine(model, max_seq=64, sampler=SamplerConfig(temp=0.0), kv_dtype=jnp.float32)
    prompt = [3, 14, 15, 92]
    out = eng.generate(prompt, max_new_tokens=5)

    seq = list(prompt)
    for i in range(5):
        logits = ref_llama_forward(
            tensors, np.asarray(seq, np.int32), n_head=N_HEAD, n_head_kv=N_HEAD_KV
        )
        nxt = int(np.argmax(logits[-1]))
        assert nxt == out[i], f"step {i}: oracle {nxt} vs engine {out[i]}"
        seq.append(nxt)


def test_int8_kv_cache_close_to_exact(tiny_model):
    model, _ = tiny_model
    cfg = model.config
    fwd = jax.jit(make_forward(cfg))
    rng = np.random.default_rng(7)
    toks = rng.integers(0, cfg.n_vocab, size=8).astype(np.int32)
    pos = jnp.arange(8, dtype=jnp.int32)[None]

    exact, _ = fwd(
        model.params, jnp.asarray(toks)[None], pos, init_cache(cfg, 1, 16, jnp.float32)
    )
    quant, _ = fwd(
        model.params,
        jnp.asarray(toks)[None],
        pos,
        init_cache(cfg, 1, 16, quantized=True),
    )
    # int8 KV is approximate; logits should still agree to ~1e-2
    np.testing.assert_allclose(np.asarray(quant), np.asarray(exact), rtol=0.08, atol=0.08)
    assert np.array_equal(
        np.argmax(np.asarray(quant)[0, -1]), np.argmax(np.asarray(exact)[0, -1])
    )


def test_fresh_prefill_matches_general(tiny_model):
    """Chunk-local prefill attention (flash path on TPU) must equal the
    cache-read path for a from-scratch prompt."""
    model, _ = tiny_model
    cfg = model.config
    rng = np.random.default_rng(21)
    T = 8
    toks = rng.integers(0, cfg.n_vocab, T).astype(np.int32)
    pos = jnp.arange(T, dtype=jnp.int32)[None]

    general = jax.jit(make_forward(cfg))
    fresh = jax.jit(make_forward(cfg, fresh_prefill=True))
    lg_a, cache_a = general(model.params, jnp.asarray(toks)[None], pos,
                            init_cache(cfg, 1, 32, jnp.float32))
    lg_b, cache_b = fresh(model.params, jnp.asarray(toks)[None], pos,
                          init_cache(cfg, 1, 32, jnp.float32))
    np.testing.assert_allclose(np.asarray(lg_b), np.asarray(lg_a), rtol=1e-4, atol=1e-4)
    # caches must be identical too (decode continues off either)
    np.testing.assert_allclose(np.asarray(cache_b.k), np.asarray(cache_a.k),
                               rtol=1e-5, atol=1e-6)


def test_context_shift_rope_relabeling(tiny_model):
    """shift_cache must relabel K rows exactly as if they had been roped at
    the shifted positions (RoPE additivity), and generation must run past
    max_seq via shifting."""
    from sparkinfer_tpu.models.transformer import rope_params
    from sparkinfer_tpu.ops.rope import apply_rope
    from sparkinfer_tpu.runtime.kv_cache import KVCache, shift_cache

    model, _ = tiny_model
    cfg = model.config
    rp = rope_params(cfg)
    rng = np.random.default_rng(31)
    L, B, S, Hkv, D = cfg.n_layer, 1, 16, cfg.n_head_kv, cfg.head_dim
    T = 12
    raw = jnp.asarray(rng.standard_normal((L, B, T, Hkv, D)).astype(np.float32))
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, None], (L, B, T))
    roped = apply_rope(raw, pos, rp)

    k = jnp.zeros((L, B, S, Hkv, D), jnp.float32).at[:, :, :T].set(roped)
    v = jnp.asarray(rng.standard_normal((L, B, S, Hkv, D)).astype(np.float32))
    cache = KVCache(k=k, v=v)

    keep, discard = 2, 4
    shifted = shift_cache(cache, rp, keep, discard, T)

    # rows keep..T-discard must equal raw[keep+discard:] roped at pos-d
    want = apply_rope(raw[:, :, keep + discard :], pos[:, :, keep + discard :] - discard, rp)
    got = shifted.k[:, :, keep : T - discard]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    # untouched prefix + V slide
    np.testing.assert_allclose(np.asarray(shifted.k[:, :, :keep]), np.asarray(k[:, :, :keep]))
    np.testing.assert_allclose(
        np.asarray(shifted.v[:, :, keep : T - discard]),
        np.asarray(v[:, :, keep + discard : T]),
    )

    # engine runs past max_seq without error
    eng = Engine(model, max_seq=24, sampler=SamplerConfig(temp=0.0),
                 kv_dtype=jnp.float32, donate_cache=False)
    out = eng.generate([1, 2, 3], max_new_tokens=40)
    assert len(out) == 40


def test_final_logit_softcap(tiny_model):
    """gemma2-style soft capping bounds logits to ±cap (trait-driven)."""
    import dataclasses

    from sparkinfer_tpu.models.config import ARCH_REGISTRY, ArchTraits

    model, _ = tiny_model
    cfg = dataclasses.replace(model.config)
    # register a capped clone of llama traits
    base = ARCH_REGISTRY["llama"]
    ARCH_REGISTRY["_capped_llama"] = dataclasses.replace(
        base, name="_capped_llama", final_logit_softcap=2.0)
    try:
        cfg.arch = "_capped_llama"
        fwd = jax.jit(make_forward(cfg))
        toks = np.asarray([3, 14, 15], np.int32)
        lg, _ = fwd(model.params, jnp.asarray(toks)[None],
                    jnp.arange(3, dtype=jnp.int32)[None],
                    init_cache(cfg, 1, 8, jnp.float32))
        lg = np.asarray(lg)
        assert np.abs(lg).max() <= 2.0 + 1e-5
        # uncapped reference exceeds the cap somewhere (sanity)
        fwd0 = jax.jit(make_forward(model.config))
        lg0, _ = fwd0(model.params, jnp.asarray(toks)[None],
                      jnp.arange(3, dtype=jnp.int32)[None],
                      init_cache(model.config, 1, 8, jnp.float32))
        assert np.abs(np.asarray(lg0)).max() > 2.0
    finally:
        del ARCH_REGISTRY["_capped_llama"]


def test_chunked_prefill_matches_single_shot(tiny_model):
    """Long prompts prefill in fixed chunks; continuation must equal the
    single-shot path exactly."""
    model, _ = tiny_model
    eng = Engine(model, max_seq=128, sampler=SamplerConfig(temp=0.0),
                 kv_dtype=jnp.float32, donate_cache=False)
    rng = np.random.default_rng(41)
    prompt = rng.integers(0, model.config.n_vocab, 50).astype(np.int32).tolist()
    want = eng.generate(prompt, max_new_tokens=6)

    eng2 = Engine(model, max_seq=128, sampler=SamplerConfig(temp=0.0),
                  kv_dtype=jnp.float32, donate_cache=False)
    eng2.prefill_chunk = 16  # force chunking (4 chunks)
    got = eng2.generate(prompt, max_new_tokens=6)
    assert got == want


def test_generate_past_max_seq_via_context_shift(tiny_model):
    """Passkey-style E2E (ref examples/passkey): generation must continue
    past max_seq by discarding the middle and keeping the prompt (n_keep),
    and tokens emitted BEFORE the first shift must be identical to an
    unshifted run with a roomy cache."""
    from sparkinfer_tpu.runtime.engine import Engine
    from sparkinfer_tpu.runtime.sampling import SamplerConfig

    tiny_model, _ = tiny_model
    prompt = [5, 9, 42, 7, 11, 3, 8, 2]
    big = Engine(tiny_model, max_seq=128, sampler=SamplerConfig(temp=0.0),
                 kv_dtype=jnp.float32, donate_cache=False)
    want = big.generate(prompt, max_new_tokens=40)

    small = Engine(tiny_model, max_seq=24, sampler=SamplerConfig(temp=0.0),
                  kv_dtype=jnp.float32, donate_cache=False)
    got = small.generate(prompt, max_new_tokens=40)
    assert len(got) == 40  # survived ≥2 shifts
    # before the cache filled (24 - 8 = 16 decodes) the runs agree exactly
    n_pre = 24 - len(prompt) - 1
    assert got[:n_pre] == want[:n_pre]
    # deterministic across repeats (shift path included)
    assert small.generate(prompt, max_new_tokens=40) == got


def test_fused_decode_matches_per_step(tiny_model):
    """The fused multi-step decode loop (lax.scan over steps, on-device
    sampling) must emit exactly the per-step loop's tokens — greedy and
    sampled, across chunk boundaries and stop ids."""
    import jax.numpy as jnp

    from sparkinfer_tpu.runtime.engine import Engine
    from sparkinfer_tpu.runtime.sampling import SamplerConfig

    model, _ = tiny_model
    for cfg in (SamplerConfig(temp=0.0), SamplerConfig(temp=1.2, seed=3)):
        e_step = Engine(model, max_seq=64, sampler=cfg, kv_dtype=jnp.float32,
                        fused_chunk=0)
        e_fused = Engine(model, max_seq=64, sampler=cfg, kv_dtype=jnp.float32,
                         fused_chunk=5)
        for p, n in (([3, 14, 15], 13), ([5, 9], 4), ([7], 17)):
            want = e_step.generate(p, max_new_tokens=n, seed=11)
            got = e_fused.generate(p, max_new_tokens=n, seed=11)
            assert got == want, (cfg.temp, p, n)
        # stop id mid-chunk
        want = e_step.generate([3, 14, 15], max_new_tokens=12, seed=11)
        if len(want) > 3:
            stop = want[3]
            w2 = e_step.generate([3, 14, 15], max_new_tokens=12, seed=11,
                                 stop_ids={stop})
            g2 = e_fused.generate([3, 14, 15], max_new_tokens=12, seed=11,
                                  stop_ids={stop})
            assert g2 == w2
