"""nemotron-h single-block hybrid (ref src/models/nemotron-h.cpp): each
layer is exactly one of {mamba2, NoPE attention, relu^2 FFN}; direct-GGUF
smoke with stepwise-vs-full state consistency and Engine generation.
The mamba2 and attention sub-blocks are transformers-parity-tested
elsewhere (test_mamba2 / test_granite_hybrid)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sparkinfer_tpu.gguf.constants import GGMLType
from sparkinfer_tpu.gguf.writer import GGUFWriter
from sparkinfer_tpu.models.hybrid import init_hybrid_cache, make_hybrid_forward
from sparkinfer_tpu.models.loader import load_model

E, H, D, Hkv = 64, 4, 16, 2
DIN, NH, G, DS, DC = 64, 8, 2, 8, 4
F, V, L = 96, 120, 3  # layers: [mamba2, attention, ffn]


def _make_tiny_nemotron_h(path, seed=0):
    rng = np.random.default_rng(seed)

    def w(*shape, s=0.15):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    wr = GGUFWriter(str(path), "nemotron-h")
    a = "nemotron-h"
    wr.add_kv(f"{a}.block_count", np.uint32(L))
    wr.add_kv(f"{a}.embedding_length", np.uint32(E))
    wr.add_kv(f"{a}.attention.head_count", np.uint32(H))
    wr.add_array(f"{a}.attention.head_count_kv",
                 np.asarray([0, Hkv, 0], np.uint32))
    wr.add_array(f"{a}.feed_forward_length",
                 np.asarray([0, 0, F], np.uint32))
    wr.add_kv(f"{a}.vocab_size", np.uint32(V))
    wr.add_kv(f"{a}.context_length", np.uint32(128))
    wr.add_kv(f"{a}.attention.key_length", np.uint32(D))
    wr.add_kv(f"{a}.attention.layer_norm_rms_epsilon", np.float32(1e-5))
    wr.add_kv(f"{a}.ssm.inner_size", np.uint32(DIN))
    wr.add_kv(f"{a}.ssm.state_size", np.uint32(DS))
    wr.add_kv(f"{a}.ssm.group_count", np.uint32(G))
    wr.add_kv(f"{a}.ssm.conv_kernel", np.uint32(DC))
    wr.add_kv(f"{a}.ssm.time_step_rank", np.uint32(NH))

    wr.add_tensor("token_embd.weight", w(V, E), GGMLType.F32)
    wr.add_tensor("output_norm.weight", 1.0 + 0.1 * w(E), GGMLType.F32)
    wr.add_tensor("output.weight", w(V, E), GGMLType.F32)
    d_xbc = DIN + 2 * G * DS
    # layer 0: mamba2
    p = "blk.0."
    wr.add_tensor(p + "attn_norm.weight", 1.0 + 0.1 * w(E), GGMLType.F32)
    wr.add_tensor(p + "ssm_in.weight", w(2 * DIN + 2 * G * DS + NH, E),
                  GGMLType.F32)
    wr.add_tensor(p + "ssm_conv1d.weight", w(d_xbc, DC), GGMLType.F32)
    wr.add_tensor(p + "ssm_conv1d.bias", w(d_xbc), GGMLType.F32)
    wr.add_tensor(p + "ssm_dt.bias", w(NH), GGMLType.F32)
    wr.add_tensor(p + "ssm_a", -np.exp(w(NH)), GGMLType.F32)
    wr.add_tensor(p + "ssm_d", 1.0 + 0.1 * w(NH), GGMLType.F32)
    wr.add_tensor(p + "ssm_norm.weight", (1.0 + 0.1 * w(G, DIN // G)),
                  GGMLType.F32)
    wr.add_tensor(p + "ssm_out.weight", w(E, DIN), GGMLType.F32)
    # layer 1: attention (NoPE)
    p = "blk.1."
    wr.add_tensor(p + "attn_norm.weight", 1.0 + 0.1 * w(E), GGMLType.F32)
    wr.add_tensor(p + "attn_q.weight", w(H * D, E), GGMLType.F32)
    wr.add_tensor(p + "attn_k.weight", w(Hkv * D, E), GGMLType.F32)
    wr.add_tensor(p + "attn_v.weight", w(Hkv * D, E), GGMLType.F32)
    wr.add_tensor(p + "attn_output.weight", w(E, H * D), GGMLType.F32)
    # layer 2: relu^2 FFN with biases
    p = "blk.2."
    wr.add_tensor(p + "attn_norm.weight", 1.0 + 0.1 * w(E), GGMLType.F32)
    wr.add_tensor(p + "ffn_up.weight", w(F, E), GGMLType.F32)
    wr.add_tensor(p + "ffn_up.bias", w(F), GGMLType.F32)
    wr.add_tensor(p + "ffn_down.weight", w(E, F), GGMLType.F32)
    wr.add_tensor(p + "ffn_down.bias", w(E), GGMLType.F32)
    wr.write()


def test_nemotron_h_smoke_and_stepwise(tmp_path):
    p = tmp_path / "nh.gguf"
    _make_tiny_nemotron_h(p)
    model = load_model(str(p), dtype=jnp.float32)
    cfg = model.config
    assert cfg.arch == "nemotron-h"
    assert cfg.n_head_kv_arr == (0, 2, 0)
    assert cfg.n_ff_arr == (0, 0, F)

    fwd = jax.jit(make_hybrid_forward(cfg))
    toks = np.random.default_rng(1).integers(0, V, 6).astype(np.int32)
    full, _ = fwd(model.params, jnp.asarray(toks)[None],
                  jnp.arange(6, dtype=jnp.int32)[None],
                  init_hybrid_cache(cfg, 1, 16, jnp.float32))
    assert np.isfinite(np.asarray(full)).all()
    cache = init_hybrid_cache(cfg, 1, 16, jnp.float32)
    outs = []
    for t, tok in enumerate(toks):
        lg, cache = fwd(model.params, jnp.asarray([[tok]], jnp.int32),
                        jnp.full((1, 1), t, jnp.int32), cache)
        outs.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.stack(outs), np.asarray(full[0]),
                               rtol=2e-4, atol=2e-4)


def test_nemotron_h_engine(tmp_path):
    from sparkinfer_tpu.runtime import SamplerConfig
    from sparkinfer_tpu.runtime.engine import Engine

    p = tmp_path / "nh.gguf"
    _make_tiny_nemotron_h(p)
    model = load_model(str(p), dtype=jnp.float32)
    eng = Engine(model, max_seq=32, sampler=SamplerConfig(temp=0.0))
    out = eng.generate([3, 5, 7], max_new_tokens=5)
    assert len(out) == 5 and all(0 <= t < V for t in out)
