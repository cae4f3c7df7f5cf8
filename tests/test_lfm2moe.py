"""lfm2moe hybrid (ref src/models/lfm2.cpp llm_build_lfm2 with
build_moe_feed_forward past n_layer_dense_lead): gated short-conv /
attention mixers + sigma-gated MoE FFN. Direct-GGUF smoke with
stepwise-vs-full state consistency and Engine generation — the
constituent math (shortconv: transformers Lfm2 parity in test_lfm2;
MoE routing/experts: test_moe) is oracle-tested elsewhere; no
transformers Lfm2Moe exists in this environment (docs/PARITY.md)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sparkinfer_tpu.gguf.constants import GGMLType
from sparkinfer_tpu.gguf.writer import GGUFWriter
from sparkinfer_tpu.models.hybrid import init_hybrid_cache, make_hybrid_forward
from sparkinfer_tpu.models.loader import load_model

E, H, D, Hkv = 64, 4, 16, 2
F, V, L = 96, 120, 3  # layers: [conv+dense, attn+moe, conv+moe]
X, K = 4, 2
LC = 3  # shortconv l_cache


def _make_tiny_lfm2moe(path, seed=0):
    rng = np.random.default_rng(seed)

    def w(*shape, s=0.15):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    a = "lfm2moe"
    wr = GGUFWriter(str(path), a)
    wr.add_kv(f"{a}.block_count", np.uint32(L))
    wr.add_kv(f"{a}.embedding_length", np.uint32(E))
    wr.add_kv(f"{a}.vocab_size", np.uint32(V))
    wr.add_kv(f"{a}.context_length", np.uint32(128))
    wr.add_kv(f"{a}.attention.head_count", np.uint32(H))
    wr.add_array(f"{a}.attention.head_count_kv",
                 np.asarray([0, Hkv, 0], np.uint32))
    wr.add_kv(f"{a}.attention.layer_norm_rms_epsilon", np.float32(1e-5))
    wr.add_kv(f"{a}.rope.freq_base", np.float32(1e6))
    wr.add_kv(f"{a}.shortconv.l_cache", np.uint32(LC))
    wr.add_kv(f"{a}.feed_forward_length", np.uint32(F))
    wr.add_kv(f"{a}.expert_count", np.uint32(X))
    wr.add_kv(f"{a}.expert_used_count", np.uint32(K))
    wr.add_kv(f"{a}.leading_dense_block_count", np.uint32(1))
    wr.add_kv(f"{a}.expert_gating_func", np.uint32(2))  # sigmoid

    wr.add_tensor("token_embd.weight", w(V, E), GGMLType.F32)
    wr.add_tensor("output_norm.weight", 1.0 + 0.1 * w(E), GGMLType.F32)
    wr.add_tensor("output.weight", w(V, E), GGMLType.F32)

    def conv_block(p):
        wr.add_tensor(p + "shortconv.in_proj.weight", w(3 * E, E),
                      GGMLType.F32)
        wr.add_tensor(p + "shortconv.conv.weight", w(E, LC), GGMLType.F32)
        wr.add_tensor(p + "shortconv.out_proj.weight", w(E, E), GGMLType.F32)

    def attn_block(p):
        wr.add_tensor(p + "attn_q.weight", w(H * D, E), GGMLType.F32)
        wr.add_tensor(p + "attn_k.weight", w(Hkv * D, E), GGMLType.F32)
        wr.add_tensor(p + "attn_v.weight", w(Hkv * D, E), GGMLType.F32)
        wr.add_tensor(p + "attn_output.weight", w(E, H * D), GGMLType.F32)
        wr.add_tensor(p + "attn_q_norm.weight", 1.0 + 0.1 * w(D),
                      GGMLType.F32)
        wr.add_tensor(p + "attn_k_norm.weight", 1.0 + 0.1 * w(D),
                      GGMLType.F32)

    def dense_ffn(p):
        wr.add_tensor(p + "ffn_up.weight", w(F, E), GGMLType.F32)
        wr.add_tensor(p + "ffn_gate.weight", w(F, E), GGMLType.F32)
        wr.add_tensor(p + "ffn_down.weight", w(E, F), GGMLType.F32)

    def moe_ffn(p):
        wr.add_tensor(p + "ffn_gate_inp.weight", w(X, E, s=0.3),
                      GGMLType.F32)
        wr.add_tensor(p + "ffn_up_exps.weight", w(X, F, E), GGMLType.F32)
        wr.add_tensor(p + "ffn_gate_exps.weight", w(X, F, E), GGMLType.F32)
        wr.add_tensor(p + "ffn_down_exps.weight", w(X, E, F), GGMLType.F32)

    for i, (mixer, moe) in enumerate(((conv_block, False),
                                      (attn_block, True),
                                      (conv_block, True))):
        p = f"blk.{i}."
        wr.add_tensor(p + "attn_norm.weight", 1.0 + 0.1 * w(E), GGMLType.F32)
        wr.add_tensor(p + "ffn_norm.weight", 1.0 + 0.1 * w(E), GGMLType.F32)
        mixer(p)
        (moe_ffn if moe else dense_ffn)(p)
    wr.write()


def test_lfm2moe_smoke_and_stepwise(tmp_path):
    p = tmp_path / "lfm2moe.gguf"
    _make_tiny_lfm2moe(p)
    model = load_model(str(p), dtype=jnp.float32)
    cfg = model.config
    assert cfg.arch == "lfm2moe"
    assert cfg.shortconv_l_cache == LC
    assert cfg.n_expert == X and cfg.n_dense_lead == 1
    assert cfg.expert_gating == "sigmoid"

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


def test_lfm2moe_engine(tmp_path):
    from sparkinfer_tpu.runtime.engine import Engine
    from sparkinfer_tpu.runtime.sampling import SamplerConfig

    p = tmp_path / "lfm2moe.gguf"
    _make_tiny_lfm2moe(p)
    model = load_model(str(p), dtype=jnp.float32)
    eng = Engine(model, max_seq=32, sampler=SamplerConfig(temp=0.0),
                 fused_chunk=0)
    out = eng.generate([3, 9, 5], max_new_tokens=6)
    assert len(out) == 6
    # greedy determinism
    assert eng.generate([3, 9, 5], max_new_tokens=6) == out
