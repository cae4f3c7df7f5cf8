"""YaRN rope parity: freq_scale must derive from rope.scaling.factor for
ANY scaling type (ref: llama-model.cpp:577-582 sets rope_freq_scale_train
unconditionally), and rope_freqs must reproduce the reference YaRN math
(ggml_rope_yarn: per-dim interpolation between interpolated and
extrapolated thetas + 0.1*ln(1/freq_scale) attention magnitude scale)."""

import math

import numpy as np

from sparkinfer_tpu.models.config import ModelConfig
from sparkinfer_tpu.ops.rope import RopeParams, rope_freqs


class _FakeReader:
    def __init__(self, kv, tensors=("output.weight",)):
        self.kv = kv
        self.tensors = {t: None for t in tensors}

    def arch(self):
        return self.kv["general.architecture"]


def _mk_reader(scaling_type, factor):
    kv = {
        "general.architecture": "llama",
        "llama.block_count": 2,
        "llama.embedding_length": 64,
        "llama.attention.head_count": 4,
        "llama.feed_forward_length": 128,
        "llama.vocab_size": 32,
        "llama.context_length": 4096,
        "llama.rope.scaling.type": scaling_type,
        "llama.rope.scaling.factor": factor,
        "llama.rope.scaling.original_context_length": 2048,
    }
    return _FakeReader(kv)


def test_freq_scale_applies_to_all_scaling_types():
    for st in ("linear", "yarn"):
        cfg = ModelConfig.from_gguf(_mk_reader(st, 4.0))
        assert cfg.rope_scale == 0.25, (st, cfg.rope_scale)
        assert cfg.rope_scaling_type == st
    cfg = ModelConfig.from_gguf(_mk_reader("none", 1.0))
    assert cfg.rope_scale == 1.0


def test_yarn_freqs_match_reference_math():
    # reference math re-derived from ggml_rope_yarn (YaRN paper eq. 17-18):
    #   theta = theta_interp*(1-ramp) + theta_extrap*ramp,
    #   theta_interp = freq_scale*theta_extrap,
    #   ramp_i = (1 - clamp((i - low)/(high - low), 0, 1)) * ext_factor,
    #   corr_dim(n_rot) = dim*ln(orig_ctx/(n_rot*2*pi)) / (2*ln(base)),
    #   mscale = attn_factor*(1 + 0.1*ln(1/freq_scale))
    dim, base, factor, orig_ctx = 128, 10000.0, 4.0, 2048
    p = RopeParams(dim=dim, freq_base=base, freq_scale=1.0 / factor,
                   yarn_orig_ctx=orig_ctx, yarn_ext_factor=1.0)
    inv_freq, mscale = rope_freqs(p)
    inv_freq = np.asarray(inv_freq)

    half = dim // 2
    extrap = base ** (-np.arange(half) / half)

    def corr(n_rot):
        return dim * math.log(orig_ctx / (n_rot * 2 * math.pi)) / (2 * math.log(base))

    low = max(0.0, math.floor(corr(32.0)))
    high = min(half - 1.0, math.ceil(corr(1.0)))
    ramp = 1.0 - np.clip((np.arange(half) - low) / max(0.001, high - low), 0.0, 1.0)
    want = extrap / factor * (1 - ramp) + extrap * ramp
    np.testing.assert_allclose(inv_freq, want, rtol=1e-5)
    assert abs(mscale - (1.0 + 0.1 * math.log(factor))) < 1e-6
    # the fix's regression guard: YaRN must NOT collapse to identity
    assert not np.allclose(inv_freq, extrap)
    assert mscale != 1.0
