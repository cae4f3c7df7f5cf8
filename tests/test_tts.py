"""TTS subsystem tests — WavTokenizer vocoder parity vs an independently
built torch oracle, ISTFT parity vs a direct numpy port of the reference
algorithm (tools/tts/tts.cpp:116-320), and OuteTTS text/prompt handling."""

import json
import wave

import numpy as np
import pytest

from sparkinfer_tpu.gguf.writer import GGUFWriter
from sparkinfer_tpu.models.wavtokenizer import (
    WavTokenizerConfig, codes_to_audio, embd_to_audio, load_wavtokenizer,
    save_wav16, wavtokenizer_forward)
from sparkinfer_tpu.tools.tts_cli import (
    generate_codes, number_to_words, process_text, speaker_prefix)

ARCH = "wavtokenizer-dec"


# ---------------------------------------------------------------------------
# fixture: tiny wavtokenizer GGUF + torch oracle
# ---------------------------------------------------------------------------

def make_tiny_wavtokenizer(path, *, n_vocab=40, feat=8, C=16, n_ff=24,
                           n_out=18, n_convnext=2, n_groups=4, seed=0):
    """Write a tiny wavtokenizer-dec GGUF with the reference tensor names
    (src/llama-model.cpp:5774-5878). Returns the raw f32 tensors."""
    rng = np.random.default_rng(seed)

    def w(*shape, s=0.3):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    t = {
        "token_embd.weight": w(n_vocab, feat),
        "conv1d.weight": w(C, feat, 7),
        "conv1d.bias": w(C),
        "token_embd_norm.weight": 1.0 + w(C, s=0.1),
        "token_embd_norm.bias": w(C, s=0.1),
        "output_norm.weight": 1.0 + w(C, s=0.1),
        "output_norm.bias": w(C, s=0.1),
        "output.weight": w(n_out, C),
        "output.bias": w(n_out),
    }
    for i in range(6):
        p = f"posnet.{i}."
        if i == 2:
            t[p + "attn_norm.weight"] = 1.0 + w(C, s=0.1)
            t[p + "attn_norm.bias"] = w(C, s=0.1)
            for n in ("attn_q", "attn_k", "attn_v", "attn_output"):
                t[p + n + ".weight"] = w(C, C, 1)
                t[p + n + ".bias"] = w(C)
        elif i == 5:
            t[p + "attn_norm.weight"] = 1.0 + w(C, s=0.1)
            t[p + "attn_norm.bias"] = w(C, s=0.1)
        else:
            t[p + "norm1.weight"] = 1.0 + w(C, s=0.1)
            t[p + "norm1.bias"] = w(C, s=0.1)
            t[p + "conv1.weight"] = w(C, C, 3)
            t[p + "conv1.bias"] = w(C)
            t[p + "norm2.weight"] = 1.0 + w(C, s=0.1)
            t[p + "norm2.bias"] = w(C, s=0.1)
            t[p + "conv2.weight"] = w(C, C, 3)
            t[p + "conv2.bias"] = w(C)
    for i in range(n_convnext):
        p = f"convnext.{i}."
        t[p + "dw.weight"] = w(C, 1, 7)
        t[p + "dw.bias"] = w(C)
        t[p + "norm.weight"] = 1.0 + w(C, s=0.1)
        t[p + "norm.bias"] = w(C, s=0.1)
        t[p + "pw1.weight"] = w(n_ff, C)
        t[p + "pw1.bias"] = w(n_ff)
        t[p + "pw2.weight"] = w(C, n_ff)
        t[p + "pw2.bias"] = w(C)
        t[p + "gamma.weight"] = 1.0 + w(C, s=0.1)

    wr = GGUFWriter(path, ARCH)
    wr.add_kv(f"{ARCH}.vocab_size", np.uint32(n_vocab))
    wr.add_kv(f"{ARCH}.features_length", np.uint32(feat))
    wr.add_kv(f"{ARCH}.feed_forward_length", np.uint32(n_ff))
    wr.add_kv(f"{ARCH}.embedding_length", np.uint32(n_out))
    wr.add_kv(f"{ARCH}.posnet.embedding_length", np.uint32(C))
    wr.add_kv(f"{ARCH}.posnet.block_count", np.uint32(6))
    wr.add_kv(f"{ARCH}.convnext.embedding_length", np.uint32(C))
    wr.add_kv(f"{ARCH}.convnext.block_count", np.uint32(n_convnext))
    wr.add_kv(f"{ARCH}.attention.group_norm_groups", np.uint32(n_groups))
    wr.add_kv(f"{ARCH}.attention.group_norm_epsilon", np.float32(1e-6))
    wr.add_kv(f"{ARCH}.attention.layer_norm_epsilon", np.float32(1e-5))
    for name, data in t.items():
        wr.add_tensor(name, data)
    wr.write()
    return t


def torch_oracle(t, codes, *, n_groups, C, n_convnext):
    """Independent torch build of the same graph
    (ref src/models/wavtokenizer-dec.cpp:3-148)."""
    import torch
    import torch.nn.functional as F

    tt = {k: torch.tensor(v, dtype=torch.float64) for k, v in t.items()}

    def conv(x, wname, pad, groups=1):
        # x (C_in, T) -> (C_out, T)
        return F.conv1d(x[None], tt[wname + ".weight"], tt[wname + ".bias"],
                        padding=pad, groups=groups)[0]

    def gn(x, pre):
        y = F.group_norm(x[None], n_groups, eps=1e-6)[0]
        return y * tt[pre + ".weight"][:, None] + tt[pre + ".bias"][:, None]

    def ln(x, pre):
        # x (C, T): layernorm over channels
        y = F.layer_norm(x.T, (x.shape[0],), tt[pre + ".weight"],
                         tt[pre + ".bias"], eps=1e-5)
        return y.T

    sil = torch.nn.SiLU()
    x = tt["token_embd.weight"][torch.tensor(codes)].T       # (feat, T)
    x = conv(x, "conv1d", 3)
    for i in (0, 1):
        h = conv(sil(gn(x, f"posnet.{i}.norm1")), f"posnet.{i}.conv1", 1)
        h = conv(sil(gn(h, f"posnet.{i}.norm2")), f"posnet.{i}.conv2", 1)
        x = x + h
    h = gn(x, "posnet.2.attn_norm")
    q = conv(h, "posnet.2.attn_q", 0).T
    k = conv(h, "posnet.2.attn_k", 0).T
    v = conv(h, "posnet.2.attn_v", 0).T
    att = torch.softmax(q @ k.T / np.sqrt(C), dim=-1)
    x = x + conv((att @ v).T, "posnet.2.attn_output", 0)
    for i in (3, 4):
        h = conv(sil(gn(x, f"posnet.{i}.norm1")), f"posnet.{i}.conv1", 1)
        h = conv(sil(gn(h, f"posnet.{i}.norm2")), f"posnet.{i}.conv2", 1)
        x = x + h
    x = gn(x, "posnet.5.attn_norm")
    x = ln(x, "token_embd_norm")
    for i in range(n_convnext):
        p = f"convnext.{i}."
        h = conv(x, p + "dw", 3, groups=C)
        h = ln(h, p + "norm").T                                # (T, C)
        h = F.gelu(h @ tt[p + "pw1.weight"].T + tt[p + "pw1.bias"],
                   approximate="tanh")
        h = h @ tt[p + "pw2.weight"].T + tt[p + "pw2.bias"]
        x = x + (h * tt[p + "gamma.weight"]).T
    x = ln(x, "output_norm").T                                 # (T, C)
    out = x @ tt["output.weight"].T + tt["output.bias"]
    return out.numpy()


def test_vocoder_matches_torch_oracle(tmp_path):
    path = str(tmp_path / "wtok.gguf")
    t = make_tiny_wavtokenizer(path)
    cfg, params = load_wavtokenizer(path)
    assert cfg.n_posnet == 16 and cfg.n_groups == 4

    codes = [1, 5, 17, 3, 39, 0, 22, 8]
    import jax

    mine = np.asarray(jax.jit(wavtokenizer_forward, static_argnums=0)(
        cfg, params, np.asarray(codes, np.int32)))
    ref = torch_oracle(t, codes, n_groups=4, C=16, n_convnext=2)
    assert mine.shape == ref.shape == (len(codes), 18)
    np.testing.assert_allclose(mine, ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# ISTFT parity vs a direct numpy port of the reference algorithm
# ---------------------------------------------------------------------------

def ref_embd_to_audio(embd, n_fft, n_hop):
    """Direct port of tools/tts/tts.cpp:116-320 (irfft + hann + fold)."""
    embd = np.asarray(embd, np.float64)
    t, e = embd.shape
    half = e // 2
    n_win, n_pad = n_fft, (n_fft - n_hop) // 2
    n_out = (t - 1) * n_hop + n_win
    N = n_fft // 2 + 1

    hann = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))

    mag = np.minimum(np.exp(embd[:, :half]), 1e2)
    phi = embd[:, half:]
    Sr = mag * np.cos(phi)
    Si = mag * np.sin(phi)

    res = np.zeros((t, n_fft))
    for l in range(t):
        for k in range(n_fft):
            acc = 0.0
            for m in range(N):
                ang = 2.0 * np.pi * k * m / n_fft
                acc += Sr[l, m] * np.cos(ang) - Si[l, m] * np.sin(ang)
            res[l, k] = acc / N
        res[l] *= hann

    def fold(frames):
        out = np.zeros(n_out)
        for l in range(t):
            start = l * n_hop - n_pad
            for j in range(n_fft):
                w = start + j
                if 0 <= w < n_out:
                    out[w] += frames[l, j]
        return out[: n_out - 2 * n_pad]

    audio = fold(res)
    env = fold(np.tile(hann * hann, (t, 1)))
    return audio / env


@pytest.mark.parametrize("n_fft,n_hop,t", [(32, 8, 5), (64, 16, 3)])
def test_istft_matches_reference_algorithm(n_fft, n_hop, t):
    rng = np.random.default_rng(7)
    embd = rng.standard_normal((t, n_fft + 2)).astype(np.float32) * 0.5
    ref = ref_embd_to_audio(embd, n_fft, n_hop)
    mine = embd_to_audio(embd, n_fft=n_fft, n_hop=n_hop)
    assert mine.shape == ref.shape == ((t - 1) * n_hop + n_fft - (n_fft - n_hop),)
    np.testing.assert_allclose(mine, ref, rtol=1e-4, atol=1e-5)


def test_istft_real_sizes():
    # the production shape: n_fft 1280, hop 320, spectrogram width 1282
    rng = np.random.default_rng(3)
    embd = rng.standard_normal((3, 1282)).astype(np.float32) * 0.3
    out = embd_to_audio(embd)
    assert out.shape == (2 * 320 + 1280 - 960,)
    assert np.all(np.isfinite(out))


def test_codes_to_audio_and_wav(tmp_path):
    path = str(tmp_path / "wtok.gguf")
    make_tiny_wavtokenizer(path, n_out=18)
    cfg, params = load_wavtokenizer(path)
    audio = codes_to_audio(cfg, params, [1, 2, 3, 4, 5, 6], n_fft=16, n_hop=4)
    assert audio.ndim == 1 and np.all(np.isfinite(audio))

    wav_path = str(tmp_path / "out.wav")
    save_wav16(wav_path, audio, 24000)
    with wave.open(wav_path) as f:
        assert f.getframerate() == 24000
        assert f.getnchannels() == 1
        assert f.getsampwidth() == 2
        assert f.getnframes() == len(audio)


# ---------------------------------------------------------------------------
# OuteTTS text processing / prompt assembly
# ---------------------------------------------------------------------------

def test_number_to_words():
    assert number_to_words("0") == "zero"
    assert number_to_words("123") == "one hundred twenty-three"
    assert number_to_words("3.14") == "three point one four"
    assert number_to_words("1000000") == "one million"
    assert number_to_words("45") == "forty-five"


def test_process_text():
    out = process_text("Hello, World! 42")
    assert out == "hello<|text_sep|>world<|text_sep|>forty<|text_sep|>two"
    assert process_text("a b", "0.3") == "a<|space|>b"


def test_speaker_prefix():
    spk = {"words": [{"word": "hi", "duration": 0.08, "codes": [3, 7]}]}
    at, ad = speaker_prefix(spk)
    assert at == "<|text_start|>hi<|text_sep|>"
    assert ad == "<|audio_start|>\nhi<|t_0.08|><|code_start|><|3|><|7|><|code_end|>\n"
    at3, ad3 = speaker_prefix(spk, "0.3")
    assert at3.endswith("hi<|space|>")
    assert "<|code_start|>" not in ad3 and ad3.endswith("<|3|><|7|><|space|>\n")


def test_generate_codes_guide_tokens():
    """Guide tokens replace the first sampled token after each newline
    (ref tts.cpp:886-895), driven through a scripted fake engine."""

    class FakeVocab:
        def special_ids(self):
            return [99]

    class FakeTk:
        vocab = FakeVocab()

    class FakeEngine:
        # the model "wants" to emit: 10, NL(5), 11, 12, NL(5), 13, EOS(2)
        script = [10, 5, 11, 12, 5, 13, 2]

        def __init__(self):
            self.i = 0

        def new_cache(self):
            return None

        def new_sampler_state(self, seed=None):
            return None

        def prefill(self, ids, cache, sstate):
            tok = self.script[self.i]
            self.i += 1
            return tok, cache, sstate, len(ids)

        def decode_step(self, tok, n_past, cache, sstate):
            t = self.script[self.i]
            self.i += 1
            return t, cache, sstate

    out = generate_codes(FakeEngine(), FakeTk(), [1, 2, 3],
                         guide_tokens=[70, 71, 72], n_predict=10,
                         eos_ids={2}, newline_id=5)
    # first token guided (70); after each newline the next token is guided
    assert out == [70, 5, 71, 12, 5, 72, 2]


def test_generate_codes_no_guides():
    class FakeVocab:
        def special_ids(self):
            return []

    class FakeTk:
        vocab = FakeVocab()

    class FakeEngine:
        script = [4, 9, 2]

        def __init__(self):
            self.i = 0

        def new_cache(self):
            return None

        def new_sampler_state(self, seed=None):
            return None

        def prefill(self, ids, cache, sstate):
            tok = self.script[self.i]
            self.i += 1
            return tok, cache, sstate, len(ids)

        def decode_step(self, tok, n_past, cache, sstate):
            t = self.script[self.i]
            self.i += 1
            return t, cache, sstate

    out = generate_codes(FakeEngine(), FakeTk(), [1], [], 10, {2}, 5)
    assert out == [4, 9, 2]


# ---------------------------------------------------------------------------
# CLI e2e: tiny OuteTTS-style LM + tiny vocoder through main()
# ---------------------------------------------------------------------------

def test_tts_cli_main(tmp_path, monkeypatch):
    import sys
    sys.path.insert(0, "tests")
    from model_fixtures import make_tiny_llama

    from sparkinfer_tpu.tools import tts_cli

    pieces = ["<|im_start|>", "<|text_start|>", "<|text_end|>",
              "<|text_sep|>", "<|audio_start|>", "<|audio_end|>"]
    pieces += [f"<|{i}|>" for i in range(10)]
    lm = str(tmp_path / "lm.gguf")
    make_tiny_llama(lm, n_vocab=320, with_vocab=True,
                    extra_control_pieces=pieces)
    voc = str(tmp_path / "wtok.gguf")
    make_tiny_wavtokenizer(voc)

    # pin the decode to a known code stream so the wiring (prompt assembly,
    # code extraction/rebase, vocoder, wav write) is what's under test
    def scripted(eng, tk, ids, guides, n_predict, eos_ids, nl):
        assert len(ids) > 4          # prompt got assembled + tokenized
        assert guides                # --use-guide-tokens path exercised
        base = tk.vocab.token_to_id["<|0|>"]
        return [base + 3, nl, base + 5, base + 7, base + 1,
                tk.vocab.token_to_id["<|audio_end|>"]]

    monkeypatch.setattr(tts_cli, "generate_codes", scripted)
    out = str(tmp_path / "o.wav")
    rc = tts_cli.main(["-m", lm, "-mv", voc, "-p", "Hello world 7",
                       "-o", out, "--use-guide-tokens", "-n", "8"])
    assert rc == 0
    with wave.open(out) as f:
        assert f.getnframes() > 0
