"""Tokenizer parity against the reference's test vectors.

The reference tree ships ggml-vocab-<name>.gguf vocab fixtures plus
.inp/.out vector pairs (used by its test-tokenizer-0; SURVEY.md §4). We run
the same vectors through our tokenizers and require exact id sequences.
"""

from pathlib import Path

import pytest

from sparkinfer_tpu.gguf import GGUFReader
from sparkinfer_tpu.tokenizer import Vocab, build_tokenizer

MODELS = Path("/root/reference/models")

# fixture name -> expected tokenizer family
CASES = [
    "ggml-vocab-llama-spm",
    "ggml-vocab-phi-3",
    "ggml-vocab-gpt-2",
    "ggml-vocab-mpt",
    "ggml-vocab-gpt-neox",
    "ggml-vocab-falcon",
    "ggml-vocab-starcoder",
    "ggml-vocab-refact",
    "ggml-vocab-deepseek-llm",
    "ggml-vocab-deepseek-coder",
    "ggml-vocab-baichuan",
]


def _load_vectors(base: Path):
    inp = (base.parent / (base.name + ".inp")).read_text(encoding="utf-8")
    out = (base.parent / (base.name + ".out")).read_text(encoding="utf-8")
    texts = inp.split("\n__ggml_vocab_test__\n")
    expected = [[int(t) for t in line.split()] for line in out.splitlines()]
    if len(texts) == len(expected) + 1 and texts[-1] == "":
        texts = texts[:-1]  # file ends with the separator
    assert len(texts) == len(expected), f"{len(texts)} inputs vs {len(expected)} outputs"
    return list(zip(texts, expected))


@pytest.mark.parametrize("name", CASES)
def test_tokenizer_vectors(name):
    base = MODELS / (name + ".gguf")
    if not base.exists() or not (MODELS / (name + ".gguf.inp")).exists():
        pytest.skip(f"{name} fixture unavailable")
    r = GGUFReader(base)
    vocab = Vocab.from_gguf(r)
    tok = build_tokenizer(vocab)
    failures = []
    vectors = _load_vectors(base)
    for i, (text, expected) in enumerate(vectors):
        got = tok.encode(text, add_special=False)
        if got != expected:
            failures.append((i, text[:40], expected, got))
    assert not failures, f"{len(failures)}/{len(vectors)} mismatches; first: {failures[0]}"


def test_spm_decode_roundtrip(vocab_gguf_spm):
    r = GGUFReader(vocab_gguf_spm)
    vocab = Vocab.from_gguf(r)
    tok = build_tokenizer(vocab)
    text = "Hello, world! Multi word sentence with números and 中文."
    ids = tok.encode(text, add_special=False)
    assert tok.decode(ids) == text


def test_bpe_decode_roundtrip(vocab_gguf_bpe):
    r = GGUFReader(vocab_gguf_bpe)
    vocab = Vocab.from_gguf(r)
    tok = build_tokenizer(vocab)
    text = "Hello, world! ascii and ünïcødé."
    ids = tok.encode(text, add_special=False)
    assert tok.decode(ids) == text


def test_spm_add_bos(vocab_gguf_spm):
    r = GGUFReader(vocab_gguf_spm)
    vocab = Vocab.from_gguf(r)
    tok = build_tokenizer(vocab)
    ids = tok.encode("Hello", add_special=True)
    assert ids[0] == vocab.bos_id


def test_ugm_viterbi_segmentation():
    """UGM picks the max-score segmentation, not greedy longest."""
    import numpy as np
    from sparkinfer_tpu.tokenizer.ugm import UGMTokenizer
    from sparkinfer_tpu.tokenizer.vocab import Vocab

    tokens = ["<unk>", "▁", "a", "b", "ab", "▁ab", "▁a"]
    scores = np.asarray([0, -2.0, -1.0, -1.0, -3.5, -1.5, -1.2], np.float32)
    v = Vocab(model="t5", pre="default", tokens=tokens,
              token_types=np.full(len(tokens), 1, np.int32), scores=scores,
              merges=None, bos_id=-1, eos_id=-1, unk_id=0, add_bos=False,
              add_eos=False, add_space_prefix=True)
    tk = UGMTokenizer(v)
    # "ab" -> "▁ab": "▁ab"(-1.5) beats "▁a"+"b"(-2.2) and "▁"+"ab"(-5.5)
    assert tk.encode("ab", add_special=False) == [5]
    # unknown chars collapse to single UNK
    ids = tk.encode("xy", add_special=False)
    assert 0 in ids
    assert tk.decode([5]) == "ab"


def test_rwkv_longest_match():
    import numpy as np
    from sparkinfer_tpu.tokenizer.rwkv import RWKVTokenizer
    from sparkinfer_tpu.tokenizer.vocab import Vocab

    tokens = ["h", "e", "l", "o", "he", "hel", "hello", " ", " wor", "ld"]
    v = Vocab(model="rwkv", pre="default", tokens=tokens,
              token_types=np.full(len(tokens), 1, np.int32), scores=None,
              merges=None, bos_id=-1, eos_id=-1, unk_id=-1, add_bos=False,
              add_eos=False, add_space_prefix=False)
    tk = RWKVTokenizer(v)
    ids = tk.encode("hello world")
    assert ids[0] == tokens.index("hello")  # greedy longest match
    assert tk.decode(ids) == "hello world"
