"""GBNF grammar engine (ref: tests/test-grammar-parser.cpp,
test-grammar-integration.cpp, test-json-schema-to-grammar.cpp)."""

import json

import numpy as np
import pytest

from sparkinfer_tpu.grammar import (
    GrammarParseError,
    json_schema_to_gbnf,
    parse_gbnf,
)


def _accepts(g, text: str, complete=True) -> bool:
    st = g.start_stacks()
    st = g.accept_text(st, text)
    if not st:
        return False
    return g.is_complete(st) if complete else True


def test_literal_and_alternates():
    g = parse_gbnf('root ::= "yes" | "no"')
    assert _accepts(g, "yes")
    assert _accepts(g, "no")
    assert not _accepts(g, "maybe")
    assert not _accepts(g, "ye")  # prefix is viable but incomplete
    assert _accepts(g, "ye", complete=False)


def test_char_ranges_and_repetition():
    g = parse_gbnf("root ::= [a-z]+ [0-9]*")
    assert _accepts(g, "abc")
    assert _accepts(g, "abc123")
    assert not _accepts(g, "123")
    assert not _accepts(g, "ABC")


def test_negated_class_and_escapes():
    g = parse_gbnf(r'root ::= "\"" [^"]* "\""')
    assert _accepts(g, '"hello"')
    assert not _accepts(g, '"hel"lo"')


def test_rule_refs_and_nesting():
    g = parse_gbnf(
        """
root ::= expr
expr ::= term ("+" term)*
term ::= [0-9]+ | "(" expr ")"
"""
    )
    assert _accepts(g, "1+2+3")
    assert _accepts(g, "(1+2)+3")
    assert not _accepts(g, "1+")
    assert not _accepts(g, "(1+2")


def test_bounded_repetition():
    g = parse_gbnf("root ::= [0-9]{2,4}")
    assert not _accepts(g, "1")
    assert _accepts(g, "12")
    assert _accepts(g, "1234")
    assert not _accepts(g, "12345")


def test_parse_errors():
    with pytest.raises(GrammarParseError):
        parse_gbnf('foo ::= "x"')  # no root
    with pytest.raises(GrammarParseError):
        parse_gbnf("root ::= undefined_rule")
    with pytest.raises(GrammarParseError):
        parse_gbnf('root ::= "x" root2 ::=')  # malformed


def test_json_grammar_end_to_end():
    """The canonical JSON grammar shape accepts JSON and rejects non-JSON."""
    g = parse_gbnf(json_schema_to_gbnf({}))  # untyped -> any JSON value
    assert _accepts(g, '{"a": 1, "b": [true, null, "x"]}')
    assert _accepts(g, "[1, 2, 3]")
    assert not _accepts(g, "{broken")


def test_json_schema_object():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "tags": {"type": "array", "items": {"type": "string"}, "minItems": 1},
        },
        "required": ["name", "age", "tags"],
    }
    g = parse_gbnf(json_schema_to_gbnf(schema))
    ok = json.dumps({"name": "bo", "age": 3, "tags": ["a"]})
    assert _accepts(g, ok)
    assert not _accepts(g, json.dumps({"name": "bo"}))
    assert not _accepts(g, json.dumps({"name": "bo", "age": "x", "tags": ["a"]}))


def test_json_schema_enum_and_oneof():
    schema = {"oneOf": [{"enum": ["red", "green"]}, {"type": "integer"}]}
    g = parse_gbnf(json_schema_to_gbnf(schema))
    assert _accepts(g, '"red"')
    assert _accepts(g, "42")
    assert not _accepts(g, '"blue"')


def test_grammar_sampler_masks_and_accepts():
    """GrammarSampler over a toy vocab: sampling forced onto the grammar."""
    from sparkinfer_tpu.grammar.sampler import GrammarSampler

    class Vox:
        tokens = ["y", "e", "s", "n", "o", "</s>", "x"]
        n_tokens = 7

        def is_eog(self, t):
            return t == 5

    gs = GrammarSampler('root ::= "yes" | "no"', Vox())
    V = 7
    logits = np.zeros(V, np.float32)
    logits[6] = 10.0  # model wants "x" — illegal
    tok = gs.constrain_and_pick(logits, sampled=6)
    assert tok in (0, 3)  # y or n
    if tok == 0:
        assert gs.allows(1) and not gs.allows(4)  # "e" ok, "o" not
        gs.accept(1)
        gs.accept(2)
        assert gs.allows(5)  # eos allowed once complete
    # reset works
    gs.reset()
    assert gs.allows(0) and gs.allows(3)


def test_grammar_constrained_generation_end_to_end(tmp_path):
    """Engine + grammar: generated text must match the grammar even though
    the model is random."""
    import sys

    sys.path.insert(0, "tests")
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    from model_fixtures import make_tiny_llama
    from sparkinfer_tpu.grammar.sampler import GrammarSampler
    from sparkinfer_tpu.models.loader import load_model
    from sparkinfer_tpu.runtime.engine import Engine
    from sparkinfer_tpu.runtime.sampling import SamplerConfig
    from sparkinfer_tpu.tokenizer import build_tokenizer

    p = tmp_path / "g.gguf"
    make_tiny_llama(p, n_vocab=300, with_vocab=True)
    model = load_model(str(p), dtype=jnp.float32)
    tk = build_tokenizer(model.vocab)
    eng = Engine(model, max_seq=64, sampler=SamplerConfig(temp=0.0),
                 kv_dtype=jnp.float32, donate_cache=False)
    gs = GrammarSampler('root ::= ("hello" | "world")+', model.vocab, tk)

    # manual loop: forward -> logits -> grammar-first resample
    from sparkinfer_tpu.models.transformer import make_forward
    from sparkinfer_tpu.runtime.kv_cache import init_cache

    fwd = jax.jit(make_forward(model.config))
    prompt = tk.encode("hello", add_special=True)
    cache = init_cache(model.config, 1, 64, jnp.float32)
    pos = jnp.arange(len(prompt), dtype=jnp.int32)[None]
    logits, cache = fwd(model.params, jnp.asarray(prompt, jnp.int32)[None], pos, cache)
    n_past = len(prompt)
    text = ""
    lg = np.asarray(logits)[0, -1]
    for _ in range(6):
        tok = gs.constrain_and_pick(lg, int(np.argmax(lg)))
        if model.vocab.is_eog(tok):
            break
        text += tk.decode([tok])
        logits, cache = fwd(
            model.params,
            jnp.full((1, 1), tok, jnp.int32),
            jnp.full((1, 1), n_past, jnp.int32),
            cache,
        )
        n_past += 1
        lg = np.asarray(logits)[0, -1]
    # every prefix must be viable under the grammar
    g = gs.grammar
    assert g.accept_text(g.start_stacks(), text), text


def test_grammar_bpe_byte_level_pieces(vocab_gguf_bpe):
    """Byte-level BPE vocabs (tokenizer model 'gpt2') must have their
    pieces decoded through the byte decoder: a grammar over plain text
    (' hello') must accept the 'Ġhello'-encoded token (round-1 bug:
    constrained decoding rejected every leading-space token)."""
    from sparkinfer_tpu.gguf.reader import GGUFReader
    from sparkinfer_tpu.grammar.sampler import GrammarSampler
    from sparkinfer_tpu.tokenizer import build_tokenizer
    from sparkinfer_tpu.tokenizer.vocab import Vocab

    vocab = Vocab.from_gguf(GGUFReader(str(vocab_gguf_bpe)))
    tk = build_tokenizer(vocab)
    ids = tk.encode(" hello world", add_special=False)
    assert len(ids) >= 2
    gs = GrammarSampler('root ::= " hello world"', vocab, tk)
    for t in ids:
        assert gs.allows(t), (t, vocab.tokens[t])
        gs.accept(t)
    assert gs.grammar.is_complete(gs.stacks)
    # and the mask path agrees: the first token of the encoding is allowed
    gs2 = GrammarSampler('root ::= " hello world"', vocab, tk)
    m = gs2.mask()
    assert m[ids[0]]
