"""Tool-calling: schema injection, envelope parsing, grammar forcing."""

import json

from sparkinfer_tpu.server.tools_api import (
    inject_tools,
    parse_tool_calls,
    tool_call_grammar,
)

TOOLS = [{"type": "function", "function": {
    "name": "get_weather",
    "description": "Get weather",
    "parameters": {"type": "object", "properties": {"city": {"type": "string"}},
                   "required": ["city"]},
}}]


def test_inject_tools_creates_system():
    msgs = inject_tools([{"role": "user", "content": "hi"}], TOOLS)
    assert msgs[0]["role"] == "system"
    assert "get_weather" in msgs[0]["content"]
    assert "<tool_call>" in msgs[0]["content"]
    # existing system message is extended, not replaced
    msgs2 = inject_tools([{"role": "system", "content": "be nice"},
                          {"role": "user", "content": "hi"}], TOOLS)
    assert msgs2[0]["content"].startswith("be nice")


def test_parse_envelope_and_bare_json():
    text = 'Let me check.\n<tool_call>\n{"name": "get_weather", "arguments": {"city": "Oslo"}}\n</tool_call>'
    content, calls = parse_tool_calls(text)
    assert content == "Let me check."
    assert len(calls) == 1
    assert calls[0]["function"]["name"] == "get_weather"
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "Oslo"}

    content, calls = parse_tool_calls('{"name": "get_weather", "arguments": {}}')
    assert calls and content == ""

    content, calls = parse_tool_calls("just a normal answer")
    assert calls == [] and content == "just a normal answer"


def test_tool_call_grammar_accepts_valid_envelope():
    from sparkinfer_tpu.grammar import parse_gbnf

    g = parse_gbnf(tool_call_grammar(TOOLS))
    ok = '<tool_call> {"name": "get_weather", "arguments": {"city": "x"}} </tool_call>'
    st = g.accept_text(g.start_stacks(), ok)
    assert st and g.is_complete(st)
    bad = '<tool_call> {"name": "other_tool", "arguments": {}} </tool_call>'
    assert not g.accept_text(g.start_stacks(), bad)


def test_thread_safety_parallel_engines(tmp_path):
    """Two engines over one model from concurrent threads (parity:
    tests/test-thread-safety.cpp)."""
    import sys, threading
    sys.path.insert(0, "tests")
    import jax.numpy as jnp
    from model_fixtures import make_tiny_llama
    from sparkinfer_tpu.models.loader import load_model
    from sparkinfer_tpu.runtime.engine import Engine
    from sparkinfer_tpu.runtime.sampling import SamplerConfig

    p = tmp_path / "t.gguf"
    make_tiny_llama(p)
    model = load_model(str(p), dtype=jnp.float32)
    results = {}

    def run(i):
        eng = Engine(model, max_seq=32, sampler=SamplerConfig(temp=0.0),
                     kv_dtype=jnp.float32, donate_cache=False)
        results[i] = eng.generate([3 + i, 14, 15], max_new_tokens=4)

    ts = [threading.Thread(target=run, args=(i,)) for i in range(3)]
    [t.start() for t in ts]
    [t.join(timeout=120) for t in ts]
    assert len(results) == 3
    # determinism: rerun thread 0's prompt serially
    eng = Engine(model, max_seq=32, sampler=SamplerConfig(temp=0.0),
                 kv_dtype=jnp.float32, donate_cache=False)
    assert eng.generate([3, 14, 15], max_new_tokens=4) == results[0]


def test_tool_call_grammar_formats_pair_with_parser():
    """For every format: the forcing grammar accepts a canonical call AND
    parse_chat extracts it (grammar and parser must agree — a mismatch
    means tool_choice=required can never produce a parseable call)."""
    from sparkinfer_tpu.grammar import parse_gbnf
    from sparkinfer_tpu.server.chat_parser import parse_chat

    fixtures = {
        "hermes": '<tool_call> {"name": "get_weather", "arguments": '
                  '{"city": "x"}} </tool_call>',
        "llama3": '{"name": "get_weather", "parameters": {"city": "x"}}',
        "mistral-nemo": '[TOOL_CALLS] [{"name": "get_weather", '
                        '"arguments": {"city": "x"}}]',
        "command-r7b": '<|START_ACTION|> [{"tool_call_id": "0", '
                       '"tool_name": "get_weather", "parameters": '
                       '{"city": "x"}}] <|END_ACTION|>',
    }
    for fmt, text in fixtures.items():
        g = parse_gbnf(tool_call_grammar(TOOLS, fmt))
        st = g.accept_text(g.start_stacks(), text)
        assert st and g.is_complete(st), fmt
        msg = parse_chat(text, fmt)
        assert msg.tool_calls and msg.tool_calls[0].name == "get_weather", fmt
        json.loads(msg.tool_calls[0].arguments)
