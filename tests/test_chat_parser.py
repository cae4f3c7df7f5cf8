"""Tool-call parsing formats + streaming partial JSON (ref:
common/chat-parser.cpp per-format extractors, common/json-partial.cpp
healing, tests/test-chat-parser.cpp fixtures)."""

import json

import pytest

from sparkinfer_tpu.server.chat_parser import (StreamParser, detect_format,
                                               parse_chat)
from sparkinfer_tpu.server.json_partial import loads_partial


# --- json-partial ------------------------------------------------------------

DOCS = [
    '{"name": "get_weather", "arguments": {"city": "Par\\"is", "n": 3}}',
    '[{"id": "abc", "name": "f", "arguments": {}}, {"name": "g"}]',
    '{"a": [true, false, null], "b": {"c": {"d": 2.5e-3}}}',
    '"plain \\u00e9 string"',
    "-12.5e2",
]


@pytest.mark.parametrize("doc", DOCS)
def test_loads_partial_complete(doc):
    v, end, comp = loads_partial(doc)
    assert comp and v == json.loads(doc) and end == len(doc)


@pytest.mark.parametrize("doc", DOCS)
def test_loads_partial_every_prefix_heals(doc):
    full = json.loads(doc)
    seen_values = 0
    for k in range(1, len(doc)):
        try:
            v, end, comp = loads_partial(doc[:k])
        except ValueError:
            continue
        seen_values += 1
        # healed value must be "on the way" to the full value: same type
        # once the root container is known
        if isinstance(full, dict):
            assert isinstance(v, dict)
        elif isinstance(full, list):
            assert isinstance(v, list)
    assert seen_values > 0


def test_loads_partial_object_prefix_keys_stable():
    doc = '{"name": "get_weather", "arguments": {"city": "Paris"}}'
    v, _, comp = loads_partial(doc[:16])  # '{"name": "get_we'
    assert not comp and v == {"name": "get_we"}
    v, _, comp = loads_partial(doc[:30])
    assert not comp and v["name"] == "get_weather"


# --- format parsers, complete inputs -----------------------------------------

def test_hermes_complete():
    txt = ('I will check.\n<tool_call>\n{"name": "get_weather", '
           '"arguments": {"city": "Paris"}}\n</tool_call>')
    msg = parse_chat(txt, "hermes")
    assert msg.content == "I will check."
    assert len(msg.tool_calls) == 1
    tc = msg.tool_calls[0]
    assert tc.name == "get_weather" and tc.complete
    assert json.loads(tc.arguments) == {"city": "Paris"}


def test_hermes_multiple_calls():
    txt = ('<tool_call>{"name": "a", "arguments": {"x": 1}}</tool_call>'
           '<tool_call>{"name": "b", "arguments": {"y": 2}}</tool_call>')
    msg = parse_chat(txt, "hermes")
    assert [t.name for t in msg.tool_calls] == ["a", "b"]
    assert json.loads(msg.tool_calls[1].arguments) == {"y": 2}


def test_hermes_bare_json_fallback():
    msg = parse_chat('{"name": "f", "arguments": {"q": 1}}', "hermes")
    assert msg.tool_calls[0].name == "f" and msg.content == ""


def test_llama3_json():
    msg = parse_chat(
        '{"name": "get_weather", "parameters": {"city": "Oslo"}}', "llama3")
    assert msg.tool_calls[0].name == "get_weather"
    assert json.loads(msg.tool_calls[0].arguments) == {"city": "Oslo"}
    assert msg.content == ""


def test_llama3_json_with_type_prefix():
    msg = parse_chat('{"type": "function", "name": "f", "parameters": {}}',
                     "llama3")
    assert msg.tool_calls[0].name == "f"


def test_llama3_plain_content():
    msg = parse_chat("The weather is nice.", "llama3")
    assert msg.content == "The weather is nice." and not msg.tool_calls


def test_llama3_builtin_python_tag():
    msg = parse_chat(
        '<|python_tag|>brave_search.call(query="latest news")',
        "llama3-builtin")
    assert msg.tool_calls[0].name == "brave_search"
    assert json.loads(msg.tool_calls[0].arguments) == {
        "query": "latest news"}


def test_llama3_reasoning_block():
    msg = parse_chat(
        '<think>plan the call</think>{"name": "f", "parameters": {}}',
        "llama3")
    assert msg.reasoning == "plan the call"
    assert msg.tool_calls[0].name == "f"


def test_mistral_nemo():
    txt = ('Sure.[TOOL_CALLS][{"name": "get_weather", "arguments": '
           '{"city": "Paris"}, "id": "123456789"}]')
    msg = parse_chat(txt, "mistral-nemo")
    assert msg.content == "Sure."
    tc = msg.tool_calls[0]
    assert tc.name == "get_weather" and tc.id == "123456789"
    assert json.loads(tc.arguments) == {"city": "Paris"}


def test_mistral_nemo_multi():
    txt = ('[TOOL_CALLS][{"name": "a", "arguments": {}}, '
           '{"name": "b", "arguments": {"k": [1, 2]}}]')
    msg = parse_chat(txt, "mistral-nemo")
    assert [t.name for t in msg.tool_calls] == ["a", "b"]


def test_command_r7b_action():
    txt = ('<|START_THINKING|>let me check<|END_THINKING|>'
           '<|START_ACTION|>[{"tool_call_id": "0", "tool_name": '
           '"get_weather", "parameters": {"city": "Paris"}}]<|END_ACTION|>')
    msg = parse_chat(txt, "command-r7b")
    assert msg.reasoning == "let me check"
    tc = msg.tool_calls[0]
    assert tc.name == "get_weather" and tc.id == "0"
    assert json.loads(tc.arguments) == {"city": "Paris"}


def test_command_r7b_response():
    txt = ('<|START_RESPONSE|>It is sunny.<|END_RESPONSE|>')
    msg = parse_chat(txt, "command-r7b")
    assert msg.content == "It is sunny." and not msg.tool_calls


def test_deepseek_r1():
    txt = ('<think>need the weather</think>ok'
           "<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function<｜tool▁sep｜>"
           'get_weather\n```json\n{"city": "Paris"}\n```<｜tool▁call▁end｜>'
           "<｜tool▁calls▁end｜>")
    msg = parse_chat(txt, "deepseek-r1")
    assert msg.reasoning == "need the weather"
    assert msg.content == "ok"
    assert msg.tool_calls[0].name == "get_weather"
    assert json.loads(msg.tool_calls[0].arguments) == {"city": "Paris"}


def test_generic_tool_calls():
    msg = parse_chat(
        '{"tool_calls": [{"name": "f", "arguments": {"a": 1}}]}', "generic")
    assert msg.tool_calls[0].name == "f"
    msg = parse_chat('{"response": "plain answer"}', "generic")
    assert msg.content == "plain answer" and not msg.tool_calls


def test_content_format_passthrough():
    txt = '<tool_call>{"name": "f"}</tool_call>'
    msg = parse_chat(txt, "content")
    assert msg.content == txt and not msg.tool_calls


# --- detection ---------------------------------------------------------------

def test_detect_format():
    assert detect_format("...[TOOL_CALLS]...") == "mistral-nemo"
    assert detect_format("<|START_ACTION|> stuff") == "command-r7b"
    assert detect_format("x<tool_call>y") == "hermes"
    assert detect_format("<|start_header_id|>") == "llama3"
    # bare tool▁sep with no ```json fences = the v3.1 direct syntax;
    # fenced templates = r1 (see test_detect_v31_vs_r1)
    assert detect_format("... tool▁sep ...") == "deepseek-v3.1"
    assert detect_format("... tool▁sep ... ```json ...") == "deepseek-r1"
    assert detect_format(None) == "hermes"
    assert detect_format("", family="llama3") == "llama3"
    assert detect_format("", family="command-r") == "command-r7b"


# --- streaming ---------------------------------------------------------------

def _drive(fmt, text, chunk=3):
    """Feed text in small chunks; return (all_deltas, final_msg)."""
    sp = StreamParser(fmt)
    deltas = []
    for i in range(0, len(text), chunk):
        deltas += sp.update(text[i:i + chunk])
    deltas += sp.finish()
    return deltas, sp.message


def _concat(deltas):
    content = "".join(d.get("content", "") for d in deltas)
    reasoning = "".join(d.get("reasoning_content", "") for d in deltas)
    calls = {}
    for d in deltas:
        for c in d.get("tool_calls", []):
            e = calls.setdefault(c["index"], {"name": "", "arguments": ""})
            fn = c.get("function", {})
            if fn.get("name"):
                e["name"] = fn["name"]
            e["arguments"] += fn.get("arguments", "")
    return content, reasoning, [calls[i] for i in sorted(calls)]


@pytest.mark.parametrize("chunk", [1, 3, 7])
def test_stream_hermes(chunk):
    txt = ('Checking now.<tool_call>{"name": "get_weather", "arguments": '
           '{"city": "San Francisco", "unit": "C"}}</tool_call>')
    deltas, msg = _drive("hermes", txt, chunk)
    content, _, calls = _concat(deltas)
    assert content == "Checking now."
    assert len(calls) == 1
    assert calls[0]["name"] == "get_weather"
    assert json.loads(calls[0]["arguments"]) == {
        "city": "San Francisco", "unit": "C"}
    # the streamed arguments equal the final parse's arguments exactly
    assert calls[0]["arguments"] == msg.tool_calls[0].arguments


@pytest.mark.parametrize("chunk", [1, 5])
def test_stream_mistral_nemo(chunk):
    txt = ('[TOOL_CALLS][{"name": "a", "arguments": {"x": 1}}, '
           '{"name": "b", "arguments": {"y": [2, 3]}}]')
    deltas, _ = _drive("mistral-nemo", txt, chunk)
    _, _, calls = _concat(deltas)
    assert [c["name"] for c in calls] == ["a", "b"]
    assert json.loads(calls[0]["arguments"]) == {"x": 1}
    assert json.loads(calls[1]["arguments"]) == {"y": [2, 3]}


@pytest.mark.parametrize("chunk", [1, 4])
def test_stream_command_r7b(chunk):
    txt = ('<|START_THINKING|>hmm<|END_THINKING|><|START_ACTION|>'
           '[{"tool_call_id": "0", "tool_name": "calc", "parameters": '
           '{"expr": "1+1"}}]<|END_ACTION|>')
    deltas, _ = _drive("command-r7b", txt, chunk)
    _, reasoning, calls = _concat(deltas)
    assert reasoning == "hmm"
    assert calls[0]["name"] == "calc"
    assert json.loads(calls[0]["arguments"]) == {"expr": "1+1"}


@pytest.mark.parametrize("chunk", [1, 6])
def test_stream_llama3_json(chunk):
    txt = '{"name": "get_weather", "parameters": {"city": "Lima"}}'
    deltas, _ = _drive("llama3", txt, chunk)
    content, _, calls = _concat(deltas)
    assert content == ""
    assert calls[0]["name"] == "get_weather"
    assert json.loads(calls[0]["arguments"]) == {"city": "Lima"}


def test_stream_plain_content_no_spurious_toolcalls():
    txt = "Just a normal streamed answer, no tools involved."
    deltas, _ = _drive("hermes", txt, 4)
    content, _, calls = _concat(deltas)
    assert content == txt
    assert not calls


def test_stream_marker_withheld_until_decidable():
    """A partial '<tool_call' prefix must not leak into content."""
    sp = StreamParser("hermes")
    d1 = sp.update("answer <tool_")
    content = "".join(d.get("content", "") for d in d1)
    assert "tool_" not in content
    d2 = sp.update('call>{"name": "f", "arguments": {}}</tool_call>')
    _, _, calls = _concat(d1 + d2 + sp.finish())
    assert calls and calls[0]["name"] == "f"


def test_stream_reasoning_deltas_are_incremental():
    txt = "<think>step one; step two</think>done"
    sp = StreamParser("deepseek-r1")
    deltas = []
    for i in range(0, len(txt), 5):
        deltas += sp.update(txt[i:i + 5])
    deltas += sp.finish()
    _, reasoning, _ = _concat(deltas)
    assert reasoning == "step one; step two"
    content = "".join(d.get("content", "") for d in deltas)
    assert content == "done"


# --- deepseek-v3.1 + thinking_forced_open (ref test-chat-parser.cpp) --------

DSV31_SIMPLE = ("<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>get_time"
                "<｜tool▁sep｜>{\"city\": \"Tokyo\"}<｜tool▁call▁end｜>"
                "<｜tool▁calls▁end｜>")


def test_deepseek_v31_simple():
    msg = parse_chat(DSV31_SIMPLE, "deepseek-v3.1")
    assert len(msg.tool_calls) == 1
    assert msg.tool_calls[0].name == "get_time"
    assert json.loads(msg.tool_calls[0].arguments) == {"city": "Tokyo"}
    assert msg.content == "" and msg.reasoning == ""


def test_deepseek_v31_thinking_forced_open():
    msg = parse_chat("REASONING</think>" + DSV31_SIMPLE, "deepseek-v3.1",
                     thinking_open=True)
    assert msg.reasoning == "REASONING"
    assert msg.tool_calls[0].name == "get_time"
    assert msg.content == ""


def test_deepseek_v31_multiple_calls_with_content():
    txt = ("CONTENT<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>get_time"
           "<｜tool▁sep｜>{\"city\": \"Paris\"}<｜tool▁call▁end｜>"
           "<｜tool▁call▁begin｜>get_weather<｜tool▁sep｜>"
           "{\"city\": \"Paris\"}<｜tool▁call▁end｜><｜tool▁calls▁end｜>")
    msg = parse_chat(txt, "deepseek-v3.1")
    assert [t.name for t in msg.tool_calls] == ["get_time", "get_weather"]
    assert msg.content == "CONTENT"


def test_deepseek_v31_forced_open_unclosed_not_partial_demotes_to_content():
    """The reference's fine-tuning-slip rule: forced-open reasoning that
    never closes is regular content when the message is final — and the
    tool calls in it still parse (test-chat-parser.cpp
    ..._no_closing_think_not_partial)."""
    msg = parse_chat("REASONING" + DSV31_SIMPLE, "deepseek-v3.1",
                     thinking_open=True)
    assert msg.reasoning == ""
    assert msg.content == "REASONING"
    assert msg.tool_calls and msg.tool_calls[0].name == "get_time"


def test_deepseek_v31_forced_open_unclosed_partial_stays_reasoning():
    msg = parse_chat("REASONING" + DSV31_SIMPLE, "deepseek-v3.1",
                     partial=True, thinking_open=True)
    assert msg.tool_calls == []
    assert msg.content == ""
    assert msg.reasoning.startswith("REASONING")


def test_deepseek_v31_forced_open_reasoning_then_content():
    msg = parse_chat("REASONING</think>CONTENT", "deepseek-v3.1",
                     thinking_open=True)
    assert msg.reasoning == "REASONING" and msg.content == "CONTENT"
    assert msg.tool_calls == []


def test_detect_v31_vs_r1():
    v31 = open("/root/reference/models/templates/"
               "deepseek-ai-DeepSeek-V3.1.jinja").read()
    r1 = open("/root/reference/models/templates/"
              "deepseek-ai-DeepSeek-R1-Distill-Qwen-32B.jinja").read()
    assert detect_format(v31) == "deepseek-v3.1"
    assert detect_format(r1) == "deepseek-r1"


@pytest.mark.parametrize("chunk", [1, 5])
def test_stream_deepseek_v31_forced_open(chunk):
    txt = "thinking...</think>ok" + DSV31_SIMPLE
    sp = StreamParser("deepseek-v3.1", thinking_open=True)
    deltas = []
    for i in range(0, len(txt), chunk):
        deltas += sp.update(txt[i:i + chunk])
    deltas += sp.finish()
    content, reasoning, calls = _concat(deltas)
    assert reasoning == "thinking..."
    assert content == "ok"
    assert calls[0]["name"] == "get_time"
    assert json.loads(calls[0]["arguments"]) == {"city": "Tokyo"}
