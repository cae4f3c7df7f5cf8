"""Chat template detection + rendering (ref: src/llama-chat.cpp families +
tests/test-chat-template.cpp)."""

import pytest

from sparkinfer_tpu.server.chat import apply_template, detect_template

MSGS = [
    {"role": "system", "content": "sys"},
    {"role": "user", "content": "hi"},
    {"role": "assistant", "content": "hello"},
    {"role": "user", "content": "again"},
]


def test_detection_families():
    assert detect_template("{{'<|im_start|>'}}...") == "chatml"
    assert detect_template("... [INST] ...") == "llama2"
    assert detect_template("<|start_header_id|>...") == "llama3"
    assert detect_template("<start_of_turn>...") == "gemma"
    assert detect_template("<|assistant|> etc") == "zephyr"
    assert detect_template(None) == "chatml"
    assert detect_template("unknown jinja") == "chatml"


def test_chatml_render():
    out = apply_template(MSGS, "chatml")
    assert out.startswith("<|im_start|>system\nsys<|im_end|>")
    assert out.endswith("<|im_start|>assistant\n")
    assert out.count("<|im_start|>") == 5


def test_llama2_render():
    out = apply_template(MSGS, "llama2")
    assert "<<SYS>>\nsys\n<</SYS>>" in out
    assert out.count("[INST]") == 2
    assert " hello " in out


def test_llama3_render():
    out = apply_template(MSGS, "llama3")
    assert "<|start_header_id|>user<|end_header_id|>" in out
    assert out.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")


def test_gemma_render():
    out = apply_template(MSGS, "gemma")
    assert "<start_of_turn>model\nhello<end_of_turn>" in out
    assert out.endswith("<start_of_turn>model\n")


def test_zephyr_render():
    out = apply_template(MSGS, "zephyr")
    assert "<|user|>\nhi<|endoftext|>" in out
    assert out.endswith("<|assistant|>\n")


def test_unknown_template_raises():
    with pytest.raises(ValueError):
        apply_template(MSGS, "nope")


@pytest.mark.parametrize("marker,family", [
    ("<|START_OF_TURN_TOKEN|><|USER_TOKEN|>", "command-r"),
    ("<|start_of_role|>user<|end_of_role|>", "granite"),
    ("<｜User｜>", "deepseek3"),
    ("{{'<|user|>' + m + '<|end|>'}}", "phi3"),
    ("USER: {{x}} ASSISTANT:", "vicuna"),
])
def test_detect_new_families(marker, family):
    assert detect_template(marker) == family


MSGS4 = [
    {"role": "system", "content": "be brief"},
    {"role": "user", "content": "hi"},
    {"role": "assistant", "content": "hello"},
    {"role": "user", "content": "bye"},
]


def test_phi3_render():
    s = apply_template(MSGS4, "phi3")
    assert s == ("<|system|>\nbe brief<|end|>\n<|user|>\nhi<|end|>\n"
                 "<|assistant|>\nhello<|end|>\n<|user|>\nbye<|end|>\n<|assistant|>\n")


def test_vicuna_render():
    s = apply_template(MSGS4, "vicuna")
    assert s == "be brief\n\nUSER: hi\nASSISTANT: hello</s>\nUSER: bye\nASSISTANT:"


def test_deepseek3_render():
    s = apply_template(MSGS4, "deepseek3")
    assert s == ("be brief<｜User｜>hi<｜Assistant｜>hello"
                 "<｜end▁of▁sentence｜><｜User｜>bye"
                 "<｜Assistant｜>")


def test_command_r_render():
    s = apply_template(MSGS4, "command-r")
    assert s.startswith("<|START_OF_TURN_TOKEN|><|SYSTEM_TOKEN|>be brief<|END_OF_TURN_TOKEN|>")
    assert s.endswith("<|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>")


def test_granite_render():
    s = apply_template(MSGS4, "granite")
    assert "<|start_of_role|>user<|end_of_role|>hi<|end_of_text|>" in s
    assert s.endswith("<|start_of_role|>assistant<|end_of_role|>")


# --- ChatTemplate: Jinja-first strategy (round 4) ---------------------------

LLAMA3_TMPL = (
    "{{ bos_token }}{% for m in messages %}"
    "{{ '<|start_header_id|>' + m['role'] + '<|end_header_id|>\n\n'"
    " + m['content'] | trim + '<|eot_id|>' }}{% endfor %}"
    "{% if add_generation_prompt %}"
    "{{ '<|start_header_id|>assistant<|end_header_id|>\n\n' }}{% endif %}"
)


def test_chat_template_jinja_executes():
    from sparkinfer_tpu.server.chat import ChatTemplate

    t = ChatTemplate(LLAMA3_TMPL, bos_token="<|begin_of_text|>")
    assert t.is_jinja and t.name == "jinja"
    out = t.render([{"role": "user", "content": " hi "}])
    assert out == ("<|begin_of_text|><|start_header_id|>user<|end_header_id|>"
                   "\n\nhi<|eot_id|><|start_header_id|>assistant"
                   "<|end_header_id|>\n\n")


def test_chat_template_tools_reach_jinja():
    from sparkinfer_tpu.server.chat import ChatTemplate

    t = ChatTemplate(
        "{% for tool in tools %}[{{ tool.function.name }}]{% endfor %}")
    out = t.render([], tools=[
        {"type": "function", "function": {"name": "get_weather"}}])
    assert out == "[get_weather]"


def test_chat_template_family_override_beats_jinja():
    from sparkinfer_tpu.server.chat import ChatTemplate

    t = ChatTemplate(LLAMA3_TMPL, family="chatml")
    assert not t.is_jinja and t.name == "chatml"
    assert t.render([{"role": "user", "content": "x"}]).startswith(
        "<|im_start|>user")


def test_chat_template_compile_failure_warns_and_falls_back(caplog):
    import logging

    from sparkinfer_tpu.server.chat import ChatTemplate

    with caplog.at_level(logging.WARNING, logger="sparkinfer.chat"):
        t = ChatTemplate("{% if broken %} [INST] no endif")
    assert any("falling back" in r.message for r in caplog.records)
    assert t.family == "llama2"  # detected from the [INST] marker, not chatml


def test_chat_template_render_failure_warns_and_falls_back(caplog):
    import logging

    from sparkinfer_tpu.server.chat import ChatTemplate

    # compiles fine, raises at render time
    with caplog.at_level(logging.WARNING, logger="sparkinfer.chat"):
        t = ChatTemplate("{{ raise_exception('nope') }}<|im_start|>")
        out = t.render([{"role": "user", "content": "q"}])
    assert any("falling back" in r.message for r in caplog.records)
    assert out.startswith("<|im_start|>user\nq")  # chatml fast-path result
