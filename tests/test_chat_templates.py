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
