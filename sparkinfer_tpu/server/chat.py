"""Built-in chat template application.

Analogue of src/llama-chat.cpp: detect a known template family from the
GGUF `tokenizer.chat_template` string (or an explicit override) and render
messages without a Jinja engine. Covers the families the supported archs
ship with; unknown templates fall back to chatml.
"""

from __future__ import annotations


def detect_template(tmpl: str | None) -> str:
    if not tmpl:
        return "chatml"
    t = tmpl
    if "<|im_start|>" in t:
        return "chatml"
    if "[INST]" in t:
        return "llama2"
    if "<|start_header_id|>" in t:
        return "llama3"
    if "<start_of_turn>" in t:
        return "gemma"
    if "<|START_OF_TURN_TOKEN|>" in t:
        return "command-r"
    if "<|start_of_role|>" in t:
        return "granite"
    if "<\uff5cUser\uff5c>" in t:
        return "deepseek3"
    if "<|end|>" in t and "<|user|>" in t:
        return "phi3"
    if "<|assistant|>" in t or "<|user|>" in t:
        return "zephyr"
    if "USER:" in t and "ASSISTANT:" in t:
        return "vicuna"
    return "chatml"


def apply_template(
    messages: list[dict], template: str, add_assistant: bool = True
) -> str:
    """messages: [{role, content}]; returns the prompt string."""
    if template == "chatml":
        out = []
        for m in messages:
            out.append(f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n")
        if add_assistant:
            out.append("<|im_start|>assistant\n")
        return "".join(out)
    if template == "llama2":
        system = ""
        out = []
        for m in messages:
            if m["role"] == "system":
                system = m["content"]
            elif m["role"] == "user":
                content = m["content"]
                if system:
                    content = f"<<SYS>>\n{system}\n<</SYS>>\n\n{content}"
                    system = ""
                out.append(f"[INST] {content} [/INST]")
            else:
                out.append(f" {m['content']} ")
        return "".join(out)
    if template == "llama3":
        out = []
        for m in messages:
            out.append(
                f"<|start_header_id|>{m['role']}<|end_header_id|>\n\n{m['content']}<|eot_id|>"
            )
        if add_assistant:
            out.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
        return "".join(out)
    if template == "gemma":
        out = []
        for m in messages:
            role = "model" if m["role"] == "assistant" else "user"
            out.append(f"<start_of_turn>{role}\n{m['content']}<end_of_turn>\n")
        if add_assistant:
            out.append("<start_of_turn>model\n")
        return "".join(out)
    if template == "zephyr":
        out = []
        for m in messages:
            out.append(f"<|{m['role']}|>\n{m['content']}<|endoftext|>\n")
        if add_assistant:
            out.append("<|assistant|>\n")
        return "".join(out)
    if template == "phi3":
        out = []
        for m in messages:
            out.append(f"<|{m['role']}|>\n{m['content']}<|end|>\n")
        if add_assistant:
            out.append("<|assistant|>\n")
        return "".join(out)
    if template == "vicuna":
        out = []
        for m in messages:
            if m["role"] == "system":
                out.append(f"{m['content']}\n\n")
            elif m["role"] == "user":
                out.append(f"USER: {m['content']}\n")
            else:
                out.append(f"ASSISTANT: {m['content']}</s>\n")
        if add_assistant:
            out.append("ASSISTANT:")
        return "".join(out)
    if template == "deepseek3":
        out = []
        for m in messages:
            if m["role"] == "system":
                out.append(m["content"])
            elif m["role"] == "user":
                out.append(f"<\uff5cUser\uff5c>{m['content']}")
            else:
                out.append(
                    f"<\uff5cAssistant\uff5c>{m['content']}<\uff5cend\u2581of\u2581sentence\uff5c>"
                )
        if add_assistant:
            out.append("<\uff5cAssistant\uff5c>")
        return "".join(out)
    if template == "command-r":
        role_tok = {"system": "SYSTEM", "user": "USER", "assistant": "CHATBOT"}
        out = []
        for m in messages:
            r = role_tok.get(m["role"], "USER")
            out.append(
                f"<|START_OF_TURN_TOKEN|><|{r}_TOKEN|>{m['content']}<|END_OF_TURN_TOKEN|>"
            )
        if add_assistant:
            out.append("<|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>")
        return "".join(out)
    if template == "granite":
        out = []
        for m in messages:
            out.append(
                f"<|start_of_role|>{m['role']}<|end_of_role|>{m['content']}<|end_of_text|>\n"
            )
        if add_assistant:
            out.append("<|start_of_role|>assistant<|end_of_role|>")
        return "".join(out)
    raise ValueError(f"unknown template {template}")
