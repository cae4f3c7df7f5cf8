"""HTTP server integration: spawn a real SparkServer on a loopback port and
exercise the reference-parity endpoint set (the analogue of
tools/server/tests pytest suite, which spawns a real llama-server)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.runtime.sampling import SamplerConfig
from sparkinfer_tpu.server import ServerConfig, SparkServer

from model_fixtures import make_tiny_llama


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny-vocab.gguf"
    make_tiny_llama(path, n_vocab=300, with_vocab=True, chat_template="{{'<|im_start|>'}}")
    model = load_model(str(path), dtype=jnp.float32)
    srv = SparkServer(
        model,
        ServerConfig(port=0, n_slots=2, max_seq=192, kv_dtype="f32"),
        sampler=SamplerConfig(temp=0.0),
    )
    srv.serve(block=False)
    yield srv
    srv.shutdown()


def _get(srv, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}", timeout=30) as r:
        return r.status, r.read()


def _post(srv, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, r.read()


def test_health_props_models_metrics(server):
    code, body = _get(server, "/health")
    assert code == 200 and json.loads(body)["status"] == "ok"
    code, body = _get(server, "/props")
    props = json.loads(body)
    assert props["arch"] == "llama" and props["n_slots"] == 2
    # the tiny model's template "{{'<|im_start|>'}}" is valid Jinja and
    # now executes directly (round-4 Jinja engine) instead of being
    # substring-detected as a family
    assert props["chat_template"] == "jinja"
    assert props["chat_template_source"] == "{{'<|im_start|>'}}"
    code, body = _get(server, "/v1/models")
    assert json.loads(body)["data"][0]["id"] == "sparkinfer-tpu"
    code, body = _get(server, "/metrics")
    assert b"sparkinfer_n_requests" in body
    code, body = _get(server, "/slots")
    assert len(json.loads(body)) == 2


def test_tokenize_roundtrip(server):
    code, body = _post(server, "/tokenize", {"content": "hello world"})
    toks = json.loads(body)["tokens"]
    assert toks
    code, body = _post(server, "/detokenize", {"tokens": toks})
    assert json.loads(body)["content"].strip() == "hello world"


def test_completion(server):
    code, body = _post(
        server, "/v1/completions",
        {"prompt": "hello world", "max_tokens": 6, "temperature": 0.0},
    )
    out = json.loads(body)
    assert out["object"] == "text_completion"
    assert out["usage"]["completion_tokens"] >= 1
    assert isinstance(out["choices"][0]["text"], str)


def test_chat_completion(server):
    code, body = _post(
        server, "/v1/chat/completions",
        {"messages": [{"role": "user", "content": "hello"}], "max_tokens": 4},
    )
    out = json.loads(body)
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["message"]["role"] == "assistant"


def test_streaming_sse(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v1/completions",
        data=json.dumps({"prompt": "hello", "max_tokens": 4, "stream": True}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        data = r.read().decode()
    events = [l for l in data.split("\n") if l.startswith("data: ")]
    assert events[-1] == "data: [DONE]"
    assert len(events) >= 2  # at least one token + DONE
    first = json.loads(events[0][6:])
    assert first["object"] == "text_completion"


def test_concurrent_requests(server):
    """Two clients at once exercise both slots."""
    results = {}

    def call(i):
        code, body = _post(
            server, "/v1/completions",
            {"prompt": f"hello world", "max_tokens": 5, "temperature": 0.0},
        )
        results[i] = json.loads(body)["choices"][0]["text"]

    ts = [threading.Thread(target=call, args=(i,)) for i in range(2)]
    [t.start() for t in ts]
    [t.join(timeout=120) for t in ts]
    assert len(results) == 2
    assert results[0] == results[1]  # greedy + same prompt -> same text


def test_404_and_bad_request(server):
    import urllib.error

    try:
        _get(server, "/nope")
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404
    # empty prompt is fine (BOS only) — reference accepts it too
    code, _ = _post(server, "/v1/completions", {"prompt": "", "max_tokens": 2})
    assert code == 200
    try:
        _post(server, "/v1/completions",
              {"prompt": "word " * 200, "max_tokens": 2})
        assert False, "oversize prompt should 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_anthropic_messages_compat(server):
    """Anthropic-style /v1/messages (parity: test_compat_anthropic.py)."""
    # (no system block: the byte-fallback test vocab makes prompts long and
    # the fixture server has max_seq 64)
    code, body = _post(server, "/v1/messages", {
        "model": "x", "max_tokens": 5,
        "messages": [{"role": "user",
                      "content": [{"type": "text", "text": "hi"}]}],
    })
    out = json.loads(body)
    assert out["type"] == "message" and out["role"] == "assistant"
    assert out["content"][0]["type"] == "text"
    assert out["usage"]["output_tokens"] >= 1
    assert out["stop_reason"] == "end_turn"


def test_utf8_stream_holds_split_sequences():
    """A multi-byte UTF-8 char split across tokens must stream intact, not
    as U+FFFD (ref: llama-server buffers incomplete UTF-8)."""
    from sparkinfer_tpu.server.app import _Utf8Stream

    class ByteTok:
        def decode_bytes(self, ids, skip_special=False):
            return bytes(ids)

    emoji = "🎉".encode("utf-8")  # 4 bytes
    s = _Utf8Stream(ByteTok())
    assert s.push(list(b"hi ")) == "hi "
    assert s.push(list(emoji[:2])) == ""  # incomplete -> held
    assert s.push(list(emoji[2:])) == "🎉"
    # CJK split 2+1
    han = "汉".encode("utf-8")
    assert s.push(list(han[:1])) == ""
    assert s.push(list(han[1:])) == "汉"
    # flush releases whatever is left, replacing genuinely bad bytes
    assert s.push([0xE4]) == ""
    assert s.flush() == "�"


# ---------------------------------------------------------------------------
# /infill + /rerank (ref tools/server/server.cpp:171,137)


@pytest.fixture(scope="module")
def fim_server(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny-fim.gguf"
    make_tiny_llama(
        path, n_vocab=300, with_vocab=True,
        extra_kv={
            "tokenizer.ggml.fim_pre_token_id": 290,
            "tokenizer.ggml.fim_suf_token_id": 291,
            "tokenizer.ggml.fim_mid_token_id": 292,
        },
    )
    model = load_model(str(path), dtype=jnp.float32)
    srv = SparkServer(
        model,
        ServerConfig(port=0, n_slots=2, max_seq=192, kv_dtype="f32"),
        sampler=SamplerConfig(temp=0.0),
    )
    srv.serve(block=False)
    yield srv
    srv.shutdown()


def test_infill_prompt_layout(fim_server):
    v = fim_server.model.vocab
    assert (v.fim_pre_id, v.fim_suf_id, v.fim_mid_id) == (290, 291, 292)
    ids = fim_server.infill_prompt(
        {"input_prefix": "hello ", "input_suffix": " world", "n_predict": 4})
    # [BOS][FIM_PRE]prefix[FIM_SUF]suffix[FIM_MID]
    assert ids[0] == v.bos_id
    assert ids[1] == 290
    assert ids[-1] == 292
    i_suf = ids.index(291)
    assert i_suf > 2 and 292 not in ids[:-1]
    # spm_infill swaps the prefix/suffix blocks
    ids_spm = fim_server.infill_prompt(
        {"input_prefix": "hello ", "input_suffix": " world",
         "n_predict": 4, "spm_infill": True})
    assert ids_spm[1] == 291 and ids_spm[-1] == 292


def test_infill_endpoint(fim_server):
    code, body = _post(fim_server, "/infill", {
        "input_prefix": "def add(a, b):", "input_suffix": "return c",
        "n_predict": 4,
    })
    out = json.loads(body)
    assert code == 200 and out["tokens_predicted"] == len(out["tokens"]) > 0
    assert isinstance(out["content"], str)


def test_infill_unsupported_without_fim_tokens(server):
    code = None
    try:
        code, _ = _post(server, "/infill", {"input_prefix": "x",
                                            "input_suffix": "y"})
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 400


@pytest.fixture(scope="module")
def rerank_server(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny-rerank.gguf"
    rng = np.random.default_rng(42)
    E = 64
    make_tiny_llama(
        path, n_vocab=300, with_vocab=True,
        extra_kv={"tokenizer.ggml.add_eos_token": True},
        extra_tensors={
            "cls.weight": rng.standard_normal((E, E)).astype(np.float32) * 0.1,
            "cls.bias": rng.standard_normal(E).astype(np.float32) * 0.1,
            "cls.output.weight": rng.standard_normal((1, E)).astype(np.float32),
            "cls.output.bias": rng.standard_normal(1).astype(np.float32),
        },
    )
    model = load_model(str(path), dtype=jnp.float32)
    srv = SparkServer(
        model,
        ServerConfig(port=0, n_slots=2, max_seq=192, kv_dtype="f32"),
        sampler=SamplerConfig(temp=0.0),
    )
    srv.serve(block=False)
    yield srv
    srv.shutdown()


def test_rerank_endpoint(rerank_server):
    assert "cls_w" in rerank_server.model.params
    code, body = _post(rerank_server, "/v1/rerank", {
        "query": "hello world",
        "documents": ["the hello", "world the", "hello the world"],
        "top_n": 2,
    })
    out = json.loads(body)
    assert code == 200 and len(out["results"]) == 2
    scores = [r["relevance_score"] for r in out["results"]]
    assert scores == sorted(scores, reverse=True)
    # deterministic scores: head applied to cls position
    code2, body2 = _post(rerank_server, "/v1/rerank", {
        "query": "hello world",
        "documents": ["the hello", "world the", "hello the world"],
    })
    out2 = json.loads(body2)
    top = {r["index"]: r["relevance_score"] for r in out2["results"]}
    for r in out["results"]:
        assert abs(top[r["index"]] - r["relevance_score"]) < 1e-6
    # TEI format: "texts" key -> "score" label
    code3, body3 = _post(rerank_server, "/rerank", {
        "query": "hello world", "texts": ["a", "b"]})
    out3 = json.loads(body3)
    assert "score" in out3["results"][0]


@pytest.fixture(scope="module")
def router_server(tmp_path_factory):
    """Server with LoRA adapters + a second routed model."""
    from sparkinfer_tpu.gguf.constants import GGMLType
    from sparkinfer_tpu.gguf.writer import GGUFWriter

    d = tmp_path_factory.mktemp("router")
    main_p = d / "main.gguf"
    make_tiny_llama(main_p, n_vocab=300, with_vocab=True)
    other_p = d / "other.gguf"
    make_tiny_llama(other_p, n_vocab=300, with_vocab=True, seed=9)

    model = load_model(str(main_p), dtype=jnp.float32)
    L, E, F = model.config.n_layer, model.config.n_embd, model.config.n_ff
    lora_p = d / "adapter.gguf"
    rng = np.random.default_rng(1)
    w = GGUFWriter(str(lora_p), "llama")
    w.add_kv("general.type", "adapter")
    w.add_kv("adapter.type", "lora")
    w.add_kv("adapter.lora.alpha", np.float32(8.0))
    for l in range(L):
        A = (rng.standard_normal((4, E)) * 0.05).astype(np.float32)
        B = (rng.standard_normal((F, 4)) * 0.05).astype(np.float32)
        w.add_tensor(f"blk.{l}.ffn_up.lora_a", A, GGMLType.F32)
        w.add_tensor(f"blk.{l}.ffn_up.lora_b", B, GGMLType.F32)
    w.write()

    srv = SparkServer(
        model,
        ServerConfig(port=0, n_slots=2, max_seq=64, kv_dtype="f32",
                     lora=[(str(lora_p), 0.0)],
                     extra_models={"other": str(other_p)}),
        sampler=SamplerConfig(temp=0.0),
    )
    srv.serve(block=False)
    yield srv
    srv.shutdown()


def test_apply_template(server):
    code, body = _post(server, "/apply-template", {
        "messages": [{"role": "user", "content": "hello"}]})
    assert code == 200
    # the GGUF ships a literal-only Jinja template -> renders exactly that
    assert json.loads(body)["prompt"] == "<|im_start|>"


def test_lora_endpoints(router_server):
    """GET lists adapters; POST rescales and changes generation
    (ref server.cpp /lora-adapters)."""
    code, body = _get(router_server, "/lora-adapters")
    assert code == 200
    lst = json.loads(body)
    assert lst[0]["scale"] == 0.0

    req = {"prompt": "hello world", "max_tokens": 8, "temperature": 0.0}
    _, b0 = _post(router_server, "/v1/completions", req)
    t0 = json.loads(b0)["choices"][0]["text"]

    code, body = _post(router_server, "/lora-adapters",
                       [{"id": 0, "scale": 4.0}])
    assert code == 200 and json.loads(body)[0]["scale"] == 4.0
    _, b1 = _post(router_server, "/v1/completions", req)
    t1 = json.loads(b1)["choices"][0]["text"]
    assert t0 != t1  # scaled adapter changed the output

    _post(router_server, "/lora-adapters", [{"id": 0, "scale": 0.0}])
    _, b2 = _post(router_server, "/v1/completions", req)
    assert json.loads(b2)["choices"][0]["text"] == t0  # restored


def test_multi_model_router(router_server):
    """Requests select a model by the OpenAI "model" field; the second
    model loads lazily and produces different output
    (ref server-models.cpp router)."""
    code, body = _get(router_server, "/v1/models")
    ids = [m["id"] for m in json.loads(body)["data"]]
    assert "other" in ids

    req = {"prompt": "hello world", "max_tokens": 8, "temperature": 0.0}
    _, ba = _post(router_server, "/v1/completions", req)
    _, bb = _post(router_server, "/v1/completions", dict(req, model="other"))
    ta = json.loads(ba)["choices"][0]["text"]
    tb = json.loads(bb)["choices"][0]["text"]
    assert ta != tb  # different weights behind the same endpoint


def test_streaming_tool_calls_sse(server):
    """Grammar-forced tool call streamed over SSE: tool_calls deltas arrive
    incrementally and concatenate to valid JSON arguments, finish_reason
    becomes tool_calls (ref: server oaicompat streaming + chat-parser)."""
    tools = [{"type": "function", "function": {
        "name": "get_weather",
        "parameters": {"type": "object",
                       "properties": {"city": {"type": "string"}}},
    }}]
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v1/chat/completions",
        data=json.dumps({
            "messages": [{"role": "user", "content": "weather in Oslo?"}],
            "tools": tools, "tool_choice": "required",
            "max_tokens": 120, "temperature": 0.0, "stream": True,
        }).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        data = r.read().decode()
    events = [json.loads(l[6:]) for l in data.split("\n")
              if l.startswith("data: ") and l != "data: [DONE]"]
    assert data.rstrip().endswith("data: [DONE]")
    calls = {}
    finish = None
    for ev in events:
        ch = ev["choices"][0]
        if ch.get("finish_reason"):
            finish = ch["finish_reason"]
        for c in ch.get("delta", {}).get("tool_calls", []):
            e = calls.setdefault(c["index"], {"name": "", "arguments": ""})
            fn = c.get("function", {})
            if fn.get("name"):
                e["name"] = fn["name"]
            e["arguments"] += fn.get("arguments", "")
    assert finish == "tool_calls"
    assert calls, f"no tool_calls deltas in {len(events)} events"
    assert calls[0]["name"] == "get_weather"
    json.loads(calls[0]["arguments"])  # valid JSON when concatenated
    # raw envelope text must not leak into content deltas
    content = "".join(ev["choices"][0].get("delta", {}).get("content", "")
                      for ev in events)
    assert "<tool_call>" not in content


def test_webui_page(server):
    """The built-in webui (ref: tools/server/webui): full app page served
    at /, referencing only endpoints this server actually exposes."""
    code, body = _get(server, "/")
    assert code == 200
    html = body.decode()
    # app features: conversations, streaming chat, settings, server panel
    for marker in ("sendOrStop", "localStorage", "/v1/chat/completions",
                   "/props", "/slots", "/metrics", "s_temp", "s_max",
                   "regen", "AbortController"):
        assert marker in html, marker
    # the slot/metric field names the JS polls must match the server's
    assert "s.running" in html
    assert "n_tokens_generated" in html
