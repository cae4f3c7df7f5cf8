"""Thread-safety (the analogue of the reference's tests/test-thread-safety.cpp,
which runs concurrent contexts over shared and separate models).

JAX arrays are immutable and jitted executables are thread-safe to call,
so the invariants here are about the framework's own Python state:
 - concurrent generate() calls on ONE Engine must not corrupt each other
   (each call owns a fresh cache + sampler state),
 - two Engines sharing one LoadedModel must not interfere,
 - a SparkServer under concurrent mixed traffic must answer every request
   and keep greedy results deterministic.
Determinism under temp=0 is the race detector: any cross-thread state leak
shows up as diverging outputs.
"""

import json
import threading
import urllib.request

import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.runtime.engine import Engine
from sparkinfer_tpu.runtime.sampling import SamplerConfig

from model_fixtures import make_tiny_llama


def _run_threads(n, fn):
    errs = []

    def wrap(i):
        try:
            fn(i)
        except Exception as e:  # pragma: no cover - failure path
            errs.append((i, repr(e)))

    ts = [threading.Thread(target=wrap, args=(i,)) for i in range(n)]
    [t.start() for t in ts]
    [t.join(timeout=300) for t in ts]
    assert not errs, errs
    assert not any(t.is_alive() for t in ts), "thread hung"


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    p = tmp_path_factory.mktemp("ts") / "t.gguf"
    make_tiny_llama(p)
    return load_model(str(p), dtype=jnp.float32)


def test_concurrent_generate_one_engine(tiny_model):
    """4 threads on one Engine; every thread's greedy output matches the
    serial oracle (each generate owns its cache/sampler state)."""
    eng = Engine(tiny_model, max_seq=64, sampler=SamplerConfig(temp=0.0))
    prompts = [[3, 5, 7], [9, 2], [11, 4, 6, 8], [1]]
    oracle = [eng.generate(p, max_new_tokens=6) for p in prompts]
    results = [None] * 8

    def go(i):
        results[i] = eng.generate(prompts[i % 4], max_new_tokens=6)

    _run_threads(8, go)
    for i, r in enumerate(results):
        assert r == oracle[i % 4], f"thread {i} diverged"


def test_concurrent_engines_shared_model(tiny_model):
    """Two Engines over ONE LoadedModel (shared immutable params), driven
    from separate threads, reproduce their single-threaded outputs."""
    e1 = Engine(tiny_model, max_seq=64, sampler=SamplerConfig(temp=0.0))
    e2 = Engine(tiny_model, max_seq=48, sampler=SamplerConfig(temp=0.0))
    o1 = e1.generate([5, 9, 42], max_new_tokens=8)
    o2 = e2.generate([7, 7, 7], max_new_tokens=8)
    out = {}

    def go(i):
        if i % 2 == 0:
            out[i] = e1.generate([5, 9, 42], max_new_tokens=8)
        else:
            out[i] = e2.generate([7, 7, 7], max_new_tokens=8)

    _run_threads(6, go)
    for i, r in out.items():
        assert r == (o1 if i % 2 == 0 else o2)


def test_concurrent_sampled_same_seed(tiny_model):
    """Stochastic sampling with a fixed seed is also race-free: same seed
    from N threads -> identical sequences."""
    eng = Engine(tiny_model, max_seq=64,
                 sampler=SamplerConfig(temp=0.8, top_k=20, seed=123))
    oracle = eng.generate([3, 1, 4], max_new_tokens=6, seed=123)
    results = [None] * 4

    def go(i):
        results[i] = eng.generate([3, 1, 4], max_new_tokens=6, seed=123)

    _run_threads(4, go)
    assert all(r == oracle for r in results)


def test_server_concurrent_mixed_traffic(tmp_path_factory):
    """Mixed concurrent HTTP traffic (completions + tokenize + props +
    health) against a 2-slot server: every request answered, greedy
    completions deterministic across threads."""
    from sparkinfer_tpu.server import ServerConfig, SparkServer

    p = tmp_path_factory.mktemp("ts2") / "v.gguf"
    make_tiny_llama(p, n_vocab=300, with_vocab=True)
    model = load_model(str(p), dtype=jnp.float32)
    srv = SparkServer(model, ServerConfig(port=0, n_slots=2, max_seq=64,
                                          kv_dtype="f32"),
                      sampler=SamplerConfig(temp=0.0))
    srv.serve(block=False)
    try:
        base = f"http://127.0.0.1:{srv.port}"

        def post(path, body):
            req = urllib.request.Request(
                base + path, data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        oracle = post("/v1/completions",
                      {"prompt": "ab", "max_tokens": 4, "temperature": 0})
        texts = {}

        def go(i):
            kind = i % 3
            if kind == 0:
                out = post("/v1/completions", {"prompt": "ab", "max_tokens": 4,
                                               "temperature": 0})
                texts[i] = out["choices"][0]["text"]
            elif kind == 1:
                out = post("/tokenize", {"content": "hello world"})
                assert isinstance(out["tokens"], list) and out["tokens"]
            else:
                with urllib.request.urlopen(base + "/props", timeout=60) as r:
                    assert r.status == 200

        _run_threads(9, go)
        want = oracle["choices"][0]["text"]
        assert texts and all(t == want for t in texts.values())
    finally:
        srv.shutdown()
