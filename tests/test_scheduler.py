"""Continuous batching: multi-request scheduling must produce exactly the
tokens each request would get in isolation (slot isolation + cache
correctness), with queueing when slots are full.

Analogue of the reference's server slot tests (tools/server/tests)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sparkinfer_tpu.models.loader import load_model
from sparkinfer_tpu.runtime.engine import Engine
from sparkinfer_tpu.runtime.sampling import SamplerConfig
from sparkinfer_tpu.runtime.scheduler import Request, Scheduler

from model_fixtures import make_tiny_llama


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny.gguf"
    make_tiny_llama(path)
    return load_model(str(path), dtype=jnp.float32)


def test_batched_matches_isolated_greedy(model):
    cfg = SamplerConfig(temp=0.0)
    eng = Engine(model, max_seq=64, sampler=cfg, kv_dtype=jnp.float32)
    prompts = [[3, 14, 15], [9, 26, 53, 58], [97, 93], [2, 71, 82, 81, 82]]
    want = [eng.generate(p, max_new_tokens=6) for p in prompts]

    sched = Scheduler(model, n_slots=2, max_seq=64, sampler=cfg, kv_dtype=jnp.float32)
    reqs = [sched.submit(Request(prompt_tokens=p, max_new_tokens=6)) for p in prompts]
    sched.run_until_idle()
    got = [r.tokens() for r in reqs]
    assert got == want

    m = sched.metrics_snapshot()
    assert m["n_requests"] == 4
    assert m["queue_peak"] >= 2  # slots were contended
    assert m["slots_running"] == 0


def test_background_loop_and_streaming(model):
    cfg = SamplerConfig(temp=0.0)
    sched = Scheduler(model, n_slots=2, max_seq=64, sampler=cfg, kv_dtype=jnp.float32)
    sched.start()
    try:
        req = sched.submit(Request(prompt_tokens=[5, 6, 7], max_new_tokens=5))
        toks = list(req.stream())
        assert len(toks) == 5
        assert req.first_token_s is not None and req.done_s is not None
    finally:
        sched.stop()


def test_oversize_and_empty_prompts_rejected(model):
    sched = Scheduler(model, n_slots=1, max_seq=16, kv_dtype=jnp.float32)
    with pytest.raises(ValueError):
        sched.submit(Request(prompt_tokens=[]))
    with pytest.raises(ValueError):
        sched.submit(Request(prompt_tokens=list(range(99))))


def test_stop_ids_end_generation(model):
    cfg = SamplerConfig(temp=0.0)
    eng = Engine(model, max_seq=64, sampler=cfg, kv_dtype=jnp.float32)
    full = eng.generate([3, 14, 15], max_new_tokens=8)
    stop = full[3]  # stop at the 4th generated token
    sched = Scheduler(model, n_slots=1, max_seq=64, sampler=cfg, kv_dtype=jnp.float32)
    req = sched.submit(Request(prompt_tokens=[3, 14, 15], max_new_tokens=8,
                               stop_ids={stop}))
    sched.run_until_idle()
    assert req.tokens() == full[:3]
