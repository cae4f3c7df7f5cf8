#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line with the headline metric.

Headline: single-chip decode tokens/s on the SPARSE predictor-gated path
for a ProSparse-style model at realistic firing rates, with vs_baseline =
speedup over this framework's own dense decode of the same model — the
same ratio family as the reference's headline claim (up to 5.05x over
dense llama.cpp, README.md:11; north star >=2x, BASELINE.json).

Protocol (round 2): both paths decode through a FUSED multi-step loop
(lax.scan over steps, greedy sampling on-device — one dispatch per CHUNK
steps, eliminating the per-step relay dispatch that compressed round-1
ratios), and the two modes are INTERLEAVED trial-by-trial inside one
process with the ratio taken per pair (median of paired ratios cancels
the relay session drift; see BENCH_NOTES.md).

On CPU (no TPU attached) runs a tiny preset as a smoke test.
"""

from __future__ import annotations

import atexit
import json
import os
import signal
import statistics
import sys
import time

import numpy as np

CHUNK = 64  # decode steps fused into one dispatch

# ---------------------------------------------------------------------------
# Output protocol (round 4, VERDICT r3 item 1). The driver parses the LAST
# JSON-looking line of the COMBINED stdout+stderr stream (round 3's artifact
# captured a stderr {"phase": ...} marker as the result). Rules here:
#   * note(...)  -> "# ..." progress lines, never parseable as the metric
#   * emit(row, pri) -> prints the row as JSON ONLY while no higher-priority
#     metric has landed; afterwards rows demote to "# " comments. The last
#     JSON line is therefore always the best metric so far, no matter when a
#     timeout kills the process.
#   * SIGTERM/atexit best-effort: re-print the headline as the final line
#     (covers `timeout`'s SIGTERM when the main thread is in Python).
# Priorities: 13B tiered headline 3 > 7b sparse 2 > 1b sparse 1 > rest 0.

_HEADLINE: dict = {"row": None, "pri": -1}


def note(*parts):
    print("#", *parts, file=sys.stderr, flush=True)


def notej(obj):
    """Progress info that used to be a JSON phase line: keep the content,
    drop the parseability."""
    print("# " + json.dumps(obj), file=sys.stderr, flush=True)


def emit(row: dict, pri: int = 0):
    row = {**row, "pri": pri}  # the cross-process supervisor filters on it
    if pri >= _HEADLINE["pri"]:
        _HEADLINE["row"], _HEADLINE["pri"] = row, pri
        print(json.dumps(row), flush=True)
    else:
        print("# " + json.dumps(row), file=sys.stderr, flush=True)


def _reprint_headline(*_a):
    row = _HEADLINE["row"]
    if row is not None:
        print(json.dumps(row), flush=True)
    if _a:  # signal path: exit now, skip atexit double-print
        os._exit(0)


def _install_headline_guard():
    atexit.register(_reprint_headline)
    try:
        signal.signal(signal.SIGTERM, _reprint_headline)
    except (ValueError, OSError):
        pass
    # relay wedge forensics: `kill -USR1 <pid>` dumps all python stacks
    # to stderr (the relay tunnel can hang a first device op for tens of
    # minutes with zero output; this makes the block point visible)
    try:
        import faulthandler

        faulthandler.register(signal.SIGUSR1, file=sys.stderr)
    except (ImportError, ValueError, OSError):
        pass


# repo-local cache dir for GB-scale bench artifacts (cold stores, packed hot
# blocks): persists across processes on this machine so the driver's
# end-of-round run starts hot (VERDICT r3 item 1c)
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".spif_cache")


def build_model(preset: str, host_ffn: bool = False):
    """host_ffn=True also returns {name: np.float16} host copies of the
    FFN weights (for the tiered ColdStore) so no device->host readback of
    GB-scale tensors rides the relay."""
    import jax.numpy as jnp

    from sparkinfer_tpu.models.config import ModelConfig

    shapes = {
        # name: (L, E, H, Hkv, F, V, pred_rank)
        "13b": (40, 5120, 40, 40, 13824, 32000, 1280),
        "7b": (32, 4096, 32, 32, 11008, 32000, 1024),
        "3b": (26, 3200, 32, 32, 8640, 32000, 768),
        "1b": (22, 2048, 32, 4, 5632, 32000, 512),
        "tiny": (2, 256, 8, 4, 512, 1024, 64),
    }
    L, E, H, Hkv, F, V, R = shapes[preset]
    # round F to a multiple of 128 groups
    F = (F // 128) * 128
    D = E // H
    cfg = ModelConfig(arch="prosparse_llama", n_layer=L, n_embd=E, n_head=H,
                      n_head_kv=Hkv, n_ff=F, n_vocab=V, head_dim=D,
                      pred_lora=(R,) * L)
    rng = np.random.default_rng(0)

    host_copies = {}

    def w(*shape, scale=0.02, dtype=jnp.bfloat16, host_key=None):
        # f32 RNG directly (f64 default doubles host time/memory at 7B scale)
        a = rng.standard_normal(shape, dtype=np.float32) * scale
        if host_ffn and host_key:
            host_copies[host_key] = a.astype(np.float16)
        return jnp.asarray(a, dtype)

    layers = {
        "attn_norm_w": jnp.ones((L, E), jnp.float32),
        "ffn_norm_w": jnp.ones((L, E), jnp.float32),
        "wq": w(L, E, H * D), "wk": w(L, E, Hkv * D), "wv": w(L, E, Hkv * D),
        "wo": w(L, H * D, E),
        "w_up": w(L, E, F, host_key="w_up"),
        "w_gate": w(L, E, F, host_key="w_gate"),
        "w_down": w(L, F, E, host_key="w_down"),
        # predictor biased so ~12% of neurons fire (ProSparse-like rates);
        # bf16 storage (compute is f32 inside predict_activations)
        "pred_up": w(L, E, R, scale=0.05),
        "pred_up_b": jnp.zeros((L, R), jnp.float32),
        "pred_down": w(L, R, F, scale=0.6),
        "pred_down_b": jnp.asarray(
            rng.standard_normal((L, F), dtype=np.float32) * 0.5 - 1.2, jnp.float32),
    }
    params = {
        "tok_embd": w(V, E),
        "output_norm_w": jnp.ones((E,), jnp.float32),
        "output": w(E, V),
        "layers": layers,
    }
    if host_ffn:
        return cfg, params, host_copies
    return cfg, params


def _drain(a):
    # block_until_ready is not a reliable fence on every backend (the
    # axon relay acks early); a scalar host readback is.
    return float(np.asarray(a).reshape(-1)[0])


def _gen_stack(key, L, tail, dtype, scale, reshape_to=None):
    """(L,)+tail random normal generated LAYER BY LAYER inside one jit
    (fori_loop + in-place update): the RNG's uint32 bit buffer transient is
    one layer's worth (~180 MB at 7B), not the whole stack's (~5.7 GB for a
    (32,4096,10880) tensor — the allocation that OOM'd 7B attempt #4).
    reshape_to folds the flat-store reshape INSIDE the jit (outside, the
    old and new 2.85 GB buffers coexist — OOM'd attempt #5)."""
    import jax
    import jax.numpy as jnp

    def gen(k):
        def body(i, acc):
            w = jax.random.normal(jax.random.fold_in(k, i), tail, dtype)
            return jax.lax.dynamic_update_index_in_dim(acc, w * scale, i, 0)

        out = jax.lax.fori_loop(0, L, body, jnp.zeros((L,) + tail, dtype))
        return out.reshape(reshape_to) if reshape_to is not None else out

    return jax.jit(gen)(key)


def _gen_stack_i8(key, L, tail, reshape_to=None):
    """(L,)+tail random int8 in [-127, 127], layer-chunked like _gen_stack
    (synthetic Q8_0 packed weights for the measured-throughput baselines;
    values are irrelevant, shapes/bytes are what is measured)."""
    import jax
    import jax.numpy as jnp

    def gen(k):
        def body(i, acc):
            w = jax.random.randint(jax.random.fold_in(k, i), tail, -127, 128,
                                   jnp.int8)
            return jax.lax.dynamic_update_index_in_dim(acc, w, i, 0)

        out = jax.lax.fori_loop(0, L, body, jnp.zeros((L,) + tail, jnp.int8))
        return out.reshape(reshape_to) if reshape_to is not None else out

    return jax.jit(gen)(key)


def _q4_flat_dev(w_stack, chunk=8):
    """Quantize a DEVICE-resident (L, IN, OUT) bf16 stack to a Q4_0
    FlatQuantTensor (IN-major (IN//2, L*OUT) packed nibbles + bf16
    scales): quarter the bf16 predictor bytes/step (ggml q4_0 math:
    d = max/-8, q in [0,15], sequential nibbles along IN)."""
    import jax
    import jax.numpy as jnp

    from sparkinfer_tpu.ops.quant_matmul import FlatQuantTensor

    L, IN, OUT = w_stack.shape

    @jax.jit
    def qchunk(wc):  # (c, IN, OUT)
        c = wc.shape[0]
        blk = wc.astype(jnp.float32).reshape(c, IN // 32, 32, OUT)
        amax_i = jnp.argmax(jnp.abs(blk), axis=2, keepdims=True)
        maxv = jnp.take_along_axis(blk, amax_i, axis=2)[:, :, 0, :]
        d = maxv / -8.0
        inv = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1, d), 0.0)
        q = (jnp.round(blk * inv[:, :, None, :]) + 8.0).clip(0, 15)
        q = q.astype(jnp.uint8).reshape(c, IN, OUT)
        packed = (q[:, 0::2, :] | (q[:, 1::2, :] << 4))  # (c, IN//2, OUT)
        qT = jnp.moveaxis(packed, 0, 1).reshape(IN // 2, c * OUT)
        sT = jnp.moveaxis(d, 0, 1).reshape(IN // 32, c * OUT)
        return qT, sT.astype(jnp.bfloat16)

    qs = [qchunk(w_stack[i:i + chunk]) for i in range(0, L, chunk)]
    q = jnp.concatenate([a for a, _ in qs], 1)
    s = jnp.concatenate([b for _, b in qs], 1)
    return FlatQuantTensor(q, s, "q4_0", OUT)


def _q8_flat_dev(w_stack, chunk=8):
    """Quantize a DEVICE-resident (L, IN, OUT) bf16 stack to a
    FlatQuantTensor (IN-major (IN, L*OUT) int8 + bf16 scales) in L-chunks
    so the f32 transient stays ~chunk/L of the store (HBM-tight at 13B)."""
    import jax
    import jax.numpy as jnp

    from sparkinfer_tpu.ops.quant_matmul import FlatQuantTensor

    L, IN, OUT = w_stack.shape

    @jax.jit
    def qchunk(wc):  # (c, IN, OUT) -> (IN, c*OUT) int8, (IN//32, c*OUT)
        c = wc.shape[0]
        blk = wc.astype(jnp.float32).reshape(c, IN // 32, 32, OUT)
        amax = jnp.abs(blk).max(2)
        s = amax / 127.0  # (c, IN//32, OUT)
        q = (jnp.round(blk / jnp.maximum(s, 1e-30)[:, :, None, :])
             .clip(-127, 127).astype(jnp.int8)).reshape(c, IN, OUT)
        qT = jnp.moveaxis(q, 0, 1).reshape(IN, c * OUT)
        sT = jnp.moveaxis(s, 0, 1).reshape(IN // 32, c * OUT)
        return qT, sT.astype(jnp.bfloat16)

    qs = [qchunk(w_stack[i:i + chunk]) for i in range(0, L, chunk)]
    q = jnp.concatenate([a for a, _ in qs], 1)
    s = jnp.concatenate([b for _, b in qs], 1)
    return FlatQuantTensor(q, s, "q8_0", OUT)


def _w8_dev(w_stack, chunk=8):
    """Device-side W8A8 quantization of a (L, IN, OUT) bf16 stack:
    per-output-channel scales, int8 weights, layer-chunked f32 transient.
    Probe #13: the flat-quant pallas predictor ran at ~404 GB/s vs ~665
    for w8a8-class XLA-native int8 dots at 13B shapes."""
    import jax
    import jax.numpy as jnp

    from sparkinfer_tpu.ops.quant_matmul import W8A8Tensor

    L = w_stack.shape[0]

    @jax.jit
    def qchunk(wc):  # (c, IN, OUT) -> int8 (c, IN, OUT), f32 (c, OUT)
        w = wc.astype(jnp.float32)
        amax = jnp.abs(w).max(axis=1)
        s = jnp.maximum(amax, 1e-30) / 127.0
        q = jnp.round(w / s[:, None, :]).clip(-127, 127).astype(jnp.int8)
        return q, s

    qs = [qchunk(w_stack[i:i + chunk]) for i in range(0, L, chunk)]
    return W8A8Tensor(jnp.concatenate([a for a, _ in qs]),
                      jnp.concatenate([b for _, b in qs]))


def gen_q8_dense_flat(cfg, which=("attn", "ffn", "out")):
    """Device-generated Q8_0 flat stores for EVERY big matmul of a dense
    decode (attention + FFN as FlatQuantTensor in params['sparse_flat'],
    lm head as a plain QuantTensor) — the measured Q8_0-dense baseline
    that FITS 13B in HBM where bf16 dense (25.4 GB) cannot (VERDICT r2
    weak #3: give the beyond-HBM ratio a measured anchor)."""
    import jax
    import jax.numpy as jnp

    from sparkinfer_tpu.ops.quant_matmul import FlatQuantTensor, QuantTensor

    L, E, F, V = cfg.n_layer, cfg.n_embd, cfg.n_ff, cfg.n_vocab
    HD = cfg.n_head * cfg.head_dim
    KD = cfg.n_head_kv * cfg.head_dim
    keys = iter(jax.random.split(jax.random.PRNGKey(5), 16))
    SC = 2.2e-4  # ~N(0, 0.02) once dequantized; numerics irrelevant

    def fq(IN, OUT):
        # generated directly in the IN-major device layout, row-chunked
        CH = 128 if IN % 128 == 0 else (64 if IN % 64 == 0 else IN)
        q = _gen_stack_i8(next(keys), IN // CH, (CH, L * OUT),
                          reshape_to=(IN, L * OUT))
        s = jnp.full((IN // 32, L * OUT), SC, jnp.bfloat16)
        return FlatQuantTensor(q, s, "q8_0", OUT)

    flat = {}
    if "attn" in which:
        flat.update({"wq": fq(E, HD), "wk": fq(E, KD), "wv": fq(E, KD),
                     "wo": fq(HD, E)})
    if "ffn" in which:
        flat.update({"w_up": fq(E, F), "w_gate": fq(E, F),
                     "w_down": fq(F, E)})
    out_qt = None
    if "out" in which:
        CH = 128 if E % 128 == 0 else E
        qo = _gen_stack_i8(next(keys), E // CH, (CH, V), reshape_to=(E, V))
        out_qt = QuantTensor(qo, jnp.full((E // 32, V), SC, jnp.bfloat16),
                             "q8_0")
    return flat, out_qt


_STATE_PATH = None


def _bench_state(update: dict | None = None) -> dict:
    """Tiny cross-process state file (repo-root .bench_state.json): presets
    that measure an anchor (e.g. q8dense-13b) record it here; later presets
    report ratios against it, clearly labeled as separately measured."""
    import os

    global _STATE_PATH
    if _STATE_PATH is None:
        _STATE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".bench_state.json")
    state = {}
    if os.path.exists(_STATE_PATH):
        try:
            with open(_STATE_PATH) as f:
                state = json.load(f)
        except Exception:
            state = {}
    if update:
        state.update(update)
        with open(_STATE_PATH, "w") as f:
            json.dump(state, f, indent=1)
    return state


_PRESET_SHAPES = {
    # (L, E, H, Hkv, F, V, pred_rank)
    "13b": (40, 5120, 40, 40, 13824, 32000, 1280),
    "7b": (32, 4096, 32, 32, 11008, 32000, 1024),
    "3b": (26, 3200, 32, 32, 8640, 32000, 768),
    "1b": (22, 2048, 32, 4, 5632, 32000, 512),
    "tiny": (2, 256, 8, 4, 512, 1024, 64),
}


def _preset_cfg(preset: str):
    """ModelConfig for a synthetic preset — NO allocation (callers need
    the shapes before deciding what to build)."""
    from sparkinfer_tpu.models.config import ModelConfig

    L, E, H, Hkv, F, V, R = _PRESET_SHAPES[preset]
    F = (F // 128) * 128
    return ModelConfig(arch="prosparse_llama", n_layer=L, n_embd=E,
                       n_head=H, n_head_kv=Hkv, n_ff=F, n_vocab=V,
                       head_dim=E // H, pred_lora=(R,) * L)


def build_model_device(preset: str):
    """Device-side synthetic weights for the big presets: every tensor is
    generated BY THE CHIP via jax.random, so zero weight bytes ride the
    relay (the 13.5 GB host build + transfer is what ate the three failed
    7B windows — BENCH_NOTES). Returns (cfg, params_without_ffn_or_preds,
    gen_pred, gen_dense_ffn, gen_flat_ffn):
      gen_pred()      -> loop-invariant predictor stacks for
                         params["sparse_flat"] (pred_up_all …) — kept OUT
                         of the dense phase (dense never reads them; ~1 GB
                         at 7B) and stored ONCE (no rolled `_nx` copy;
                         resolve_predictor indexes il and (il+1) mod L)
      gen_dense_ffn() -> {w_up,w_gate,w_down} dense device arrays
      gen_flat_ffn()  -> v6 flat stores {w_upT_flat,w_gateT_flat,
                         w_down_flat} generated DIRECTLY in row layout
                         (the dense layout never coexists with it in HBM)
    The phases draw independent random values — irrelevant for a
    throughput bench; the predictor keeps the structured ~12%-firing bias."""
    import jax
    import jax.numpy as jnp

    from sparkinfer_tpu.models.config import ModelConfig

    cfg = _preset_cfg(preset)
    L, E, H, Hkv, F, V = (cfg.n_layer, cfg.n_embd, cfg.n_head,
                          cfg.n_head_kv, cfg.n_ff, cfg.n_vocab)
    R = cfg.pred_lora[0]
    D = cfg.head_dim
    keys = iter(jax.random.split(jax.random.PRNGKey(0), 32))

    def w(*shape, scale=0.02, dtype=jnp.bfloat16):
        return _gen_stack(next(keys), shape[0], shape[1:], dtype, scale)

    layers = {
        "attn_norm_w": jnp.ones((L, E), jnp.float32),
        "ffn_norm_w": jnp.ones((L, E), jnp.float32),
        "wq": w(L, E, H * D), "wk": w(L, E, Hkv * D), "wv": w(L, E, Hkv * D),
        "wo": w(L, H * D, E),
    }
    params = {
        "tok_embd": w(V, E),
        "output_norm_w": jnp.ones((E,), jnp.float32),
        "output": w(E, V),
        "layers": layers,
    }
    pred_keys = jax.random.split(jax.random.PRNGKey(2), 4)
    ffn_keys = jax.random.split(jax.random.PRNGKey(1), 6)

    def gen_pred():
        return {
            "pred_up_all": _gen_stack(pred_keys[0], L, (E, R),
                                      jnp.bfloat16, 0.05),
            "pred_up_b_all": jnp.zeros((L, R), jnp.float32),
            "pred_down_all": _gen_stack(pred_keys[1], L, (R, F),
                                        jnp.bfloat16, 0.6),
            "pred_down_b_all": _gen_stack(pred_keys[2], L, (F,),
                                          jnp.float32, 0.5) - 1.2,
        }

    def gen_dense_ffn():
        return {
            "w_up": _gen_stack(ffn_keys[0], L, (E, F), jnp.bfloat16, 0.02),
            "w_gate": _gen_stack(ffn_keys[1], L, (E, F), jnp.bfloat16, 0.02),
            "w_down": _gen_stack(ffn_keys[2], L, (F, E), jnp.bfloat16, 0.02),
        }

    def gen_flat_ffn(gs=128):
        ng = F // gs
        return {
            "w_upT_flat": _gen_stack(
                ffn_keys[3], L, (ng, E, gs), jnp.bfloat16, 0.02,
                reshape_to=(L * ng, E, gs)),
            "w_gateT_flat": _gen_stack(
                ffn_keys[4], L, (ng, E, gs), jnp.bfloat16, 0.02,
                reshape_to=(L * ng, E, gs)),
            "w_down_flat": _gen_stack(
                ffn_keys[5], L, (ng, gs, E), jnp.bfloat16, 0.02,
                reshape_to=(L * ng, gs, E)),
        }

    return cfg, params, gen_pred, gen_dense_ffn, gen_flat_ffn


def build_model_full_device(preset: str):
    """Full dense params + per-layer predictors, all generated ON DEVICE
    (zero weight bytes over the relay). Used by every tpu bench path —
    even the 1B host build (~2.2 GB) can stall for tens of minutes when
    the relay link degrades (observed ~50x slowdown days)."""
    cfg, params, gen_pred, gen_dense_ffn, _ = build_model_device(preset)
    params["layers"].update(gen_dense_ffn())
    preds = gen_pred()
    params["layers"].update({k[:-len("_all")]: v for k, v in preds.items()})
    return cfg, params


def make_fused_loop(fwd):
    import jax
    import jax.numpy as jnp

    def loop(params, tok, pos, cache):
        def body(carry, _):
            tok, pos, cache = carry
            logits, cache = fwd(params, tok, pos, cache)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
            return (nxt, pos + 1, cache), ()

        (tok, pos, cache), _ = jax.lax.scan(body, (tok, pos, cache), None,
                                            length=CHUNK)
        return tok, pos, cache

    return jax.jit(loop, donate_argnums=(3,))


class Path:
    """One decode path (dense or sparse) with its own cache + position.

    Decode runs UNFUSED (one donated jitted step per token, drain at trial
    end): probe #11 measured per-step dispatch FASTER than the lax.scan
    fused loop for BOTH modes on this relay (dense 4.20 vs 7.31 ms/step,
    sparse 3.18 vs 5.25 — the scan appears to defeat cache buffer aliasing);
    each mode gets its best-known configuration."""

    def __init__(self, name, fwd, params, cfg, S, prefill_fwd=None, batch=1):
        import jax
        import jax.numpy as jnp

        from sparkinfer_tpu.runtime.kv_cache import init_cache

        self.name = name
        self.params = params
        self.jnp = jnp
        self.batch = batch
        self.step = jax.jit(fwd, donate_argnums=(3,))
        T0 = 64
        cache = init_cache(cfg, batch, S, jnp.bfloat16)
        pstep = jax.jit(prefill_fwd if prefill_fwd is not None else fwd,
                        donate_argnums=(3,))
        lg, cache = pstep(params, jnp.zeros((batch, T0), jnp.int32),
                          jnp.broadcast_to(jnp.arange(T0, dtype=jnp.int32),
                                           (batch, T0)), cache)
        _drain(lg)
        self.cache = cache
        self.tok = jnp.zeros((batch, 1), jnp.int32)
        self.pos = T0

    def run_chunk(self) -> float:
        jnp = self.jnp
        t0 = time.perf_counter()
        for _ in range(CHUNK):
            lg, self.cache = self.step(
                self.params, self.tok,
                jnp.full((self.batch, 1), self.pos, jnp.int32), self.cache)
            self.pos += 1
        _drain(lg)
        return time.perf_counter() - t0


def _cap_groups(ng: int) -> int:
    """Top-k group capacity from the SPIF_BENCH_CAP fraction, rounded to
    a multiple of 4. Default 0.125 — the reference's ProSparse models fire
    ~10-12% of FFN neurons per token (README.md:8, ProSparse ~89-91%
    sparsity), so top-12.5% capacity is the configuration its own eval
    harness runs at; 0.25 (round-2's earlier default, the conservative
    over-provisioned row) remains one env knob away and both rows are
    recorded in BENCH_NOTES.md."""
    import os

    frac = float(os.environ.get("SPIF_BENCH_CAP", 0.125))
    return max(4, (int(ng * frac) + 3) // 4 * 4)


def build_sparse(cfg, params, preset, plat):
    """Returns (sparse_fwd, sparse_params, dense_prefill_fwd)."""
    import gc

    import jax.numpy as jnp

    from sparkinfer_tpu.models.transformer import make_forward
    from sparkinfer_tpu.sparse import SparseConfig, make_sparse_ffn
    from sparkinfer_tpu.sparse.ffn import (
        make_pipelined_sparse_ffn,
        prepare_pipelined_params,
    )

    ng = cfg.n_ff // 128 if cfg.n_ff % 128 == 0 else cfg.n_ff // 64
    gs = 128 if cfg.n_ff % 128 == 0 else 64
    cap = _cap_groups(ng)
    scfg = SparseConfig(group_size=gs, capacity_groups=cap)
    tight_hbm = preset == "7b"  # 7B needs the rows-only layout to fit
    if tight_hbm:
        # avoid transient dense+rows duplication in HBM: pull the FFN
        # weights to host, free the device copies, relayout on host
        # (v6 transposed stores for up/gate), re-upload
        host_ffn = {k: np.array(params["layers"][k])
                    for k in ("w_up", "w_gate", "w_down")}
        for k in ("w_up", "w_gate", "w_down"):
            del params["layers"][k]
        gc.collect()
        L, E, F2 = cfg.n_layer, cfg.n_embd, cfg.n_ff
        ngg = F2 // gs
        rows = {
            # FLAT (L*ng, ...) loop-invariant stores (see sparse/ffn.py
            # prepare_pipelined_params layout='v6' notes)
            "w_upT_flat": host_ffn["w_up"].reshape(L, E, ngg, gs)
            .transpose(0, 2, 1, 3).reshape(L * ngg, E, gs).copy(),
            "w_gateT_flat": host_ffn["w_gate"].reshape(L, E, ngg, gs)
            .transpose(0, 2, 1, 3).reshape(L * ngg, E, gs).copy(),
            "w_down_flat": host_ffn["w_down"].reshape(L * ngg, gs, E),
        }
        del host_ffn
        gc.collect()
        sparams = dict(params)
        slayers = dict(params["layers"])
        flat = {}
        for k in list(rows):
            flat[k] = jnp.asarray(rows.pop(k))
            gc.collect()
        for k in ("pred_up", "pred_up_b", "pred_down", "pred_down_b"):
            slayers[k + "_nx"] = jnp.roll(slayers[k], -1, axis=0)
        sparams["layers"] = slayers
        sparams["sparse_flat"] = flat
    else:
        sparams = prepare_pipelined_params(
            params, cfg, scfg, drop_dense=False,
            layout="v6" if plat == "tpu" else "v1")
    mode = "pallas" if plat == "tpu" else "gather"
    ffn, carry_init = make_pipelined_sparse_ffn(cfg, scfg, mode=mode)
    sparse_fwd = make_forward(cfg, ffn_fn=ffn, ffn_carry_init=carry_init)
    dense_prefill = make_forward(cfg, ffn_fn=make_sparse_ffn(cfg, scfg, mode="dense"))
    return sparse_fwd, sparams, dense_prefill


def make_cold(cfg, host_ffn, scfg):
    """Host-side neuron-major rows (ColdStore, f16) from the host copies
    build_model kept — no GB-scale device->host readback on the relay."""
    from sparkinfer_tpu.sparse.tiering import ColdStore

    L, E, F = cfg.n_layer, cfg.n_embd, cfg.n_ff
    G = scfg.group_size
    ng = F // G
    rows = {}
    for k in ("w_up", "w_gate", "w_down"):
        wnp = host_ffn[k]
        if k == "w_down":  # (L, F, E): already neuron-major rows
            rows[k + "_rows"] = wnp.reshape(L, ng, G, E)
        else:  # (L, E, F) -> (L, F, E) -> (L, ng, G, E)
            rows[k + "_rows"] = np.ascontiguousarray(
                wnp.transpose(0, 2, 1)).reshape(L, ng, G, E)
    return ColdStore(cfg, scfg, rows, dtype=np.float16)


class TieredPath:
    """Hot/cold tiered decode path: hot groups in HBM (v6 flat stores),
    cold in host RAM, DFR balancer rebalancing between chunks.

    The reference's core mode (llama-sparkinfer.cpp hot/cold caches); this
    measures it on-chip: tiered t/s vs dense/all-HBM sparse, and whether
    mode='host' (pure_callback complement) overlaps or serializes."""

    def __init__(self, name, cfg, scfg, cold, hot_groups, mode, plat,
                 params, S, store_quant=None, extra_flat=None, hot_np=None,
                 kv_int8=False):
        import jax
        import jax.numpy as jnp

        from sparkinfer_tpu.models.transformer import make_forward
        from sparkinfer_tpu.runtime.kv_cache import init_cache
        from sparkinfer_tpu.sparse.balancer import Balancer
        from sparkinfer_tpu.sparse.tiering import (
            DFRState,
            TieredParams,
            make_tiered_ffn,
            tiered_layer_params,
        )

        self.name = name
        self.jnp = jnp
        L, E, F = cfg.n_layer, cfg.n_embd, cfg.n_ff
        G = scfg.group_size
        ng = F // G
        H = hot_groups
        init_hot = np.tile(np.arange(H, dtype=np.int32), (L, 1))
        wdt = jnp.bfloat16 if plat == "tpu" else jnp.float32

        def sel_rows(w, transpose):  # cold (L, ng, G, E) -> flat (L*H, ...)
            sel = w[np.arange(L)[:, None], init_hot]
            if transpose:
                sel = np.swapaxes(sel, -1, -2)
            return sel.reshape((L * H,) + sel.shape[2:]).astype(np.float32)

        def hot(w, transpose):
            return jnp.asarray(sel_rows(w, transpose), wdt)

        gm = np.full((L, ng), -1, np.int32)
        gm[:, :H] = np.arange(H, dtype=np.int32)
        if store_quant == "q8_0":
            # Q8_0 hot store: quantize HOST-side (matches the balancer's
            # swap quantization) and upload packed — half the H2D bytes,
            # half the per-step sparse FFN stream (v6q kernel).
            # hot_np caches the host-side packed blocks across sweep
            # configs (same H => same store; only the upload repeats)
            from sparkinfer_tpu.ops.sparse_ffn_pallas import quantize_rows_q8_0

            if hot_np is not None and "qu" in hot_np:
                blocks = hot_np
            else:
                def hotq(w, transpose):
                    return quantize_rows_q8_0(sel_rows(w, transpose),
                                              transpose)

                qu_, su_ = hotq(cold.up, True)
                qg_, sg_ = hotq(cold.gate, True)
                qd_, sd_ = hotq(cold.down, False)
                blocks = {"qu": qu_, "su": su_, "qg": qg_, "sg": sg_,
                          "qd": qd_, "sd": sd_}
                if hot_np is not None:
                    hot_np.update(blocks)
            self.tp = TieredParams(
                hot_upT=jnp.asarray(blocks["qu"]),
                hot_gateT=jnp.asarray(blocks["qg"]),
                hot_down=jnp.asarray(blocks["qd"]),
                group_map=jnp.asarray(gm), hot_ids=jnp.asarray(init_hot),
                s_upT=jnp.asarray(blocks["su"]),
                s_gateT=jnp.asarray(blocks["sg"]),
                s_down=jnp.asarray(blocks["sd"]))
        else:
            self.tp = TieredParams(
                hot_upT=hot(cold.up, True), hot_gateT=hot(cold.gate, True),
                hot_down=hot(cold.down, False),
                group_map=jnp.asarray(gm), hot_ids=jnp.asarray(init_hot))
        self._extra_flat = dict(extra_flat or {})
        self.fs = DFRState(
            dfr=jnp.zeros((L, ng), jnp.float32),
            miss=jnp.zeros((L, 1), jnp.float32),
            steps=jnp.zeros((L, 1), jnp.float32),
            miss_g=(jnp.zeros((L, ng), jnp.float32)
                    if mode == "fetch" else None))
        ffn = make_tiered_ffn(cfg, scfg, cold, mode=mode,
                              kernel="pallas" if plat == "tpu" else "gather")
        # decode params: drop the dense FFN weights from the scan xs
        self._layers = {k: v for k, v in params["layers"].items()
                        if k not in ("w_up", "w_gate", "w_down")}
        lp, flat = tiered_layer_params(self._layers, self.tp)
        self.params = dict(params)
        self.params["layers"] = lp
        self.params["sparse_flat"] = {**flat, **self._extra_flat}
        self.step = jax.jit(make_forward(cfg, ffn_fn=ffn, stateful_ffn=True),
                            donate_argnums=(3, 4))
        self.balancer = Balancer(cold=cold, scfg=scfg, window=8, max_window=64)
        self.cache = init_cache(cfg, 1, S, jnp.bfloat16, quantized=kv_int8)
        self.tok = jnp.zeros((1, 1), jnp.int32)
        self.pos = 0
        self._tlp = tiered_layer_params

    def run_chunk(self):
        """-> (compute_s, miss_count_this_chunk, rebalance_s)."""
        jnp = self.jnp
        miss0 = float(np.asarray(self.fs.miss).sum())
        t0 = time.perf_counter()
        for _ in range(CHUNK):
            lg, self.cache, self.fs = self.step(
                self.params, self.tok,
                jnp.full((1, 1), self.pos, jnp.int32), self.cache, self.fs)
            self.pos += 1
        _drain(lg)
        dt = time.perf_counter() - t0
        t1 = time.perf_counter()
        mg = (np.asarray(self.fs.miss_g)
              if self.fs.miss_g is not None else None)
        self.tp = self.balancer.rebalance(self.tp, np.asarray(self.fs.dfr),
                                          miss_g=mg)
        if mg is not None:  # fetch tier: counts consumed by this rebalance
            self.fs = self.fs._replace(miss_g=jnp.zeros_like(self.fs.miss_g))
        lp2, flat2 = self._tlp(self._layers, self.tp)
        self.params["layers"] = lp2
        self.params["sparse_flat"] = {**flat2, **self._extra_flat}
        reb = time.perf_counter() - t1
        miss = float(np.asarray(self.fs.miss).sum()) - miss0
        return dt, miss, reb


def _skewed_pred_bias(cfg, ng):
    """ProSparse/DejaVu-style clustered firing: a random ~20% of neuron
    groups fire often, the rest almost never, shuffled per layer so the
    DFR balancer must discover the hot set online. Bias offsets scale with
    the pred-LoRA logit std (see tiered_main comment)."""
    rng = np.random.default_rng(7)
    L, F = cfg.n_layer, cfg.n_ff
    R = cfg.max_pred_rank
    sigma = 0.6 * (0.05 * np.sqrt(cfg.n_embd)) * np.sqrt(R / 2)
    b = np.full((L, F), -4.0 * sigma, np.float32)
    for l in range(L):
        true_hot = rng.choice(ng, size=max(1, ng // 5), replace=False)
        for g in true_hot:
            b[l, g * 128:(g + 1) * 128] = (
                rng.standard_normal(128).astype(np.float32) * 0.5 - 0.5) * sigma
    return b


def _modeled_baselines(preset, dense_gb):
    """Modeled bf16-dense + offload-dense baselines for beyond-HBM presets
    (calibrated traffic model; see BENCH_NOTES.md 13B section). Returns
    (modeled_dense_tps, {offload variants}, measured_link_bw)."""
    import importlib.util as _ilu
    import os as _os

    spec = _ilu.spec_from_file_location(
        "traffic_model", _os.path.join(_os.path.dirname(
            _os.path.abspath(__file__)), "eval_scripts",
            "traffic_model.py"))
    tm = _ilu.module_from_spec(spec)
    spec.loader.exec_module(tm)
    bw = (tm.step_bytes("7b")["dense"] * tm.MEASURED_DENSE_TPS["7b"])
    B = tm.step_bytes(preset)["dense"]
    modeled_dense = bw / B
    # Offload-dense: the reference's ACTUAL headline baseline — its
    # 5.05x (README.md:11) is vs dense llama.cpp with overflow layers
    # streaming over PCIe because the dense model does not fit VRAM
    # (README.md:8: ProSparse-13B FP16 = 26 GB on a 24 GB 4090). Model
    # the same regime here: the HBM-resident fraction of the weight
    # stream at the calibrated dense bandwidth, the overflow over the
    # host link — at the link bandwidth MEASURED on this chip, and at
    # a PCIe-4.0-class 25 GB/s for the reference-hardware framing.
    import jax as _jax

    probe = np.zeros((64 << 20) // 4, np.float32)  # 64 MB
    _jax.device_put(probe).block_until_ready()  # lazy-init path
    link_bw = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        _jax.device_put(probe).block_until_ready()
        link_bw = max(link_bw, probe.nbytes / (time.perf_counter() - t0))
    resid = min(1.0, 13.0 / dense_gb)

    def offload_tps(lbw):
        return 1.0 / (resid * B / bw + (1.0 - resid) * B / lbw)

    offload = {"measured_link": offload_tps(link_bw),
               "pcie25": offload_tps(25e9)}
    return modeled_dense, offload, link_bw


def measure_dense_anchor(preset, w8_attn=False, n_rounds=6):
    """MEASURED Q8_0/W8A8 dense decode on chip; returns best-round t/s.

    At 13B the bf16 dense model (25.4 GB) exceeds HBM, but Q8_0 dense
    (~13.7 GB incl. bf16 scales) fits — this measures the strongest dense
    deployment that actually runs on the chip, anchoring the beyond-HBM
    tiered ratios with a real number (VERDICT r2 weak #3 / item 3). All
    big matmuls read Q8_0 flat stores through the scalar-prefetch Pallas
    dequant kernel (ops/quant_matmul.quant_matmul_flat); the lm head is a
    packed QuantTensor. w8_attn=True swaps attention to XLA-native W8A8
    row-wise int8 (+ Q8_0 FFN/head) — the like-for-like anchor for the
    W8A8 tiered headline row. Frees everything it allocates (the caller
    may need the whole HBM next); records the result in .bench_state.json
    so separate invocations can still reference it."""
    import gc

    from sparkinfer_tpu.models.transformer import make_forward

    S = 640  # prefill 64 + warm/6 chunks x 64 = 512 steps < 640
    cfg, params, _gen_pred, _gen_dense, _gen_flat = build_model_device(preset)
    E, F, L = cfg.n_embd, cfg.n_ff, cfg.n_layer
    for k in ("wq", "wk", "wv", "wo"):
        del params["layers"][k]
    params.pop("output")
    gc.collect()
    if w8_attn:
        import jax as _jax
        import jax.numpy as jnp

        from sparkinfer_tpu.ops.quant_matmul import W8A8Tensor

        HD = cfg.n_head * cfg.head_dim
        KD = cfg.n_head_kv * cfg.head_dim
        keysw = iter(_jax.random.split(_jax.random.PRNGKey(9), 8))
        for k, INd, OUTd in (("wq", E, HD), ("wk", E, KD),
                             ("wv", E, KD), ("wo", HD, E)):
            q = _gen_stack_i8(next(keysw), L, (INd, OUTd))
            params["layers"][k] = W8A8Tensor(
                q, jnp.full((L, OUTd), 2.2e-4, jnp.float32))
        flat, out_qt = gen_q8_dense_flat(cfg, which=("ffn", "out"))
    else:
        flat, out_qt = gen_q8_dense_flat(cfg)
    params["sparse_flat"] = flat
    params["output"] = out_qt
    gb = sum(int(np.prod(t.q.shape)) * 1.0625
             for t in list(flat.values()) + [out_qt]) / 1e9
    tag = "w8dense" if w8_attn else "q8dense"
    notej({"phase": f"{tag}_stores_ready", "q8_weights_gb": round(gb, 2)})

    path = Path(tag, make_forward(cfg), params, cfg, S)
    path.run_chunk()  # warm/compile
    times = [path.run_chunk() for _ in range(n_rounds)]
    tps = CHUNK / min(times)
    _bench_state({f"{tag}_{preset}_tps": round(tps, 2)})
    notej({"phase": f"{tag}_done", "tps": round(tps, 2)})
    del path, params, flat, out_qt
    gc.collect()
    return tps


def q8dense_main(plat, preset="13b", w8_attn=False):
    """`bench.py q8dense|w8dense [size]`: standalone dense-anchor run."""
    cfg, _p, _gp, _gd, _gf = build_model_device(preset)
    E, F, L = cfg.n_embd, cfg.n_ff, cfg.n_layer
    tps = measure_dense_anchor(preset, w8_attn=w8_attn)
    dense_gb = (3 * E * F + 4 * E * cfg.n_head * cfg.head_dim) * L * 2 / 1e9
    modeled_dense, offload, _link = _modeled_baselines(preset, dense_gb)
    tag = "w8dense" if w8_attn else "q8dense"
    emit({
        "metric": f"decode_tps_{tag}_{preset}_b1",
        "value": round(tps, 2),
        "unit": "tokens/s",
        # ratio vs the modeled unlimited-HBM bf16 dense chip — the same
        # baseline family the tiered rows use
        "vs_baseline": round(tps / modeled_dense, 3),
        "modeled_bf16_dense_tps": round(modeled_dense, 2),
        "vs_offload_dense_pcie25": round(tps / offload["pcie25"], 2),
    })


def tiered_main_big(plat, preset):
    """Tiered hot/cold at HBM-tight scale (7B): dense baseline and tiered
    configs run SEQUENTIALLY (they cannot coexist in 15 GB), with the
    dense FFN and predictors generated on device (zero relay bytes) and
    only the host cold store + skewed bias built host-side. Ratios are
    sorted-paired within the process, like the tight sparse branch.

    This is the reference's core regime at real scale: at hot0.25 only
    ~2.1 GB of the 8.6 GB FFN row store is HBM-resident."""
    import gc

    import jax.numpy as jnp

    from sparkinfer_tpu.models.transformer import make_forward
    from sparkinfer_tpu.sparse import SparseConfig
    from sparkinfer_tpu.sparse.tiering import ColdStore

    S = 1024
    n_rounds = 6
    # shapes WITHOUT allocating (the anchors below build their own full
    # model — measuring them while this function's params sit in HBM was
    # the round-4 13B RESOURCE_EXHAUSTED: two attn stacks > 16 GB)
    cfg0 = _preset_cfg(preset)
    L, E, F = cfg0.n_layer, cfg0.n_embd, cfg0.n_ff
    ng = F // 128
    cap = max(4, (int(ng * 0.25) + 3) // 4 * 4)
    scfg = SparseConfig(group_size=128, capacity_groups=cap)

    # dense baseline phase (no predictors — dense never reads them);
    # beyond-HBM presets (13B: ~26 GB dense weights vs ~15 GB usable)
    # skip it and use the measured-7B-calibrated traffic model instead —
    # "dense cannot run at all" is the regime the hot/cold design is FOR
    # (ref README.md:8: ProSparse-13B FP16 on a 24 GB GPU)
    dense_gb = (3 * E * F + 4 * E * cfg0.n_head * cfg0.head_dim) * L * 2 / 1e9
    d_times, modeled_dense = None, None
    anchors = {}
    if dense_gb >= 13.0:
        modeled_dense, offload, link_bw = _modeled_baselines(preset, dense_gb)
        notej({
            "phase": "dense_skipped",
            "why": f"dense weights {dense_gb:.1f} GB exceed HBM",
            "modeled_dense_tps": round(modeled_dense, 2),
            "link_bw_gbps": round(link_bw / 1e9, 2),
            "modeled_offload_dense_tps": round(offload["measured_link"], 2),
            "modeled_offload_dense_tps_pcie25": round(offload["pcie25"], 2)})
        # SAME-PROCESS measured dense anchors (VERDICT r3 item 3: the
        # headline row must carry drift-free anchors, not cross-session
        # .bench_state values): the strongest runnable dense deployments —
        # W8A8-attention + Q8 FFN/head (like-for-like with the headline
        # sparse config) and all-Q8_0 via the pallas dequant kernels.
        # Measured FIRST, while HBM is empty — each builds+frees a full
        # Q8 13B (~9 GB peak).
        if plat == "tpu" and not os.environ.get("SPIF_BENCH_NO_ANCHORS"):
            anchors["w8dense"] = measure_dense_anchor(
                preset, w8_attn=True, n_rounds=4)
            anchors["q8dense"] = measure_dense_anchor(
                preset, w8_attn=False, n_rounds=4)

    cfg, params, gen_pred, gen_dense_ffn, _ = build_model_device(preset)
    if dense_gb < 13.0:
        dlayers = dict(params["layers"])
        dlayers.update(gen_dense_ffn())
        dparams = dict(params)
        dparams["layers"] = dlayers
        dense = Path("dense", make_forward(cfg), dparams, cfg, S)
        dense.run_chunk()  # warm
        d_times = [dense.run_chunk() for _ in range(n_rounds)]
        notej({"phase": "dense_done",
               "dense_tps": round(CHUNK / min(d_times), 2)})
        del dense, dparams, dlayers
        gc.collect()

    import os as _os

    # Round-3 north star (VERDICT item 1): at beyond-HBM scale the default
    # configs stack the three identified levers — Q8_0 hot store (v6q
    # fused-dequant kernel: half the sparse FFN stream AND ~2x hot groups
    # per HBM byte), Q8_0 predictor stacks (~13% of round-2 sparse bytes),
    # and a capacity sweep at the new miss curve. SPIF_BENCH_TIERED_BF16=1
    # reproduces the round-2 bf16 rows.
    use_q8 = ((d_times is None or _os.environ.get("SPIF_BENCH_TIERED_Q8"))
              and not _os.environ.get("SPIF_BENCH_TIERED_BF16"))

    # predictors: device-gen stacks; skewed bias so the balancer must
    # discover the hot set online
    preds = gen_pred()
    skew = jnp.asarray(_skewed_pred_bias(cfg, ng))
    extra_flat = None
    extra_flat_q4 = None
    extra_flat_w8 = None
    if use_q8:
        biases = {"pred_up_b_all": preds["pred_up_b_all"],
                  "pred_down_b_all": skew}
        extra_flat = {
            "pred_up_qt": _q8_flat_dev(preds["pred_up_all"]),
            "pred_down_qt": _q8_flat_dev(preds["pred_down_all"]),
            **biases,
        }
        extra_flat_q4 = {
            "pred_up_qt": _q4_flat_dev(preds["pred_up_all"]),
            "pred_down_qt": _q4_flat_dev(preds["pred_down_all"]),
            **biases,
        }
        extra_flat_w8 = {
            "pred_up_w8": _w8_dev(preds["pred_up_all"]),
            "pred_down_w8": _w8_dev(preds["pred_down_all"]),
            **biases,
        }
        del preds
        gc.collect()
    else:
        params["layers"].update({k[:-len("_all")]: v for k, v in preds.items()})
        params["layers"]["pred_down_b"] = skew

    # host cold store, f16 rows layout, built layer-by-layer; the ~17 GB
    # RNG takes ~13 min of CPU at 13B, so cache the arrays on disk and
    # mmap them back on reruns (same seed => same values). Repo-local
    # cache dir (persists to the driver's end-of-round run); the round-3
    # /tmp location is honored as a fallback if it already exists.
    import os.path as _osp

    cache_dir = os.path.join(CACHE_DIR, f"cold_{preset}")
    keys3 = ("w_up_rows", "w_gate_rows", "w_down_rows")
    legacy = f"/tmp/spif_cold_{preset}"
    if (not all(_osp.exists(f"{cache_dir}/{k}.npy") for k in keys3)
            and all(_osp.exists(f"{legacy}/{k}.npy") for k in keys3)):
        cache_dir = legacy
    rows = {}
    if all(_osp.exists(f"{cache_dir}/{k}.npy") for k in keys3):
        for k in keys3:
            rows[k] = np.load(f"{cache_dir}/{k}.npy", mmap_mode="r")
        notej({"phase": "cold_store_cached", "dir": cache_dir})
    else:
        _os.makedirs(cache_dir, exist_ok=True)
        rng = np.random.default_rng(11)
        for k in keys3:
            a = np.empty((L, ng, 128, E), np.float16)
            for l in range(L):
                a[l] = (rng.standard_normal((ng, 128, E), dtype=np.float32)
                        * 0.02).astype(np.float16)
            np.save(f"{cache_dir}/{k}.npy", a)
            rows[k] = a
    cold = ColdStore(cfg, scfg, rows, dtype=np.float16)
    del rows
    gc.collect()
    note(f"cold store: {cold.dtype} "
         f"{(cold.up.nbytes + cold.gate.nbytes + cold.down.nbytes) / 1e9:.2f}"
         " GB host")

    # sweep: (label, hot_frac, capacity_groups, store_quant)
    if use_q8:
        caps = [c for c in (28, 20, 16) if c <= ng] or [max(2, ng // 2)]
        cl = caps[-1]
        if _os.environ.get("SPIF_BENCH_TIERED_ALL"):
            # full matrix incl. the measured-negative rows (BENCH_NOTES
            # round 3): Q4_0 predictor (nibble-unpack VPU cost loses),
            # int8 KV (per-step dequant loses), q8full pallas attention
            # (custom calls break cross-op DMA prefetch)
            sweep = [(f"q8c{c}", 0.25, c, "q8_0", {}) for c in caps]
            sweep.append((f"q8c{cl}-q4p", 0.25, cl, "q8_0", {"pred": "q4"}))
            sweep.append((f"q8c{cl}-q4p-kv8", 0.25, cl, "q8_0",
                          {"pred": "q4", "kv8": True}))
            sweep.append((f"q8full-c{cl}", 0.25, cl, "q8_0", {"full": True}))
            sweep.append((f"w8a8attn-c{cl}", 0.25, cl, "q8_0",
                          {"w8a8": True}))
        elif _os.environ.get("SPIF_BENCH_TIERED_FETCH"):
            # fetch-tier chip rows (VERDICT r3 item 6): misses demand-enter
            # at each rebalance instead of waiting for DFR rank; second row
            # = the headline W8A8-attention config under fetch semantics
            sweep = [(f"q8c{cl}-fetch", 0.25, cl, "q8_0",
                      {"mode": "fetch"}),
                     (f"w8a8attn-c{cl}-fetch", 0.25, cl, "q8_0",
                      {"mode": "fetch", "w8a8": True}),
                     # probe #13 levers: predictor + head through XLA-
                     # native W8A8 (404->665 GB/s class, 2 fewer pallas
                     # calls/layer)
                     (f"w8max-c{cl}-fetch", 0.25, cl, "q8_0",
                      {"mode": "fetch", "w8a8": True, "pred": "w8",
                       "head": "w8"})]
        else:
            # driver default: ONLY the headline W8A8-attention fetch row —
            # round 3 burned ~12.5 min building+warming a drop row the
            # default no longer needs (VERDICT r3 item 1b). W8A8 =
            # XLA-NATIVE int8 MXU attention (scales fold out of the dot;
            # no pallas call, prefetch pipeline intact). mode="fetch":
            # measured SAME throughput as drop (55.1 vs 55.4 t/s) but
            # misses CONVERGE (40k -> 1.7k and falling over 7 chunks)
            # instead of plateauing at ~33k — near-exact semantics at no
            # cost (BENCH_NOTES round 3). SPIF_BENCH_TIERED_DROP=1
            # re-adds the pure-sparsity drop row.
            sweep = [(f"w8a8attn-c{cl}-fetch", 0.25, cl, "q8_0",
                      {"mode": "fetch", "w8a8": True})]
            if _os.environ.get("SPIF_BENCH_TIERED_DROP"):
                sweep.insert(0, (f"q8c{cl}", 0.25, cl, "q8_0", {}))
        only = _os.environ.get("SPIF_BENCH_TIERED_ONLY")
        if only:
            sweep = [s for s in sweep if s[0] in only.split(",")]
    elif d_times is None:
        sweep = [(f"c{cap}", f, cap, None, {}) for f in (0.15, 0.125)]
    else:
        sweep = [(f"c{cap}", f, cap, None, {}) for f in (0.5, 0.25)]
    # anchors: prefer SAME-PROCESS measurements (drift-free); fall back to
    # .bench_state.json values from separate q8dense/w8dense invocations
    q8d_tps = anchors.get("q8dense") or _bench_state().get(
        f"q8dense_{preset}_tps")
    w8d_tps = anchors.get("w8dense") or _bench_state().get(
        f"w8dense_{preset}_tps")
    anchors_same_process = "q8dense" in anchors

    results = {}
    hot_np_cache: dict[int, dict] = {}

    def _hotq_disk(H: int) -> dict:
        """Packed Q8_0 hot-store blocks are deterministic in (preset, H):
        persist them so the driver's run skips the ~3-4 min host-side
        quantize of the initial hot rows."""
        blocks = hot_np_cache.setdefault(H, {})
        fn = os.path.join(CACHE_DIR, f"hotq_{preset}_H{H}.npz")
        if not blocks and _osp.exists(fn):
            with np.load(fn) as z:
                blocks.update({k: z[k] for k in z.files})
            notej({"phase": "hot_blocks_cached", "file": fn})
        return blocks

    def _hotq_save(H: int):
        blocks = hot_np_cache.get(H) or {}
        fn = os.path.join(CACHE_DIR, f"hotq_{preset}_H{H}.npz")
        if blocks and not _osp.exists(fn):
            _os.makedirs(CACHE_DIR, exist_ok=True)
            np.savez(fn, **blocks)
    for label, frac, cap_g, squant, opts in sweep:
        if opts.get("w8a8"):
            import jax as _jax

            from sparkinfer_tpu.ops.quant_matmul import W8A8Tensor

            HD = cfg.n_head * cfg.head_dim
            KD = cfg.n_head_kv * cfg.head_dim
            keysw = iter(_jax.random.split(_jax.random.PRNGKey(9), 8))
            for k, INd, OUTd in (("wq", E, HD), ("wk", E, KD),
                                 ("wv", E, KD), ("wo", HD, E)):
                params["layers"].pop(k, None)
                gc.collect()
                q = _gen_stack_i8(next(keysw), L, (INd, OUTd))
                s = jnp.full((L, OUTd), 2.2e-4, jnp.float32)
                params["layers"][k] = W8A8Tensor(q, s)
            notej({"phase": "w8a8_attn_ready"})
        if opts.get("full"):
            for k in ("wq", "wk", "wv", "wo"):
                params["layers"].pop(k, None)
            params.pop("output", None)
            gc.collect()
            attn_flat, out_qt = gen_q8_dense_flat(cfg, which=("attn", "out"))
            params["output"] = out_qt
            extra_flat = {**(extra_flat or {}), **attn_flat}
            notej({"phase": "q8full_attn_ready"})
        ef = extra_flat
        if opts.get("pred") == "q4" and extra_flat_q4 is not None:
            ef = {**(extra_flat or {}), **extra_flat_q4}
        if opts.get("pred") == "w8" and extra_flat_w8 is not None:
            # w8 keys ONLY (no pred_*_qt: resolve_predictor prefers qt)
            ef = extra_flat_w8
        if opts.get("head") == "w8":
            import jax as _jax

            from sparkinfer_tpu.ops.quant_matmul import W8A8Tensor

            V = cfg.n_vocab
            params.pop("output", None)
            gc.collect()
            CH = 256
            qo = _gen_stack_i8(_jax.random.PRNGKey(7), E // CH, (CH, V),
                               reshape_to=(E, V))
            params["output"] = W8A8Tensor(qo, jnp.full((V,), 2.2e-4,
                                                       jnp.float32))
            notej({"phase": "w8_head_ready"})
        scfg_c = SparseConfig(group_size=128, capacity_groups=cap_g)
        H = max(1, int(ng * frac))
        mode_c = opts.get("mode", "drop")
        key = f"{mode_c}-{label}@hot{frac}"
        t_cfg = time.time()
        path = TieredPath(key, cfg, scfg_c, cold, H,
                          mode_c, plat, params, S, store_quant=squant,
                          extra_flat=ef,
                          hot_np=_hotq_disk(H),
                          kv_int8=bool(opts.get("kv8")))
        _hotq_save(H)
        notej({"phase": "path_built", "config": key,
               "t": round(time.time() - t_cfg, 1)})
        _, warm_miss, _ = path.run_chunk()  # warm/compile + cold-start miss
        notej({"phase": "warm_done", "config": key,
               "t": round(time.time() - t_cfg, 1)})
        r = {"t": [], "miss": [warm_miss], "reb": []}
        for _ in range(n_rounds):
            ct, miss, reb = path.run_chunk()
            r["t"].append(ct)
            r["miss"].append(miss)
            r["reb"].append(reb)
        if d_times is not None:
            r["ratio"] = [dt / ct
                          for dt, ct in zip(sorted(d_times), sorted(r["t"]))]
        else:  # beyond-HBM: ratio vs the modeled dense baseline
            r["ratio"] = [1.0 / (modeled_dense * ct) * CHUNK for ct in r["t"]]
        results[key] = r
        extra = {}
        tps_best = CHUNK / min(r["t"])
        if d_times is None:
            extra = {"vs_offload_dense":
                     round(tps_best / offload["measured_link"], 2),
                     "vs_offload_dense_pcie25":
                     round(tps_best / offload["pcie25"], 2)}
            if q8d_tps:  # separately measured anchor (bench.py q8dense)
                extra["vs_q8dense_measured"] = round(tps_best / q8d_tps, 3)
            if w8d_tps:  # strongest runnable dense (bench.py w8dense)
                extra["vs_w8dense_measured"] = round(tps_best / w8d_tps, 3)
        wbytes = 1.0625 if squant else 2.0
        notej({
            "config": key,
            "tps": round(tps_best, 1),
            "vs_dense": round(statistics.median(r["ratio"]), 3),
            **extra,
            "hot_gb": round(3 * H * L * 128 * E * wbytes / 1e9, 2),
            "miss_traj": [round(m, 0) for m in r["miss"]],
            "rebalance_ms": round(1e3 * statistics.median(r["reb"]), 1),
        })
        del path
        gc.collect()

    best = max(results, key=lambda f: CHUNK / min(results[f]["t"]))
    r = results[best]
    row = {
        "metric": f"decode_tps_tiered_{preset}_b1",
        "value": round(CHUNK / min(r["t"]), 2),
        "unit": "tokens/s",
        "vs_baseline": round(statistics.median(r["ratio"]), 3),
        "best_config": best,
    }
    if d_times is None:
        row["baseline"] = ("traffic-model dense @ measured-7B BW "
                           "(dense exceeds HBM)")
        tps_best = CHUNK / min(r["t"])
        row["vs_offload_dense"] = round(tps_best / offload["measured_link"], 2)
        row["vs_offload_dense_pcie25"] = round(tps_best / offload["pcie25"], 2)
        if q8d_tps:
            row["vs_q8dense_measured"] = round(tps_best / q8d_tps, 3)
            row["q8dense_measured_tps"] = round(q8d_tps, 2)
        if w8d_tps:
            row["vs_w8dense_measured"] = round(tps_best / w8d_tps, 3)
            row["w8dense_measured_tps"] = round(w8d_tps, 2)
        row["anchors_same_process"] = anchors_same_process
        row["miss_traj"] = [round(m, 0) for m in r["miss"]]
    emit(row, pri=3 if preset == "13b" else 2)


def tiered_main(plat, size=None):
    """`bench.py tiered [size]`: hot-fraction x {drop,host} sweep vs dense,
    with miss-rate trajectories (VERDICT item 4). Headline = best config."""
    from sparkinfer_tpu.models.transformer import make_forward
    from sparkinfer_tpu.sparse import SparseConfig

    preset = size or ("1b" if plat == "tpu" else "tiny")
    import os as _os

    if preset in ("7b", "13b") or _os.environ.get("SPIF_BENCH_TIERED_BIG"):
        return tiered_main_big(plat, preset)
    cfg, params, host_ffn = build_model(preset, host_ffn=True)
    S = 1024
    n_rounds = 6 if plat == "tpu" else 3
    ng = cfg.n_ff // 128
    cap = max(4, (int(ng * 0.25) + 3) // 4 * 4)
    scfg = SparseConfig(group_size=128, capacity_groups=cap)

    # Skew the predictor bias (clustered firing; uniform random firing
    # would light up every group every token and no tiering could win).
    # The pred-LoRA term has logit std ~ 0.6*(0.05*sqrt(E))*sqrt(R/2) (w
    # scales in build_model); bias offsets must scale with it or the noise
    # swamps the skew at 1B+ (observed: flat max misses on-chip).
    import jax.numpy as jnp

    params["layers"]["pred_down_b"] = jnp.asarray(_skewed_pred_bias(cfg, ng))

    cold = make_cold(cfg, host_ffn, scfg)
    del host_ffn
    print(f"# cold store: {cold.dtype} "
          f"{(cold.up.nbytes + cold.gate.nbytes + cold.down.nbytes) / 1e9:.2f} GB host",
          file=sys.stderr)

    dense = Path("dense", make_forward(cfg), params, cfg, S)
    dense.run_chunk()  # warm
    configs = [(m, f) for f in (0.5, 0.25) for m in ("drop", "host")]
    results = {k: {"t": [], "miss": [], "reb": [], "ratio": []}
               for k in configs}
    tiered = {}
    skipped = {}
    for mode, frac in configs:
        H = max(1, int(ng * frac))
        try:
            tiered[(mode, frac)] = TieredPath(
                f"tiered-{mode}-{frac}", cfg, scfg, cold, H, mode, plat, params, S)
            # warm/compile chunk; its miss count is the pre-balancer cold start
            _, warm_miss, _ = tiered[(mode, frac)].run_chunk()
            results[(mode, frac)]["miss"].append(warm_miss)
        except Exception as e:  # the axon relay rejects host callbacks
            skipped[(mode, frac)] = f"{type(e).__name__}: {str(e)[:120]}"
            tiered.pop((mode, frac), None)
    configs = [k for k in configs if k in tiered]
    d_times = []
    for _ in range(n_rounds):
        dt = dense.run_chunk()
        d_times.append(dt)
        for k in configs:
            ct, miss, reb = tiered[k].run_chunk()
            results[k]["t"].append(ct)
            results[k]["miss"].append(miss)
            results[k]["reb"].append(reb)
            results[k]["ratio"].append(dt / ct)

    best_key, best_tps, best_ratio = None, 0.0, 0.0
    print(f"# dense: {CHUNK / min(d_times):.1f} t/s", file=sys.stderr)
    for k, why in skipped.items():
        notej({"config": f"{k[0]}@hot{k[1]}", "skipped": why})
    for k in configs:
        r = results[k]
        tps = CHUNK / min(r["t"])
        ratio = statistics.median(r["ratio"])
        notej({
            "config": f"{k[0]}@hot{k[1]}", "tps": round(tps, 1),
            "vs_dense": round(ratio, 3),
            "miss_traj": [round(m, 0) for m in r["miss"]],
            "rebalance_ms": round(1e3 * statistics.median(r["reb"]), 1),
        })
        if tps > best_tps:
            best_key, best_tps, best_ratio = k, tps, ratio
    emit({
        "metric": f"decode_tps_tiered_{preset}_b1",
        "value": round(best_tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(best_ratio, 3),
        "best_config": f"{best_key[0]}@hot{best_key[1]}" if best_key else "none",
    }, pri=1)


def batch_main(plat):
    """`bench.py batch`: serving-batch amortization — sparse vs dense
    aggregate decode t/s at B in {1, 4, 8}. The sparse path's fixed
    per-step costs (predictor, top-k, kernel entry) amortize over the
    batch while its bandwidth saving persists, so the ratio should GROW
    with B (round-2 order-of-attack #3, BENCH_NOTES)."""
    from sparkinfer_tpu.models.transformer import make_forward

    from sparkinfer_tpu.sparse import SparseConfig
    from sparkinfer_tpu.sparse.ffn import make_pipelined_sparse_ffn

    preset = "1b" if plat == "tpu" else "tiny"
    if plat == "tpu":
        cfg, params = build_model_full_device(preset)
    else:
        cfg, params = build_model(preset)
    S = 1024
    n_trials = 4 if plat == "tpu" else 2
    dense_fwd = make_forward(cfg)
    sparse_fwd, sparams, dense_prefill = build_sparse(cfg, params, preset, plat)

    # round-3 union contender (VERDICT item 7): cross-token union of
    # selected groups read ONCE per layer (v7u kernel) with per-token
    # masks — attacks the B x C redundant block reads of the per-token
    # kernel; union capacity 4C (bucketed; drops least-shared overflow)
    ng = cfg.n_ff // 128 if cfg.n_ff % 128 == 0 else cfg.n_ff // 64
    gs = 128 if cfg.n_ff % 128 == 0 else 64
    scfg_u = SparseConfig(group_size=gs, capacity_groups=_cap_groups(ng))
    umode = "pallas_union" if plat == "tpu" else "gather_union"
    Cu = min(ng, 4 * scfg_u.capacity_groups)
    ffn_u, ci_u = make_pipelined_sparse_ffn(cfg, scfg_u, mode=umode,
                                            union_groups=Cu)
    union_fwd = make_forward(cfg, ffn_fn=ffn_u, ffn_carry_init=ci_u)

    best = None
    for B in (1, 4, 8):
        dense = Path("dense", dense_fwd, params, cfg, S, batch=B)
        sparse = Path("sparse", sparse_fwd, sparams, cfg, S,
                      prefill_fwd=dense_prefill, batch=B)
        union = Path("sparse_union", union_fwd, sparams, cfg, S,
                     prefill_fwd=dense_prefill, batch=B)
        dense.run_chunk()
        sparse.run_chunk()
        union.run_chunk()
        d_t, s_t, u_t, ratios, uratios = [], [], [], [], []
        for _ in range(n_trials):
            dt = dense.run_chunk()
            st = sparse.run_chunk()
            ut = union.run_chunk()
            d_t.append(dt)
            s_t.append(st)
            u_t.append(ut)
            ratios.append(dt / st)
            uratios.append(dt / ut)
        row = {
            "batch": B,
            "dense_tps": round(B * CHUNK / min(d_t), 1),
            "sparse_tps": round(B * CHUNK / min(s_t), 1),
            "union_tps": round(B * CHUNK / min(u_t), 1),
            "union_cap": Cu,
            "ratio": round(statistics.median(ratios), 3),
            "union_ratio": round(statistics.median(uratios), 3),
        }
        notej(row)
        row["best_mode"] = max(
            (row["dense_tps"], "dense"), (row["sparse_tps"], "sparse"),
            (row["union_tps"], "union"))[1]
        if best is None or max(row["sparse_tps"], row["union_tps"]) > \
                max(best["sparse_tps"], best["union_tps"]):
            best = row
        del dense, sparse, union
    sbest = max(best["sparse_tps"], best["union_tps"])
    emit({
        "metric": f"decode_tps_sparse_{preset}_batched",
        "value": sbest,
        "unit": "tokens/s",
        "vs_baseline": max(best["ratio"], best["union_ratio"]),
        "best_batch": best["batch"],
        "best_mode": best["best_mode"],
    }, pri=1)


def engine_main(plat, size=None):
    """`bench.py engine [size]`: the PRODUCT decode path (Engine.generate —
    prefill, pipelined unfused decode, on-device greedy sampling) vs the
    raw bench loop on the same sparse model. Guards against the product
    shipping a slower default than the benchmark (VERDICT r2 weak #1 /
    item 2: Engine within ~3% of the bench loop)."""
    import gc
    import os as _os

    from sparkinfer_tpu.models.loader import LoadedModel
    from sparkinfer_tpu.runtime.engine import Engine, PerfCounters
    from sparkinfer_tpu.runtime.sampling import SamplerConfig
    from sparkinfer_tpu.sparse import SparseConfig

    # one D2H round trip per 64 tokens through the ~25 ms relay (matches
    # the raw loop's chunk structure); local chips don't need it
    _os.environ.setdefault("SPARK_READBACK_BATCH", "64")
    preset = size or ("1b" if plat == "tpu" else "tiny")
    if plat == "tpu":
        cfg, params = build_model_full_device(preset)
    else:
        cfg, params = build_model(preset)
    S = 1024
    n_trials = 4 if plat == "tpu" else 2

    sparse_fwd, sparams, dense_prefill = build_sparse(cfg, params, preset, plat)
    raw = Path("sparse", sparse_fwd, sparams, cfg, S,
               prefill_fwd=dense_prefill)
    raw.run_chunk()
    raw_t = [raw.run_chunk() for _ in range(n_trials)]
    raw_tps = CHUNK / min(raw_t)
    del raw, sparams
    gc.collect()
    notej({"phase": "raw_loop_done", "raw_tps": round(raw_tps, 2)})

    ng = cfg.n_ff // 128 if cfg.n_ff % 128 == 0 else cfg.n_ff // 64
    gs = 128 if cfg.n_ff % 128 == 0 else 64
    scfg = SparseConfig(group_size=gs, capacity_groups=_cap_groups(ng))
    eng = Engine(LoadedModel(config=cfg, params=params), max_seq=S,
                 sampler=SamplerConfig(temp=0.0), sparse=scfg,
                 sparse_decode_mode="pallas" if plat == "tpu" else "gather")
    prompt = list(range(1, 33))
    eng.generate(prompt, max_new_tokens=4)  # warm/compile
    best = 0.0
    for _ in range(n_trials):
        eng.perf = PerfCounters()
        out = eng.generate(prompt, max_new_tokens=CHUNK)
        assert len(out) == CHUNK
        best = max(best, eng.perf.decode_tps)
    emit({
        "metric": f"decode_tps_engine_{preset}_b1",
        "value": round(best, 2),
        "unit": "tokens/s",
        # the product path's fraction of the raw bench loop's throughput
        "vs_baseline": round(best / raw_tps, 3),
        "raw_loop_tps": round(raw_tps, 2),
    }, pri=1)


def prefill_main(plat, size=None):
    """`bench.py prefill [size]`: prefill throughput on chip at pp512 /
    pp2048 (the reference publishes pp tables, benches/dgx-spark/
    dgx-spark.md:62-66) for dense AND the sparse path's masked-dense
    prefill (predictor + threshold mask on top of the dense matmuls) —
    VERDICT r2 item 5: no prefill number had ever been recorded on chip.
    Reports t/s, achieved TFLOP/s, and utilization vs the 122 TFLOP/s
    bf16 probe figure."""
    import statistics as _st

    import jax
    import jax.numpy as jnp

    from sparkinfer_tpu.models.transformer import make_forward
    from sparkinfer_tpu.runtime.kv_cache import init_cache
    from sparkinfer_tpu.sparse import SparseConfig, make_sparse_ffn

    preset = size or ("1b" if plat == "tpu" else "tiny")
    pps = (512, 2048) if plat == "tpu" else (64,)
    if preset == "7b":
        pps = (512, 1024, 2048)
    n_rep = 4 if plat == "tpu" else 2

    if plat == "tpu":
        # predictors are generated lazily for the SPARSE legs only — the
        # dense legs never read them and at 7B their ~1 GB is the margin
        # between pp2048 fitting and RESOURCE_EXHAUSTED
        cfg, params, gen_pred, gen_dense_ffn, _ = build_model_device(preset)
        params["layers"].update(gen_dense_ffn())
    else:
        cfg, params = build_model(preset)
        gen_pred = None
    L, E, F, V = cfg.n_layer, cfg.n_embd, cfg.n_ff, cfg.n_vocab
    HD = cfg.n_head * cfg.head_dim
    KD = cfg.n_head_kv * cfg.head_dim
    nmat = L * (E * HD + 2 * E * KD + HD * E + 3 * E * F) + E * V
    ng = F // 128
    scfg = SparseConfig(group_size=128, capacity_groups=_cap_groups(ng))
    dense_fwd = make_forward(cfg)
    sparse_fwd = make_forward(cfg, ffn_fn=make_sparse_ffn(cfg, scfg,
                                                          mode="dense"))
    R = cfg.max_pred_rank
    npred = L * (E * R + R * F)

    rows = []
    for pp in pps:
        toks = jnp.zeros((1, pp), jnp.int32)
        pos = jnp.arange(pp, dtype=jnp.int32)[None]
        res = {"pp": pp}
        variants = [("dense", dense_fwd, 0),
                    ("sparse_prefill", sparse_fwd, 2 * npred)]
        if preset == "7b" and pp > 1024:
            # dense weights + predictors + pp2048 KV/activations exceed
            # the 15 GB HBM together; the sparse-prefill overhead is
            # measured at pp<=1024 instead
            variants = variants[:1]
        for name, fwd, extra_flops in variants:
            p_run = params
            if name == "sparse_prefill" and gen_pred is not None:
                # predictors ride ONLY this leg's params (regenerated
                # on-device per pp, freed right after — see above)
                slayers = dict(params["layers"])
                slayers.update({k[:-len("_all")]: v
                                for k, v in gen_pred().items()})
                p_run = dict(params)
                p_run["layers"] = slayers
            f = jax.jit(fwd, donate_argnums=(3,))
            times = []
            for _ in range(n_rep + 1):
                cache = init_cache(cfg, 1, pp, jnp.bfloat16)
                t0 = time.perf_counter()
                lg, cache = f(p_run, toks, pos, cache)
                # drain a SCALAR that depends on the whole forward — a
                # full-logits np.asarray would pull pp x V x 4 bytes
                # (262 MB at pp2048) through the ~1.6 GB/s relay and
                # swamp the measurement
                _drain(lg[0, -1, :1])
                times.append(time.perf_counter() - t0)
            dt = _st.median(times[1:])  # first = compile
            flops = pp * (2 * nmat + extra_flops) + 2 * pp * pp * E * L
            res[f"{name}_tps"] = round(pp / dt, 1)
            res[f"{name}_tflops"] = round(flops / dt / 1e12, 1)
            if p_run is not params:
                import gc as _gc

                del p_run, slayers
                _gc.collect()
        if "sparse_prefill_tps" in res:
            res["sparse_overhead"] = round(
                res["dense_tps"] / res["sparse_prefill_tps"], 3)
        res["mxu_util_dense"] = round(res["dense_tflops"] / 122.0, 3)
        rows.append(res)
        notej(res)

    best = max(rows, key=lambda r: r["dense_tps"])
    emit({
        "metric": f"prefill_tps_dense_{preset}",
        "value": best["dense_tps"],
        "unit": "tokens/s",
        "vs_baseline": best["mxu_util_dense"],
        "baseline": "122 TFLOP/s bf16 probe (utilization)",
        "pp": best["pp"],
        "sparse_prefill_tps": best["sparse_prefill_tps"],
    }, pri=1)


def build_moe_model(preset: str):
    """Qwen3-MoE-style decode model for the fused-MoE bench: router +
    stacked experts, silu gating."""
    import jax.numpy as jnp

    from sparkinfer_tpu.models.config import ModelConfig

    shapes = {
        # name: (L, E, H, Hkv, F_exp, X, k, V)
        "moe": (12, 2048, 16, 4, 1408, 8, 2, 32000),
        # larger experts + more of them (mixtral-ish ratios): the regime
        # where row-streaming should beat the gather by more (VERDICT r2
        # weak #5: the kernel's claimed value was untested there)
        "moe-big": (8, 2048, 16, 4, 4096, 16, 2, 32000),
        "tiny": (2, 256, 8, 4, 128, 4, 2, 1024),
    }
    L, E, H, Hkv, F, X, k, V = shapes[preset]
    D = E // H
    cfg = ModelConfig(arch="qwen3moe", n_layer=L, n_embd=E, n_head=H,
                      n_head_kv=Hkv, n_ff=F, n_ff_exp=F, n_vocab=V,
                      head_dim=D, n_expert=X, n_expert_used=k)
    rng = np.random.default_rng(0)

    def w(*shape, scale=0.02):
        return jnp.asarray(rng.standard_normal(shape, dtype=np.float32) * scale,
                           jnp.bfloat16)

    layers = {
        "attn_norm_w": jnp.ones((L, E), jnp.float32),
        "ffn_norm_w": jnp.ones((L, E), jnp.float32),
        "wq": w(L, E, H * D), "wk": w(L, E, Hkv * D), "wv": w(L, E, Hkv * D),
        "wo": w(L, H * D, E),
        "w_router": w(L, E, X, scale=0.1),
        "w_up_exps": w(L, X, E, F),
        "w_gate_exps": w(L, X, E, F),
        "w_down_exps": w(L, X, F, E),
    }
    params = {
        "tok_embd": w(V, E),
        "output_norm_w": jnp.ones((E,), jnp.float32),
        "output": w(E, V),
        "layers": layers,
    }
    return cfg, params


def moe_main(plat, size=None):
    """`bench.py moe`: dense-gather vs fused row-streaming expert FFN at
    batch-1 decode. Dense mode materializes per-token (k, E, F) expert
    gathers in HBM (jnp.take) before the matmuls; the Pallas path streams
    only the selected rows HBM->VMEM (PARITY gap: fused-MoE engine path)."""
    from sparkinfer_tpu.models.transformer import make_forward
    from sparkinfer_tpu.sparse.moe import moe_layout

    preset = size or ("moe" if plat == "tpu" else "tiny")
    cfg, params = build_moe_model(preset)
    S = 1024
    n_trials = 6 if plat == "tpu" else 2

    dense_fwd = make_forward(cfg, moe_mode="dense")
    pallas_fwd = make_forward(cfg, moe_mode="pallas")
    rows_layers = moe_layout(params["layers"], cfg)
    for kk in ("w_up_exps", "w_gate_exps", "w_down_exps"):
        rows_layers.pop(kk)
    params_rows = dict(params) | {"layers": rows_layers}

    t0 = time.time()
    dense = Path("moe_dense", dense_fwd, params, cfg, S)
    notej({"phase": "dense_prefill_ok", "t": round(time.time() - t0, 1)})
    pallas = Path("moe_pallas", pallas_fwd, params_rows, cfg, S,
                  prefill_fwd=pallas_fwd)
    notej({"phase": "pallas_prefill_ok", "t": round(time.time() - t0, 1)})
    dense.run_chunk()
    notej({"phase": "dense_decode_ok", "t": round(time.time() - t0, 1)})
    pallas.run_chunk()
    notej({"phase": "pallas_decode_ok", "t": round(time.time() - t0, 1)})
    d_t, p_t, ratios = [], [], []
    for _ in range(n_trials):
        dt = dense.run_chunk()
        pt = pallas.run_chunk()
        d_t.append(dt)
        p_t.append(pt)
        ratios.append(dt / pt)
        notej({"dense_ms": round(dt * 1e3 / CHUNK, 2),
               "pallas_ms": round(pt * 1e3 / CHUNK, 2),
               "ratio": round(dt / pt, 3)})
    emit({
        "metric": f"decode_tps_moe_pallas_{preset}_b1",
        "value": round(CHUNK / min(p_t), 2),
        "unit": "tokens/s",
        "vs_baseline": round(statistics.median(ratios), 3),
        "dense_tps": round(CHUNK / min(d_t), 2),
    }, pri=1)


def _manual_axon_register():
    """Replicate the relay sitecustomize's registration with a STABLE
    session_id: the axon claim protocol supports same-session reclaim
    (`try-claim ... reclaimed=`), so a respawned worker can reattach to
    its predecessor's grant instead of waiting out far-side expiry (the
    round-4 wedge forensics, BENCH_NOTES). Caller must have launched the
    process with PALLAS_AXON_POOL_IPS UNSET so sitecustomize didn't
    already register with a random uuid session."""
    os.environ["AXON_POOL_SVC_OVERRIDE"] = "127.0.0.1"
    os.environ["AXON_LOOPBACK_RELAY"] = "1"
    os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    os.environ["PALLAS_AXON_POOL_IPS"] = "127.0.0.1"
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    from axon.register import register

    register(
        None, f"{gen}:1x1x1", so_path="/opt/axon/libaxon_pjrt.so",
        session_id=os.environ.get("SPIF_BENCH_SESSION", "spif-bench-r4"),
        remote_compile=os.environ.get(
            "PALLAS_AXON_REMOTE_COMPILE", "1") == "1",
    )


def main():
    import jax

    if os.environ.get("SPIF_BENCH_MANUAL_AXON") == "1":
        try:
            _manual_axon_register()
        except Exception as e:
            note(f"manual axon register failed ({e}); relying on "
                 "sitecustomize registration")

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    _install_headline_guard()
    note("bench start: enumerating devices")
    plat = jax.devices()[0].platform
    note(f"bench start: platform={plat}")
    if plat == "tpu":
        # a trivial op proves the relay executes before we sink minutes
        # into device-side weight gen with no output
        import time as _time

        import jax.numpy as _jnp

        t0 = _time.time()
        float(_jnp.ones((8, 8)).sum())
        note(f"bench start: first op ok in {_time.time() - t0:.1f}s")
        sentinel = os.environ.get("SPIF_BENCH_SENTINEL")
        if sentinel:  # tell the supervisor the relay is live
            with open(sentinel, "w") as f:
                f.write("ok")
    args = [a for a in sys.argv[1:] if a != "--worker"]
    if plat == "tpu":
        # HBM gate: a dead session's buffers free LAZILY far-side
        # (minutes); probe-allocate this preset's working set and wait
        # while holding OUR claim instead of dying RESOURCE_EXHAUSTED
        _wait_hbm_free(args[0] if args else "13b")
    if args:
        return run_preset(args[0], plat)
    if plat != "tpu":
        return run_preset("tiny", plat)
    # Driver default on TPU (VERDICT r3 item 1d): 1B first (fast,
    # guaranteed fallback row), then the 13B beyond-HBM tiered fetch
    # headline (the north-star metric) SECOND so it lands well inside the
    # driver window, then 7B breadth. Because emit() demotes lower-
    # priority rows to comments once the 13B headline (pri 3) has landed,
    # the 13B row stays the last JSON line no matter what runs after it.
    import gc

    run_preset("1b", plat)
    gc.collect()
    run_preset("tiered-13b", plat)
    gc.collect()
    run_preset("7b", plat)


def _wait_hbm_free(preset_name: str, deadline_s: float = 1200.0):
    """Block until ~the preset's HBM working set can actually be
    allocated (probe alloc + free), retrying while the previous
    session's buffers drain far-side."""
    import gc
    import time as _time

    import jax.numpy as _jnp

    name = preset_name or ""
    if "13b" in name or "7b" in name:
        gb = 13.0
    elif "1b" in name or "3b" in name:
        gb = 7.0
    else:
        return
    t0 = _time.time()
    n = int(gb * 1e9) // 2
    ok_streak = 0
    while True:
        try:
            x = _jnp.zeros((n,), _jnp.bfloat16)
            x.block_until_ready()
            del x
            gc.collect()
            ok_streak += 1
            # the probe's own free is ASYNC through the relay — one
            # success followed immediately by real allocations can OOM on
            # the probe's still-draining buffer (observed). Require two
            # spaced successes, then give the last free time to land.
            if ok_streak >= 2:
                _time.sleep(10)
                note(f"hbm gate: {gb:.0f} GB allocatable after "
                     f"{_time.time() - t0:.0f}s")
                return
            _time.sleep(8)
        except Exception as e:
            ok_streak = 0
            if _time.time() - t0 > deadline_s:
                note(f"hbm gate: still blocked after {deadline_s:.0f}s "
                     f"({type(e).__name__}); proceeding anyway")
                return
            note(f"hbm gate: {gb:.0f} GB not free yet "
                 f"({type(e).__name__}); retrying in 30s")
            _time.sleep(30)


def supervise() -> int:
    """Relay-wedge-resilient, HBM-isolated launcher for the driver run.

    Two failure modes this handles (round-4 forensics, BENCH_NOTES):
      * the axon claim leg can hang a fresh process for minutes-to-never
        (far-side grant expiry; same-session reclaim helps) — so each
        worker must produce a first-op sentinel within SPIF_BENCH_PROBE_S
        or exactly its process group is killed and a new worker retries;
      * one process running 1B then 13B can die RESOURCE_EXHAUSTED on
        leftover HBM — so EACH PRESET runs in its own worker process
        (exit = guaranteed HBM release; the stable session id means the
        next worker reclaims the chip grant without re-queueing).

    The supervisor filters worker stdout to keep the driver's last-JSON-
    line contract: metric rows carry "pri", and once a higher-priority
    row has printed, lower rows demote to stderr comments. SIGTERM
    forwards to the live worker, then the best row is re-printed."""
    import json as _json
    import subprocess
    import tempfile
    import threading
    import time as _time

    presets = os.environ.get("SPIF_BENCH_PRESETS",
                             "1b,tiered-13b,7b").split(",")
    attempts = int(os.environ.get("SPIF_BENCH_ATTEMPTS", "8"))
    # the claim leg itself can wait out a far-side grant expiry (observed
    # 164 s; degraded days run longer) — give each worker a real window
    probe_s = float(os.environ.get("SPIF_BENCH_PROBE_S", "600"))
    backoff_s = float(os.environ.get("SPIF_BENCH_BACKOFF_S", "30"))
    best = {"row": None, "pri": -1}
    live = {"p": None}
    # one session per supervisor RUN, shared by its workers: intra-run
    # reclaim without inheriting a previous (possibly crashed) session's
    # far-side state
    session = os.environ.get("SPIF_BENCH_SESSION",
                             f"spif-bench-{os.getpid()}")

    def print_best():
        if best["row"] is not None:
            print(_json.dumps(best["row"]), flush=True)

    def fwd_term(_sig, _frm):
        p = live["p"]
        if p is not None:
            try:
                p.terminate()
                p.wait(20)
            except Exception:
                pass
        print_best()
        os._exit(0)

    try:
        signal.signal(signal.SIGTERM, fwd_term)
    except (ValueError, OSError):
        pass

    def pump(p):
        """Filter worker stdout: JSON metric rows print when their pri
        still leads; everything else demotes to a stderr comment."""
        for raw in p.stdout:
            line = raw.decode(errors="replace").rstrip("\n")
            row = None
            if line.startswith("{"):
                try:
                    row = _json.loads(line)
                except ValueError:
                    row = None
            if isinstance(row, dict) and "metric" in row:
                pri = int(row.get("pri", 0))
                if pri >= best["pri"]:
                    best["row"], best["pri"] = row, pri
                    print(line, flush=True)
                    continue
            print("# " + line, file=sys.stderr, flush=True)

    for preset in presets:
        done = False
        for i in range(attempts):
            fd, sentinel = tempfile.mkstemp(prefix="spif_bench_alive_")
            os.close(fd)
            os.unlink(sentinel)  # worker recreates it after its first op
            env = dict(os.environ)
            env["SPIF_BENCH_SENTINEL"] = sentinel
            # fixed-session registration: drop the sitecustomize trigger
            # so the worker registers itself with the stable session id
            env.pop("PALLAS_AXON_POOL_IPS", None)
            env["SPIF_BENCH_MANUAL_AXON"] = "1"
            env["SPIF_BENCH_SESSION"] = session
            p = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), preset,
                 "--worker"],
                env=env, start_new_session=True, stdout=subprocess.PIPE)
            live["p"] = p
            t = threading.Thread(target=pump, args=(p,), daemon=True)
            t.start()
            t0 = _time.time()
            alive = False
            while _time.time() - t0 < probe_s:
                if os.path.exists(sentinel):
                    alive = True
                    break
                if p.poll() is not None:
                    break
                _time.sleep(2)
            if alive or p.poll() is not None:
                rc = p.wait()
                t.join(timeout=10)
                try:
                    os.unlink(sentinel)
                except OSError:
                    pass
                note(f"supervisor: preset {preset} worker exited rc={rc}")
                if rc == 0:
                    done = True
                    break
                # nonzero exit: usually RESOURCE_EXHAUSTED on the previous
                # worker's far-side buffers, which free LAZILY a few
                # seconds after session handoff (round-4 forensics: a 13B
                # worker OOMed 2 min after a clean 1b exit, then a 7B
                # worker 45 s later ran fine) — back off and retry
                note(f"supervisor: retrying {preset} after failure "
                     f"(attempt {i + 1}/{attempts})")
                _time.sleep(max(backoff_s, 45.0))
                continue
            note(f"supervisor: no first op from {preset} worker {p.pid} "
                 f"in {probe_s:.0f}s — relay wedged; attempt "
                 f"{i + 1}/{attempts}")
            # TERM first: the axon client sends an advisory /v1/claim
            # DELETE on clean shutdown — a SIGKILLed claimant leaves its
            # pending claim poisoning the far-side queue
            try:
                os.killpg(p.pid, signal.SIGTERM)
            except (ProcessLookupError, PermissionError):
                p.terminate()
            try:
                p.wait(20)
            except subprocess.TimeoutExpired:
                try:
                    os.killpg(p.pid, signal.SIGKILL)  # exactly this worker
                except (ProcessLookupError, PermissionError):
                    p.kill()
                p.wait()
            t.join(timeout=10)
            _time.sleep(backoff_s)
        if not done:
            note(f"supervisor: preset {preset} never completed; moving on")
        # let the far side actually release this preset's buffers before
        # the next worker allocates (lazy free, see retry note above)
        _time.sleep(20)
    live["p"] = None
    print_best()
    return 0 if best["row"] is not None else 1


def run_preset(preset, plat):
    from sparkinfer_tpu.models.transformer import make_forward

    if preset.startswith("tiered"):
        return tiered_main(plat, preset[6:].lstrip("-") or None)
    if preset.startswith("q8dense"):
        return q8dense_main(plat, preset[7:].lstrip("-") or "13b")
    if preset.startswith("w8dense"):
        return q8dense_main(plat, preset[7:].lstrip("-") or "13b",
                            w8_attn=True)
    if preset == "batch":
        return batch_main(plat)
    if preset.startswith("moe"):
        return moe_main(plat, preset if preset != "moe" else None)
    if preset.startswith("engine"):
        return engine_main(plat, preset[6:].lstrip("-") or None)
    if preset.startswith("prefill"):
        return prefill_main(plat, preset[7:].lstrip("-") or None)
    import os as _os

    tight_hbm = preset == "7b" or _os.environ.get("SPIF_BENCH_DEVINIT") == "1"
    S = 1024
    n_trials = 3 if preset == "tiny" else 6

    if tight_hbm:
        # HBM cannot hold both layouts at 7B: measure dense fully first,
        # free it, then sparse (same process; drift within a process is
        # far below the cross-process band — BENCH_NOTES.md). Weights are
        # generated ON DEVICE (build_model_device): zero weight bytes ride
        # the relay, and the sparse flat stores are drawn directly in v6
        # layout so the dense layout never coexists with them in HBM.
        import gc

        import jax.numpy as jnp

        from sparkinfer_tpu.sparse import SparseConfig, make_sparse_ffn
        from sparkinfer_tpu.sparse.ffn import make_pipelined_sparse_ffn

        cfg, params, gen_pred, gen_dense_ffn, gen_flat_ffn = (
            build_model_device(preset))
        dense_fwd = make_forward(cfg)
        dlayers = dict(params["layers"])
        dlayers.update(gen_dense_ffn())
        dparams = dict(params)
        dparams["layers"] = dlayers
        dense = Path("dense", dense_fwd, dparams, cfg, S)
        dense.run_chunk()  # warm
        d_times = [dense.run_chunk() for _ in range(n_trials)]
        dense_tps_now = CHUNK / min(d_times)
        notej({"phase": "dense_done", "dense_tps": round(dense_tps_now, 2)})
        del dense, dparams, dlayers
        gc.collect()

        ng = cfg.n_ff // 128
        scfg = SparseConfig(group_size=128, capacity_groups=_cap_groups(ng))
        slayers = dict(params["layers"])
        sparams = dict(params)
        sparams["layers"] = slayers
        mode = "pallas" if plat == "tpu" else "gather"
        # predictor stacks are loop-invariant sparse_flat operands (stored
        # ONCE — no per-layer xs slices, no rolled `_nx` duplicate)
        sparams["sparse_flat"] = gen_pred()
        flat = gen_flat_ffn()
        if mode == "pallas":
            sparams["sparse_flat"].update(flat)
        else:  # CPU smoke of this branch: gather mode reads rows in layers
            L2 = cfg.n_layer
            slayers["w_up_rows"] = jnp.swapaxes(
                flat["w_upT_flat"].reshape(L2, ng, cfg.n_embd, 128), -1, -2)
            slayers["w_gate_rows"] = jnp.swapaxes(
                flat["w_gateT_flat"].reshape(L2, ng, cfg.n_embd, 128), -1, -2)
            slayers["w_down_rows"] = flat["w_down_flat"].reshape(
                L2, ng, 128, cfg.n_embd)
            del flat
        ffn, carry_init = make_pipelined_sparse_ffn(cfg, scfg, mode=mode)
        sparse_fwd = make_forward(cfg, ffn_fn=ffn, ffn_carry_init=carry_init)
        # prefill through the sparse step itself: the masked-dense-from-flat
        # prefill einsum can materialize a full-store transpose copy inside
        # the prefill executable (2.85 GB — fatal at 7B); prefill numerics
        # are irrelevant for a synthetic throughput bench
        sparse = Path("sparse", sparse_fwd, sparams, cfg, S)
        sparse.run_chunk()
        s_times = [sparse.run_chunk() for _ in range(n_trials)]
        ratios = [dt / st for dt, st in zip(sorted(d_times), sorted(s_times))]
    else:
        if plat == "tpu":  # zero weight bytes over the relay (see above)
            cfg, params = build_model_full_device(preset)
        else:
            cfg, params = build_model(preset)
        dense_fwd = make_forward(cfg)
        sparse_fwd, sparams, dense_prefill = build_sparse(cfg, params, preset, plat)
        dense = Path("dense", dense_fwd, params, cfg, S)
        sparse = Path("sparse", sparse_fwd, sparams, cfg, S,
                      prefill_fwd=dense_prefill)
        dense.run_chunk()  # warm/compile
        sparse.run_chunk()
        d_times, s_times, ratios = [], [], []
        for _ in range(n_trials):
            dt = dense.run_chunk()
            st = sparse.run_chunk()
            d_times.append(dt)
            s_times.append(st)
            ratios.append(dt / st)

    sparse_tps = CHUNK / min(s_times)
    dense_tps = CHUNK / min(d_times)
    ratio = statistics.median(ratios)
    # ONE row per preset carrying both modes (the old separate dense JSON
    # row could be parsed as the result if a timeout landed between the
    # two prints); priority: 7b sparse 2 > 1b sparse 1
    emit({
        "metric": f"decode_tps_sparse_{preset}_b1",
        "value": round(sparse_tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(ratio, 3),
        "dense_tps": round(dense_tps, 2),
        "ratio_spread": [round(min(ratios), 3), round(max(ratios), 3)],
    }, pri=2 if preset == "7b" else 1)


if __name__ == "__main__":
    # the driver's no-args run goes through the wedge-resilient
    # supervisor; explicit presets and --worker run directly
    if (len(sys.argv) == 1 and os.environ.get("JAX_PLATFORMS") == "axon"
            and not os.environ.get("SPIF_BENCH_NO_SUPERVISE")):
        sys.exit(supervise())
    main()
