"""Continuous-batching scheduler — the TPU re-design of llama-server's slot
machinery (tools/server/server-context.cpp update_slots :704-775,
server-queue.h, slot selection/deferral :1479-1493).

Reference: one inference thread builds a single llama_batch (<= n_batch
tokens) across all running slots each iteration, decodes, samples per slot,
streams results. Here the analogue is ONE jitted batched decode step over a
fixed slot count B (static shapes): every tick gathers each running slot's
last token + position, steps them together, and samples with the vmapped
sampler chain (per-slot sampler state, seeds, penalties).

Prefill runs per-slot at batch=1 over bucketed lengths (bounded compile
count) into a slot-sized cache view scattered into the shared cache —
the analogue of ubatch splitting (src/llama-batch.h:101-107). New requests
admit into free slots; when none are free they queue FIFO (the reference's
"defer" path).
"""

from __future__ import annotations

import itertools
import os
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from .engine import bucket_len
from .kv_cache import KVCache, init_cache
from .sampling import (
    SamplerConfig,
    dynamic_params,
    init_state,
    make_dynamic_sampler,
)


@dataclass
class Request:
    prompt_tokens: list[int]
    max_new_tokens: int = 128
    sampler: SamplerConfig | None = None
    seed: int | None = None
    stop_ids: set[int] = field(default_factory=set)
    stop_strings: list[str] = field(default_factory=list)  # OpenAI `stop`
    grammar: str | None = None  # GBNF source (constrained decoding)
    _gsampler: object = None  # GrammarSampler, built at admit time
    # filled by the scheduler
    id: int = -1
    out_queue: "queue.Queue[int | None]" = field(default_factory=queue.Queue)
    n_prompt: int = 0
    created_s: float = field(default_factory=time.time)
    first_token_s: float | None = None
    done_s: float | None = None

    def stream(self) -> Iterator[int]:
        while True:
            t = self.out_queue.get()
            if t is None:
                return
            yield t

    def tokens(self) -> list[int]:
        return list(self.stream())


@dataclass
class SlotState:
    req: Request | None = None
    n_past: int = 0
    n_gen: int = 0
    last_token: int = 0
    # token history whose KV lives in this slot's cache rows (enables
    # prompt-prefix reuse + /slots save|restore, ref server slot save)
    cached_tokens: list[int] = field(default_factory=list)

    @property
    def running(self) -> bool:
        return self.req is not None


class Scheduler:
    """Owns the slot cache + per-slot sampler states and the decode loop.

    Built on a LoadedModel the same way Engine is; in fact it reuses the
    Engine's jitted fwd/sample by constructing one internally.
    """

    def __init__(
        self,
        model,
        n_slots: int = 4,
        max_seq: int = 2048,
        sampler: SamplerConfig | None = None,
        kv_dtype=jnp.bfloat16,
        kv_dtype_v=None,  # -ctv: separate V storage dtype (None = kv_dtype)
        kv_quantized: bool = False,
        ffn_fn: Callable | None = None,
        tokenizer=None,  # needed for grammar-constrained requests
        sparse=None,  # SparseConfig: predictor-gated sparse serving
        split=None,  # ModelSplit | path — offline profile (reorder + pattern)
        rebalance_every: int = 1,
        sparse_batch_max: int | None = None,  # None -> per-shape calibration
        slot_similarity: float = 0.0,  # -sps: prefix-similarity slot routing
        sparse_cold_mode: str = "host",  # "host" | "drop" | "fetch"
        prefill_mode: str = "rows",  # "rows" | "tiered" (tiered serving)
    ):
        self.slot_similarity = float(slot_similarity)
        self.sparse_cold_mode = sparse_cold_mode
        self.prefill_mode = "rows"
        from ..models.transformer import make_forward

        self.tokenizer = tokenizer
        self.model = model
        self.cfg = model.config
        self.n_slots = n_slots
        self.max_seq = max_seq
        self.sampler_cfg = sampler or SamplerConfig()
        # per-slot DYNAMIC sampler: every request's temp/top_k/top_p/...
        # rides as data, so one compiled step serves mixed sampler configs
        # (the reference builds a sampler chain per slot at launch time)
        self.sample = make_dynamic_sampler(self.sampler_cfg)
        self.tiered = sparse is not None and sparse.hot_groups > 0
        self.rebalance_every = max(rebalance_every, 1)
        self._fstate = None
        if sparse is not None:
            # sparse serving: masked-dense prefill, gathered top-k decode;
            # with hot_groups>0, hot/cold tiering + between-tick balancing
            from ..sparse.ffn import make_sparse_ffn, prepare_sparse_params

            if not self.cfg.has_predictors:
                raise ValueError("sparse serving needs predictor tensors")
            host_perms = None
            if split is not None:
                # offline profile: hot-first reorder so the default first-H
                # hot set IS the profiled hot set (ref: SPIF_REORDER,
                # src/llama-sparkinfer.cpp:286-352; round-1 served unprofiled)
                from ..sparse.split import ModelSplit, apply_reorder, read_split

                if not isinstance(split, ModelSplit):
                    split = read_split(split)
                if self.tiered and prefill_mode == "tiered":
                    # memory-critical regime: even ONE extra device
                    # tensor copy exceeds HBM at 7B (measured
                    # RESOURCE_EXHAUSTED) — permute only the small
                    # tensors on device and fold the big-FFN permutation
                    # into the host-side rows conversion below
                    self.model.params = apply_reorder(
                        self.model.params, self.cfg, split.perms,
                        inplace=True,
                        keys=("b_up", "pred_down", "pred_down_b"))
                    host_perms = split.perms
                else:
                    # inplace: the Scheduler owns and rebinds params, and
                    # the copy semantics hold 2x the FFN transiently
                    self.model.params = apply_reorder(
                        self.model.params, self.cfg, split.perms,
                        inplace=True)
            if self.tiered and prefill_mode == "tiered":
                # memory-critical regime (>=7B on a 16 GB chip): the FFN
                # NEVER takes row form in HBM. Each dense tensor is read
                # back layer-by-layer (a full-tensor D2H stages ~3 GB of
                # device scratch; a layer slice ~100 MB), converted to the
                # neuron-row layout host-side, and its device copy freed
                # before the next tensor moves — then only the hot blocks
                # are uploaded, mirroring the reference's first-m-rows-only
                # GPU cache (src/llama-sparkinfer.cpp:354-359). Device-side
                # conversion (even with donated buffers) double-buffers
                # each tensor during the transpose and OOMed at 7B.
                import gc

                G = sparse.group_size
                F, E = self.cfg.n_ff, self.cfg.n_embd
                ngr = sparse.n_groups(F)
                lay = self.model.params["layers"]
                self._cold_np = {}
                for kd, kr, colmajor in (("w_up", "w_up_rows", True),
                                         ("w_gate", "w_gate_rows", True),
                                         ("w_down", "w_down_rows", False)):
                    if kd not in lay:
                        continue
                    w = lay.pop(kd)
                    L = w.shape[0]
                    host = None
                    for li in range(L):
                        a = np.asarray(w[li])  # (E,F) col / (F,E) row
                        if colmajor:
                            a = np.ascontiguousarray(a.T)
                        if host_perms is not None:
                            # deferred hot-first reorder (see above):
                            # rows are neuron-major here, one cheap host
                            # gather per layer
                            a = a[host_perms[li]]
                        if host is None:
                            host = np.empty((L, ngr, G, E), a.dtype)
                        host[li] = a.reshape(ngr, G, E)
                    del w
                    gc.collect()
                    self._cold_np[kr] = host
                if "b_up" in lay:
                    self._cold_np["b_up"] = np.asarray(lay["b_up"])
            else:
                # row layout on device; drop_dense frees the dense copy
                # (donate=True reuses each dense buffer in place so the
                # conversion itself has no transient 2x peak)
                self.model.params = prepare_sparse_params(
                    self.model.params, self.cfg, sparse,
                    drop_dense=self.tiered, donate=self.tiered)
            self.fwd = make_forward(self.cfg, ffn_fn=make_sparse_ffn(self.cfg, sparse, mode="dense"))
            if self.tiered:
                from ..sparse.balancer import Balancer
                from ..sparse.tiering import (
                    ColdStore,
                    init_tiered,
                    make_tiered_ffn,
                    tiered_layer_params,
                )

                if (sparse_cold_mode == "fetch"
                        and sparse.capacity(self.cfg.n_ff)
                        > sparse.hot_groups):
                    import sys

                    print(
                        f"warning: capacity_groups "
                        f"({sparse.capacity(self.cfg.n_ff)}) > hot_groups "
                        f"({sparse.hot_groups}) in fetch mode — the excess "
                        f"selected groups can never all be resident, so "
                        f"misses cannot converge to zero and the balancer "
                        f"will churn; prefer capacity <= hot_groups",
                        file=sys.stderr)
                layers = self.model.params["layers"]
                if prefill_mode == "tiered":
                    cold_np = self._cold_np
                    src_layers = cold_np
                elif prefill_mode == "rows":
                    cold_np = {k: np.asarray(v) for k, v in layers.items()
                               if k.endswith("_rows") or k == "b_up"}
                    src_layers = layers
                else:
                    raise ValueError(f"unknown prefill_mode {prefill_mode!r}")
                self.prefill_mode = prefill_mode
                self._full_layers = layers
                self._tp, self._fstate = init_tiered(
                    self.cfg, sparse, src_layers, sparse.hot_groups,
                    track_miss_groups=(sparse_cold_mode == "fetch"),
                )
                self._cold = ColdStore(self.cfg, sparse, cold_np)
                self.balancer = Balancer(cold=self._cold, scfg=sparse)
                # "host" = exact complement via pure_callback (CPU/dev);
                # "fetch"/"drop" = chip-deployable approximate tiers
                # (fetch demand-enters missed groups at each rebalance)
                tiered_ffn = make_tiered_ffn(self.cfg, sparse, self._cold,
                                             mode=sparse_cold_mode)
                self.fwd_decode = make_forward(self.cfg, ffn_fn=tiered_ffn,
                                               stateful_ffn=True)
                self._decode_params = dict(self.model.params)
                (self._decode_params["layers"],
                 self._decode_params["sparse_flat"]) = tiered_layer_params(
                    layers, self._tp)
            else:
                self.fwd_decode = make_forward(self.cfg, ffn_fn=make_sparse_ffn(self.cfg, sparse, mode="pallas"))
        else:
            self.fwd = make_forward(self.cfg, ffn_fn=ffn_fn)
            self.fwd_decode = self.fwd
        self.kv_dtype = kv_dtype
        self.kv_dtype_v = kv_dtype_v
        self.kv_quantized = kv_quantized

        self.cache = init_cache(self.cfg, n_slots, max_seq, kv_dtype,
                                kv_quantized, v_dtype=kv_dtype_v)
        self.slots = [SlotState() for _ in range(n_slots)]
        # pipelined readback state (see step() docstring)
        self._pipeline = os.environ.get("SPARK_SCHED_PIPELINE", "1") != "0"
        self._rb_pending = None
        self._tok_dev = None
        self._fresh_mask = np.zeros(n_slots, bool)
        self.sstate = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[init_state(self.sampler_cfg, i) for i in range(n_slots)],
        )
        self.dparams = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[dynamic_params(self.sampler_cfg) for _ in range(n_slots)],
        )
        self.pending: "queue.Queue[Request]" = queue.Queue()
        self._req_ids = itertools.count()
        self._lock = threading.Lock()
        self._running = False
        self._thread: threading.Thread | None = None

        self._jit_prefill = jax.jit(self._prefill_impl)
        self._jit_prefill_tiered = (jax.jit(self._prefill_tiered_impl)
                                    if self.tiered else None)
        self._jit_decode = jax.jit(self._decode_impl, donate_argnums=(3,))
        # Batched-serving crossover (bench.py batch, BENCH_NOTES serving
        # table): per-token sparse decode wins up to ~4 concurrent slots;
        # beyond that dense reads each weight ONCE for all tokens and wins
        # (the cross-token union of fired groups approaches the full set).
        # Non-tiered sparse serving auto-falls back to the masked-dense
        # step when more slots are active; tiered cannot (cold FFN rows
        # are not HBM-resident, dense compute is impossible by design).
        if sparse_batch_max is None:
            # chip-calibrated per-shape crossover (VERDICT r4 item 5;
            # batch_crossover.json) instead of one hardcoded 1B rule
            from ..sparse.config import sparse_batch_crossover

            sparse_batch_max = sparse_batch_crossover(self.cfg.n_ff)
        self.sparse_batch_max = max(int(sparse_batch_max), 0)
        self._jit_decode_dense = None
        if sparse is not None and not self.tiered:
            import functools

            self._jit_decode_dense = jax.jit(
                functools.partial(self._decode_impl, dense=True),
                donate_argnums=(3,))
        # per-slot allowed-token masks for grammar-constrained slots;
        # all-True rows for unconstrained/idle slots (on-device masking)
        self._gmask = np.ones((n_slots, self.cfg.n_vocab), bool)

        # metrics (analogue of server_metrics, server-context.cpp:444-545)
        self.metrics = {
            "n_requests": 0,
            "n_tokens_generated": 0,
            "n_prompt_tokens": 0,
            "n_decode_steps": 0,
            "t_decode_s": 0.0,
            "t_prefill_s": 0.0,
            "queue_peak": 0,
        }

    # --- jitted bodies ------------------------------------------------------
    def _prefill_impl(self, params, tokens, positions, cache1, last_idx, sstate1,
                      dp1):
        logits, cache1 = self.fwd(params, tokens, positions, cache1)
        last = logits[jnp.arange(tokens.shape[0]), last_idx]
        tok, sstate1 = jax.vmap(self.sample)(last, sstate1, dp1)
        return tok, cache1, sstate1, last

    def _prefill_tiered_impl(self, params, tokens, positions, cache1,
                             last_idx, sstate1, dp1, fstate):
        """prefill_mode="tiered": the prompt runs through the SAME
        stateful tiered forward as decode (hot store + drop/fetch tier) —
        prompt tokens warm the DFR and, in fetch mode, demand-enter their
        missed groups at the next rebalance."""
        logits, cache1, fstate = self.fwd_decode(params, tokens, positions,
                                                 cache1, fstate)
        last = logits[jnp.arange(tokens.shape[0]), last_idx]
        tok, sstate1 = jax.vmap(self.sample)(last, sstate1, dp1)
        return tok, cache1, sstate1, last, fstate

    def _decode_impl(self, params, tokens, positions, cache, sstate, active, dp,
                     fstate=None, lmask=None, dense=False):
        """tokens/positions (B,1); active (B,) masks sampler-state updates
        for idle slots (their dummy writes are position-overwritten later).
        lmask (B, V) bool: per-slot allowed-token mask (grammar-constrained
        decoding ON DEVICE — the host computes next step's mask from the
        accepted token while the device runs, so no full-vocab logits
        readback rides the decode loop; round-1 read V floats per
        constrained slot per step). dense=True uses the masked-dense
        forward (self.fwd) instead of the gathered sparse decode — the
        batched-serving fallback (see step())."""
        if self.tiered:
            logits, cache, fstate = self.fwd_decode(params, tokens, positions,
                                                    cache, fstate)
        elif dense:
            logits, cache = self.fwd(params, tokens, positions, cache)
        else:
            logits, cache = self.fwd_decode(params, tokens, positions, cache)
        last = logits[:, -1]
        if lmask is not None:
            last = jnp.where(lmask, last, -1e30)
        tok, new_sstate = jax.vmap(self.sample)(last, sstate, dp)
        # idle slots keep their old sampler state untouched
        keep = lambda new, old: jnp.where(
            active.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
        )
        sstate = jax.tree.map(keep, new_sstate, sstate)
        return tok, cache, sstate, last, fstate

    # --- public API ---------------------------------------------------------
    def submit(self, req: Request) -> Request:
        req.id = next(self._req_ids)
        req.n_prompt = len(req.prompt_tokens)
        if req.n_prompt == 0:
            raise ValueError("empty prompt")
        if req.n_prompt >= self.max_seq:
            raise ValueError(f"prompt of {req.n_prompt} tokens exceeds max_seq {self.max_seq}")
        self.pending.put(req)
        self.metrics["queue_peak"] = max(self.metrics["queue_peak"], self.pending.qsize())
        return req

    def _admit(self):
        """Move pending requests into free slots (prefill). A failing
        prefill fails only that request (ref: per-slot error propagation)."""
        while True:
            free = [i for i, s in enumerate(self.slots) if not s.running]
            if not free:
                return
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                return
            s_i = self._pick_slot(free, req)
            slot = self.slots[s_i]
            try:
                self._prefill_into_slot(s_i, req)
            except Exception:
                import traceback

                traceback.print_exc()
                self.metrics["n_errors"] = self.metrics.get("n_errors", 0) + 1
                req.out_queue.put(None)
                slot.req = None
                slot.cached_tokens = []

    def _pick_slot(self, free: list[int], req: Request) -> int:
        """-sps slot routing: among idle slots, prefer the one whose cached
        prompt shares the longest prefix with the request, when that prefix
        covers at least `slot_similarity` of the prompt (ref: server.cpp
        slot-prompt-similarity selection). 0 disables (first-free)."""
        if self.slot_similarity <= 0.0 or len(free) == 1:
            return free[0]
        best_i, best_len = free[0], -1
        for i in free:
            cached = self.slots[i].cached_tokens
            n = 0
            limit = min(len(cached), req.n_prompt)
            while n < limit and cached[n] == req.prompt_tokens[n]:
                n += 1
            if n > best_len:
                best_i, best_len = i, n
        if best_len / max(req.n_prompt, 1) >= self.slot_similarity:
            return best_i
        return free[0]

    def _prefill_into_slot(self, s_i: int, req: Request):
        t0 = time.perf_counter()
        slot = self.slots[s_i]
        # prompt-prefix reuse: skip prefill of tokens whose KV this slot
        # already holds (ref: server slot prompt caching / restore)
        cached = slot.cached_tokens
        n_reuse = 0
        if cached:
            limit = min(len(cached), req.n_prompt - 1)  # keep >=1 suffix token
            while n_reuse < limit and cached[n_reuse] == req.prompt_tokens[n_reuse]:
                n_reuse += 1
        suffix = req.prompt_tokens[n_reuse:]
        n = len(suffix)
        Tpad = bucket_len(n)
        toks = np.zeros((1, Tpad), np.int32)
        toks[0, :n] = suffix
        pos = (np.arange(Tpad, dtype=np.int32) + n_reuse)[None]
        if n_reuse > 0:
            cache1 = gather_slot(self.cache, s_i)
            self.metrics["n_prompt_cached"] = self.metrics.get("n_prompt_cached", 0) + n_reuse
        else:
            cache1 = init_cache(self.cfg, 1, self.max_seq, self.kv_dtype,
                                self.kv_quantized, v_dtype=self.kv_dtype_v)
        st1 = jax.tree.map(lambda a: a[s_i : s_i + 1], self.sstate)
        seed = req.seed if req.seed is not None else self.sampler_cfg.seed + req.id
        st1 = jax.tree.map(
            lambda a, b: b[None], st1, init_state(self.sampler_cfg, seed)
        )
        # per-request sampler knobs ride as data (one compiled step serves
        # mixed configs); fall back to the server defaults when unset
        dp1 = jax.tree.map(
            lambda a: a[None], dynamic_params(req.sampler or self.sampler_cfg)
        )
        if self.tiered and self.prefill_mode == "tiered":
            tok, cache1, st1, last_logits, self._fstate = (
                self._jit_prefill_tiered(
                    self._decode_params,
                    jnp.asarray(toks),
                    jnp.asarray(pos),
                    cache1,
                    jnp.asarray([n - 1], jnp.int32),
                    st1,
                    dp1,
                    self._fstate,
                ))
        else:
            tok, cache1, st1, last_logits = self._jit_prefill(
                self.model.params,
                jnp.asarray(toks),
                jnp.asarray(pos),
                cache1,
                jnp.asarray([n - 1], jnp.int32),
                st1,
                dp1,
            )
        # scatter into the shared slot cache / sampler state
        self.cache = scatter_slot(self.cache, cache1, s_i)
        self.sstate = jax.tree.map(
            lambda big, small: big.at[s_i].set(small[0]), self.sstate, st1
        )
        self.dparams = jax.tree.map(
            lambda big, small: big.at[s_i].set(small[0]), self.dparams, dp1
        )
        first = int(np.asarray(tok)[0])
        if req.grammar is not None and self.tokenizer is not None:
            from ..grammar.sampler import GrammarSampler

            req._gsampler = GrammarSampler(
                req.grammar, self.model.vocab, self.tokenizer
            )
            first = req._gsampler.constrain_and_pick(
                np.asarray(last_logits)[0], first
            )
            self._gmask[s_i] = req._gsampler.mask()
        slot.req = req
        slot.n_past = req.n_prompt
        slot.n_gen = 0
        slot.last_token = first
        self._fresh_mask[s_i] = True  # first decode tick takes `first` H2D
        slot.cached_tokens = list(req.prompt_tokens)
        req.first_token_s = time.time()
        self.metrics["n_requests"] += 1
        self.metrics["n_prompt_tokens"] += n
        self.metrics["t_prefill_s"] += time.perf_counter() - t0
        self._emit(s_i, first)

    def _emit(self, s_i: int, tok: int, npast_disp: int | None = None):
        """Emit one generated token to the request's stream.
        npast_disp: the slot's n_past at the tick's DISPATCH (pipelined
        readback processes after later dispatches bumped slot.n_past, so
        the max_seq boundary check must use the snapshot).

        Stop-string handling holds back any trailing tokens whose text
        could still extend into a stop string, so a multi-token stop is
        never partially streamed (the reference buffers a partial match;
        round-1 leaked the pieces). Granularity is whole tokens: a token
        whose piece straddles the stop-string start is dropped with it.
        """
        slot = self.slots[s_i]
        req = slot.req
        slot.n_gen += 1
        self.metrics["n_tokens_generated"] += 1
        hit_stop_str = False
        held = getattr(req, "_held", None)
        if req.stop_strings and self.tokenizer is not None:
            if held is None:
                held = req._held = []
            piece = self.tokenizer.decode([tok])
            req._text = getattr(req, "_text", "") + piece
            hit_stop_str = any(req._text.endswith(ss) for ss in req.stop_strings)
            if not (tok in req.stop_ids or hit_stop_str):
                held.append((tok, len(piece)))
                # longest proper stop-string prefix that suffixes the text
                hold = 0
                for ss in req.stop_strings:
                    for k in range(min(len(ss) - 1, len(req._text)), hold, -1):
                        if req._text.endswith(ss[:k]):
                            hold = k
                            break
                # release from the front while the remaining held text
                # still covers the possibly-matching suffix
                pend = sum(n for _, n in held)
                while held and pend - held[0][1] >= hold:
                    t0, n0 = held.pop(0)
                    pend -= n0
                    req.out_queue.put(t0)
        elif tok not in req.stop_ids:
            req.out_queue.put(tok)
        npast_post = (npast_disp + 1 if npast_disp is not None
                      else slot.n_past)
        finished = (
            tok in req.stop_ids
            or hit_stop_str
            or slot.n_gen >= req.max_new_tokens
            or npast_post + 1 >= self.max_seq
        )
        if finished:
            if held:
                if hit_stop_str:
                    held.clear()  # tokens belonging to the matched stop
                else:
                    for t0, _ in held:  # partial match never completed
                        req.out_queue.put(t0)
                    held.clear()
            req.done_s = time.time()
            req.out_queue.put(None)
            if req._gsampler is not None:
                self._gmask[s_i] = True  # free the row for the next tenant
            slot.req = None
        else:
            slot.last_token = tok

    def step(self) -> bool:
        """One scheduler tick: admit + one batched decode over running slots.
        Returns True if any slot is running afterwards.

        PIPELINED READBACK (round 4): the only per-tick host<->device
        SYNC is the token readback — ~25 ms on a relay-attached chip vs a
        ~20 ms step (tick profile, BENCH_NOTES round 4). When no grammar-
        constrained slot is active, tick t's input tokens chain ON DEVICE
        from tick t-1's output and the host reads tokens ONE TICK LATE,
        overlapping the readback RTT with the next tick's compute.
        Emission/stop detection lag one tick; a slot that stopped gets
        one speculative extra tick whose results are discarded (its KV
        write lands at a position the next tenant overwrites before ever
        reading — decode writes position p before any read of p).
        SPARK_SCHED_PIPELINE=0 restores fully synchronous ticks."""
        # 0) a constrained slot joining forces the chain to flush first
        #    (grammar masks need the actual token before the next dispatch)
        constrained_any = any(s.running and s.req._gsampler is not None
                              for s in self.slots)
        if self._rb_pending is not None and (constrained_any
                                             or not self._pipeline):
            self._process_readback()
        self._admit()
        active = np.asarray([s.running for s in self.slots])
        if not active.any():
            # nothing to dispatch; flush any trailing readback (it can
            # only hold speculative tokens of freed slots, but processing
            # keeps the bookkeeping uniform)
            if self._rb_pending is not None:
                self._process_readback()
                return any(s.running for s in self.slots) \
                    or not self.pending.empty()
            return False
        t0 = time.perf_counter()
        constrained = [s_i for s_i, s in enumerate(self.slots)
                       if s.running and s.req._gsampler is not None]
        pipelined = (self._pipeline and not constrained)
        host_toks = np.asarray(
            [[s.last_token if s.running else 0] for s in self.slots], np.int32
        )
        chained = (pipelined and self._tok_dev is not None
                   and self._rb_pending is not None)
        fresh = self._fresh_mask.copy()
        if chained:
            # chain on device; slots (re)admitted since the last dispatch
            # take their host-known first token
            if fresh.any():
                toks_in = jnp.where(jnp.asarray(fresh[:, None]),
                                    jnp.asarray(host_toks),
                                    self._tok_dev.reshape(-1, 1))
            else:
                toks_in = self._tok_dev.reshape(-1, 1)
        else:
            toks_in = jnp.asarray(host_toks)
        self._fresh_mask[:] = False
        pos = np.asarray(
            [[s.n_past if s.running else 0] for s in self.slots], np.int32
        )
        decode_params = self._decode_params if self.tiered else self.model.params
        # grammar-constrained slots: per-slot masks were computed on host
        # from the PREVIOUS accepted token and ride H2D asynchronously —
        # sampling stays on device, no logits readback (ref grammar-first
        # chain; round-1 pulled V floats per constrained slot per step)
        lmask = jnp.asarray(self._gmask) if constrained else None
        jd = self._jit_decode
        if (self._jit_decode_dense is not None
                and int(active.sum()) > self.sparse_batch_max):
            jd = self._jit_decode_dense
        tok, self.cache, self.sstate, last_logits, self._fstate = jd(
            decode_params,
            toks_in,
            jnp.asarray(pos),
            self.cache,
            self.sstate,
            jnp.asarray(active),
            self.dparams,
            self._fstate,
            lmask,
        )
        self._tok_dev = tok
        # snapshot per-slot dispatch state: (req identity, input token if
        # host-known — None for device-chained slots, resolved at
        # processing time from the preceding tick's output — and n_past
        # at dispatch)
        snap = [(s_i, slot.req,
                 None if (chained and not fresh[s_i])
                 else int(host_toks[s_i, 0]),
                 slot.n_past)
                for s_i, slot in enumerate(self.slots) if slot.running]
        for s_i, slot in enumerate(self.slots):
            if slot.running:
                slot.n_past += 1  # the cache row for this tick is written
        self.metrics["n_decode_steps"] += 1
        prev = self._rb_pending
        self._rb_pending = (tok, snap, constrained, t0)
        if pipelined:
            if prev is not None:
                # materialize the PREVIOUS tick while this one computes —
                # the readback RTT hides behind device work
                self._process_pending(prev)
            self._run_rebalance()
            return (any(s.running for s in self.slots)
                    or not self.pending.empty())
        self._process_readback()
        self._run_rebalance()
        return any(s.running for s in self.slots) or not self.pending.empty()

    def _process_readback(self):
        pending = self._rb_pending
        self._rb_pending = None
        if pending is not None:
            self._process_pending(pending)

    def _process_pending(self, pending):
        """Materialize a dispatched tick's tokens on host: grammar accepts,
        emissions, stop detection, slot freeing."""
        tok_dev, snap, constrained, t0 = pending
        tok = np.array(tok_dev).reshape(-1)
        for s_i in constrained:
            slot = self.slots[s_i]
            if slot.req is None:
                continue
            gs = slot.req._gsampler
            gs.accept(int(tok[s_i]))  # always legal: sampled under the mask
            self._gmask[s_i] = gs.mask()
            if not self._gmask[s_i].any():
                # grammar dead end: fail just this request (per-slot
                # error isolation), free the mask row
                self._gmask[s_i] = True
                slot.req.out_queue.put(None)
                slot.req = None
                self.metrics["n_errors"] = self.metrics.get("n_errors", 0) + 1
        self.metrics["t_decode_s"] += time.perf_counter() - t0
        for s_i, req_ref, in_tok, npast_disp in snap:
            slot = self.slots[s_i]
            if slot.req is not req_ref or req_ref is None:
                continue  # freed/re-tenanted: a speculative tick, discard
            if in_tok is None:
                # device-chained dispatch: the input was the previous
                # tick's output, which THAT tick's processing (strictly
                # ordered before this one) stored in slot.last_token
                in_tok = slot.last_token
            slot.cached_tokens.append(in_tok)
            self._emit(s_i, int(tok[s_i]), npast_disp=npast_disp)

    def _run_rebalance(self):
        if not (self.tiered and self.metrics["n_decode_steps"]
                % self.rebalance_every == 0):
            return
        from ..sparse.tiering import tiered_layer_params

        mg = (np.asarray(self._fstate.miss_g)
              if self._fstate.miss_g is not None else None)
        self._tp = self.balancer.rebalance(
            self._tp, np.asarray(self._fstate.dfr), miss_g=mg)
        if mg is not None:  # fetch: counts are per-rebalance-window
            self._fstate = self._fstate._replace(
                miss_g=jnp.zeros_like(self._fstate.miss_g))
        (self._decode_params["layers"],
         self._decode_params["sparse_flat"]) = tiered_layer_params(
            self._full_layers, self._tp)

    # --- background loop ----------------------------------------------------
    def start(self):
        if self._running:
            return
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        import traceback

        while self._running:
            try:
                busy = self.step()
            except Exception:
                # a crashed inference loop must not strand clients: fail the
                # affected requests, log, and keep serving (ref: server slot
                # error propagation)
                traceback.print_exc()
                self.metrics["n_errors"] = self.metrics.get("n_errors", 0) + 1
                for slot in self.slots:
                    if slot.req is not None:
                        slot.req.out_queue.put(None)
                        slot.req = None
                    slot.cached_tokens = []
                busy = False
            if not busy:
                time.sleep(0.002)

    def stop(self):
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def run_until_idle(self):
        """Synchronous drain (for tests / batch tools)."""
        while self.step():
            pass

    def save_slot(self, s_i: int, path: str) -> int:
        """Persist a slot's KV + token history (ref: server
        /slots/:id?action=save)."""
        slot = self.slots[s_i]
        from .state_io import save_state

        return save_state(
            path, self.cfg, self.cache, slot.n_past, self.sstate,
            tokens=slot.cached_tokens, slot=s_i,
        )

    def restore_slot(self, s_i: int, path: str) -> dict:
        """Load a saved state into an idle slot; subsequent requests whose
        prompt shares the token prefix skip re-prefilling it."""
        slot = self.slots[s_i]
        if slot.running:
            raise ValueError(f"slot {s_i} is busy")
        from .state_io import load_state

        self.cache, n_past, tokens, self.sstate = load_state(
            path, self.cfg, self.cache, s_i, self.sstate
        )
        slot.n_past = n_past
        slot.cached_tokens = list(tokens)
        return {"n_past": n_past, "n_tokens": len(tokens)}

    def metrics_snapshot(self) -> dict:
        m = dict(self.metrics)
        m["slots_running"] = sum(s.running for s in self.slots)
        m["queue_depth"] = self.pending.qsize()
        if m["t_decode_s"] > 0:
            m["decode_tps"] = m["n_tokens_generated"] / m["t_decode_s"]
        if m["t_prefill_s"] > 0:
            m["prefill_tps"] = m["n_prompt_tokens"] / m["t_prefill_s"]
        return m


@jax.jit
def _scatter(big: jnp.ndarray, small: jnp.ndarray, s_i: int) -> jnp.ndarray:
    return big.at[:, s_i].set(small[:, 0])


@jax.jit
def _gather(big: jnp.ndarray, s_i: int) -> jnp.ndarray:
    return jax.lax.dynamic_slice_in_dim(big, s_i, 1, axis=1)


def gather_slot(cache: KVCache, s_i: int) -> KVCache:
    maybe = lambda b: None if b is None else _gather(b, s_i)
    return KVCache(
        k=_gather(cache.k, s_i),
        v=_gather(cache.v, s_i),
        k_scale=maybe(cache.k_scale),
        v_scale=maybe(cache.v_scale),
    )


def scatter_slot(cache: KVCache, cache1: KVCache, s_i: int) -> KVCache:
    maybe = lambda b, s: None if b is None else _scatter(b, s, s_i)
    return KVCache(
        k=_scatter(cache.k, cache1.k, s_i),
        v=_scatter(cache.v, cache1.v, s_i),
        k_scale=maybe(cache.k_scale, cache1.k_scale),
        v_scale=maybe(cache.v_scale, cache1.v_scale),
    )
