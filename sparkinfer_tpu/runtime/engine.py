"""Generation engine: jitted prefill + decode over a static-shape KV cache.

TPU re-design of llama_context::decode (src/llama-context.cpp:985) and the
llama-cli REPL loop (tools/main/main.cpp): instead of building a fresh ggml
graph per ubatch and scheduling it across backends, we jit ONE prefill step
(bucketed prompt lengths to bound recompiles — the analogue of n_ubatch
splitting, src/llama-batch.h:101-107) and ONE single-token decode step, and
carry the KV cache + sampler state through them as pytrees.

All sampling runs on-device inside the decode step; the host only sees the
sampled token ids (one small D2H transfer per step, overlapping the next
step's dispatch thanks to JAX async dispatch).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from typing import TYPE_CHECKING

from ..models.config import ModelConfig
from ..models.loader import LoadedModel

if TYPE_CHECKING:
    from ..sparse.config import SparseConfig
from ..models.transformer import make_forward
from .kv_cache import KVCache, init_cache
from .sampling import SamplerConfig, SamplerState, init_state, make_sampler

PREFILL_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048, 4096)


def bucket_len(n: int, buckets=PREFILL_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + buckets[-1] - 1) // buckets[-1]) * buckets[-1]


@dataclass
class PerfCounters:
    """Analogue of llama_perf_context (include/llama.h:1371-1391)."""

    t_prefill_s: float = 0.0
    n_prefill: int = 0
    t_decode_s: float = 0.0
    n_decode: int = 0

    @property
    def prefill_tps(self) -> float:
        return self.n_prefill / self.t_prefill_s if self.t_prefill_s > 0 else 0.0

    @property
    def decode_tps(self) -> float:
        return self.n_decode / self.t_decode_s if self.t_decode_s > 0 else 0.0

    def summary(self) -> dict:
        return {
            "prefill_tokens": self.n_prefill,
            "prefill_tps": round(self.prefill_tps, 2),
            "decode_tokens": self.n_decode,
            "decode_tps": round(self.decode_tps, 2),
        }


class Engine:
    """Single-sequence / static-batch generation engine.

    ffn_fn lets the sparse predictor-gated FFN path plug in (see
    sparse/ffn.py); extra_state threads any additional carried state
    (e.g. the sparse hot-set) through prefill/decode steps.
    """

    def __init__(
        self,
        model: LoadedModel,
        max_seq: int = 2048,
        batch: int = 1,
        sampler: SamplerConfig | None = None,
        kv_dtype=jnp.bfloat16,
        kv_dtype_v=None,  # -ctv: separate V storage dtype (None = kv_dtype)
        kv_quantized: bool = False,
        ffn_fn: Callable | None = None,
        sparse: "SparseConfig | None" = None,
        sparse_decode_mode: str = "pallas",
        sparse_pipelined: bool = True,
        sparse_cold_mode: str = "host",
        sparse_prefill: str = "dense",  # "dense" (masked) | "sparse"
        sparse_drop_dense: bool = False,  # keep only the row/flat layout
        sparse_preprepared: bool = False,  # params already in sparse layout
        split=None,  # ModelSplit | path — offline profile (reorder + pattern)
        rebalance_every: int = 1,
        donate_cache: bool = True,
        fused_chunk: int = 0,
        kv_iswa: bool = False,  # dual SWA/full cache (llama-kv-cache-iswa)
        self_extend: tuple[int, int] | None = None,  # (grp_attn_n, grp_attn_w)
        moe_mode: str = "dense",  # "pallas": fused row-streaming expert FFN
    ):
        self.kv_iswa = kv_iswa
        self.model = model
        self.cfg: ModelConfig = model.config
        self.max_seq = max_seq
        self.batch = batch
        self.sampler_cfg = sampler or SamplerConfig()
        self.sparse = sparse
        self.tiered = sparse is not None and sparse.hot_groups > 0
        self.rebalance_every = max(rebalance_every, 1)
        self._step_count = 0
        if sparse is not None:
            # predictor-gated FFN: masked-dense for prefill (cross-token
            # active-union is large), gathered top-k for decode (reads only
            # selected weight groups — the sparse speedup path)
            from ..sparse.ffn import make_sparse_ffn, prepare_sparse_params

            if not self.cfg.has_predictors:
                raise ValueError("sparse mode requires predictor tensors in the model")
            if split is not None:
                from ..sparse.split import ModelSplit, apply_reorder, read_split

                if not isinstance(split, ModelSplit):
                    split = read_split(split)
                self.model.params = apply_reorder(self.model.params, self.cfg, split.perms, inplace=True)
            if not sparse_preprepared:
                self.model.params = prepare_sparse_params(
                    self.model.params, self.cfg, sparse,
                    drop_dense=sparse_drop_dense)
            prefill_ffn = make_sparse_ffn(self.cfg, sparse, mode="dense")
            self.fwd = make_forward(self.cfg, ffn_fn=prefill_ffn)
            self.fwd_prefill = make_forward(self.cfg, ffn_fn=prefill_ffn, fresh_prefill=True)
            if self.tiered:
                # hot/cold neuron tiering: HBM hot cache + host cold store,
                # DFR stats carried through the step, balancer between steps
                from ..sparse.balancer import Balancer
                from ..sparse.tiering import (
                    ColdStore,
                    init_tiered,
                    make_tiered_ffn,
                    tiered_layer_params,
                )

                layers = self.model.params["layers"]
                self._full_layers = layers
                self._tp, self._fstate = init_tiered(
                    self.cfg, sparse, layers, sparse.hot_groups,
                    track_miss_groups=(sparse_cold_mode == "fetch"),
                )
                cold_np = {
                    k: np.asarray(v)
                    for k, v in layers.items()
                    if k.endswith("_rows") or k == "b_up"
                }
                self._cold = ColdStore(self.cfg, sparse, cold_np)
                self.balancer = Balancer(cold=self._cold, scfg=sparse)
                decode_ffn = make_tiered_ffn(self.cfg, sparse, self._cold, mode=sparse_cold_mode)
                self.fwd_decode = make_forward(self.cfg, ffn_fn=decode_ffn, stateful_ffn=True)
                # decode params: hot caches instead of full row layouts
                self._decode_params = dict(self.model.params)
                (self._decode_params["layers"],
                 self._decode_params["sparse_flat"]) = tiered_layer_params(
                    layers, self._tp)
            elif sparse_pipelined:
                # one-layer-ahead selection (ref predictor pipelining):
                # decouples the weight fetch from this layer's activations
                from ..sparse.ffn import make_pipelined_sparse_ffn, prepare_pipelined_params

                if not sparse_preprepared:
                    self.model.params = prepare_pipelined_params(
                        {k: v for k, v in self.model.params.items() if k != "layers"}
                        | {"layers": {k: v for k, v in self.model.params["layers"].items()
                                      if not k.endswith("_rows")}},
                        self.cfg, sparse, drop_dense=sparse_drop_dense,
                        layout="v6" if sparse_decode_mode == "pallas" else "v1")
                decode_ffn, carry_init = make_pipelined_sparse_ffn(
                    self.cfg, sparse, mode=sparse_decode_mode)
                self.fwd_decode = make_forward(self.cfg, ffn_fn=decode_ffn,
                                               ffn_carry_init=carry_init)
                if sparse_prefill == "sparse":
                    # prefill through the sparse step itself (the reference
                    # also runs the predictor-gated FFN over prompt tokens;
                    # masked-dense is this framework's default because the
                    # cross-token active-union is large — but the dense-
                    # from-flat einsum can materialize a full-store copy
                    # inside the prefill executable, fatal when HBM-tight)
                    self.fwd = make_forward(self.cfg, ffn_fn=decode_ffn,
                                            ffn_carry_init=carry_init)
                    self.fwd_prefill = make_forward(
                        self.cfg, ffn_fn=decode_ffn,
                        ffn_carry_init=carry_init, fresh_prefill=True)
            else:
                decode_ffn = make_sparse_ffn(self.cfg, sparse, mode=sparse_decode_mode)
                self.fwd_decode = make_forward(self.cfg, ffn_fn=decode_ffn)
        elif self.cfg.traits.altup:
            # gemma3n: AltUp stack forward (models/gemma3n.py); standard
            # KV cache, shared layers read earlier layers' slots
            from ..models.gemma3n import make_gemma3n_forward

            self.fwd = make_gemma3n_forward(self.cfg)
            self.fwd_prefill = self.fwd
            self.fwd_decode = self.fwd
        elif self.cfg.traits.recurrent:
            if self.cfg.traits.ssm_hybrid:
                from ..models.hybrid import make_hybrid_forward

                self.fwd = make_hybrid_forward(self.cfg)
            elif self.cfg.arch == "rwkv6qwen2":
                from ..models.rwkv6 import make_rwkv6qwen2_forward

                self.fwd = make_rwkv6qwen2_forward(self.cfg)
            elif self.cfg.traits.wkv_version == 6:
                from ..models.rwkv6 import make_rwkv6_forward

                self.fwd = make_rwkv6_forward(self.cfg)
            elif self.cfg.arch == "arwkv7":
                from ..models.rwkv7 import make_arwkv7_forward

                self.fwd = make_arwkv7_forward(self.cfg)
            elif self.cfg.traits.wkv_version == 7:
                from ..models.rwkv7 import make_rwkv7_forward

                self.fwd = make_rwkv7_forward(self.cfg)
            else:
                from ..models.mamba import make_mamba_forward

                self.fwd = make_mamba_forward(self.cfg)
            self.fwd_prefill = self.fwd
            self.fwd_decode = self.fwd
        else:
            if moe_mode == "pallas" and self.cfg.n_expert > 0 and ffn_fn is None:
                # fused row-streaming MoE: reshape stacked expert weights
                # into the kernel's row stores ONCE (replacing the dense
                # copies — same bytes, no 2x residency) and route every
                # forward through the Pallas gather kernel. Kills the
                # per-token HBM gather copies of jnp.take dense mode.
                from ..sparse.moe import moe_layout

                def to_rows(lay):
                    if "w_up_exps" not in lay:
                        return lay
                    lay = moe_layout(lay, self.cfg)
                    for k in ("w_up_exps", "w_gate_exps", "w_down_exps"):
                        lay.pop(k, None)
                    return lay

                model.params["layers"] = to_rows(model.params["layers"])
                segs = model.params.get("layer_segments")
                if segs is not None:  # deepseek2-style mixed stacks
                    model.params["layer_segments"] = [to_rows(s) for s in segs]
                    model.params["layers"] = model.params["layer_segments"][0]
            self.fwd = make_forward(self.cfg, ffn_fn=ffn_fn, moe_mode=moe_mode)
            self.fwd_prefill = make_forward(self.cfg, ffn_fn=ffn_fn,
                                            fresh_prefill=True, moe_mode=moe_mode)
            self.fwd_decode = self.fwd
        self.sample = make_sampler(self.sampler_cfg)
        self.kv_dtype = kv_dtype
        self.kv_dtype_v = kv_dtype_v
        self.kv_quantized = kv_quantized

        donate = (3,) if donate_cache else ()
        self._prefill = jax.jit(self._prefill_impl, donate_argnums=donate)
        self._prefill_cont = jax.jit(self._prefill_cont_impl, donate_argnums=donate)
        self._chunk_fwd = jax.jit(self._chunk_fwd_impl, donate_argnums=donate,
                                  static_argnums=(4,))
        self.prefill_chunk = 1024  # ubatch size for long prompts (ref n_ubatch)
        self._decode = jax.jit(self._decode_impl, donate_argnums=donate)
        # fused decode: N steps inside ONE executable (lax.scan over steps,
        # sampling on-device, sampled token fed back as the next input) —
        # OFF by default: probe #11 measured the scan-fused loop ~40%
        # SLOWER than per-step donated dispatch on the v5e for both dense
        # and sparse (BENCH_NOTES; the scan defeats KV-cache buffer
        # aliasing), and the per-step loop below pipelines its token
        # readback so dispatch cost stays hidden. Opt in (fused_chunk>1)
        # on dispatch-bound hosts. Disabled for the tiered path regardless
        # (host rebalance runs between steps).
        self.self_extend = None
        if self_extend is not None and self_extend[0] > 1:
            # Self-Extend group attention (ref tools/main/main.cpp:845-1010):
            # between-step host label tracking + on-device K re-rotation;
            # per-step like the tiered balancer, so fused decode is off
            from .self_extend import SelfExtendState

            if self.cfg.traits.recurrent or kv_iswa or kv_quantized:
                raise ValueError("self-extend needs a plain full-attention KV cache")
            self.self_extend = SelfExtendState(ga_n=self_extend[0],
                                               ga_w=self_extend[1])
        self.fused_chunk = (0 if self.tiered or self.self_extend is not None
                            else max(int(fused_chunk), 0))
        # tokens per batched D2H readback in the pipelined generator —
        # every read costs one transport round trip (axon relay: ~25 ms),
        # so reads are amortized over this many steps; tokens stream in
        # bursts of this size (set 1 on local-attached TPUs for per-token
        # streaming — their rtt is µs)
        import os as _os

        self.readback_batch = max(int(_os.environ.get(
            "SPARK_READBACK_BATCH",
            _os.environ.get("SPARK_READBACK_LAG", "16"))), 1)
        self._fused = jax.jit(self._fused_impl, donate_argnums=(3,),
                              static_argnums=(5,))
        self.perf = PerfCounters()

    # --- jitted step bodies -------------------------------------------------
    def _prefill_impl(self, params, tokens, positions, cache, last_idx, sstate):
        """tokens (B, Tpad); last_idx (B,) index of last real token.
        Always a from-scratch prompt -> chunk-local (flash) attention."""
        logits, cache = self.fwd_prefill(params, tokens, positions, cache)
        B = tokens.shape[0]
        last = logits[jnp.arange(B), last_idx]  # (B, V)
        toks, sstates = jax.vmap(self.sample)(last, sstate)
        return toks, cache, sstates

    def _prefill_cont_impl(self, params, tokens, positions, cache, last_idx, sstate):
        """Continuation chunk of a long prompt: must READ the cache (earlier
        chunks), so it uses the general forward, not the fresh-flash one."""
        logits, cache = self.fwd(params, tokens, positions, cache)
        B = tokens.shape[0]
        last = logits[jnp.arange(B), last_idx]
        toks, sstates = jax.vmap(self.sample)(last, sstate)
        return toks, cache, sstates

    def _chunk_fwd_impl(self, params, tokens, positions, cache, fresh):
        """Middle chunk: forward only (no sampling). `fresh` is static via
        two jit caches keyed by the python bool."""
        fwd = self.fwd_prefill if fresh else self.fwd
        _, cache = fwd(params, tokens, positions, cache)
        return cache

    def _decode_impl(self, params, tokens, positions, cache, sstate, fstate=None):
        """tokens (B, 1); positions (B, 1)."""
        if self.tiered:
            logits, cache, fstate = self.fwd_decode(params, tokens, positions, cache, fstate)
        else:
            logits, cache = self.fwd_decode(params, tokens, positions, cache)
        toks, sstates = jax.vmap(self.sample)(logits[:, -1], sstate)
        return toks, cache, sstates, fstate

    def _fused_impl(self, params, tok0, pos0, cache, sstate, n_steps):
        """tok0/pos0 (B, 1); runs n_steps decode steps on-device and
        returns all sampled tokens (n_steps, B)."""

        def body(carry, _):
            tok, pos, cache, sstate = carry
            logits, cache = self.fwd_decode(params, tok, pos, cache)
            nxt, sstate = jax.vmap(self.sample)(logits[:, -1], sstate)
            nxt = nxt[:, None]
            return (nxt, pos + 1, cache, sstate), nxt[:, 0]

        (tok, pos, cache, sstate), toks = jax.lax.scan(
            body, (tok0, pos0, cache, sstate), None, length=n_steps
        )
        return toks, cache, sstate

    def decode_chunk(
        self, token: int, n_past: int, cache: KVCache, sstate: SamplerState,
        n_steps: int,
    ) -> tuple[np.ndarray, KVCache, SamplerState]:
        """Fused multi-step decode: returns the n_steps tokens sampled AFTER
        feeding `token` (the caller has already emitted `token`)."""
        t0 = time.perf_counter()
        tok0 = jnp.full((self.batch, 1), token, jnp.int32)
        pos0 = jnp.full((self.batch, 1), n_past, jnp.int32)
        toks, cache, sstate = self._fused(
            self.model.params, tok0, pos0, cache, sstate, n_steps
        )
        toks = np.asarray(toks)[:, 0]
        self.perf.t_decode_s += time.perf_counter() - t0
        self.perf.n_decode += n_steps
        return toks, cache, sstate

    # --- host-side API ------------------------------------------------------
    def new_cache(self):
        if self.cfg.traits.recurrent:
            if self.cfg.traits.ssm_hybrid:
                from ..models.hybrid import init_hybrid_cache

                return init_hybrid_cache(self.cfg, self.batch, self.max_seq,
                                         self.kv_dtype)
            if self.cfg.traits.wkv_version in (6, 7):
                from ..models.rwkv6 import init_rwkv6_cache

                # rwkv7 state geometry is identical (2-way shift + (H,N,N))
                return init_rwkv6_cache(self.cfg, self.batch)
            from ..models.mamba import init_mamba_cache

            return init_mamba_cache(self.cfg, self.batch)
        if self.kv_iswa:
            from .kv_cache import init_cache_iswa

            # ring must absorb the largest single forward chunk
            return init_cache_iswa(self.cfg, self.batch, self.max_seq,
                                   chunk=self.prefill_chunk,
                                   dtype=self.kv_dtype,
                                   v_dtype=self.kv_dtype_v)
        return init_cache(
            self.cfg, self.batch, self.max_seq, self.kv_dtype,
            self.kv_quantized, v_dtype=self.kv_dtype_v
        )

    def new_sampler_state(self, seed: int | None = None) -> SamplerState:
        states = [
            init_state(self.sampler_cfg, (seed if seed is not None else self.sampler_cfg.seed) + i)
            for i in range(self.batch)
        ]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    def prefill(
        self, prompt_tokens: list[int], cache: KVCache, sstate: SamplerState
    ) -> tuple[int, KVCache, SamplerState, int]:
        """Returns (first sampled token, cache, sampler state, n_past)."""
        n = len(prompt_tokens)
        if n == 0:
            raise ValueError("empty prompt")
        if n > self.max_seq:
            raise ValueError(f"prompt of {n} tokens exceeds max_seq {self.max_seq}")
        if n > self.prefill_chunk and not self.cfg.traits.recurrent:
            return self._prefill_chunked(prompt_tokens, cache, sstate)
        t0 = time.perf_counter()
        Tpad = bucket_len(n)
        # recurrent models treat negative ids as state-passthrough padding
        fill = -1 if self.cfg.traits.recurrent else 0
        toks = np.full((self.batch, Tpad), fill, np.int32)
        toks[:, :n] = prompt_tokens
        pos = np.zeros((self.batch, Tpad), np.int32)
        # padding positions point past the real tokens but are masked out of
        # attention reads by the causal mask; their KV writes land at clamped
        # slots which later real writes overwrite.
        pos[:, :] = np.arange(Tpad)
        last_idx = np.full((self.batch,), n - 1, np.int32)
        tok, cache, sstate = self._prefill(
            self.model.params,
            jnp.asarray(toks),
            jnp.asarray(pos),
            cache,
            jnp.asarray(last_idx),
            sstate,
        )
        tok = int(np.asarray(tok)[0])
        self.perf.t_prefill_s += time.perf_counter() - t0
        self.perf.n_prefill += n
        return tok, cache, sstate, n

    def _prefill_chunked(self, prompt_tokens, cache, sstate):
        """ubatch-style chunked prefill (ref: n_ubatch splitting) for long
        prompts: fixed-size chunks bound compile count and VMEM."""
        t0 = time.perf_counter()
        n = len(prompt_tokens)
        CH = self.prefill_chunk
        off = 0
        while n - off > CH:
            toks = np.asarray(prompt_tokens[off : off + CH], np.int32)[None]
            pos = (np.arange(CH, dtype=np.int32) + off)[None]
            cache = self._chunk_fwd(
                self.model.params, jnp.asarray(toks), jnp.asarray(pos), cache,
                off == 0,
            )
            off += CH
            if self.self_extend is not None:
                # group as ingestion proceeds (the reference fires the
                # self-extend ops inside its prompt loop, main.cpp:990)
                from ..models.transformer import rope_params
                from .self_extend import self_extend_step

                cache = self_extend_step(cache, rope_params(self.cfg),
                                         self.self_extend, off)
        # final chunk: cache-reading prefill + sampling
        rem = n - off
        Tpad = bucket_len(rem)
        fill = -1 if self.cfg.traits.recurrent else 0
        toks = np.full((self.batch, Tpad), fill, np.int32)
        toks[:, :rem] = prompt_tokens[off:]
        pos = (np.arange(Tpad, dtype=np.int32) + off)[None]
        pos = np.broadcast_to(pos, (self.batch, Tpad))
        tok, cache, sstate = self._prefill_cont(
            self.model.params,
            jnp.asarray(toks),
            jnp.asarray(np.ascontiguousarray(pos)),
            cache,
            jnp.asarray([rem - 1] * self.batch, jnp.int32),
            sstate,
        )
        tok = int(np.asarray(tok)[0])
        self.perf.t_prefill_s += time.perf_counter() - t0
        self.perf.n_prefill += n
        return tok, cache, sstate, n

    def decode_step(
        self, token: int | np.ndarray, n_past: int, cache: KVCache, sstate: SamplerState
    ) -> tuple[int, KVCache, SamplerState]:
        t0 = time.perf_counter()
        toks = jnp.full((self.batch, 1), token, jnp.int32)
        pos = jnp.full((self.batch, 1), n_past, jnp.int32)
        if self.tiered:
            params = self._decode_params
            tok, cache, sstate, self._fstate = self._decode(
                params, toks, pos, cache, sstate, self._fstate
            )
        else:
            tok, cache, sstate, _ = self._decode(
                self.model.params, toks, pos, cache, sstate
            )
        tok = int(np.asarray(tok)[0])
        step_s = time.perf_counter() - t0
        self.perf.t_decode_s += step_s
        self.perf.n_decode += 1
        self._step_count += 1
        if self.tiered and self._step_count % self.rebalance_every == 0:
            # between-step online balancing (async H2D of swapped groups
            # overlaps the next step via JAX dispatch)
            from ..sparse.tiering import tiered_layer_params

            # window adaptation happens inside rebalance() from the
            # previous swap's completion probe (is_ready), not wall-clock
            mg = (np.asarray(self._fstate.miss_g)
                  if self._fstate.miss_g is not None else None)
            self._tp = self.balancer.rebalance(
                self._tp, np.asarray(self._fstate.dfr), miss_g=mg)
            if mg is not None:  # fetch tier: counts consumed
                self._fstate = self._fstate._replace(
                    miss_g=jnp.zeros_like(self._fstate.miss_g))
            (self._decode_params["layers"],
             self._decode_params["sparse_flat"]) = tiered_layer_params(
                self._full_layers, self._tp)
        return tok, cache, sstate

    def generate(
        self,
        prompt_tokens: list[int],
        max_new_tokens: int = 128,
        stop_ids: set[int] | None = None,
        seed: int | None = None,
        stream: bool = False,
        n_keep: int = -1,
    ) -> list[int] | Iterator[int]:
        """Greedy/sampled generation; returns generated token ids.
        n_keep: prompt tokens preserved across a context shift
        (-1 = whole prompt; ref main.cpp --keep)."""
        it = self._generate_iter(prompt_tokens, max_new_tokens,
                                 stop_ids or set(), seed, n_keep)
        return it if stream else list(it)

    def _generate_iter(self, prompt_tokens, max_new_tokens, stop_ids, seed,
                       n_keep=-1):
        cache = self.new_cache()
        sstate = self.new_sampler_state(seed)
        tok, cache, sstate, n_past = self.prefill(prompt_tokens, cache, sstate)
        if n_keep < 0 or n_keep > len(prompt_tokens):
            n_keep = len(prompt_tokens)
        if self.fused_chunk > 1:
            yield from self._generate_fused(tok, n_past, cache, sstate,
                                            max_new_tokens, stop_ids, n_keep)
            return
        se = self.self_extend
        if se is None and not self.tiered:
            yield from self._generate_pipelined(tok, n_past, cache, sstate,
                                                max_new_tokens, stop_ids,
                                                n_keep)
            return
        if se is not None:
            from ..models.transformer import rope_params
            from .self_extend import self_extend_step

            se_rp = rope_params(self.cfg)
            cache = self_extend_step(cache, se_rp, se, n_past)
        for _ in range(max_new_tokens):
            if tok in stop_ids:
                break
            yield tok
            if se is not None:
                if n_past >= self.max_seq - 1:
                    # physical slots exhausted (self-extend compresses rope
                    # labels, not storage — same as the reference's cells)
                    break
                cache = self_extend_step(cache, se_rp, se, n_past)
            elif n_past >= self.max_seq - 1 and not self.cfg.traits.recurrent:
                # context shift (ref: llama-cli context shift): keep the
                # prompt, drop half of the generated region, slide + re-rope
                from ..models.transformer import rope_params
                from .kv_cache import shift_cache

                discard = max((self.max_seq - n_keep) // 2, 1)
                cache = shift_cache(cache, rope_params(self.cfg), n_keep,
                                    discard, n_past)
                n_past -= discard
            tok, cache, sstate = self.decode_step(tok, n_past, cache, sstate)
            n_past += 1

    def _generate_pipelined(self, tok, n_past, cache, sstate, max_new_tokens,
                            stop_ids, n_keep):
        """Unfused decode with BATCHED token readback: the sampled token
        stays on device and feeds the next step directly; the host stacks
        `readback_batch` steps' tokens into ONE device array and reads
        them back in a single D2H round trip. A per-step read costs one
        full transport round trip REGARDLESS of how long ago the value
        was computed (this relay: ~25 ms rtt — a lag-window deep pipeline
        still paid it every step and ran at 0.08x), so the only fix is to
        amortize: one round trip per `readback_batch` tokens, the same
        structure the chunked bench loop uses. Emits the SAME token
        stream as the naive loop; up to `readback_batch` steps may be
        dispatched past a stop token (their KV writes are beyond the
        emitted sequence and the cache is generation-local — same trade
        as fused chunks). Tokens stream in bursts of `readback_batch`;
        on local-attached TPUs (µs rtt) set SPARK_READBACK_BATCH=1 for
        per-token streaming at no cost."""
        if tok in stop_ids or max_new_tokens <= 0:
            return
        yield tok
        emitted = 1
        t0 = time.perf_counter()
        steps = 0
        tok_dev = jnp.full((self.batch, 1), tok, jnp.int32)
        pend = []  # device tokens awaiting the next batched readback
        recurrent = self.cfg.traits.recurrent
        stopped = False
        while steps < max_new_tokens - 1 and not stopped:
            if not recurrent and n_past >= self.max_seq - 1:
                # context shift at the same step the naive loop would
                from ..models.transformer import rope_params
                from .kv_cache import shift_cache

                discard = max((self.max_seq - n_keep) // 2, 1)
                cache = shift_cache(cache, rope_params(self.cfg), n_keep,
                                    discard, n_past)
                n_past -= discard
            toks_d, cache, sstate, _ = self._decode(
                self.model.params, tok_dev,
                jnp.full((self.batch, 1), n_past, jnp.int32), cache, sstate)
            n_past += 1
            steps += 1
            tok_dev = toks_d[:, None]
            pend.append(toks_d)
            flush = (len(pend) >= self.readback_batch
                     or steps >= max_new_tokens - 1)
            if not flush:
                continue
            # one round trip for the whole batch (stack is a device op)
            vals = np.asarray(jnp.stack(pend)) if len(pend) > 1 \
                else np.asarray(pend[0])[None]
            pend = []
            for t in vals[:, 0].tolist():
                t = int(t)
                if t in stop_ids or emitted >= max_new_tokens:
                    stopped = True
                    break
                yield t
                emitted += 1
        self.perf.t_decode_s += time.perf_counter() - t0
        self.perf.n_decode += steps

    def _generate_fused(self, tok, n_past, cache, sstate, max_new_tokens,
                        stop_ids, n_keep):
        """Chunked fused decode: emits the same token stream as the
        per-step loop (same on-device sampler chain), but runs
        `fused_chunk` steps per dispatch. Tokens generated past a stop id
        inside a chunk are discarded (their KV writes are beyond the end
        of the returned sequence and this cache is generation-local)."""
        emitted = 0
        while True:
            if tok in stop_ids or emitted >= max_new_tokens:
                return
            yield tok
            emitted += 1
            if emitted >= max_new_tokens:
                return
            if not self.cfg.traits.recurrent:
                room = (self.max_seq - 1) - n_past
                if room <= 0:
                    # context shift at EXACTLY the step the per-step loop
                    # would shift (keeps fused == per-step token streams)
                    from ..models.transformer import rope_params
                    from .kv_cache import shift_cache

                    discard = max((self.max_seq - n_keep) // 2, 1)
                    cache = shift_cache(cache, rope_params(self.cfg), n_keep,
                                        discard, n_past)
                    n_past -= discard
                    room = (self.max_seq - 1) - n_past
                if room < self.fused_chunk:
                    # single-step up to the shift boundary
                    tok, cache, sstate = self.decode_step(tok, n_past, cache,
                                                          sstate)
                    n_past += 1
                    continue
            # always a FULL chunk (one compiled shape); surplus tokens past
            # max_new_tokens are discarded by the emit bound below
            n = self.fused_chunk
            toks, cache, sstate = self.decode_chunk(tok, n_past, cache,
                                                    sstate, n)
            n_past += n
            for t in toks[:-1]:
                t = int(t)
                if t in stop_ids or emitted >= max_new_tokens:
                    return
                yield t
                emitted += 1
            tok = int(toks[-1])

    def save_session(self, path: str, cache: KVCache, n_past: int,
                     sstate: SamplerState | None = None,
                     tokens: list[int] | None = None) -> int:
        """Save slot 0's state (ref: llama_state_save_file + llama-cli
        --prompt-cache)."""
        from .state_io import save_state

        return save_state(path, self.cfg, cache, n_past, sstate, tokens)

    def load_session(self, path: str):
        """Returns (cache, n_past, tokens, sstate) restored into fresh
        buffers (ref: llama_state_load_file)."""
        from .state_io import load_state

        cache = self.new_cache()
        sstate = self.new_sampler_state()
        return load_state(path, self.cfg, cache, 0, sstate)

    def generate_text(self, prompt: str, max_new_tokens: int = 128, seed: int | None = None) -> str:
        vocab = self.model.vocab
        if vocab is None:
            raise ValueError("model has no tokenizer vocab")
        from ..tokenizer import build_tokenizer

        tk = build_tokenizer(vocab)
        ids = tk.encode(prompt, add_special=True)
        stop = {vocab.eos_id} if vocab.eos_id is not None else set()
        out = self.generate(ids, max_new_tokens, stop_ids=stop, seed=seed)
        return tk.decode(out)
