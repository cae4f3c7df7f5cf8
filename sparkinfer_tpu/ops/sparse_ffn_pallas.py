"""Fused sparse-FFN Pallas kernel.

The TPU analogue of the reference's sparse GPU kernels — mm-sparse.cu
(gather-matmul over active neuron rows) and axpy-sparse.cu (scatter-add
down-projection) — fused into ONE kernel: for each (token, selected-group)
grid step, Pallas's scalar-prefetch pipeline DMAs exactly the selected
(G, E) weight blocks of up/gate/down from HBM into VMEM (double-buffered
against compute), computes act(x·Wg, x·Wu) masked by the per-neuron
threshold, and accumulates hidden·Wd into the output block.

HBM traffic is therefore 3·C·G·E·2 bytes per token instead of 3·F·E·2 —
the bandwidth saving IS the speedup, exactly as in the reference where
skipped rows are never read. Unlike the reference's atomicAdd scatter
(axpy-sparse.cu:10-12, nondeterministic), the sequential grid accumulation
here is deterministic (SURVEY.md §7 hard part (e)).

The weight store indexed by `idx` can be the full (n_g, G, E) neuron-major
layout (sparse/ffn.sparse_layout) or a tiered HBM hot-cache (H, G, E)
holding only hot groups (sparse/tiering.py) — the kernel only sees row
indices; probs/bias are pre-gathered on the jnp side so they stay keyed by
ORIGINAL group id regardless of the store layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _combine(act: str, fatrelu_threshold: float, gate, up):
    if act == "fatrelu":
        return jnp.where(gate > fatrelu_threshold, gate, 0.0) * up
    if act == "drelu":
        return jnp.maximum(gate, 0.0) * jnp.maximum(up, 0.0)
    if act == "relu":
        return jnp.maximum(up, 0.0)
    if act == "silu":
        return gate * jax.nn.sigmoid(gate) * up
    if act == "gelu":
        return jax.nn.gelu(gate, approximate=True) * up
    if act == "swiglu_oai":
        # gpt-oss clamped swiglu (ggml_swiglu_oai): gate clamped above at
        # limit, up clamped both ways, sigmoid slope 1.702, (up + 1) shift
        gf = jnp.minimum(gate, 7.0)
        uf = jnp.clip(up, -7.0, 7.0)
        return gf * jax.nn.sigmoid(1.702 * gf) * (uf + 1.0)
    raise ValueError(act)


def _kernel(act, fatrelu_threshold, prob_threshold, gated, mask_mode, U, refs):
    # every per-token operand rides as a 3D (rows, 1/U, lanes) array with a
    # dynamically indexed UNTILED leading dim — the same pattern as the
    # weight store (per-token rows are far below the (8, 128) tile minimum,
    # so token-axis tiling is impossible; leading-dim indexing keeps Mosaic
    # happy for packed dtypes too). U groups are processed per grid step
    # (U separate weight streams) to amortize per-step pipeline overhead.
    idx_ref = refs[0]
    x_ref = refs[1]
    gp_ref = refs[2]
    bu_ref = refs[3]
    bg_ref = refs[4]
    w_refs = refs[5:-1]
    out_ref = refs[-1]
    n_proj = 3 if gated else 2
    wu_refs = w_refs[0:U]
    wg_refs = w_refs[U : 2 * U] if gated else [None] * U
    wd_refs = w_refs[(n_proj - 1) * U : n_proj * U]

    c = pl.program_id(1)
    x = x_ref[0]  # (1, E)
    acc = None
    for u in range(U):
        up = jax.lax.dot_general(
            x, wu_refs[u][0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, G)
        up = up + bu_ref[0, pl.ds(u, 1), :][0]
        if gated:
            gate = jax.lax.dot_general(
                x, wg_refs[u][0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            gate = gate + bg_ref[0, pl.ds(u, 1), :][0]
        else:
            gate = None
        hidden = _combine(act, fatrelu_threshold, gate, up)
        gp = gp_ref[0, pl.ds(u, 1), :][0]  # (1, G)
        if mask_mode == "threshold":
            mask = (gp >= prob_threshold).astype(jnp.float32)
        else:  # "scale": router weights (MoE)
            mask = gp
        hidden = hidden * mask
        partial = jax.lax.dot_general(
            hidden.astype(wd_refs[u].dtype), wd_refs[u][0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, E)
        acc = partial if acc is None else acc + partial

    @pl.when(c == 0)
    def _():
        out_ref[0] = acc

    @pl.when(c > 0)
    def _():
        out_ref[0] = out_ref[0] + acc


@functools.partial(
    jax.jit,
    static_argnames=("act", "fatrelu_threshold", "prob_threshold", "interpret",
                     "mask_mode", "unroll"),
)
def sparse_ffn_block(
    x: jnp.ndarray,  # (N, E) tokens
    idx: jnp.ndarray,  # (N, C) int32 row index into the weight stores
    gp_sel: jnp.ndarray,  # (N, C, G) f32 activation probs of the selections
    w_up_rows: jnp.ndarray,  # (R, G, E) weight store (R = n_g or hot size)
    w_gate_rows: jnp.ndarray | None,
    w_down_rows: jnp.ndarray,  # (R, G, E)
    *,
    act: str,
    fatrelu_threshold: float = 0.0,
    prob_threshold: float = 0.5,
    bu_sel: jnp.ndarray | None = None,  # (N, C, G) pre-gathered up-bias
    bg_sel: jnp.ndarray | None = None,  # (N, C, G) pre-gathered gate-bias
    interpret: bool | None = None,
    mask_mode: str = "threshold",  # "threshold" | "scale"
    unroll: int | None = None,  # grid-step unroll override (1 = deepest grid)
) -> jnp.ndarray:  # (N, E) f32
    N, E = x.shape
    C = idx.shape[1]
    R, G, _ = w_up_rows.shape
    if interpret is None:
        interpret = not _on_tpu()

    bu = jnp.zeros_like(gp_sel) if bu_sel is None else bu_sel.astype(jnp.float32)
    bg = jnp.zeros_like(gp_sel) if bg_sel is None else bg_sel.astype(jnp.float32)
    gated = w_gate_rows is not None and act in ("fatrelu", "drelu", "silu",
                                                "gelu", "swiglu_oai")

    # unroll factor: U groups per grid step (U weight streams per projection)
    # amortizes per-step pipeline overhead, but each stream double-buffers a
    # (G, E) block in VMEM — cap U so the streams fit (~10 MB of the ~16 MB)
    n_proj = 3 if gated else 2
    if unroll is not None:
        U = unroll
        assert C % U == 0, (C, U)
    else:
        bytes_per_u = n_proj * G * E * w_up_rows.dtype.itemsize * 2
        u_max = max(1, min(4, (13 * 1024 * 1024) // bytes_per_u))
        U = 1
        for cand in (4, 2):
            if cand <= u_max and C % cand == 0:
                U = cand
                break
    Cs = C // U  # grid steps along the selection axis

    def w_spec_u(u):
        return pl.BlockSpec(
            (1, G, E), lambda n, c, idx_ref, u=u: (idx_ref[n, c * U + u], 0, 0),
            memory_space=pltpu.VMEM,
        )

    x3 = x.reshape(N, 1, E)
    gp3 = gp_sel.reshape(N * Cs, U, G)
    bu3 = bu.reshape(N * Cs, U, G)
    bg3 = bg.reshape(N * Cs, U, G)
    x_spec = pl.BlockSpec((1, 1, E), lambda n, c, idx_ref: (n, 0, 0),
                          memory_space=pltpu.VMEM)
    sel_spec = pl.BlockSpec((1, U, G), lambda n, c, idx_ref: (n * Cs + c, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [x_spec, sel_spec, sel_spec, sel_spec]
    inputs = [x3, gp3, bu3, bg3]
    in_specs += [w_spec_u(u) for u in range(U)]
    inputs += [w_up_rows] * U
    if gated:
        in_specs += [w_spec_u(u) for u in range(U)]
        inputs += [w_gate_rows] * U
    in_specs += [w_spec_u(u) for u in range(U)]
    inputs += [w_down_rows] * U

    kern = functools.partial(
        lambda *refs: _kernel(act, fatrelu_threshold, prob_threshold, gated,
                              mask_mode, U, refs)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N, Cs),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, E), lambda n, c, idx_ref: (n, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    n_mm = 3 if gated else 2
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, 1, E), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * C * G * E * n_mm,
            bytes_accessed=n_mm * N * C * G * E * 2 + N * E * 4,
            transcendentals=0,
        ),
    )(idx, *inputs)
    return out.reshape(N, E)


# ---------------------------------------------------------------------------
# v3: manual-DMA windowed streaming kernel
#
# The auto-pipelined v1 grid issues block fetches through Pallas's implicit
# double-buffering: at decode capacities that is a 2-4 step grid whose
# prologue bubble dominates (measured ~27% streaming efficiency, round 1).
# Here the kernel owns the DMA queue: all three projections' selected
# (G, E) blocks are fetched with an explicit W-deep rotating window of
# async copies (3*W transfers in flight at all times), and the tiny
# matvec compute rides in the shadow of the stream. One grid step per
# token; C is static so the loop fully unrolls.


def _kernel_v3(act, fatrelu_threshold, prob_threshold, gated, mask_mode, C, W,
               refs):
    idx_ref = refs[0]  # (N, C) SMEM scalar-prefetch
    x_ref, gp_ref, bu_ref = refs[1:4]
    if gated:
        up_hbm, gate_hbm, down_hbm = refs[4:7]
        out_ref = refs[7]
        su, sg, sd = refs[8:11]
        sem_u, sem_g, sem_d = refs[11:14]
    else:
        up_hbm, down_hbm = refs[4:6]
        gate_hbm, sg, sem_g = None, None, None
        out_ref = refs[6]
        su, sd = refs[7:9]
        sem_u, sem_d = refs[9:11]

    n = pl.program_id(0)
    x = x_ref[0]  # (1, E)

    def start(c, slot):
        i = idx_ref[n, c]
        pltpu.make_async_copy(up_hbm.at[i], su.at[slot], sem_u.at[slot]).start()
        if gated:
            pltpu.make_async_copy(gate_hbm.at[i], sg.at[slot],
                                  sem_g.at[slot]).start()
        pltpu.make_async_copy(down_hbm.at[i], sd.at[slot], sem_d.at[slot]).start()

    for c in range(min(W, C)):
        start(c, c)

    acc = jnp.zeros((1, out_ref.shape[-1]), jnp.float32)
    for c in range(C):
        slot = c % W
        pltpu.make_async_copy(up_hbm.at[idx_ref[n, c]], su.at[slot],
                              sem_u.at[slot]).wait()
        if gated:
            pltpu.make_async_copy(gate_hbm.at[idx_ref[n, c]], sg.at[slot],
                                  sem_g.at[slot]).wait()
        pltpu.make_async_copy(down_hbm.at[idx_ref[n, c]], sd.at[slot],
                              sem_d.at[slot]).wait()
        up = jax.lax.dot_general(
            x, su[slot], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, G)
        up = up + bu_ref[0, pl.ds(c, 1), :][0]
        gate = None
        if gated:
            gate = jax.lax.dot_general(
                x, sg[slot], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        hidden = _combine(act, fatrelu_threshold, gate, up)
        gp = gp_ref[0, pl.ds(c, 1), :][0]
        if mask_mode == "threshold":
            mask = (gp >= prob_threshold).astype(jnp.float32)
        else:
            mask = gp
        hidden = (hidden * mask).astype(sd.dtype)
        partial = jax.lax.dot_general(
            hidden, sd[slot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, E)
        # scratch slot is free once the dots above have read it; refill
        if c + W < C:
            start(c + W, slot)
        acc = acc + partial
    out_ref[0] = acc


@functools.partial(
    jax.jit,
    static_argnames=("act", "fatrelu_threshold", "prob_threshold", "interpret",
                     "mask_mode", "window"),
)
def sparse_ffn_block_v3(
    x: jnp.ndarray,  # (N, E)
    idx: jnp.ndarray,  # (N, C) int32 row index into the weight stores
    gp_sel: jnp.ndarray,  # (N, C, G)
    w_up_rows: jnp.ndarray,  # (R, G, E)
    w_gate_rows: jnp.ndarray | None,
    w_down_rows: jnp.ndarray,  # (R, G, E)
    *,
    act: str,
    fatrelu_threshold: float = 0.0,
    prob_threshold: float = 0.5,
    bu_sel: jnp.ndarray | None = None,
    interpret: bool | None = None,
    mask_mode: str = "threshold",
    window: int = 0,  # 0 = auto from VMEM budget
) -> jnp.ndarray:
    N, E = x.shape
    C = idx.shape[1]
    R, G, _ = w_up_rows.shape
    if interpret is None:
        interpret = not _on_tpu()
    bu = jnp.zeros_like(gp_sel) if bu_sel is None else bu_sel.astype(jnp.float32)
    gated = w_gate_rows is not None and act in ("fatrelu", "drelu", "silu", "gelu")
    n_proj = 3 if gated else 2
    blk_bytes = G * E * w_up_rows.dtype.itemsize
    W = window or max(2, min(C, (11 * 1024 * 1024) // (n_proj * blk_bytes)))

    x3 = x.reshape(N, 1, E)
    hbm_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    vec_spec = lambda shape: pl.BlockSpec(
        shape, lambda n, idx_ref: (n,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    in_specs = [vec_spec((1, 1, E)), vec_spec((1, C, G)), vec_spec((1, C, G)),
                hbm_spec]
    inputs = [x3, gp_sel, bu, w_up_rows]
    if gated:
        in_specs.append(hbm_spec)
        inputs.append(w_gate_rows)
    in_specs.append(hbm_spec)
    inputs.append(w_down_rows)

    wdt = w_up_rows.dtype
    scratch = [pltpu.VMEM((W, G, E), wdt)]
    if gated:
        scratch.append(pltpu.VMEM((W, G, E), wdt))
    scratch.append(pltpu.VMEM((W, G, E), wdt))
    scratch += [pltpu.SemaphoreType.DMA((W,))] * n_proj

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, E), lambda n, idx_ref: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    kern = functools.partial(
        lambda *refs: _kernel_v3(act, fatrelu_threshold, prob_threshold, gated,
                                 mask_mode, C, W, refs)
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, 1, E), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * C * G * E * n_proj,
            bytes_accessed=n_proj * N * C * G * E * wdt.itemsize + N * E * 4,
            transcendentals=0,
        ),
    )(idx, *inputs)
    return out.reshape(N, E)


# ---------------------------------------------------------------------------
# v4: interleaved-store manual-DMA streaming kernel (the production path)
#
# Probe data (eval_scripts/probes/p03_chained_variants.py, v5e): the selected-block
# stream is limited by per-DMA issue/latency overhead, not queue depth —
# 36 separate (G, E) fetches per layer run at ~141-184 GB/s while the
# dense path streams 371 GB/s. Interleaving the three projections into
# ONE (R, P, G, E) store makes each selected group a single contiguous
# P*G*E-byte DMA (3x fewer, 3x larger transfers), with a W-deep rotating
# window keeping several in flight.


def _kernel_v4(act, fatrelu_threshold, prob_threshold, gated, mask_mode, C, W,
               refs):
    idx_ref = refs[0]  # (N, C) SMEM scalar-prefetch
    x_ref, gp_ref, bu_ref, w_hbm, out_ref, sw, sem = refs[1:8]
    P = 3 if gated else 2

    n = pl.program_id(0)
    x = x_ref[0]  # (1, E)

    def start(c, slot):
        pltpu.make_async_copy(w_hbm.at[idx_ref[n, c]], sw.at[slot],
                              sem.at[slot]).start()

    for c in range(min(W, C)):
        start(c, c)

    acc = jnp.zeros((1, out_ref.shape[-1]), jnp.float32)
    for c in range(C):
        slot = c % W
        pltpu.make_async_copy(w_hbm.at[idx_ref[n, c]], sw.at[slot],
                              sem.at[slot]).wait()
        up = jax.lax.dot_general(
            x, sw[slot, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, G)
        up = up + bu_ref[0, pl.ds(c, 1), :][0]
        gate = None
        if gated:
            gate = jax.lax.dot_general(
                x, sw[slot, 1], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        hidden = _combine(act, fatrelu_threshold, gate, up)
        gp = gp_ref[0, pl.ds(c, 1), :][0]
        if mask_mode == "threshold":
            mask = (gp >= prob_threshold).astype(jnp.float32)
        else:
            mask = gp
        hidden = (hidden * mask).astype(sw.dtype)
        partial = jax.lax.dot_general(
            hidden, sw[slot, P - 1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, E)
        if c + W < C:
            start(c + W, slot)
        acc = acc + partial
    out_ref[0] = acc


@functools.partial(
    jax.jit,
    static_argnames=("act", "fatrelu_threshold", "prob_threshold", "interpret",
                     "mask_mode", "window", "gated"),
)
def sparse_ffn_block_v4(
    x: jnp.ndarray,  # (N, E)
    idx: jnp.ndarray,  # (N, C) int32 row index into the interleaved store
    gp_sel: jnp.ndarray,  # (N, C, G)
    w_rows_il: jnp.ndarray,  # (R, P, G, E): P = [up, gate, down] or [up, down]
    *,
    act: str,
    gated: bool,
    fatrelu_threshold: float = 0.0,
    prob_threshold: float = 0.5,
    bu_sel: jnp.ndarray | None = None,
    interpret: bool | None = None,
    mask_mode: str = "threshold",
    window: int = 0,  # 0 = auto from VMEM budget
) -> jnp.ndarray:
    N, E = x.shape
    C = idx.shape[1]
    R, P, G, _ = w_rows_il.shape
    assert P == (3 if gated else 2)
    if interpret is None:
        interpret = not _on_tpu()
    bu = jnp.zeros_like(gp_sel) if bu_sel is None else bu_sel.astype(jnp.float32)
    blk_bytes = P * G * E * w_rows_il.dtype.itemsize
    W = window or max(2, min(C, (12 * 1024 * 1024) // blk_bytes))

    x3 = x.reshape(N, 1, E)
    vec_spec = lambda shape: pl.BlockSpec(
        shape, lambda n, idx_ref: (n,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=[vec_spec((1, 1, E)), vec_spec((1, C, G)), vec_spec((1, C, G)),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 1, E), lambda n, idx_ref: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((W, P, G, E), w_rows_il.dtype),
            pltpu.SemaphoreType.DMA((W,)),
        ],
    )
    kern = functools.partial(
        lambda *refs: _kernel_v4(act, fatrelu_threshold, prob_threshold, gated,
                                 mask_mode, C, W, refs)
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, 1, E), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * C * G * E * P,
            bytes_accessed=N * C * blk_bytes + N * E * 4,
            transcendentals=0,
        ),
    )(idx, x3, gp_sel, bu, w_rows_il)
    return out.reshape(N, E)


# ---------------------------------------------------------------------------
# v6: auto-pipelined VPU-matvec kernel (the production decode path)
#
# Probe findings (eval_scripts/probes/p03..p07, v5e):
#   - Pallas's implicit pipeline streams dynamically-indexed (G, E) blocks
#     at ~400 GB/s once the grid is deep (static indexing: ~780);
#     manual make_async_copy windows cap at ~170 GB/s regardless of depth.
#   - jax.lax.dot_general lowers 1-row matvecs onto the MXU, whose weight
#     LOAD rate (~one 128x128 tile per 128 cycles = ~240 GB/s) caps every
#     MXU-based decode kernel — that was v1/v3/v4/v5's real wall.
# v6 therefore uses the auto-pipeline (grid (N, C), scalar-prefetched
# dynamic index_map) and computes the matvecs on the VPU as
# multiply+reduce, with up/gate stored TRANSPOSED (R, E, G) so their
# reductions run over sublanes and land lane-major, matching gp/bias; the
# down block stays (R, G, E) so its sublane reduction lands as (1, E).


def _kernel_v6(act, fatrelu_threshold, prob_threshold, gated, mask_mode, refs):
    idx_ref = refs[0]
    xT_ref, gp_ref, bu_ref = refs[1:4]
    if gated:
        wuT_ref, wgT_ref, wd_ref, out_ref = refs[4:8]
    else:
        wuT_ref, wd_ref, out_ref = refs[4:7]
        wgT_ref = None

    c = pl.program_id(1)
    xT = xT_ref[0].astype(jnp.float32)  # (E, 1)
    up = jnp.sum(xT * wuT_ref[0].astype(jnp.float32), axis=0, keepdims=True)
    up = up + bu_ref[0, pl.ds(c, 1), :][0]  # (1, G)
    gate = None
    if gated:
        gate = jnp.sum(xT * wgT_ref[0].astype(jnp.float32), axis=0,
                       keepdims=True)
    hidden = _combine(act, fatrelu_threshold, gate, up)  # (1, G)
    gp = gp_ref[0, pl.ds(c, 1), :][0]
    if mask_mode == "threshold":
        mask = (gp >= prob_threshold).astype(jnp.float32)
    else:
        mask = gp
    hidden = hidden * mask
    hid_T = hidden.reshape(hidden.shape[-1], 1)  # (G, 1)
    partial = jnp.sum(hid_T * wd_ref[0].astype(jnp.float32), axis=0,
                      keepdims=True)  # (1, E)

    @pl.when(c == 0)
    def _():
        out_ref[0] = partial

    @pl.when(c > 0)
    def _():
        out_ref[0] = out_ref[0] + partial


@functools.partial(
    jax.jit,
    static_argnames=("act", "fatrelu_threshold", "prob_threshold", "interpret",
                     "mask_mode"),
)
def sparse_ffn_block_v6(
    x: jnp.ndarray,  # (N, E)
    idx: jnp.ndarray,  # (N, C) int32 row index into the weight stores
    gp_sel: jnp.ndarray,  # (N, C, G)
    w_upT_rows: jnp.ndarray,  # (R, E, G) — TRANSPOSED layout
    w_gateT_rows: jnp.ndarray | None,  # (R, E, G)
    w_down_rows: jnp.ndarray,  # (R, G, E)
    *,
    act: str,
    fatrelu_threshold: float = 0.0,
    prob_threshold: float = 0.5,
    bu_sel: jnp.ndarray | None = None,
    interpret: bool | None = None,
    mask_mode: str = "threshold",
) -> jnp.ndarray:  # (N, E) f32
    N, E = x.shape
    C = idx.shape[1]
    R, _, G = w_upT_rows.shape
    if interpret is None:
        interpret = not _on_tpu()
    bu = jnp.zeros_like(gp_sel) if bu_sel is None else bu_sel.astype(jnp.float32)
    gated = w_gateT_rows is not None and act in ("fatrelu", "drelu", "silu",
                                                 "gelu")

    xT = x.reshape(N, E, 1)
    w_spec = lambda shape: pl.BlockSpec(
        shape, lambda n, c, idx_ref: (idx_ref[n, c], 0, 0),
        memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((1, E, 1), lambda n, c, idx_ref: (n, 0, 0),
                          memory_space=pltpu.VMEM)
    sel_spec = pl.BlockSpec((1, C, G), lambda n, c, idx_ref: (n, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [x_spec, sel_spec, sel_spec, w_spec((1, E, G))]
    inputs = [xT, gp_sel, bu, w_upT_rows]
    if gated:
        in_specs.append(w_spec((1, E, G)))
        inputs.append(w_gateT_rows)
    in_specs.append(w_spec((1, G, E)))
    inputs.append(w_down_rows)

    n_proj = 3 if gated else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N, C),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, E), lambda n, c, idx_ref: (n, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kern = functools.partial(
        lambda *refs: _kernel_v6(act, fatrelu_threshold, prob_threshold, gated,
                                 mask_mode, refs)
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, 1, E), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * C * G * E * n_proj,
            bytes_accessed=n_proj * N * C * G * E
            * w_upT_rows.dtype.itemsize + N * E * 4,
            transcendentals=0,
        ),
    )(idx, *inputs)
    return out.reshape(N, E)


def transpose_up_rows(w_rows: jnp.ndarray) -> jnp.ndarray:
    """(ng, G, E) -> (ng, E, G) contiguous (v6 up/gate layout)."""
    return jnp.swapaxes(w_rows, -1, -2)


# ---------------------------------------------------------------------------
# v6q: the v6 auto-pipelined VPU kernel over Q8_0-PACKED stores.
#
# The TPU analogue of the reference's quantized sparse kernels
# (ggml/src/ggml-cuda/mmq-sparse.cu, axpyq-sparse.cu; weight types gated at
# src/llama-sparkinfer.cpp:178): weights stay int8 in HBM with one f32
# scale per 32-weight ggml block and are dequantized on the VPU inside the
# kernel — HBM traffic per token halves vs bf16, which multiplies with the
# sparse selection saving.
#
# Store layouts (QK=32 ggml block size along the original input dim):
#   up/gate: qw (R, E, G) int8, scales (R, E//32, G) f32 — the transposed
#            v6 store; scale s[n, e//32, g] covers elements e..e+31 of
#            column g (ggml blocks run along E for up/gate).
#   down:    qw (R, G, E) int8, scales (R, G//32, E) f32 (blocks along F).


def _dequant_sub(q, s):
    """q (B, L) int8, s (B//32, L) f32 -> f32, scale repeated over 32
    sublanes (reshape-broadcast; no gather)."""
    B, L = q.shape
    qf = q.astype(jnp.float32).reshape(B // 32, 32, L)
    return (qf * s.reshape(B // 32, 1, L)).reshape(B, L)


def _kernel_v6q(act, fatrelu_threshold, prob_threshold, gated, mask_mode,
                refs):
    idx_ref = refs[0]
    xT_ref, gp_ref, bu_ref = refs[1:4]
    if gated:
        (qu_ref, su_ref, qg_ref, sg_ref, qd_ref, sd_ref,
         out_ref) = refs[4:11]
    else:
        qu_ref, su_ref, qd_ref, sd_ref, out_ref = refs[4:9]
        qg_ref = sg_ref = None

    c = pl.program_id(1)
    xT = xT_ref[0].astype(jnp.float32)  # (E, 1)
    wu = _dequant_sub(qu_ref[0], su_ref[0])  # (E, G) f32
    up = jnp.sum(xT * wu, axis=0, keepdims=True)
    up = up + bu_ref[0, pl.ds(c, 1), :][0]  # (1, G)
    gate = None
    if gated:
        wg = _dequant_sub(qg_ref[0], sg_ref[0])
        gate = jnp.sum(xT * wg, axis=0, keepdims=True)
    hidden = _combine(act, fatrelu_threshold, gate, up)  # (1, G)
    gp = gp_ref[0, pl.ds(c, 1), :][0]
    if mask_mode == "threshold":
        mask = (gp >= prob_threshold).astype(jnp.float32)
    else:
        mask = gp
    hidden = hidden * mask
    hid_T = hidden.reshape(hidden.shape[-1], 1)  # (G, 1)
    wd = _dequant_sub(qd_ref[0], sd_ref[0])  # (G, E) f32
    partial = jnp.sum(hid_T * wd, axis=0, keepdims=True)  # (1, E)

    @pl.when(c == 0)
    def _():
        out_ref[0] = partial

    @pl.when(c > 0)
    def _():
        out_ref[0] = out_ref[0] + partial


@functools.partial(
    jax.jit,
    static_argnames=("act", "fatrelu_threshold", "prob_threshold", "interpret",
                     "mask_mode"),
)
def sparse_ffn_block_v6q(
    x: jnp.ndarray,  # (N, E)
    idx: jnp.ndarray,  # (N, C) int32 row index into the weight stores
    gp_sel: jnp.ndarray,  # (N, C, G)
    qw_upT: jnp.ndarray,  # (R, E, G) int8
    s_upT: jnp.ndarray,  # (R, E//32, G) f32
    qw_gateT: jnp.ndarray | None,  # (R, E, G) int8
    s_gateT: jnp.ndarray | None,
    qw_down: jnp.ndarray,  # (R, G, E) int8
    s_down: jnp.ndarray,  # (R, G//32, E) f32
    *,
    act: str,
    fatrelu_threshold: float = 0.0,
    prob_threshold: float = 0.5,
    bu_sel: jnp.ndarray | None = None,
    interpret: bool | None = None,
    mask_mode: str = "threshold",
) -> jnp.ndarray:  # (N, E) f32
    N, E = x.shape
    C = idx.shape[1]
    R, _, G = qw_upT.shape
    if interpret is None:
        interpret = not _on_tpu()
    bu = jnp.zeros_like(gp_sel) if bu_sel is None else bu_sel.astype(jnp.float32)
    gated = qw_gateT is not None and act in ("fatrelu", "drelu", "silu",
                                             "gelu")

    xT = x.reshape(N, E, 1)
    w_spec = lambda shape: pl.BlockSpec(
        shape, lambda n, c, idx_ref: (idx_ref[n, c], 0, 0),
        memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((1, E, 1), lambda n, c, idx_ref: (n, 0, 0),
                          memory_space=pltpu.VMEM)
    sel_spec = pl.BlockSpec((1, C, G), lambda n, c, idx_ref: (n, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [x_spec, sel_spec, sel_spec,
                w_spec((1, E, G)), w_spec((1, E // 32, G))]
    inputs = [xT, gp_sel, bu, qw_upT, s_upT]
    if gated:
        in_specs += [w_spec((1, E, G)), w_spec((1, E // 32, G))]
        inputs += [qw_gateT, s_gateT]
    in_specs += [w_spec((1, G, E)), w_spec((1, G // 32, E))]
    inputs += [qw_down, s_down]

    n_proj = 3 if gated else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N, C),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, E), lambda n, c, idx_ref: (n, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kern = functools.partial(
        lambda *refs: _kernel_v6q(act, fatrelu_threshold, prob_threshold,
                                  gated, mask_mode, refs)
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, 1, E), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * N * C * G * E * n_proj,
            bytes_accessed=n_proj * N * C * G * E
            + n_proj * N * C * G * E * 4 // 32 + N * E * 4,
            transcendentals=0,
        ),
    )(idx, *inputs)
    return out.reshape(N, E)


def quantize_rows_q8_0(w_rows: jnp.ndarray, transposed: bool):
    """Quantize a v6 weight store to the v6q packed layout (numpy, host).

    transposed=True: w (…, E, G), ggml blocks along E (axis -2) ->
      (qw int8 (…, E, G), scales f32 (…, E//32, G)).
    transposed=False: w (…, G, E), blocks along G (axis -2) ->
      (qw int8 (…, G, E), scales f32 (…, G//32, E)).
    Matches ggml quantize_row_q8_0 math (scale = amax/127, symmetric)."""
    import numpy as np

    w = np.asarray(w_rows, np.float32)
    B = w.shape[-2]
    blk = w.reshape(w.shape[:-2] + (B // 32, 32, w.shape[-1]))
    amax = np.abs(blk).max(axis=-2)  # (…, B//32, L)
    scales = (amax / 127.0).astype(np.float32)
    inv = np.where(scales > 0, 1.0 / np.maximum(scales, 1e-30), 0.0)
    q = np.rint(blk * inv[..., None, :]).clip(-127, 127).astype(np.int8)
    return q.reshape(w.shape), scales


# ---------------------------------------------------------------------------
# v5: wave-batched manual-DMA kernel
#
# Probe #4: v4's interleaved fetches plateau at ~190 GB/s regardless of
# DMA size — the limiter is the SERIAL chain of per-block matvecs (3
# MXU-latency-bound (1,E)x(E,G) dots per block; ~100us/layer at 1B
# shapes), not the stream. v5 batches compute into WAVES: double-buffered
# groups of Wv blocks stream per projection while ONE (1,E)x(E,Wv*G) dot
# per projection covers the whole wave — C/Wv big dots instead of C tiny
# ones, with the next wave's DMAs in flight underneath.


def _kernel_v5(act, fatrelu_threshold, prob_threshold, gated, mask_mode, C, Wv,
               refs):
    idx_ref = refs[0]  # (N, C) SMEM scalar-prefetch
    x_ref, gp_ref, bu_ref = refs[1:4]
    if gated:
        up_hbm, gate_hbm, down_hbm = refs[4:7]
        out_ref = refs[7]
        su, sg, sd = refs[8:11]
        sem_u, sem_g, sem_d = refs[11:14]
    else:
        up_hbm, down_hbm = refs[4:6]
        gate_hbm, sg, sem_g = None, None, None
        out_ref = refs[6]
        su, sd = refs[7:9]
        sem_u, sem_d = refs[9:11]

    n = pl.program_id(0)
    x = x_ref[0]  # (1, E)
    E = x.shape[-1]
    G = su.shape[-2]
    n_waves = C // Wv

    def dma(hbm, scr, sem, c, buf, k):
        return pltpu.make_async_copy(hbm.at[idx_ref[n, c]], scr.at[buf, k],
                                     sem.at[buf, k])

    def start_wave(j, buf):
        for k in range(Wv):
            c = j * Wv + k
            dma(up_hbm, su, sem_u, c, buf, k).start()
            if gated:
                dma(gate_hbm, sg, sem_g, c, buf, k).start()
            dma(down_hbm, sd, sem_d, c, buf, k).start()

    start_wave(0, 0)
    acc = jnp.zeros((1, E), jnp.float32)
    for j in range(n_waves):
        buf = j % 2
        if j + 1 < n_waves:
            start_wave(j + 1, buf ^ 1)
        for k in range(Wv):
            c = j * Wv + k
            dma(up_hbm, su, sem_u, c, buf, k).wait()
            if gated:
                dma(gate_hbm, sg, sem_g, c, buf, k).wait()
            dma(down_hbm, sd, sem_d, c, buf, k).wait()
        wu = su[buf].reshape(Wv * G, E)
        up = jax.lax.dot_general(
            x, wu, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, Wv*G)
        up = up + bu_ref[0, pl.ds(j * Wv, Wv), :].reshape(1, Wv * G)
        gate = None
        if gated:
            wg = sg[buf].reshape(Wv * G, E)
            gate = jax.lax.dot_general(
                x, wg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        hidden = _combine(act, fatrelu_threshold, gate, up)
        gp = gp_ref[0, pl.ds(j * Wv, Wv), :].reshape(1, Wv * G)
        if mask_mode == "threshold":
            mask = (gp >= prob_threshold).astype(jnp.float32)
        else:
            mask = gp
        hidden = (hidden * mask).astype(sd.dtype)
        wd = sd[buf].reshape(Wv * G, E)
        acc = acc + jax.lax.dot_general(
            hidden, wd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = acc


@functools.partial(
    jax.jit,
    static_argnames=("act", "fatrelu_threshold", "prob_threshold", "interpret",
                     "mask_mode", "wave"),
)
def sparse_ffn_block_v5(
    x: jnp.ndarray,  # (N, E)
    idx: jnp.ndarray,  # (N, C) int32 row index into the weight stores
    gp_sel: jnp.ndarray,  # (N, C, G)
    w_up_rows: jnp.ndarray,  # (R, G, E)
    w_gate_rows: jnp.ndarray | None,
    w_down_rows: jnp.ndarray,  # (R, G, E)
    *,
    act: str,
    fatrelu_threshold: float = 0.0,
    prob_threshold: float = 0.5,
    bu_sel: jnp.ndarray | None = None,
    interpret: bool | None = None,
    mask_mode: str = "threshold",
    wave: int = 0,  # blocks per compute wave; 0 = auto from VMEM budget
) -> jnp.ndarray:
    N, E = x.shape
    C = idx.shape[1]
    R, G, _ = w_up_rows.shape
    if interpret is None:
        interpret = not _on_tpu()
    bu = jnp.zeros_like(gp_sel) if bu_sel is None else bu_sel.astype(jnp.float32)
    gated = w_gate_rows is not None and act in ("fatrelu", "drelu", "silu", "gelu")
    n_proj = 3 if gated else 2
    blk = G * E * w_up_rows.dtype.itemsize
    if wave:
        Wv = wave
    else:
        Wv = 1
        for cand in (8, 4, 2):
            if C % cand == 0 and 2 * cand * n_proj * blk <= 12 * 1024 * 1024:
                Wv = cand
                break
    assert C % Wv == 0, (C, Wv)

    x3 = x.reshape(N, 1, E)
    hbm_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    vec_spec = lambda shape: pl.BlockSpec(
        shape, lambda n, idx_ref: (n,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    in_specs = [vec_spec((1, 1, E)), vec_spec((1, C, G)), vec_spec((1, C, G)),
                hbm_spec]
    inputs = [x3, gp_sel, bu, w_up_rows]
    if gated:
        in_specs.append(hbm_spec)
        inputs.append(w_gate_rows)
    in_specs.append(hbm_spec)
    inputs.append(w_down_rows)

    wdt = w_up_rows.dtype
    scratch = [pltpu.VMEM((2, Wv, G, E), wdt) for _ in range(n_proj)]
    scratch += [pltpu.SemaphoreType.DMA((2, Wv))] * n_proj

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, E), lambda n, idx_ref: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    kern = functools.partial(
        lambda *refs: _kernel_v5(act, fatrelu_threshold, prob_threshold, gated,
                                 mask_mode, C, Wv, refs)
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, 1, E), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * C * G * E * n_proj,
            bytes_accessed=n_proj * N * C * blk + N * E * 4,
            transcendentals=0,
        ),
    )(idx, *inputs)
    return out.reshape(N, E)


def interleave_rows(w_up_rows, w_gate_rows, w_down_rows):
    """(ng, G, E) x P -> (ng, P, G, E) contiguous interleaved store."""
    parts = [w_up_rows]
    if w_gate_rows is not None:
        parts.append(w_gate_rows)
    parts.append(w_down_rows)
    return jnp.stack(parts, axis=-3)


# ---------------------------------------------------------------------------
# v2: single deep weight stream
#
# The v1 grid runs only C/U steps per call, which barely covers the DMA
# warmup bubble (measured ~27% streaming efficiency at decode capacities).
# v2 streams ONE concatenated store [up; gate; down] (P*R, G, E) over a
# (N, C, P) grid — P*C uniform (G, E) fetches per call from a single
# pipeline, with the projection phase carried through VMEM scratch.


def _kernel_v2(act, fatrelu_threshold, prob_threshold, gated, mask_mode, R,
               refs):
    (idx_ref, x_ref, gp_ref, bu_ref, w_ref, out_ref, up_buf, hid_buf) = refs
    c = pl.program_id(1)
    p = pl.program_id(2)
    P = pl.num_programs(2)
    x = x_ref[0]  # (1, E)
    w = w_ref[0]  # (G, E)

    def row_dot():
        return jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (1, G)

    if gated:
        @pl.when(p == 0)
        def _():
            up_buf[:] = row_dot() + bu_ref[0]

        @pl.when(p == 1)
        def _():
            gate = row_dot()
            hidden = _combine(act, fatrelu_threshold, gate, up_buf[:])
            gp = gp_ref[0]
            mask = (gp >= prob_threshold).astype(jnp.float32) \
                if mask_mode == "threshold" else gp
            hid_buf[:] = hidden * mask
    else:
        @pl.when(p == 0)
        def _():
            up = row_dot() + bu_ref[0]
            hidden = _combine(act, fatrelu_threshold, None, up)
            gp = gp_ref[0]
            mask = (gp >= prob_threshold).astype(jnp.float32) \
                if mask_mode == "threshold" else gp
            hid_buf[:] = hidden * mask

    @pl.when(p == P - 1)
    def _():
        partial = jax.lax.dot_general(
            hid_buf[:].astype(w.dtype), w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, E)

        @pl.when(c == 0)
        def _():
            out_ref[0] = partial

        @pl.when(c > 0)
        def _():
            out_ref[0] = out_ref[0] + partial


@functools.partial(
    jax.jit,
    static_argnames=("act", "fatrelu_threshold", "prob_threshold", "interpret",
                     "mask_mode", "gated", "R"),
)
def sparse_ffn_block_v2(
    x: jnp.ndarray,  # (N, E)
    idx: jnp.ndarray,  # (N, C) row index into each projection's R rows
    gp_sel: jnp.ndarray,  # (N, C, G)
    w_all_rows: jnp.ndarray,  # (P*R, G, E): [up; gate; down] or [up; down]
    *,
    act: str,
    gated: bool,
    R: int,
    fatrelu_threshold: float = 0.0,
    prob_threshold: float = 0.5,
    bu_sel: jnp.ndarray | None = None,
    interpret: bool | None = None,
    mask_mode: str = "threshold",
) -> jnp.ndarray:
    N, E = x.shape
    C = idx.shape[1]
    G = w_all_rows.shape[1]
    P = 3 if gated else 2
    assert w_all_rows.shape[0] == P * R
    if interpret is None:
        interpret = not _on_tpu()

    bu = jnp.zeros_like(gp_sel) if bu_sel is None else bu_sel.astype(jnp.float32)
    x3 = x.reshape(N, 1, E)
    gp3 = gp_sel.reshape(N * C, 1, G)
    bu3 = bu.reshape(N * C, 1, G)

    w_spec = pl.BlockSpec(
        (1, G, E), lambda n, c, p, idx_ref: (p * R + idx_ref[n, c], 0, 0),
        memory_space=pltpu.VMEM,
    )
    x_spec = pl.BlockSpec((1, 1, E), lambda n, c, p, idx_ref: (n, 0, 0),
                          memory_space=pltpu.VMEM)
    sel_spec = pl.BlockSpec((1, 1, G), lambda n, c, p, idx_ref: (n * C + c, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N, C, P),
        in_specs=[x_spec, sel_spec, sel_spec, w_spec],
        out_specs=pl.BlockSpec((1, 1, E), lambda n, c, p, idx_ref: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, G), jnp.float32),  # up phase buffer
            pltpu.VMEM((1, G), jnp.float32),  # masked hidden buffer
        ],
    )
    kern = functools.partial(
        lambda *refs: _kernel_v2(act, fatrelu_threshold, prob_threshold, gated,
                                 mask_mode, R, refs)
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, 1, E), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * C * G * E * P,
            bytes_accessed=P * N * C * G * E * 2 + N * E * 4,
            transcendentals=0,
        ),
    )(idx, x3, gp3, bu3, w_all_rows)
    return out.reshape(N, E)


# ---------------------------------------------------------------------------
# v7u: cross-token UNION batch kernel (round-3, VERDICT item 7)
#
# At batch decode the per-token kernel (v6, grid (N, C)) reads each hot
# group's blocks once PER TOKEN that selected it — B x C block reads. The
# union kernel reads each group in the cross-token union exactly ONCE
# (grid (Cu,)) and amortizes it over the whole batch with (B, E) x (E, G)
# MXU dots; per-token selection is enforced by a per-(token, union-slot)
# gate-prob mask. The reference's batched sparse kernels are the CUDA
# mm-sparse batch path (mm-sparse.cu, 431 LoC); this is the TPU-shaped
# equivalent: fewer, larger dots instead of warp-level row scans.


def _kernel_v7u(act, fatrelu_threshold, prob_threshold, gated, mask_mode,
                refs):
    idx_ref = refs[0]
    x_ref, gp_ref, bu_ref = refs[1:4]
    if gated:
        wuT_ref, wgT_ref, wd_ref, out_ref = refs[4:8]
    else:
        wuT_ref, wd_ref, out_ref = refs[4:7]
        wgT_ref = None

    c = pl.program_id(0)
    x = x_ref[:]  # (B, E)
    up = jax.lax.dot_general(
        x, wuT_ref[0].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (B, G)
    # gp/bu ride as FULL (B, Cu, G) blocks, sliced per grid step in-kernel
    # (a (B, 1, G) block would violate Mosaic's second-to-last-dim rule
    # whenever Cu isn't the block dim)
    up = up + bu_ref[:, pl.ds(c, 1), :][:, 0, :]
    gate = None
    if gated:
        gate = jax.lax.dot_general(
            x, wgT_ref[0].astype(x.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    hidden = _combine(act, fatrelu_threshold, gate, up)  # (B, G)
    gp = gp_ref[:, pl.ds(c, 1), :][:, 0, :]  # (B, G)
    if mask_mode == "threshold":
        mask = (gp >= prob_threshold).astype(jnp.float32)
    else:
        mask = gp
    hidden = hidden * mask
    partial = jax.lax.dot_general(
        hidden.astype(jnp.bfloat16), wd_ref[0].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (B, E)

    @pl.when(c == 0)
    def _():
        out_ref[:] = partial

    @pl.when(c > 0)
    def _():
        out_ref[:] = out_ref[:] + partial


@functools.partial(
    jax.jit,
    static_argnames=("act", "fatrelu_threshold", "prob_threshold", "interpret",
                     "mask_mode"),
)
def sparse_ffn_block_v7u(
    x: jnp.ndarray,  # (B, E)
    union_rows: jnp.ndarray,  # (Cu,) int32 row index into the stores
    gp_u: jnp.ndarray,  # (B, Cu, G) per-token probs (0 where not selected)
    w_upT_rows: jnp.ndarray,  # (R, E, G)
    w_gateT_rows: jnp.ndarray | None,
    w_down_rows: jnp.ndarray,  # (R, G, E)
    *,
    act: str,
    fatrelu_threshold: float = 0.0,
    prob_threshold: float = 0.5,
    bu_u: jnp.ndarray | None = None,  # (B, Cu, G)
    interpret: bool | None = None,
    mask_mode: str = "threshold",
) -> jnp.ndarray:  # (B, E) f32
    B, E = x.shape
    Cu = union_rows.shape[0]
    R, _, G = w_upT_rows.shape
    if interpret is None:
        interpret = not _on_tpu()
    bu = jnp.zeros_like(gp_u) if bu_u is None else bu_u.astype(jnp.float32)
    gated = w_gateT_rows is not None and act in ("fatrelu", "drelu", "silu",
                                                 "gelu")

    w_spec = lambda shape: pl.BlockSpec(
        shape, lambda c, idx_ref: (idx_ref[c], 0, 0),
        memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((B, E), lambda c, idx_ref: (0, 0),
                          memory_space=pltpu.VMEM)
    sel_spec = pl.BlockSpec((B, Cu, G), lambda c, idx_ref: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [x_spec, sel_spec, sel_spec, w_spec((1, E, G))]
    inputs = [x, gp_u, bu, w_upT_rows]
    if gated:
        in_specs.append(w_spec((1, E, G)))
        inputs.append(w_gateT_rows)
    in_specs.append(w_spec((1, G, E)))
    inputs.append(w_down_rows)

    n_proj = 3 if gated else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Cu,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, E), lambda c, idx_ref: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    kern = functools.partial(
        lambda *refs: _kernel_v7u(act, fatrelu_threshold, prob_threshold,
                                  gated, mask_mode, refs))
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, E), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Cu * G * E * n_proj,
            bytes_accessed=n_proj * Cu * G * E * w_upT_rows.dtype.itemsize
            + B * E * 4,
            transcendentals=0,
        ),
    )(union_rows, *inputs)
    return out
