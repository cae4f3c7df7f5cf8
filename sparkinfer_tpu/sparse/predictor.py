"""Low-rank ReLU-MLP activation predictor.

Ref: build_predictor (src/llama-graph.cpp:865-894):
    sparse_idx = sigmoid(pred_down · relu(pred_up · x + b_up) + b_down)
giving per-neuron activation probabilities in [0, 1].

The reference pipelines each layer's predictor one layer AHEAD
(src/llama-graph.cpp:939-946) to hide the CPU->GPU mask transfer behind
compute. On TPU the mask never leaves the chip, so the predictor runs
in-layer — same math, no cross-device latency to hide. (The thing worth
pipelining on TPU is the host->HBM cold-group prefetch, handled by the
tiering machinery, not the predictor.)

Predictor weights are padded to the per-model max rank so layers stack for
lax.scan (ranks per layer from the `{arch}.pred_lora` KV,
src/llama-hparams.h:54); zero-padding is exact because relu(0·x + 0) = 0
contributes nothing through pred_down's padded rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resolve_predictor(lp: dict, il=None):
    """Per-layer predictor weights from lp: either per-layer slices
    (pred_up …, the lax.scan xs path) or loop-invariant stacks
    (pred_up_all (L, E, R) …, indexed at `il`/lp["flat_il"]).

    The stack form exists for HBM-tight models: the pipelined FFN needs
    both layer il's and layer il+1's predictor, and materializing a rolled
    `_nx` copy doubles predictor storage (~1 GB at 7B). Stacks ride as one
    loop-invariant operand; the per-layer dynamic-slice fuses into the XLA
    dots (only Pallas custom-call consumers force slice copies)."""
    if "pred_up" in lp:
        return (lp["pred_up"], lp["pred_up_b"],
                lp["pred_down"], lp["pred_down_b"])
    if il is None:
        il = lp["flat_il"]

    def f(a):
        return jax.lax.dynamic_index_in_dim(a, il, 0, keepdims=False)

    if "pred_up_qt" in lp:
        # Q8_0-packed predictor stacks (FlatQuantTensor): ~half the
        # predictor HBM bytes/step — at 13B the bf16 predictor is ~13% of
        # sparse decode traffic (VERDICT r2 item 1b). Rebind the layer
        # index (callers may ask for (il+1) % L on the pipelined path).
        return (lp["pred_up_qt"].with_il(il), f(lp["pred_up_b_all"]),
                lp["pred_down_qt"].with_il(il), f(lp["pred_down_b_all"]))
    if "pred_up_w8" in lp:
        # W8A8 predictor stacks: same byte halving as Q8_0 but through
        # XLA-NATIVE int8 MXU dots (no pallas call — probe #13 measured
        # the flat-quant kernel at ~404 GB/s vs ~665 for w8a8-class XLA
        # dots at 13B shapes; custom calls also break cross-op DMA
        # prefetch). The dynamic index on the loop-invariant stack fuses
        # into the dot (only Pallas consumers force slice copies).
        return (lp["pred_up_w8"][il], f(lp["pred_up_b_all"]),
                lp["pred_down_w8"][il], f(lp["pred_down_b_all"]))
    return (f(lp["pred_up_all"]), f(lp["pred_up_b_all"]),
            f(lp["pred_down_all"]), f(lp["pred_down_b_all"]))


def predict_activations(lp: dict, x: jnp.ndarray) -> jnp.ndarray:
    """lp carries pred_up (E, R), pred_up_b (R,), pred_down (R, F),
    pred_down_b (F,) — or the `_all` stacks (see resolve_predictor);
    x (..., E) is the FFN input (already normed).
    Returns activation probabilities (..., F) in f32."""
    pu, pub, pd, pdb = resolve_predictor(lp)
    return predict_from(pu, pub, pd, pdb, x)


def predict_from(pu, pub, pd, pdb, x):
    """Predictor math from resolved weights; pu/pd may be plain arrays,
    (Flat)QuantTensor packed stores (fused dequant matmul), or W8A8Tensor
    (native int8 MXU dot)."""
    from ..ops.quant_matmul import W8A8Tensor, quant_linear, w8a8_linear

    xf = x.astype(jnp.float32)
    if isinstance(pu, W8A8Tensor):
        h = w8a8_linear(xf, pu) + pub.astype(jnp.float32)
    elif hasattr(pu, "kind"):
        h = quant_linear(xf, pu) + pub.astype(jnp.float32)
    else:
        h = xf @ pu.astype(jnp.float32) + pub.astype(jnp.float32)
    h = jnp.maximum(h, 0.0)
    if isinstance(pd, W8A8Tensor):
        z = w8a8_linear(h, pd) + pdb.astype(jnp.float32)
    elif hasattr(pd, "kind"):
        z = quant_linear(h, pd) + pdb.astype(jnp.float32)
    else:
        z = h @ pd.astype(jnp.float32) + pdb.astype(jnp.float32)
    return jax.nn.sigmoid(z)
