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


def predict_activations(lp: dict, x: jnp.ndarray) -> jnp.ndarray:
    """lp carries pred_up (E, R), pred_up_b (R,), pred_down (R, F),
    pred_down_b (F,); x (..., E) is the FFN input (already normed).
    Returns activation probabilities (..., F) in f32."""
    xf = x.astype(jnp.float32)
    h = xf @ lp["pred_up"].astype(jnp.float32) + lp["pred_up_b"].astype(jnp.float32)
    h = jnp.maximum(h, 0.0)
    z = h @ lp["pred_down"].astype(jnp.float32) + lp["pred_down_b"].astype(jnp.float32)
    return jax.nn.sigmoid(z)
