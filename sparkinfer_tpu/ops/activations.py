"""FFN activation functions, including the sparse-model variants.

Ref semantics: ggml unary ops + SparkInfer's GGML_OP_FATRELU
(ggml.h:1159 — FATReLU: x if x > threshold else 0) and the per-arch
activation selection in build_sparse_ffn (src/llama-graph.cpp:1063-1094):
ProSparse -> fatrelu(gate)*up; Bamboo/SparseQwen2 -> relu(gate)*relu(up);
OPT/ReluFalcon -> relu(up).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fatrelu(x: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    return jnp.where(x > threshold, x, 0.0).astype(x.dtype)


def shifted_step(x: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """1.0 where x >= threshold else 0.0 (ref: GGML_OP_SHIFTED_STEP)."""
    return (x >= threshold).astype(jnp.float32)


# gated activations: combine(gate, up) -> hidden
def _silu_gate(g, u):
    return jax.nn.silu(g.astype(jnp.float32)).astype(g.dtype) * u


def _gelu_gate(g, u):
    return jax.nn.gelu(g.astype(jnp.float32), approximate=True).astype(g.dtype) * u


def _relu_gate(g, u):
    return jnp.maximum(g, 0) * u


def _drelu(g, u):
    return jnp.maximum(g, 0) * jnp.maximum(u, 0)


def _fatrelu_gate(threshold: float):
    def f(g, u):
        return fatrelu(g, threshold) * u

    return f


def _swiglu_oai(g, u, alpha: float = 1.702, limit: float = 7.0):
    """gpt-oss clamped swiglu (ggml_swiglu_oai, ref ggml.h GLU ops):
    gate clamped to [-inf, limit], up to [-limit, limit], sigmoid slope
    alpha, plus the (up + 1) shift."""
    gf = jnp.clip(g.astype(jnp.float32), None, limit)
    uf = jnp.clip(u.astype(jnp.float32), -limit, limit)
    out = gf * jax.nn.sigmoid(alpha * gf) * (uf + 1.0)
    return out.astype(g.dtype)


# ungated: act(up)
def _relu(u):
    return jnp.maximum(u, 0)


def _relu2(u):
    """relu(x)^2 (nemotron — ggml_sqr(ggml_relu))."""
    r = jnp.maximum(u, 0)
    return r * r


def _gelu(u):
    return jax.nn.gelu(u.astype(jnp.float32), approximate=True).astype(u.dtype)


def _gelu_erf(u):
    """Exact (erf) GELU — bert-family encoders (HF hidden_act='gelu';
    ggml analogue GGML_UNARY_OP_GELU_ERF)."""
    return jax.nn.gelu(u.astype(jnp.float32), approximate=False).astype(u.dtype)


def _relu2_glu(g, u):
    """relu(gate)^2 * up (bitnet b1.58 — ref src/models/bitnet.cpp)."""
    r = jnp.maximum(g, 0)
    return r * r * u


def xielu(x, alpha_p, alpha_n, beta, eps):
    """xIELU (arXiv:2411.13010; ref ggml_xielu / src/models/apertus.cpp):
    x>0: a_p*x^2 + beta*x; x<=0: (expm1(min(x, eps)) - x)*a_n + beta*x.
    alpha_p/alpha_n arrive already softplus'd (loader)."""
    xf = x.astype(jnp.float32)
    ap = alpha_p.astype(jnp.float32)
    an = alpha_n.astype(jnp.float32)
    b = beta.astype(jnp.float32)
    e = eps.astype(jnp.float32)
    pos = ap * xf * xf + b * xf
    neg = (jnp.expm1(jnp.minimum(xf, e)) - xf) * an + b * xf
    return jnp.where(xf > 0, pos, neg).astype(x.dtype)


def act_fn(name: str, fatrelu_threshold: float = 0.0):
    """Returns (gated, fn). gated=True -> fn(gate, up); else fn(up)."""
    table = {
        "silu": (True, _silu_gate),
        "swiglu": (True, _silu_gate),
        "swiglu_oai": (True, _swiglu_oai),
        "gelu": (False, _gelu),
        "gelu_erf": (False, _gelu_erf),
        "relu2_glu": (True, _relu2_glu),
        "geglu": (True, _gelu_gate),
        "relu": (False, _relu),
        "relu2": (False, _relu2),
        "reglu": (True, _relu_gate),
        "drelu": (True, _drelu),
        "fatrelu": (True, _fatrelu_gate(fatrelu_threshold)),
    }
    return table[name]
