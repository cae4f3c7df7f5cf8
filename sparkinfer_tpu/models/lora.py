"""LoRA adapter loading + merge (ref: src/llama-adapter.cpp and
convert_lora_to_gguf.py's adapter GGUF format).

Adapter GGUF: `general.type = "adapter"`, `adapter.type = "lora"`,
`adapter.lora.alpha` KV, and per-target tensors
`<gguf-tensor-name>.lora_a` (r, in) / `.lora_b` (out, r).

The reference applies LoRA at graph build per matmul (W·x + s·B·(A·x));
for inference-only serving the merged form W' = W + s·(B·A) is
mathematically identical, so we merge into the loaded params at apply
time — zero runtime cost, and unapplying is just reloading. Control
vectors (per-layer hidden-state biases, llama_adapter_cvec) are applied
the same way via `apply_control_vector`.
"""

from __future__ import annotations

import numpy as np

from ..gguf.reader import GGUFReader
from .config import ModelConfig

# gguf tensor base name -> (params key, transposed-in-params?)
_TARGETS = {
    "attn_q": "wq",
    "attn_k": "wk",
    "attn_v": "wv",
    "attn_output": "wo",
    "ffn_up": "w_up",
    "ffn_gate": "w_gate",
    "ffn_down": "w_down",
}


def load_lora(path: str) -> dict:
    """Returns {"alpha": float, "deltas": {(layer, key): (A, B)}} with
    A (r, in), B (out, r) f32."""
    r = GGUFReader(path)
    alpha = float(r.kv.get("adapter.lora.alpha", 16.0))
    deltas: dict[tuple[int, str], tuple[np.ndarray, np.ndarray]] = {}
    for name, t in r.tensors.items():
        if not name.endswith(".lora_a"):
            continue
        base = name[: -len(".lora_a")]
        b_t = r.tensors.get(base + ".lora_b")
        if b_t is None:
            continue
        parts = base.split(".")
        if parts[0] != "blk":
            continue
        layer = int(parts[1])
        tname = parts[2]
        key = _TARGETS.get(tname)
        if key is None:
            continue
        A = t.to_f32()
        B = b_t.to_f32()
        deltas[(layer, key)] = (A, B)
    r.close()
    return {"alpha": alpha, "deltas": deltas}


def apply_lora(params: dict, cfg: ModelConfig, path: str, scale: float = 1.0) -> dict:
    """Merge a LoRA adapter into (stacked) params: W' = W + s*(B·A)^T for
    our (in, out) weight orientation. Returns new params dict."""
    import jax.numpy as jnp

    ad = load_lora(path)
    deltas = ad["deltas"]
    if not deltas:
        raise ValueError(f"{path}: no LoRA tensors found")
    # rank from any delta
    r = next(iter(deltas.values()))[0].shape[0]
    s = scale * ad["alpha"] / max(r, 1)

    layers = dict(params["layers"])
    by_key: dict[str, dict[int, tuple]] = {}
    for (layer, key), ab in deltas.items():
        by_key.setdefault(key, {})[layer] = ab

    for key, per_layer in by_key.items():
        w = layers.get(key)
        if w is None or not hasattr(w, "ndim"):
            raise ValueError(f"LoRA targets {key} but model has no such weight "
                             "(quantized-packed weights can't be merged; load "
                             "with keep_quantized=False)")
        w = np.array(w)  # (L, in, out)
        for layer, (A, B) in per_layer.items():
            delta = (B @ A).T  # (in, out)
            w[layer] = w[layer] + s * delta.astype(w.dtype)
        layers[key] = jnp.asarray(w)
    out = dict(params)
    out["layers"] = layers
    return out


def load_control_vector(path: str, n_layer: int, n_embd: int) -> np.ndarray:
    """Read a control-vector GGUF (`direction.{l}` tensors, as written by
    tools/cvector_generator.py and the reference's cvector-generator) into
    an (n_layer, n_embd) array; absent layers stay zero (ref:
    llama_adapter_cvec pads missing directions)."""
    r = GGUFReader(path)
    cv = np.zeros((n_layer, n_embd), np.float32)
    found = False
    for name, t in r.tensors.items():
        if not name.startswith("direction."):
            continue
        l = int(name.split(".")[1])
        if 0 <= l < n_layer:
            cv[l] = t.to_f32().reshape(-1)[:n_embd]
            found = True
    r.close()
    if not found:
        raise ValueError(f"{path}: no direction.* tensors found")
    return cv


def apply_control_vector(params: dict, cfg: ModelConfig, vectors: np.ndarray,
                         scale: float = 1.0) -> dict:
    """vectors (L, E): per-layer bias added to the residual stream (ref:
    llama_adapter_cvec). Stored under layers['cvec'] and added by the
    forward when present."""
    import jax.numpy as jnp

    out = dict(params)
    layers = dict(params["layers"])
    layers["cvec"] = jnp.asarray(vectors * scale, jnp.float32)
    out["layers"] = layers
    return out
