"""Device mesh + sharding rules.

The TPU-native replacement for the reference's multi-device machinery
(CUDA row-split LLAMA_SPLIT_MODE_ROW, the ggml-backend scheduler's
pipeline parallelism, and the ggml-rpc tensor-shipping backend — SURVEY.md
§2.7): one global mesh with named axes, weights device_put with
NamedShardings, and XLA/GSPMD inserting the ICI collectives.

Axes:
  dp — data parallel: batch dim of activations and KV cache.
  tp — tensor parallel: attention heads and FFN neuron dim. Megatron-style:
       column-parallel wq/wk/wv/w_up/w_gate, row-parallel wo/w_down, so each
       transformer block needs exactly two all-reduces (attn out + ffn out),
       both inserted by GSPMD from the shardings alone.
  ep — expert parallel: the expert dim of MoE tensors (w_*_exps and the
       grouped moe_*_rows). Each device holds n_expert/ep experts; GSPMD
       turns the routed expert gathers into ICI collectives. This is the
       capacity-scaling analogue of the reference's per-GPU expert split
       (it has none — MoE rides the generic row split), so EP here is a
       TPU-first extension rather than a translation.

The sparse path shards the SAME neuron axis (hot-neuron caches are sharded
by tp like w_up rows), so sparse and dense paths scale identically.

The rules below cover the GATHER (row-store) sparse path and dense
weights. The FAST path — v6 Pallas flat stores and tiered hot stores —
is sharded by parallel/sparse_tp.py (GROUP-major flat re-order + dim-0
tp shard + shard_map around the kernel with one psum per layer); a
Pallas custom call cannot be auto-partitioned by GSPMD, so those stores
must NOT be given rules here.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig
from ..runtime.kv_cache import KVCache


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    dp: str = "dp"
    tp: str = "tp"
    ep: str = "ep"


AX = MeshAxes()


def make_mesh(dp: int = 1, tp: int = 1, ep: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * tp * ep
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    dev = np.asarray(devices[:n]).reshape(dp, tp, ep)
    return Mesh(dev, (AX.dp, AX.tp, AX.ep))


# sharding rule tables: param name -> PartitionSpec (None = replicate dim)
_LAYER_RULES: dict[str, P] = {
    # column parallel (shard output features = heads / neurons)
    "wq": P(None, None, AX.tp),
    "wk": P(None, None, AX.tp),
    "wv": P(None, None, AX.tp),
    "bq": P(None, AX.tp),
    "bk": P(None, AX.tp),
    "bv": P(None, AX.tp),
    "w_up": P(None, None, AX.tp),
    "w_gate": P(None, None, AX.tp),
    "b_up": P(None, AX.tp),
    # row parallel (shard input features; output all-reduced by GSPMD)
    "wo": P(None, AX.tp, None),
    "w_down": P(None, AX.tp, None),
    # predictors: column-parallel over n_ff so sparse_idx is sharded like
    # the neuron dim (pred_up is tiny, replicate; pred_down output = n_ff)
    "pred_up": P(None, None, None),
    "pred_up_b": P(None, None),
    "pred_down": P(None, None, AX.tp),
    "pred_down_b": P(None, AX.tp),
    # expert parallel: shard the expert dim; the router stays replicated so
    # every device computes the same top-k and GSPMD only moves the gathered
    # expert weights/partials over ICI
    "w_up_exps": P(None, AX.ep, None, None),
    "w_gate_exps": P(None, AX.ep, None, None),
    "w_down_exps": P(None, AX.ep, None, None),
    "moe_up_rows": P(None, AX.ep, None, None),
    "moe_gate_rows": P(None, AX.ep, None, None),
    "moe_down_rows": P(None, AX.ep, None, None),
    "w_router": P(None, None),
}

_TOP_RULES: dict[str, P] = {
    "tok_embd": P(None, None),
    "pos_embd": P(None, None),
    "output": P(None, AX.tp),  # shard vocab; logits gathered at sample time
}


def _sharding(mesh: Mesh, spec: P | None, ndim: int) -> NamedSharding:
    if spec is None:
        spec = P(*([None] * ndim))
    return NamedSharding(mesh, spec)


def _divisible(shape: tuple[int, ...], spec: P, mesh: Mesh) -> bool:
    for dim, ax in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if ax is None:
            continue
        if dim % mesh.shape[ax] != 0:
            return False
    return True


def shard_params(mesh: Mesh, cfg: ModelConfig, params: dict) -> dict:
    """device_put every param with its rule (falling back to replication when
    a dim doesn't divide the mesh axis — e.g. odd vocab sizes)."""

    def put(name: str, x, rules):
        if hasattr(x, "kind"):  # QuantTensor: replicate (packed layouts don't
            # line up with the logical partition dims; revisit for tp>1)
            return jax.tree.map(
                lambda leaf: jax.device_put(
                    leaf, NamedSharding(mesh, P(*([None] * leaf.ndim)))
                ),
                x,
            )
        spec = rules.get(name)
        if spec is None or not _divisible(x.shape, spec, mesh):
            spec = P(*([None] * x.ndim))
        return jax.device_put(x, NamedSharding(mesh, spec))

    out = {}
    for k, v in params.items():
        if k == "layers":
            out[k] = {lk: put(lk, lv, _LAYER_RULES) for lk, lv in v.items()}
        else:
            out[k] = put(k, v, _TOP_RULES)
    return out


def shard_cache(mesh: Mesh, cache: KVCache) -> KVCache:
    """KV cache: batch over dp, kv-heads over tp (falls back to replicating
    the head dim when n_head_kv doesn't divide tp)."""
    tp_ok = cache.k.shape[3] % mesh.shape[AX.tp] == 0
    dp_ok = cache.k.shape[1] % mesh.shape[AX.dp] == 0
    spec = P(
        None,
        AX.dp if dp_ok else None,
        None,
        AX.tp if tp_ok else None,
        None,
    )
    put = lambda x: None if x is None else jax.device_put(x, NamedSharding(mesh, spec))
    return KVCache(
        k=put(cache.k), v=put(cache.v), k_scale=put(cache.k_scale), v_scale=put(cache.v_scale)
    )


def data_sharding(mesh: Mesh, batch: int) -> NamedSharding:
    dp_ok = batch % mesh.shape[AX.dp] == 0
    return NamedSharding(mesh, P(AX.dp if dp_ok else None, None))
