"""Session state save/restore — parity with llama_state_save_file /
llama_state_seq_* (ref: src/llama-context.cpp:1676-2021 over the llama-io
stream abstraction src/llama-io.{h,cpp}; exercised by
examples/save-load-state and the server's /slots/:id?action=save).

Format: numpy .npz (zip of arrays) + a JSON metadata entry — a durable,
dependency-free container. Saved per sequence: the token history, KV cache
rows up to n_past (trimmed — the analogue of the reference serializing
only occupied cells), sampler state, and a model fingerprint that refuses
cross-model restores.
"""

from __future__ import annotations

import io
import json
import zipfile

import jax
import jax.numpy as jnp
import numpy as np

from .kv_cache import KVCache
from .sampling import SamplerState

STATE_MAGIC = "sparkinfer-state-v1"


def model_fingerprint(cfg) -> str:
    return (
        f"{cfg.arch}:L{cfg.n_layer}:E{cfg.n_embd}:H{cfg.n_head}:"
        f"Hkv{cfg.n_head_kv}:F{cfg.n_ff}:V{cfg.n_vocab}"
    )


def save_state(
    path: str,
    cfg,
    cache: KVCache,
    n_past: int,
    sstate: SamplerState | None = None,
    tokens: list[int] | None = None,
    slot: int = 0,
) -> int:
    """Save one slot's sequence state. Returns bytes written."""
    arrays: dict[str, np.ndarray] = {}
    # trim to occupied cells (ref: only used cells serialized)
    arrays["k"] = np.asarray(cache.k[:, slot, :n_past])
    arrays["v"] = np.asarray(cache.v[:, slot, :n_past])
    if cache.quantized:
        arrays["k_scale"] = np.asarray(cache.k_scale[:, slot, :n_past])
        arrays["v_scale"] = np.asarray(cache.v_scale[:, slot, :n_past])
    if sstate is not None:
        st1 = jax.tree.map(lambda a: a[slot] if a.ndim > 0 and a.shape[0] > slot else a, sstate) \
            if _is_batched(sstate) else sstate
        arrays["s_key"] = np.asarray(st1.key)
        arrays["s_recent"] = np.asarray(st1.recent)
        arrays["s_recent_pos"] = np.asarray(st1.recent_pos)
        arrays["s_mirostat_mu"] = np.asarray(st1.mirostat_mu)
    meta = {
        "magic": STATE_MAGIC,
        "fingerprint": model_fingerprint(cfg),
        "n_past": int(n_past),
        "tokens": [int(t) for t in (tokens or [])],
        "kv_dtype": str(cache.k.dtype),
        "quantized": bool(cache.quantized),
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        z.writestr("meta.json", json.dumps(meta))
        for name, arr in arrays.items():
            b = io.BytesIO()
            np.save(b, arr)
            z.writestr(f"{name}.npy", b.getvalue())
    data = buf.getvalue()
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load_state(
    path: str,
    cfg,
    cache: KVCache,
    slot: int = 0,
    sstate: SamplerState | None = None,
):
    """Restore into `cache` at `slot`. Returns (cache, n_past, tokens,
    sstate-or-None). Raises on model mismatch."""
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        if meta.get("magic") != STATE_MAGIC:
            raise ValueError("not a sparkinfer state file")
        if meta["fingerprint"] != model_fingerprint(cfg):
            raise ValueError(
                f"state was saved for a different model "
                f"({meta['fingerprint']} != {model_fingerprint(cfg)})"
            )
        arrays = {
            name[:-4]: np.load(io.BytesIO(z.read(name)))
            for name in z.namelist()
            if name.endswith(".npy")
        }
    n_past = int(meta["n_past"])
    if n_past > cache.max_seq:
        raise ValueError(f"state n_past {n_past} exceeds cache max_seq {cache.max_seq}")

    def put(big, small):
        return big.at[:, slot, :n_past].set(jnp.asarray(small, big.dtype))

    k = put(cache.k, arrays["k"])
    v = put(cache.v, arrays["v"])
    ks = vs = None
    if cache.quantized:
        if "k_scale" not in arrays:
            raise ValueError("quantized cache but state has no scales")
        ks = put(cache.k_scale, arrays["k_scale"])
        vs = put(cache.v_scale, arrays["v_scale"])
    new_cache = KVCache(k=k, v=v, k_scale=ks, v_scale=vs)

    new_sstate = sstate
    if sstate is not None and "s_key" in arrays:
        st1 = SamplerState(
            key=jnp.asarray(arrays["s_key"]),
            recent=jnp.asarray(arrays["s_recent"]),
            recent_pos=jnp.asarray(arrays["s_recent_pos"]),
            mirostat_mu=jnp.asarray(arrays["s_mirostat_mu"]),
        )
        if _is_batched(sstate):
            new_sstate = jax.tree.map(lambda big, small: big.at[slot].set(small), sstate, st1)
        else:
            new_sstate = st1
    return new_cache, n_past, meta["tokens"], new_sstate


def _is_batched(st: SamplerState) -> bool:
    return st.recent.ndim > 1
