"""Qwen2-VL vision tower + M-RoPE multimodal pipeline.

The TPU-native analogue of the reference's qwen2vl support:
  - vision graph  tools/mtmd/clip.cpp build_qwen2vl (conv3d patch embed,
    2D rotary over the h/w patch grid, pre-norm ViT, 2x2 spatial merger)
  - LLM side      src/models/qwen2vl.cpp (ggml_rope_multi — M-RoPE with
    rope.dimension_sections; position streams per get_rope_index)

mmproj GGUF conventions follow clip.cpp (v.blk.{i}.*, v.post_ln as the
merger's ln_q, mm.0/mm.2 MLP, clip.projector_type "qwen2vl_merger") so
reference-produced mmproj files map onto the same names.

TPU design: the conv3d patch embedding is ONE matmul over flattened
patches; each (t, h, w) grid traces its own static-shaped program; the
ViT stack is a lax.scan over stacked layers.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader


@dataclass
class Qwen2VLVisionConfig:
    n_embd: int  # embed_dim
    n_head: int
    n_ff: int
    n_layer: int
    patch_size: int
    temporal_patch_size: int
    spatial_merge: int
    out_embd: int  # LLM hidden size
    eps: float = 1e-6
    in_channels: int = 3
    # qwen2.5-vl window attention (full attention on fullatt_idx blocks)
    window_size: int = 0
    fullatt_idx: tuple = ()


def load_qwen2vl_mmproj(path: str, dtype=jnp.float32):
    r = GGUFReader(path)
    kv = r.kv

    def g(key, default=None):
        return kv.get(f"clip.vision.{key}", kv.get(f"clip.{key}", default))

    cfg = Qwen2VLVisionConfig(
        n_embd=int(g("embedding_length")),
        n_head=int(g("attention.head_count")),
        n_ff=int(g("feed_forward_length")),
        n_layer=int(g("block_count")),
        patch_size=int(g("patch_size")),
        temporal_patch_size=int(g("temporal_patch_size", 2)),
        spatial_merge=int(g("spatial_merge_size", 2)),
        out_embd=int(g("projection_dim")),
        eps=float(g("attention.layer_norm_epsilon", 1e-6)),
    )

    def t(name):
        x = r.tensors.get(name)
        return None if x is None else jnp.asarray(x.to_f32(), dtype)

    E = cfg.n_embd
    params = {
        # conv3d kernel (E, C*tps*ps*ps) -> one matmul (in, E)
        "patch_w": t("v.patch_embd.weight").reshape(E, -1).T,
        "ln_q_w": t("v.post_ln.weight"),
        "ln_q_b": t("v.post_ln.bias"),
        "mm0_w": t("mm.0.weight").T,
        "mm0_b": t("mm.0.bias"),
        "mm2_w": t("mm.2.weight").T,
        "mm2_b": t("mm.2.bias"),
    }
    per = {}
    for i in range(cfg.n_layer):
        p = f"v.blk.{i}."
        for nm, key, tr in (
            ("ln1.weight", "ln1_w", False), ("ln1.bias", "ln1_b", False),
            ("ln2.weight", "ln2_w", False), ("ln2.bias", "ln2_b", False),
            ("attn_q.weight", "wq", True), ("attn_q.bias", "bq", False),
            ("attn_k.weight", "wk", True), ("attn_k.bias", "bk", False),
            ("attn_v.weight", "wv", True), ("attn_v.bias", "bv", False),
            ("attn_out.weight", "wo", True), ("attn_out.bias", "bo", False),
            ("ffn_up.weight", "w_up", True), ("ffn_up.bias", "b_up", False),
            ("ffn_down.weight", "w_down", True),
            ("ffn_down.bias", "b_down", False),
        ):
            x = t(p + nm)
            per.setdefault(key, []).append(x.T if tr else x)
    params["layers"] = {k: jnp.stack(v) for k, v in per.items()}
    r.close()
    return cfg, params


def vision_pos_ids(grid: tuple[int, int, int], merge: int) -> np.ndarray:
    """(h, w) rotary position ids per patch, in the processor's
    merge-window patch order (Qwen2VisionTransformer.rot_pos_emb)."""
    t, h, w = grid
    hp = np.arange(h)[:, None].repeat(w, 1)
    hp = hp.reshape(h // merge, merge, w // merge, merge)
    hp = hp.transpose(0, 2, 1, 3).reshape(-1)
    wp = np.arange(w)[None, :].repeat(h, 0)
    wp = wp.reshape(h // merge, merge, w // merge, merge)
    wp = wp.transpose(0, 2, 1, 3).reshape(-1)
    return np.tile(np.stack([hp, wp], -1), (t, 1))  # (t*h*w, 2)


def make_qwen2vl_vision_forward(cfg: Qwen2VLVisionConfig,
                                grid: tuple[int, int, int]):
    """Returns fn(params, patches (N, C*tps*ps*ps)) -> (N/merge^2, out_embd)
    for a fixed (t, h, w) patch grid."""
    E, H = cfg.n_embd, cfg.n_head
    D = E // H
    m = cfg.spatial_merge
    pos = vision_pos_ids(grid, m)  # (N, 2)
    half = D // 2
    inv = 10000.0 ** (-np.arange(0, half // 2, dtype=np.float32) / (half // 2))
    freqs = np.concatenate([pos[:, 0:1] * inv[None], pos[:, 1:2] * inv[None]],
                           -1)  # (N, half)
    emb = np.concatenate([freqs, freqs], -1)  # (N, D)
    cos = jnp.asarray(np.cos(emb), jnp.float32)
    sin = jnp.asarray(np.sin(emb), jnp.float32)

    def rot(x):  # (N, H, D) neox rotate_half with full-dim cos/sin
        xf = x.astype(jnp.float32)
        x1, x2 = xf[..., : D // 2], xf[..., D // 2:]
        rh = jnp.concatenate([-x2, x1], -1)
        return (xf * cos[:, None, :] + rh * sin[:, None, :]).astype(x.dtype)

    def ln(x, w, b):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        xc = xf - mu
        v = (xc * xc).mean(-1, keepdims=True)
        return (xc * jax.lax.rsqrt(v + cfg.eps) * w + b).astype(x.dtype)

    def quick_gelu(x):
        xf = x.astype(jnp.float32)
        return (xf * jax.nn.sigmoid(1.702 * xf)).astype(x.dtype)

    def fwd(params, patches):
        x = patches @ params["patch_w"]  # (N, E)

        def body(x, lp):
            h = ln(x, lp["ln1_w"], lp["ln1_b"])
            N = h.shape[0]
            q = rot((h @ lp["wq"] + lp["bq"]).reshape(N, H, D))
            k = rot((h @ lp["wk"] + lp["bk"]).reshape(N, H, D))
            v = (h @ lp["wv"] + lp["bv"]).reshape(N, H, D)
            scores = jnp.einsum("nhd,mhd->hnm", q, k,
                                preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(scores * D ** -0.5, -1).astype(v.dtype)
            o = jnp.einsum("hnm,mhd->nhd", probs, v).reshape(N, E)
            x = x + (o @ lp["wo"] + lp["bo"])
            h2 = ln(x, lp["ln2_w"], lp["ln2_b"])
            y = quick_gelu(h2 @ lp["w_up"] + lp["b_up"]) @ lp["w_down"] \
                + lp["b_down"]
            return x + y, None

        x, _ = jax.lax.scan(body, x, params["layers"])
        x = ln(x, params["ln_q_w"], params["ln_q_b"])
        x = x.reshape(-1, m * m * E)  # 2x2 spatial merge
        x = jax.nn.gelu(
            (x @ params["mm0_w"] + params["mm0_b"]).astype(jnp.float32),
            approximate=False).astype(x.dtype)
        return x @ params["mm2_w"] + params["mm2_b"]

    return fwd


def mrope_positions(n_before: int, grid: tuple[int, int, int], merge: int,
                    n_after: int) -> tuple[np.ndarray, int]:
    """3-stream position ids for [text, image, text] per get_rope_index
    (modeling_qwen2_vl.Qwen2VLModel.get_rope_index): text streams advance
    together; image patches spread over (t, h, w); following text resumes
    at max+1. Returns ((3, T), next_pos)."""
    t, h, w = grid
    hm, wm = h // merge, w // merge
    cols = []
    for i in range(n_before):
        cols.append((i, i, i))
    st = n_before
    for ti in range(t):
        for r in range(hm):
            for c in range(wm):
                cols.append((st + ti, st + r, st + c))
    st = st + max(t, hm, wm)
    for i in range(n_after):
        cols.append((st + i, st + i, st + i))
    arr = np.asarray(cols, np.int32).T  # (3, T)
    return arr, st + n_after


class Qwen2VLPipeline:
    """Multimodal generation for qwen2vl (the mtmd-cli analogue): encode
    the image grid, splice merged patch embeddings at the marker, prefill
    with M-RoPE positions, decode with all streams equal."""

    def __init__(self, model, mmproj_path: str, max_seq: int = 2048,
                 dtype=jnp.float32):
        from ..models.transformer import make_forward

        self.model = model
        self.cfg = model.config
        assert self.cfg.mrope_sections, "qwen2vl needs rope.dimension_sections"
        self.vcfg, self.vparams = load_qwen2vl_mmproj(mmproj_path, dtype)
        self.embed_fwd = jax.jit(make_forward(self.cfg, inputs_embeds=True))
        self.tok_fwd = jax.jit(make_forward(self.cfg))
        self.max_seq = max_seq
        self.dtype = dtype

    def encode_image(self, patches: np.ndarray,
                     grid: tuple[int, int, int]) -> np.ndarray:
        fwd = jax.jit(make_qwen2vl_vision_forward(self.vcfg, grid))
        return np.asarray(fwd(self.vparams, jnp.asarray(patches)))

    def generate(self, ids_before: list[int], patches: np.ndarray,
                 grid: tuple[int, int, int], ids_after: list[int],
                 max_new_tokens: int = 16, eos_id: int | None = None):
        from ..runtime.kv_cache import init_cache

        img = self.encode_image(patches, grid)
        tok_embd = np.asarray(self.model.params["tok_embd"], np.float32)
        embeds = np.concatenate([
            tok_embd[np.asarray(ids_before, np.int32)], img,
            tok_embd[np.asarray(ids_after, np.int32)]], 0)
        T = embeds.shape[0]
        pos3, nxt = mrope_positions(len(ids_before), grid,
                                    self.vcfg.spatial_merge, len(ids_after))
        cache = init_cache(self.cfg, 1, self.max_seq, self.dtype)
        slot = jnp.arange(T, dtype=jnp.int32)[None]
        logits, cache = self.embed_fwd(
            self.model.params, jnp.asarray(embeds, self.dtype)[None], slot,
            cache, mrope_pos=jnp.asarray(pos3)[:, None, :])
        tok = int(jnp.argmax(logits[0, -1]))
        out = [tok]
        for step in range(max_new_tokens - 1):
            if eos_id is not None and tok == eos_id:
                break
            p = nxt + step
            logits, cache = self.tok_fwd(
                self.model.params, jnp.asarray([[tok]], jnp.int32),
                jnp.full((1, 1), T + step, jnp.int32), cache,
                mrope_pos=jnp.full((3, 1, 1), p, jnp.int32))
            tok = int(jnp.argmax(logits[0, -1]))
            out.append(tok)
        return out


# ---------------------------------------------------------------------------
# Qwen2.5-VL vision tower (ref tools/mtmd/clip.cpp PROJECTOR_TYPE_QWEN25VL):
# RMS-normed blocks, gated-silu MLP, WINDOW attention except on the
# fullatt_block_indexes, window-grouped patch reordering undone after the
# merger. The LLM side is the same qwen2vl M-RoPE stack.


def window_order(grid: tuple[int, int, int], merge: int, window: int,
                 patch: int):
    """(perm over merge-units, window id per merge-unit) — the numpy
    equivalent of Qwen2_5_VisionTransformer.get_window_index."""
    t, h, w = grid
    hm, wm = h // merge, w // merge
    vw = window // merge // patch
    idx = np.arange(t * hm * wm).reshape(t, hm, wm)
    pad_h = (-hm) % vw
    pad_w = (-wm) % vw
    ip = np.full((t, hm + pad_h, wm + pad_w), -100, np.int64)
    ip[:, :hm, :wm] = idx
    nh, nw = (hm + pad_h) // vw, (wm + pad_w) // vw
    ip = ip.reshape(t, nh, vw, nw, vw).transpose(0, 1, 3, 2, 4)
    ip = ip.reshape(-1, vw * vw)
    perm = []
    win_id = []
    for wi, row in enumerate(ip):
        for v in row:
            if v != -100:
                perm.append(v)
                win_id.append(wi)
    return np.asarray(perm, np.int64), np.asarray(win_id, np.int64)


def make_qwen25vl_vision_forward(cfg: Qwen2VLVisionConfig,
                                 grid: tuple[int, int, int]):
    """fn(params, patches (N, C*tps*ps*ps)) -> (N/merge^2, out_embd)."""
    E, H = cfg.n_embd, cfg.n_head
    D = E // H
    m = cfg.spatial_merge
    mu = m * m
    pos = vision_pos_ids(grid, m)  # (N, 2) in merge-window raster order
    perm_u, win_u = window_order(grid, m, cfg.window_size, cfg.patch_size)
    N = pos.shape[0]
    # expand merge-unit perm to patch indices
    perm = (perm_u[:, None] * mu + np.arange(mu)[None]).reshape(-1)
    win = np.repeat(win_u, mu)  # window id per (reordered) patch
    inv = np.argsort(perm_u)
    half = D // 2
    inv_f = 10000.0 ** (-np.arange(0, half // 2, dtype=np.float32)
                        / (half // 2))
    freqs = np.concatenate([pos[:, 0:1] * inv_f[None],
                            pos[:, 1:2] * inv_f[None]], -1)[perm]
    emb = np.concatenate([freqs, freqs], -1)
    cos = jnp.asarray(np.cos(emb), jnp.float32)
    sin = jnp.asarray(np.sin(emb), jnp.float32)
    win_mask = jnp.asarray(win[:, None] == win[None, :])  # (N, N)
    full_mask = jnp.ones((N, N), bool)
    fullatt = set(cfg.fullatt_idx)

    def rot(x):
        xf = x.astype(jnp.float32)
        x1, x2 = xf[..., : D // 2], xf[..., D // 2:]
        rh = jnp.concatenate([-x2, x1], -1)
        return (xf * cos[:, None, :] + rh * sin[:, None, :]).astype(x.dtype)

    def rms(x, w):
        xf = x.astype(jnp.float32)
        ms = jnp.mean(xf * xf, -1, keepdims=True)
        return ((xf * jax.lax.rsqrt(ms + cfg.eps)) * w).astype(x.dtype)

    def fwd(params, patches):
        x = patches @ params["patch_w"]  # (N, E) raster order
        x = x[jnp.asarray(perm)]  # window-grouped order

        def block(x, lp, mask):
            h = rms(x, lp["ln1_w"])
            q = rot((h @ lp["wq"] + lp["bq"]).reshape(N, H, D))
            k = rot((h @ lp["wk"] + lp["bk"]).reshape(N, H, D))
            v = (h @ lp["wv"] + lp["bv"]).reshape(N, H, D)
            scores = jnp.einsum("nhd,mhd->hnm", q, k,
                                preferred_element_type=jnp.float32)
            scores = jnp.where(mask[None], scores * D ** -0.5, -1e30)
            probs = jax.nn.softmax(scores, -1).astype(v.dtype)
            o = jnp.einsum("hnm,mhd->nhd", probs, v).reshape(N, E)
            x = x + (o @ lp["wo"] + lp["bo"])
            h2 = rms(x, lp["ln2_w"])
            gate = jax.nn.silu(
                (h2 @ lp["w_gate"] + lp["b_gate"]).astype(jnp.float32)
            ).astype(h2.dtype)
            y = (gate * (h2 @ lp["w_up"] + lp["b_up"])) @ lp["w_down"] \
                + lp["b_down"]
            return x + y

        for i, lp in enumerate(params["layers"]):
            x = block(x, lp, full_mask if i in fullatt else win_mask)
        x = rms(x, params["ln_q_w"])
        x = x.reshape(-1, mu * E)
        x = jax.nn.gelu(
            (x @ params["mm0_w"] + params["mm0_b"]).astype(jnp.float32),
            approximate=False).astype(x.dtype)
        x = x @ params["mm2_w"] + params["mm2_b"]
        return x[jnp.asarray(inv)]  # undo the window reorder

    return fwd


def load_qwen25vl_mmproj(path: str, dtype=jnp.float32):
    r = GGUFReader(path)
    kv = r.kv

    def g(key, default=None):
        return kv.get(f"clip.vision.{key}", kv.get(f"clip.{key}", default))

    cfg = Qwen2VLVisionConfig(
        n_embd=int(g("embedding_length")),
        n_head=int(g("attention.head_count")),
        n_ff=int(g("feed_forward_length")),
        n_layer=int(g("block_count")),
        patch_size=int(g("patch_size")),
        temporal_patch_size=int(g("temporal_patch_size", 2)),
        spatial_merge=int(g("spatial_merge_size", 2)),
        out_embd=int(g("projection_dim")),
        eps=float(g("attention.layer_norm_epsilon", 1e-6)),
    )
    cfg.window_size = int(g("window_size", 112))
    cfg.fullatt_idx = tuple(
        int(x) for x in (g("fullatt_block_indexes")
                         if g("fullatt_block_indexes") is not None else ()))

    def t(name):
        x = r.tensors.get(name)
        return None if x is None else jnp.asarray(x.to_f32(), dtype)

    E = cfg.n_embd
    params = {
        "patch_w": t("v.patch_embd.weight").reshape(E, -1).T,
        "ln_q_w": t("v.post_ln.weight"),
        "mm0_w": t("mm.0.weight").T,
        "mm0_b": t("mm.0.bias"),
        "mm2_w": t("mm.2.weight").T,
        "mm2_b": t("mm.2.bias"),
    }
    layers = []
    for i in range(cfg.n_layer):
        p = f"v.blk.{i}."
        lp = {}
        for nm, key, tr in (
            ("ln1.weight", "ln1_w", False), ("ln2.weight", "ln2_w", False),
            ("attn_q.weight", "wq", True), ("attn_q.bias", "bq", False),
            ("attn_k.weight", "wk", True), ("attn_k.bias", "bk", False),
            ("attn_v.weight", "wv", True), ("attn_v.bias", "bv", False),
            ("attn_out.weight", "wo", True), ("attn_out.bias", "bo", False),
            ("ffn_gate.weight", "w_gate", True),
            ("ffn_gate.bias", "b_gate", False),
            ("ffn_up.weight", "w_up", True), ("ffn_up.bias", "b_up", False),
            ("ffn_down.weight", "w_down", True),
            ("ffn_down.bias", "b_down", False),
        ):
            x = t(p + nm)
            lp[key] = x.T if tr else x
        layers.append(lp)
    params["layers"] = layers
    r.close()
    return cfg, params
