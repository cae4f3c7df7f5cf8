"""Qwen3-VL vision tower + DeepStack multimodal pipeline.

The analogue of the reference's qwen3vl support (tools/mtmd/clip.cpp
PROJECTOR_TYPE_QWEN3VL; src/models/qwen3vl.cpp):
  - ViT with a bias'd conv3d patch embed, BILINEARLY-INTERPOLATED learned
    position table (fast_pos_embed_interpolate), 2D rotary, LayerNorm
    pre-norm blocks, full attention.
  - A spatial merger for the final features PLUS one "deepstack" merger
    per deepstack_visual_indexes entry, tapping intermediate block
    outputs (Qwen3VLVisionPatchMerger, use_postshuffle_norm for the taps).
  - The LLM adds deepstack feature k to the hidden states AT THE IMAGE
    POSITIONS after decoder layer k (Qwen3VLTextModel._deepstack_process)
    and ropes with INTERLEAVED M-RoPE (ops/rope.py apply_mrope).

TPU design: pos-embed interpolation, patch reordering and window maths
are static numpy per (t, h, w) grid; the deepstack injections ride the
layer scan as per-layer xs (zeros past the tapped layers) with a static
target slice — no scatter, one fused dynamic-update per layer.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from .qwen2vl import mrope_positions, vision_pos_ids


@dataclass
class Qwen3VLVisionConfig:
    n_embd: int
    n_head: int
    n_ff: int
    n_layer: int
    patch_size: int
    temporal_patch_size: int
    spatial_merge: int
    out_embd: int
    n_pos: int  # learned position table size (grid_side^2)
    deepstack_idx: tuple
    eps: float = 1e-6


def _interp_pos_embed(table: np.ndarray, grid, merge: int) -> np.ndarray:
    """Bilinear interpolation of the learned (side^2, E) position table to
    (t*h*w, E), permuted into merge-window order
    (Qwen3VLVisionModel.fast_pos_embed_interpolate)."""
    t, h, w = grid
    side = int(round(np.sqrt(table.shape[0])))
    h_idx = np.linspace(0, side - 1, h)
    w_idx = np.linspace(0, side - 1, w)
    hf = h_idx.astype(np.int32)
    wf = w_idx.astype(np.int32)
    hc = np.clip(hf + 1, None, side - 1)
    wc = np.clip(wf + 1, None, side - 1)
    dh = (h_idx - hf)[:, None]
    dw = (w_idx - wf)[None, :]
    pe = (
        table[(hf[:, None] * side + wf[None, :]).ravel()]
        * ((1 - dh) * (1 - dw)).ravel()[:, None]
        + table[(hf[:, None] * side + wc[None, :]).ravel()]
        * ((1 - dh) * dw).ravel()[:, None]
        + table[(hc[:, None] * side + wf[None, :]).ravel()]
        * (dh * (1 - dw)).ravel()[:, None]
        + table[(hc[:, None] * side + wc[None, :]).ravel()]
        * (dh * dw).ravel()[:, None]
    )  # (h*w, E) raster order
    pe = np.tile(pe, (t, 1)).reshape(t, h // merge, merge, w // merge,
                                     merge, -1)
    pe = pe.transpose(0, 1, 3, 2, 4, 5).reshape(t * h * w, -1)
    return pe.astype(np.float32)


def make_qwen3vl_vision_forward(cfg: Qwen3VLVisionConfig,
                                grid: tuple[int, int, int]):
    """fn(params, patches) -> (merged (N/m^2, out), deepstack (K, N/m^2, out))."""
    E, H = cfg.n_embd, cfg.n_head
    D = E // H
    m = cfg.spatial_merge
    pos = vision_pos_ids(grid, m)
    half = D // 2
    inv = 10000.0 ** (-np.arange(0, half // 2, dtype=np.float32)
                      / (half // 2))
    freqs = np.concatenate([pos[:, 0:1] * inv[None],
                            pos[:, 1:2] * inv[None]], -1)
    emb = np.concatenate([freqs, freqs], -1)
    cos = jnp.asarray(np.cos(emb), jnp.float32)
    sin = jnp.asarray(np.sin(emb), jnp.float32)
    ds_set = set(cfg.deepstack_idx)

    def rot(x):
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

    def gelu(x):
        return jax.nn.gelu(x.astype(jnp.float32),
                           approximate=True).astype(x.dtype)

    def merger(mp, x, postshuffle: bool):
        if postshuffle:
            x = ln(x.reshape(-1, m * m * E), mp["norm_w"], mp["norm_b"])
        else:
            x = ln(x, mp["norm_w"], mp["norm_b"]).reshape(-1, m * m * E)
        x = gelu(x @ mp["fc1_w"] + mp["fc1_b"])
        return x @ mp["fc2_w"] + mp["fc2_b"]

    def fwd(params, patches):
        x = patches @ params["patch_w"] + params["patch_b"]
        x = x + params["pos_embed"].astype(x.dtype)
        N = x.shape[0]

        def block(x, lp):
            h = ln(x, lp["ln1_w"], lp["ln1_b"])
            q = rot((h @ lp["wq"] + lp["bq"]).reshape(N, H, D))
            k = rot((h @ lp["wk"] + lp["bk"]).reshape(N, H, D))
            v = (h @ lp["wv"] + lp["bv"]).reshape(N, H, D)
            scores = jnp.einsum("nhd,mhd->hnm", q, k,
                                preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(scores * D ** -0.5, -1).astype(v.dtype)
            o = jnp.einsum("hnm,mhd->nhd", probs, v).reshape(N, E)
            x = x + (o @ lp["wo"] + lp["bo"])
            h2 = ln(x, lp["ln2_w"], lp["ln2_b"])
            y = gelu(h2 @ lp["w_up"] + lp["b_up"]) @ lp["w_down"] \
                + lp["b_down"]
            return x + y

        ds_out = []
        for i, lp in enumerate(params["layers"]):
            x = block(x, lp)
            if i in ds_set:
                j = cfg.deepstack_idx.index(i)
                ds_out.append(merger(params["deepstack"][j], x,
                                     postshuffle=True))
        merged = merger(params["merger"], x, postshuffle=False)
        return merged, jnp.stack(ds_out) if ds_out else jnp.zeros(
            (0,) + merged.shape)

    return fwd


def load_qwen3vl_mmproj(path: str, dtype=jnp.float32):
    r = GGUFReader(path)
    kv = r.kv

    def g(key, default=None):
        return kv.get(f"clip.vision.{key}", kv.get(f"clip.{key}", default))

    cfg = Qwen3VLVisionConfig(
        n_embd=int(g("embedding_length")),
        n_head=int(g("attention.head_count")),
        n_ff=int(g("feed_forward_length")),
        n_layer=int(g("block_count")),
        patch_size=int(g("patch_size")),
        temporal_patch_size=int(g("temporal_patch_size", 2)),
        spatial_merge=int(g("spatial_merge_size", 2)),
        out_embd=int(g("projection_dim")),
        n_pos=int(g("num_position_embeddings")),
        deepstack_idx=tuple(
            int(x) for x in (g("deepstack_visual_indexes")
                             if g("deepstack_visual_indexes") is not None
                             else ())),
    )

    def t(name):
        x = r.tensors.get(name)
        return None if x is None else jnp.asarray(x.to_f32(), dtype)

    E = cfg.n_embd
    params = {
        "patch_w": t("v.patch_embd.weight").reshape(E, -1).T,
        "patch_b": t("v.patch_embd.bias"),
        "pos_table": np.asarray(t("v.pos_embd.weight"), np.float32),
        "merger": {
            "norm_w": t("mm.norm.weight"), "norm_b": t("mm.norm.bias"),
            "fc1_w": t("mm.0.weight").T, "fc1_b": t("mm.0.bias"),
            "fc2_w": t("mm.2.weight").T, "fc2_b": t("mm.2.bias"),
        },
        "deepstack": [],
    }
    for j in range(len(cfg.deepstack_idx)):
        p = f"ds.{j}."
        params["deepstack"].append({
            "norm_w": t(p + "norm.weight"), "norm_b": t(p + "norm.bias"),
            "fc1_w": t(p + "fc1.weight").T, "fc1_b": t(p + "fc1.bias"),
            "fc2_w": t(p + "fc2.weight").T, "fc2_b": t(p + "fc2.bias"),
        })
    layers = []
    for i in range(cfg.n_layer):
        p = f"v.blk.{i}."
        lp = {}
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
            lp[key] = x.T if tr else x
        layers.append(lp)
    params["layers"] = layers
    r.close()
    return cfg, params


def prepare_vision(cfg: Qwen3VLVisionConfig, params: dict,
                   grid: tuple[int, int, int]):
    """Materialize the grid-dependent interpolated pos embed."""
    p = dict(params)
    p["pos_embed"] = jnp.asarray(
        _interp_pos_embed(params["pos_table"], grid, cfg.spatial_merge))
    return p


class Qwen3VLPipeline:
    """DeepStack multimodal generation: encode the grid, splice merged
    features at the marker, prefill with interleaved M-RoPE AND per-layer
    deepstack injections at the image positions."""

    def __init__(self, model, mmproj_path: str, max_seq: int = 2048,
                 dtype=jnp.float32):
        from ..models.transformer import make_forward

        self.model = model
        self.cfg = model.config
        assert self.cfg.mrope_interleaved
        self.vcfg, self.vparams = load_qwen3vl_mmproj(mmproj_path, dtype)
        self.max_seq = max_seq
        self.dtype = dtype
        self.tok_fwd = jax.jit(make_forward(self.cfg))

    def generate(self, ids_before, patches, grid, ids_after,
                 max_new_tokens: int = 8, eos_id: int | None = None):
        from ..models.transformer import make_forward
        from ..runtime.kv_cache import init_cache

        vp = prepare_vision(self.vcfg, self.vparams, grid)
        vfwd = jax.jit(make_qwen3vl_vision_forward(self.vcfg, grid))
        img, ds = vfwd(vp, jnp.asarray(patches))
        img, ds = np.asarray(img), np.asarray(ds)
        s = len(ids_before)
        e = s + img.shape[0]
        tok_embd = np.asarray(self.model.params["tok_embd"], np.float32)
        embeds = np.concatenate([tok_embd[np.asarray(ids_before)], img,
                                 tok_embd[np.asarray(ids_after)]], 0)
        T = embeds.shape[0]
        pos3, nxt = mrope_positions(s, grid, self.vcfg.spatial_merge,
                                    len(ids_after))
        fwd = jax.jit(make_forward(self.cfg, inputs_embeds=True,
                                   deepstack_slice=(s, e)))
        # per-layer injection xs: zeros past the tapped layers
        L = self.cfg.n_layer
        ds_all = np.zeros((L, img.shape[0], img.shape[1]), np.float32)
        ds_all[: ds.shape[0]] = ds
        cache = init_cache(self.cfg, 1, self.max_seq, self.dtype)
        logits, cache = fwd(
            self.model.params, jnp.asarray(embeds, self.dtype)[None],
            jnp.arange(T, dtype=jnp.int32)[None], cache,
            mrope_pos=jnp.asarray(pos3)[:, None, :],
            deepstack=jnp.asarray(ds_all, self.dtype))
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
