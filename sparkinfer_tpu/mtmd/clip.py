"""CLIP/SigLIP vision encoder + multimodal projector — the TPU-native
analogue of tools/mtmd/clip.cpp (the reference's 4.7k-LoC vision stack).

Reads the reference's mmproj GGUF convention (clip.cpp tensor names:
v.patch_embd.weight, v.class_embd, v.position_embd.weight,
v.blk.{i}.attn_{q,k,v,out}/ln1/ln2/ffn_{up,down}, v.pre_ln/v.post_ln,
mm.{0,2}.{weight,bias}; KV keys clip.vision.* / clip.projector_type) so
mmproj files produced for llama.cpp load directly.

TPU-first design: the patch conv is a single MXU matmul over unfolded
patches; the ViT stack is one lax.scan over stacked layer params (same
trick as the LLM transformer); everything is static-shaped
(n_patches fixed by image_size/patch_size).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader


@dataclass
class ClipConfig:
    image_size: int
    patch_size: int
    n_embd: int
    n_head: int
    n_ff: int
    n_layer: int
    eps: float
    proj_type: str  # "mlp" (llava) | "linear"
    use_gelu: bool  # False -> quick_gelu (openai CLIP)
    has_class_embd: bool
    image_mean: tuple[float, float, float]
    image_std: tuple[float, float, float]

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def load_mmproj(path: str, dtype=jnp.float32):
    """mmproj GGUF -> (ClipConfig, params dict)."""
    r = GGUFReader(path)
    kv = r.kv

    def g(key, default=None):
        return kv.get(f"clip.vision.{key}", kv.get(f"clip.{key}", default))

    cfg = ClipConfig(
        image_size=int(g("image_size")),
        patch_size=int(g("patch_size")),
        n_embd=int(g("embedding_length")),
        n_head=int(g("attention.head_count")),
        n_ff=int(g("feed_forward_length")),
        n_layer=int(g("block_count")),
        eps=float(g("attention.layer_norm_epsilon", 1e-5)),
        proj_type=str(kv.get("clip.projector_type", "mlp")),
        use_gelu=bool(kv.get("clip.use_gelu", False)),
        has_class_embd="v.class_embd" in r.tensors,
        image_mean=tuple(float(x) for x in g("image_mean", (0.48145466, 0.4578275, 0.40821073))),
        image_std=tuple(float(x) for x in g("image_std", (0.26862954, 0.26130258, 0.27577711))),
    )

    def t(name):
        x = r.tensors.get(name)
        return None if x is None else jnp.asarray(x.to_f32(), dtype)

    E = cfg.n_embd
    P = cfg.patch_size
    pe = t("v.patch_embd.weight")  # (E, 3, P, P) conv kernel
    params = {
        # unfold the conv to one matmul: (3*P*P, E)
        "patch_w": pe.reshape(E, 3 * P * P).T,
        "patch_b": t("v.patch_embd.bias"),
        "class_embd": t("v.class_embd"),
        "pos_embd": t("v.position_embd.weight"),  # (n_pos, E)
        "pre_ln_w": t("v.pre_ln.weight"),
        "pre_ln_b": t("v.pre_ln.bias"),
        "post_ln_w": t("v.post_ln.weight"),
        "post_ln_b": t("v.post_ln.bias"),
    }
    per: dict[str, list] = {}
    names = {
        "attn_q": "q", "attn_k": "k", "attn_v": "v", "attn_out": "o",
        "ffn_up": "up", "ffn_down": "down",
    }
    for i in range(cfg.n_layer):
        p = f"v.blk.{i}."
        for gg, short in names.items():
            w = r.tensors[p + gg + ".weight"].to_f32()
            per.setdefault(short + "_w", []).append(np.ascontiguousarray(w.T))
            b = r.tensors.get(p + gg + ".bias")
            if b is not None:
                per.setdefault(short + "_b", []).append(b.to_f32())
        for ln in ("ln1", "ln2"):
            per.setdefault(ln + "_w", []).append(r.tensors[p + ln + ".weight"].to_f32())
            per.setdefault(ln + "_b", []).append(r.tensors[p + ln + ".bias"].to_f32())
    params["layers"] = {k: jnp.asarray(np.stack(v), dtype) for k, v in per.items()}
    for mm in ("mm.0", "mm.2", "mm.projection"):
        w = r.tensors.get(mm + ".weight")
        if w is not None:
            params[mm + ".w"] = jnp.asarray(np.ascontiguousarray(w.to_f32().T), dtype)
            b = r.tensors.get(mm + ".bias")
            if b is not None:
                params[mm + ".b"] = jnp.asarray(b.to_f32(), dtype)
    r.close()
    return cfg, params


def _ln(x, w, b, eps):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.mean(jnp.square(x - m), -1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * w + b


def make_vision_forward(cfg: ClipConfig):
    """fwd(params, pixels (B, 3, S, S) normalized) -> (B, n_patches, E_llm)
    projected image embeddings ready to splice into the LLM sequence."""
    E, P, H = cfg.n_embd, cfg.patch_size, cfg.n_head
    D = E // H
    eps = cfg.eps

    def act(x):
        if cfg.use_gelu:
            return jax.nn.gelu(x, approximate=True)
        return x * jax.nn.sigmoid(1.702 * x)  # quick_gelu (openai CLIP)

    def fwd(params, pixels):
        B, C, S, _ = pixels.shape
        n = S // P
        # unfold patches -> (B, n*n, 3*P*P), one matmul onto the MXU
        px = pixels.reshape(B, C, n, P, n, P)
        px = px.transpose(0, 2, 4, 1, 3, 5).reshape(B, n * n, C * P * P)
        x = px @ params["patch_w"]
        if params.get("patch_b") is not None:
            x = x + params["patch_b"]
        if cfg.has_class_embd:
            cls = jnp.broadcast_to(params["class_embd"], (B, 1, E))
            x = jnp.concatenate([cls, x], axis=1)
        x = x + params["pos_embd"][None, : x.shape[1]]
        if params.get("pre_ln_w") is not None:
            x = _ln(x, params["pre_ln_w"], params["pre_ln_b"], eps)

        def block(x, lp):
            h = _ln(x, lp["ln1_w"], lp["ln1_b"], eps)
            T = h.shape[1]
            q = (h @ lp["q_w"] + lp["q_b"]).reshape(B, T, H, D)
            k = (h @ lp["k_w"] + lp["k_b"]).reshape(B, T, H, D)
            v = (h @ lp["v_w"] + lp["v_b"]).reshape(B, T, H, D)
            s = jnp.einsum("bthd,bshd->bhts", q, k,
                           preferred_element_type=jnp.float32) * (D ** -0.5)
            p = jax.nn.softmax(s, -1).astype(h.dtype)
            o = jnp.einsum("bhts,bshd->bthd", p, v).reshape(B, T, E)
            x = x + (o @ lp["o_w"] + lp["o_b"])
            h2 = _ln(x, lp["ln2_w"], lp["ln2_b"], eps)
            y = act(h2 @ lp["up_w"] + lp["up_b"])
            x = x + (y @ lp["down_w"] + lp["down_b"])
            return x, ()

        x, _ = jax.lax.scan(block, x, params["layers"])
        if cfg.has_class_embd:
            x = x[:, 1:]  # llava uses patch features only (vision_feature
            # _select_strategy "default" drops the class token)
        if "mm.0.w" in params:  # llava 2-layer MLP projector
            x = x @ params["mm.0.w"]
            if "mm.0.b" in params:
                x = x + params["mm.0.b"]
            x = jax.nn.gelu(x, approximate=False)
            x = x @ params["mm.2.w"]
            if "mm.2.b" in params:
                x = x + params["mm.2.b"]
        elif "mm.projection.w" in params:
            x = x @ params["mm.projection.w"]
            if "mm.projection.b" in params:
                x = x + params["mm.projection.b"]
        return x

    return fwd


def preprocess_image(img, cfg: ClipConfig) -> np.ndarray:
    """PIL image | (H, W, 3) uint8 array -> (3, S, S) f32 normalized."""
    from PIL import Image

    if isinstance(img, np.ndarray):
        img = Image.fromarray(img)
    img = img.convert("RGB").resize(
        (cfg.image_size, cfg.image_size), Image.BICUBIC)
    a = np.asarray(img, np.float32) / 255.0  # (S, S, 3)
    a = (a - np.asarray(cfg.image_mean)) / np.asarray(cfg.image_std)
    return np.ascontiguousarray(a.transpose(2, 0, 1)).astype(np.float32)
