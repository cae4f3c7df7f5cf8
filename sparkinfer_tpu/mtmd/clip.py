"""CLIP/SigLIP/Pixtral vision encoder + multimodal projectors — the
TPU-native analogue of tools/mtmd/clip.cpp (the reference's vision stack).

Reads the reference's mmproj GGUF convention (clip.cpp / clip-impl.h
tensor names: v.patch_embd.weight, v.class_embd, v.position_embd.weight,
v.blk.{i}.attn_{q,k,v,out}/ln1/ln2/ffn_{up,gate,down}, v.pre_ln/v.post_ln,
projector tensors mm.* per family; KV keys clip.vision.* /
clip.projector_type) so mmproj files produced for llama.cpp load directly.

Families (clip.cpp PROJECTOR_TYPE_*):
  mlp     — llava: CLIP ViT (LN, class token, quick_gelu) + 2-layer MLP
            projector mm.0/mm.2 (clip.cpp build_llava).
  gemma3  — SigLIP ViT (LN, no class token, gelu_tanh) + avg-pool
            (kernel = scale_factor) + RMS soft-emb norm +
            mm.input_projection matmul (clip.cpp:558-580).
  pixtral — RMS-norm ViT with 2D RoPE (interleaved h/w frequencies,
            clip.cpp build_rope_2d:2377-2440), gated-silu FFN, no
            position table/class token; projector mm.1/gelu/mm.2 and
            optional [IMG_BREAK] row separator (clip.cpp build_pixtral).
  internvl — LN ViT with cls token and ls1/ls2 layer scales, pixel
            shuffle by scale_factor = 1/downsample_ratio, then the
            mm.model.mlp.{0,1,3} LN+MLP projector (clip.cpp
            build_internvl).

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
    proj_type: str  # "mlp" (llava) | "gemma3" | "pixtral" | "linear"
    use_gelu: bool  # False -> quick_gelu (openai CLIP)
    has_class_embd: bool
    image_mean: tuple[float, float, float]
    image_std: tuple[float, float, float]
    use_silu: bool = False  # pixtral gated-silu FFN
    norm_rms: bool = False  # pixtral RMS norms (vs LayerNorm)
    rope_theta: float = 0.0  # >0: pixtral 2D RoPE (no position table)
    scale_factor: int = 0  # gemma3 pool kernel / pixel-shuffle merge

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def load_mmproj(path: str, dtype=jnp.float32):
    """mmproj GGUF -> (ClipConfig, params dict)."""
    r = GGUFReader(path)
    kv = r.kv

    def g(key, default=None):
        return kv.get(f"clip.vision.{key}", kv.get(f"clip.{key}", default))

    proj = str(kv.get("clip.projector_type", "mlp"))
    cfg = ClipConfig(
        image_size=int(g("image_size")),
        patch_size=int(g("patch_size")),
        n_embd=int(g("embedding_length")),
        n_head=int(g("attention.head_count")),
        n_ff=int(g("feed_forward_length")),
        n_layer=int(g("block_count")),
        eps=float(g("attention.layer_norm_epsilon", 1e-5)),
        proj_type=proj,
        use_gelu=bool(kv.get("clip.use_gelu", False)),
        use_silu=bool(kv.get("clip.use_silu", False)),
        has_class_embd="v.class_embd" in r.tensors,
        image_mean=tuple(float(x) for x in g("image_mean", (0.48145466, 0.4578275, 0.40821073))),
        image_std=tuple(float(x) for x in g("image_std", (0.26862954, 0.26130258, 0.27577711))),
        norm_rms=(proj == "pixtral"),
        # pixtral rope_theta is fixed in the reference (clip.cpp:2808)
        rope_theta=10000.0 if proj == "pixtral" else 0.0,
        scale_factor=int(g("projector.scale_factor",
                           4 if proj == "gemma3" else 0)),
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
        "img_break": t("v.token_embd.img_break"),  # pixtral row separator
    }
    per: dict[str, list] = {}
    names = {
        "attn_q": "q", "attn_k": "k", "attn_v": "v", "attn_out": "o",
        "ffn_up": "up", "ffn_down": "down", "ffn_gate": "gate",
    }
    scalars = ("ls1", "ls2")  # internvl layer-scale vectors (weight only)
    for i in range(cfg.n_layer):
        p = f"v.blk.{i}."
        for gg, short in names.items():
            wt = r.tensors.get(p + gg + ".weight")
            if wt is None:
                continue
            per.setdefault(short + "_w", []).append(
                np.ascontiguousarray(wt.to_f32().T))
            b = r.tensors.get(p + gg + ".bias")
            if b is not None:
                per.setdefault(short + "_b", []).append(b.to_f32())
        for ln in ("ln1", "ln2"):
            per.setdefault(ln + "_w", []).append(r.tensors[p + ln + ".weight"].to_f32())
            b = r.tensors.get(p + ln + ".bias")
            if b is not None:
                per.setdefault(ln + "_b", []).append(b.to_f32())
        for sc in scalars:
            wt = r.tensors.get(p + sc + ".weight")
            if wt is not None:
                per.setdefault(sc + "_w", []).append(wt.to_f32())
    params["layers"] = {k: jnp.asarray(np.stack(v), dtype) for k, v in per.items()}
    for mm in ("mm.0", "mm.1", "mm.2", "mm.projection", "mm.input_projection",
               "mm.model.mlp.0", "mm.model.mlp.1", "mm.model.mlp.3"):
        w = r.tensors.get(mm + ".weight")
        if w is not None:
            wf = w.to_f32()
            if mm != "mm.input_projection":
                wf = wf.T  # nn.Linear (out, in) -> matmul orientation
            # gemma3's input_projection is an (in, out) Parameter applied
            # as x @ W (Gemma3MultiModalProjector) — stored verbatim like
            # the reference converter
            params[mm + ".w"] = jnp.asarray(np.ascontiguousarray(wf), dtype)
            b = r.tensors.get(mm + ".bias")
            if b is not None:
                params[mm + ".b"] = jnp.asarray(b.to_f32(), dtype)
    sn = r.tensors.get("mm.soft_emb_norm.weight")
    if sn is not None:
        # stored +1-corrected like the reference converter (Gemma3RMSNorm)
        params["soft_emb_norm.w"] = jnp.asarray(sn.to_f32(), dtype)
    r.close()
    return cfg, params


def _ln(x, w, b, eps):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.mean(jnp.square(x - m), -1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * w + b


def _rms(x, w, eps):
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), -1, keepdims=True) + eps) * w


def _rope_2d_half(x, pos, base, scale):
    """ggml mode-0 rope on adjacent pairs of a (B, T, H, Dh) half, with
    per-pair theta = pos * (base^(-2i/Dh)) * scale (clip.cpp
    build_rope_2d: the odd-frequency shift rides in `scale`)."""
    B, T, H, Dh = x.shape
    inv = base ** (-2.0 * jnp.arange(Dh // 2, dtype=jnp.float32) / Dh) * scale
    th = pos[:, None].astype(jnp.float32) * inv[None, :]  # (T, Dh//2)
    cos = jnp.cos(th)[None, :, None, :]
    sin = jnp.sin(th)[None, :, None, :]
    xe = x[..., 0::2]
    xo = x[..., 1::2]
    ye = xe * cos - xo * sin
    yo = xe * sin + xo * cos
    return jnp.stack([ye, yo], axis=-1).reshape(B, T, H, Dh)


def make_vision_forward(cfg: ClipConfig):
    """fwd(params, pixels (B, 3, S, S) normalized) -> (B, n_tokens, E_llm)
    projected image embeddings ready to splice into the LLM sequence."""
    E, P, H = cfg.n_embd, cfg.patch_size, cfg.n_head
    D = E // H
    eps = cfg.eps

    def act(x):
        if cfg.use_gelu:
            return jax.nn.gelu(x, approximate=True)
        return x * jax.nn.sigmoid(1.702 * x)  # quick_gelu (openai CLIP)

    def norm(x, w, b):
        if cfg.norm_rms:
            return _rms(x, w, eps)
        return _ln(x, w, b, eps)

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
        if params.get("pos_embd") is not None:
            x = x + params["pos_embd"][None, : x.shape[1]]
        if params.get("pre_ln_w") is not None:
            x = norm(x, params["pre_ln_w"], params.get("pre_ln_b"))
        if cfg.rope_theta > 0:
            # patch (r, c) row-major: first half of head dims rides the
            # row position (even frequencies), second half the column
            # (odd), exactly clip.cpp build_rope_2d with interleave_freq
            grid = jnp.arange(n * n, dtype=jnp.int32)
            pos_h, pos_w = grid // n, grid % n
            odd_scale = cfg.rope_theta ** (-2.0 / D)
        else:
            pos_h = pos_w = odd_scale = None

        def block(x, lp):
            h = norm(x, lp["ln1_w"], lp.get("ln1_b"))
            T = h.shape[1]

            def proj(key):
                y = h @ lp[key + "_w"]
                if key + "_b" in lp:
                    y = y + lp[key + "_b"]
                return y.reshape(B, T, H, D)

            q, k, v = proj("q"), proj("k"), proj("v")
            if cfg.rope_theta > 0:
                Dh = D // 2
                q = jnp.concatenate([
                    _rope_2d_half(q[..., :Dh], pos_h, cfg.rope_theta, 1.0),
                    _rope_2d_half(q[..., Dh:], pos_w, cfg.rope_theta,
                                  odd_scale)], axis=-1)
                k = jnp.concatenate([
                    _rope_2d_half(k[..., :Dh], pos_h, cfg.rope_theta, 1.0),
                    _rope_2d_half(k[..., Dh:], pos_w, cfg.rope_theta,
                                  odd_scale)], axis=-1)
            s = jnp.einsum("bthd,bshd->bhts", q, k,
                           preferred_element_type=jnp.float32) * (D ** -0.5)
            p = jax.nn.softmax(s, -1).astype(h.dtype)
            o = jnp.einsum("bhts,bshd->bthd", p, v).reshape(B, T, E)
            o = o @ lp["o_w"]
            if "o_b" in lp:
                o = o + lp["o_b"]
            if "ls1_w" in lp:  # internvl layer scale
                o = o * lp["ls1_w"]
            x = x + o
            h2 = norm(x, lp["ln2_w"], lp.get("ln2_b"))
            if "gate_w" in lp:  # pixtral gated FFN: act(gate) * up
                g = h2 @ lp["gate_w"]
                ga = jax.nn.silu(g) if cfg.use_silu else jax.nn.gelu(
                    g, approximate=False)
                y = ga * (h2 @ lp["up_w"])
            else:
                y = h2 @ lp["up_w"]
                if "up_b" in lp:
                    y = y + lp["up_b"]
                y = act(y)
            y = y @ lp["down_w"]
            if "down_b" in lp:
                y = y + lp["down_b"]
            if "ls2_w" in lp:
                y = y * lp["ls2_w"]
            x = x + y
            return x, ()

        x, _ = jax.lax.scan(block, x, params["layers"])
        # llava's vision_feature_layer=-1 takes the LAST ENCODER LAYER
        # output, i.e. before post_layernorm — only gemma3 (SigLIP
        # last_hidden_state) runs the post norm
        if params.get("post_ln_w") is not None and cfg.proj_type == "gemma3":
            x = norm(x, params["post_ln_w"], params.get("post_ln_b"))
        if cfg.has_class_embd:
            x = x[:, 1:]  # llava uses patch features only (vision_feature
            # _select_strategy "default" drops the class token)

        if cfg.proj_type == "gemma3":
            # avg-pool the n x n patch grid down by scale_factor, RMS
            # soft-emb norm (+1-corrected weight), then the projection
            # matmul (clip.cpp:558-580 / Gemma3MultiModalProjector)
            k = cfg.scale_factor or 1
            t = n // k
            xg = x.reshape(B, t, k, t, k, E).mean(axis=(2, 4)).reshape(B, t * t, E)
            xg = _rms(xg, params["soft_emb_norm.w"], eps)
            return xg @ params["mm.input_projection.w"]
        if cfg.proj_type == "internvl":
            # pixel shuffle (InternVLModel.pixel_shuffle order) then the
            # mlp1 projector: LN -> linear -> gelu -> linear
            # (clip.cpp build_internvl + TN_MVLM_PROJ_MLP 0/1/3)
            k = cfg.scale_factor or 2
            sf = 1.0 / k
            xg = x.reshape(B, n, n, E)
            xg = xg.reshape(B, n, n // k, E * k)
            xg = xg.transpose(0, 2, 1, 3)
            xg = xg.reshape(B, n // k, n // k, E * k * k)
            xg = xg.transpose(0, 2, 1, 3)
            xg = xg.reshape(B, (n // k) * (n // k), E * k * k)
            xg = _ln(xg, params["mm.model.mlp.0.w"], params["mm.model.mlp.0.b"],
                     1e-5)
            xg = xg @ params["mm.model.mlp.1.w"] + params["mm.model.mlp.1.b"]
            xg = jax.nn.gelu(xg, approximate=False)
            return xg @ params["mm.model.mlp.3.w"] + params["mm.model.mlp.3.b"]
        if cfg.proj_type == "pixtral":
            y = x @ params["mm.1.w"]
            if "mm.1.b" in params:
                y = y + params["mm.1.b"]
            y = jax.nn.gelu(y, approximate=False)
            y = y @ params["mm.2.w"]
            if "mm.2.b" in params:
                y = y + params["mm.2.b"]
            return y
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


def append_img_break(feats: np.ndarray, cfg: ClipConfig,
                     img_break: np.ndarray) -> np.ndarray:
    """Pixtral sequence assembly: append the [IMG_BREAK] embedding after
    every patch row except the last (clip.cpp build_pixtral tail)."""
    n = cfg.image_size // cfg.patch_size
    rows = feats.reshape(n, n, -1)
    out = []
    for r in range(n):
        out.append(rows[r])
        if r < n - 1:
            out.append(img_break[None, :])
    return np.concatenate(out, 0)


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
