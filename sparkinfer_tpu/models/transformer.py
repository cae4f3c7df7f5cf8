"""Generic transformer forward pass, driven by ArchTraits.

One lax.scan-over-stacked-layers forward replaces the reference's 100
per-arch graph builders (src/models/*.cpp) + llm_graph_context helpers
(src/llama-graph.cpp build_ffn/build_attn): the arch differences that
matter for the supported families are all expressible as traits
(norm/activation/rope/parallel-blocks/biases/positional embeddings).

The FFN is pluggable: `ffn_fn(lp, x) -> y` lets the sparse predictor-gated
path (sparse/ffn.py, the analogue of build_sparse_ffn
src/llama-graph.cpp:896-1142) replace the dense FFN without touching
attention or the scan structure.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.activations import act_fn
from ..ops.norms import layer_norm, rms_norm
from ..ops.quant_matmul import quant_linear as mm
from ..ops.rope import RopeParams, apply_rope
from ..runtime.kv_cache import KVCache, read_layer, write_layer
from .config import ModelConfig

NEG_INF = -1e30


def rope_params(cfg: ModelConfig) -> RopeParams:
    yarn_ext = cfg.yarn_ext_factor
    if yarn_ext < 0.0:  # auto (ref common.cpp: -1 -> from scaling type)
        yarn_ext = (1.0 if cfg.rope_scaling_type == "yarn"
                    and cfg.rope_orig_ctx else 0.0)
    return RopeParams(
        dim=cfg.rope_dim or cfg.head_dim,
        mode=cfg.traits.rope_mode,
        freq_base=cfg.rope_freq_base,
        freq_scale=cfg.rope_scale,
        yarn_orig_ctx=cfg.rope_orig_ctx,
        yarn_ext_factor=yarn_ext,
        yarn_attn_factor=cfg.yarn_attn_factor,
        yarn_beta_fast=cfg.yarn_beta_fast,
        yarn_beta_slow=cfg.yarn_beta_slow,
    )


def _norm(x, w, b, kind: str, eps: float):
    if kind == "rms":
        return rms_norm(x, w, eps)
    return layer_norm(x, w, b, eps)


def alibi_slopes(n_head: int) -> list[float]:
    """Standard ALiBi per-head slopes (bloom/mpt; ref ggml soft_max_ext
    max_bias path: m0 = 2^(-8/n), interleaved extras for non-powers)."""
    import math

    n = 2 ** math.floor(math.log2(n_head))
    m0 = 2.0 ** (-8.0 / n)
    slopes = [m0 ** (i + 1) for i in range(n)]
    if n < n_head:
        m1 = 2.0 ** (-4.0 / n)
        slopes += [m1 ** (2 * i + 1) for i in range(n_head - n)]
    return slopes[:n_head]


def dense_ffn(cfg: ModelConfig):
    gated, f = act_fn(cfg.traits.act, cfg.fatrelu_threshold)

    def ffn(lp: dict, x: jnp.ndarray) -> jnp.ndarray:
        up = mm(x, lp["w_up"])
        if "b_up" in lp:
            up = up + lp["b_up"].astype(up.dtype)
        if "xielu_ap" in lp:
            # apertus xIELU with per-layer learned coefficients
            # (ref src/models/apertus.cpp ggml_xielu; loader pre-softplusses)
            from ..ops.activations import xielu

            hidden = xielu(up, lp["xielu_ap"], lp["xielu_an"],
                           lp["xielu_beta"], lp["xielu_eps"])
        elif gated and "w_gate" in lp:
            hidden = f(mm(x, lp["w_gate"]), up)
        elif gated:
            # gated act but model has no gate proj: act on up alone
            hidden = f(up, jnp.ones_like(up))
        else:
            hidden = f(up)
        if "ffn_sub_norm_w" in lp:  # bitnet pre-down_proj sub-norm
            hidden = _norm(hidden, lp["ffn_sub_norm_w"], None,
                           cfg.traits.norm, cfg.norm_eps)
        out = mm(hidden, lp["w_down"])
        if "b_down" in lp:
            out = out + lp["b_down"].astype(out.dtype)
        return out

    return ffn


def attention(
    cfg: ModelConfig,
    lp: dict,
    x: jnp.ndarray,  # (B, T, E) already normed
    positions: jnp.ndarray,  # (B, T)
    kc: jnp.ndarray,
    vc: jnp.ndarray,
    ks: jnp.ndarray | None,
    vs: jnp.ndarray | None,
    rp: RopeParams,
    fresh_prefill: bool = False,
    causal: bool = True,
    rp_swa: RopeParams | None = None,
    ring_width: int = 0,
    mrope_pos: jnp.ndarray | None = None,  # (3, B, T) qwen2vl M-RoPE
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray | None, jnp.ndarray | None]:
    B, T, _ = x.shape
    tr = cfg.traits
    eps = cfg.norm_eps
    H, Hkv, D = cfg.n_head, cfg.n_head_kv, cfg.head_dim
    kc_pad = vc_pad = None
    if cfg.n_head_arr:
        # deci NAS stacks: per-layer head counts derived from the weight
        # shapes (static per heterogeneous segment). The cache is sized
        # for max(Hkv); slice this layer's slab and re-attach after.
        H = lp["wq"].shape[-1] // D
        Hkv = lp["wk"].shape[-1] // D
        if kc.shape[2] != Hkv:
            kc_pad, vc_pad = kc[:, :, Hkv:], vc[:, :, Hkv:]
            kc, vc = kc[:, :, :Hkv], vc[:, :, :Hkv]
    S = kc.shape[1]
    q = mm(x, lp["wq"]).reshape(B, T, H, D)
    k = mm(x, lp["wk"]).reshape(B, T, Hkv, D)
    v = mm(x, lp["wv"]).reshape(B, T, Hkv, D)
    if "bq" in lp:
        q = q + lp["bq"].astype(q.dtype).reshape(H, D)
        k = k + lp["bk"].astype(k.dtype).reshape(Hkv, D)
        v = v + lp["bv"].astype(v.dtype).reshape(Hkv, D)
    if cfg.clamp_kqv > 0.0:
        # dbrx/mpt clip_qkv (ref src/models/dbrx.cpp:41 ggml_clamp)
        c = cfg.clamp_kqv
        q = jnp.clip(q, -c, c)
        k = jnp.clip(k, -c, c)
        v = jnp.clip(v, -c, c)
    def _qk_norms(q, k):
        # q/k norms (qwen3/gemma3/olmo2/cohere — llama-model.cpp
        # attn_q_norm/attn_k_norm): per-head when the weight is head_dim
        # wide, full-width (olmo2) otherwise; chameleon carries (H, D)
        # per-head affine with stats over D (ChameleonLayerNorm)
        qw, kw = lp["attn_q_norm_w"], lp["attn_k_norm_w"]
        kind = tr.qk_norm_kind or tr.norm
        if qw.ndim == 2:
            ones = jnp.ones((D,), jnp.float32)
            qb, kb = lp.get("attn_q_norm_b"), lp.get("attn_k_norm_b")
            q = _norm(q, ones, None, kind, eps) * qw[None, None]
            k = _norm(k, ones, None, kind, eps) * kw[None, None]
            if qb is not None:
                q = q + qb[None, None]
                k = k + kb[None, None]
            return q, k
        if qw.shape[-1] == D:
            q = _norm(q, qw, lp.get("attn_q_norm_b"), kind, eps)
            k = _norm(k, kw, lp.get("attn_k_norm_b"), kind, eps)
        else:
            q = _norm(q.reshape(B, T, H * D), qw, lp.get("attn_q_norm_b"),
                      kind, eps).reshape(B, T, H, D)
            k = _norm(k.reshape(B, T, Hkv * D), kw, lp.get("attn_k_norm_b"),
                      kind, eps).reshape(B, T, Hkv, D)
        return q, k

    if "attn_q_norm_w" in lp and not tr.qk_norm_after_rope:
        q, k = _qk_norms(q, k)
    # per-layer SWA flag (0.0/1.0 scalar riding the layer scan)
    swa_flag = lp.get("swa_flag")
    q0, k0 = q, k
    if rp_swa is not None and swa_flag is not None:
        # gemma3: SWA layers rope at a different base than full layers
        is_swa = swa_flag > 0.5
        q = jnp.where(is_swa, apply_rope(q, positions, rp_swa),
                      apply_rope(q, positions, rp))
        k = jnp.where(is_swa, apply_rope(k, positions, rp_swa),
                      apply_rope(k, positions, rp))
    elif mrope_pos is not None:
        # qwen2vl M-RoPE: rope positions are the 3-stream multimodal ids,
        # independent of the cache slot positions
        from ..ops.rope import apply_mrope

        q = apply_mrope(q, mrope_pos, cfg.mrope_sections, rp,
                        interleaved=cfg.mrope_interleaved)
        k = apply_mrope(k, mrope_pos, cfg.mrope_sections, rp,
                        interleaved=cfg.mrope_interleaved)
    else:
        q = apply_rope(q, positions, rp)
        k = apply_rope(k, positions, rp)
    nope_flag = lp.get("nope_flag")
    if nope_flag is not None:
        # smollm3-style NoPE layers: skip rope entirely on flagged layers
        skip = nope_flag > 0.5
        q = jnp.where(skip, q0, q)
        k = jnp.where(skip, k0, k)
    if "attn_q_norm_w" in lp and tr.qk_norm_after_rope:
        # hunyuan: per-head qk-norm applied AFTER rope
        # (src/models/hunyuan-dense.cpp order: rope, then norm)
        q, k = _qk_norms(q, k)

    # iSWA ring cache: this layer's cache holds only the last ring_width
    # key slots; slot j of the ring holds the key written at absolute
    # position q_j, reconstructed below for masking
    wpos = positions % ring_width if ring_width else positions
    kc, ks = write_layer(kc, ks, k, wpos)
    vc, vs = write_layer(vc, vs, v, wpos)

    def _reattach(kc, vc):
        if kc_pad is not None:
            return (jnp.concatenate([kc, kc_pad], 2),
                    jnp.concatenate([vc, vc_pad], 2))
        return kc, vc

    scale = cfg.attn_scale if cfg.attn_scale else D ** -0.5
    softcap = tr.attn_logit_softcap
    sinks = lp.get("attn_sinks")

    if (fresh_prefill or not causal) \
            and (cfg.sliding_window <= 0 or not causal) \
            and softcap == 0.0 and sinks is None and not tr.alibi:
        # prompt-from-scratch: every relevant key IS in this chunk
        # (positions are 0..T-1), so attend over the chunk directly instead
        # of the S-sized cache — O(T^2) not O(T*S), and on TPU the fused
        # flash kernel (GGML_OP_FLASH_ATTN_EXT analogue) applies. causal=False
        # (diffusion LMs: Dream/LLaDA full-window denoising) drops the mask.
        # non_causal encoders (bert) flag padding slots with position -1,
        # which must be excluded from every token's bidirectional attention;
        # gemma-embedding adds a SYMMETRIC window (|Δpos| <= n_swa/2 —
        # ref llama-hparams.cpp LLAMA_SWA_TYPE_SYMMETRIC) on SWA layers.
        pair = None
        if tr.non_causal:
            kvalid = positions >= 0
            pair = jnp.broadcast_to(kvalid[:, None, :], (B, T, T))
            if cfg.sliding_window > 0:
                half = cfg.sliding_window // 2
                diff = positions[:, None, :] - positions[:, :, None]
                band = (diff >= -half) & (diff <= half)
                if swa_flag is not None:
                    band = band | (swa_flag <= 0.5)
                pair = pair & band
        out = _chunk_causal_attention(q, k, v, H, Hkv, D, causal=causal,
                                      scale=scale, pair_mask=pair)
        out = out.reshape(B, T, H * D)
        if "w_attn_gate" in lp:
            # qwen3next output gate: sigmoid(x @ Wg) elementwise on the
            # attention output before o_proj (Qwen3NextAttention)
            gt = mm(x, lp["w_attn_gate"]).astype(jnp.float32)
            out = (out.astype(jnp.float32) * jax.nn.sigmoid(gt)).astype(out.dtype)
        if "attn_sub_norm_w" in lp:  # bitnet pre-o_proj sub-norm
            out = _norm(out, lp["attn_sub_norm_w"], None, tr.norm, eps)
        out = mm(out, lp["wo"])
        if "bo" in lp:
            out = out + lp["bo"].astype(out.dtype)
        kc, vc = _reattach(kc, vc)
        return out, kc, vc, ks, vs

    keys = read_layer(kc, ks, q.dtype)  # (B, S, Hkv, D)
    vals = read_layer(vc, vs, q.dtype)

    g = H // Hkv
    qg = q.reshape(B, T, Hkv, g, D)
    scores = jnp.einsum("bthgd,bshd->bhgts", qg, keys, preferred_element_type=jnp.float32)
    scores = scores * scale
    if softcap > 0.0:
        # gemma2 attention soft-capping (pre-mask)
        scores = softcap * jnp.tanh(scores / softcap)
    s_idx = jnp.arange(S, dtype=jnp.int32)
    if ring_width:
        # absolute position held by ring slot j: the newest write is at
        # positions[:, -1]; each slot holds the latest q <= p_max with
        # q % ring == j. Never-written slots reconstruct to q_j < 0.
        p_max = positions[:, -1]  # (B,)
        q_j = p_max[:, None] - ((p_max[:, None] - s_idx[None, :]) % ring_width)
        mask = (q_j[:, None, :] <= positions[:, :, None]) & (q_j[:, None, :] >= 0)
        mask = mask & (q_j[:, None, :] > positions[:, :, None] - cfg.sliding_window)
    else:
        if tr.alibi:
            sl = jnp.asarray(alibi_slopes(H), jnp.float32).reshape(Hkv, g)
            rel = (s_idx[None, None, :] - positions[:, :, None]).astype(jnp.float32)
            scores = scores + sl[None, :, :, None, None] * rel[:, None, None, :, :]
        mask = s_idx[None, None, :] <= positions[:, :, None]  # (B, T, S)
        if cfg.sliding_window > 0:
            win = cfg.sliding_window
            swa_mask = s_idx[None, None, :] > positions[:, :, None] - win
            if swa_flag is not None:
                # window applies only on SWA layers of the pattern
                mask = mask & (swa_mask | (swa_flag <= 0.5))
            else:
                mask = mask & swa_mask
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    if sinks is not None:
        # gpt-oss attention sinks: a learned per-head logit joins the
        # softmax denominator but contributes no value (llama-graph.cpp
        # build_attn_mha sinks path)
        sk = sinks.astype(jnp.float32).reshape(Hkv, g)[None, :, :, None, None]
        sk = jnp.broadcast_to(sk, scores.shape[:-1] + (1,))
        probs = jax.nn.softmax(jnp.concatenate([scores, sk], axis=-1), axis=-1)
        probs = probs[..., :-1].astype(q.dtype)
    else:
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhgts,bshd->bthgd", probs, vals)
    out = out.reshape(B, T, H * D)
    if "w_attn_gate" in lp:
        gt = mm(x, lp["w_attn_gate"]).astype(jnp.float32)
        out = (out.astype(jnp.float32) * jax.nn.sigmoid(gt)).astype(out.dtype)
    if "attn_sub_norm_w" in lp:  # bitnet pre-o_proj sub-norm
        out = _norm(out, lp["attn_sub_norm_w"], None, tr.norm, eps)
    out = mm(out, lp["wo"])
    if "bo" in lp:
        out = out + lp["bo"].astype(out.dtype)
    kc, vc = _reattach(kc, vc)
    return out, kc, vc, ks, vs


def attention_mla(
    cfg: ModelConfig,
    lp: dict,
    x: jnp.ndarray,  # (B, T, E) already normed
    positions: jnp.ndarray,
    kc: jnp.ndarray,
    vc: jnp.ndarray,
    ks: jnp.ndarray | None,
    vs: jnp.ndarray | None,
    rp: RopeParams,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray | None, jnp.ndarray | None]:
    """Multi-head Latent Attention (deepseek2/3 — ref src/models/
    deepseek2.cpp), ABSORBED form: scores and outputs are computed in
    the shared latent space, so the cache stores only the compressed
    latent c_kv (+ the single rope'd key head) — kv_lora_rank+rope_dim
    bytes/token, independent of n_head (the MLA memory win; the
    llama.cpp analogue is the wk_b/wv_b split attention).

    Math (associativity): score = q_nope·(c·Wk_b)ᵀ + q_pe·k_pe
                                 = (q_nope·Wk_bᵀ)·cᵀ + q_pe·k_pe,
    and out_h = (probs·c)·Wv_b[h] — no per-head K/V ever materialized.

    Cache layout: Hkv=1 head of width R+Dr (k slot: [c_kv; k_pe]);
    the v-side cache is unused (zero-width) since values decompress
    from the same latent."""
    B, T, _ = x.shape
    eps = cfg.norm_eps
    H = cfg.n_head
    Dk = cfg.head_dim  # qk_nope + qk_rope
    Dr = cfg.rope_dim  # qk_rope_head_dim
    Dn = Dk - Dr
    Dv = cfg.v_head_dim or Dk
    R = cfg.kv_lora_rank

    if "wq_a" in lp:
        qa = rms_norm(mm(x, lp["wq_a"]), lp["q_a_norm_w"], eps)
        q = mm(qa, lp["wq_b"]).reshape(B, T, H, Dk)
    else:  # deepseek2-lite: direct q projection
        q = mm(x, lp["wq"]).reshape(B, T, H, Dk)
    q_nope, q_pe = q[..., :Dn], q[..., Dn:]
    q_pe = apply_rope(q_pe, positions, rp)
    # absorb the key decompressor into q: (B,T,H,Dn)x(R,H,Dn) -> latent q
    q_lat = jnp.einsum("bthd,rhd->bthr", q_nope,
                       lp["wk_b"].astype(q_nope.dtype))

    kv_a = mm(x, lp["wkv_a"])  # (B, T, R + Dr)
    c_kv, k_pe = kv_a[..., :R], kv_a[..., R:]
    c_kv = rms_norm(c_kv, lp["kv_a_norm_w"], eps)
    k_pe = apply_rope(k_pe[:, :, None, :], positions, rp)[:, :, 0]

    lat = jnp.concatenate([c_kv, k_pe], -1)[:, :, None, :]  # (B,T,1,R+Dr)
    kc, ks = write_layer(kc, ks, lat, positions)
    latc = read_layer(kc, ks, q.dtype)[:, :, 0]  # (B, S, R+Dr)
    c_all, pe_all = latc[..., :R], latc[..., R:]

    S = kc.shape[1]
    scores = (
        jnp.einsum("bthr,bsr->bhts", q_lat, c_all,
                   preferred_element_type=jnp.float32)
        + jnp.einsum("bthd,bsd->bhts", q_pe, pe_all,
                     preferred_element_type=jnp.float32)
    ) * (Dk ** -0.5)
    s_idx = jnp.arange(S, dtype=jnp.int32)
    mask = s_idx[None, None, :] <= positions[:, :, None]
    scores = jnp.where(mask[:, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    ctx = jnp.einsum("bhts,bsr->bthr", probs, c_all)  # latent context
    out = jnp.einsum("bthr,rhd->bthd", ctx, lp["wv_b"].astype(ctx.dtype))
    out = out.reshape(B, T, H * Dv)
    return mm(out, lp["wo"]), kc, vc, ks, vs


def _chunk_causal_attention(q, k, v, H, Hkv, D, causal=True, scale=None,
                            pair_mask=None):
    """q (B,T,H,D), k/v (B,T,Hkv,D) -> (B,T,H,D); causal within chunk
    (bidirectional when causal=False). Uses the Pallas TPU flash kernel
    when on TPU and shapes permit. pair_mask (B,T,S) bool masks invalid
    query/key pairs (bidirectional encoders: padding keys, symmetric
    windows) and forces the einsum path."""
    B, T = q.shape[0], q.shape[1]
    g = H // Hkv
    if scale is None:
        scale = D ** -0.5
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if on_tpu and T >= 128 and D % 128 == 0 and pair_mask is None:
        from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

        kk = jnp.repeat(k, g, axis=2) if g > 1 else k
        vv = jnp.repeat(v, g, axis=2) if g > 1 else v
        out = flash_attention(
            q.transpose(0, 2, 1, 3),  # (B,H,T,D)
            kk.transpose(0, 2, 1, 3),
            vv.transpose(0, 2, 1, 3),
            causal=causal,
            sm_scale=scale,
        )
        return out.transpose(0, 2, 1, 3)
    qg = q.reshape(B, T, Hkv, g, D)
    scores = jnp.einsum("bthgd,bshd->bhgts", qg, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if causal:
        t_idx = jnp.arange(T, dtype=jnp.int32)
        mask = t_idx[:, None] >= t_idx[None, :]  # (t, s): query t sees key s<=t
        scores = jnp.where(mask[None, None, None, :, :], scores, NEG_INF)
    if pair_mask is not None:
        scores = jnp.where(pair_mask[:, None, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhgts,bshd->bthgd", probs, v)
    return out.reshape(B, T, H, D)


def cogvlm_vision_params(params: dict) -> dict:
    """cogvlm per-ubatch expert selection (src/models/cogvlm.cpp:27-44):
    an IMAGE ubatch (embedding input, no token ids) runs the same block
    graph with the vision-expert weights. Build the image-forward params
    by swapping the text weights for their vis_* counterparts and run
    make_forward(cfg, inputs_embeds=True) with the result."""
    layers = dict(params["layers"])
    for k in ("wq", "wk", "wv", "wo", "w_up", "w_gate", "w_down"):
        vk = "vis_" + k
        if vk in layers:
            layers[k] = layers[vk]
    return {**params, "layers": layers}


def make_forward(
    cfg: ModelConfig,
    ffn_fn: Callable | None = None,
    stateful_ffn: bool = False,
    with_hidden: bool = False,
    fresh_prefill: bool = False,
    ffn_carry_init: Callable | None = None,
    causal: bool = True,
    inputs_embeds: bool = False,
    moe_mode: str = "dense",  # "dense" | "pallas" (fused row-streaming)
    deepstack_slice: tuple | None = None,  # qwen3vl (start, end) image span
) -> Callable:
    """Build the jittable forward: (params, tokens, positions, cache) ->
    (logits_f32 (B,T,V), cache). `positions` must be the absolute sequence
    positions of `tokens` per batch slot.

    stateful_ffn=True changes the signature to
        fwd(params, tokens, positions, cache, fstate) ->
            (logits, cache, new_fstate)
    where fstate is a pytree whose leaves have a leading n_layer axis; the
    per-layer slice is threaded through ffn_fn(lp, x, fs, layer_idx) ->
    (y, fs'). Used for DFR statistics (sparse/tiering.py) and firing-rate
    calibration (sparse/split.py).

    ffn_carry_init(B, T) enables a CROSS-LAYER carry instead: ffn_fn is
    called as ffn(lp, x, carry, layer_idx) -> (y, new_carry) with the carry
    flowing DOWN the layer scan (ref: the one-layer-ahead predictor
    pipelining of build_sparse_ffn, src/llama-graph.cpp:939-946 — layer il
    consumes the selection computed at il-1, so its weight fetch has no
    data dependence on this layer's activations)."""
    tr = cfg.traits
    causal = causal and not tr.non_causal  # bert-family encoders
    rp = rope_params(cfg)
    _moe_ref = None
    if ffn_fn is None and cfg.n_expert > 0:
        from ..sparse.moe import make_moe_ffn

        _moe_f = make_moe_ffn(cfg, mode=moe_mode)
        _dense_f = dense_ffn(cfg)
        if tr.parallel_moe:
            _moe_ref = _moe_f  # arctic: body adds the MoE residual itself

        def ffn(lp, x):
            # per-segment dispatch: deepseek2-style leading dense layers
            # (first_k_dense_replace) carry plain FFN tensors, the rest MoE;
            # moe_mode="pallas" expects moe_layout-transformed layer params.
            # arctic keeps the DENSE ffn in-block (the MoE rides a parallel
            # residual handled in the body).
            if tr.parallel_moe and "w_up" in lp:
                return _dense_f(lp, x)
            return _moe_f(lp, x) if "w_router" in lp else _dense_f(lp, x)
    else:
        ffn = ffn_fn or dense_ffn(cfg)
    eps = cfg.norm_eps

    rp_swa = None
    if cfg.rope_freq_base_swa and cfg.rope_freq_base_swa != cfg.rope_freq_base:
        import dataclasses as _dc

        # gemma3: local (SWA) layers rope at the local base, UNSCALED —
        # rope_scaling applies only to the global layers (HF Gemma3
        # rope_local_base_freq semantics)
        rp_swa = _dc.replace(rp, freq_base=cfg.rope_freq_base_swa,
                             freq_scale=1.0, yarn_ext_factor=0.0)
    swa_flags = None
    if cfg.sliding_window > 0 and (tr.swa_pattern > 1 or rp_swa is not None):
        swa_flags = jnp.asarray(
            [1.0 if s else 0.0 for s in cfg.swa_layers], jnp.float32)
    nope_flags = None
    if any(cfg.nope_layers):
        nope_flags = jnp.asarray(
            [1.0 if s else 0.0 for s in cfg.nope_layers], jnp.float32)

    def fwd(params: dict, tokens: jnp.ndarray, positions: jnp.ndarray, cache: KVCache,
            fstate=None, mrope_pos=None, deepstack=None):
        # inputs_embeds: `tokens` is already (B, T, E) float (multimodal
        # splicing — the analogue of llama_batch.embd)
        x = tokens if inputs_embeds else params["tok_embd"][tokens]
        if tr.embd_scale_sqrt:  # gemma: embeddings scaled by sqrt(n_embd)
            x = x * jnp.asarray(cfg.n_embd ** 0.5, x.dtype)
        if cfg.embd_scale != 1.0:  # granite/minicpm embedding multiplier
            x = x * jnp.asarray(cfg.embd_scale, x.dtype)
        if tr.pos_embd:
            x = x + params["pos_embd"][positions + tr.pos_embd_offset]
        if "type_embd" in params:
            # bert token-type (segment) embeddings; single-sequence use is
            # always segment 0 (ref bert graph: get_rows(token_types, 0))
            x = x + params["type_embd"][0].astype(x.dtype)
        if "tok_norm_w" in params:  # bloom post-embedding LayerNorm
            x = _norm(x, params["tok_norm_w"], params.get("tok_norm_b"),
                      tr.norm, eps)

        layers = params["layers"]
        if deepstack is not None:
            # qwen3vl DeepStack: per-layer visual features (zeros past the
            # tapped layers) added at the image positions after each layer
            # (Qwen3VLTextModel._deepstack_process)
            layers = dict(layers, deepstack_embeds=deepstack)
        if swa_flags is not None:
            layers = dict(layers, swa_flag=swa_flags)
        if nope_flags is not None:
            layers = dict(layers, nope_flag=nope_flags)
        # Loop-INVARIANT sparse weight stores, flat over (layer, group).
        # Deliberately NOT in `layers`: scan xs are dynamic-sliced per layer,
        # and a Pallas custom call cannot fuse that slice — XLA would
        # materialize a full per-layer copy of the store every layer, every
        # step (~GB/step of hidden traffic). Passed whole, the kernel block-
        # indexes it with il*n_groups + idx and no copy exists.
        flat = params.get("sparse_flat")
        quantized = cache.quantized

        def body(x, lp, kc, vc, ks, vs, fs, il, ring_w=0):
            # unpack the zero-size placeholders lax.scan required (None can't
            # ride in xs/ys); shapes are static so this resolves at trace time
            if flat is not None:
                # merge the loop-invariant flat stores up front so ATTENTION
                # weights can also live there (FlatQuantTensor stores bind
                # the layer index late — the Pallas quant matmul block-
                # indexes the flat store, no per-layer slice copy)
                from ..ops.quant_matmul import FlatQuantTensor

                lp = {**lp, **flat, "flat_il": il}
                lp = {k: (v.with_il(il) if isinstance(v, FlatQuantTensor)
                          else v) for k, v in lp.items()}
            x_in = x  # layer input (arctic parallel-MoE residual source)
            if tr.moe_router_on_input and "w_router" in lp:
                # smallthinker lookahead routing: router logits computed
                # BEFORE attention from the raw layer input
                lp = dict(lp, router_logits=(
                    x_in @ lp["w_router"].astype(x_in.dtype)))
            empty_ks, empty_vs = ks, vs
            if ks is not None and ks.shape[-1] == 0:
                ks = vs = None
            # pre-norm when present (post-norm-only archs like olmo2 have no
            # attn_norm/ffn_norm tensors — attention reads the raw residual)
            h = (_norm(x, lp["attn_norm_w"], lp.get("attn_norm_b"), tr.norm, eps)
                 if "attn_norm_w" in lp and not tr.post_norm else x)
            if cfg.n_head_arr and "wq" not in lp:
                # deci attention-free layer (src/models/deci.cpp:32-38,
                # 92-112): the block consumes norm(x) directly and its
                # output REPLACES the stream: ffn(ffn_norm(h)) + h
                h2 = (_norm(h, lp["ffn_norm_w"], lp.get("ffn_norm_b"),
                            tr.norm, eps) if "ffn_norm_w" in lp else h)
                lpf = lp  # flat already merged at body top
                if stateful_ffn or ffn_carry_init is not None:
                    y, fs2 = ffn(lpf, h2, fs, il)
                else:
                    y, fs2 = ffn(lpf, h2), fs
                return h + y, (kc, vc, empty_ks, empty_vs, fs2)
            if cfg.kv_lora_rank > 0:
                attn_out, kc, vc, ks, vs = attention_mla(
                    cfg, lp, h, positions, kc, vc, ks, vs, rp)
            else:
                attn_out, kc, vc, ks, vs = attention(cfg, lp, h, positions, kc, vc, ks, vs, rp,
                                                     fresh_prefill=fresh_prefill,
                                                     causal=causal, rp_swa=rp_swa,
                                                     ring_width=ring_w,
                                                     mrope_pos=mrope_pos)
            if ks is None:
                ks, vs = empty_ks, empty_vs
            if "attn_post_norm_w" in lp:  # gemma2 sandwich / olmo2 post-norm
                attn_out = _norm(attn_out, lp["attn_post_norm_w"],
                                 lp.get("attn_post_norm_b"), tr.norm, eps)
            if cfg.residual_scale != 1.0:  # granite residual_multiplier
                attn_out = attn_out * jnp.asarray(cfg.residual_scale, attn_out.dtype)

            def run_ffn(h_in):
                lpf = lp  # flat already merged at body top
                if stateful_ffn:
                    return ffn(lpf, h_in, fs, il)
                if ffn_carry_init is not None:
                    return ffn(lpf, h_in, fs, il)  # fs doubles as the carry
                return ffn(lpf, h_in), fs  # echo placeholder state

            if tr.parallel_blocks:
                # falcon: FFN reads attn_norm_2(x) (or the same norm when absent)
                if "attn_norm2_w" in lp:
                    h2 = _norm(x, lp["attn_norm2_w"], lp.get("attn_norm2_b"), tr.norm, eps)
                else:
                    h2 = h
                y, fs2 = run_ffn(h2)
                x = x + attn_out + y
            elif tr.post_norm:
                # encoder post-norm (bert): LayerNorm over each residual SUM
                # (attn_output_norm rides the attn_norm slot,
                # layer_output_norm the ffn_norm slot)
                x = _norm(x + attn_out, lp["attn_norm_w"],
                          lp.get("attn_norm_b"), tr.norm, eps)
                y, fs2 = run_ffn(x)
                x = _norm(x + y, lp["ffn_norm_w"], lp.get("ffn_norm_b"),
                          tr.norm, eps)
            else:
                x = x + attn_out
                h2 = (_norm(x, lp["ffn_norm_w"], lp.get("ffn_norm_b"), tr.norm, eps)
                      if "ffn_norm_w" in lp else x)
                y, fs2 = run_ffn(h2)
                if "ffn_post_norm_w" in lp:
                    y = _norm(y, lp["ffn_post_norm_w"],
                              lp.get("ffn_post_norm_b"), tr.norm, eps)
                if cfg.residual_scale != 1.0:
                    y = y * jnp.asarray(cfg.residual_scale, y.dtype)
                x = x + y
            if _moe_ref is not None and "ffn_norm_exps_w" in lp:
                # arctic parallel MoE residual off the LAYER INPUT
                # (src/models/arctic.cpp:64-72)
                hm = _norm(x_in, lp["ffn_norm_exps_w"], None, tr.norm, eps)
                x = x + _moe_ref(lp, hm)
            if "cvec" in lp:  # control vector (llama_adapter_cvec)
                x = x + lp["cvec"].astype(x.dtype)
            if deepstack_slice is not None and "deepstack_embeds" in lp:
                ds_s, ds_e = deepstack_slice
                x = x.at[:, ds_s:ds_e].add(
                    lp["deepstack_embeds"][None].astype(x.dtype))
            return x, (kc, vc, ks, vs, fs2)

        L = cfg.n_layer
        layer_ids = jnp.arange(L, dtype=jnp.int32)
        ks = cache.k_scale if quantized else None
        vs = cache.v_scale if quantized else None

        # lax.scan can't carry None leaves in xs; substitute empty arrays
        def pack(a):
            return a if a is not None else jnp.zeros((L, 0))

        if ffn_carry_init is not None:
            # cross-layer ffn carry rides the scan CARRY (not xs)
            B_, T_ = tokens.shape

            def scan_body(carry, t):
                x_c, fc = carry
                lp, kc, vc, ks_, vs_, il = t
                x2, (kc2, vc2, ks2, vs2, fc2) = body(x_c, lp, kc, vc, ks_, vs_, fc, il)
                return (x2, fc2), (kc2, vc2, ks2, vs2)

            xs = (layers, cache.k, cache.v, pack(ks), pack(vs), layer_ids)
            (x, _), (k_new, v_new, ks_new, vs_new) = jax.lax.scan(
                scan_body, (x, ffn_carry_init(B_, T_)), xs
            )
            fs_new = None
        elif isinstance(cache.k, tuple):
            # iSWA dual cache: one scan per contiguous same-SWA-flag run;
            # SWA runs address their small ring, full runs the whole S
            # (ref src/llama-kv-cache-iswa.cpp). Shapes per run are
            # static, so each run traces its own attention variant.
            from ..runtime.kv_cache import swa_runs

            outs_k, outs_v, outs_fs = [], [], []
            for (s, e, is_swa), kc_r, vc_r in zip(swa_runs(cfg), cache.k, cache.v):
                n = e - s
                ring_w = kc_r.shape[2] if is_swa else 0

                def run_body(carry, t, _rw=ring_w):
                    lp, kc, vc, ks_, vs_, fs, il = t
                    return body(carry, lp, kc, vc, ks_, vs_, fs, il, _rw)

                seg = {k: v[s:e] for k, v in layers.items()}
                xs = (seg, kc_r, vc_r, jnp.zeros((n, 0)), jnp.zeros((n, 0)),
                      pack(fstate)[s:e], layer_ids[s:e])
                x, (k_r, v_r, _, _, fs_r) = jax.lax.scan(run_body, x, xs)
                outs_k.append(k_r)
                outs_v.append(v_r)
                outs_fs.append(fs_r)
            k_new, v_new = tuple(outs_k), tuple(outs_v)
            ks_new = vs_new = None
            fs_new = (jnp.concatenate(outs_fs, 0)
                      if fstate is not None else None)
        else:
            def scan_body(carry, t):
                lp, kc, vc, ks_, vs_, fs, il = t
                return body(carry, lp, kc, vc, ks_, vs_, fs, il)

            segments = params.get("layer_segments")
            if segments is not None:
                # heterogeneous stacks (deepseek2 leading-dense + MoE):
                # one scan per contiguous run of same-signature layers,
                # cache sliced by static layer offsets and re-concatenated
                off = 0
                outs = []
                for seg in segments:
                    n = jax.tree_util.tree_leaves(seg)[0].shape[0]
                    sl = slice(off, off + n)
                    xs = (seg, cache.k[sl], cache.v[sl], pack(ks)[sl],
                          pack(vs)[sl], pack(fstate)[sl], layer_ids[sl])
                    x, seg_out = jax.lax.scan(scan_body, x, xs)
                    outs.append(seg_out)
                    off += n
                k_new, v_new, ks_new, vs_new, fs_new = (
                    jax.tree_util.tree_map(
                        lambda *xs_: jnp.concatenate(xs_, 0), *outs)
                    if len(outs) > 1 else outs[0])
            else:
                xs = (layers, cache.k, cache.v, pack(ks), pack(vs), pack(fstate), layer_ids)
                x, (k_new, v_new, ks_new, vs_new, fs_new) = jax.lax.scan(scan_body, x, xs)

        if quantized:
            new_cache = KVCache(k=k_new, v=v_new, k_scale=ks_new, v_scale=vs_new)
        else:
            new_cache = KVCache(k=k_new, v=v_new)

        if "output_norm_w" in params:
            # post-norm encoders (bert) have no final norm: the last block's
            # layer_output_norm already normalized the stream
            x = _norm(x, params["output_norm_w"], params.get("output_norm_b"),
                      tr.norm, eps)
        hidden = x
        out_w = params["output"]
        from ..ops.quant_matmul import W8A8Tensor, w8a8_linear

        if isinstance(out_w, W8A8Tensor):  # native int8 MXU head
            logits = w8a8_linear(x, out_w, out_dtype=jnp.float32)
        elif hasattr(out_w, "kind"):  # QuantTensor
            logits = mm(x, out_w).astype(jnp.float32)
        else:
            logits = jnp.einsum(
                "bte,ev->btv", x, out_w, preferred_element_type=jnp.float32
            )
        if "output_b" in params:  # gptj lm_head bias
            logits = logits + params["output_b"]
        if cfg.logit_scale != 1.0:  # cohere/granite logit multiplier
            logits = logits * cfg.logit_scale
        if tr.final_logit_softcap > 0:
            # gemma2-style soft capping: cap * tanh(logits / cap)
            cap = tr.final_logit_softcap
            logits = cap * jnp.tanh(logits / cap)
        if stateful_ffn and with_hidden:
            return logits, new_cache, fs_new, hidden
        if stateful_ffn:
            return logits, new_cache, fs_new
        if with_hidden:
            return logits, new_cache, hidden
        return logits, new_cache

    return fwd
