"""Pipeline parallelism over a `pp` mesh axis — the TPU-native analogue
of the ggml-backend scheduler's pipeline parallelism
(ggml-backend.cpp:692 GGML_SCHED_MAX_COPIES async split execution).

Design (GPipe-style SPMD): the stacked layer params shard CONTIGUOUSLY
along the layer axis over `pp` (stage p owns layers [p*L/P, (p+1)*L/P)),
activations hop stage-to-stage with `jax.lax.ppermute` over ICI, and
microbatches fill the pipeline: at tick t stage p processes microbatch
m = t - p, so a full sweep takes M + P - 1 ticks with the classic
(P-1)/(M+P-1) bubble. Every device executes the same traced program
(ticks are unrolled at trace time); validity masks keep garbage ticks
out of the KV cache and the output buffer.

Embeddings and the LM head are replicated (they are small next to the
layer stack); the final hidden states are psum'd off the last stage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig
from ..models.transformer import _norm, attention, dense_ffn, rope_params


def pp_shardings(mesh: Mesh, params: dict) -> dict:
    """NamedShardings: layer stacks split along axis 0 over `pp`,
    everything else replicated."""
    rep = NamedSharding(mesh, P())
    lay = NamedSharding(mesh, P("pp"))
    out = {k: rep for k in params if k != "layers"}
    out["layers"] = {k: lay for k in params["layers"]}
    return out


def place_params(mesh: Mesh, params: dict) -> dict:
    sh = pp_shardings(mesh, params)
    placed = {k: jax.device_put(v, sh[k]) for k, v in params.items()
              if k != "layers"}
    placed["layers"] = {k: jax.device_put(v, sh["layers"][k])
                        for k, v in params["layers"].items()}
    return placed


def make_pp_forward(cfg: ModelConfig, mesh: Mesh, n_micro: int = 1):
    """Build the pipelined forward.

    fwd(params, tokens (M*B, T), positions (M*B, T), cache) ->
        (logits (M*B, T, V) f32, cache)

    The leading batch dim must be n_micro * B; microbatch m is rows
    [m*B, (m+1)*B). The KV cache is the usual (L, M*B, S, Hkv, D) pytree,
    sharded (pp, batch-replicated) like the layers.
    """
    P_ = mesh.shape["pp"]
    L = cfg.n_layer
    assert L % P_ == 0, (L, P_)
    L_loc = L // P_
    tr = cfg.traits
    rp = rope_params(cfg)
    eps = cfg.norm_eps
    ffn = dense_ffn(cfg)
    M = n_micro

    import warnings

    try:  # jax >= 0.8 renamed check_rep -> check_vma
        from jax import shard_map as _shard_map

        def shard_map(f, mesh, in_specs, out_specs, check_rep):
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=check_rep)
    except ImportError:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            from jax.experimental.shard_map import shard_map

    def local_stage(layers_loc, x, positions, k_loc, v_loc):
        """Run this device's L_loc layers on x; returns (y, k', v')."""

        def body(x, t):
            lp, kc, vc = t
            h = (_norm(x, lp["attn_norm_w"], lp.get("attn_norm_b"), tr.norm, eps)
                 if "attn_norm_w" in lp else x)
            attn_out, kc, vc, _, _ = attention(
                cfg, lp, h, positions, kc, vc, None, None, rp)
            x = x + attn_out
            h2 = _norm(x, lp["ffn_norm_w"], lp.get("ffn_norm_b"), tr.norm, eps)
            x = x + ffn(lp, h2)
            return x, (kc, vc)

        x, (k_new, v_new) = jax.lax.scan(body, x, (layers_loc, k_loc, v_loc))
        return x, k_new, v_new

    def pp_body(layers_loc, k_loc, v_loc, embeds, positions):
        """Per-device program. embeds (M, B, T, E) replicated; k_loc/v_loc
        (L_loc, M*B, S, ...) local stage cache."""
        p = jax.lax.axis_index("pp")
        B = embeds.shape[1]
        T = embeds.shape[2]
        cur = jnp.zeros_like(embeds[0])  # activation entering this stage
        outs = jnp.zeros_like(embeds)  # final hiddens, filled on last stage
        k_cur, v_cur = k_loc, v_loc
        for t in range(M + P_ - 1):
            m = t - p  # microbatch this stage works on at tick t
            valid = (m >= 0) & (m < M)
            m_c = jnp.clip(m, 0, M - 1)
            # stage 0 injects microbatch t from the replicated embeddings
            x_in = jnp.where((p == 0) & valid, embeds[min(t, M - 1)], cur)
            pos_m = jax.lax.dynamic_slice_in_dim(
                positions, m_c * B, B, 0)
            kc_m = jax.lax.dynamic_slice_in_dim(k_cur, m_c * B, B, 1)
            vc_m = jax.lax.dynamic_slice_in_dim(v_cur, m_c * B, B, 1)
            y, k_new, v_new = local_stage(layers_loc, x_in, pos_m, kc_m, vc_m)
            keep = valid
            k_upd = jnp.where(keep, k_new.astype(k_cur.dtype), kc_m)
            v_upd = jnp.where(keep, v_new.astype(v_cur.dtype), vc_m)
            k_cur = jax.lax.dynamic_update_slice_in_dim(k_cur, k_upd, m_c * B, 1)
            v_cur = jax.lax.dynamic_update_slice_in_dim(v_cur, v_upd, m_c * B, 1)
            # last stage records the finished microbatch's hidden states
            done = (p == P_ - 1) & valid
            rec = jnp.where(done, y, jax.lax.dynamic_index_in_dim(
                outs, m_c, 0, keepdims=False))
            outs = jax.lax.dynamic_update_index_in_dim(outs, rec, m_c, 0)
            # hop to the next stage over ICI
            cur = jax.lax.ppermute(
                y, "pp", [(i, (i + 1) % P_) for i in range(P_)])
        # only the last stage holds real outputs; psum broadcasts them
        outs = jnp.where(p == P_ - 1, outs, 0.0)
        outs = jax.lax.psum(outs, "pp")
        return outs, k_cur, v_cur

    sm = shard_map(
        pp_body,
        mesh=mesh,
        in_specs=(P("pp"), P("pp"), P("pp"), P(), P()),
        out_specs=(P(), P("pp"), P("pp")),
        check_rep=False,
    )

    def fwd(params, tokens, positions, cache):
        MB, T = tokens.shape
        assert MB % M == 0, (MB, M)
        B = MB // M
        x = params["tok_embd"][tokens].reshape(M, B, T, -1)
        hid, k_new, v_new = sm(params["layers"], cache.k, cache.v, x,
                               positions)
        hid = hid.reshape(MB, T, -1)
        hid = _norm(hid, params["output_norm_w"], params.get("output_norm_b"),
                    tr.norm, eps)
        logits = jnp.einsum("bte,ev->btv", hid, params["output"],
                            preferred_element_type=jnp.float32)
        return logits, cache._replace(k=k_new, v=v_new)

    return fwd
