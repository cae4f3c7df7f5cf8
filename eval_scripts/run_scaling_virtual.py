#!/usr/bin/env python
"""Scaling-harness artifact on the VIRTUAL 8-device CPU mesh.

Records `measure_scaling` results for the sharded decode step at mesh
sizes 1/2/4/8 (dp x tp), written to eval_scripts/scaling_cpu_mesh.json.

LABEL: this is a CORRECTNESS + OVERHEAD-SHAPE record, NOT a performance
claim — the "devices" are XLA host-platform threads on one CPU
(xla_force_host_platform_device_count); there is no ICI, and collectives
are memcpys. Its purpose is (a) to prove the `measure_scaling` harness
produces an auditable artifact end-to-end (VERDICT r2 item 7), and (b)
to pin the overhead SHAPE (per-step dispatch + collective count) so the
>=85%-at-2-hosts target (BASELINE.md) can be audited the day real
multi-chip hardware is available.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
       XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python eval_scripts/run_scaling_virtual.py
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))


def main():
    import jax
    import jax.numpy as jnp

    from model_fixtures import make_tiny_llama
    from sparkinfer_tpu.models.loader import load_model
    from sparkinfer_tpu.models.transformer import make_forward
    from sparkinfer_tpu.parallel.distributed import measure_scaling
    from sparkinfer_tpu.parallel.mesh import (
        data_sharding,
        make_mesh,
        shard_cache,
        shard_params,
    )
    from sparkinfer_tpu.runtime.kv_cache import init_cache

    path = "/tmp/scaling-tiny.gguf"
    make_tiny_llama(path, n_layer=4, n_embd=128, n_head=8, n_head_kv=4,
                    n_ff=256, seed=13)
    model = load_model(path, dtype=jnp.float32)
    cfg = model.config

    rows = []
    for dp, tp in ((1, 1), (1, 2), (2, 2), (4, 2)):
        n = dp * tp
        mesh = make_mesh(dp=dp, tp=tp)
        params = shard_params(mesh, cfg, model.params)
        batch = max(dp, 1) * 2
        cache = shard_cache(mesh, init_cache(cfg, batch, 64, jnp.float32))
        tok = jax.device_put(jnp.zeros((batch, 1), jnp.int32),
                             data_sharding(mesh, batch))
        pos = jax.device_put(jnp.full((batch, 1), 8, jnp.int32),
                             data_sharding(mesh, batch))
        fwd = jax.jit(make_forward(cfg))
        with mesh:
            r = measure_scaling(lambda: None or fwd(params, tok, pos, cache),
                                (), n_steps=32)
        r.update(dp=dp, tp=tp, mesh_devices=n, batch=batch,
                 tokens_per_s=r["steps_per_s"] * batch,
                 tokens_per_s_per_device=r["steps_per_s"] * batch / n)
        rows.append(r)
        print(json.dumps(r), flush=True)

    base = rows[0]["tokens_per_s_per_device"]
    out = {
        "label": ("virtual CPU mesh (xla_force_host_platform_device_count) — "
                  "correctness + overhead-shape record, NOT a performance "
                  "claim; no ICI exists on this host"),
        "rows": rows,
        "per_device_efficiency_vs_1dev": [
            round(r["tokens_per_s_per_device"] / base, 3) for r in rows],
    }
    dst = pathlib.Path(__file__).parent / "scaling_cpu_mesh.json"
    dst.write_text(json.dumps(out, indent=1))
    print(f"wrote {dst}", flush=True)


if __name__ == "__main__":
    main()
