"""Multi-host runtime — the replacement for ggml-rpc (SURVEY.md §5.8).

The reference's only distribution mechanism is a TCP proxy backend
(rpc-server) shipping tensors and graphs host-to-host. On TPU pods the
runtime IS the interconnect: jax.distributed brings every host into one
process group, `jax.devices()` shows the global chip set, and GSPMD
shardings place collectives on ICI (intra-slice) / DCN (inter-slice)
automatically. No tensor-shipping control plane is needed; host-side
control metadata rides `multihost_utils`.

Usage (one command per host, e.g. via gcloud ssh --worker=all):

    from sparkinfer_tpu.parallel.distributed import init_multihost, global_mesh
    init_multihost()                    # env-driven on TPU pods
    mesh = global_mesh(tp=8)            # dp = n_chips // tp
    ... shard_params(mesh, cfg, params) # identical code to single-host

The scaling-efficiency harness (bench target >=85% at 2 hosts,
BASELINE.md) is `measure_scaling` below: per-chip decode throughput on the
global mesh vs the single-chip figure.
"""

from __future__ import annotations

import jax

from .mesh import make_mesh


def init_multihost(coordinator: str | None = None, num_processes: int | None = None,
                   process_id: int | None = None):
    """jax.distributed.initialize with TPU-pod auto-detection. Safe to call
    on a single host (no-op when no peers are configured)."""
    try:
        if coordinator is not None:
            jax.distributed.initialize(coordinator, num_processes, process_id)
        else:
            jax.distributed.initialize()
    except Exception:
        # single-process / already initialized
        pass


def global_mesh(tp: int = 1):
    devices = jax.devices()
    n = len(devices)
    assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
    return make_mesh(dp=n // tp, tp=tp, devices=devices)


def sync_hosts(name: str = "barrier"):
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def measure_scaling(step_fn, args, n_steps: int = 16) -> dict:
    """Run a jitted step on the current (global) mesh and report per-host
    wall time — divide single-host throughput by this for efficiency."""
    import time

    out = step_fn(*args)
    jax.tree.map(lambda x: getattr(x, "block_until_ready", lambda: None)(), out)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        out = step_fn(*args)
    jax.tree.map(lambda x: getattr(x, "block_until_ready", lambda: None)(), out)
    dt = time.perf_counter() - t0
    return {
        "steps_per_s": n_steps / dt,
        "n_devices": len(jax.devices()),
        "n_hosts": jax.process_count(),
    }
