#!/usr/bin/env python
"""Scaling-efficiency harness: sharded-stage throughput from 1 to N devices.

Acceptance bar from BASELINE.md: >= 75% scaling efficiency 1 -> N.  Without
multi-chip hardware, run on the virtual CPU mesh for logic validation:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py

On a real pod slice the same script measures true ICI scaling.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # the environment's sitecustomize may pre-pin a hardware backend
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    if jax.devices()[0].platform == "cpu" and jax.device_count() == 1:
        print(json.dumps({"error": "run with xla_force_host_platform_device_count>=2"}))
        return

    import jax.numpy as jnp

    from ssrlcv_tpu.core.types import Cameras, MatchSet
    from ssrlcv_tpu.parallel import sharded
    from ssrlcv_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    nq = nt = 8192
    q = jnp.asarray(rng.integers(0, 256, (nq, 128)).astype(np.uint8))
    t = jnp.asarray(rng.integers(0, 256, (nt, 128)).astype(np.uint8))
    tv = jnp.ones(nt, bool)

    n = jax.device_count()
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n]
    results = {}
    for s in sizes:
        mesh = make_mesh(jax.devices()[:s], data=s, feat=1)
        # warm
        bi, bd = sharded.sharded_best_target(mesh, q, t, tv)
        jax.block_until_ready((bi, bd))
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            bi, bd = sharded.sharded_best_target(mesh, q, t, tv)
        jax.block_until_ready((bi, bd))
        dt = (time.perf_counter() - t0) / reps
        results[s] = dt

    base = results[sizes[0]]
    out = {
        "metric": "match_scaling_efficiency",
        "platform": jax.devices()[0].platform,
        "devices": sizes,
        "seconds": {str(k): round(v, 4) for k, v in results.items()},
        "efficiency": {
            str(s): round(base / (results[s] * s), 3) for s in sizes
        },
    }
    if jax.devices()[0].platform == "cpu":
        out["note"] = (
            "virtual CPU devices timeshare the same physical cores (XLA CPU "
            "already multithreads a single device), so wall-clock efficiency "
            "here only validates the collective logic; the >=75% bar applies "
            "to real multi-chip ICI runs"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
