"""Kernel-only microbenchmark of the flagship Pallas matcher (VERDICT r3 #5).

Separates the three contributions the old end-to-end mfu_match conflated:
prep (pad + nibble split + transpose), the pallas_call itself, and the fetch.
Prints a JSON line with kernel-only and end-to-end MFU at bench shapes.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from ssrlcv_tpu.matching.pallas_match import (
    QUERY_TILE_I8, TARGET_TILE_I8, _match_call_i8, _match_prep_i8,
    pallas_best_target)

V5E_BF16_PEAK = 197e12


def fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def t(fn, reps=5):
    fetch(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    nq, nt = 32768, 36352  # bench-scale feature counts
    q = jnp.asarray(rng.integers(0, 256, (nq, 128)).astype(np.uint8))
    td = jnp.asarray(rng.integers(0, 256, (nt, 128)).astype(np.uint8))
    tl = jnp.asarray(rng.uniform(0, 1024, (nt, 2)).astype(np.float32))
    tv = jnp.ones((nt,), bool)
    inf2 = jnp.full((nq, 2), jnp.inf, jnp.float32)

    args = _match_prep_i8(q, td, tl, inf2, inf2, jnp.float32(0.0), tv)
    jax.block_until_ready(args)

    t_kernel = t(lambda: _match_call_i8(*args))
    t_e2e = t(lambda: pallas_best_target(q, td, tl, inf2, inf2,
                                         jnp.float32(0.0), tv))

    nq_pad = -(-nq // QUERY_TILE_I8) * QUERY_TILE_I8
    nt_pad = -(-nt // TARGET_TILE_I8) * TARGET_TILE_I8
    flops = 4 * 2 * nq_pad * nt_pad * 128
    print(json.dumps({
        "nq": nq, "nt": nt,
        "kernel_s": round(t_kernel, 4),
        "e2e_s": round(t_e2e, 4),
        "mfu_kernel": round(flops / t_kernel / V5E_BF16_PEAK, 4),
        "mfu_e2e": round(flops / t_e2e / V5E_BF16_PEAK, 4),
    }))


if __name__ == "__main__":
    main()
