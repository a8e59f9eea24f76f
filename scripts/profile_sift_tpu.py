"""Per-phase device-time breakdown of the TPU (Pallas-kernel) SIFT path.

Times each dispatch of _sift_tpu_agg with real host-fetch synchronization
(block_until_ready does not wait on the tunneled axon backend) and prints a
JSON breakdown — the profile VERDICT r3 #2 asked for.  Run on hardware:

    python scripts/profile_sift_tpu.py
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

from ssrlcv_tpu.config import SIFTParams
from ssrlcv_tpu.features import sift as S
from ssrlcv_tpu.features.patches import patches_supported
from ssrlcv_tpu.io import refdata

FIXTURE = "/root/reference/test/checkpoints/Pipeline2View"


def fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def t(fn, reps=3):
    fetch(fn())  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    fx = refdata.load_fixture_dir(FIXTURE, 2)
    px = jnp.asarray(fx["images"][0].pixels)
    params = SIFTParams()
    h, w = int(px.shape[0]), int(px.shape[1])

    prof = {}
    prof["detect_all"] = t(lambda: S._sift_detect_all(px, params, h, w))

    per_octave = S._sift_detect_all(px, params, h, w)
    jax.block_until_ready(per_octave)

    buckets = list(S._describe_buckets(params))
    nb = len(buckets)
    counts = np.asarray(S._bucket_counts(tuple(k for k, _ in per_octave), params))

    outs = []
    total_orient = total_desc = 0.0
    breakdown = []
    for o, (kps, grads) in enumerate(per_octave):
        ph, pw = int(grads.shape[1]), int(grads.shape[2])
        pixel_width = float(2.0 ** (params.starting_octave + o))
        for bi, b in enumerate(buckets):
            w_o, w_d = S._bucket_windows(params, int(b))
            if not patches_supported(ph, pw, w_d):
                bcap = S._bucket_capacity(params, o, b, h, w)
                outs.append(S._describe_bucket_gather(
                    kps, grads, params, int(b), bcap, w_o, w_d, pixel_width))
                continue
            c = int(counts[o * nb + bi])
            ocap = S._quantize_cap(c)
            dto = t(lambda: S._orient_bucket_kernel(
                kps, grads, params, int(b), ocap, w_o, pixel_width))
            ori, n_ori = S._orient_bucket_kernel(
                kps, grads, params, int(b), ocap, w_o, pixel_width)
            n_ori = int(np.asarray(n_ori))
            dcap = min(S._quantize_cap(n_ori, frac=16), 2 * ocap)
            out_cap = max(dcap, S._bucket_capacity(params, o, b, h, w))
            dtd = t(lambda: S._desc_bucket_kernel(
                ori, grads, params, int(b), dcap, w_d, pixel_width, out_cap))
            outs.append(S._desc_bucket_kernel(
                ori, grads, params, int(b), dcap, w_d, pixel_width, out_cap))
            total_orient += dto
            total_desc += dtd
            breakdown.append({"octave": o, "blur": b, "live": c,
                              "ocap": ocap, "n_ori": n_ori, "dcap": dcap,
                              "w_o": w_o, "w_d": w_d,
                              "orient_s": round(dto, 4),
                              "desc_s": round(dtd, 4)})
    prof["orient_total"] = total_orient
    prof["desc_total"] = total_desc

    outs_t = tuple(outs)
    prof["aggregate"] = t(lambda: S._aggregate_device(outs_t, jnp.int32(0), params))

    prof["tpu_agg_e2e"] = t(lambda: S._sift_tpu_agg(px, 0, params, h, w))
    prof = {k: round(v, 4) for k, v in prof.items()}
    prof["buckets"] = breakdown
    print(json.dumps(prof, indent=1))


if __name__ == "__main__":
    main()
