"""Dense SIFT hardware timing (VERDICT r4 #7 + the PARITY.md kernel-path
plan): times generate_dense_sift on one everest1024 fixture image on the
real chip, fast (stencil orientations + Pallas descriptor kernel,
device-resident) vs the original gather path, and writes DENSE_r05.json.

Usage: python scripts/bench_dense_tpu.py [--gather] [--out DENSE_r05.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))

import numpy as np  # noqa: E402

from ssrlcv_tpu.io import refdata  # noqa: E402

FIXTURE = "/root/reference/test/checkpoints/Pipeline2View"


def time_path(px, fast: bool, reps: int = 3):
    from ssrlcv_tpu.features.dense import generate_dense_sift

    t0 = time.perf_counter()
    fs = generate_dense_sift(px, image_id=0, fast=fast)
    np.asarray(fs.descriptors[0])  # real fetch — block_until_ready lies on axon
    cold = time.perf_counter() - t0
    n = int(np.asarray(fs.mask).sum())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fs = generate_dense_sift(px, image_id=0, fast=fast)
        np.asarray(fs.descriptors[0])
        best = min(best, time.perf_counter() - t0)
    return best, cold, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gather", action="store_true",
                    help="also re-time the original gather path (slow)")
    ap.add_argument("--out", default="DENSE_r05.json")
    args = ap.parse_args()

    fx = refdata.load_fixture_dir(FIXTURE, 2)
    px = fx["images"][0].pixels

    fast_s, fast_cold, n_fast = time_path(px, fast=True)
    rec = {
        "metric": "dense_sift_s_per_image",
        "value": round(fast_s, 3),
        "unit": "s",
        "cold_s": round(fast_cold, 2),
        "features": n_fast,
        "image": "everest1024 img0",
        "path": "fast (stencil orientation field + Pallas descriptor kernel, "
                "device-resident)",
    }
    if args.gather:
        g_s, g_cold, n_g = time_path(px, fast=False)
        rec["gather_path_s"] = round(g_s, 3)
        rec["gather_features"] = n_g
    with open(args.out, "w") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
