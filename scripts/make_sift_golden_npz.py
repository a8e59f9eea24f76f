"""Regenerate tests/data/sift_fused_cpu_img0.npz — the CPU-computed fused-SIFT
FeatureSet for fixture image 0 that the hardware parity suite compares against.

The hardware test (tests/test_tpu_parity.py::test_fused_sift_matches_cpu_golden)
used to recompute the UNFUSED path on the chip, costing minutes of cold XLA
compiles per run (VERDICT r2 Weak #3).  Instead the CPU result — itself gated
against the reference golden .uty dumps by tests/test_features_golden.py — is
committed once here and the chip only runs the fused program it actually ships.

Run on CPU:  JAX_PLATFORMS=cpu python scripts/make_sift_golden_npz.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"),
)

from ssrlcv_tpu.features.sift import generate_features
from ssrlcv_tpu.io import refdata

REF_2VIEW = "/root/reference/test/checkpoints/Pipeline2View"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                   "sift_fused_cpu_img0.npz")


def main():
    fixture = refdata.load_fixture_dir(REF_2VIEW, 2)
    px = fixture["images"][0].pixels
    fs = generate_features(px, image_id=0, fused=True)
    np.savez_compressed(
        OUT,
        loc=np.asarray(fs.loc),
        sigma=np.asarray(fs.sigma),
        theta=np.asarray(fs.theta),
        descriptors=np.asarray(fs.descriptors),
        mask=np.asarray(fs.mask),
    )
    n = int(np.asarray(fs.mask).sum())
    print(f"wrote {OUT}: {n} features / capacity {fs.capacity}")


if __name__ == "__main__":
    main()
