"""3-view N-view pipeline on real hardware -> NVIEW_r{N}.json.

End-to-end: batched SIFT on the three everest fixture images -> exhaustive
seeded double-constrained pairing (3 pairs) -> transitive track building ->
N-view least-squares triangulation, timed with real host-fetch sync and
compared against the reference golden MultiMatch count and cloud
(test/Pipeline3View).  The wall numbers are the N-view analogue of bench.py's
2-view headline.
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

import numpy as np

FIXTURE = "/root/reference/test/checkpoints/Pipeline3View"


def main():
    from scipy.spatial import cKDTree

    from ssrlcv_tpu.config import MatchParams
    from ssrlcv_tpu.features.sift import features_from_refdata, generate_features_many
    from ssrlcv_tpu.geometry import bundles as B
    from ssrlcv_tpu.geometry import triangulation as T
    from ssrlcv_tpu.io import refdata
    from ssrlcv_tpu.io.images import cameras_from_refimages
    from ssrlcv_tpu.matching.tracks import generate_matches_exhaustive

    fx = refdata.load_fixture_dir(FIXTURE, 3)
    cams = cameras_from_refimages(fx["images"])
    seed = features_from_refdata(fx["seed_features"])
    params = MatchParams(epsilon=25.0, delta=5.0)

    def run(timings=None):
        t0 = time.perf_counter()
        feats = generate_features_many(
            [im.pixels for im in fx["images"]], image_ids=[0, 1, 2])
        np.asarray(feats[-1].descriptors[0, 0])
        t1 = time.perf_counter()
        ms = generate_matches_exhaustive(feats, cams, params, seed_features=seed)
        t2 = time.perf_counter()
        pc, _ = T.n_view_triangulate(B.generate_bundles(ms, cams))
        pts = np.asarray(pc.points)
        t3 = time.perf_counter()
        if timings is not None:
            timings.update(sift3=t1 - t0, match_tracks=t2 - t1,
                           triangulate=t3 - t2, total=t3 - t0)
        return ms, pc

    run()  # warmup / compile
    timings = {}
    ms, pc = run(timings)

    n_tracks = int(ms.count())
    golden_tracks = len(fx["multimatches0"][0])
    mine = np.asarray(pc.points)[np.asarray(ms.mask)]
    d, _ = cKDTree(fx["points0"]).query(mine)

    out = {
        "metric": "nview_3view_fps",
        "value": round(3.0 / timings["total"], 4),
        "unit": "frames/s",
        "e2e_seconds": round(timings["total"], 3),
        "stages_s": {k: round(v, 3) for k, v in timings.items() if k != "total"},
        "tracks": n_tracks,
        "golden_tracks": golden_tracks,
        "track_err_pct": round(100.0 * abs(n_tracks - golden_tracks) / golden_tracks, 3),
        "cloud_vs_golden_m_median": round(float(np.median(d)) * 1000.0, 3),
        "cloud_within_100m_pct": round(100.0 * float((d < 0.1).mean()), 2),
    }
    line = json.dumps(out)
    print(line)
    with open(os.path.join(os.path.dirname(__file__), "..", "NVIEW_r04.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
