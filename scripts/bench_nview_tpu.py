"""FULL 6-stage 3-view N-view pipeline on real hardware -> NVIEW_r{N}.json.

End-to-end (VERDICT r4 #3): batched SIFT on the three everest fixture images
-> exhaustive seeded double-constrained pairing (3 pairs) -> transitive track
building -> N-view least-squares triangulation -> statistical filtering
(bug-compatible reference error mode) -> N-view bundle adjustment, timed with
real host-fetch sync and compared against the reference golden MultiMatch
count and the initial AND filtered golden clouds (test/Pipeline3View
0_6float3 / 1_6float3).  The wall numbers are the N-view analogue of
bench.py's 2-view headline.
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

    from ssrlcv_tpu.ba.nview import bundle_adjust_nview
    from ssrlcv_tpu.config import BAParams
    from ssrlcv_tpu.geometry import filters as F
    from ssrlcv_tpu.geometry.triangulation import triangulate_matches

    def run(timings=None):
        t0 = time.perf_counter()
        feats = generate_features_many(
            [im.pixels for im in fx["images"]], image_ids=[0, 1, 2])
        np.asarray(feats[-1].descriptors[0, 0])
        t1 = time.perf_counter()
        ms = generate_matches_exhaustive(feats, cams, params, seed_features=seed)
        t2 = time.perf_counter()
        pc, _ = triangulate_matches(ms, cams, two_view=False)
        np.asarray(pc.points[0, 0])
        t3 = time.perf_counter()
        # stage 4: N-view statistical filter (doFiltering, Pipeline.cu:336;
        # bug-compatible last-view^2/numLines error mode inside)
        ms_f = F.deterministic_statistical_filter(ms, cams, 3.0, 10, two_view=False)
        pc_f, _ = triangulate_matches(ms_f, cams, two_view=False)
        np.asarray(pc_f.points[0, 0])
        t4 = time.perf_counter()
        # stage 5: N-view bundle adjustment (the reference's BundleAdjustNView
        # is a stub, PointCloudFactory.cu:2270 — ours optimises for real)
        ba = bundle_adjust_nview(ms_f, cams, BAParams(iterations=5))
        np.asarray(ba.cloud.points[0, 0])
        t5 = time.perf_counter()
        if timings is not None:
            timings.update(sift3=t1 - t0, match_tracks=t2 - t1,
                           triangulate=t3 - t2, filter=t4 - t3,
                           bundle_adjust=t5 - t4, total=t5 - t0)
        return ms, pc, ms_f, pc_f, ba

    run()  # warmup / compile
    timings = {}
    ms, pc, ms_f, pc_f, ba = run(timings)

    n_tracks = int(ms.count())
    golden_tracks = len(fx["multimatches0"][0])
    # triangulation-validity mask, not the match mask: tracks whose normal
    # system went singular carry garbage point rows
    mine = np.asarray(pc.points)[np.asarray(pc.mask)]
    d, _ = cKDTree(fx["points0"]).query(mine)

    n_filtered = int(ms_f.count())
    golden_filtered = fx["points1"].shape[0]
    mine_f = np.asarray(pc_f.points)[np.asarray(pc_f.mask)]
    d_f, _ = cKDTree(fx["points1"]).query(mine_f)

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
        "filtered_tracks": n_filtered,
        "golden_filtered": golden_filtered,
        "filtered_err_pct": round(
            100.0 * abs(n_filtered - golden_filtered) / golden_filtered, 3),
        "filtered_vs_golden_m_median": round(float(np.median(d_f)) * 1000.0, 3),
        "ba_initial_error": round(float(ba.initial_error), 6),
        "ba_final_error": round(float(ba.final_error), 6),
        # honest caveat: with only camera 0 pinned the N-view angular
        # objective has gauge freedom — the optimiser can lower it while
        # translating/shearing the whole reconstruction, so the post-BA
        # cloud can drift from the golden frame even as the error drops
        # (the reference's BundleAdjustNView is an unimplemented stub, so
        # there is no reference behaviour to pin this to)
        "ba_cloud_vs_golden_m_median": round(float(np.median(
            cKDTree(fx["points0"]).query(
                np.asarray(ba.cloud.points)[np.asarray(ba.cloud.mask)])[0]
        )) * 1000.0, 3) if int(np.asarray(ba.cloud.mask).sum()) else None,
    }
    line = json.dumps(out)
    print(line)
    with open(os.path.join(os.path.dirname(__file__), "..", "NVIEW_r05.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
