"""doPoseEstimation on real hardware -> POSE_r{N}.json (VERDICT r4 #4).

Runs the reference pose stage (Pipeline.cu:74-171) on the chip for the
2-view everest fixture pair: seeded double-constrained matching at the pose
thresholds (rel 0.6, abs 10^2, eps 100 px, delta 3 km — Pipeline.cu:82,93),
then the LM relative-pose refinement whose <=50-iteration schedule runs as
DEVICE control flow (pose/lm.py lax.while_loop — one dispatch + one fetch,
instead of a >=25 ms tunnel round trip per outer iteration).

Reports the pose-stage device time and the post-pose reconstruction quality:
matches are re-generated and re-triangulated with the refined camera 1 and
compared against the golden initial cloud.
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

FIXTURE = "/root/reference/test/checkpoints/Pipeline2View"


def main():
    from scipy.spatial import cKDTree

    from ssrlcv_tpu.config import MatchParams, PoseParams
    from ssrlcv_tpu.features.sift import features_from_refdata, generate_features_many
    from ssrlcv_tpu.geometry.triangulation import triangulate_matches
    from ssrlcv_tpu.io import refdata
    from ssrlcv_tpu.io.images import cameras_from_refimages
    from ssrlcv_tpu.matching import match as M
    from ssrlcv_tpu.pose.lm import lm_optimize, apply_pose

    fx = refdata.load_fixture_dir(FIXTURE, 2)
    cams = cameras_from_refimages(fx["images"])
    seed = features_from_refdata(fx["seed_features"])

    f0, f1 = generate_features_many(
        [fx["images"][0].pixels, fx["images"][1].pixels], image_ids=[0, 1])
    sd = M.seed_distances(f0, seed)

    pp = PoseParams()
    pose_mp = MatchParams(
        relative_threshold=pp.relative_threshold,
        absolute_threshold=pp.absolute_threshold,
        epsilon=pp.epsilon, delta=pp.delta,
    )
    dm = M.match_double_constrained(f0, f1, cams, 0, 1, pose_mp, seed_dist=sd)
    ms = M.matches_to_matchset(dm, f0, f1, 0, 1)
    n_pose_matches = int(np.asarray(ms.mask).sum())

    def pose_once():
        pose = lm_optimize(ms, cams, pp)
        np.asarray(pose.rot)  # real host fetch (block_until_ready lies on axon)
        return pose

    pose = pose_once()  # warmup / compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        pose = pose_once()
        best = min(best, time.perf_counter() - t0)

    new_cams = apply_pose(cams, pose)

    # post-pose quality: re-match + re-triangulate under the refined camera
    mp = MatchParams(epsilon=25.0, delta=5.0)
    dm2 = M.match_double_constrained(f0, f1, new_cams, 0, 1, mp, seed_dist=sd)
    ms2 = M.matches_to_matchset(dm2, f0, f1, 0, 1)
    pc, err = triangulate_matches(ms2, new_cams)
    mine = np.asarray(pc.points)[np.asarray(pc.mask)]
    d, _ = cKDTree(fx["points0"]).query(mine)

    out = {
        "metric": "pose_stage_device_s",
        "value": round(best, 4),
        "unit": "s",
        "pose_matches": n_pose_matches,
        "pose_rot": [round(float(v), 8) for v in np.asarray(pose.rot)],
        "pose_pos": [round(float(v), 8) for v in np.asarray(pose.pos)],
        "cam1_pos_shift_m": round(float(np.linalg.norm(
            np.asarray(new_cams.cam_pos[1] - cams.cam_pos[1]))) * 1000.0, 3),
        "post_pose_matches": int(np.asarray(ms2.mask).sum()),
        "post_pose_points": int(np.asarray(pc.mask).sum()),
        "post_pose_cloud_vs_golden_m_median": round(float(np.median(d)) * 1000.0, 3),
        "post_pose_total_linear_error": round(float(err), 6),
    }
    line = json.dumps(out)
    print(line)
    with open(os.path.join(os.path.dirname(__file__), "..", "POSE_r05.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
