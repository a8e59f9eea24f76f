"""Roadmap surface mirroring the reference's `include/need_implementing/`
stubs (FAST_FeatureFactory.cuh, SURF_FeatureFactory.cuh, KDTree.cuh).

Status relative to the reference:

- FAST: the reference stub is EMPTY; this framework ships a working detector
  (ssrlcv_tpu.features.fast.detect_fast) — capability beyond the reference.
- KDTree: the reference stub is EMPTY; host-side exact NN is available via
  scipy cKDTree in mesh.meshfactory, and on-device approximate kNN via the
  Morton octree (mesh.octree.knn) — capability beyond the reference.
- SURF: unimplemented in both; raises, matching the reference's empty stub.
"""

from __future__ import annotations


def fast_feature_factory(*args, **kwargs):
    """Reference: FAST_FeatureFactory stub. Implemented here — use
    ssrlcv_tpu.features.fast.detect_fast."""
    from ssrlcv_tpu.features.fast import detect_fast

    return detect_fast(*args, **kwargs)


def surf_feature_factory(*args, **kwargs):
    """Reference: SURF_FeatureFactory (declared-but-empty,
    include/need_implementing/SURF_FeatureFactory.cuh). Not implemented."""
    raise NotImplementedError(
        "SURF is a roadmap stub in the reference (need_implementing/"
        "SURF_FeatureFactory.cuh) and is not implemented here either."
    )


def kdtree(points, query, k: int = 8):
    """Reference: KDTree stub (need_implementing/KDTree.cuh). Host-side exact
    kNN via scipy; on-device approximate kNN lives in mesh.octree.knn."""
    import numpy as np
    from scipy.spatial import cKDTree

    d, i = cKDTree(np.asarray(points)).query(np.asarray(query), k=k)
    return d, i
