"""Golden-regression tests against the reference's committed checkpoints.

Mirrors the reference's own per-stage strategy (test/Pipeline.cu:257-436):
load stage *inputs* from fixtures, run our stage, compare against the
committed stage *outputs*.  Tolerances, not bit patterns — the reference's
atomicAdd reductions are themselves nondeterministic (SURVEY.md §4).
"""

import numpy as np
import pytest

from tests.conftest import requires_ref


@requires_ref
class TestTriangulation2View:
    def test_two_view_matches_reference_cloud(self, fixture_2view, cameras_2view, matchset_2view):
        from ssrlcv_tpu.geometry import bundles as B
        from ssrlcv_tpu.geometry import triangulation as T

        bd = B.generate_bundles(matchset_2view, cameras_2view)
        pc, total = T.two_view_triangulate(bd)
        ref = fixture_2view["points0"]
        mine = np.asarray(pc.points)
        assert mine.shape == ref.shape
        diff = np.linalg.norm(mine - ref, axis=1)
        # fp32 noise at km scale: reference's own tests use exact compare on
        # the same hardware; cross-hardware we bound by < 1 m.
        assert diff.max() < 1e-3, diff.max()
        assert np.asarray(pc.mask).all()
        assert float(total) > 0

    def test_ray_generation_unit_norm(self, cameras_2view, matchset_2view):
        from ssrlcv_tpu.geometry import bundles as B

        bd = B.generate_bundles(matchset_2view, cameras_2view)
        norms = np.linalg.norm(np.asarray(bd.vec), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_n_view_agrees_with_two_view(self, cameras_2view, matchset_2view):
        """For 2-view tracks the least-squares intersection must land near
        the skew-line midpoint."""
        from ssrlcv_tpu.geometry import bundles as B
        from ssrlcv_tpu.geometry import triangulation as T

        bd = B.generate_bundles(matchset_2view, cameras_2view)
        pc2, _ = T.two_view_triangulate(bd)
        pcn, _ = T.n_view_triangulate(bd)
        m = np.asarray(pcn.mask)
        diff = np.linalg.norm(np.asarray(pc2.points)[m] - np.asarray(pcn.points)[m], axis=1)
        assert np.median(diff) < 0.05, np.median(diff)
