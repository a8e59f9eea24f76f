"""Golden-regression for the filtering stage (reference Filtering2View,
test/Pipeline.cu:329): linear cutoff (100 km) then deterministic statistical
filter (3 sigma, every 10th error) must reproduce the committed filtered
cloud."""

import numpy as np

from tests.conftest import requires_ref


@requires_ref
def test_filtering_2view_matches_reference(fixture_2view, cameras_2view, matchset_2view):
    from ssrlcv_tpu.geometry import bundles as B
    from ssrlcv_tpu.geometry import filters as F
    from ssrlcv_tpu.geometry import triangulation as T

    ms1 = F.linear_cutoff_filter(matchset_2view, cameras_2view, 100.0)
    ms2 = F.deterministic_statistical_filter(ms1, cameras_2view, 3.0, 10)
    ref = fixture_2view["points1"]
    assert int(ms2.count()) == ref.shape[0]

    bd = B.generate_bundles(ms2, cameras_2view)
    pc, _ = T.two_view_triangulate(bd)
    mine = np.asarray(pc.points)[np.asarray(ms2.mask)]
    diff = np.linalg.norm(mine - ref, axis=1)
    assert diff.max() < 1e-3, diff.max()


@requires_ref
def test_compact_matchset_preserves_order(matchset_2view, cameras_2view):
    from ssrlcv_tpu.geometry import filters as F

    ms = F.linear_cutoff_filter(matchset_2view, cameras_2view, 0.001)
    n = int(ms.count())
    packed = F.compact_matchset(ms)
    assert int(packed.count()) == n
    m = np.asarray(packed.mask)
    assert m[:n].all() and not m[n:].any()
