"""3-view golden tests: N-view triangulation + statistical filtering."""

import numpy as np
import pytest

from tests.conftest import requires_ref


@pytest.fixture(scope="module")
def matchset_3view(fixture_3view):
    from ssrlcv_tpu.core.types import MatchSet

    kp_par, kp_loc = fixture_3view["keypoints0"]
    mm_num, mm_idx = fixture_3view["multimatches0"]
    return MatchSet.from_flat(kp_par, kp_loc, mm_num, mm_idx)


@pytest.fixture(scope="module")
def cameras_3view(fixture_3view):
    from ssrlcv_tpu.io.images import cameras_from_refimages

    return cameras_from_refimages(fixture_3view["images"])


@requires_ref
def test_nview_triangulation_matches_reference(fixture_3view, cameras_3view, matchset_3view):
    from ssrlcv_tpu.geometry import bundles as B
    from ssrlcv_tpu.geometry import triangulation as T

    bd = B.generate_bundles(matchset_3view, cameras_3view)
    pc, total = T.n_view_triangulate(bd)
    ref = fixture_3view["points0"]
    mine = np.asarray(pc.points)
    assert mine.shape == ref.shape
    d = np.linalg.norm(mine - ref, axis=1)
    # fp32 3x3 least-squares solve noise at km scale; bound 20 m
    assert d.max() < 0.02, d.max()
    assert np.median(d) < 0.002


@requires_ref
def test_nview_statistical_filter_matches_reference(fixture_3view, cameras_3view, matchset_3view):
    from ssrlcv_tpu.geometry import filters as F

    ms = F.deterministic_statistical_filter(
        matchset_3view, cameras_3view, 3.0, 10, two_view=False
    )
    assert int(ms.count()) == fixture_3view["points1"].shape[0]


@requires_ref
def test_track_layout_3view(matchset_3view):
    nv = np.asarray(matchset_3view.num_views)
    m = np.asarray(matchset_3view.mask)
    assert nv[m].min() == 2 and nv[m].max() == 3
    par = np.asarray(matchset_3view.kp_parent)
    # all tracks rooted at image 0 (the reference's chain builder only roots
    # at images 0..n-3)
    assert (par[m, 0] == 0).all()


def test_build_tracks_semantics():
    """Unit test of the adjacency-chain transliteration on a hand-built
    pair-match graph (3 images)."""
    from ssrlcv_tpu.matching.tracks import build_tracks

    pair_matches = {
        (0, 1): np.array([[0, 5], [1, 6], [2, 7]]),
        (0, 2): np.array([[0, 9], [2, 11]]),
        (1, 2): np.array([[5, 9], [6, 10], [7, 12]]),
    }
    tracks = build_tracks(pair_matches, 3, [16, 16, 16])
    as_sets = [tuple(tr) for tr in tracks]
    # feature 0: adj = [(1,5),(2,9)]; chain via (1,5) -> adj[1][5] = [(2,9)]
    #   subset ok, size 1 -> accept track [(0,0),(1,5),(2,9)]
    assert ((0, 0), (1, 5), (2, 9)) in as_sets
    # feature 1: adj = [(1,6)]; first hop (1,6) -> adj[1][6]=[(2,10)]
    #   subset check: [(2,10)] vs prev [(1,6)] -> intersection empty != 1 -> bad
    assert not any(tr[0] == (0, 1) for tr in tracks)
    # feature 2: adj = [(1,7),(2,11)]; hop (1,7) -> adj[1][7]=[(2,12)];
    #   (2,12) not in prev adj -> bad match
    assert not any(tr[0] == (0, 2) for tr in tracks)
    # no tracks rooted at image 1 (guard i < n-2)
    assert not any(tr[0][0] == 1 for tr in tracks)


@requires_ref
def test_nview_bundle_adjust_reduces_error(cameras_3view, matchset_3view):
    """The reference's BundleAdjustNView is an unimplemented stub
    (PointCloudFactory.cu:2270); ours must actually optimise."""
    import jax.numpy as jnp

    from ssrlcv_tpu.config import BAParams
    from ssrlcv_tpu.ba.nview import bundle_adjust_nview

    # perturb camera 2 and recover
    cams_p = cameras_3view.replace(
        cam_rot=cameras_3view.cam_rot.at[2].add(jnp.array([5e-5, -5e-5, 2e-5]))
    )
    r = bundle_adjust_nview(matchset_3view, cams_p, BAParams(iterations=8))
    assert float(r.final_error) < float(r.initial_error)
