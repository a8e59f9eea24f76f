"""Bundle-adjustment tests (golden parity + optimizer behaviour)."""

import numpy as np
import pytest

from tests.conftest import requires_ref


@pytest.fixture(scope="module")
def filtered_matchset(fixture_2view, cameras_2view, matchset_2view):
    from ssrlcv_tpu.geometry import filters as F

    ms = F.linear_cutoff_filter(matchset_2view, cameras_2view, 100.0)
    return F.deterministic_statistical_filter(ms, cameras_2view, 3.0, 10)


@requires_ref
def test_reference_mode_matches_golden_ba_cloud(fixture_2view, cameras_2view, filtered_matchset):
    """The reference's default-flag BA applies no update (fixed_camera short
    circuit, PointCloudFactory.cu:2149); its golden BA cloud equals the
    filtered cloud.  reference mode must reproduce it."""
    from ssrlcv_tpu.ba.two_view import bundle_adjust_two_view

    r = bundle_adjust_two_view(filtered_matchset, cameras_2view, iterations=10, mode="reference")
    mine = np.asarray(r.cloud.points)[np.asarray(filtered_matchset.mask)]
    ref = fixture_2view["points2"]
    assert mine.shape == ref.shape
    assert np.linalg.norm(mine - ref, axis=1).max() < 1e-3
    assert float(r.final_error) == float(r.initial_error)


@requires_ref
def test_lm_reduces_error(cameras_2view, filtered_matchset):
    from ssrlcv_tpu.ba.two_view import bundle_adjust_two_view

    r = bundle_adjust_two_view(filtered_matchset, cameras_2view, iterations=10, mode="lm")
    assert float(r.final_error) <= float(r.initial_error)
    assert float(r.final_error) < 0.95 * float(r.initial_error)  # >5% reduction


@requires_ref
def test_lm_recovers_perturbed_camera(cameras_2view, filtered_matchset):
    """Perturb camera 1 and check LM pulls the error back near the
    unperturbed level — the real BA correctness criterion."""
    import jax.numpy as jnp

    from ssrlcv_tpu.ba.two_view import bundle_adjust_two_view, make_objective, _pack

    obj = make_objective(filtered_matchset, cameras_2view)
    base_err = float(obj(_pack(cameras_2view)))

    cams_p = cameras_2view.replace(
        cam_rot=cameras_2view.cam_rot.at[1].add(jnp.array([1e-4, -1e-4, 5e-5]))
    )
    pert_err = float(obj(_pack(cams_p)))
    assert pert_err > 2 * base_err  # perturbation is visible

    r = bundle_adjust_two_view(filtered_matchset, cams_p, iterations=25, mode="lm")
    assert float(r.final_error) < 0.25 * pert_err, (base_err, pert_err, float(r.final_error))


@requires_ref
def test_gradient_finite_with_padded_tracks(cameras_2view, matchset_2view):
    """Regression: padded (masked) tracks carry coincident zero rays whose
    0/0 midpoint used to poison the BA gradient through jnp.where
    (0 * nan = nan in reverse mode).  The objective must stay differentiable
    on capacity-padded matchsets — the pipeline's normal case."""
    import jax
    import jax.numpy as jnp

    from ssrlcv_tpu.ba.two_view import _pack, make_objective
    from ssrlcv_tpu.parallel.sharded import pad_matchset

    ms = pad_matchset(matchset_2view, 128)
    assert int(ms.capacity) > int(ms.count())  # real padding present
    obj = make_objective(ms, cameras_2view)
    g = jax.grad(lambda p: obj(p.reshape(2, 6)))(_pack(cameras_2view).reshape(-1))
    assert np.isfinite(np.asarray(g)).all()
    # padding must not change the objective value either
    obj0 = make_objective(matchset_2view, cameras_2view)
    np.testing.assert_allclose(
        float(obj(_pack(cameras_2view))), float(obj0(_pack(cameras_2view))), rtol=1e-6
    )


@requires_ref
def test_camera0_stays_fixed(cameras_2view, filtered_matchset):
    from ssrlcv_tpu.ba.two_view import bundle_adjust_two_view

    r = bundle_adjust_two_view(filtered_matchset, cameras_2view, iterations=5, mode="lm")
    np.testing.assert_array_equal(
        np.asarray(r.cameras.cam_pos[0]), np.asarray(cameras_2view.cam_pos[0])
    )
    np.testing.assert_array_equal(
        np.asarray(r.cameras.cam_rot[0]), np.asarray(cameras_2view.cam_rot[0])
    )
