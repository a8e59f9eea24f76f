"""Pallas patch-extraction and orientation-kernel tests (interpret mode on
CPU; the compiled path is covered by the -m tpu hardware gate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_extract_patches_and_sampling_exact():
    from ssrlcv_tpu.features.patches import LW, extract_patches, patch_rows, sample_in_patches

    rng = np.random.default_rng(0)
    h, w = 320, 512
    gx = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    gy = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    k, wmax = 37, 12  # k not a multiple of KB; includes near-edge locs
    loc = jnp.asarray(rng.uniform(2, min(h, w) - 3, (k, 2)).astype(np.float32))

    px, py, y0, x0 = extract_patches(gx, gy, loc, wmax, interpret=True)
    spa = patch_rows(wmax)
    assert px.shape == (k, spa, LW)

    gxn, gyn = np.asarray(gx), np.asarray(gy)
    pxn, y0n, x0n = np.asarray(px), np.asarray(y0), np.asarray(x0)
    for kk in (0, 5, 36):
        np.testing.assert_array_equal(
            pxn[kk], gxn[y0n[kk]:y0n[kk] + spa, x0n[kk]:x0n[kk] + LW])

    # in-patch sampling == direct gather for every in-patch coordinate
    offs = np.arange(2 * wmax + 1) - wmax
    cx = np.round(np.asarray(loc)[:, 0]).astype(np.int32)
    cy = np.round(np.asarray(loc)[:, 1]).astype(np.int32)
    yi = np.clip(cy[:, None, None] + offs[None, :, None], 0, h - 1)
    xi = np.clip(cx[:, None, None] + offs[None, None, :], 0, w - 1)
    gxs, gys = sample_in_patches(px, py, y0, x0, jnp.asarray(yi), jnp.asarray(xi))
    yb, xb = np.broadcast_arrays(yi, xi)
    np.testing.assert_array_equal(np.asarray(gxs), gxn[yb, xb])
    np.testing.assert_array_equal(np.asarray(gys), gyn[yb, xb])


def test_orientation_kernel_matches_gather_histograms():
    """The fused Pallas orientation histogram (interpret mode) must agree
    with the XLA gather path to f32 reduction-order noise."""
    from ssrlcv_tpu.config import SIFTParams
    from ssrlcv_tpu.features.detector import SSKeyPoints
    from ssrlcv_tpu.features.orientation import _histogram_for_keypoints

    rng = np.random.default_rng(3)
    params = SIFTParams()
    h, w = 320, 384
    grads = jnp.asarray(rng.standard_normal((3, h, w, 2)).astype(np.float32))
    k, w_max = 24, 12
    loc = jnp.asarray(rng.uniform(w_max + 2, 300, (k, 2)).astype(np.float32))
    sigma = jnp.asarray(rng.uniform(1.0, 2.5, (k,)).astype(np.float32))
    blur = jnp.ones((k,), jnp.int32)
    mask = jnp.ones((k,), bool)

    ref_hist, ref_valid = _histogram_for_keypoints(
        grads, blur, loc, sigma, mask, 1.0,
        params.orientation_contrib_width, w_max)
    got_hist, got_valid = _histogram_for_keypoints(
        grads[1], blur, loc, sigma, mask, 1.0,
        params.orientation_contrib_width, w_max, use_kernel=True)

    np.testing.assert_array_equal(np.asarray(ref_valid), np.asarray(got_valid))
    np.testing.assert_allclose(
        np.asarray(got_hist), np.asarray(ref_hist), rtol=2e-5, atol=1e-6)


def test_atan2_polynomial_accuracy():
    from ssrlcv_tpu.features.orient_kernel import _atan2

    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal(4096).astype(np.float32) * 10)
    x = jnp.asarray(rng.standard_normal(4096).astype(np.float32) * 10)
    got = np.asarray(_atan2(y, x))
    ref = np.arctan2(np.asarray(y), np.asarray(x))
    err = np.abs(got - ref)
    assert err.max() < 1e-6, err.max()  # << the 10-degree bin width


def test_descriptor_kernel_bit_exact_vs_gather():
    """The fused Pallas descriptor kernel (interpret mode) must reproduce
    the gather path's descriptors bit-exactly: the in-VMEM row-sweep samples
    the identical rotated coordinates."""
    from ssrlcv_tpu.config import SIFTParams
    from ssrlcv_tpu.features.descriptor import fill_descriptors
    from ssrlcv_tpu.features.detector import SSKeyPoints

    rng = np.random.default_rng(7)
    params = SIFTParams()
    h, w = 320, 384
    grads = jnp.asarray(rng.standard_normal((3, h, w, 2)).astype(np.float32))
    k, w_max = 24, 12
    kps = SSKeyPoints(
        blur=jnp.ones((k,), jnp.int32),
        loc=jnp.asarray(rng.uniform(w_max + 4, 300, (k, 2)).astype(np.float32)),
        intensity=jnp.zeros((k,), jnp.float32),
        sigma=jnp.asarray(rng.uniform(1.0, 2.0, (k,)).astype(np.float32)),
        theta=jnp.asarray(rng.uniform(0, 2 * np.pi, (k,)).astype(np.float32)),
        mask=jnp.ones((k,), bool),
    )
    d_ref, loc_ref = fill_descriptors(grads, kps, 1.0, params, w_max=w_max)
    d_ker, loc_ker = fill_descriptors(
        grads[1], kps, 1.0, params, w_max=w_max, use_kernel=True)
    np.testing.assert_array_equal(np.asarray(d_ref), np.asarray(d_ker))
    np.testing.assert_array_equal(np.asarray(loc_ref), np.asarray(loc_ker))
