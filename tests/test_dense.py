"""Dense SIFT + Window_NxN patch descriptor tests."""

import numpy as np
import jax.numpy as jnp


def _texture(h=96, w=96, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h // 8, w // 8)).astype(np.uint8)
    img = np.kron(base, np.ones((8, 8), np.uint8))
    return img


def test_dense_sift_covers_interior():
    from ssrlcv_tpu.config import SIFTParams
    from ssrlcv_tpu.features.dense import generate_dense_sift

    img = _texture()
    fs = generate_dense_sift(img, SIFTParams(max_orientations=1))
    n = int(fs.count())
    interior = (96 - 24) * (96 - 24)
    # most interior pixels produce an oriented descriptor
    assert n > 0.5 * interior, (n, interior)
    loc = np.asarray(fs.loc)[:n]
    assert loc.min() >= 12 - 1e-5 and loc.max() < 96 - 12


def test_window_features_patch_content():
    from ssrlcv_tpu.features.dense import generate_window_features

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    wf = generate_window_features(img, window=3)
    # first patch = rows 0..2, cols 0..2; its loc is the centre (1, 1)
    np.testing.assert_array_equal(np.asarray(wf.loc[0]), [1, 1])
    np.testing.assert_array_equal(
        np.asarray(wf.descriptors[0]), img[0:3, 0:3].reshape(-1)
    )


def test_sad_matching_finds_identical_patch():
    from ssrlcv_tpu.features.dense import generate_window_features, sad_best_target

    img = _texture(48, 48, seed=1)
    shifted = np.roll(img, 5, axis=1)  # target x = query x + 5
    q = generate_window_features(img, window=9)
    t = generate_window_features(shifted, window=9)
    idx, dist = sad_best_target(q.descriptors, t.descriptors, t.mask)
    qloc = np.asarray(q.loc)
    tloc = np.asarray(t.loc)[np.asarray(idx)]
    # away from the wrap seam, the best match should be at x+5
    inner = (qloc[:, 0] > 8) & (qloc[:, 0] < 30)
    dx = tloc[inner, 0] - qloc[inner, 0]
    assert (dx == 5).mean() > 0.8, (dx == 5).mean()
    assert float(np.median(np.asarray(dist)[inner])) == 0.0
