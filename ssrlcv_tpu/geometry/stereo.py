"""Dense stereo disparity.

TPU re-design of the reference's disparity path (generateDiparityMatches +
disparityScanMatching window-SAD kernels, MatchFactory.cu:1031-1414;
computeStereo depth kernels, PointCloudFactory.cu:23-160).

The CUDA design assigns one window-sized thread block per pixel and scans
disparities serially with shared-memory atomics.  The TPU formulation builds
the classic cost volume instead: for each disparity d the per-pixel SAD is a
box-filtered absolute difference of the shifted image pair — one fused
elementwise+reduce-window op per disparity, batched over the whole image, and
an argmin over the volume (first-minimum tie-break matches the reference's
strict-< scan order).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("max_disparity", "window", "direction"))
def disparity_scan_matching(
    query: jax.Array,            # (H, W) uint8
    target: jax.Array,           # (H, W) uint8
    max_disparity: int = 64,
    window: int = 11,
    direction: str = "right",
):
    """Window-SAD scanline disparity for rectified pairs
    (disparityScanMatching, MatchFactory.cu:1290-1360).

    direction: 'right' (target x >= query x), 'left', or 'undefined'
    (search centred, starting at x - max_disparity//2).

    Returns (disparity (H, W) int32 signed target-x offset, valid (H, W)).
    """
    h, w = query.shape
    q = query.astype(jnp.float32)
    t = target.astype(jnp.float32)
    half = window // 2

    if direction == "right":
        offsets = list(range(0, max_disparity))
    elif direction == "left":
        offsets = list(range(0, -max_disparity, -1))
    else:
        offsets = [o - max_disparity // 2 for o in range(max_disparity)]

    def sad_for_offset(o):
        shifted = jnp.roll(t, -o, axis=1)
        ad = jnp.abs(q - shifted)
        return jax.lax.reduce_window(
            ad, 0.0, jax.lax.add, (window, window), (1, 1), "SAME"
        )

    costs = jnp.stack([sad_for_offset(o) for o in offsets])  # (D, H, W)
    # out-of-image target windows are invalid for that disparity
    xs = jnp.arange(w)[None, None, :]
    offs = jnp.asarray(offsets, jnp.int32)[:, None, None]
    tx = xs + offs
    in_img = (tx - half >= 0) & (tx + half < w)
    costs = jnp.where(in_img, costs, jnp.inf)

    best = jnp.argmin(costs, axis=0)                         # first-min tie-break
    disparity = offs[:, 0, 0][best]
    valid = jnp.isfinite(jnp.min(costs, axis=0))
    # border windows of the query are invalid (reference's minimizedSize crop)
    ys = jnp.arange(h)[:, None]
    interior = (
        (jnp.arange(w)[None, :] >= half)
        & (jnp.arange(w)[None, :] < w - half - 1)
        & (ys >= half)
        & (ys < h - half - 1)
    )
    return disparity.astype(jnp.int32), valid & interior


def compute_stereo_scale(disp_matches_loc0, disp_matches_loc1, scale: float = 8.0):
    """z = scale * ||loc0 - loc1|| depth proxy (computeStereo,
    PointCloudFactory.cu:4440-4455; the camera-derived variant hard-codes
    scale 8.0 at :45)."""
    d = jnp.linalg.norm(disp_matches_loc0 - disp_matches_loc1, axis=-1)
    return jnp.concatenate([disp_matches_loc0, (scale * d)[..., None]], axis=-1)


def compute_stereo_focal(loc0, loc1, foc: float, baseline: float, doffset: float = 0.0):
    """z = foc*baseline/(x0 - x1 + doffset) (computeStereo 3-arg variant)."""
    z = foc * baseline / (loc0[..., 0] - loc1[..., 0] + doffset)
    return jnp.stack([loc1[..., 0], loc1[..., 1], z], axis=-1)


def heat_map(values: np.ndarray) -> np.ndarray:
    """Red->green->blue heat map over [0, 1] (heatMap,
    PointCloudFactory.cu:112-144)."""
    v = np.asarray(values, np.float32)
    lowhalf = v <= 0.5
    v2 = np.where(lowhalf, v * 2.0, v * 2.0 - 1.0)
    r = np.where(lowhalf, 255 * (1 - v2) + 0.5, 0)
    g = np.where(lowhalf, 255 * v2 + 0.5, 255 * (1 - v2) + 0.5)
    b = np.where(lowhalf, 0, 255 * v2 + 0.5)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def write_disparity_image(points: np.ndarray, path: str, interpolation_radius: int = 0) -> str:
    """Depth points -> normalised heat-map PNG (writeDisparityImage,
    PointCloudFactory.cu:149-227)."""
    from ssrlcv_tpu.io.images import write_image

    pts = np.asarray(points)
    xs = pts[:, 0].astype(np.int64)
    ys = pts[:, 1].astype(np.int64)
    z = pts[:, 2]
    w = int(xs.max()) + 1
    h = int(ys.max()) + 1
    depth = np.zeros((h, w), np.float32)
    depth[ys, xs] = z
    zmin, zmax = float(z.min()), float(z.max())
    norm = (depth - zmin) / max(zmax - zmin, 1e-12)
    if interpolation_radius > 0:
        from scipy.ndimage import uniform_filter

        norm = uniform_filter(norm, size=2 * interpolation_radius + 1)
    rgb = heat_map(norm)
    if not path.endswith(".png"):
        path += ".png"
    write_image(path, rgb)
    return path
