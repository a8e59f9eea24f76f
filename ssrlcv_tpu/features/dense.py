"""Dense SIFT and dense Window_NxN patch descriptors.

TPU re-design of the reference's dense paths:

  * dense SIFT (generateFeatures dense=true, SIFT_FeatureFactory.cu:32-54 +
    createFeatures :171-230): a descriptor at every interior pixel (12 px
    SIFTBORDER) of the min-max-normalised image, orientation window
    ceil(3*1.5)=5 and descriptor window ceil(6)=6 at unit sigma — exactly
    the windows our sigma-parameterised machinery produces for sigma=1,
    pixel_width=1.
  * Window_NxN SAD patch descriptors (Feature.cuh:96-130,
    FeatureFactory generateNxNWindows): the raw NxN pixel patch at every
    interior pixel; matching uses sum-of-absolute-differences.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ssrlcv_tpu.config import SIFTParams
from ssrlcv_tpu.core.types import FeatureSet
from ssrlcv_tpu.features.descriptor import fill_descriptors
from ssrlcv_tpu.features.detector import SSKeyPoints
from ssrlcv_tpu.features.orientation import compute_orientations
from ssrlcv_tpu.ops import image_ops as ops

WINDOW_SIZES = (3, 9, 15, 25, 31)  # the reference's Window_NxN instantiations


def _interior_grid(h: int, w: int, border: int):
    ys, xs = np.meshgrid(
        np.arange(border, h - border), np.arange(border, w - border), indexing="ij"
    )
    return np.stack([xs.reshape(-1), ys.reshape(-1)], axis=1).astype(np.float32)


def generate_dense_sift(
    pixels: np.ndarray | jax.Array,
    params: SIFTParams | None = None,
    image_id: int = -1,
    chunk: int = 4096,
) -> FeatureSet:
    """Dense SIFT: one (or up to max_orientations) descriptor per interior
    pixel of the normalised image."""
    params = params or SIFTParams()
    pixels = jnp.asarray(pixels)
    if pixels.ndim == 3:
        pixels = ops.to_bw(pixels)
    h, w = int(pixels.shape[0]), int(pixels.shape[1])

    img = ops.normalize_minmax(ops.to_float(pixels))
    grads = ops.pixel_gradients(img)[None]  # (1, H, W, 2)

    locs = _interior_grid(h, w, params.border)
    n = len(locs)
    kps = SSKeyPoints(
        blur=jnp.zeros(n, jnp.int32),
        loc=jnp.asarray(locs),
        intensity=jnp.zeros(n, jnp.float32),
        sigma=jnp.ones(n, jnp.float32),
        theta=jnp.zeros(n, jnp.float32),
        mask=jnp.ones(n, bool),
    )
    w_or = int(np.ceil(3.0 * params.orientation_contrib_width))      # 5
    w_de = int(np.ceil(params.descriptor_contrib_width))             # 6
    oriented = compute_orientations(grads, kps, 1.0, params, chunk=chunk, w_max=w_or)
    desc, loc_image = fill_descriptors(grads, oriented, 1.0, params, chunk=chunk, w_max=w_de)

    m = np.asarray(oriented.mask)
    sel = np.nonzero(m)[0]
    k = len(sel)
    cap = max(((k + 127) // 128) * 128, 128)
    out = FeatureSet.empty(cap, parent=image_id)
    return FeatureSet(
        loc=out.loc.at[:k].set(jnp.asarray(np.asarray(loc_image)[sel])),
        sigma=out.sigma.at[:k].set(jnp.asarray(np.asarray(oriented.sigma)[sel])),
        theta=out.theta.at[:k].set(jnp.asarray(np.asarray(oriented.theta)[sel])),
        descriptors=out.descriptors.at[:k].set(jnp.asarray(np.asarray(desc)[sel])),
        mask=out.mask.at[:k].set(True),
        parent=out.parent,
    )


@struct.dataclass
class WindowFeatures:
    """Dense NxN patch descriptors (pytree — flows through the jitted
    matcher family exactly like FeatureSet, mirroring the reference's
    MatchFactory<Window_NxN> instantiations, MatchFactory.cu:7-12).

    descriptors: (K, N*N) uint8 raw patches; loc: (K, 2).
    """

    loc: jax.Array
    descriptors: jax.Array
    mask: jax.Array
    window: int = struct.field(pytree_node=False, default=9)

    @property
    def capacity(self):
        return self.loc.shape[0]


@partial(jax.jit, static_argnames=("window",))
def _extract_patches(pixels: jax.Array, window: int):
    """All NxN patches of the image as (H-N+1)*(W-N+1) rows (x-major like
    the reference's per-pixel windows)."""
    h, w = pixels.shape
    half = window // 2
    patches = jnp.stack(
        [
            pixels[dy : h - window + 1 + dy, dx : w - window + 1 + dx]
            for dy in range(window)
            for dx in range(window)
        ],
        axis=-1,
    )  # (H-N+1, W-N+1, N*N)
    return patches.reshape(-1, window * window)


def generate_window_features(pixels: np.ndarray | jax.Array, window: int = 9, image_id: int = -1) -> WindowFeatures:
    """generateNxNWindows analogue: the raw patch at every interior pixel."""
    assert window in WINDOW_SIZES, f"window must be one of {WINDOW_SIZES}"
    pixels = jnp.asarray(pixels)
    if pixels.ndim == 3:
        pixels = ops.to_bw(pixels)
    h, w = int(pixels.shape[0]), int(pixels.shape[1])
    half = window // 2
    desc = _extract_patches(pixels, window)
    locs = _interior_grid(h, w, half)[: desc.shape[0]]
    # interior grid rows match patch rows: both row-major over the valid area
    return WindowFeatures(
        loc=jnp.asarray(locs),
        descriptors=desc,
        mask=jnp.ones(desc.shape[0], bool),
        window=window,
    )


@partial(jax.jit, static_argnames=("chunk",))
def sad_best_target(q_desc: jax.Array, t_desc: jax.Array, t_valid: jax.Array, chunk: int = 256):
    """Per-query best target under sum-of-absolute-differences — the
    Window_NxN distProtocol (Feature.cuh:96-130).  Chunked (no MXU trick for
    L1; the VPU broadcast-reduce is still far wider than a warp scan)."""
    nq = q_desc.shape[0]
    n_chunks = (nq + chunk - 1) // chunk
    pad = n_chunks * chunk - nq
    qp = jnp.pad(q_desc, ((0, pad), (0, 0)))

    t = t_desc.astype(jnp.int32)

    def body(qc):
        q = qc.astype(jnp.int32)
        d = jnp.sum(jnp.abs(q[:, None, :] - t[None, :, :]), axis=-1).astype(jnp.float32)
        d = jnp.where(t_valid[None, :], d, jnp.inf)
        idx = jnp.argmin(d, axis=1).astype(jnp.int32)
        best = jnp.take_along_axis(d, idx[:, None], axis=1)[:, 0]
        return idx, best

    idx, dist = jax.lax.map(body, qp.reshape(n_chunks, chunk, -1))
    return idx.reshape(-1)[:nq], dist.reshape(-1)[:nq]
