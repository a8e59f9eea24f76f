"""DoG keypoint detection: extrema search, subpixel refinement, rejection.

TPU re-design of the reference's per-octave keypoint machinery
(FeatureFactory.cu:86-335, kernels :847-1008).  Instead of thrust
stream-compaction over ragged per-blur lists, keypoints live in a
fixed-capacity masked struct-of-arrays; every rejection pass just clears mask
bits, and the 3x3x3 extrema search is a pair of reduce_windows over the
(blurs, H, W) DoG stack.

The refinement Newton iteration replicates the reference kernel *literally*,
including its non-standard diagonal Hessian terms (H00 = g0 - 2*M rather than
the true second difference, refineLocation FeatureFactory.cu:892-967) and the
un-divided off-diagonal edge Hessian (flagEdges :974-990) — parity beats
textbook correctness here.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ssrlcv_tpu.config import SIFTParams


class SSKeyPoints(NamedTuple):
    """Masked fixed-capacity scale-space keypoints for one octave
    (SSKeyPoint, FeatureFactory.cuh:64-75)."""

    blur: jax.Array       # (K,) int32 — DoG slice index (1..B-2 initially)
    loc: jax.Array        # (K, 2) float32 — octave pixel coords (x, y)
    intensity: jax.Array  # (K,) float32
    sigma: jax.Array      # (K,) float32
    theta: jax.Array      # (K,) float32 (filled by orientation pass)
    mask: jax.Array       # (K,) bool

    @property
    def capacity(self) -> int:
        return self.blur.shape[0]

    def count(self):
        return jnp.sum(self.mask.astype(jnp.int32))


def detect_extrema(
    dog_raw: jax.Array, sigmas: tuple, capacity: int, prefilter_threshold: float = 0.0
) -> SSKeyPoints:
    """3x3x3 extrema over interior pixels of DoG slices 1..B-2
    (findExtrema kernel, FeatureFactory.cu:847-881; ties count as extrema).

    Ordering matches the reference: blur-major, then row-major pixel index
    (the thrust::remove compaction preserves that order).

    ``prefilter_threshold``: apply the first noise rejection
    (|intensity| >= t, flagNoise FeatureFactory.cu:968) inside the dense
    mask, *before* extraction into the fixed-capacity list.  The predicate is
    per-pixel so it commutes with extraction, and it keeps the raw-extrema
    flood of the upsampled octave (which can exceed any reasonable capacity)
    from overflowing the list.
    """
    b, h, w = dog_raw.shape
    # separable shifted max/min: the 27-point window is the composition of
    # three 3-wide axis reductions (exact — max/min are associative), and the
    # shifted-slice formulation is ~3x faster than the monolithic 3-D
    # reduce_window on TPU (same trick as the shifted-add convolutions)
    def _axis3(op, a, axis):
        n = a.shape[axis]
        sl = lambda s, e: jax.lax.slice_in_dim(a, s, e, axis=axis)
        return op(sl(0, n - 2), op(sl(1, n - 1), sl(2, n)))

    def _win3(op, a):
        return _axis3(op, _axis3(op, _axis3(op, a, 2), 1), 0)

    nmax = _win3(jnp.maximum, dog_raw)  # (B-2, H-2, W-2)
    nmin = _win3(jnp.minimum, dog_raw)
    mid = dog_raw[1 : b - 1, 1 : h - 1, 1 : w - 1]
    is_ext = (mid == nmax) | (mid == nmin)
    if prefilter_threshold > 0.0:
        is_ext = is_ext & (jnp.abs(mid) >= prefilter_threshold)

    flat = is_ext.reshape(-1)
    # first-`capacity` true positions in index order: a radix sort on
    # position-or-sentinel keys is 2.6x faster than jnp.nonzero(size=...)
    # on TPU (84 ms vs 215 ms at the 21M-element octave-0 stack) and
    # produces the identical index list.
    #
    # Hierarchical variant for big stacks (the octave-0 sort was 35% of
    # detect time): sort 1024-element row segments along the minor axis
    # (vectorised bitonic), keep each segment's first ROW_M keys, then sort
    # only the survivors — measured 30 ms vs 63 ms for the full sort at the
    # 16.7M octave-0 stack, identical output.  Exact while no segment holds
    # > ROW_M extrema; post-prefilter density on the everest fixtures is
    # ~1.3 per segment MEAN and 12 WORST-CASE (measured over both images).
    # ROW_M = 128 keeps ~10x worst-observed headroom (TIE extrema can be
    # locally dense on periodic/synthetic textures, so it is NOT shrunk to
    # the fixture worst case) while halving the survivor sort vs ROW_M=256
    # (detect ~96 -> ~92 ms on chip).  An overflowing segment degrades
    # exactly like the existing capacity truncation (tail keypoints of that
    # segment drop).
    n = flat.shape[0]
    key = jnp.where(flat, jnp.arange(n, dtype=jnp.int32), jnp.int32(2**31 - 1))
    ROW, ROW_M = 1024, 128
    if n >= (1 << 20):
        r = -(-n // ROW)
        keyp = jnp.pad(key, (0, r * ROW - n), constant_values=jnp.int32(2**31 - 1))
        rows = jax.lax.sort(keyp.reshape(r, ROW), dimension=1)[:, :ROW_M]
        key = rows.reshape(-1)
    srt = jax.lax.sort(key)[:capacity]
    idx = jnp.where(srt == 2**31 - 1, -1, srt)
    valid = idx >= 0
    idx_c = jnp.maximum(idx, 0)
    per = (h - 2) * (w - 2)
    blur = idx_c // per + 1
    rem = idx_c % per
    y = rem // (w - 2) + 1
    x = rem % (w - 2) + 1
    intensity = dog_raw[blur, y, x]
    sig = jnp.asarray(sigmas, dog_raw.dtype)[blur]
    return SSKeyPoints(
        blur=blur.astype(jnp.int32),
        loc=jnp.stack([x, y], axis=-1).astype(jnp.float32),
        intensity=jnp.where(valid, intensity, 0.0),
        sigma=sig,
        theta=jnp.full((capacity,), -1.0, jnp.float32),
        mask=valid,
    )


def remove_noise(kps: SSKeyPoints, threshold: float) -> SSKeyPoints:
    """|intensity| < threshold -> discard (flagNoise, FeatureFactory.cu:968)."""
    keep = kps.mask & (jnp.abs(kps.intensity) >= threshold)
    return kps._replace(mask=keep)


def _dense_newton_fields(dog_norm: jax.Array):
    """Per-position Newton refinement quantities for every interior position
    (blur 1..B-2, y/x 1..dim-2), computed densely from shifted slices — NO
    gather.  The Newton step at an integer position depends only on its 27
    neighbours, so it is a position property: materialising (o0, o1, o2,
    gHg) fields once turns each refinement attempt's 27-point gather into a
    4-value gather (~7x less gather traffic — the op class TPU is worst at).
    Same arithmetic as refineLocation (FeatureFactory.cu:892-967), including
    the non-standard diagonal Hessian.

    Returns (o0, o1, o2, gHg), each (B-2, H-2, W-2) f32.
    """
    mid = dog_norm[1:-1]
    up = dog_norm[2:]
    lo = dog_norm[:-2]
    h, w = dog_norm.shape[1], dog_norm.shape[2]

    def s(a, dy, dx):  # interior view of a shifted by (dy, dx)
        return a[:, 1 + dy : h - 1 + dy, 1 + dx : w - 1 + dx]

    m = s(mid, 0, 0)
    g0 = s(mid, 0, 1) - s(mid, 0, -1)
    g1 = s(mid, 1, 0) - s(mid, -1, 0)
    g2 = s(up, 0, 0) - s(lo, 0, 0)
    h00 = -(g0 - 2.0 * m)
    h11 = -(g1 - 2.0 * m)
    h22 = -(g2 - 2.0 * m)
    h01 = -((s(mid, 1, 1) - s(mid, -1, 1) - s(mid, 1, -1) + s(mid, -1, -1)) / 4.0)
    h02 = -((s(up, 0, 1) - s(lo, 0, 1) - s(up, 0, -1) + s(lo, 0, -1)) / 4.0)
    h12 = -((s(up, 1, 0) - s(lo, 1, 0) - s(up, -1, 0) + s(lo, -1, 0)) / 4.0)

    # closed-form 3x3 symmetric inverse applied to g (adjugate / det)
    det = (
        h00 * (h11 * h22 - h12 * h12)
        - h01 * (h01 * h22 - h12 * h02)
        + h02 * (h01 * h12 - h11 * h02)
    )
    inv_det = jnp.where(jnp.abs(det) > 0, 1.0 / det, jnp.inf)
    a00 = h11 * h22 - h12 * h12
    a01 = h02 * h12 - h01 * h22
    a02 = h01 * h12 - h02 * h11
    a11 = h00 * h22 - h02 * h02
    a12 = h01 * h02 - h00 * h12
    a22 = h00 * h11 - h01 * h01
    o0 = (a00 * g0 + a01 * g1 + a02 * g2) * inv_det
    o1 = (a01 * g0 + a11 * g1 + a12 * g2) * inv_det
    o2 = (a02 * g0 + a12 * g1 + a22 * g2) * inv_det
    gHg = (
        g0 * (h00 * g0 + h01 * g1 + h02 * g2)
        + g1 * (h01 * g0 + h11 * g1 + h12 * g2)
        + g2 * (h02 * g0 + h12 * g1 + h22 * g2)
    )
    return o0, o1, o2, gHg


def refine_keypoints(
    kps: SSKeyPoints,
    dog_norm: jax.Array,
    sigma_min: float,
    blur_multiplier: float,
    max_attempts: int = 5,
) -> SSKeyPoints:
    """Iterative 3-D quadratic subpixel refinement over the *normalised* DoG
    (refineLocation kernel, FeatureFactory.cu:892-967), fully vectorised over
    the keypoint capacity.  The per-position Newton quantities come from the
    dense fields of _dense_newton_fields; each attempt then gathers only 4
    field values (+1 intensity on accept) per keypoint instead of a 27-point
    patch."""
    nblurs, h, w = dog_norm.shape
    k = kps.capacity

    f_o0, f_o1, f_o2, f_gHg = _dense_newton_fields(dog_norm)
    hw = (h - 2) * (w - 2)
    f_o0 = f_o0.reshape(-1)
    f_o1 = f_o1.reshape(-1)
    f_o2 = f_o2.reshape(-1)
    f_gHg = f_gHg.reshape(-1)

    x0 = jnp.round(kps.loc[:, 0]).astype(jnp.int32)
    y0 = jnp.round(kps.loc[:, 1]).astype(jnp.int32)
    state = (
        x0, y0, kps.blur, kps.loc, kps.sigma, kps.intensity,
        ~kps.mask, ~kps.mask,
    )

    def body(_, st):
        x, y, blur, loc_f, sigma, inten, discard, done = st
        # positions at sampling time are always interior (extrema start
        # interior; the move branch kills border exits before resampling)
        fi = (blur - 1) * hw + (y - 1) * (w - 2) + (x - 1)
        fi = jnp.clip(fi, 0, f_o0.shape[0] - 1)
        o0 = f_o0[fi]
        o1 = f_o1[fi]
        o2 = f_o2[fi]
        gHg = f_gHg[fi]

        finite = jnp.isfinite(o0) & jnp.isfinite(o1) & jnp.isfinite(o2)
        accept = finite & (jnp.abs(o0) <= 0.5) & (jnp.abs(o1) <= 0.5) & (jnp.abs(o2) <= 0.5)

        # --- accept branch ---
        nlx = x.astype(jnp.float32) + o0
        nly = y.astype(jnp.float32) + o1
        nx = jnp.round(nlx).astype(jnp.int32)
        ny = jnp.round(nly).astype(jnp.int32)
        on_border_a = (nx <= 0) | (ny <= 0) | (nx >= w - 1) | (ny >= h - 1)
        nxc = jnp.clip(nx, 0, w - 1)
        nyc = jnp.clip(ny, 0, h - 1)
        new_int = dog_norm[blur, nyc, nxc] - 0.5 * gHg
        new_sigma = sigma_min * blur_multiplier ** (blur.astype(jnp.float32) + o2)

        # --- move branch ---
        sgn = lambda o: jnp.where(jnp.abs(o) > 0.5, jnp.where(o > 0, 1, -1), 0)
        mx = x + sgn(o0)
        my = y + sgn(o1)
        blur_m = blur + sgn(o2)
        dead_m = (
            (blur_m >= nblurs - 1) | (blur_m <= 0)
            | (mx <= 0) | (my <= 0) | (mx >= w - 1) | (my >= h - 1)
        )

        x2 = jnp.where(accept, nx, mx)
        y2 = jnp.where(accept, ny, my)
        blur2 = jnp.where(accept, blur, blur_m)
        loc2 = jnp.where(
            accept[:, None],
            jnp.stack([nlx, nly], axis=1),
            jnp.stack([mx, my], axis=1).astype(jnp.float32),
        )
        sigma2 = jnp.where(accept, new_sigma, sigma)
        int2 = jnp.where(accept & ~on_border_a, new_int, inten)
        discard2 = jnp.where(accept, on_border_a, dead_m)
        done2 = accept | dead_m

        keep_old = done
        return (
            jnp.where(keep_old, x, x2),
            jnp.where(keep_old, y, y2),
            jnp.where(keep_old, blur, blur2),
            jnp.where(keep_old[:, None], loc_f, loc2),
            jnp.where(keep_old, sigma, sigma2),
            jnp.where(keep_old, inten, int2),
            jnp.where(keep_old, discard, discard2),
            done | done2,
        )

    x, y, blur, loc_f, sigma, inten, discard, done = jax.lax.fori_loop(
        0, max_attempts, body, state
    )
    # attempts exhausted without acceptance -> discard (attempt==4 branch)
    discard = discard | ~done
    return SSKeyPoints(
        blur=blur, loc=loc_f, intensity=inten, sigma=sigma,
        theta=kps.theta, mask=~discard & kps.mask,
    )


def remove_edges(kps: SSKeyPoints, dog_norm: jax.Array, threshold: float) -> SSKeyPoints:
    """2x2 Hessian edgeness rejection (flagEdges, FeatureFactory.cu:974-990;
    note off-diagonal is NOT divided by 4 in the reference — replicated).

    Edgeness is a position property: computed densely from shifted slices
    (no 9-point gather), then one field value gathered per keypoint."""
    nb, h, w = dog_norm.shape

    def s(a, dy, dx):
        return a[:, 1 + dy : h - 1 + dy, 1 + dx : w - 1 + dx]

    m = s(dog_norm, 0, 0)
    h00 = -2.0 * m + s(dog_norm, 0, 1) + s(dog_norm, 0, -1)
    h11 = -2.0 * m + s(dog_norm, 1, 0) + s(dog_norm, -1, 0)
    h01 = (s(dog_norm, 1, 1) - s(dog_norm, -1, 1)
           - s(dog_norm, 1, -1) + s(dog_norm, -1, -1))
    tr = h00 + h11
    det = h00 * h11 - h01 * h01
    edgeness = (tr * tr / det).reshape(-1)  # (B, H-2, W-2) flattened

    x = jnp.clip(jnp.round(kps.loc[:, 0]).astype(jnp.int32), 1, w - 2)
    y = jnp.clip(jnp.round(kps.loc[:, 1]).astype(jnp.int32), 1, h - 2)
    hw = (h - 2) * (w - 2)
    e = edgeness[kps.blur * hw + (y - 1) * (w - 2) + (x - 1)]
    keep = kps.mask & ~(e > threshold)
    return kps._replace(mask=keep)


def check_descriptor_border(
    kps: SSKeyPoints, image_size: tuple[int, int], lambda_desc: float, pixel_width: float
) -> SSKeyPoints:
    """Drop keypoints whose descriptor window leaves the image
    (checkKeyPoints, SIFT_FeatureFactory.cu:449-462; width = sigma*lambda/pw,
    not ceil'd)."""
    h, w = image_size
    ww = kps.sigma * lambda_desc / pixel_width
    keep = (
        kps.mask
        & (kps.loc[:, 0] - ww >= 0.0)
        & (kps.loc[:, 1] - ww >= 0.0)
        & (kps.loc[:, 0] + ww < w - 1)
        & (kps.loc[:, 1] + ww < h - 1)
    )
    return kps._replace(mask=keep)


def find_keypoints_octave(
    dog_raw: jax.Array,
    dog_norm: jax.Array,
    sigmas: tuple,
    params: SIFTParams,
    capacity: int,
) -> SSKeyPoints:
    """Full per-octave detection chain in reference order
    (findKeyPoints, FeatureFactory.cu:461-509):
    extrema(raw) -> noise(0.8t, raw intensity) -> subpixel refine(norm)
    -> noise(t, refined intensity) -> edges(norm).

    The first noise rejection is fused into the dense extrema mask (same
    predicate, applied before extraction) so the upsampled octave's raw
    extrema flood cannot overflow the fixed capacity."""
    kps = detect_extrema(
        dog_raw, sigmas, capacity, prefilter_threshold=params.noise_threshold * 0.8
    )
    if params.subpixel:
        kps = refine_keypoints(
            kps,
            dog_norm,
            sigma_min=float(sigmas[0]),
            blur_multiplier=float(sigmas[1]) / float(sigmas[0]),
            max_attempts=params.max_refine_attempts,
        )
        kps = remove_noise(kps, params.noise_threshold)
    kps = remove_edges(kps, dog_norm, params.edge_threshold)
    return kps
