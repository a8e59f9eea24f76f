"""Pushbroom camera end-to-end: params.csv parsing, quirk-faithful ray
generation (generatePushbroomBundle, PointCloudFactory.cu:4201-4283), and a
2-view pushbroom triangulation through the pipeline's bundle dispatch.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ssrlcv_tpu.core.types import MatchSet, PushbroomCameras
from ssrlcv_tpu.geometry.bundles import generate_bundles, generate_pushbroom_bundles
from ssrlcv_tpu.geometry.triangulation import two_view_triangulate


def _scalar_reference_ray(loc, size, dpix_x, foc, roll_deg, radius, altitude, gsd):
    """Independent scalar transliteration of generatePushbroomBundle
    (PointCloudFactory.cu:4218-4281) used as the numeric oracle.  Runs in
    float32 throughout because the kernel's ``position - (position - kp)``
    round trip cancels catastrophically at f32 (|position| ~ 10^3 km vs
    |kp| ~ 10^-2 km) — the oracle must lose the same bits."""
    f = np.float32
    cx, cy = f(size[0] / 2.0), f(size[1] / 2.0)
    kp = np.array([f(dpix_x) * (f(loc[0]) - cx), 0.0, -f(foc)], f)
    roll = f(roll_deg) * f(np.pi) / f(180.0)
    t = f(np.tan(roll - f(np.pi / 2.0)))
    a = f(1.0) + t * t
    b = f(-2.0) * f(radius) * t
    c = f(radius) * f(radius) - (f(altitude) + f(radius)) ** f(2)
    s1 = (-b + f(np.sqrt(b * b - 4 * a * c))) / (2 * a)
    s2 = (-b - f(np.sqrt(b * b - 4 * a * c))) / (2 * a)
    sol = s1 if s1 > 0 else s2
    position = np.array([sol, 0.0, -t * sol], f)
    arc = f(gsd) * (f(loc[1]) - cy)
    ang = arc / f(radius)

    def rot(p, rx, ry, rz):
        cxr, sxr = f(np.cos(rx)), f(np.sin(rx))
        cyr, syr = f(np.cos(ry)), f(np.sin(ry))
        czr, szr = f(np.cos(rz)), f(np.sin(rz))
        Rx = np.array([[1, 0, 0], [0, cxr, -sxr], [0, sxr, cxr]], f)
        Ry = np.array([[cyr, 0, syr], [0, 1, 0], [-syr, 0, cyr]], f)
        Rz = np.array([[czr, -szr, 0], [szr, czr, 0], [0, 0, 1]], f)
        return (Rz @ Ry @ Rx @ p).astype(f)

    kp = rot(kp, f(0.0), roll, f(0.0))
    position = rot(position, ang, f(0.0), f(0.0))
    kp_moved = (position - kp).astype(f)
    vec = (position - kp_moved).astype(f)  # the reference's vec quirk == kp (rotated)
    vec = vec / f(np.linalg.norm(vec))
    return vec, position


def _pushbrooms(rolls, size=(2048, 1024), foc=0.012, radius=3396.19,
                altitude=300.0, gsd=0.25 / 1000.0, fov_deg=1.14):
    n = len(rolls)
    fov = fov_deg * np.pi / 180.0
    dpix_x = foc * np.tan(fov / 2.0) / (size[0] / 2.0)
    return PushbroomCameras(
        start_pos=jnp.zeros((n, 3), jnp.float32),
        end_pos=jnp.zeros((n, 3), jnp.float32),
        projection_center=jnp.zeros((n, 2), jnp.float32),
        axis_radius=jnp.full((n,), radius, jnp.float32),
        roll=jnp.asarray(rolls, jnp.float32),
        altitude=jnp.full((n,), altitude, jnp.float32),
        foc=jnp.full((n,), foc, jnp.float32),
        fov=jnp.full((n,), fov, jnp.float32),
        gsd=jnp.full((n,), gsd, jnp.float32),
        dpix=jnp.asarray(np.tile([dpix_x, 0.0], (n, 1)), jnp.float32),
        size=jnp.asarray(np.tile(size, (n, 1)), jnp.int32),
    )


def _matchset(loc0, loc1):
    n = len(loc0)
    cap = max(n, 8)
    kp_loc = np.zeros((cap, 2, 2), np.float32)
    kp_loc[:n, 0] = loc0
    kp_loc[:n, 1] = loc1
    kp_par = np.full((cap, 2), -1, np.int32)
    kp_par[:n] = [0, 1]
    nv = np.zeros(cap, np.int32)
    nv[:n] = 2
    mask = np.zeros(cap, bool)
    mask[:n] = True
    return MatchSet(kp_loc=jnp.asarray(kp_loc), kp_parent=jnp.asarray(kp_par),
                    num_views=jnp.asarray(nv), mask=jnp.asarray(mask))


def test_pushbroom_ray_matches_scalar_oracle():
    size = (2048, 1024)
    foc, radius, altitude, gsd = 0.012, 3396.19, 300.0, 0.25 / 1000.0
    pbs = _pushbrooms([12.0, -7.5], size=size, foc=foc, radius=radius,
                      altitude=altitude, gsd=gsd)
    dpix_x = float(pbs.dpix[0, 0])
    locs0 = np.array([[1024.0, 512.0], [100.0, 40.0], [2000.0, 1000.0]], np.float32)
    locs1 = np.array([[1024.0, 512.0], [300.0, 90.0], [1500.0, 700.0]], np.float32)
    ms = _matchset(locs0, locs1)
    bd = generate_pushbroom_bundles(ms, pbs)
    vec = np.asarray(bd.vec)
    pnt = np.asarray(bd.pnt)
    for i in range(3):
        for v, (loc, roll) in enumerate([(locs0[i], 12.0), (locs1[i], -7.5)]):
            ev, ep = _scalar_reference_ray(loc, size, dpix_x, foc, roll,
                                           radius, altitude, gsd)
            np.testing.assert_allclose(vec[i, v], ev, rtol=2e-4, atol=2e-6)
            np.testing.assert_allclose(pnt[i, v], ep, rtol=2e-4, atol=1e-3)


def test_pushbroom_nadir_geometry():
    """roll=90 deg looks straight down: craft at (0,0,altitude+radius)...
    per the quadratic with t=tan(0)=0: a=1, b=0, c=r^2-(h+r)^2 ->
    sol = sqrt((h+r)^2 - r^2); position z = 0 — the reference's geometry
    places the craft on the x axis at that slant radius."""
    radius, altitude = 3396.19, 300.0
    pbs = _pushbrooms([90.0, 90.0], radius=radius, altitude=altitude)
    ms = _matchset(np.array([[1024.0, 512.0]]), np.array([[1024.0, 512.0]]))
    bd = generate_pushbroom_bundles(ms, pbs)
    pnt = np.asarray(bd.pnt)[0, 0]
    expect_x = np.sqrt((altitude + radius) ** 2 - radius ** 2)
    np.testing.assert_allclose(pnt[0], expect_x, rtol=1e-5)
    np.testing.assert_allclose(pnt[1], 0.0, atol=1e-3)
    # center-pixel ray from a centered scan points along the (rotated) optical
    # axis: unit length always
    np.testing.assert_allclose(np.linalg.norm(np.asarray(bd.vec)[0, 0]), 1.0, rtol=1e-6)


def test_pushbroom_two_view_triangulates():
    """Two scans with different rolls see the same ground target; the
    triangulation must close (small skew-line gap) through the
    generate_bundles pushbroom dispatch."""
    pbs = _pushbrooms([60.0, 120.0])
    ms = _matchset(np.array([[1024.0, 512.0]] * 2),
                   np.array([[1024.0, 512.0]] * 2))
    bd = generate_bundles(ms, cameras=None, pushbrooms=pbs)
    pc, err = two_view_triangulate(bd)
    pts = np.asarray(pc.points)[np.asarray(pc.mask)]
    assert np.all(np.isfinite(pts))
    # the two scan rays lie in the y=0 plane, so they intersect exactly
    assert float(err) < 1e-4
    # expected intersection from the scalar-oracle rays (2-D line crossing)
    dpix_x = float(pbs.dpix[0, 0])
    v0, p0 = _scalar_reference_ray([1024.0, 512.0], (2048, 1024), dpix_x,
                                   0.012, 60.0, 3396.19, 300.0, 0.25 / 1000.0)
    v1, p1 = _scalar_reference_ray([1024.0, 512.0], (2048, 1024), dpix_x,
                                   0.012, 120.0, 3396.19, 300.0, 0.25 / 1000.0)
    # solve p0 + s*v0 = p1 + u*v1 in the (x, z) plane
    A = np.array([[v0[0], -v1[0]], [v0[2], -v1[2]]], np.float64)
    rhs = np.array([p1[0] - p0[0], p1[2] - p0[2]], np.float64)
    s, _ = np.linalg.solve(A, rhs)
    expect = p0 + s * v0
    np.testing.assert_allclose(pts[0], expect, atol=0.05)


def test_pushbroom_params_csv(tmp_path):
    from ssrlcv_tpu.io.images import load_params_csv

    p = tmp_path / "params.csv"
    p.write_text(
        "img0.png,pushbroom,18.5,226.0,3396.19,12.0,300.0,0.012,0.25,1.14\n"
        "img1.png,-2.0,1.0,400.0,0.1,0.2,0.3,0.199,0.199,0.16,4e-7,4e-7,123\n"
    )
    d = load_params_csv(str(p), size=(2048, 1024))
    pb = d["img0.png"]["pushbroom"]
    assert pb["axis_radius"] == pytest.approx(3396.19)
    assert pb["roll"] == pytest.approx(12.0)
    assert pb["altitude"] == pytest.approx(300.0)
    assert pb["gsd"] == pytest.approx(0.00025)       # m -> km
    assert pb["fov"] == pytest.approx(1.14 * np.pi / 180.0)
    assert pb["dpix"][0] == pytest.approx(0.012 * np.tan(pb["fov"] / 2) / 1024.0)
    assert pb["dpix"][1] == 0.0                       # the dpix.y self-assign quirk
    assert "pushbroom" not in d["img1.png"]
    assert d["img1.png"]["foc"] == pytest.approx(0.16)