"""Stereo stack tests: calibration, triangulation, epipolar search."""

import numpy as np
import pytest

import opencorr_tpu as oc
from opencorr_tpu.models.calibration import rodrigues
from opencorr_tpu.models.stereovision import fundamental_matrix


def _cams():
    i1 = oc.CameraIntrinsics(fx=2000.0, fy=2000.0, cx=320.0, cy=240.0,
                             k1=0.01, k2=-0.05)
    e1 = oc.CameraExtrinsics()
    i2 = oc.CameraIntrinsics(fx=2100.0, fy=2100.0, cx=300.0, cy=250.0,
                             k1=0.02)
    e2 = oc.CameraExtrinsics(tx=100.0, ty=2.0, tz=10.0,
                             rx=0.01, ry=-0.3, rz=0.005)
    c1 = oc.Calibration(i1, e1)
    c2 = oc.Calibration(i2, e2)
    return c1, c2


def test_rodrigues():
    r = rodrigues(0, 0, 0)
    assert np.allclose(r, np.eye(3))
    r = rodrigues(0, 0, np.pi / 2)
    assert np.allclose(r @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-6)
    # orthonormality for arbitrary axis
    r = rodrigues(0.3, -0.2, 0.5)
    assert np.allclose(r @ r.T, np.eye(3), atol=1e-6)


def test_undistort_inverts_distortion():
    c1, _ = _cams()
    c1.prepare(480, 640)
    # take image coords, distort them, map to sensor, then undistort
    pts_img = np.array([[0.02, 0.03], [-0.05, 0.01], [0.0, 0.0]], np.float32)
    i = c1.intrinsics
    out_x = []
    out_y = []
    for x, y in pts_img:
        r2 = x * x + y * y
        radial = (1 + i.k1 * r2 + i.k2 * r2 * r2)
        dx, dy = x * radial, y * radial
        sx = dx * i.fx + i.cx
        sy = dy * i.fy + i.cy
        out_x.append(sx)
        out_y.append(sy)
    ux, uy = c1.undistort(np.array(out_x, np.float32),
                          np.array(out_y, np.float32))
    # undistorted sensor coords should equal ideal projection of image coords
    exp_x = pts_img[:, 0] * i.fx + i.cx
    exp_y = pts_img[:, 1] * i.fy + i.cy
    assert np.allclose(np.asarray(ux), exp_x, atol=0.05)
    assert np.allclose(np.asarray(uy), exp_y, atol=0.05)


def test_triangulation_synthetic():
    """Project known 3D points through both cameras (no distortion), then
    reconstruct."""
    i1 = oc.CameraIntrinsics(fx=2000.0, fy=2000.0, cx=320.0, cy=240.0)
    i2 = oc.CameraIntrinsics(fx=2100.0, fy=2100.0, cx=300.0, cy=250.0)
    e1 = oc.CameraExtrinsics()
    e2 = oc.CameraExtrinsics(tx=100.0, ty=2.0, tz=10.0,
                             rx=0.01, ry=-0.3, rz=0.005)
    c1, c2 = oc.Calibration(i1, e1), oc.Calibration(i2, e2)
    c1.prepare(480, 640)
    c2.prepare(480, 640)
    sv = oc.Stereovision(c1, c2)
    sv.prepare()

    rng = np.random.default_rng(0)
    world = rng.uniform([-20, -20, 380], [20, 20, 420], (50, 3)).astype(np.float32)

    def project(cam, pts):
        ph = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], axis=1)
        uvw = ph @ cam.projection_matrix.T
        return uvw[:, :2] / uvw[:, 2:3]

    p1 = project(c1, world)
    p2 = project(c2, world)
    rec = np.asarray(sv.reconstruct(p1, p2))
    assert np.abs(rec - world).max() < 0.05


def test_triangulation_nan_point():
    c1, c2 = _cams()
    c1.prepare(100, 100)
    c2.prepare(100, 100)
    sv = oc.Stereovision(c1, c2)
    sv.prepare()
    p1 = np.array([[np.nan, 5.0]], np.float32)
    p2 = np.array([[4.0, 5.0]], np.float32)
    rec = np.asarray(sv.reconstruct(p1, p2))
    assert (rec == 0).all()  # oc_stereovision.cpp:72-76


def test_fundamental_matrix_epipolar_constraint():
    i1 = oc.CameraIntrinsics(fx=2000.0, fy=2000.0, cx=320.0, cy=240.0)
    i2 = oc.CameraIntrinsics(fx=2100.0, fy=2100.0, cx=300.0, cy=250.0)
    e2 = oc.CameraExtrinsics(tx=100.0, ty=2.0, tz=10.0,
                             rx=0.01, ry=-0.3, rz=0.005)
    c1 = oc.Calibration(i1, oc.CameraExtrinsics())
    c2 = oc.Calibration(i2, e2)
    f = fundamental_matrix(c1, c2)
    # corresponding projections must satisfy x2^T F x1 = 0
    rng = np.random.default_rng(1)
    world = rng.uniform([-20, -20, 380], [20, 20, 420], (20, 3)).astype(np.float64)

    def project(cam, pts):
        ph = np.concatenate([pts, np.ones((len(pts), 1))], axis=1)
        uvw = ph @ cam.projection_matrix.astype(np.float64).T
        return uvw[:, :2] / uvw[:, 2:3]

    p1 = project(c1, world)
    p2 = project(c2, world)
    x1 = np.concatenate([p1, np.ones((20, 1))], axis=1)
    x2 = np.concatenate([p2, np.ones((20, 1))], axis=1)
    resid = np.einsum("ni,ij,nj->n", x2, f.astype(np.float64), x1)
    # scale-free check: residual relative to typical line magnitude
    lines = x1 @ f.T.astype(np.float64)
    scale = np.abs(lines).max(1)
    assert (np.abs(resid) / scale).max() < 0.05


def test_epipolar_search_synthetic(speckle_pair_2d):
    """With identity-ish cameras and a pure shift, the epipolar search should
    land on the integer displacement."""
    ref, tar, tu, tv = speckle_pair_2d
    i1 = oc.CameraIntrinsics(fx=1000.0, fy=1000.0, cx=90.0, cy=80.0)
    # view 2 displaced along x only -> epipolar lines are horizontal-ish
    e2 = oc.CameraExtrinsics(tx=10.0)
    c1 = oc.Calibration(i1, oc.CameraExtrinsics())
    c2 = oc.Calibration(i1, e2)
    epi = oc.EpipolarSearch(c1, c2)
    epi.set_parallax((round(tu), 0.0))
    epi.set_search(10, 2)
    epi.create_icgn(10, 10, 0.05, 5)
    epi.set_images(ref, tar)
    epi.prepare()
    pois = oc.poi_grid_2d((40, 40), 5, 4, 15)
    out = epi.compute(pois)
    z = np.asarray(out.zncc)
    ok = z > 0.8
    assert ok.mean() > 0.6
    u = np.asarray(out.u)[ok]
    v = np.asarray(out.v)[ok]
    assert abs(u.mean() - tu) < 0.2
    assert abs(v.mean() - tv) < 0.2
