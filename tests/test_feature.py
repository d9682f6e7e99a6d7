"""SIFT2D + FeatureAffine tests (synthetic affine keypoint fields)."""

import numpy as np

import opencorr_tpu as oc
from opencorr_tpu.data import poi as poi_mod


def _affine_kp(n=400, seed=0, noise=0.0, outliers=0):
    """Keypoints under a known affine map tar = ref @ A + t."""
    rng = np.random.default_rng(seed)
    ref = rng.uniform(20, 300, (n, 2)).astype(np.float32)
    A = np.array([[1.01, 0.02], [-0.015, 0.99]], np.float32)
    t = np.array([3.2, -1.7], np.float32)
    tar = ref @ A + t + rng.normal(0, noise, (n, 2)).astype(np.float32)
    if outliers:
        tar[:outliers] += rng.uniform(10, 30, (outliers, 2)).astype(np.float32)
    return ref, tar, A, t


def test_feature_affine_exact():
    ref, tar, A, t = _affine_kp()
    fa = oc.FeatureAffine2D(16, 16)
    fa.set_keypoint_pair(ref, tar)
    pois = oc.poi_grid_2d((60, 60), 6, 6, 30)
    out = fa.compute(pois)
    z = np.asarray(out.zncc)
    ok = z == 0
    assert ok.mean() > 0.8  # sparse-keypoint POIs may hit -1
    p = np.asarray(out.p)[ok]
    x = np.asarray(out.x)[ok]
    y = np.asarray(out.y)[ok]
    # expected displacement at POI: [x y] @ A + t - [x y]
    exp = np.stack([x, y], -1) @ A + t - np.stack([x, y], -1)
    assert np.abs(p[:, poi_mod.U] - exp[:, 0]).max() < 1e-2
    assert np.abs(p[:, poi_mod.V] - exp[:, 1]).max() < 1e-2
    assert np.abs(p[:, poi_mod.UX] - (A[0, 0] - 1)).max() < 1e-3
    assert np.abs(p[:, poi_mod.VY] - (A[1, 1] - 1)).max() < 1e-3


def test_feature_affine_with_outliers():
    ref, tar, A, t = _affine_kp(noise=0.05, outliers=60)
    fa = oc.FeatureAffine2D(16, 16)
    fa.set_keypoint_pair(ref, tar)
    pois = oc.poi_grid_2d((80, 80), 5, 5, 30)
    out = fa.compute(pois)
    z = np.asarray(out.zncc)
    ok = z == 0
    assert ok.mean() > 0.9
    p = np.asarray(out.p)
    x = np.asarray(out.x)[ok]
    y = np.asarray(out.y)[ok]
    exp = np.stack([x, y], -1) @ A + t - np.stack([x, y], -1)
    assert np.abs(p[ok, poi_mod.U] - exp[:, 0]).mean() < 0.1
    # feature count recorded
    assert np.asarray(out.r)[ok, poi_mod.R_FEAT].min() >= 3


def test_feature_affine_insufficient():
    """-1 when fewer than sample_number keypoints in reach
    (oc_feature_affine.cpp:186-189)."""
    ref = np.array([[10.0, 10.0], [12.0, 10.0]], np.float32)
    tar = ref + 1.0
    fa = oc.FeatureAffine2D(16, 16)
    fa.set_keypoint_pair(ref, tar)
    out = fa.compute(oc.new_table_2d([200.0], [200.0]))
    assert float(out.zncc[0]) == -1.0


def test_feature_affine_3d_exact():
    rng = np.random.default_rng(1)
    ref = rng.uniform(20, 200, (500, 3)).astype(np.float32)
    A = np.eye(3, dtype=np.float32) + rng.normal(0, 0.01, (3, 3)).astype(np.float32)
    t = np.array([1.5, -2.0, 0.7], np.float32)
    tar = ref @ A + t
    fa = oc.FeatureAffine3D(16, 16, 16)
    fa.set_keypoint_pair(ref, tar)
    pois = oc.poi_grid_3d((60, 60, 60), 4, 4, 4, 20)
    out = fa.compute(pois)
    z = np.asarray(out.zncc)
    ok = z == 0
    assert ok.mean() > 0.7
    p = np.asarray(out.p)[ok]
    xyz = np.stack([np.asarray(out.x), np.asarray(out.y), np.asarray(out.z)], -1)[ok]
    exp = xyz @ A + t - xyz
    assert np.abs(p[:, poi_mod.U3] - exp[:, 0]).max() < 2e-2
    assert np.abs(p[:, poi_mod.V3] - exp[:, 1]).max() < 2e-2
    assert np.abs(p[:, poi_mod.W3] - exp[:, 2]).max() < 2e-2


def test_self_adaptive_subset():
    ref, tar, A, t = _affine_kp(n=800)
    fa = oc.FeatureAffine2D(16, 16)
    fa.set_keypoint_pair(ref, tar)
    fa.set_self_adaptive(True)
    pois = oc.poi_grid_2d((100, 100), 4, 4, 25)
    out = fa.compute(pois)
    sr = np.asarray(out.sr)
    assert (sr >= 10).all()  # clamped to subset_radius_min
    z = np.asarray(out.zncc)
    ok = z == 0
    assert ok.mean() > 0.8
    p = np.asarray(out.p)[ok]
    x = np.asarray(out.x)[ok]
    y = np.asarray(out.y)[ok]
    exp = np.stack([x, y], -1) @ A + t - np.stack([x, y], -1)
    assert np.abs(p[:, poi_mod.U] - exp[:, 0]).max() < 1e-2


def test_sift2d_synthetic_shift(speckle_pair_2d):
    ref, tar, tu, tv = speckle_pair_2d
    s = oc.SIFT2D()
    s.set_images(ref, tar)
    s.prepare()
    s.compute()
    if len(s.ref_matched_kp) < 10:
        return  # smooth synthetic speckle may yield few SIFT keypoints
    d = s.tar_matched_kp - s.ref_matched_kp
    med = np.median(d, axis=0)
    assert abs(med[0] - tu) < 0.5
    assert abs(med[1] - tv) < 0.5
