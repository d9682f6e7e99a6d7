"""TPU-native SIFT2D vs OpenCV's reference implementation.

The reference delegates SIFT to OpenCV (oc_sift.cpp:60-130); these tests hold
the JAX reimplementation to OpenCV's output on a small synthetic speckle."""

import numpy as np
import pytest

import opencorr_tpu as oc
from opencorr_tpu.ops import sift2d as sift_ops

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def speckle_img():
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(0)
    img = gaussian_filter(rng.standard_normal((128, 128)), 2.0)
    img = (img - img.min()) / (img.max() - img.min()) * 255
    return np.asarray(img, np.float32)


@pytest.fixture(scope="module")
def ours_vs_cv2(speckle_img):
    res = sift_ops.detect_and_compute(speckle_img)
    pts, desc, sizes, angles, resps = sift_ops.gather_keypoints(res)
    kp, d = cv2.SIFT_create().detectAndCompute(
        np.clip(speckle_img, 0, 255).astype(np.uint8), None)
    return pts, desc, sizes, angles, kp, d


def test_keypoint_positions_match_opencv(ours_vs_cv2):
    pts, _, _, _, kp, _ = ours_vs_cv2
    cvp = np.array([k.pt for k in kp])
    assert abs(len(pts) - len(kp)) / len(kp) < 0.05
    from scipy.spatial import cKDTree

    dd, _ = cKDTree(cvp).query(pts, k=1)
    assert (dd < 0.5).mean() > 0.9


def test_angles_sizes_descriptors_match_opencv(ours_vs_cv2):
    pts, desc, sizes, angles, kp, d = ours_vs_cv2
    cvp = np.array([k.pt for k in kp])
    cva = np.array([k.angle for k in kp])
    cvs = np.array([k.size for k in kp])
    from scipy.spatial import cKDTree

    nbrs = cKDTree(cvp).query_ball_point(pts, r=0.5)
    da, cos, ds = [], [], []
    for i, ns in enumerate(nbrs):
        if not ns:
            continue
        diffs = np.abs((cva[ns] - angles[i] + 180) % 360 - 180)
        j = ns[int(np.argmin(diffs))]
        da.append(diffs.min())
        ds.append(abs(cvs[j] - sizes[i]))
        dv, dm = d[j], desc[i]
        cos.append(float((dv * dm).sum()
                         / (np.linalg.norm(dv) * np.linalg.norm(dm) + 1e-9)))
    da, cos, ds = np.array(da), np.array(cos), np.array(ds)
    assert np.median(da) < 0.5  # fastAtan2 vs atan2 noise only
    assert np.median(ds) < 0.05
    assert np.median(cos) > 0.995


def test_match_counts_close_to_opencv(speckle_img):
    """End-to-end SIFT2D stage: the TPU backend's ratio-test match count must
    land within 5% of the OpenCV backend on a warped pair."""
    from scipy.ndimage import affine_transform

    ang = np.deg2rad(4.0)
    m = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
    c = np.array(speckle_img.shape) / 2
    tar = affine_transform(speckle_img, m, offset=c - m @ c, order=3)

    counts = {}
    for backend in ("opencv", "tpu"):
        s = oc.SIFT2D(backend=backend)
        s.set_images(speckle_img, tar)
        s.compute()
        counts[backend] = len(s.ref_matched_kp)
    assert counts["opencv"] > 50
    assert abs(counts["tpu"] - counts["opencv"]) / counts["opencv"] < 0.05


def test_compact_scan_order():
    import jax.numpy as jnp

    mask = jnp.asarray(
        np.array([0, 1, 1, 0, 0, 1, 0, 1, 1, 1], bool))
    idx, ok = sift_ops._compact(mask, 4)
    np.testing.assert_array_equal(np.asarray(idx), [1, 2, 5, 7])
    assert np.asarray(ok).all()
    idx, ok = sift_ops._compact(mask, 8)
    np.testing.assert_array_equal(np.asarray(ok),
                                  [1, 1, 1, 1, 1, 1, 0, 0])
