"""2D SIFT feature extraction + matching (reference API: ``SIFT2D``,
oc_sift.h:39).

The reference wraps OpenCV's CPU SIFT detector and matches descriptors with
FLANN's approximate 2-NN + Lowe ratio test (oc_sift.cpp:60-130).  Here the
whole stage is TPU-native: detection/description run as batched JAX kernels
(ops/sift2d.py, numerically faithful to OpenCV's SIFT), and matching is one
[N1,128]x[128,N2] distance matmul with an exact top-2 (FLANN is approximate).
Set ``backend="opencv"`` (or env OPENCORR_SIFT2D=opencv) to fall back to the
host OpenCV detector for cross-checking.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

from ..ops import sift2d as sift_ops


@dataclasses.dataclass
class Sift2dConfig:
    """Defaults per oc_sift.cpp:22-30 (OpenCV defaults)."""

    n_features: int = 0
    n_octave_layers: int = 3
    contrast_threshold: float = 0.04
    edge_threshold: float = 10.0
    sigma: float = 1.6


_PAD = 2048  # descriptor counts are padded to this multiple so the matching
# kernel compiles once per size bucket instead of once per image pair


def _match_descriptors(ref_desc, tar_desc, ratio: float):
    """Exact 2-NN L2 matching with Lowe ratio test on device (row-chunked so
    the distance block never materializes [N1, N2] — GT4-sized keypoint sets
    are ~60k per image).  Returns (keep_mask[N1], best_idx[N1])."""
    import jax.numpy as jnp

    n_ref, n_tar = len(ref_desc), len(tar_desc)
    pr = -n_ref % _PAD
    pt = -n_tar % _PAD
    r = jnp.asarray(np.pad(np.asarray(ref_desc, np.float32), ((0, pr), (0, 0))))
    t = jnp.asarray(np.pad(np.asarray(tar_desc, np.float32), ((0, pt), (0, 0))))
    r_ok = jnp.arange(n_ref + pr) < n_ref
    t_ok = jnp.arange(n_tar + pt) < n_tar
    keep, idx = sift_ops.match_device(r, r_ok, t, t_ok, jnp.float32(ratio))
    return np.asarray(keep)[:n_ref], np.asarray(idx)[:n_ref]


class SIFT2D:
    def __init__(self, backend: Optional[str] = None):
        self.sift_config = Sift2dConfig()
        self.matching_ratio = 0.8  # oc_sift.cpp:29
        self.backend = backend or os.environ.get("OPENCORR_SIFT2D", "tpu")
        self.ref_img = None
        self.tar_img = None
        self.ref_matched_kp: Optional[np.ndarray] = None  # [K, 2] (x, y)
        self.tar_matched_kp: Optional[np.ndarray] = None

    def set_sift_config(self, config: Sift2dConfig):
        self.sift_config = config

    def set_matching(self, ratio: float):
        self.matching_ratio = float(ratio)

    def set_images(self, ref_img, tar_img):
        self.ref_img = ref_img
        self.tar_img = tar_img

    def prepare(self):
        pass

    def compute_device(self):
        """Device-side pipeline: detection, compaction, and exact matching as
        one async dispatch chain with NO host transfer.  Returns device arrays
        (keep [K], idx [K], rx, ry, tx, ty); ``compute`` finishes with the
        single keypoint readback.  Exposed separately so callers (and benches)
        can overlap/batch the readback."""
        import jax.numpy as jnp

        cfg = self.sift_config
        kw = dict(n_octave_layers=cfg.n_octave_layers,
                  contrast_threshold=cfg.contrast_threshold,
                  edge_threshold=cfg.edge_threshold, sigma=cfg.sigma)
        ref_mat = np.asarray(getattr(self.ref_img, "mat", self.ref_img),
                             np.float32)
        tar_mat = np.asarray(getattr(self.tar_img, "mat", self.tar_img),
                             np.float32)

        def compact(res):
            oks = tuple(r[0] for r in res)
            xs = tuple(r[1] for r in res)
            ys = tuple(r[2] for r in res)
            descs = tuple(r[7] for r in res)
            octs = tuple(r[8] for r in res)
            k_total = min(sum(o.shape[0] for o in oks), 32768)
            k_total = -(-k_total // 2048) * 2048
            return sift_ops.compact_octaves(oks, xs, ys, descs,
                                            octaves=octs, k_total=k_total)

        rx, ry, rdesc, rok = compact(sift_ops.detect_and_compute(ref_mat, **kw))
        tx, ty, tdesc, tok = compact(sift_ops.detect_and_compute(tar_mat, **kw))
        keep, idx = sift_ops.match_device(rdesc, rok, tdesc, tok,
                                          jnp.float32(self.matching_ratio))
        return keep, idx, rx, ry, tx, ty

    def _compute_tpu(self):
        cfg = self.sift_config
        if cfg.n_features > 0:
            # retainBest needs host-side response sorting; rare path
            kw = dict(n_octave_layers=cfg.n_octave_layers,
                      contrast_threshold=cfg.contrast_threshold,
                      edge_threshold=cfg.edge_threshold, sigma=cfg.sigma)
            ref_mat = np.asarray(getattr(self.ref_img, "mat", self.ref_img),
                                 np.float32)
            tar_mat = np.asarray(getattr(self.tar_img, "mat", self.tar_img),
                                 np.float32)
            res_ref = sift_ops.detect_and_compute(ref_mat, **kw)
            res_tar = sift_ops.detect_and_compute(tar_mat, **kw)
            rp, rd, _, _, rr = sift_ops.gather_keypoints(res_ref)
            tp, td, _, _, tr = sift_ops.gather_keypoints(res_tar)
            rp, rd = _retain_best(rp, rd, rr, cfg.n_features)
            tp, td = _retain_best(tp, td, tr, cfg.n_features)
            keep, idx = _match_descriptors(rd, td, self.matching_ratio)
            self.ref_matched_kp = rp[keep]
            self.tar_matched_kp = tp[idx[keep]]
            return

        keep, idx, rx, ry, tx, ty = self.compute_device()
        keep = np.asarray(keep)
        idx = np.asarray(idx)
        rxy = np.stack([np.asarray(rx), np.asarray(ry)], -1)
        txy = np.stack([np.asarray(tx), np.asarray(ty)], -1)
        self.ref_matched_kp = rxy[keep]
        self.tar_matched_kp = txy[idx[keep]]

    def _detect_opencv(self):
        import cv2

        cfg = self.sift_config
        sift = cv2.SIFT_create(
            nfeatures=cfg.n_features,
            nOctaveLayers=cfg.n_octave_layers,
            contrastThreshold=cfg.contrast_threshold,
            edgeThreshold=cfg.edge_threshold,
            sigma=cfg.sigma,
        )
        ref_kp, ref_desc = sift.detectAndCompute(_as_u8(self.ref_img), None)
        tar_kp, tar_desc = sift.detectAndCompute(_as_u8(self.tar_img), None)
        if ref_desc is None or tar_desc is None:
            return (np.zeros((0, 2), np.float32), np.zeros((0, 128), np.float32),
                    np.zeros((0, 2), np.float32), np.zeros((0, 128), np.float32))
        ref_pts = np.array([kp.pt for kp in ref_kp], np.float32)
        tar_pts = np.array([kp.pt for kp in tar_kp], np.float32)
        return ref_pts, ref_desc, tar_pts, tar_desc

    def compute(self):
        if self.backend != "opencv":
            self._compute_tpu()
            return
        ref_pts, ref_desc, tar_pts, tar_desc = self._detect_opencv()
        if len(ref_pts) == 0 or len(tar_pts) < 2:
            self.ref_matched_kp = np.zeros((0, 2), np.float32)
            self.tar_matched_kp = np.zeros((0, 2), np.float32)
            return

        keep, idx = _match_descriptors(ref_desc, tar_desc, self.matching_ratio)
        self.ref_matched_kp = ref_pts[keep]
        self.tar_matched_kp = tar_pts[idx[keep]]

    def clear(self):
        self.ref_matched_kp = None
        self.tar_matched_kp = None


def _retain_best(pts, desc, resp, n):
    """cv::KeyPointsFilter::retainBest: keep the n strongest responses."""
    if len(pts) <= n:
        return pts, desc
    order = np.argsort(-resp, kind="stable")[:n]
    return pts[order], desc[order]


def _as_u8(img):
    mat = getattr(img, "mat", img)
    mat = np.asarray(mat)
    if mat.dtype != np.uint8:
        mat = np.clip(mat, 0, 255).astype(np.uint8)
    return mat
