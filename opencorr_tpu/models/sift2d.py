"""2D SIFT feature extraction + matching (reference API: ``SIFT2D``,
oc_sift.h:39).

The reference wraps OpenCV's SIFT detector and matches descriptors with
FLANN's approximate 2-NN + Lowe ratio test (oc_sift.cpp:60-130).  Here
detection/description stays on OpenCV (host — parity with the reference's own
choice), but matching runs on TPU as one [N1,128]x[128,N2] distance matmul
with an exact top-2, which is both exact (FLANN is approximate) and fast.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..utils.precision import highest_precision


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


@highest_precision
def _match_padded(r, t, n_tar, ratio):
    import jax
    import jax.numpy as jnp

    # ||r - t||^2 = |r|^2 + |t|^2 - 2 r.t — one MXU matmul.
    rr = jnp.sum(r * r, axis=1, keepdims=True)
    tt = jnp.sum(t * t, axis=1)[None, :]
    d2 = rr + tt - 2.0 * (r @ t.T)
    d2 = jnp.maximum(d2, 0.0)
    # mask out padded target columns
    col = jnp.arange(t.shape[0])[None, :]
    d2 = jnp.where(col < n_tar, d2, jnp.float32(3.4e38))
    neg2, idx2 = jax.lax.top_k(-d2, 2)
    d_first = jnp.sqrt(-neg2[:, 0])
    d_second = jnp.sqrt(-neg2[:, 1])
    keep = d_first < ratio * d_second
    return keep, idx2[:, 0]


_match_padded_jit = None


def _match_descriptors(ref_desc, tar_desc, ratio: float):
    """Exact 2-NN L2 matching with Lowe ratio test on device.

    Returns (keep_mask[N1], best_idx[N1]).
    """
    global _match_padded_jit
    import jax
    import jax.numpy as jnp

    if _match_padded_jit is None:
        _match_padded_jit = jax.jit(_match_padded)

    n_ref, n_tar = len(ref_desc), len(tar_desc)
    pr = -len(ref_desc) % _PAD
    pt = -len(tar_desc) % _PAD
    r = jnp.asarray(np.pad(np.asarray(ref_desc, np.float32), ((0, pr), (0, 0))))
    t = jnp.asarray(np.pad(np.asarray(tar_desc, np.float32), ((0, pt), (0, 0))))
    keep, idx = _match_padded_jit(r, t, jnp.int32(n_tar), jnp.float32(ratio))
    return np.asarray(keep)[:n_ref], np.asarray(idx)[:n_ref]


class SIFT2D:
    def __init__(self):
        self.sift_config = Sift2dConfig()
        self.matching_ratio = 0.8  # oc_sift.cpp:29
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

    def compute(self):
        import cv2

        cfg = self.sift_config
        sift = cv2.SIFT_create(
            nfeatures=cfg.n_features,
            nOctaveLayers=cfg.n_octave_layers,
            contrastThreshold=cfg.contrast_threshold,
            edgeThreshold=cfg.edge_threshold,
            sigma=cfg.sigma,
        )
        ref_mat = _as_u8(self.ref_img)
        tar_mat = _as_u8(self.tar_img)
        ref_kp, ref_desc = sift.detectAndCompute(ref_mat, None)
        tar_kp, tar_desc = sift.detectAndCompute(tar_mat, None)
        if ref_desc is None or tar_desc is None or len(tar_kp) < 2:
            self.ref_matched_kp = np.zeros((0, 2), np.float32)
            self.tar_matched_kp = np.zeros((0, 2), np.float32)
            return

        keep, idx = _match_descriptors(ref_desc, tar_desc, self.matching_ratio)
        ref_pts = np.array([kp.pt for kp in ref_kp], np.float32)
        tar_pts = np.array([kp.pt for kp in tar_kp], np.float32)
        self.ref_matched_kp = ref_pts[keep]
        self.tar_matched_kp = tar_pts[idx[keep]]

    def clear(self):
        self.ref_matched_kp = None
        self.tar_matched_kp = None


def _as_u8(img):
    mat = getattr(img, "mat", img)
    mat = np.asarray(mat)
    if mat.dtype != np.uint8:
        mat = np.clip(mat, 0, 255).astype(np.uint8)
    return mat
