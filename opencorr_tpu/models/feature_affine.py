"""FeatureAffine module wrappers (reference API: ``FeatureAffine2D``/``3D``,
oc_feature_affine.h:37-118)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..data import poi as poi_mod
from ..ops import feature_affine as fa_ops
from . import base

import functools

import jax


@functools.partial(
    jax.jit, static_argnames=("k_cap", "trials", "samples", "knn_only"))
def _fa2d_full(ref_kp, tar_kp, t, radius, nmin, thr, seed, knn_k,
               *, k_cap, trials, samples, knn_only=False):
    p6, zncc, it, feat, ok = fa_ops.feature_affine_2d(
        ref_kp, tar_kp, t.x, t.y, t.r[:, poi_mod.R_ZNCC],
        radius, nmin, thr, seed, knn_k,
        k_cap=k_cap, trials=trials, samples=samples, knn_only=knn_only)
    p = t.p
    for src, dst in enumerate([0, 1, 2, 6, 7, 8]):
        p = p.at[:, dst].set(jnp.where(ok, p6[:, src], p[:, dst]))
    r = t.r
    r = r.at[:, poi_mod.R_ZNCC].set(zncc)
    r = r.at[:, poi_mod.R_ITER].set(jnp.where(ok, it, r[:, poi_mod.R_ITER]))
    r = r.at[:, poi_mod.R_FEAT].set(jnp.where(ok, feat, r[:, poi_mod.R_FEAT]))
    return t.replace(p=p, r=r)


@functools.partial(jax.jit, static_argnames=("k_cap", "trials", "samples"))
def _fa3d_full(ref_kp, tar_kp, t, radius, nmin, thr, seed,
               *, k_cap, trials, samples):
    p12, zncc, it, feat, ok = fa_ops.feature_affine_3d(
        ref_kp, tar_kp, t.x, t.y, t.z, t.r[:, poi_mod.R3_ZNCC],
        radius, nmin, thr, seed,
        k_cap=k_cap, trials=trials, samples=samples)
    p = jnp.where(ok[:, None], p12, t.p)
    r = t.r
    r = r.at[:, poi_mod.R3_ZNCC].set(zncc)
    r = r.at[:, poi_mod.R3_ITER].set(jnp.where(ok, it, r[:, poi_mod.R3_ITER]))
    r = r.at[:, poi_mod.R3_FEAT].set(jnp.where(ok, feat, r[:, poi_mod.R3_FEAT]))
    return t.replace(p=p, r=r)


@dataclasses.dataclass
class RansacConfig:
    """oc_feature_affine.h:26-31."""

    trial_number: int
    sample_number: int
    error_threshold: float


class FeatureAffine2D(base.Module2D):
    """Per-POI 1st-order deformation guess from matched keypoints via RANSAC
    (oc_feature_affine.cpp:118-342). Defaults per ctor (:34-47)."""

    def __init__(self, radius_x: int, radius_y: int, k_cap: int = 128,
                 seed: int = 0, chunk_size: Optional[int] = 16384):
        super().__init__(radius_x, radius_y)
        self.neighbor_search_radius = float(np.sqrt(radius_x**2 + radius_y**2))
        self.neighbor_number_min = 7
        self.ransac = RansacConfig(trial_number=20, sample_number=3,
                                   error_threshold=1.5)
        self.subset_feature_min = 14  # self-adaptive mode (:46)
        self.subset_radius_min = 10  # (:47)
        self.k_cap = int(k_cap)
        self.seed = int(seed)
        self.chunk_size = chunk_size
        self.ref_kp: Optional[np.ndarray] = None
        self.tar_kp: Optional[np.ndarray] = None

    def set_search(self, radius: float, neighbor_min: int):
        self.neighbor_search_radius = float(radius)
        self.neighbor_number_min = int(neighbor_min)

    def set_ransac_config(self, cfg: RansacConfig):
        self.ransac = cfg

    def set_subset_adjustment(self, feature_min: int, radius_min: int):
        self.subset_feature_min = int(feature_min)
        self.subset_radius_min = int(radius_min)

    def set_keypoint_pair(self, ref_kp, tar_kp):
        self.ref_kp = np.asarray(ref_kp, np.float32).reshape(-1, 2)
        self.tar_kp = np.asarray(tar_kp, np.float32).reshape(-1, 2)

    def prepare(self):
        pass  # neighbor search runs on device inside compute

    def compute(self, table: poi_mod.POITable2D) -> poi_mod.POITable2D:
        if self.ref_kp is None:
            raise RuntimeError("call set_keypoint_pair() first")
        if self.self_adaptive:
            return self._compute_self_adaptive(table)
        ref_kp = jnp.asarray(self.ref_kp)
        tar_kp = jnp.asarray(self.tar_kp)
        radius = jnp.float32(self.neighbor_search_radius)
        nmin = jnp.float32(self.neighbor_number_min)
        thr = jnp.float32(self.ransac.error_threshold)
        seed = jnp.int32(self.seed)

        def run(t: poi_mod.POITable2D) -> poi_mod.POITable2D:
            return _fa2d_full(
                ref_kp, tar_kp, t, radius, nmin, thr, seed, jnp.float32(0.0),
                k_cap=self.k_cap, trials=self.ransac.trial_number,
                samples=self.ransac.sample_number)

        return base.chunked(run, table, self.chunk_size)

    def _compute_self_adaptive(self, table: poi_mod.POITable2D) -> poi_mod.POITable2D:
        """Self-adaptive subset mode (oc_feature_affine.cpp:128-179): KNN the
        nearest ``subset_feature_min`` keypoints, shrink/move the POI and its
        subset radii to cover them, clamp to ``subset_radius_min``, then run
        RANSAC on exactly those keypoints.

        Host-side numpy (the queue is tiny relative to refinement cost); the
        RANSAC stage reuses the batched device kernel with the KNN radius.
        """
        xs = np.asarray(table.x).copy()
        ys = np.asarray(table.y).copy()
        n = table.n
        k = min(self.subset_feature_min, len(self.ref_kp))
        d2 = (xs[:, None] - self.ref_kp[None, :, 0]) ** 2 + (
            ys[:, None] - self.ref_kp[None, :, 1]) ** 2
        knn_idx = np.argsort(d2, axis=1)[:, :k]
        kx = self.ref_kp[knn_idx, 0]  # [N, k]
        ky = self.ref_kp[knn_idx, 1]
        x_min, x_max = kx.min(1), kx.max(1)
        y_min, y_max = ky.min(1), ky.max(1)

        inside = (xs >= x_min) & (xs <= x_max) & (ys >= y_min) & (ys <= y_max)
        srx = np.where(
            inside,
            np.maximum(np.abs(x_max - xs), np.abs(xs - x_min)).astype(np.int32),
            (0.5 * (x_max - x_min)).astype(np.int32),
        )
        sry = np.where(
            inside,
            np.maximum(np.abs(y_max - ys), np.abs(ys - y_min)).astype(np.int32),
            (0.5 * (y_max - y_min)).astype(np.int32),
        )
        xs = np.where(inside, xs, (0.5 * (x_max + x_min)).astype(np.int32))
        ys = np.where(inside, ys, (0.5 * (y_max + y_min)).astype(np.int32))
        srx = np.maximum(srx, self.subset_radius_min)
        sry = np.maximum(sry, self.subset_radius_min)

        t = table.replace(
            x=jnp.asarray(xs, jnp.float32),
            y=jnp.asarray(ys, jnp.float32),
            sr=jnp.asarray(np.stack([srx, sry], -1), jnp.float32),
        )

        # RANSAC over exactly the KNN candidate sets (knn_only kernel mode).
        ref_kp = jnp.asarray(self.ref_kp)
        tar_kp = jnp.asarray(self.tar_kp)
        nmin = jnp.float32(self.neighbor_number_min)
        thr = jnp.float32(self.ransac.error_threshold)
        seed = jnp.int32(self.seed)
        knn_k = jnp.float32(k)

        def run(tc: poi_mod.POITable2D) -> poi_mod.POITable2D:
            return _fa2d_full(
                ref_kp, tar_kp, tc, jnp.float32(0.0), nmin, thr, seed, knn_k,
                k_cap=self.k_cap, trials=self.ransac.trial_number,
                samples=self.ransac.sample_number, knn_only=True)

        return base.chunked(run, t, self.chunk_size)


class FeatureAffine3D:
    """3D analogue (oc_feature_affine.cpp:357-560). Defaults per ctor."""

    def __init__(self, radius_x: int, radius_y: int, radius_z: int,
                 k_cap: int = 128, seed: int = 0,
                 chunk_size: Optional[int] = 8192):
        self.neighbor_search_radius = float(
            np.sqrt(radius_x**2 + radius_y**2 + radius_z**2))
        self.neighbor_number_min = 16
        self.ransac = RansacConfig(trial_number=32, sample_number=4,
                                   error_threshold=3.2)
        self.k_cap = int(k_cap)
        self.seed = int(seed)
        self.chunk_size = chunk_size
        self.ref_kp: Optional[np.ndarray] = None
        self.tar_kp: Optional[np.ndarray] = None

    def set_search(self, radius: float, neighbor_min: int):
        self.neighbor_search_radius = float(radius)
        self.neighbor_number_min = int(neighbor_min)

    def set_ransac_config(self, cfg: RansacConfig):
        self.ransac = cfg

    def set_keypoint_pair(self, ref_kp, tar_kp):
        self.ref_kp = np.asarray(ref_kp, np.float32).reshape(-1, 3)
        self.tar_kp = np.asarray(tar_kp, np.float32).reshape(-1, 3)

    def prepare(self):
        pass

    def compute(self, table: poi_mod.POITable3D) -> poi_mod.POITable3D:
        if self.ref_kp is None:
            raise RuntimeError("call set_keypoint_pair() first")
        ref_kp = jnp.asarray(self.ref_kp)
        tar_kp = jnp.asarray(self.tar_kp)
        radius = jnp.float32(self.neighbor_search_radius)
        nmin = jnp.float32(self.neighbor_number_min)
        thr = jnp.float32(self.ransac.error_threshold)
        seed = jnp.int32(self.seed)

        def run(t: poi_mod.POITable3D) -> poi_mod.POITable3D:
            return _fa3d_full(
                ref_kp, tar_kp, t, radius, nmin, thr, seed,
                k_cap=self.k_cap, trials=self.ransac.trial_number,
                samples=self.ransac.sample_number)

        return base.chunked(run, table, self.chunk_size)
