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
    out = fa_ops.feature_affine_2d(
        ref_kp, tar_kp, t.x, t.y, t.r[:, poi_mod.R_ZNCC],
        radius, nmin, thr, seed, knn_k,
        k_cap=k_cap, trials=trials, samples=samples, knn_only=knn_only)
    return _merge_2d(t, out)


@functools.partial(jax.jit, static_argnames=("trials", "samples"))
def _fa2d_idx_full(ref_kp, tar_kp, t, idx, cand_mask, enough,
                   nmin, thr, seed, *, trials, samples):
    out = fa_ops.feature_affine_2d_idx(
        ref_kp, tar_kp, t.x, t.y, idx, cand_mask, enough,
        nmin, thr, seed, trials=trials, samples=samples)
    return _merge_2d(t, out)


def _merge_2d(t, out):
    p6, zncc, it, feat, ok = out
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
    out = fa_ops.feature_affine_3d(
        ref_kp, tar_kp, t.x, t.y, t.z, t.r[:, poi_mod.R3_ZNCC],
        radius, nmin, thr, seed,
        k_cap=k_cap, trials=trials, samples=samples)
    return _merge_3d(t, out)


@functools.partial(jax.jit, static_argnames=("trials", "samples"))
def _fa3d_idx_full(ref_kp, tar_kp, t, idx, cand_mask, enough,
                   nmin, thr, seed, *, trials, samples):
    out = fa_ops.feature_affine_3d_idx(
        ref_kp, tar_kp, t.x, t.y, t.z, idx, cand_mask, enough,
        nmin, thr, seed, trials=trials, samples=samples)
    return _merge_3d(t, out)


def _merge_3d(t, out):
    p12, zncc, it, feat, ok = out
    p = jnp.where(ok[:, None], p12, t.p)
    r = t.r
    r = r.at[:, poi_mod.R3_ZNCC].set(zncc)
    r = r.at[:, poi_mod.R3_ITER].set(jnp.where(ok, it, r[:, poi_mod.R3_ITER]))
    r = r.at[:, poi_mod.R3_FEAT].set(jnp.where(ok, feat, r[:, poi_mod.R3_FEAT]))
    return t.replace(p=p, r=r)


class _CandidateCache:
    """Memoize host-precomputed candidate tables on the POI coordinate buffer
    identity (same pattern as ``Strain._cached``): steady-state ``compute()``
    calls on one queue do no host work and no device->host transfers."""

    def __init__(self, cap: int = 8):
        self._entries = []  # [(weakref(x), params, data)]
        self._cap = cap

    def get(self, xobj, params, build):
        import weakref

        for ref, p, data in self._entries:
            if p == params and ref() is xobj:
                return data
        data = build()
        self._entries.append((weakref.ref(xobj), params, data))
        if len(self._entries) > self._cap:
            self._entries.pop(0)
        return data

    def clear(self):
        self._entries = []


# Device-resident keypoint buffers and scalar parameters are memoized
# (base.Memo): compute() used to rebuild them with jnp.asarray/jnp.float32
# every call — through the axon tunnel each fresh host->device buffer costs a
# dispatch round trip (the RANSAC kernel itself is ~60 us pipelined at 30k
# POIs), and fresh objects in the run-closure's cells defeat chunked()'s
# program cache (base._fn_key).
_DeviceArgCache = base.Memo


def _host_candidates(tree, q, kc, radius, neighbor_min, samples):
    """Host k-d tree candidate stage mirroring the device kernel's semantics
    (and the reference's nanoflann radius search with KNN fallback,
    oc_feature_affine.cpp:182-222): per query point, the nearest keypoints
    ascending by distance; candidates are the in-radius ones when their count
    reaches ``neighbor_min``, else the nearest ``neighbor_min``.
    Returns (idx[N, kc_eff] int32, cand_mask[N, kc_eff] bool, enough[N] bool).

    Adaptive k: a flat ``query(k=k_cap)`` costs ~25x the real need when the
    typical in-radius count is far below the cap (GT4: 210-370 ms of the
    temporal leg for ~13 in-radius keypoints at k_cap=128).  Query the
    nearest k0 first, then re-query ONLY the rows whose k-th neighbor is
    still in-radius (they may have more candidates) with doubled k, up to
    ``kc``.  Identical result set to the flat query.

    kc trim: candidates are sorted ascending by distance, so the kept set
    (in-radius, or nearest ``neighbor_min`` fallback) is always a PREFIX of
    the candidate row.  Columns past the longest prefix are all-masked padding
    whose [N, T, kc]-shaped RANSAC tensors still cost HBM traffic — trim to
    the max prefix length rounded up to a multiple of 16 (bit-identical
    results; the random sample indices are drawn mod n_cand, independent of
    kc)."""
    k = min(kc, max(16, int(neighbor_min), int(samples)))
    d, idx = tree.query(q, k=k, workers=-1)
    if k == 1:
        d, idx = d[:, None], idx[:, None]
    while k < kc:
        sat = d[:, -1] < radius  # full row in-radius: may have more neighbors
        if not sat.any():
            break
        k2 = min(kc, 2 * k)
        d2, i2 = tree.query(q[sat], k=k2, workers=-1)
        d = np.pad(d, ((0, 0), (0, k2 - k)), constant_values=np.inf)
        idx = np.pad(idx, ((0, 0), (0, k2 - k)))
        d[sat], idx[sat] = d2, i2
        k = k2
    in_r = d < radius  # strict <, matching d2 < r*r in the device kernel
    nr = in_r.sum(1)
    kc = k
    pos = np.arange(kc)[None, :]
    cand_mask = np.where((nr >= neighbor_min)[:, None], in_r,
                         pos < neighbor_min)
    enough = nr >= samples
    keep = int(cand_mask.sum(1).max(initial=0))
    kc_eff = min(kc, max(16, -(-max(keep, samples) // 16) * 16))
    return (idx[:, :kc_eff].astype(np.int32), cand_mask[:, :kc_eff], enough)


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
                 seed: int = 0, chunk_size: Optional[int] = 16384,
                 neighbor_backend: str = "host"):
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
        # "host": scipy cKDTree candidate stage (mirrors the reference's CPU
        # nanoflann, O(N log M)); "device": the all-pairs distance kernel.
        self.neighbor_backend = neighbor_backend
        self.ref_kp: Optional[np.ndarray] = None
        self.tar_kp: Optional[np.ndarray] = None
        self._tree = None
        self._cand = _CandidateCache()
        self._dev = _DeviceArgCache()

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
        self._tree = None
        self._cand.clear()
        self._dev.clear()

    def prepare(self, table=None, points=None):
        """Build the keypoint k-d tree (reference: prepare() builds the
        nanoflann index, oc_feature_affine.cpp:112-116).  Optionally
        precompute the candidate tables for ``table`` — pass ``points``
        ([N, 2] host coordinates matching the table) to avoid reading back
        device buffers (same contract as ``Strain.prepare``)."""
        if self.neighbor_backend == "host" and self.ref_kp is not None:
            from scipy.spatial import cKDTree

            self._tree = cKDTree(self.ref_kp)
            if table is not None:
                self._candidates(table, points)

    def _candidates(self, table, points=None):
        kc = min(self.k_cap, len(self.ref_kp))
        sm = self.ransac.sample_number
        params = (kc, self.neighbor_search_radius, self.neighbor_number_min,
                  sm)

        def build():
            if points is not None:
                q = np.asarray(points, np.float64).reshape(-1, 2)
            else:
                q = np.stack([np.asarray(table.x), np.asarray(table.y)], -1)
            idx, cand, enough = _host_candidates(
                self._tree, q, kc, self.neighbor_search_radius,
                self.neighbor_number_min, sm)
            return (jnp.asarray(idx), jnp.asarray(cand), jnp.asarray(enough))

        return self._cand.get(table.x, params, build)

    def compute(self, table: poi_mod.POITable2D) -> poi_mod.POITable2D:
        if self.ref_kp is None:
            raise RuntimeError("call set_keypoint_pair() first")
        if self.self_adaptive:
            return self._compute_self_adaptive(table)
        ref_kp, tar_kp, radius, nmin, thr, seed = self._dev.get(
            (self.neighbor_search_radius, self.neighbor_number_min,
             self.ransac.error_threshold, self.seed),
            lambda: (jnp.asarray(self.ref_kp), jnp.asarray(self.tar_kp),
                     jnp.float32(self.neighbor_search_radius),
                     jnp.float32(self.neighbor_number_min),
                     jnp.float32(self.ransac.error_threshold),
                     jnp.int32(self.seed)))
        tr, sm = self.ransac.trial_number, self.ransac.sample_number

        if self.neighbor_backend == "host":
            if self._tree is None:
                self.prepare()
            idx, cand, enough = self._candidates(table)

            def run_i(t, idx_c, cand_c, en_c, rkp, tkp, nm, th, sd):
                return _fa2d_idx_full(rkp, tkp, t, idx_c, cand_c, en_c,
                                      nm, th, sd, trials=tr, samples=sm)

            return base.chunked(run_i, table, self.chunk_size,
                                idx, cand, enough,
                                consts=(ref_kp, tar_kp, nmin, thr, seed))

        k_cap = self.k_cap

        def run(t, rkp, tkp, rad, nm, th, sd, kk):
            return _fa2d_full(
                rkp, tkp, t, rad, nm, th, sd, kk,
                k_cap=k_cap, trials=tr, samples=sm)

        return base.chunked(run, table, self.chunk_size,
                            consts=(ref_kp, tar_kp, radius, nmin, thr, seed,
                                    jnp.float32(0.0)))

    def _compute_self_adaptive(self, table: poi_mod.POITable2D) -> poi_mod.POITable2D:
        """Self-adaptive subset mode (oc_feature_affine.cpp:128-179): KNN the
        nearest ``subset_feature_min`` keypoints, shrink/move the POI and its
        subset radii to cover them, clamp to ``subset_radius_min``, then run
        RANSAC on exactly those keypoints.

        Host-side numpy (the queue is tiny relative to refinement cost); the
        RANSAC stage reuses the batched device kernel with the KNN radius.
        """
        xs = base.host_hint(table.x)
        ys = base.host_hint(table.y)
        if xs is None or ys is None:  # fresh-queue fallback: one readback
            xs = np.asarray(table.x)  # (new_table_* registers these hints,
            ys = np.asarray(table.y)  # so this only fires for ad-hoc tables)
            base.register_host_hint(table.x, xs)
            base.register_host_hint(table.y, ys)
        xs = xs.copy()
        ys = ys.copy()
        n = table.n
        k = min(self.subset_feature_min, len(self.ref_kp))
        if self._tree is None:
            self.prepare()
        if self._tree is not None:
            _, knn_idx = self._tree.query(np.stack([xs, ys], -1), k=k,
                                          workers=-1)
            knn_idx = knn_idx.reshape(n, k)
        else:
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

        # RANSAC over exactly the KNN candidate sets
        # (oc_feature_affine.cpp:139-151).
        ref_kp, tar_kp, radius, nmin, thr, seed = self._dev.get(
            (self.neighbor_search_radius, self.neighbor_number_min,
             self.ransac.error_threshold, self.seed),
            lambda: (jnp.asarray(self.ref_kp), jnp.asarray(self.tar_kp),
                     jnp.float32(self.neighbor_search_radius),
                     jnp.float32(self.neighbor_number_min),
                     jnp.float32(self.ransac.error_threshold),
                     jnp.int32(self.seed)))
        tr, sm = self.ransac.trial_number, self.ransac.sample_number

        sr_host = np.stack([srx, sry], -1).astype(np.float32)

        if self._tree is not None:
            idx = jnp.asarray(knn_idx.astype(np.int32))
            cand = jnp.ones((n, k), bool)
            enough = jnp.full((n,), k >= sm)

            def run_i(tc, idx_c, cand_c, en_c, rkp, tkp, nm, th, sd):
                return _fa2d_idx_full(rkp, tkp, tc, idx_c, cand_c, en_c,
                                      nm, th, sd, trials=tr, samples=sm)

            out = base.chunked(run_i, t, self.chunk_size, idx, cand, enough,
                               consts=(ref_kp, tar_kp, nmin, thr, seed))
            # downstream self-adaptive ICGN/ICLM derive their static max
            # radius from sr, and strain's neighbor precompute needs the
            # (moved) POI coordinates; the host copies spare them readbacks
            base.register_host_hint(out.sr, sr_host)
            base.register_host_hint(out.x, xs.astype(np.float32))
            base.register_host_hint(out.y, ys.astype(np.float32))
            return out

        k_cap = self.k_cap

        def run(tc, rkp, tkp, rad, nm, th, sd, kk):
            return _fa2d_full(
                rkp, tkp, tc, rad, nm, th, sd, kk,
                k_cap=k_cap, trials=tr, samples=sm, knn_only=True)

        out = base.chunked(run, t, self.chunk_size,
                           consts=(ref_kp, tar_kp, jnp.float32(0.0), nmin,
                                   thr, seed, jnp.float32(k)))
        base.register_host_hint(out.sr, sr_host)
        base.register_host_hint(out.x, xs.astype(np.float32))
        base.register_host_hint(out.y, ys.astype(np.float32))
        return out


class FeatureAffine3D:
    """3D analogue (oc_feature_affine.cpp:357-560). Defaults per ctor."""

    def __init__(self, radius_x: int, radius_y: int, radius_z: int,
                 k_cap: int = 128, seed: int = 0,
                 chunk_size: Optional[int] = 131072,
                 neighbor_backend: str = "host"):
        # chunk_size covers the full Torus queue (78.7k POIs) in ONE
        # program: at 8192 the stage was dispatch-bound (10 chunks x ~28 ms
        # against a ~60 us kernel — round-4 slope measurement); the
        # worst-case [N, T, kc] RANSAC tensors at 131072 POIs are ~0.6 GB,
        # well inside HBM next to the CT volumes.
        self.neighbor_search_radius = float(
            np.sqrt(radius_x**2 + radius_y**2 + radius_z**2))
        self.neighbor_number_min = 16
        self.ransac = RansacConfig(trial_number=32, sample_number=4,
                                   error_threshold=3.2)
        self.k_cap = int(k_cap)
        self.seed = int(seed)
        self.chunk_size = chunk_size
        self.neighbor_backend = neighbor_backend
        self.ref_kp: Optional[np.ndarray] = None
        self.tar_kp: Optional[np.ndarray] = None
        self._tree = None
        self._cand = _CandidateCache()
        self._dev = _DeviceArgCache()

    def set_search(self, radius: float, neighbor_min: int):
        self.neighbor_search_radius = float(radius)
        self.neighbor_number_min = int(neighbor_min)

    def set_ransac_config(self, cfg: RansacConfig):
        self.ransac = cfg

    def set_keypoint_pair(self, ref_kp, tar_kp):
        self.ref_kp = np.asarray(ref_kp, np.float32).reshape(-1, 3)
        self.tar_kp = np.asarray(tar_kp, np.float32).reshape(-1, 3)
        self._tree = None
        self._cand.clear()
        self._dev.clear()

    def prepare(self, table=None, points=None):
        if self.neighbor_backend == "host" and self.ref_kp is not None:
            from scipy.spatial import cKDTree

            self._tree = cKDTree(self.ref_kp)
            if table is not None:
                self._candidates(table, points)

    def _candidates(self, table, points=None):
        kc = min(self.k_cap, len(self.ref_kp))
        sm = self.ransac.sample_number
        params = (kc, self.neighbor_search_radius, self.neighbor_number_min,
                  sm)

        def build():
            if points is not None:
                q = np.asarray(points, np.float64).reshape(-1, 3)
            else:
                q = np.stack([np.asarray(table.x), np.asarray(table.y),
                              np.asarray(table.z)], -1)
            idx, cand, enough = _host_candidates(
                self._tree, q, kc, self.neighbor_search_radius,
                self.neighbor_number_min, sm)
            return (jnp.asarray(idx), jnp.asarray(cand), jnp.asarray(enough))

        return self._cand.get(table.x, params, build)

    def compute(self, table: poi_mod.POITable3D) -> poi_mod.POITable3D:
        if self.ref_kp is None:
            raise RuntimeError("call set_keypoint_pair() first")
        ref_kp, tar_kp, radius, nmin, thr, seed = self._dev.get(
            (self.neighbor_search_radius, self.neighbor_number_min,
             self.ransac.error_threshold, self.seed),
            lambda: (jnp.asarray(self.ref_kp), jnp.asarray(self.tar_kp),
                     jnp.float32(self.neighbor_search_radius),
                     jnp.float32(self.neighbor_number_min),
                     jnp.float32(self.ransac.error_threshold),
                     jnp.int32(self.seed)))
        tr, sm = self.ransac.trial_number, self.ransac.sample_number

        if self.neighbor_backend == "host":
            if self._tree is None:
                self.prepare()
            idx, cand, enough = self._candidates(table)

            def run_i(t, idx_c, cand_c, en_c, rkp, tkp, nm, th, sd):
                return _fa3d_idx_full(rkp, tkp, t, idx_c, cand_c, en_c,
                                      nm, th, sd, trials=tr, samples=sm)

            return base.chunked(run_i, table, self.chunk_size,
                                idx, cand, enough,
                                consts=(ref_kp, tar_kp, nmin, thr, seed))

        k_cap = self.k_cap

        def run(t, rkp, tkp, rad, nm, th, sd):
            return _fa3d_full(
                rkp, tkp, t, rad, nm, th, sd,
                k_cap=k_cap, trials=tr, samples=sm)

        return base.chunked(run, table, self.chunk_size,
                            consts=(ref_kp, tar_kp, radius, nmin, thr, seed))
