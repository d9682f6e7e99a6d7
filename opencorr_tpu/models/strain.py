"""Strain module wrapper (reference API: ``Strain``, oc_strain.h:32)."""

from __future__ import annotations

import weakref
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..data import poi as poi_mod
from ..ops import strain as strain_ops
from . import base


class Strain:
    """Pointwise strain from the displacement field.

    Defaults mirror the reference ctor (oc_strain.cpp:31-46): ZNCC threshold
    0.9, Lagrangian description, Cauchy approximation.  The per-thread k-d
    trees (oc_strain.cpp:97-147) are replaced by two TPU-friendly paths:

    * **grid** (the common case — POI queues are regular grids): the in-radius
      neighbor set is a fixed offset stencil; the device kernel derives every
      POI's neighbor indices by index arithmetic, fused with the fit into one
      program.  No host per-POI work at all.
    * **scattered**: one host cKDTree precomputes a fixed-width neighbor index
      table (exact-k ``knnSearch`` fallback included); the fits run batched on
      device (ops/strain.py).
    """

    def __init__(self, subregion_radius: float = 20.0,
                 neighbor_number_min: int = 5,
                 chunk_size: Optional[int] = None):
        """``chunk_size=None`` sizes POI chunks from a poi*neighbor budget
        (large queues split; a 30k r=20 field runs as one dispatch)."""
        self.subregion_radius = float(subregion_radius)
        self.neighbor_number_min = int(neighbor_number_min)
        self.zncc_threshold = 0.9
        self.description = 1  # 1: Lagrangian, 2: Eulerian (output doc only)
        self.approximation = 1  # 1: Cauchy, 2: Green-Lagrange
        self.chunk_size = chunk_size
        self._cache = []  # [(weakref(x), kind, (radius, nmin), data)]
        self._memo = base.Memo()

    def _scalars(self):
        """Device scalars memoized on their values (stable closure cells —
        see base._fn_key)."""
        return self._memo.get(
            (self.subregion_radius, self.zncc_threshold,
             self.neighbor_number_min),
            lambda: (jnp.float32(self.subregion_radius),
                     jnp.float32(self.zncc_threshold),
                     jnp.float32(self.neighbor_number_min)))

    def set_subregion_radius(self, r: float):
        self.subregion_radius = float(r)

    def set_neighbor_min(self, n: int):
        self.neighbor_number_min = int(n)

    def set_zncc_threshold(self, t: float):
        self.zncc_threshold = float(t)

    def set_description(self, d: int):
        self.description = int(d)

    def set_approximation(self, a: int):
        self.approximation = int(a)

    def prepare(self, table=None, points=None):
        """Optionally pre-build the neighbor structure for a table (the
        reference rebuilds its k-d trees per queue, oc_strain.cpp:97-147;
        here repeated compute() calls on the same table reuse the cache).

        ``points``: optional host-side ``[N, 2|3]`` coordinates matching the
        table — supplies the search coordinates without reading back device
        buffers (2DS search coords are the 2D image x, y)."""
        if table is None:
            return
        if points is None:
            self.compute(table)
            return
        pts = np.asarray(points, np.float64)
        if isinstance(table, poi_mod.POITable2D):
            kind = "2d"
        elif isinstance(table, poi_mod.POITable3D):
            kind = "3d"
        elif isinstance(table, poi_mod.POITable2DS):
            kind = "2ds"
        else:
            raise TypeError(type(table))

        def build():
            if kind == "3d":
                g = strain_ops.detect_grid_3d(pts[:, 0], pts[:, 1], pts[:, 2])
                if g is not None:
                    iz, iy, ix, lookup, gz, gy, gx = g
                    st = strain_ops.grid_stencil_3d(
                        gz, gy, gx, self.subregion_radius,
                        self.neighbor_number_min)
                    if st is not None:
                        dk, di, dj = st
                        return ("grid", (jnp.asarray(iz), jnp.asarray(iy),
                                         jnp.asarray(ix), jnp.asarray(lookup),
                                         jnp.asarray(dk), jnp.asarray(di),
                                         jnp.asarray(dj)))
            else:
                grid = self._grid_2d(pts[:, 0], pts[:, 1])
                if grid is not None:
                    return ("grid", grid)
            return ("kdtree", self._neighbors(pts))

        self._cached(table.x, kind, build)

    def _cached(self, xobj, kind, build):
        """Memoize the neighbor structure on the coordinate buffer identity so
        steady-state compute() calls do no host work and no transfers."""
        params = (self.subregion_radius, self.neighbor_number_min)
        for ref, k, p, data in self._cache:
            if k == kind and p == params and ref() is xobj:
                return data
        data = build()
        self._cache.append((weakref.ref(xobj), kind, params, data))
        if len(self._cache) > 8:
            self._cache.pop(0)
        return data

    def _chunk(self, k: int) -> Optional[int]:
        """POI chunk length bounding the [chunk, K] working set (~64M
        gathered cells; one dispatch for typical fields)."""
        if self.chunk_size is not None:
            return self.chunk_size
        return max(4096, 64_000_000 // max(int(k), 1))

    def _grid_2d(self, x, y):
        """Grid fast path pieces for a 2D point set, or None."""
        g = strain_ops.detect_grid_2d(x, y)
        if g is None:
            return None
        iy, ix, lookup, gy, gx = g
        st = strain_ops.grid_stencil_2d(gy, gx, self.subregion_radius,
                                        self.neighbor_number_min)
        if st is None:  # corner POIs could need the exact-KNN fallback
            return None
        di, dj = st
        return (jnp.asarray(iy), jnp.asarray(ix), jnp.asarray(lookup),
                jnp.asarray(di), jnp.asarray(dj))

    def _neighbors(self, search_pts: np.ndarray):
        idx, ok, use_radius = strain_ops.neighbor_lists(
            search_pts, search_pts, self.subregion_radius,
            self.neighbor_number_min)
        return jnp.asarray(idx), jnp.asarray(ok), jnp.asarray(use_radius)

    def compute(self, table):
        if isinstance(table, poi_mod.POITable2D):
            return self._compute_2d(table)
        if isinstance(table, poi_mod.POITable3D):
            return self._compute_3d(table)
        if isinstance(table, poi_mod.POITable2DS):
            return self._compute_2ds(table)
        raise TypeError(type(table))

    def _compute_2d(self, table: poi_mod.POITable2D) -> poi_mod.POITable2D:
        radius, thr, nmin = self._scalars()
        approx = self.approximation

        def build():
            x_np = base.host_hint(table.x)
            y_np = base.host_hint(table.y)
            if x_np is None or y_np is None:  # one readback per unseen queue
                x_np, y_np = np.asarray(table.x), np.asarray(table.y)
            grid = self._grid_2d(x_np, y_np)
            if grid is not None:
                return ("grid", grid)
            return ("kdtree",
                    self._neighbors(np.stack([x_np, y_np], axis=-1)))

        mode, data = self._cached(table.x, "2d", build)
        # the full-table neighbor-source fields are per-call values: they ride
        # the consts channel so the chunk-program cache stays hot across
        # tables (base.chunked docstring)
        consts = (table.x, table.y, table.p, table.r, radius, thr, nmin)
        if mode == "grid":
            iy, ix, lookup, di, dj = data

            def run_g(t, iy_c, ix_c, xs, ys, p_all, r_all, rad, th, nm,
                      lk, di_c, dj_c):
                e = strain_ops.strain2d_grid(
                    xs, ys, p_all[:, poi_mod.U], p_all[:, poi_mod.V],
                    r_all[:, poi_mod.R_ZNCC],
                    t.x, t.y, t.r[:, poi_mod.R_ZNCC], t.e,
                    iy_c, ix_c, lk, di_c, dj_c,
                    rad, th, nm, approximation=approx,
                )
                return t.replace(e=e)

            return base.chunked(run_g, table, self._chunk(di.shape[0]), iy, ix,
                                consts=consts + (lookup, di, dj))

        nb_idx, nb_ok, use_radius = data

        def run(t, idx_c, ok_c, ur_c, xs, ys, p_all, r_all, rad, th, nm):
            e = strain_ops.strain2d(
                xs, ys, p_all[:, poi_mod.U], p_all[:, poi_mod.V],
                r_all[:, poi_mod.R_ZNCC],
                t.x, t.y, t.r[:, poi_mod.R_ZNCC], t.e,
                idx_c, ok_c, ur_c,
                rad, th, nm, approximation=approx,
            )
            return t.replace(e=e)

        return base.chunked(run, table, self._chunk(nb_idx.shape[1]),
                            nb_idx, nb_ok, use_radius, consts=consts)

    def _compute_3d(self, table: poi_mod.POITable3D) -> poi_mod.POITable3D:
        radius, thr, nmin = self._scalars()
        approx = self.approximation

        def build():
            x_np = base.host_hint(table.x)
            y_np = base.host_hint(table.y)
            z_np = base.host_hint(table.z)
            if x_np is None or y_np is None or z_np is None:
                x_np = np.asarray(table.x)
                y_np = np.asarray(table.y)
                z_np = np.asarray(table.z)
            g = strain_ops.detect_grid_3d(x_np, y_np, z_np)
            if g is not None:
                iz, iy, ix, lookup, gz, gy, gx = g
                st = strain_ops.grid_stencil_3d(
                    gz, gy, gx, self.subregion_radius,
                    self.neighbor_number_min)
                if st is not None:
                    dk, di, dj = st
                    return ("grid", (jnp.asarray(iz), jnp.asarray(iy),
                                     jnp.asarray(ix), jnp.asarray(lookup),
                                     jnp.asarray(dk), jnp.asarray(di),
                                     jnp.asarray(dj)))
            return ("kdtree", self._neighbors(
                np.stack([x_np, y_np, z_np], axis=-1)))

        mode, data = self._cached(table.x, "3d", build)
        consts = (table.x, table.y, table.z, table.p, table.r,
                  radius, thr, nmin)
        if mode == "grid":
            iz_d, iy_d, ix_d, lookup_d, dk_d, di_d, dj_d = data

            def run_g(t, iz_c, iy_c, ix_c, xs, ys, zs, p_all, r_all,
                      rad, th, nm, lk, dk_c, di_c, dj_c):
                e = strain_ops.strain3d_grid(
                    xs, ys, zs, p_all[:, poi_mod.U3], p_all[:, poi_mod.V3],
                    p_all[:, poi_mod.W3], r_all[:, poi_mod.R3_ZNCC],
                    t.x, t.y, t.z, t.r[:, poi_mod.R3_ZNCC], t.e,
                    iz_c, iy_c, ix_c, lk, dk_c, di_c, dj_c,
                    rad, th, nm, approximation=approx,
                )
                return t.replace(e=e)

            return base.chunked(run_g, table, self._chunk(dk_d.shape[0]),
                                iz_d, iy_d, ix_d,
                                consts=consts + (lookup_d, dk_d, di_d, dj_d))

        nb_idx, nb_ok, use_radius = data

        def run(t, idx_c, ok_c, ur_c, xs, ys, zs, p_all, r_all, rad, th, nm):
            e = strain_ops.strain3d(
                xs, ys, zs, p_all[:, poi_mod.U3], p_all[:, poi_mod.V3],
                p_all[:, poi_mod.W3], r_all[:, poi_mod.R3_ZNCC],
                t.x, t.y, t.z, t.r[:, poi_mod.R3_ZNCC], t.e,
                idx_c, ok_c, ur_c,
                rad, th, nm, approximation=approx,
            )
            return t.replace(e=e)

        return base.chunked(run, table, self._chunk(nb_idx.shape[1]),
                            nb_idx, nb_ok, use_radius, consts=consts)

    def _compute_2ds(self, table: poi_mod.POITable2DS) -> poi_mod.POITable2DS:
        """Stereo strain: fit against reconstructed 3D ref_coor deltas; a POI
        participates only if all three ZNCCs pass (oc_strain.cpp:250-355)."""
        radius, thr, nmin = self._scalars()
        approx = self.approximation
        # neighborhood search runs on the 2D image coords (oc_strain.cpp:256),
        # but the fit uses 3D ref_coor deltas; the min of the three stereo
        # ZNCCs is the gate.

        def build():
            x_np = base.host_hint(table.x)
            y_np = base.host_hint(table.y)
            if x_np is None or y_np is None:
                x_np, y_np = np.asarray(table.x), np.asarray(table.y)
            grid = self._grid_2d(x_np, y_np)
            if grid is not None:
                return ("grid", grid)
            return ("kdtree",
                    self._neighbors(np.stack([x_np, y_np], axis=-1)))

        mode, data = self._cached(table.x, "2ds", build)
        consts = (table.x, table.y, table.ref_coor, table.p, table.r,
                  radius, thr, nmin)
        if mode == "grid":
            iy, ix, lookup, di, dj = data

            def run_g(t, iy_c, ix_c, xs, ys, rc_all, p_all, r_all,
                      rad, th, nm, lk, di_c, dj_c):
                qzmin = jnp.min(t.r[:, 0:3], axis=1)
                e = strain_ops.strain2ds_grid(
                    xs, ys,
                    rc_all[:, 0], rc_all[:, 1], rc_all[:, 2],
                    p_all[:, 0], p_all[:, 1], p_all[:, 2],
                    jnp.min(r_all[:, 0:3], axis=1),
                    t.x, t.y,
                    t.ref_coor[:, 0], t.ref_coor[:, 1], t.ref_coor[:, 2],
                    qzmin, t.e,
                    iy_c, ix_c, lk, di_c, dj_c,
                    rad, th, nm, approximation=approx,
                )
                return t.replace(e=e)

            return base.chunked(run_g, table, self._chunk(di.shape[0]), iy, ix,
                                consts=consts + (lookup, di, dj))

        nb_idx, nb_ok, use_radius = data

        def run(t, idx_c, ok_c, ur_c, xs, ys, rc_all, p_all, r_all,
                rad, th, nm):
            qzmin = jnp.min(t.r[:, 0:3], axis=1)
            e = strain_ops.strain2ds(
                xs, ys,
                rc_all[:, 0], rc_all[:, 1], rc_all[:, 2],
                p_all[:, 0], p_all[:, 1], p_all[:, 2],
                jnp.min(r_all[:, 0:3], axis=1),
                t.x, t.y,
                t.ref_coor[:, 0], t.ref_coor[:, 1], t.ref_coor[:, 2],
                qzmin, t.e,
                idx_c, ok_c, ur_c,
                rad, th, nm, approximation=approx,
            )
            return t.replace(e=e)

        return base.chunked(run, table, self._chunk(nb_idx.shape[1]),
                            nb_idx, nb_ok, use_radius, consts=consts)
