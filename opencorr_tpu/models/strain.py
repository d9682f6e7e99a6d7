"""Strain module wrapper (reference API: ``Strain``, oc_strain.h:32)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..data import poi as poi_mod
from ..ops import strain as strain_ops
from . import base


class Strain:
    """Pointwise strain from the displacement field.

    Defaults mirror the reference ctor (oc_strain.cpp:31-46): ZNCC threshold
    0.9, Lagrangian description, Cauchy approximation.  The per-thread k-d
    trees (oc_strain.cpp:97-147) are replaced by masked distance matmuls
    computed on device (ops/strain.py).
    """

    def __init__(self, subregion_radius: float = 20.0,
                 neighbor_number_min: int = 5,
                 chunk_size: Optional[int] = 4096):
        self.subregion_radius = float(subregion_radius)
        self.neighbor_number_min = int(neighbor_number_min)
        self.zncc_threshold = 0.9
        self.description = 1  # 1: Lagrangian, 2: Eulerian (output doc only)
        self.approximation = 1  # 1: Cauchy, 2: Green-Lagrange
        self.chunk_size = chunk_size

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

    def prepare(self, table=None):
        """No-op: neighbor search happens inside compute on device."""

    def compute(self, table):
        if isinstance(table, poi_mod.POITable2D):
            return self._compute_2d(table)
        if isinstance(table, poi_mod.POITable3D):
            return self._compute_3d(table)
        if isinstance(table, poi_mod.POITable2DS):
            return self._compute_2ds(table)
        raise TypeError(type(table))

    def _compute_2d(self, table: poi_mod.POITable2D) -> poi_mod.POITable2D:
        radius = jnp.float32(self.subregion_radius)
        thr = jnp.float32(self.zncc_threshold)
        nmin = jnp.float32(self.neighbor_number_min)
        us = table.p[:, poi_mod.U]
        vs = table.p[:, poi_mod.V]
        zncc = table.r[:, poi_mod.R_ZNCC]

        def run(t: poi_mod.POITable2D) -> poi_mod.POITable2D:
            e = strain_ops.strain2d(
                table.x, table.y, us, vs, zncc, table.e,
                t.x, t.y, t.r[:, poi_mod.R_ZNCC], t.e,
                radius, thr, nmin, approximation=self.approximation,
            )
            return t.replace(e=e)

        return base.chunked(run, table, self.chunk_size)

    def _compute_3d(self, table: poi_mod.POITable3D) -> poi_mod.POITable3D:
        radius = jnp.float32(self.subregion_radius)
        thr = jnp.float32(self.zncc_threshold)
        nmin = jnp.float32(self.neighbor_number_min)
        us = table.p[:, poi_mod.U3]
        vs = table.p[:, poi_mod.V3]
        ws = table.p[:, poi_mod.W3]
        zncc = table.r[:, poi_mod.R3_ZNCC]

        def run(t: poi_mod.POITable3D) -> poi_mod.POITable3D:
            e = strain_ops.strain3d(
                table.x, table.y, table.z, us, vs, ws, zncc,
                t.x, t.y, t.z, t.r[:, poi_mod.R3_ZNCC], t.e,
                radius, thr, nmin, approximation=self.approximation,
            )
            return t.replace(e=e)

        return base.chunked(run, table, self.chunk_size)

    def _compute_2ds(self, table: poi_mod.POITable2DS) -> poi_mod.POITable2DS:
        """Stereo strain: fit against reconstructed 3D ref_coor deltas; a POI
        participates only if all three ZNCCs pass (oc_strain.cpp:250-355)."""
        radius = jnp.float32(self.subregion_radius)
        thr = jnp.float32(self.zncc_threshold)
        nmin = jnp.float32(self.neighbor_number_min)
        # neighborhood search runs on the 2D image coords (oc_strain.cpp:256),
        # but the fit uses 3D ref_coor deltas — pass ref_coor as coordinates
        # and the min-of-three ZNCC as the gate.
        zmin = jnp.min(
            table.r[:, 0:3], axis=1
        )  # r1r2_zncc, r1t1_zncc, r1t2_zncc
        us = table.p[:, 0]
        vs = table.p[:, 1]
        ws = table.p[:, 2]

        def run(t: poi_mod.POITable2DS) -> poi_mod.POITable2DS:
            qzmin = jnp.min(t.r[:, 0:3], axis=1)
            e = strain_ops.strain2ds(
                table.x, table.y,
                table.ref_coor[:, 0], table.ref_coor[:, 1], table.ref_coor[:, 2],
                us, vs, ws, zmin,
                t.x, t.y,
                t.ref_coor[:, 0], t.ref_coor[:, 1], t.ref_coor[:, 2],
                qzmin, t.e,
                radius, thr, nmin, approximation=self.approximation,
            )
            return t.replace(e=e)

        return base.chunked(run, table, self.chunk_size)
