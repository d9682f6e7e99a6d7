"""FFTCC module wrappers (reference API: ``FFTCC2D``/``FFTCC3D``,
oc_fftcc.h:54-96)."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..data import poi as poi_mod
from ..ops import fftcc as fftcc_ops
from . import base


@functools.partial(jax.jit, static_argnames=("rx", "ry"))
def _fftcc2d_full(ref_img, tar_img, x, y, p, r, *, rx, ry):
    u, v, zncc, valid = fftcc_ops.fftcc2d(
        ref_img, tar_img, x, y, p[:, poi_mod.U], p[:, poi_mod.V], rx=rx, ry=ry)
    p_new = p.at[:, poi_mod.U].set(u).at[:, poi_mod.V].set(v)
    r = r.at[:, poi_mod.R_U0].set(
        jnp.where(valid, p[:, poi_mod.U], r[:, poi_mod.R_U0]))
    r = r.at[:, poi_mod.R_V0].set(
        jnp.where(valid, p[:, poi_mod.V], r[:, poi_mod.R_V0]))
    r = r.at[:, poi_mod.R_ZNCC].set(
        jnp.where(valid, zncc, r[:, poi_mod.R_ZNCC]))
    return p_new, r


@functools.partial(jax.jit, static_argnames=("rx", "ry", "rz"))
def _fftcc3d_full(ref_vol, tar_vol, x, y, z, p, r, *, rx, ry, rz):
    u, v, w, zncc, valid = fftcc_ops.fftcc3d(
        ref_vol, tar_vol, x, y, z,
        p[:, poi_mod.U3], p[:, poi_mod.V3], p[:, poi_mod.W3],
        rx=rx, ry=ry, rz=rz)
    p_new = (p.at[:, poi_mod.U3].set(u).at[:, poi_mod.V3].set(v)
             .at[:, poi_mod.W3].set(w))
    r = r.at[:, poi_mod.R3_U0].set(
        jnp.where(valid, p[:, poi_mod.U3], r[:, poi_mod.R3_U0]))
    r = r.at[:, poi_mod.R3_V0].set(
        jnp.where(valid, p[:, poi_mod.V3], r[:, poi_mod.R3_V0]))
    r = r.at[:, poi_mod.R3_W0].set(
        jnp.where(valid, p[:, poi_mod.W3], r[:, poi_mod.R3_W0]))
    r = r.at[:, poi_mod.R3_ZNCC].set(
        jnp.where(valid, zncc, r[:, poi_mod.R3_ZNCC]))
    return p_new, r


class FFTCC2D(base.Module2D):
    """Integer-pixel initial guess by batched FFT cross-correlation.

    Replaces the reference's per-thread FFTW pool + OpenMP loop
    (oc_fftcc.cpp:151-285) with one batched XLA FFT over the POI queue.
    """

    def __init__(self, subset_radius_x: int, subset_radius_y: int,
                 chunk_size: Optional[int] = 65536):
        super().__init__(subset_radius_x, subset_radius_y)
        self.chunk_size = chunk_size

    def compute(self, table: poi_mod.POITable2D) -> poi_mod.POITable2D:
        rx, ry = self.subset_radius_x, self.subset_radius_y

        def run(t, ref_img, tar_img):
            # u0/v0/zncc updated only for processed POIs (oc_fftcc.cpp:268-274)
            p, r = _fftcc2d_full(ref_img, tar_img, t.x, t.y, t.p,
                                 t.r, rx=rx, ry=ry)
            return t.replace(p=p, r=r)

        return base.chunked(run, table, self.chunk_size,
                            consts=(self.ref_img, self.tar_img))


class FFTCC3D(base.Module3D):
    """3D FFTCC for DVC (oc_fftcc.cpp:300-437)."""

    def __init__(self, subset_radius_x: int, subset_radius_y: int,
                 subset_radius_z: int, chunk_size: Optional[int] = 512):
        super().__init__(subset_radius_x, subset_radius_y, subset_radius_z)
        self.chunk_size = chunk_size

    def compute(self, table: poi_mod.POITable3D) -> poi_mod.POITable3D:
        rx, ry, rz = (self.subset_radius_x, self.subset_radius_y,
                      self.subset_radius_z)

        def run(t, ref_vol, tar_vol):
            p, r = _fftcc3d_full(ref_vol, tar_vol, t.x, t.y, t.z,
                                 t.p, t.r, rx=rx, ry=ry, rz=rz)
            return t.replace(p=p, r=r)

        return base.chunked(run, table, self.chunk_size,
                            consts=(self.ref_vol, self.tar_vol))


