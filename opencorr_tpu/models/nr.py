"""NR module wrapper (reference API: ``NR2D1``, oc_nr.h:47)."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..data import poi as poi_mod
from ..ops import bspline, gradient, nr as nr_ops
from . import base


@functools.partial(jax.jit, static_argnames=("rx", "ry", "window_margin",
                                             "eval_mode"))
def _nr2d1_full(ref_img, lut, lut_gx, lut_gy, tar_img, tgx, tgy, t,
                conv, max_iter, *, rx, ry, window_margin=None,
                eval_mode="lattice"):
    p_out, u0, v0, zncc, it, dpn, computed = nr_ops.nr2d1(
        ref_img, lut, lut_gx, lut_gy, t.x, t.y, t.p,
        t.r[:, poi_mod.R_ZNCC], conv, max_iter, tar_img, tgx, tgy,
        rx=rx, ry=ry, window_margin=window_margin, eval_mode=eval_mode)
    r = t.r
    r = r.at[:, poi_mod.R_ZNCC].set(zncc)
    r = r.at[:, poi_mod.R_U0].set(jnp.where(computed, u0, r[:, poi_mod.R_U0]))
    r = r.at[:, poi_mod.R_V0].set(jnp.where(computed, v0, r[:, poi_mod.R_V0]))
    r = r.at[:, poi_mod.R_ITER].set(
        jnp.where(computed, it, r[:, poi_mod.R_ITER]))
    r = r.at[:, poi_mod.R_CONV].set(
        jnp.where(computed, dpn, r[:, poi_mod.R_CONV]))
    return t.replace(p=p_out, r=r)


class NR2D1(base.Module2D):
    """Forward-additive Newton-Raphson, 1st-order shape function
    (oc_nr.cpp:160-333)."""

    def __init__(self, subset_radius_x: int, subset_radius_y: int,
                 conv_criterion: float = 0.001, stop_condition: float = 10,
                 chunk_size: Optional[int] = 65536):
        super().__init__(subset_radius_x, subset_radius_y)
        self.conv_criterion = float(conv_criterion)
        self.stop_condition = float(stop_condition)
        self.chunk_size = chunk_size
        # gather-free windowed lattice interpolation by default (see
        # ops/icgn.make_windowed_eval2d; None = global LUT path)
        self.window_margin = 8
        self.eval_mode = "lattice"
        self._lut = None
        self._lut_gx = None
        self._lut_gy = None
        self._tgx = None
        self._tgy = None

    def set_iteration(self, conv_criterion: float, stop_condition: float):
        self.conv_criterion = float(conv_criterion)
        self.stop_condition = float(stop_condition)

    def prepare(self) -> None:
        """B-spline LUTs of the target image AND its gradient maps
        (oc_nr.cpp:119-158)."""
        tgx = gradient.gradient_x_2d(self.tar_img)
        tgy = gradient.gradient_y_2d(self.tar_img)
        self._lut = bspline.bicubic_prepare(self.tar_img)
        self._lut_gx = bspline.bicubic_prepare(tgx)
        self._lut_gy = bspline.bicubic_prepare(tgy)
        self._tgx = tgx
        self._tgy = tgy

    def compute(self, table: poi_mod.POITable2D) -> poi_mod.POITable2D:
        if self._lut is None:
            raise RuntimeError("call prepare() before compute()")
        rx, ry = self.subset_radius_x, self.subset_radius_y
        margin = self.window_margin
        mode = self.eval_mode
        if margin is not None:
            h, w = self.ref_img.shape
            if min(w - 2 * rx, h - 2 * ry) - 1 < 2 * margin:
                margin = None  # image smaller than the window: global path
        consts = (self.ref_img, self._lut, self._lut_gx, self._lut_gy,
                  self.tar_img, self._tgx, self._tgy) + self._memo.get(
            (self.conv_criterion, self.stop_condition),
            lambda: (jnp.float32(self.conv_criterion),
                     jnp.float32(self.stop_condition)))

        def run(t, ref_img, lut, lut_gx, lut_gy, tar_img, tgx, tgy, conv,
                max_iter):
            return _nr2d1_full(ref_img, lut, lut_gx, lut_gy, tar_img, tgx,
                               tgy, t, conv, max_iter, rx=rx, ry=ry,
                               window_margin=margin, eval_mode=mode)

        return base.chunked(run, table, base.budget_chunk(
            self.chunk_size, rx, ry), consts=consts)
