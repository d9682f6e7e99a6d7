"""ICLM module wrappers (reference API: ``ICLM2D1``/``ICLM2D2``,
oc_iclm.h:54-146)."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..data import poi as poi_mod
from ..ops import bspline, gradient, iclm as iclm_ops
from . import base


def _merge_result(t, p_out, u0, v0, zncc, it, dpn, computed, rx, ry,
                  update_sr=True):
    r = t.r
    r = r.at[:, poi_mod.R_ZNCC].set(zncc)
    r = r.at[:, poi_mod.R_U0].set(jnp.where(computed, u0, r[:, poi_mod.R_U0]))
    r = r.at[:, poi_mod.R_V0].set(jnp.where(computed, v0, r[:, poi_mod.R_V0]))
    r = r.at[:, poi_mod.R_ITER].set(
        jnp.where(computed, it, r[:, poi_mod.R_ITER]))
    r = r.at[:, poi_mod.R_CONV].set(
        jnp.where(computed, dpn, r[:, poi_mod.R_CONV]))
    sr = t.sr
    if update_sr:
        sr = sr.at[:, 0].set(jnp.where(computed, float(rx), sr[:, 0]))
        sr = sr.at[:, 1].set(jnp.where(computed, float(ry), sr[:, 1]))
    return t.replace(p=p_out, r=r, sr=sr)


@functools.partial(jax.jit, static_argnames=("order", "rx", "ry",
                                             "window_margin", "eval_mode"))
def _iclm2d_full(gx, gy, ref_img, tar_lut, tar_img, t, conv, max_iter,
                 damping, *, order, rx, ry, window_margin=None,
                 eval_mode="lattice"):
    outs = iclm_ops.iclm2d(
        gx, gy, ref_img, tar_lut, t.x, t.y, t.p, t.r[:, poi_mod.R_ZNCC],
        conv, max_iter, damping, tar_img, order=order, rx=rx, ry=ry,
        window_margin=window_margin, eval_mode=eval_mode)
    return _merge_result(t, *outs, rx, ry)


@functools.partial(jax.jit, static_argnames=("order", "r_max"))
def _iclm2d_adaptive_full(gx, gy, ref_img, tar_lut, t, conv, max_iter,
                          damping, *, order, r_max):
    outs = iclm_ops.iclm2d_adaptive(
        gx, gy, ref_img, tar_lut, t.x, t.y, t.sr[:, 0], t.sr[:, 1], t.p,
        t.r[:, poi_mod.R_ZNCC], conv, max_iter, damping,
        order=order, r_max=r_max)
    return _merge_result(t, *outs, 0, 0, update_sr=False)


class _ICLM2DBase(base.Module2D):
    order: int = 1

    def __init__(self, subset_radius_x: int, subset_radius_y: int,
                 conv_criterion: float = 0.001, stop_condition: float = 10,
                 chunk_size: Optional[int] = 65536,
                 window_margin: Optional[int] = 8,
                 eval_mode: str = "lattice"):
        """``window_margin``/``eval_mode``: gather-free windowed lattice
        interpolation by default (ops/icgn.make_windowed_eval2d; the
        global tile-LUT gather measured ~5.7 s of real device time at the
        30k flagship queue).  None restores the global LUT path."""
        super().__init__(subset_radius_x, subset_radius_y)
        self.conv_criterion = float(conv_criterion)
        self.stop_condition = float(stop_condition)
        self.chunk_size = chunk_size
        self.window_margin = window_margin
        self.eval_mode = eval_mode
        # DampingParameter defaults (oc_iclm.h:32-37)
        self.damping_lambda = 100.0
        self.damping_alpha = 0.1
        self.damping_beta = 10.0
        self._gx = None
        self._gy = None
        self._lut = None

    def set_iteration(self, conv_criterion: float, stop_condition: float):
        self.conv_criterion = float(conv_criterion)
        self.stop_condition = float(stop_condition)

    def set_damping(self, lam: float, alpha: float, beta: float):
        """oc_iclm.cpp:114-119."""
        self.damping_lambda = float(lam)
        self.damping_alpha = float(alpha)
        self.damping_beta = float(beta)

    def prepare(self) -> None:
        self._gx = gradient.gradient_x_2d(self.ref_img)
        self._gy = gradient.gradient_y_2d(self.ref_img)
        self._lut = bspline.bicubic_prepare(self.tar_img)

    def compute(self, table: poi_mod.POITable2D) -> poi_mod.POITable2D:
        if self._lut is None:
            raise RuntimeError("call prepare() before compute()")
        if self.self_adaptive:
            return self._compute_adaptive(table)
        rx, ry = self.subset_radius_x, self.subset_radius_y
        order = self.order
        margin = self.window_margin
        mode = self.eval_mode
        if margin is not None:
            h, w = self.ref_img.shape
            if min(w - 2 * rx, h - 2 * ry) - 1 < 2 * margin:
                margin = None  # image smaller than the window: global path
        consts = (self._gx, self._gy, self.ref_img, self._lut,
                  self.tar_img) + self._memo.get(
            (self.conv_criterion, self.stop_condition, self.damping_lambda,
             self.damping_alpha, self.damping_beta),
            lambda: (jnp.float32(self.conv_criterion),
                     jnp.float32(self.stop_condition),
                     jnp.array([self.damping_lambda, self.damping_alpha,
                                self.damping_beta], jnp.float32)))

        def run(t, gx, gy, ref_img, lut, tar_img, conv, max_iter, damping):
            return _iclm2d_full(gx, gy, ref_img, lut, tar_img,
                                t, conv, max_iter, damping,
                                order=order, rx=rx, ry=ry,
                                window_margin=margin, eval_mode=mode)

        return base.chunked(run, table, base.budget_chunk(
            self.chunk_size, rx, ry), consts=consts)


    def _compute_adaptive(self, table: poi_mod.POITable2D) -> poi_mod.POITable2D:
        """Self-adaptive mode: per-POI radii from ``table.sr``
        (oc_iclm.cpp:158-164)."""
        import numpy as np

        sr = base.host_hint(table.sr)
        if sr is None:  # one readback per unseen queue (poisons the tunnel —
            sr = np.asarray(table.sr)  # FeatureAffine registers the hint)
            base.register_host_hint(table.sr, sr)
        r_max = int(max(np.max(sr), 1))
        order = self.order
        consts = (self._gx, self._gy, self.ref_img, self._lut) + self._memo.get(
            (self.conv_criterion, self.stop_condition, self.damping_lambda,
             self.damping_alpha, self.damping_beta),
            lambda: (jnp.float32(self.conv_criterion),
                     jnp.float32(self.stop_condition),
                     jnp.array([self.damping_lambda, self.damping_alpha,
                                self.damping_beta], jnp.float32)))

        def run(t, gx, gy, ref_img, lut, conv, max_iter, damping):
            return _iclm2d_adaptive_full(
                gx, gy, ref_img, lut, t, conv,
                max_iter, damping, order=order, r_max=r_max)

        chunk = self.chunk_size
        if chunk is not None:
            chunk = max(1024, chunk // max(1, (2 * r_max + 1) ** 2 // 1089))
        return base.chunked(run, table, chunk, consts=consts)


class ICLM2D1(_ICLM2DBase):
    """1st-order IC-LM (oc_iclm.cpp:150-368)."""

    order = 1


class ICLM2D2(_ICLM2DBase):
    """2nd-order IC-LM (oc_iclm.cpp:502-731)."""

    order = 2
