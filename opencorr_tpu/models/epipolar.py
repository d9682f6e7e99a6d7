"""Epipolar-constrained stereo matching (reference API: ``EpipolarSearch``,
oc_epipolar_search.h:30).

Reference: per POI, estimate parallax from a bilinear model
(oc_epipolar_search.cpp:136-137), project the view-1 point onto the epipolar
line in view 2 (:140-148), generate trial candidates stepping +-search_step up
to search_radius along the line (:157-180), refine each candidate with an
internal coarse ICGN2D1 (:182-188), keep the candidate with max ZNCC
(:190-194).  The reference runs a serial loop over POIs with an OpenMP-parallel
candidate loop inside (:197-205, "nested parallelism inversion").

TPU design (SURVEY.md §7.3): the candidate axis becomes an extra batch
dimension — the [N_poi x N_candidates] queue runs through the standard batched
IC-GN kernel in one shot, then a per-POI argmax over ZNCC picks the winner.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import poi as poi_mod
from ..ops import icgn as icgn_ops
from ..utils.precision import highest_precision
from . import base
from .calibration import Calibration
from .icgn import ICGN2D1
from .stereovision import fundamental_matrix


class EpipolarSearch(base.Module2D):
    def __init__(self, view1_cam: Calibration, view2_cam: Calibration,
                 chunk_size: Optional[int] = 16384):
        super().__init__(0, 0)
        self.view1_cam = view1_cam
        self.view2_cam = view2_cam
        self.search_radius = 0
        self.search_step = 0
        self.parallax_x = np.zeros(3, np.float32)
        self.parallax_y = np.zeros(3, np.float32)
        self.icgn1: Optional[ICGN2D1] = None
        self.fundamental_matrix = None
        self.chunk_size = chunk_size

    def set_search(self, search_radius: int, search_step: int):
        if search_radius < search_step:
            raise ValueError("Search radius is less than search step")
        self.search_radius = int(search_radius)
        self.search_step = int(search_step)

    def set_parallax(self, parallax_or_cx, cy=None):
        """Constant parallax (Point2D overload, oc_epipolar_search.cpp:73-84)
        or bilinear coefficient arrays (:86-95)."""
        if cy is None:
            px, py = parallax_or_cx
            self.parallax_x = np.array([0, 0, px], np.float32)
            self.parallax_y = np.array([0, 0, py], np.float32)
        else:
            self.parallax_x = np.asarray(parallax_or_cx, np.float32)
            self.parallax_y = np.asarray(cy, np.float32)

    def create_icgn(self, subset_radius_x: int, subset_radius_y: int,
                    conv_criterion: float, stop_condition: float):
        self.icgn1 = ICGN2D1(subset_radius_x, subset_radius_y, conv_criterion,
                             stop_condition)

    def update_cameras(self, view1_cam, view2_cam):
        self.view1_cam = view1_cam
        self.view2_cam = view2_cam

    def prepare(self):
        self.view1_cam.update_matrices()
        self.view2_cam.update_matrices()
        self.fundamental_matrix = fundamental_matrix(
            self.view1_cam, self.view2_cam)
        self.icgn1.set_images(self.ref_img, self.tar_img)
        self.icgn1.prepare()

    def compute(self, table: poi_mod.POITable2D) -> poi_mod.POITable2D:
        if self.icgn1 is None or self.fundamental_matrix is None:
            raise RuntimeError("call create_icgn() and prepare() first")
        h, w = self.ref_img.shape
        rx = self.icgn1.subset_radius_x
        ry = self.icgn1.subset_radius_y
        steps = list(range(self.search_step, self.search_radius,
                           self.search_step))
        n_cand = 1 + 2 * len(steps)
        offsets = np.zeros(n_cand, np.float32)
        # candidate order matches the reference loop: center, then (+i, -i)
        for j, i in enumerate(steps):
            offsets[1 + 2 * j] = i
            offsets[2 + 2 * j] = -i

        consts = (self.icgn1._gx, self.icgn1._gy, self.ref_img,
                  self.icgn1._lut) + self._memo.get(
            (np.asarray(self.fundamental_matrix).tobytes(),
             self.parallax_x.tobytes(),
             self.parallax_y.tobytes(), self.icgn1.conv_criterion,
             self.icgn1.stop_condition, self.search_radius, self.search_step),
            lambda: (jnp.asarray(self.fundamental_matrix),
                     jnp.asarray(self.parallax_x),
                     jnp.asarray(self.parallax_y),
                     jnp.float32(self.icgn1.conv_criterion),
                     jnp.float32(self.icgn1.stop_condition),
                     jnp.asarray(offsets)))

        def run(t, gx, gy, ref_img, lut, fmat, par_x, par_y, conv, max_iter,
                offs):
            p_best, r_best = _epipolar_compute(
                gx, gy, ref_img,
                lut, fmat, par_x, par_y, offs,
                t.x, t.y, t.p, conv, max_iter,
                rx=rx, ry=ry, half_w=w // 2, half_h=h // 2,
            )
            return t.replace(p=p_best, r=r_best)

        # the candidate axis multiplies the working-set size
        chunk = None if self.chunk_size is None else max(
            256, self.chunk_size // n_cand)
        return base.chunked(run, table, chunk, consts=consts)


@functools.partial(
    jax.jit, static_argnames=("rx", "ry", "half_w", "half_h"))
@highest_precision
def _epipolar_compute(gx, gy, ref_img, tar_lut, fmat, par_x, par_y, offsets,
                      xs, ys, p_in, conv, max_iter, *, rx, ry, half_w, half_h):
    f32 = jnp.float32
    n = xs.shape[0]
    c = offsets.shape[0]
    h, w = ref_img.shape

    u_in = p_in[:, 0]
    v_in = p_in[:, 6]
    # parallax estimate (oc_epipolar_search.cpp:136-137)
    px = par_x[0] * (xs - half_w) + par_x[1] * (ys - half_h) + par_x[2]
    py = par_y[0] * (xs - half_w) + par_y[1] * (ys - half_h) + par_y[2]

    # epipolar line of (x+u, y+v) in view 2 (:140-148)
    vx = xs + u_in
    vy = ys + v_in
    l0 = fmat[0, 0] * vx + fmat[0, 1] * vy + fmat[0, 2]
    l1 = fmat[1, 0] * vx + fmat[1, 1] * vy + fmat[1, 2]
    l2 = fmat[2, 0] * vx + fmat[2, 1] * vy + fmat[2, 2]
    slope = -l0 / l1
    intercept = -l2 / l1
    x_view2 = ((slope * (vy + py - intercept) + vx + px)
               / (slope * slope + 1.0)).astype(jnp.int32)
    y_view2 = (slope * x_view2.astype(f32) + intercept).astype(jnp.int32)

    # trial locations along the line (:157-180)
    x_trial = x_view2[:, None] + offsets[None, :].astype(jnp.int32)  # [N, C]
    y_trial = (slope[:, None] * x_trial.astype(f32)
               + intercept[:, None]).astype(jnp.int32)
    y_trial = jnp.where(offsets[None, :] == 0.0, y_view2[:, None], y_trial)
    cand_ok = (
        (x_trial - rx > 0) & (x_trial + rx < w - 1)
        & (y_trial - ry > 0) & (y_trial + ry < h - 1)
    )
    cand_ok = cand_ok.at[:, 0].set(True)  # center always tried (:151-155)

    u_c = x_trial.astype(f32) - xs[:, None]
    v_c = y_trial.astype(f32) - ys[:, None]

    # flatten [N, C] -> [N*C] and run the coarse IC-GN batch
    p_flat = jnp.zeros((n * c, 12), f32)
    p_flat = p_flat.at[:, 0].set(u_c.reshape(-1))
    p_flat = p_flat.at[:, 6].set(v_c.reshape(-1))
    xs_f = jnp.repeat(xs, c)
    ys_f = jnp.repeat(ys, c)
    zin = jnp.zeros((n * c,), f32)
    p_out, u0, v0, zncc, it, dpn, computed = icgn_ops.icgn2d(
        gx, gy, ref_img, tar_lut, xs_f, ys_f, p_flat, zin, conv, max_iter,
        None, order=1, rx=rx, ry=ry,
    )

    zncc_nc = zncc.reshape(n, c)
    sel_score = jnp.where(cand_ok, zncc_nc, f32(-jnp.inf))
    best = jnp.argmax(sel_score, axis=1)  # [N]

    take = jax.vmap(lambda arr, i: arr[i])
    p_nc = p_out.reshape(n, c, 12)
    p_best_rows = take(p_nc, best)  # [N, 12]
    # failed candidates keep a fresh POI's zeroed bookkeeping fields
    # (the reference's early returns never touch u0/iteration/convergence)
    comp_nc = computed.reshape(n, c)
    comp_best = take(comp_nc, best)
    r_best = jnp.stack(
        [
            jnp.where(comp_best, take(u0.reshape(n, c), best), 0.0),
            jnp.where(comp_best, take(v0.reshape(n, c), best), 0.0),
            take(zncc_nc, best),
            jnp.where(comp_best, take(it.reshape(n, c), best), 0.0),
            jnp.where(comp_best, take(dpn.reshape(n, c), best), 0.0),
            jnp.zeros(n, f32),  # feature: fresh candidate POIs carry 0
        ],
        axis=-1,
    )
    # poi->deformation = winner's full deformation vector (:193)
    return p_best_rows, r_best
