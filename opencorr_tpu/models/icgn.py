"""ICGN module wrappers (reference API: ``ICGN2D1``/``ICGN2D2``/``ICGN3D1``,
oc_icgn.h:45-188)."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..data import poi as poi_mod
from ..ops import bspline, gradient, icgn as icgn_ops
from . import base


@functools.partial(jax.jit, static_argnames=("order", "r_max"))
def _icgn2d_adaptive_full(gx, gy, ref_img, tar_lut, t, conv, max_iter,
                          *, order, r_max):
    p_out, u0, v0, zncc, it, dpn, computed = icgn_ops.icgn2d_adaptive(
        gx, gy, ref_img, tar_lut, t.x, t.y, t.sr[:, 0], t.sr[:, 1], t.p,
        t.r[:, poi_mod.R_ZNCC], conv, max_iter, order=order, r_max=r_max)
    r = t.r
    r = r.at[:, poi_mod.R_ZNCC].set(zncc)
    r = r.at[:, poi_mod.R_U0].set(jnp.where(computed, u0, r[:, poi_mod.R_U0]))
    r = r.at[:, poi_mod.R_V0].set(jnp.where(computed, v0, r[:, poi_mod.R_V0]))
    r = r.at[:, poi_mod.R_ITER].set(
        jnp.where(computed, it, r[:, poi_mod.R_ITER]))
    r = r.at[:, poi_mod.R_CONV].set(
        jnp.where(computed, dpn, r[:, poi_mod.R_CONV]))
    return t.replace(p=p_out, r=r)


@functools.partial(
    jax.jit,
    static_argnames=("rx", "ry", "rz", "window_margin", "eval_mode"))
def _icgn3d1_full(gx, gy, gz, ref_vol, coeff, t, conv, max_iter,
                  *, rx, ry, rz, window_margin=None, eval_mode="tile"):
    p_out, u0, v0, w0, zncc, it, dpn, computed = icgn_ops.icgn3d1(
        gx, gy, gz, ref_vol, coeff, t.x, t.y, t.z, t.p,
        t.r[:, poi_mod.R3_ZNCC], conv, max_iter, rx=rx, ry=ry, rz=rz,
        window_margin=window_margin, eval_mode=eval_mode)
    r = t.r
    r = r.at[:, poi_mod.R3_ZNCC].set(zncc)
    r = r.at[:, poi_mod.R3_U0].set(
        jnp.where(computed, u0, r[:, poi_mod.R3_U0]))
    r = r.at[:, poi_mod.R3_V0].set(
        jnp.where(computed, v0, r[:, poi_mod.R3_V0]))
    r = r.at[:, poi_mod.R3_W0].set(
        jnp.where(computed, w0, r[:, poi_mod.R3_W0]))
    r = r.at[:, poi_mod.R3_ITER].set(
        jnp.where(computed, it, r[:, poi_mod.R3_ITER]))
    r = r.at[:, poi_mod.R3_CONV].set(
        jnp.where(computed, dpn, r[:, poi_mod.R3_CONV]))
    sr = t.sr
    sr = sr.at[:, 0].set(jnp.where(computed, float(rx), sr[:, 0]))
    sr = sr.at[:, 1].set(jnp.where(computed, float(ry), sr[:, 1]))
    sr = sr.at[:, 2].set(jnp.where(computed, float(rz), sr[:, 2]))
    return t.replace(p=p_out, r=r, sr=sr)


@functools.partial(jax.jit, static_argnames=("order", "rx", "ry",
                                             "window_margin", "eval_mode"))
def _icgn2d_full(gx, gy, ref_img, tar_lut, tar_img, x, y, p, r, sr, conv,
                 max_iter, offs, *, order, rx, ry, window_margin=None,
                 eval_mode="lattice"):
    """Kernel + result-table merge in one program (a dozen separate eager
    updates would each pay a dispatch round-trip)."""
    p_out, u0, v0, zncc, it, dpn, computed = icgn_ops.icgn2d(
        gx, gy, ref_img, tar_lut, x, y, p, r[:, poi_mod.R_ZNCC], conv,
        max_iter, offs, tar_img, order=order, rx=rx, ry=ry,
        window_margin=window_margin, eval_mode=eval_mode,
    )
    r = r.at[:, poi_mod.R_ZNCC].set(zncc)
    r = r.at[:, poi_mod.R_U0].set(jnp.where(computed, u0, r[:, poi_mod.R_U0]))
    r = r.at[:, poi_mod.R_V0].set(jnp.where(computed, v0, r[:, poi_mod.R_V0]))
    r = r.at[:, poi_mod.R_ITER].set(
        jnp.where(computed, it, r[:, poi_mod.R_ITER]))
    r = r.at[:, poi_mod.R_CONV].set(
        jnp.where(computed, dpn, r[:, poi_mod.R_CONV]))
    sr = sr.at[:, 0].set(jnp.where(computed, float(rx), sr[:, 0]))
    sr = sr.at[:, 1].set(jnp.where(computed, float(ry), sr[:, 1]))
    return p_out, r, sr


class _ICGN2DBase(base.Module2D):
    order: int = 1

    def __init__(self, subset_radius_x: int, subset_radius_y: int,
                 conv_criterion: float = 0.001, stop_condition: float = 10,
                 chunk_size: Optional[int] = 65536,
                 window_margin: Optional[int] = 8,
                 eval_mode: str = "lattice"):
        """``window_margin``/``eval_mode``: default per-POI windowed
        lattice eval (gather-free; round-5 device profiling measured the
        global tile-LUT gather at ~0.55 s per GN iteration for the 30k
        r=16 flagship — the whole compute was ~5.7 s of real device time,
        ~10x SLOWER than the reference CPU; see ops/icgn.icgn2d).  None
        restores the global LUT path (bit-exact reference eval
        everywhere, no -3 on >margin-2 px GN drift)."""
        super().__init__(subset_radius_x, subset_radius_y)
        self.conv_criterion = float(conv_criterion)
        self.stop_condition = float(stop_condition)
        self.chunk_size = chunk_size
        self.window_margin = window_margin
        self.eval_mode = eval_mode
        self._gx = None
        self._gy = None
        self._lut = None

    def set_iteration(self, conv_criterion: float, stop_condition: float):
        self.conv_criterion = float(conv_criterion)
        self.stop_condition = float(stop_condition)

    def prepare_ref(self) -> None:
        """Gradient maps of the reference image (oc_icgn.cpp:115-125)."""
        self._gx = gradient.gradient_x_2d(self.ref_img)
        self._gy = gradient.gradient_y_2d(self.ref_img)

    def prepare_tar(self) -> None:
        """B-spline LUT of the target image (oc_icgn.cpp:127-136)."""
        self._lut = bspline.bicubic_prepare(self.tar_img)

    def prepare(self) -> None:
        self.prepare_ref()
        self.prepare_tar()

    def compute(self, table: poi_mod.POITable2D,
                center_offset: Optional[jnp.ndarray] = None
                ) -> poi_mod.POITable2D:
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
        # device buffers ride the consts channel: a run-closure must not
        # capture device arrays (base._assert_capture_free — closure capture
        # embeds them as program constants via a host readback)
        chunk = base.budget_chunk(self.chunk_size, rx, ry)
        consts = (self._gx, self._gy, self.ref_img, self._lut,
                  self.tar_img) + self._memo.get(
            (self.conv_criterion, self.stop_condition),
            lambda: (jnp.float32(self.conv_criterion),
                     jnp.float32(self.stop_condition)))

        def run(t, gx, gy, ref_img, lut, tar_img, conv, max_iter):
            p_out, r, sr = _icgn2d_full(
                gx, gy, ref_img, lut, tar_img,
                t.x, t.y, t.p, t.r, t.sr, conv, max_iter, None,
                order=order, rx=rx, ry=ry, window_margin=margin,
                eval_mode=mode,
            )
            return t.replace(p=p_out, r=r, sr=sr)

        def run_off(t, offs, gx, gy, ref_img, lut, tar_img, conv, max_iter):
            p_out, r, sr = _icgn2d_full(
                gx, gy, ref_img, lut, tar_img,
                t.x, t.y, t.p, t.r, t.sr, conv, max_iter, offs,
                order=order, rx=rx, ry=ry, window_margin=margin,
                eval_mode=mode,
            )
            return t.replace(p=p_out, r=r, sr=sr)

        if center_offset is not None:
            # center offsets ([N, 2]) are padded/sliced alongside the table
            return base.chunked(run_off, table, chunk,
                                jnp.asarray(center_offset), consts=consts)
        return base.chunked(run, table, chunk, consts=consts)

    def _compute_adaptive(self, table: poi_mod.POITable2D) -> poi_mod.POITable2D:
        """Self-adaptive mode: per-POI subset radii from ``table.sr``
        (oc_icgn.cpp:152-158); one masked kernel at the batch max radius."""
        import numpy as np

        sr = base.host_hint(table.sr)
        if sr is None:  # one readback per unseen queue (poisons the tunnel —
            sr = np.asarray(table.sr)  # FeatureAffine registers the hint)
            base.register_host_hint(table.sr, sr)
        r_max = int(max(np.max(sr), 1))
        order = self.order
        consts = (self._gx, self._gy, self.ref_img, self._lut) + self._memo.get(
            (self.conv_criterion, self.stop_condition),
            lambda: (jnp.float32(self.conv_criterion),
                     jnp.float32(self.stop_condition)))

        def run(t, gx, gy, ref_img, lut, conv, max_iter):
            return _icgn2d_adaptive_full(
                gx, gy, ref_img, lut, t, conv,
                max_iter, order=order, r_max=r_max)

        chunk = self.chunk_size
        if chunk is not None:
            # the masked grid costs r_max^2 per POI regardless of its radius
            chunk = max(1024, chunk // max(1, (2 * r_max + 1) ** 2 // 1089))
        return base.chunked(run, table, chunk, consts=consts)


class ICGN2D1(_ICGN2DBase):
    """1st-order IC-GN (oc_icgn.cpp:144-351)."""

    order = 1


class ICGN2D2(_ICGN2DBase):
    """2nd-order IC-GN (oc_icgn.cpp:685-908)."""

    order = 2


class ICGN3D1(base.Module3D):
    """3D IC-GN for DVC (oc_icgn.cpp:1270-1501)."""

    def __init__(self, subset_radius_x: int, subset_radius_y: int,
                 subset_radius_z: int, conv_criterion: float = 0.001,
                 stop_condition: float = 10,
                 chunk_size: Optional[int] = None,
                 window_margin: Optional[int] = 8,
                 eval_mode: str = "lattice"):
        """``chunk_size=None`` sizes POI chunks from a memory budget so the
        per-chunk working set stays bounded for any subset radius.

        ``window_margin`` (default 8) selects the windowed-coefficient
        kernel: target samples interpolate through per-POI coefficient
        windows of half-extent r+margin (ops/icgn.icgn3d1
        ``window_margin``) — the CT-scale fix for the global-volume gather
        (PERF.md).  ``None`` selects the global-volume path
        (bit-compatible semantics except that windowed fails diverging
        POIs with -3 once they wander > margin-2 voxels past their seed).

        ``eval_mode`` (windowed only): "lattice" (default) evaluates
        through the gather-free Pallas lattice kernel
        (ops/pallas_lattice.py) — same 64 tap products as the reference,
        f32 summation reordered (~1e-6 voxel); high-strain chunks fall
        back in-program to the exact path.  "tile" uses the per-chunk
        64-wide tile LUT gather, bit-identical to the global path but
        ~4x slower per iteration and 64x the window memory."""
        super().__init__(subset_radius_x, subset_radius_y, subset_radius_z)
        self.conv_criterion = float(conv_criterion)
        self.stop_condition = float(stop_condition)
        self.chunk_size = chunk_size
        self.window_margin = window_margin
        self.eval_mode = eval_mode
        self._gx = None
        self._gy = None
        self._gz = None
        self._coeff = None

    def set_iteration(self, conv_criterion: float, stop_condition: float):
        self.conv_criterion = float(conv_criterion)
        self.stop_condition = float(stop_condition)

    def prepare_ref(self) -> None:
        """Gradient volumes (oc_icgn.cpp:1240-1251)."""
        self._gx = gradient.gradient_x_3d(self.ref_vol)
        self._gy = gradient.gradient_y_3d(self.ref_vol)
        self._gz = gradient.gradient_z_3d(self.ref_vol)

    def prepare_tar(self) -> None:
        """Tricubic prefiltered coefficient volume (oc_icgn.cpp:1253-1262)."""
        self._coeff = bspline.tricubic_prepare(self.tar_vol)

    def prepare(self) -> None:
        self.prepare_ref()
        self.prepare_tar()

    def compute(self, table: poi_mod.POITable3D) -> poi_mod.POITable3D:
        if self._coeff is None:
            raise RuntimeError("call prepare() before compute()")
        rx, ry, rz = (self.subset_radius_x, self.subset_radius_y,
                      self.subset_radius_z)
        margin = self.window_margin
        mode = self.eval_mode
        if margin is not None:
            # The windowed kernels dynamic-slice (2(r+margin)+1)^3 windows;
            # a volume dim smaller than the window fails at trace time (and
            # clip bounds invert).  Such small volumes are cheap — use the
            # global eval, the old default for them (advisor round 4).
            dz, dy, dx = self.ref_vol.shape
            if min(dx - 2 * rx, dy - 2 * ry, dz - 2 * rz) - 1 < 2 * margin:
                margin = None
        chunk = self.chunk_size
        if chunk is None:
            s = (2 * rx + 1) * (2 * ry + 1) * (2 * rz + 1)
            if margin is not None and mode == "lattice":
                # no tile LUT: the working set is the coefficient windows
                # plus ~16 sample-sized f32 arrays.  Budgets are the
                # round-4/5 empirically-proven compile envelope: r=16
                # chunks of 500 (18M poi*voxels) compile and run; 1000
                # wedges the remote compiler (round-5 retest: >500 s,
                # killed), as does r=30 at 39 POIs (8.9M) — while 32
                # (7.3M, full al_foam queue 25.2 s) compiles in ~20 s.
                # Large subsets therefore get the tighter budget.
                budget = 18_000_000 if s <= 50_000 else 7_300_000
                chunk = max(8, budget // s)
            elif margin is not None:
                # tile-LUT budget: each POI's window LUT is
                # (2(r+margin)-2)^3 * 256 bytes; ~2 GB of LUT per chunk
                # (HBM also holds the 5 volumes), additionally capped by the
                # 9M poi*voxel compile budget below
                per_poi = ((2 * (rx + margin) - 2) * (2 * (ry + margin) - 2)
                           * (2 * (rz + margin) - 2)) * 256
                chunk = max(8, min(2_000_000_000 // per_poi,
                                   9_000_000 // s))
            else:
                # poi*voxel working-set budget: ~9M keeps the compile within
                # HBM for any radius while amortizing dispatch overhead
                chunk = max(8, 9_000_000 // s)
        consts = (self._gx, self._gy, self._gz, self.ref_vol,
                  self._coeff) + self._memo.get(
            (self.conv_criterion, self.stop_condition),
            lambda: (jnp.float32(self.conv_criterion),
                     jnp.float32(self.stop_condition)))

        def run(t, gx, gy, gz, ref_vol, coeff, conv, max_iter):
            return _icgn3d1_full(gx, gy, gz, ref_vol,
                                 coeff, t, conv, max_iter,
                                 rx=rx, ry=ry, rz=rz, window_margin=margin,
                                 eval_mode=mode)

        return base.chunked(run, table, chunk, consts=consts)
