"""Camera calibration: pinhole + rational radial / tangential distortion.

Reference: ``oc_calibration.h/.cpp`` — intrinsics fx, fy, fs, cx, cy with
rational radial distortion k1..k6 and tangential p1, p2 (oc_calibration.h:25-35);
extrinsics as translation + axis-angle rotation vector (:37-45, Rodrigues via
Eigen::AngleAxisf, oc_calibration.cpp:50-60); projection matrix P = K[R|t]
(:69-77); forward ``distort`` (:136-159); per-pixel fixed-point iteration
inverting the distortion to build an undistortion map (conv 0.001, <=40 iters,
:161-219); bilinear map lookup + image_to_sensor in ``undistort`` (:221-264).

TPU design: the per-pixel undistortion loop becomes one whole-image
fixed-iteration ``lax.fori_loop`` with convergence masks; ``undistort`` is
batched over point arrays.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.precision import highest_precision


@dataclasses.dataclass
class CameraIntrinsics:
    """oc_calibration.h:25-35."""

    fx: float = 0.0
    fy: float = 0.0
    fs: float = 0.0
    cx: float = 0.0
    cy: float = 0.0
    k1: float = 0.0
    k2: float = 0.0
    k3: float = 0.0
    k4: float = 0.0
    k5: float = 0.0
    k6: float = 0.0
    p1: float = 0.0
    p2: float = 0.0


@dataclasses.dataclass
class CameraExtrinsics:
    """oc_calibration.h:37-45."""

    tx: float = 0.0
    ty: float = 0.0
    tz: float = 0.0
    rx: float = 0.0
    ry: float = 0.0
    rz: float = 0.0


def rodrigues(rx: float, ry: float, rz: float) -> np.ndarray:
    """Axis-angle -> rotation matrix (oc_calibration.cpp:50-60); the zero
    vector maps to identity (the theta -> 0 limit)."""
    v = np.array([rx, ry, rz], np.float64)
    theta = np.linalg.norm(v)
    if theta < 1e-12:
        return np.eye(3, dtype=np.float32)
    k = v / theta
    kx = np.array(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]], np.float64
    )
    r = np.eye(3) + np.sin(theta) * kx + (1 - np.cos(theta)) * (kx @ kx)
    return r.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("height", "width", "iteration"))
@highest_precision
def _build_undistortion_maps(intr: jnp.ndarray, convergence: jnp.ndarray,
                             *, height: int, width: int, iteration: int):
    """Vectorized fixed-point inversion of the distortion model
    (oc_calibration.cpp:161-219). Returns (map_x, map_y) of undistorted image
    coordinates per integer sensor pixel."""
    fx, fy, fs, cx, cy = intr[0], intr[1], intr[2], intr[3], intr[4]
    k1, k2, k3, k4, k5, k6, p1, p2 = (intr[i] for i in range(5, 13))

    cgrid, rgrid = jnp.meshgrid(
        jnp.arange(width, dtype=jnp.float32),
        jnp.arange(height, dtype=jnp.float32),
        indexing="xy",
    )

    def sensor_to_image(sx, sy):
        iy = (sy - cy) / fy
        ix = (sx - cx - fs * iy) / fx
        return ix, iy

    def image_to_sensor(ix, iy):
        sy = iy * fy + cy
        sx = ix * fx + iy * fs + cx
        return sx, sy

    def distort(ix, iy):
        xx = ix * ix
        yy = iy * iy
        xy = ix * iy
        r2 = xx + yy
        r4 = r2 * r2
        r6 = r2 * r4
        radial = (1 + k1 * r2 + k2 * r4 + k3 * r6) / (1 + k4 * r2 + k5 * r4 + k6 * r6)
        dy = iy * radial + p1 * (r2 + 2 * yy) + 2 * p2 * xy
        dx = ix * radial + 2 * p1 * xy + p2 * (r2 + 2 * xx)
        return dx, dy

    x0, y0 = sensor_to_image(cgrid, rgrid)

    def body(_, state):
        ix, iy, done = state
        dx_i, dy_i = distort(ix, iy)
        sx, sy = image_to_sensor(dx_i, dy_i)
        dev_x = cgrid - sx
        dev_y = rgrid - sy
        isinf = jnp.isinf(dev_x) | jnp.isinf(dev_y)
        converged = (jnp.abs(dev_x) <= convergence) & (jnp.abs(dev_y) <= convergence)
        step_y = dev_y / fy
        ny = iy + step_y
        nx = ix + (dev_x - step_y * fs) / fx
        # diverged pixels revert to the initial guess and stop (cpp:198-203)
        nx = jnp.where(isinf, x0, nx)
        ny = jnp.where(isinf, y0, ny)
        upd = ~done & ~converged
        ix = jnp.where(upd, nx, ix)
        iy = jnp.where(upd, ny, iy)
        done = done | converged | isinf
        return ix, iy, done

    ix, iy, _ = jax.lax.fori_loop(
        0, iteration, body, (x0, y0, jnp.zeros_like(x0, jnp.bool_))
    )
    return ix, iy


@jax.jit
@highest_precision
def _undistort_points(map_x, map_y, intr, xs, ys):
    """Batched ``undistort`` (oc_calibration.cpp:221-264): clamp, bilinear map
    lookup, then image_to_sensor."""
    h, w = map_x.shape
    x = jnp.clip(xs, 0.0, w - 2.0)
    y = jnp.clip(ys, 0.0, h - 2.0)
    xi = jnp.floor(x).astype(jnp.int32)
    yi = jnp.floor(y).astype(jnp.int32)
    xd = x - xi
    yd = y - yi

    def bil(m):
        return (
            m[yi, xi] * (1 - yd) * (1 - xd)
            + m[yi + 1, xi] * yd * (1 - xd)
            + m[yi, xi + 1] * (1 - yd) * xd
            + m[yi + 1, xi + 1] * yd * xd
        )

    ix = bil(map_x)
    iy = bil(map_y)
    fx, fy, fs, cx, cy = intr[0], intr[1], intr[2], intr[3], intr[4]
    sy = iy * fy + cy
    sx = ix * fx + iy * fs + cx
    return sx, sy


class Calibration:
    """Reference API (oc_calibration.h:47-96)."""

    def __init__(self, intrinsics: CameraIntrinsics = None,
                 extrinsics: CameraExtrinsics = None):
        self.intrinsics = intrinsics or CameraIntrinsics()
        self.extrinsics = extrinsics or CameraExtrinsics()
        self.convergence = 0.001  # oc_calibration.cpp:23
        self.iteration = 40  # :24
        self.map_x = None
        self.map_y = None
        # Bumped whenever derived state (matrices / undistortion maps) is
        # rebuilt; consumers that memoize device copies (Stereovision) compare
        # it to invalidate their caches.
        self.version = 0
        self.update_matrices()

    # -- matrices -----------------------------------------------------------
    def update_matrices(self):
        self.version += 1
        i = self.intrinsics
        self.intrinsic_matrix = np.array(
            [[i.fx, i.fs, i.cx], [0, i.fy, i.cy], [0, 0, 1]], np.float32
        )
        self.rotation_matrix = rodrigues(
            self.extrinsics.rx, self.extrinsics.ry, self.extrinsics.rz
        )
        self.translation_vector = np.array(
            [self.extrinsics.tx, self.extrinsics.ty, self.extrinsics.tz],
            np.float32,
        )
        rt = np.concatenate(
            [self.rotation_matrix, self.translation_vector[:, None]], axis=1
        )
        self.projection_matrix = self.intrinsic_matrix @ rt

    def update_calibration(self, intrinsics, extrinsics):
        self.intrinsics = intrinsics
        self.extrinsics = extrinsics
        self.update_matrices()

    def set_undistortion(self, convergence: float, iteration: int):
        self.convergence = float(convergence)
        self.iteration = int(iteration)

    def _intr_vec(self) -> jnp.ndarray:
        i = self.intrinsics
        return jnp.array(
            [i.fx, i.fy, i.fs, i.cx, i.cy, i.k1, i.k2, i.k3, i.k4, i.k5,
             i.k6, i.p1, i.p2], jnp.float32)

    # -- undistortion -------------------------------------------------------
    def prepare(self, height: int, width: int):
        self.version += 1
        self.map_x, self.map_y = _build_undistortion_maps(
            self._intr_vec(), jnp.float32(self.convergence),
            height=int(height), width=int(width), iteration=self.iteration,
        )

    def undistort(self, xs, ys):
        """Batched: sensor coords -> undistorted sensor coords."""
        if self.map_x is None:
            raise RuntimeError("call prepare(height, width) first")
        return _undistort_points(
            self.map_x, self.map_y, self._intr_vec(),
            jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32),
        )

    def image_to_sensor(self, xs, ys):
        i = self.intrinsics
        sy = ys * i.fy + i.cy
        sx = xs * i.fx + ys * i.fs + i.cx
        return sx, sy

    def sensor_to_image(self, xs, ys):
        i = self.intrinsics
        iy = (ys - i.cy) / i.fy
        ix = (xs - i.cx - i.fs * iy) / i.fx
        return ix, iy
