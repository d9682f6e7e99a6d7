"""POI (point-of-interest) tables as dense struct-of-arrays pytrees.

The reference (OpenCorr) models each POI as a heap object carrying a deformation
vector, a result vector, a strain vector and a subset radius
(``oc_poi.h:102-136``), processed one-at-a-time inside OpenMP loops.  On TPU the
POI set is instead a dense batch: every field is an ``[N, ...]`` array and every
algorithm is a pure function ``POITable -> POITable`` that can be jitted,
vmapped and sharded along the leading axis.

Field layouts follow the reference unions exactly so OpenCorr CSV files can be
read/written unmodified:

* 2D deformation ``p``: u ux uy uxx uxy uyy v vx vy vxx vxy vyy (``oc_poi.h:32``)
* 2D result ``r``: u0 v0 zncc iteration convergence feature (``oc_poi.h:50``)
* 2D strain ``e``: exx eyy exy (``oc_poi.h:41``)
* 3D deformation ``p``: u ux uy uz v vx vy vz w wx wy wz (``oc_poi.h:70``)
* 3D result ``r``: u0 v0 w0 zncc iteration convergence feature (``oc_poi.h:98``)
* 3D strain ``e``: exx eyy ezz exy eyz ezx (``oc_poi.h:89``)
* stereo (2DS) result ``r``: r1r2_zncc r1t1_zncc r1t2_zncc r2_x r2_y t1_x t1_y
  t2_x t2_y (``oc_poi.h:57``)

Negative ZNCC encodes the reference failure taxonomy (``oc_dic.h:28-34``):
0 reset, -1 insufficient features, -2 RANSAC inconsistent, -3 out-of-bounds /
aborted, -4 not converged, -5 NaN.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.hosthints import register_host_hint

# Indices into the 2D deformation vector p[12].
U, UX, UY, UXX, UXY, UYY, V, VX, VY, VXX, VXY, VYY = range(12)
# Indices into the 2D result vector r[6].
R_U0, R_V0, R_ZNCC, R_ITER, R_CONV, R_FEAT = range(6)
# Indices into the 3D deformation vector p[12].
U3, UX3, UY3, UZ3, V3, VX3, VY3, VZ3, W3, WX3, WY3, WZ3 = range(12)
# Indices into the 3D result vector r[7].
R3_U0, R3_V0, R3_W0, R3_ZNCC, R3_ITER, R3_CONV, R3_FEAT = range(7)


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_pytree_node(
        cls,
        lambda obj: (tuple(getattr(obj, n) for n in fields), None),
        lambda aux, children: cls(*children),
    )
    return cls


@_register
@dataclasses.dataclass
class POITable2D:
    """Dense batch of 2D DIC POIs (mirrors ``POI2D``, oc_poi.h:102)."""

    x: jnp.ndarray  # [N] f32
    y: jnp.ndarray  # [N] f32
    p: jnp.ndarray  # [N, 12] f32 deformation
    r: jnp.ndarray  # [N, 6] f32 result
    e: jnp.ndarray  # [N, 3] f32 strain
    sr: jnp.ndarray  # [N, 2] f32 subset radius (x, y)

    @property
    def n(self) -> int:
        return self.x.shape[0]

    @property
    def u(self) -> jnp.ndarray:
        return self.p[:, U]

    @property
    def v(self) -> jnp.ndarray:
        return self.p[:, V]

    @property
    def zncc(self) -> jnp.ndarray:
        return self.r[:, R_ZNCC]

    def replace(self, **kw) -> "POITable2D":
        return dataclasses.replace(self, **kw)


@_register
@dataclasses.dataclass
class POITable3D:
    """Dense batch of DVC POIs (mirrors ``POI3D``, oc_poi.h:187)."""

    x: jnp.ndarray  # [N] f32
    y: jnp.ndarray  # [N] f32
    z: jnp.ndarray  # [N] f32
    p: jnp.ndarray  # [N, 12] f32 deformation
    r: jnp.ndarray  # [N, 7] f32 result
    e: jnp.ndarray  # [N, 6] f32 strain
    sr: jnp.ndarray  # [N, 3] f32 subset radius (x, y, z)

    @property
    def n(self) -> int:
        return self.x.shape[0]

    @property
    def u(self) -> jnp.ndarray:
        return self.p[:, U3]

    @property
    def v(self) -> jnp.ndarray:
        return self.p[:, V3]

    @property
    def w(self) -> jnp.ndarray:
        return self.p[:, W3]

    @property
    def zncc(self) -> jnp.ndarray:
        return self.r[:, R3_ZNCC]

    def replace(self, **kw) -> "POITable3D":
        return dataclasses.replace(self, **kw)


@_register
@dataclasses.dataclass
class POITable2DS:
    """Dense batch of stereo DIC POIs (mirrors ``POI2DS``, oc_poi.h:140)."""

    x: jnp.ndarray  # [N] f32
    y: jnp.ndarray  # [N] f32
    p: jnp.ndarray  # [N, 3] f32 displacement (u, v, w)
    r: jnp.ndarray  # [N, 9] f32 result (3 znccs + 2D coords in 3 views)
    ref_coor: jnp.ndarray  # [N, 3] f32
    tar_coor: jnp.ndarray  # [N, 3] f32
    e: jnp.ndarray  # [N, 6] f32 strain
    sr: jnp.ndarray  # [N, 2] f32 subset radius

    @property
    def n(self) -> int:
        return self.x.shape[0]

    def replace(self, **kw) -> "POITable2DS":
        return dataclasses.replace(self, **kw)


def _dev_coord(a):
    """Host coords -> committed f32 device buffer, with its host value
    registered so downstream neighbor precomputes never read it back
    (utils/hosthints)."""
    host = None
    if isinstance(a, (np.ndarray, list, tuple)) or np.isscalar(a):
        host = np.asarray(a, np.float32).reshape(-1)
    d = jnp.asarray(a, jnp.float32).reshape(-1)
    if host is not None:
        register_host_hint(d, host)
    return d


def new_table_2d(x, y) -> POITable2D:
    """Fresh POI table with all data zeroed (``POI2D::clear``, oc_poi.h:128)."""
    x = _dev_coord(x)
    y = _dev_coord(y)
    n = x.shape[0]
    return POITable2D(
        x=x,
        y=y,
        p=jnp.zeros((n, 12), jnp.float32),
        r=jnp.zeros((n, 6), jnp.float32),
        e=jnp.zeros((n, 3), jnp.float32),
        sr=jnp.zeros((n, 2), jnp.float32),
    )


def new_table_3d(x, y, z) -> POITable3D:
    x = _dev_coord(x)
    y = _dev_coord(y)
    z = _dev_coord(z)
    n = x.shape[0]
    return POITable3D(
        x=x,
        y=y,
        z=z,
        p=jnp.zeros((n, 12), jnp.float32),
        r=jnp.zeros((n, 7), jnp.float32),
        e=jnp.zeros((n, 6), jnp.float32),
        sr=jnp.zeros((n, 3), jnp.float32),
    )


def new_table_2ds(x, y) -> POITable2DS:
    x = _dev_coord(x)
    y = _dev_coord(y)
    n = x.shape[0]
    return POITable2DS(
        x=x,
        y=y,
        p=jnp.zeros((n, 3), jnp.float32),
        r=jnp.zeros((n, 9), jnp.float32),
        ref_coor=jnp.zeros((n, 3), jnp.float32),
        tar_coor=jnp.zeros((n, 3), jnp.float32),
        e=jnp.zeros((n, 6), jnp.float32),
        sr=jnp.zeros((n, 2), jnp.float32),
    )


def poi_grid_2d(upper_left: Tuple[float, float], number_x: int, number_y: int,
                grid_space: int) -> POITable2D:
    """POI grid in the reference example layout: x varies fastest
    (``examples/test_2d_dic_fftcc_icgn1.cpp:57-66``)."""
    x0, y0 = upper_left
    jj, ii = np.meshgrid(np.arange(number_x), np.arange(number_y))
    xs = (x0 + jj * grid_space).astype(np.float32).reshape(-1)
    ys = (y0 + ii * grid_space).astype(np.float32).reshape(-1)
    return new_table_2d(xs, ys)


def poi_grid_3d(origin: Tuple[float, float, float], number_x: int,
                number_y: int, number_z: int, grid_space: int) -> POITable3D:
    """POI grid for DVC: x fastest, then y, then z."""
    x0, y0, z0 = origin
    kk, ii, jj = np.meshgrid(np.arange(number_z), np.arange(number_y),
                             np.arange(number_x), indexing="ij")
    xs = (x0 + jj * grid_space).astype(np.float32).reshape(-1)
    ys = (y0 + ii * grid_space).astype(np.float32).reshape(-1)
    zs = (z0 + kk * grid_space).astype(np.float32).reshape(-1)
    return new_table_3d(xs, ys, zs)
