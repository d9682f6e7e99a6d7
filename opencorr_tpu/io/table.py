"""OpenCorr-compatible CSV / binary I/O.

Schemas mirror ``oc_io.cpp`` exactly so the reference's shipped golden files and
datasets load unmodified:

* 2D result table (``saveTable2D``, oc_io.cpp:318-373): header
  x,y,u,v,u0,v0,ZNCC,iteration,convergence,feature,exx,eyy,exy,subset_rx,subset_ry
  with fixed 8-decimal precision and a trailing delimiter per row.
* 2D deformation table (``saveDeformationTable2D``, oc_io.cpp:375-421):
  x,y,u,ux,uy,uxx,uxy,uyy,v,vx,vy,vxx,vxy,vyy,subset_rx,subset_ry.
* value maps (``saveMap2D``, oc_io.cpp:423-504): an image-sized grid with one
  selected variable rasterized at each POI position.
* 3D result table (``saveTable3D``, oc_io.cpp:1004-1089): x,y,z,u,v,w,u0,v0,w0,
  ZNCC,iteration,convergence,exx,eyy,ezz,exy,eyz,ezx + subset radii.
* binary matrix checkpoint (``saveMatrixBin``/``loadMatrixBin``,
  oc_io.cpp:1202-1290): int32[4] header {data_length, dimx, dimy, dimz} then
  float32 per-POI records (x,y,z,u,v,w,zncc,convergence).

All writers format with C++ ``std::fixed`` 8-decimal precision.
"""

from __future__ import annotations

import io
from typing import Iterable, Sequence

import numpy as np

from . import native
from ..data import poi as poi_mod

_F = "%.8f"


def _fmt_row(vals: Iterable[float], delim: str) -> str:
    return delim.join(_F % v for v in vals) + delim


def save_table_2d(path: str, table: poi_mod.POITable2D, delimiter: str = ",") -> None:
    cols = [
        "x", "y", "u", "v", "u0", "v0", "ZNCC", "iteration", "convergence",
        "feature", "exx", "eyy", "exy", "subset_rx", "subset_ry",
    ]
    x = np.asarray(table.x)
    y = np.asarray(table.y)
    p = np.asarray(table.p)
    r = np.asarray(table.r)
    e = np.asarray(table.e)
    sr = np.asarray(table.sr)
    data = np.column_stack(
        [x, y, p[:, poi_mod.U], p[:, poi_mod.V], r, e, sr]
    )
    _write_csv(path, cols, data, delimiter)


def load_table_2d(path: str, delimiter: str = ",") -> poi_mod.POITable2D:
    """Parse a result table (``loadTable2D``, oc_io.cpp:249-316). Tolerates the
    older 13-column golden files without subset radii."""
    raw = _read_csv(path, delimiter)
    n = raw.shape[0]
    t = poi_mod.new_table_2d(raw[:, 0], raw[:, 1])
    import jax.numpy as jnp

    p = np.zeros((n, 12), np.float32)
    p[:, poi_mod.U] = raw[:, 2]
    p[:, poi_mod.V] = raw[:, 3]
    r = np.zeros((n, 6), np.float32)
    r[:, : min(6, raw.shape[1] - 4)] = raw[:, 4 : 4 + min(6, raw.shape[1] - 4)]
    e = np.zeros((n, 3), np.float32)
    if raw.shape[1] >= 13:
        e[:] = raw[:, 10:13]
    sr = np.zeros((n, 2), np.float32)
    if raw.shape[1] >= 15:
        sr[:] = raw[:, 13:15]
    return t.replace(p=jnp.asarray(p), r=jnp.asarray(r), e=jnp.asarray(e),
                     sr=jnp.asarray(sr))


def save_deformation_table_2d(path: str, table: poi_mod.POITable2D,
                              delimiter: str = ",") -> None:
    cols = ["x", "y", "u", "ux", "uy", "uxx", "uxy", "uyy", "v", "vx", "vy",
            "vxx", "vxy", "vyy", "subset_rx", "subset_ry"]
    data = np.column_stack(
        [np.asarray(table.x), np.asarray(table.y), np.asarray(table.p),
         np.asarray(table.sr)]
    )
    _write_csv(path, cols, data, delimiter)


# OutputVariable enum (oc_io.h:25-51)
_MAP_VARS_2D = {
    "u": lambda t: np.asarray(t.p)[:, poi_mod.U],
    "v": lambda t: np.asarray(t.p)[:, poi_mod.V],
    "zncc": lambda t: np.asarray(t.r)[:, poi_mod.R_ZNCC],
    "u0": lambda t: np.asarray(t.r)[:, poi_mod.R_U0],
    "v0": lambda t: np.asarray(t.r)[:, poi_mod.R_V0],
    "iteration": lambda t: np.asarray(t.r)[:, poi_mod.R_ITER],
    "deformation_increment": lambda t: np.asarray(t.r)[:, poi_mod.R_CONV],
    "convergence": lambda t: np.asarray(t.r)[:, poi_mod.R_CONV],
    "feature": lambda t: np.asarray(t.r)[:, poi_mod.R_FEAT],
    "exx": lambda t: np.asarray(t.e)[:, 0],
    "eyy": lambda t: np.asarray(t.e)[:, 1],
    "exy": lambda t: np.asarray(t.e)[:, 2],
}


def save_map_2d(path: str, table: poi_mod.POITable2D, variable: str,
                height: int, width: int, delimiter: str = ",") -> None:
    """Rasterize one variable onto an image-sized grid (oc_io.cpp:423-504)."""
    vals = _MAP_VARS_2D[variable](table)
    out = np.zeros((height, width), np.float32)
    xs = np.asarray(table.x).astype(np.int32)
    ys = np.asarray(table.y).astype(np.int32)
    out[ys, xs] = vals
    with open(path, "w") as f:
        for row in out:
            f.write(_fmt_row(row, delimiter) + "\n")


def save_table_2ds(path: str, table: poi_mod.POITable2DS,
                   delimiter: str = ",") -> None:
    """Stereo result table (``saveTable2DS``, oc_io.cpp:588-669); column
    layout per the shipped golden GT4-0273_0_epipolar_sift_r16.csv."""
    cols = ["x", "y", "u", "v", "w", "r1r2 ZNCC", "r1t1 ZNCC", "r1t2 ZNCC",
            "r2_x", "r2_y", "t1_x", "t1_y", "t2_x", "t2_y",
            "ref_x", "ref_y", "ref_z", "tar_x", "tar_y", "tar_z",
            "exx", "eyy", "ezz", "exy", "eyz", "ezx"]
    data = np.column_stack(
        [np.asarray(table.x), np.asarray(table.y), np.asarray(table.p),
         np.asarray(table.r), np.asarray(table.ref_coor),
         np.asarray(table.tar_coor), np.asarray(table.e)]
    )
    _write_csv(path, cols, data, delimiter)


def load_table_2ds(path: str, delimiter: str = ",") -> poi_mod.POITable2DS:
    """``loadTable2DS`` (oc_io.cpp:506-586)."""
    raw = _read_csv(path, delimiter)
    import jax.numpy as jnp

    t = poi_mod.new_table_2ds(raw[:, 0], raw[:, 1])
    p = raw[:, 2:5]
    r = np.zeros((raw.shape[0], 9), np.float32)
    r[:, 0:3] = raw[:, 5:8]
    r[:, 3:9] = raw[:, 8:14]
    ref_coor = raw[:, 14:17]
    tar_coor = raw[:, 17:20]
    e = np.zeros((raw.shape[0], 6), np.float32)
    if raw.shape[1] >= 26:
        e[:] = raw[:, 20:26]
    return t.replace(p=jnp.asarray(p), r=jnp.asarray(r),
                     ref_coor=jnp.asarray(ref_coor),
                     tar_coor=jnp.asarray(tar_coor), e=jnp.asarray(e))


def save_table_3d(path: str, table: poi_mod.POITable3D, delimiter: str = ",") -> None:
    """DVC result table (oc_io.cpp:1004-1089)."""
    cols = ["x", "y", "z", "u", "v", "w", "u0", "v0", "w0", "ZNCC",
            "iteration", "convergence", "exx", "eyy", "ezz", "exy", "eyz",
            "ezx", "subset_rx", "subset_ry", "subset_rz"]
    p = np.asarray(table.p)
    r = np.asarray(table.r)
    data = np.column_stack(
        [np.asarray(table.x), np.asarray(table.y), np.asarray(table.z),
         p[:, poi_mod.U3], p[:, poi_mod.V3], p[:, poi_mod.W3],
         r[:, :3], r[:, 3:6], np.asarray(table.e), np.asarray(table.sr)]
    )
    _write_csv(path, cols, data, delimiter)


def load_table_3d(path: str, delimiter: str = ",") -> poi_mod.POITable3D:
    raw = _read_csv(path, delimiter)
    import jax.numpy as jnp

    n = raw.shape[0]
    t = poi_mod.new_table_3d(raw[:, 0], raw[:, 1], raw[:, 2])
    p = np.zeros((n, 12), np.float32)
    p[:, poi_mod.U3] = raw[:, 3]
    p[:, poi_mod.V3] = raw[:, 4]
    p[:, poi_mod.W3] = raw[:, 5]
    r = np.zeros((n, 7), np.float32)
    ncols = raw.shape[1]
    r[:, :3] = raw[:, 6:9]
    if ncols > 9:
        r[:, 3] = raw[:, 9]
    if ncols > 11:
        r[:, 4:6] = raw[:, 10:12]
    e = np.zeros((n, 6), np.float32)
    if ncols >= 18:
        e[:] = raw[:, 12:18]
    return t.replace(p=jnp.asarray(p), r=jnp.asarray(r), e=jnp.asarray(e))


def load_points_2d(path: str, delimiter: str = ",") -> np.ndarray:
    """``loadPoint2D`` (oc_io.cpp:66-118): no header, x,y per line."""
    return np.atleast_2d(
        np.genfromtxt(path, delimiter=delimiter, dtype=np.float32)
    )


def save_points_2d(path: str, points: np.ndarray, delimiter: str = ",") -> None:
    """``savePoint2D`` (oc_io.cpp:120-140)."""
    with open(path, "w") as f:
        for p in np.asarray(points):
            f.write(_fmt_row(p[:2], delimiter) + "\n")


def load_points_3d(path: str, delimiter: str = ",") -> np.ndarray:
    """``loadPoint3D`` (oc_io.cpp:828+): no header, x,y,z per line."""
    return np.atleast_2d(
        np.genfromtxt(path, delimiter=delimiter, dtype=np.float32)
    )


_MAP_VARS_2DS = {
    "u": lambda t: np.asarray(t.p)[:, 0],
    "v": lambda t: np.asarray(t.p)[:, 1],
    "w": lambda t: np.asarray(t.p)[:, 2],
    "zncc_r1r2": lambda t: np.asarray(t.r)[:, 0],
    "zncc_r1t1": lambda t: np.asarray(t.r)[:, 1],
    "zncc_r1t2": lambda t: np.asarray(t.r)[:, 2],
    "exx": lambda t: np.asarray(t.e)[:, 0],
    "eyy": lambda t: np.asarray(t.e)[:, 1],
    "ezz": lambda t: np.asarray(t.e)[:, 2],
    "exy": lambda t: np.asarray(t.e)[:, 3],
    "eyz": lambda t: np.asarray(t.e)[:, 4],
    "ezx": lambda t: np.asarray(t.e)[:, 5],
}


def save_map_2ds(path: str, table: poi_mod.POITable2DS, variable: str,
                 height: int, width: int, delimiter: str = ",") -> None:
    """Stereo value map (``saveMap2DS``, oc_io.cpp:671-826)."""
    vals = _MAP_VARS_2DS[variable](table)
    out = np.zeros((height, width), np.float32)
    xs = np.asarray(table.x).astype(np.int32)
    ys = np.asarray(table.y).astype(np.int32)
    out[ys, xs] = vals
    with open(path, "w") as f:
        for row in out:
            f.write(_fmt_row(row, delimiter) + "\n")


_MAP_VARS_3D = {
    "u": lambda t: np.asarray(t.p)[:, poi_mod.U3],
    "v": lambda t: np.asarray(t.p)[:, poi_mod.V3],
    "w": lambda t: np.asarray(t.p)[:, poi_mod.W3],
    "zncc": lambda t: np.asarray(t.r)[:, poi_mod.R3_ZNCC],
    "iteration": lambda t: np.asarray(t.r)[:, poi_mod.R3_ITER],
    "deformation_increment": lambda t: np.asarray(t.r)[:, poi_mod.R3_CONV],
    "feature": lambda t: np.asarray(t.r)[:, poi_mod.R3_FEAT],
    "exx": lambda t: np.asarray(t.e)[:, 0],
    "eyy": lambda t: np.asarray(t.e)[:, 1],
    "ezz": lambda t: np.asarray(t.e)[:, 2],
    "exy": lambda t: np.asarray(t.e)[:, 3],
    "eyz": lambda t: np.asarray(t.e)[:, 4],
    "ezx": lambda t: np.asarray(t.e)[:, 5],
}


def save_map_3d(path: str, table: poi_mod.POITable3D, variable: str,
                dims: Sequence[int], delimiter: str = ",") -> None:
    """Volume value map (``saveMap3D``, oc_io.cpp:1091-1200): a z-slice per
    blank-line-separated block, like the reference's float*** dump."""
    dim_x, dim_y, dim_z = (int(d) for d in dims)
    vals = _MAP_VARS_3D[variable](table)
    out = np.zeros((dim_z, dim_y, dim_x), np.float32)
    xs = np.asarray(table.x).astype(np.int32)
    ys = np.asarray(table.y).astype(np.int32)
    zs = np.asarray(table.z).astype(np.int32)
    out[zs, ys, xs] = vals
    with open(path, "w") as f:
        for z in range(dim_z):
            for row in out[z]:
                f.write(_fmt_row(row, delimiter) + "\n")
            f.write("\n")


def save_matrix_bin_3d(path: str, table: poi_mod.POITable3D,
                       dims: Sequence[int]) -> None:
    """Compact DVC checkpoint (``saveMatrixBin``, oc_io.cpp:1202-1246):
    int32[4] {data_length, dimx, dimy, dimz}; float32 records
    (x,y,z,u,v,w,zncc,convergence) per POI."""
    p = np.asarray(table.p)
    r = np.asarray(table.r)
    rec = np.column_stack(
        [np.asarray(table.x), np.asarray(table.y), np.asarray(table.z),
         p[:, poi_mod.U3], p[:, poi_mod.V3], p[:, poi_mod.W3],
         r[:, poi_mod.R3_ZNCC], r[:, poi_mod.R3_CONV]]
    ).astype(np.float32)
    with open(path, "wb") as f:
        np.array([rec.size, dims[0], dims[1], dims[2]], np.int32).tofile(f)
        rec.tofile(f)


def load_matrix_bin_3d(path: str):
    """Returns (records[N, 8], (dimx, dimy, dimz))."""
    with open(path, "rb") as f:
        head = np.fromfile(f, np.int32, 4)
        data = np.fromfile(f, np.float32, int(head[0]))
    return data.reshape(-1, 8), (int(head[1]), int(head[2]), int(head[3]))


def _write_csv(path: str, cols, data: np.ndarray, delim: str) -> None:
    header = delim.join(cols) + delim
    if native.write_table(path, header, np.asarray(data, np.float32), delim):
        return
    buf = io.StringIO()
    buf.write(header + "\n")
    for row in data:
        buf.write(_fmt_row(row, delim) + "\n")
    with open(path, "w") as f:
        f.write(buf.getvalue())


def _read_csv(path: str, delimiter: str) -> np.ndarray:
    """Numeric table reader: native fast path with numpy fallback."""
    raw = native.read_table(path, skip_header=True, delimiter=delimiter)
    if raw is None:
        raw = np.genfromtxt(path, delimiter=delimiter, skip_header=1,
                            dtype=np.float32)
        raw = np.atleast_2d(raw)
        if np.isnan(raw[:, -1]).all():
            raw = raw[:, :-1]
    return raw
