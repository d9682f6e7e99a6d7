"""Batched strain-field computation by local polynomial fits.

Reference: ``oc_strain.cpp`` — per POI with ZNCC above threshold: collect
neighbor POIs inside a subregion radius via k-d tree (KNN fallback with
exactly ``neighbor_number_min`` nearest when the radius search returns fewer,
:160-189, search_k wired at :106), filter by ZNCC (:167), first-order
polynomial fit of u and v against the coordinate deltas by QR (:195-218), then
Cauchy (approximation=1) or Green-Lagrange (=2) strain from the gradients
(:220-233).

TPU design: the neighbor search stays on the host (scipy cKDTree — the exact
counterpart of the reference's per-thread nanoflann trees) and produces a
fixed-width neighbor index table [C, K] per query chunk; the device kernel
gathers the K candidates per POI and assembles the normal equations with
masked reductions — O(N*K) work instead of the O(N^2) masked distance matmul,
which keeps 100k+-POI fields (e.g. the Step18 reconstruction queues) cheap.
The radius mask is re-applied on device with nanoflann's strict ``dist <
radius`` semantics; KNN-fallback rows use their exact-k set regardless of
distance, like ``knnSearch``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import linalg as linalg_ops
from ..utils.precision import highest_precision


def detect_grid_2d(x: np.ndarray, y: np.ndarray):
    """If the POI cloud is a full regular grid (the common case: poi_grid_2d
    or the reference examples' CSV grids), return
    ``(iy, ix, lookup [H, W] int32, gy, gx)`` — the grid coordinates of every
    POI and the grid-cell -> POI-index map.  Returns None for scattered or
    holey clouds (those take the k-d-tree path)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n = x.shape[0]
    ux = np.unique(x)
    uy = np.unique(y)
    if len(ux) < 2 or len(uy) < 2 or len(ux) * len(uy) != n:
        return None
    dx = np.diff(ux)
    dy = np.diff(uy)
    gx, gy = dx[0], dy[0]
    if gx <= 0 or gy <= 0 or not (
        np.allclose(dx, gx, rtol=1e-6, atol=1e-6)
        and np.allclose(dy, gy, rtol=1e-6, atol=1e-6)
    ):
        return None
    ix = np.searchsorted(ux, x).astype(np.int32)
    iy = np.searchsorted(uy, y).astype(np.int32)
    lookup = np.full((len(uy), len(ux)), -1, np.int32)
    lookup[iy, ix] = np.arange(n, dtype=np.int32)
    if (lookup < 0).any():  # duplicates / holes
        return None
    return iy, ix, lookup, float(gy), float(gx)


def detect_grid_3d(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    """3D analog of :func:`detect_grid_2d`: returns
    ``(iz, iy, ix, lookup [D, H, W], gz, gy, gx)`` or None."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64)
    n = x.shape[0]
    ux, uy, uz = np.unique(x), np.unique(y), np.unique(z)
    if min(len(ux), len(uy), len(uz)) < 2 or len(ux) * len(uy) * len(uz) != n:
        return None
    gx, gy, gz = np.diff(ux)[0], np.diff(uy)[0], np.diff(uz)[0]
    if min(gx, gy, gz) <= 0 or not (
        np.allclose(np.diff(ux), gx, rtol=1e-6, atol=1e-6)
        and np.allclose(np.diff(uy), gy, rtol=1e-6, atol=1e-6)
        and np.allclose(np.diff(uz), gz, rtol=1e-6, atol=1e-6)
    ):
        return None
    ix = np.searchsorted(ux, x).astype(np.int32)
    iy = np.searchsorted(uy, y).astype(np.int32)
    iz = np.searchsorted(uz, z).astype(np.int32)
    lookup = np.full((len(uz), len(uy), len(ux)), -1, np.int32)
    lookup[iz, iy, ix] = np.arange(n, dtype=np.int32)
    if (lookup < 0).any():
        return None
    return iz, iy, ix, lookup, float(gz), float(gy), float(gx)


def grid_stencil_2d(gy: float, gx: float, radius: float, neighbor_min: int):
    """In-radius grid offset stencil (strict ``dist < radius``, nanoflann
    semantics).  Returns ``(di [K], dj [K])`` int32 padded to a multiple of 8
    with out-of-disk sentinels masked by the kernel's strict d2 test, or None
    when a corner POI could see fewer than ``neighbor_min`` neighbors (then
    the exact-KNN fallback path must be used)."""
    mj = int(np.ceil(radius / gx))
    mi = int(np.ceil(radius / gy))
    jj, ii = np.meshgrid(np.arange(-mj, mj + 1), np.arange(-mi, mi + 1))
    d2 = (jj * gx) ** 2 + (ii * gy) ** 2
    keep = d2 < radius * radius
    di = ii[keep].astype(np.int32)
    dj = jj[keep].astype(np.int32)
    # worst-case (corner) neighbor count: one quadrant of the stencil
    corner = min(
        int(((di >= 0) & (dj >= 0)).sum()),
        int(((di >= 0) & (dj <= 0)).sum()),
        int(((di <= 0) & (dj >= 0)).sum()),
        int(((di <= 0) & (dj <= 0)).sum()),
    )
    if corner < int(neighbor_min):
        return None
    pad = (-len(di)) % 8
    if pad:
        big = np.int32(1 << 20)  # far outside any grid -> masked out
        di = np.concatenate([di, np.full(pad, big, np.int32)])
        dj = np.concatenate([dj, np.full(pad, big, np.int32)])
    return di, dj


def grid_stencil_3d(gz: float, gy: float, gx: float, radius: float,
                    neighbor_min: int):
    """3D analog of :func:`grid_stencil_2d`: returns (dk, di, dj) or None."""
    mj = int(np.ceil(radius / gx))
    mi = int(np.ceil(radius / gy))
    mk = int(np.ceil(radius / gz))
    kk, ii, jj = np.meshgrid(
        np.arange(-mk, mk + 1), np.arange(-mi, mi + 1),
        np.arange(-mj, mj + 1), indexing="ij")
    d2 = (jj * gx) ** 2 + (ii * gy) ** 2 + (kk * gz) ** 2
    keep = d2 < radius * radius
    dk = kk[keep].astype(np.int32)
    di = ii[keep].astype(np.int32)
    dj = jj[keep].astype(np.int32)
    corner = len(dk)
    for sk in (1, -1):
        for si in (1, -1):
            for sj in (1, -1):
                corner = min(corner, int(
                    ((sk * dk >= 0) & (si * di >= 0) & (sj * dj >= 0)).sum()))
    if corner < int(neighbor_min):
        return None
    pad = (-len(dk)) % 8
    if pad:
        big = np.int32(1 << 20)
        dk = np.concatenate([dk, np.full(pad, big, np.int32)])
        di = np.concatenate([di, np.full(pad, big, np.int32)])
        dj = np.concatenate([dj, np.full(pad, big, np.int32)])
    return dk, di, dj


def grid_neighbors_2d(qiy, qix, lookup, di, dj):
    """Device-side neighbor-index build for full regular grids:
    ``nb_idx[c, k] = lookup[qiy[c]+di[k], qix[c]+dj[k]]`` with border masking.
    Runs inside the jitted strain kernel — no host precompute per POI."""
    h, w = lookup.shape
    ny = qiy[:, None] + di[None, :]
    nx = qix[:, None] + dj[None, :]
    ok = (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w)
    idx = lookup[jnp.clip(ny, 0, h - 1), jnp.clip(nx, 0, w - 1)]
    return idx, ok


def grid_neighbors_3d(qiz, qiy, qix, lookup, dk, di, dj):
    d, h, w = lookup.shape
    nz = qiz[:, None] + dk[None, :]
    ny = qiy[:, None] + di[None, :]
    nx = qix[:, None] + dj[None, :]
    ok = ((nz >= 0) & (nz < d) & (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w))
    idx = lookup[jnp.clip(nz, 0, d - 1), jnp.clip(ny, 0, h - 1),
                 jnp.clip(nx, 0, w - 1)]
    return idx, ok


def neighbor_lists(query_pts: np.ndarray, cloud_pts: np.ndarray,
                   radius: float, neighbor_min: int):
    """Host-side neighbor precompute (oc_strain.cpp:160-189).

    Returns ``(idx [C, K] int32, ok [C, K] bool, use_radius [C] bool)``:
    per query, up to K candidate neighbor indices into the cloud.  Rows with
    at least ``neighbor_min`` in-radius neighbors get their radius set (the
    device kernel re-applies the strict ``dist < radius`` test); the rest get
    exactly ``neighbor_min`` nearest neighbors (``knnSearch`` with
    search_k = neighbor_number_min, oc_nearest_neighbor.cpp:158-165).
    """
    from scipy.spatial import cKDTree

    q = np.ascontiguousarray(np.asarray(query_pts, np.float64))
    p = np.ascontiguousarray(np.asarray(cloud_pts, np.float64))
    nq = q.shape[0]
    n = p.shape[0]
    nmin = int(neighbor_min)
    tree = cKDTree(p)

    counts = tree.query_ball_point(q, r=float(radius), return_length=True,
                                   workers=-1)
    counts = np.asarray(counts, np.int64)
    use_radius = counts >= nmin
    kmax = int(max(counts.max(initial=1), min(nmin, n), 1))
    k_cap = -(-kmax // 8) * 8  # pad K for TPU lane tiling

    dist, idx = tree.query(q, k=k_cap, distance_upper_bound=float(radius),
                           workers=-1)
    dist = np.atleast_2d(dist).reshape(nq, -1)
    idx = np.atleast_2d(idx).reshape(nq, -1)
    ok = np.isfinite(dist)
    idx = np.where(ok, idx, 0).astype(np.int32)

    bad = np.where(~use_radius)[0]
    if bad.size:
        k = min(nmin, n)
        kd, ki = tree.query(q[bad], k=k, workers=-1)
        kd = np.atleast_2d(kd).reshape(bad.size, -1)
        ki = np.atleast_2d(ki).reshape(bad.size, -1)
        kok = np.isfinite(kd)
        row_ok = np.zeros((bad.size, k_cap), bool)
        row_idx = np.zeros((bad.size, k_cap), np.int32)
        row_ok[:, :k] = kok
        row_idx[:, :k] = np.where(kok, ki, 0).astype(np.int32)
        ok[bad] = row_ok
        idx[bad] = row_idx
    return idx, ok, use_radius


def _solve_sym(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve a x = b for small symmetric PD-ish systems, batched
    ([..., K, K] @ [..., K])."""
    return linalg_ops.solve_small(a, b)


def _fit_gradients_2d(dx, dy, nu, nv, wf):
    """Least-squares plane fit per query from masked neighbor deltas
    (oc_strain.cpp:195-218: intercept + x + y columns, normal equations)."""
    s0 = jnp.sum(wf, axis=1)
    sx = jnp.sum(wf * dx, axis=1)
    sy = jnp.sum(wf * dy, axis=1)
    sxx = jnp.sum(wf * dx * dx, axis=1)
    sxy = jnp.sum(wf * dx * dy, axis=1)
    syy = jnp.sum(wf * dy * dy, axis=1)
    amat = jnp.stack(
        [
            jnp.stack([s0, sx, sy], -1),
            jnp.stack([sx, sxx, sxy], -1),
            jnp.stack([sy, sxy, syy], -1),
        ],
        axis=-2,
    )  # [C, 3, 3]

    def rhs(val):
        return jnp.stack(
            [jnp.sum(wf * val, axis=1),
             jnp.sum(wf * dx * val, axis=1),
             jnp.sum(wf * dy * val, axis=1)], -1)

    gu = _solve_sym(amat, rhs(nu))
    gv = _solve_sym(amat, rhs(nv))
    return gu[:, 1], gu[:, 2], gv[:, 1], gv[:, 2], s0


def _fit_gradients_3d(dx, dy, dz, nu, nv, nw, wf):
    """3D/stereo fit: intercept + x + y + z columns (oc_strain.cpp:303-330)."""
    s0 = jnp.sum(wf, axis=1)
    sx = jnp.sum(wf * dx, axis=1)
    sy = jnp.sum(wf * dy, axis=1)
    sz = jnp.sum(wf * dz, axis=1)
    sxx = jnp.sum(wf * dx * dx, axis=1)
    sxy = jnp.sum(wf * dx * dy, axis=1)
    sxz = jnp.sum(wf * dx * dz, axis=1)
    syy = jnp.sum(wf * dy * dy, axis=1)
    syz = jnp.sum(wf * dy * dz, axis=1)
    szz = jnp.sum(wf * dz * dz, axis=1)
    amat = jnp.stack(
        [
            jnp.stack([s0, sx, sy, sz], -1),
            jnp.stack([sx, sxx, sxy, sxz], -1),
            jnp.stack([sy, sxy, syy, syz], -1),
            jnp.stack([sz, sxz, syz, szz], -1),
        ],
        axis=-2,
    )  # [C, 4, 4]

    def rhs(val):
        return jnp.stack(
            [jnp.sum(wf * val, axis=1),
             jnp.sum(wf * dx * val, axis=1),
             jnp.sum(wf * dy * val, axis=1),
             jnp.sum(wf * dz * val, axis=1)], -1)

    gu = _solve_sym(amat, rhs(nu))
    gv = _solve_sym(amat, rhs(nv))
    gw = _solve_sym(amat, rhs(nw))
    return (gu[:, 1], gu[:, 2], gu[:, 3],
            gv[:, 1], gv[:, 2], gv[:, 3],
            gw[:, 1], gw[:, 2], gw[:, 3], s0)


@functools.partial(jax.jit, static_argnames=("approximation",))
@highest_precision
def strain2d(
    xs: jnp.ndarray,  # [N] full POI cloud
    ys: jnp.ndarray,
    us: jnp.ndarray,
    vs: jnp.ndarray,
    zncc: jnp.ndarray,
    qx: jnp.ndarray,  # [C] chunk of query POIs
    qy: jnp.ndarray,
    qzncc: jnp.ndarray,
    qe_in: jnp.ndarray,  # [C, 3]
    nb_idx: jnp.ndarray,  # [C, K] neighbor candidates (host precompute)
    nb_ok: jnp.ndarray,  # [C, K]
    use_radius: jnp.ndarray,  # [C]
    radius: jnp.ndarray,
    zncc_threshold: jnp.ndarray,
    neighbor_min: jnp.ndarray,
    *,
    approximation: int,
) -> jnp.ndarray:
    """Strain for a chunk of query POIs. Returns the updated [C, 3] strain
    (exx, eyy, exy)."""
    f32 = jnp.float32
    # Shift displacements by the cloud mean for f32 conditioning (the fitted
    # gradients are invariant; the intercept column absorbs the shift).
    nu = (us - jnp.mean(us))[nb_idx]  # [C, K]
    nv = (vs - jnp.mean(vs))[nb_idx]
    nz = zncc[nb_idx]
    dx = xs[nb_idx] - qx[:, None]
    dy = ys[nb_idx] - qy[:, None]

    d2 = dx * dx + dy * dy
    strict = d2 < radius * radius  # nanoflann's dist < radius
    sel = nb_ok & jnp.where(use_radius[:, None], strict, True)
    w = sel & (nz >= zncc_threshold)
    wf = w.astype(f32)

    ux, uy, vx, vy, fit_count = _fit_gradients_2d(dx, dy, nu, nv, wf)

    if approximation == 1:  # Cauchy (oc_strain.cpp:220-226)
        exx = ux
        eyy = vy
        exy = 0.5 * (uy + vx)
    else:  # Green-Lagrange (oc_strain.cpp:227-233)
        exx = ux + 0.5 * (ux * ux + vx * vx)
        eyy = vy + 0.5 * (uy * uy + vy * vy)
        exy = 0.5 * (uy + vx + uy * ux + vy * vx)

    do = (qzncc >= zncc_threshold) & (fit_count >= neighbor_min)
    e_new = jnp.stack([exx, eyy, exy], axis=-1)
    return jnp.where(do[:, None], e_new, qe_in)


@functools.partial(jax.jit, static_argnames=("approximation",))
def strain2d_grid(
    xs, ys, us, vs, zncc, qx, qy, qzncc, qe_in,
    qiy, qix, lookup, di, dj,
    radius, zncc_threshold, neighbor_min, *, approximation,
):
    """Grid fast path: neighbor indices from the offset stencil, fused with
    the fit into one program (no host per-POI precompute)."""
    nb_idx, nb_ok = grid_neighbors_2d(qiy, qix, lookup, di, dj)
    use_radius = jnp.ones(qx.shape, bool)
    return strain2d(xs, ys, us, vs, zncc, qx, qy, qzncc, qe_in,
                    nb_idx, nb_ok, use_radius, radius, zncc_threshold,
                    neighbor_min, approximation=approximation)


@functools.partial(jax.jit, static_argnames=("approximation",))
@highest_precision
def strain2ds(
    sx2: jnp.ndarray,  # [N] 2D image coords used for the neighbor search
    sy2: jnp.ndarray,
    xs: jnp.ndarray,  # [N] 3D reconstructed ref coords used for the fit
    ys: jnp.ndarray,
    zs: jnp.ndarray,
    us: jnp.ndarray,
    vs: jnp.ndarray,
    ws: jnp.ndarray,
    zncc: jnp.ndarray,  # [N] min of the three stereo ZNCCs
    qx2: jnp.ndarray,  # [C] query 2D image coords
    qy2: jnp.ndarray,
    qx: jnp.ndarray,  # [C] query 3D ref coords
    qy: jnp.ndarray,
    qz: jnp.ndarray,
    qzncc: jnp.ndarray,
    qe_in: jnp.ndarray,  # [C, 6]
    nb_idx: jnp.ndarray,  # [C, K] — searched on the 2D image grid (host)
    nb_ok: jnp.ndarray,
    use_radius: jnp.ndarray,
    radius: jnp.ndarray,
    zncc_threshold: jnp.ndarray,
    neighbor_min: jnp.ndarray,
    *,
    approximation: int,
) -> jnp.ndarray:
    """Stereo strain (oc_strain.cpp:250-355): neighbors found on the 2D image
    grid, displacement gradients fitted against 3D ``ref_coor`` deltas."""
    f32 = jnp.float32
    nu = (us - jnp.mean(us))[nb_idx]
    nv = (vs - jnp.mean(vs))[nb_idx]
    nw = (ws - jnp.mean(ws))[nb_idx]
    nz = zncc[nb_idx]
    dx = xs[nb_idx] - qx[:, None]
    dy = ys[nb_idx] - qy[:, None]
    dz = zs[nb_idx] - qz[:, None]

    dx2 = sx2[nb_idx] - qx2[:, None]
    dy2 = sy2[nb_idx] - qy2[:, None]
    strict = dx2 * dx2 + dy2 * dy2 < radius * radius
    sel = nb_ok & jnp.where(use_radius[:, None], strict, True)
    w = sel & (nz >= zncc_threshold)
    wf = w.astype(f32)

    (ux, uy, uz, vx, vy, vz, wx, wy, wz, fit_count) = _fit_gradients_3d(
        dx, dy, dz, nu, nv, nw, wf)

    if approximation == 1:
        exx, eyy, ezz = ux, vy, wz
        exy = 0.5 * (uy + vx)
        eyz = 0.5 * (vz + wy)
        ezx = 0.5 * (wx + uz)
    else:
        exx = ux + 0.5 * (ux * ux + vx * vx + wx * wx)
        eyy = vy + 0.5 * (uy * uy + vy * vy + wy * wy)
        ezz = wz + 0.5 * (uz * uz + vz * vz + wz * wz)
        exy = 0.5 * (uy + vx + uy * ux + vy * vx + wy * wx)
        eyz = 0.5 * (vz + wy + uz * uy + vz * vy + wz * wy)
        ezx = 0.5 * (wx + uz + ux * uz + vx * vz + wx * wz)

    do = (qzncc >= zncc_threshold) & (fit_count >= neighbor_min)
    e_new = jnp.stack([exx, eyy, ezz, exy, eyz, ezx], axis=-1)
    return jnp.where(do[:, None], e_new, qe_in)


@functools.partial(jax.jit, static_argnames=("approximation",))
def strain2ds_grid(
    sx2, sy2, xs, ys, zs, us, vs, ws, zncc,
    qx2, qy2, qx, qy, qz, qzncc, qe_in,
    qiy, qix, lookup, di, dj,
    radius, zncc_threshold, neighbor_min, *, approximation,
):
    """Grid fast path for stereo strain: the 2D image coords form the grid."""
    nb_idx, nb_ok = grid_neighbors_2d(qiy, qix, lookup, di, dj)
    use_radius = jnp.ones(qx.shape, bool)
    return strain2ds(sx2, sy2, xs, ys, zs, us, vs, ws, zncc,
                     qx2, qy2, qx, qy, qz, qzncc, qe_in,
                     nb_idx, nb_ok, use_radius, radius, zncc_threshold,
                     neighbor_min, approximation=approximation)


@functools.partial(jax.jit, static_argnames=("approximation",))
@highest_precision
def strain3d(
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    zs: jnp.ndarray,
    us: jnp.ndarray,
    vs: jnp.ndarray,
    ws: jnp.ndarray,
    zncc: jnp.ndarray,
    qx: jnp.ndarray,
    qy: jnp.ndarray,
    qz: jnp.ndarray,
    qzncc: jnp.ndarray,
    qe_in: jnp.ndarray,  # [C, 6]
    nb_idx: jnp.ndarray,  # [C, K]
    nb_ok: jnp.ndarray,
    use_radius: jnp.ndarray,
    radius: jnp.ndarray,
    zncc_threshold: jnp.ndarray,
    neighbor_min: jnp.ndarray,
    *,
    approximation: int,
) -> jnp.ndarray:
    """3D strain (oc_strain.cpp:372-472). Returns updated [C, 6] strain
    (exx, eyy, ezz, exy, eyz, ezx)."""
    f32 = jnp.float32
    nu = (us - jnp.mean(us))[nb_idx]
    nv = (vs - jnp.mean(vs))[nb_idx]
    nw = (ws - jnp.mean(ws))[nb_idx]
    nz = zncc[nb_idx]
    dx = xs[nb_idx] - qx[:, None]
    dy = ys[nb_idx] - qy[:, None]
    dz = zs[nb_idx] - qz[:, None]

    d2 = dx * dx + dy * dy + dz * dz
    strict = d2 < radius * radius
    sel = nb_ok & jnp.where(use_radius[:, None], strict, True)
    w = sel & (nz >= zncc_threshold)
    wf = w.astype(f32)

    (ux, uy, uz, vx, vy, vz, wx, wy, wz, fit_count) = _fit_gradients_3d(
        dx, dy, dz, nu, nv, nw, wf)

    if approximation == 1:
        exx, eyy, ezz = ux, vy, wz
        exy = 0.5 * (uy + vx)
        eyz = 0.5 * (vz + wy)
        ezx = 0.5 * (wx + uz)
    else:
        exx = ux + 0.5 * (ux * ux + vx * vx + wx * wx)
        eyy = vy + 0.5 * (uy * uy + vy * vy + wy * wy)
        ezz = wz + 0.5 * (uz * uz + vz * vz + wz * wz)
        exy = 0.5 * (uy + vx + uy * ux + vy * vx + wy * wx)
        eyz = 0.5 * (vz + wy + uz * uy + vz * vy + wz * wy)
        ezx = 0.5 * (wx + uz + ux * uz + vx * vz + wx * wz)

    do = (qzncc >= zncc_threshold) & (fit_count >= neighbor_min)
    e_new = jnp.stack([exx, eyy, ezz, exy, eyz, ezx], axis=-1)
    return jnp.where(do[:, None], e_new, qe_in)


@functools.partial(jax.jit, static_argnames=("approximation",))
def strain3d_grid(
    xs, ys, zs, us, vs, ws, zncc,
    qx, qy, qz, qzncc, qe_in,
    qiz, qiy, qix, lookup, dk, di, dj,
    radius, zncc_threshold, neighbor_min, *, approximation,
):
    """Grid fast path for DVC strain."""
    nb_idx, nb_ok = grid_neighbors_3d(qiz, qiy, qix, lookup, dk, di, dj)
    use_radius = jnp.ones(qx.shape, bool)
    return strain3d(xs, ys, zs, us, vs, ws, zncc,
                    qx, qy, qz, qzncc, qe_in,
                    nb_idx, nb_ok, use_radius, radius, zncc_threshold,
                    neighbor_min, approximation=approximation)
