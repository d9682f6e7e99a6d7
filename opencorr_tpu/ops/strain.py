"""Batched strain-field computation by local polynomial fits.

Reference: ``oc_strain.cpp`` — per POI with ZNCC above threshold: collect
neighbor POIs inside a subregion radius via k-d tree (KNN fallback when the
radius search returns fewer than ``neighbor_number_min``, :160-189), filter by
ZNCC (:167), first-order polynomial fit of u and v against the coordinate
deltas by QR (:195-218), then Cauchy (approximation=1) or Green-Lagrange (=2)
strain from the gradients (:220-233).

TPU design: the k-d tree becomes a masked moment matmul.  For a POI chunk, the
[chunk, N] neighbor mask (dist^2 < R^2, strictly, matching nanoflann's
``dist < radius``) is multiplied with an [N, F] monomial feature matrix —
an MXU matmul — giving all the sums needed to assemble each POI's 3x3 (2D) or
4x4 (3D) normal equations.  Coordinates and displacements are pre-shifted by
the chunk mean to keep the f32 moments well conditioned (the fitted gradients
are invariant to these shifts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import linalg as linalg_ops
from ..utils.precision import highest_precision


def _solve_sym(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve a x = b for small symmetric PD-ish systems, batched
    ([..., K, K] @ [..., K])."""
    return linalg_ops.solve_small(a, b)


@functools.partial(jax.jit, static_argnames=("approximation",))
@highest_precision
def strain2d(
    xs: jnp.ndarray,  # [N]
    ys: jnp.ndarray,
    us: jnp.ndarray,
    vs: jnp.ndarray,
    zncc: jnp.ndarray,
    e_in: jnp.ndarray,  # [N, 3]
    qx: jnp.ndarray,  # [C] chunk of query POIs (subset of xs indices' coords)
    qy: jnp.ndarray,
    qzncc: jnp.ndarray,
    qe_in: jnp.ndarray,  # [C, 3]
    radius: jnp.ndarray,
    zncc_threshold: jnp.ndarray,
    neighbor_min: jnp.ndarray,
    *,
    approximation: int,
) -> jnp.ndarray:
    """Strain for a chunk of query POIs against the full POI cloud.

    Returns the updated [C, 3] strain (exx, eyy, exy).
    """
    f32 = jnp.float32
    # Shift to chunk-local frame for f32 conditioning.
    xc, yc = jnp.mean(qx), jnp.mean(qy)
    uc, vc = jnp.mean(us), jnp.mean(vs)
    px = xs - xc  # [N]
    py = ys - yc
    pu = us - uc
    pv = vs - vc
    qx_ = qx - xc  # [C]
    qy_ = qy - yc

    d2 = (qx_[:, None] - px[None, :]) ** 2 + (qy_[:, None] - py[None, :]) ** 2
    in_radius = d2 < radius * radius  # strict, nanoflann semantics
    nr = jnp.sum(in_radius, axis=1)
    use_radius = nr >= neighbor_min

    # KNN fallback mask: the neighbor_min-th smallest distance bounds the set
    # (oc_strain.cpp:173-188).  The top_k over the full cloud is the dominant
    # cost and is only needed for sparse-neighborhood POIs, so it runs under a
    # lax.cond taken only when some POI in the chunk actually falls back.
    def with_knn(_):
        kmax = 16
        neg_top, _i = jax.lax.top_k(-d2, kmax)  # [C, kmax] ascending
        ks = jnp.clip(neighbor_min.astype(jnp.int32) - 1, 0, kmax - 1)
        kth = -neg_top[jnp.arange(qx.shape[0]), ks]
        knn_mask = d2 <= kth[:, None]
        return jnp.where(use_radius[:, None], in_radius, knn_mask)

    sel = jax.lax.cond(jnp.all(use_radius), lambda _: in_radius, with_knn,
                       operand=None)
    good = zncc >= zncc_threshold  # [N]
    w = sel & good[None, :]
    wf = w.astype(f32)  # [C, N]

    feats = jnp.stack(
        [jnp.ones_like(px), px, py, px * px, px * py, py * py,
         pu, px * pu, py * pu, pv, px * pv, py * pv],
        axis=-1,
    )  # [N, 12]
    m = wf @ feats  # [C, 12] — MXU matmul
    s0, sx, sy, sxx, sxy, syy, su, sxu, syu, sv, sxv, syv = (
        m[:, i] for i in range(12)
    )

    # Center on the query POI: dx = px - qx_, dy = py - qy_.
    a00 = s0
    a01 = sx - qx_ * s0
    a02 = sy - qy_ * s0
    a11 = sxx - 2.0 * qx_ * sx + qx_ * qx_ * s0
    a12 = sxy - qx_ * sy - qy_ * sx + qx_ * qy_ * s0
    a22 = syy - 2.0 * qy_ * sy + qy_ * qy_ * s0
    amat = jnp.stack(
        [
            jnp.stack([a00, a01, a02], -1),
            jnp.stack([a01, a11, a12], -1),
            jnp.stack([a02, a12, a22], -1),
        ],
        axis=-2,
    )  # [C, 3, 3]
    bu = jnp.stack([su, sxu - qx_ * su, syu - qy_ * su], -1)
    bv = jnp.stack([sv, sxv - qx_ * sv, syv - qy_ * sv], -1)
    gu = _solve_sym(amat, bu)  # [C, 3] — (u_mean, ux, uy)
    gv = _solve_sym(amat, bv)
    ux, uy = gu[:, 1], gu[:, 2]
    vx, vy = gv[:, 1], gv[:, 2]

    if approximation == 1:  # Cauchy (oc_strain.cpp:220-226)
        exx = ux
        eyy = vy
        exy = 0.5 * (uy + vx)
    else:  # Green-Lagrange (oc_strain.cpp:227-233)
        exx = ux + 0.5 * (ux * ux + vx * vx)
        eyy = vy + 0.5 * (uy * uy + vy * vy)
        exy = 0.5 * (uy + vx + uy * ux + vy * vx)

    fit_count = jnp.sum(wf, axis=1)
    do = (qzncc >= zncc_threshold) & (fit_count >= neighbor_min)
    e_new = jnp.stack([exx, eyy, exy], axis=-1)
    return jnp.where(do[:, None], e_new, qe_in)


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
    qx2: jnp.ndarray,  # [C] query 2D coords
    qy2: jnp.ndarray,
    qx: jnp.ndarray,  # [C] query 3D ref coords
    qy: jnp.ndarray,
    qz: jnp.ndarray,
    qzncc: jnp.ndarray,
    qe_in: jnp.ndarray,  # [C, 6]
    radius: jnp.ndarray,
    zncc_threshold: jnp.ndarray,
    neighbor_min: jnp.ndarray,
    *,
    approximation: int,
) -> jnp.ndarray:
    """Stereo strain (oc_strain.cpp:250-355): neighbors found on the 2D image
    grid, displacement gradients fitted against 3D ``ref_coor`` deltas."""
    f32 = jnp.float32
    xc, yc, zc = jnp.mean(qx), jnp.mean(qy), jnp.mean(qz)
    px, py, pz = xs - xc, ys - yc, zs - zc
    pu = us - jnp.mean(us)
    pv = vs - jnp.mean(vs)
    pw = ws - jnp.mean(ws)
    qx_, qy_, qz_ = qx - xc, qy - yc, qz - zc

    d2 = (qx2[:, None] - sx2[None, :]) ** 2 + (qy2[:, None] - sy2[None, :]) ** 2
    in_radius = d2 < radius * radius
    nr = jnp.sum(in_radius, axis=1)
    use_radius = nr >= neighbor_min

    def with_knn(_):
        kmax = 32
        neg_top, _i = jax.lax.top_k(-d2, kmax)
        ks = jnp.clip(neighbor_min.astype(jnp.int32) - 1, 0, kmax - 1)
        kth = -neg_top[jnp.arange(qx.shape[0]), ks]
        knn_mask = d2 <= kth[:, None]
        return jnp.where(use_radius[:, None], in_radius, knn_mask)

    sel = jax.lax.cond(jnp.all(use_radius), lambda _: in_radius, with_knn,
                       operand=None)
    good = zncc >= zncc_threshold
    w = sel & good[None, :]
    wf = w.astype(f32)

    one = jnp.ones_like(px)
    feats = jnp.stack(
        [one, px, py, pz,
         px * px, px * py, px * pz, py * py, py * pz, pz * pz,
         pu, px * pu, py * pu, pz * pu,
         pv, px * pv, py * pv, pz * pv,
         pw, px * pw, py * pw, pz * pw],
        axis=-1,
    )
    m = wf @ feats
    (s0, sx, sy, sz, sxx, sxy, sxz, syy, syz, szz,
     su, sxu, syu, szu, sv, sxv, syv, szv, sw, sxw, syw, szw) = (
        m[:, i] for i in range(22)
    )

    a01 = sx - qx_ * s0
    a02 = sy - qy_ * s0
    a03 = sz - qz_ * s0
    a11 = sxx - 2 * qx_ * sx + qx_ * qx_ * s0
    a12 = sxy - qx_ * sy - qy_ * sx + qx_ * qy_ * s0
    a13 = sxz - qx_ * sz - qz_ * sx + qx_ * qz_ * s0
    a22 = syy - 2 * qy_ * sy + qy_ * qy_ * s0
    a23 = syz - qy_ * sz - qz_ * sy + qy_ * qz_ * s0
    a33 = szz - 2 * qz_ * sz + qz_ * qz_ * s0
    amat = jnp.stack(
        [
            jnp.stack([s0, a01, a02, a03], -1),
            jnp.stack([a01, a11, a12, a13], -1),
            jnp.stack([a02, a12, a22, a23], -1),
            jnp.stack([a03, a13, a23, a33], -1),
        ],
        axis=-2,
    )

    def rhs(s, sxs, sys, szs):
        return jnp.stack([s, sxs - qx_ * s, sys - qy_ * s, szs - qz_ * s], -1)

    gu = _solve_sym(amat, rhs(su, sxu, syu, szu))
    gv = _solve_sym(amat, rhs(sv, sxv, syv, szv))
    gw = _solve_sym(amat, rhs(sw, sxw, syw, szw))
    ux, uy, uz = gu[:, 1], gu[:, 2], gu[:, 3]
    vx, vy, vz = gv[:, 1], gv[:, 2], gv[:, 3]
    wx, wy, wz = gw[:, 1], gw[:, 2], gw[:, 3]

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

    fit_count = jnp.sum(wf, axis=1)
    do = (qzncc >= zncc_threshold) & (fit_count >= neighbor_min)
    e_new = jnp.stack([exx, eyy, ezz, exy, eyz, ezx], axis=-1)
    return jnp.where(do[:, None], e_new, qe_in)


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
    radius: jnp.ndarray,
    zncc_threshold: jnp.ndarray,
    neighbor_min: jnp.ndarray,
    *,
    approximation: int,
) -> jnp.ndarray:
    """3D strain (oc_strain.cpp:372-472). Returns updated [C, 6] strain
    (exx, eyy, ezz, exy, eyz, ezx)."""
    f32 = jnp.float32
    xc, yc, zc = jnp.mean(qx), jnp.mean(qy), jnp.mean(qz)
    px, py, pz = xs - xc, ys - yc, zs - zc
    pu = us - jnp.mean(us)
    pv = vs - jnp.mean(vs)
    pw = ws - jnp.mean(ws)
    qx_, qy_, qz_ = qx - xc, qy - yc, qz - zc

    d2 = (
        (qx_[:, None] - px[None, :]) ** 2
        + (qy_[:, None] - py[None, :]) ** 2
        + (qz_[:, None] - pz[None, :]) ** 2
    )
    in_radius = d2 < radius * radius
    nr = jnp.sum(in_radius, axis=1)
    use_radius = nr >= neighbor_min

    def with_knn(_):
        kmax = 32
        neg_top, _i = jax.lax.top_k(-d2, kmax)
        ks = jnp.clip(neighbor_min.astype(jnp.int32) - 1, 0, kmax - 1)
        kth = -neg_top[jnp.arange(qx.shape[0]), ks]
        knn_mask = d2 <= kth[:, None]
        return jnp.where(use_radius[:, None], in_radius, knn_mask)

    sel = jax.lax.cond(jnp.all(use_radius), lambda _: in_radius, with_knn,
                       operand=None)
    good = zncc >= zncc_threshold
    w = sel & good[None, :]
    wf = w.astype(f32)

    one = jnp.ones_like(px)
    feats = jnp.stack(
        [one, px, py, pz,
         px * px, px * py, px * pz, py * py, py * pz, pz * pz,
         pu, px * pu, py * pu, pz * pu,
         pv, px * pv, py * pv, pz * pv,
         pw, px * pw, py * pw, pz * pw],
        axis=-1,
    )  # [N, 22]
    m = wf @ feats  # [C, 22]
    (s0, sx, sy, sz, sxx, sxy, sxz, syy, syz, szz,
     su, sxu, syu, szu, sv, sxv, syv, szv, sw, sxw, syw, szw) = (
        m[:, i] for i in range(22)
    )

    a01 = sx - qx_ * s0
    a02 = sy - qy_ * s0
    a03 = sz - qz_ * s0
    a11 = sxx - 2 * qx_ * sx + qx_ * qx_ * s0
    a12 = sxy - qx_ * sy - qy_ * sx + qx_ * qy_ * s0
    a13 = sxz - qx_ * sz - qz_ * sx + qx_ * qz_ * s0
    a22 = syy - 2 * qy_ * sy + qy_ * qy_ * s0
    a23 = syz - qy_ * sz - qz_ * sy + qy_ * qz_ * s0
    a33 = szz - 2 * qz_ * sz + qz_ * qz_ * s0
    amat = jnp.stack(
        [
            jnp.stack([s0, a01, a02, a03], -1),
            jnp.stack([a01, a11, a12, a13], -1),
            jnp.stack([a02, a12, a22, a23], -1),
            jnp.stack([a03, a13, a23, a33], -1),
        ],
        axis=-2,
    )

    def rhs(s, sxs, sys, szs):
        return jnp.stack(
            [s, sxs - qx_ * s, sys - qy_ * s, szs - qz_ * s], -1
        )

    gu = _solve_sym(amat, rhs(su, sxu, syu, szu))
    gv = _solve_sym(amat, rhs(sv, sxv, syv, szv))
    gw = _solve_sym(amat, rhs(sw, sxw, syw, szw))
    ux, uy, uz = gu[:, 1], gu[:, 2], gu[:, 3]
    vx, vy, vz = gv[:, 1], gv[:, 2], gv[:, 3]
    wx, wy, wz = gw[:, 1], gw[:, 2], gw[:, 3]

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

    fit_count = jnp.sum(wf, axis=1)
    do = (qzncc >= zncc_threshold) & (fit_count >= neighbor_min)
    e_new = jnp.stack([exx, eyy, ezz, exy, eyz, ezx], axis=-1)
    return jnp.where(do[:, None], e_new, qe_in)
