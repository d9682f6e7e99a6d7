"""Batched feature-affine RANSAC: per-POI deformation guess from matched
keypoints.

Reference: ``oc_feature_affine.cpp`` — per POI: gather neighbor keypoints via
k-d tree radius search with KNN fallback (:182-222); RANSAC (defaults 3
samples, 20 trials, 1.5 px error threshold, >=7 neighbors, :38-42): each trial
fits a 3x3 affine to a random sample by QR (:243-260), counts the consensus set
(:262-287), and terminates early once the max set is large enough and the trial
mean error small enough (:291-292); a final least-squares affine on the best
consensus set yields u, ux, uy, v, vx, vy via the affine <-> shape-function
equivalence (:303-324).  Failure codes -1 (insufficient features, :186-189) and
-2 (inconsistent consensus, :296-299).

TPU design: the k-d tree becomes a [N_poi, M_kp] distance computation; each
POI keeps its K_CAP nearest keypoints with masks; all RANSAC trials for all
POIs run as one [N, T] batch of 3x3 solves + consensus reductions.  The
reference draws samples from std::mt19937_64 seeded by random_device — results
are not bit-reproducible even in the reference — so a fixed-seed jax.random
stream is used and validated statistically (SURVEY.md §7.3).

The early-termination rule only affects how many trials run (and the recorded
``iteration``); running the full fixed trial budget and selecting the best set
is statistically equivalent-or-better.  The recorded iteration count
reproduces the reference's stopping rule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import linalg as linalg_ops
from ..utils.precision import highest_precision


@functools.partial(
    jax.jit, static_argnames=("k_cap", "trials", "samples", "knn_only"))
@highest_precision
def feature_affine_2d(
    ref_kp: jnp.ndarray,  # [M, 2]
    tar_kp: jnp.ndarray,  # [M, 2]
    xs: jnp.ndarray,  # [N]
    ys: jnp.ndarray,
    zncc_in: jnp.ndarray,  # [N]
    search_radius: jnp.ndarray,
    neighbor_min: jnp.ndarray,
    error_threshold: jnp.ndarray,
    seed: jnp.ndarray,
    knn_k: jnp.ndarray,  # candidate count for knn_only (self-adaptive) mode
    *,
    k_cap: int,
    trials: int,
    samples: int,
    knn_only: bool = False,
):
    """Returns (p6[N, 6], zncc_out, iteration, feature)."""
    f32 = jnp.float32
    n = xs.shape[0]
    m = ref_kp.shape[0]
    kc = min(k_cap, m)

    d2 = (
        (xs[:, None] - ref_kp[None, :, 0]) ** 2
        + (ys[:, None] - ref_kp[None, :, 1]) ** 2
    )  # [N, M]
    in_radius = d2 < search_radius * search_radius
    nr = jnp.sum(in_radius, axis=1)

    # K_CAP nearest keypoints per POI (ascending distance).
    neg, idx = jax.lax.top_k(-d2, kc)  # [N, kc]
    cand_d2 = -neg
    # Candidate mask: radius branch keeps in-radius candidates; KNN fallback
    # keeps the nearest neighbor_min (oc_feature_affine.cpp:196-221).
    pos = jnp.arange(kc, dtype=f32)[None, :]
    if knn_only:
        # self-adaptive mode: candidates are exactly the knn_k nearest
        # keypoints (oc_feature_affine.cpp:139-151)
        cand_mask = jnp.broadcast_to(pos < knn_k, (n, kc))
    else:
        use_radius = nr >= neighbor_min
        cand_mask = jnp.where(
            use_radius[:, None],
            cand_d2 < search_radius * search_radius,
            pos < neighbor_min,
        )
    n_cand = jnp.sum(cand_mask, axis=1).astype(jnp.int32)  # [N]

    # POI-centered local coordinates (oc_feature_affine.cpp:226-230).
    rc = jnp.stack(
        [ref_kp[idx, 0] - xs[:, None], ref_kp[idx, 1] - ys[:, None]], axis=-1
    )  # [N, kc, 2]
    tc = jnp.stack(
        [tar_kp[idx, 0] - xs[:, None], tar_kp[idx, 1] - ys[:, None]], axis=-1
    )

    if knn_only:
        enough = n_cand >= samples  # cpp:141-145
    else:
        enough = nr >= samples  # radius-count gate (cpp:186-189)
    return _ransac_core_2d(rc, tc, cand_mask, n_cand, enough, neighbor_min,
                           error_threshold, seed, trials=trials,
                           samples=samples)


@functools.partial(jax.jit, static_argnames=("trials", "samples"))
@highest_precision
def feature_affine_2d_idx(
    ref_kp: jnp.ndarray,  # [M, 2]
    tar_kp: jnp.ndarray,
    xs: jnp.ndarray,  # [N]
    ys: jnp.ndarray,
    idx: jnp.ndarray,  # [N, kc] host-precomputed nearest-neighbor indices
    cand_mask: jnp.ndarray,  # [N, kc] bool
    enough: jnp.ndarray,  # [N] bool (in-radius count >= sample_number)
    neighbor_min: jnp.ndarray,
    error_threshold: jnp.ndarray,
    seed: jnp.ndarray,
    *,
    trials: int,
    samples: int,
):
    """RANSAC on host-precomputed candidate lists: the reference's own
    neighbor stage is a CPU k-d tree (nanoflann, oc_feature_affine.cpp:
    182-222), so the wrapper mirrors it with scipy cKDTree and ships only the
    [N, kc] index table — removing the O(N_poi x M_kp) distance matrix that
    made FA the slowest 2D stage (VERDICT round-1 weak #1)."""
    rc = jnp.stack(
        [ref_kp[idx, 0] - xs[:, None], ref_kp[idx, 1] - ys[:, None]], axis=-1
    )
    tc = jnp.stack(
        [tar_kp[idx, 0] - xs[:, None], tar_kp[idx, 1] - ys[:, None]], axis=-1
    )
    n_cand = jnp.sum(cand_mask, axis=1).astype(jnp.int32)
    return _ransac_core_2d(rc, tc, cand_mask, n_cand, enough, neighbor_min,
                           error_threshold, seed, trials=trials,
                           samples=samples)


def _ransac_core_2d(rc, tc, cand_mask, n_cand, enough, neighbor_min,
                    error_threshold, seed, *, trials, samples):
    f32 = jnp.float32
    n, kc = rc.shape[0], rc.shape[1]

    # Distinct random sample triples per (POI, trial).
    key = jax.random.PRNGKey(seed)
    u = jax.random.randint(key, (3, n, trials), 0, 1 << 30)
    nn = jnp.maximum(n_cand, samples)[:, None]  # avoid mod 0
    j1 = u[0] % nn
    j2 = (j1 + 1 + u[1] % (nn - 1)) % nn
    lo = jnp.minimum(j1, j2)
    hi = jnp.maximum(j1, j2)
    j3 = u[2] % jnp.maximum(nn - 2, 1)
    j3 = jnp.where(j3 >= lo, j3 + 1, j3)
    j3 = jnp.where(j3 >= hi, j3 + 1, j3)
    sample_idx = jnp.stack([j1, j2, j3], axis=-1)  # [N, T, 3]

    take = jax.vmap(lambda c, i: c[i])  # per-POI gather
    a_ref = take(rc, sample_idx)  # [N, T, 3, 2]
    a_tar = take(tc, sample_idx)
    ones = jnp.ones(a_ref.shape[:-1] + (1,), f32)
    amat = jnp.concatenate([a_ref, ones], axis=-1)  # [N, T, 3, 3]
    bmat = jnp.concatenate([a_tar, ones], axis=-1)
    # ref * affine = tar (oc_feature_affine.cpp:259-260)
    affine = _solve_3x3(amat, bmat)  # [N, T, 3, 3]

    # Consensus over all candidates (oc_feature_affine.cpp:262-287) as
    # explicit broadcast arithmetic: the [N, T, kc] error tensor exists only
    # inside one fused elementwise+reduce loop producing the [N, T] counts
    # and error sums (a size-3 einsum contraction would force XLA to
    # materialize the [N, T, kc, 2] prediction through HBM — that tensor
    # dominated this stage's wall time).
    def _trial_errs(aff):  # aff [N, T', 3, 3] -> err [N, T', kc]
        px = (rc[:, None, :, 0] * aff[..., 0, 0, None]
              + rc[:, None, :, 1] * aff[..., 1, 0, None]
              + aff[..., 2, 0, None])
        py = (rc[:, None, :, 0] * aff[..., 0, 1, None]
              + rc[:, None, :, 1] * aff[..., 1, 1, None]
              + aff[..., 2, 1, None])
        return jnp.sqrt((px - tc[:, None, :, 0]) ** 2
                        + (py - tc[:, None, :, 1]) ** 2)

    err = _trial_errs(affine)  # fused into the reductions below
    inlier = (err < error_threshold) & cand_mask[:, None, :]
    set_size = jnp.sum(inlier, axis=2)  # [N, T]
    err_sum = jnp.sum(jnp.where(inlier, err, 0.0), axis=2)
    mean_err = err_sum / set_size  # NaN when empty, like the reference

    best_t = jnp.argmax(set_size, axis=1)  # first max wins, like > compare
    best_size = jnp.take_along_axis(set_size, best_t[:, None], 1)[:, 0]
    # Re-derive the winning trial's inlier mask from its affine alone: a
    # [N, kc] recompute instead of gathering from the (never-materialized)
    # [N, T, kc] inlier tensor.
    best_aff = jnp.take_along_axis(
        affine, best_t[:, None, None, None], 1)  # [N, 1, 3, 3]
    best_err = _trial_errs(best_aff)[:, 0]  # [N, kc]
    best_inlier = (best_err < error_threshold) & cand_mask

    # Recorded trial count per the do-while stopping rule
    # (oc_feature_affine.cpp:291-292).
    run_max = jax.lax.associative_scan(jnp.maximum, set_size, axis=1)
    stop_ok = (run_max >= neighbor_min) & ~(mean_err > error_threshold / neighbor_min)
    any_stop = jnp.any(stop_ok, axis=1)
    first_stop = jnp.argmax(stop_ok, axis=1)
    iteration = jnp.where(any_stop, first_stop + 1, trials).astype(f32)

    # Final least-squares affine on the best consensus set (masked normal
    # equations; local coords are small so f32 is well conditioned).
    rch = jnp.concatenate([rc, jnp.ones((n, kc, 1), f32)], axis=-1)  # [N,kc,3]
    wm = best_inlier.astype(f32)
    aw = rch * wm[..., None]
    ata = jnp.einsum("nki,nkj->nij", aw, rch)
    atb = jnp.einsum("nki,nkj->nij", aw, jnp.concatenate(
        [tc, jnp.ones((n, kc, 1), f32)], axis=-1))
    affine_f = _solve_3x3(ata, atb)  # [N, 3, 3]

    p6 = jnp.stack(
        [
            affine_f[:, 2, 0],
            affine_f[:, 0, 0] - 1.0,
            affine_f[:, 1, 0],
            affine_f[:, 2, 1],
            affine_f[:, 0, 1],
            affine_f[:, 1, 1] - 1.0,
        ],
        axis=-1,
    )  # u ux uy v vx vy (oc_feature_affine.cpp:319-324)

    consensus_ok = best_size >= 3
    ok = enough & consensus_ok

    zncc_out = jnp.where(
        ok, f32(0.0), jnp.where(enough, f32(-2.0), f32(-1.0))
    )
    p6 = jnp.where(ok[:, None], p6, jnp.zeros_like(p6))
    return p6, zncc_out, iteration, best_size.astype(f32), ok


def _solve_3x3(a, b):
    return linalg_ops.solve_small(a, b)


@functools.partial(jax.jit, static_argnames=("k_cap", "trials", "samples"))
@highest_precision
def feature_affine_3d(
    ref_kp: jnp.ndarray,  # [M, 3]
    tar_kp: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    zs: jnp.ndarray,
    zncc_in: jnp.ndarray,
    search_radius: jnp.ndarray,
    neighbor_min: jnp.ndarray,
    error_threshold: jnp.ndarray,
    seed: jnp.ndarray,
    *,
    k_cap: int,
    trials: int,
    samples: int,
):
    """3D analogue (oc_feature_affine.cpp:347-560): 4-point samples fit a 4x4
    affine; 12-dof Deformation3D1 from the affine. Returns
    (p12[N,12], zncc_out, iteration, feature, ok)."""
    f32 = jnp.float32
    n = xs.shape[0]
    m = ref_kp.shape[0]
    kc = min(k_cap, m)

    d2 = (
        (xs[:, None] - ref_kp[None, :, 0]) ** 2
        + (ys[:, None] - ref_kp[None, :, 1]) ** 2
        + (zs[:, None] - ref_kp[None, :, 2]) ** 2
    )
    in_radius = d2 < search_radius * search_radius
    nr = jnp.sum(in_radius, axis=1)

    neg, idx = jax.lax.top_k(-d2, kc)
    cand_d2 = -neg
    pos = jnp.arange(kc, dtype=f32)[None, :]
    use_radius = nr >= neighbor_min
    cand_mask = jnp.where(
        use_radius[:, None],
        cand_d2 < search_radius * search_radius,
        pos < neighbor_min,
    )
    n_cand = jnp.sum(cand_mask, axis=1).astype(jnp.int32)

    ctr = jnp.stack([xs, ys, zs], axis=-1)  # [N, 3]
    rc = ref_kp[idx] - ctr[:, None]  # [N, kc, 3]
    tc = tar_kp[idx] - ctr[:, None]

    enough = nr >= samples
    return _ransac_core_3d(rc, tc, cand_mask, n_cand, enough, neighbor_min,
                           error_threshold, seed, trials=trials,
                           samples=samples)


@functools.partial(jax.jit, static_argnames=("trials", "samples"))
@highest_precision
def feature_affine_3d_idx(
    ref_kp: jnp.ndarray,  # [M, 3]
    tar_kp: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    zs: jnp.ndarray,
    idx: jnp.ndarray,  # [N, kc]
    cand_mask: jnp.ndarray,  # [N, kc]
    enough: jnp.ndarray,  # [N]
    neighbor_min: jnp.ndarray,
    error_threshold: jnp.ndarray,
    seed: jnp.ndarray,
    *,
    trials: int,
    samples: int,
):
    """3D RANSAC on host-precomputed candidates (see feature_affine_2d_idx)."""
    ctr = jnp.stack([xs, ys, zs], axis=-1)
    rc = ref_kp[idx] - ctr[:, None]
    tc = tar_kp[idx] - ctr[:, None]
    n_cand = jnp.sum(cand_mask, axis=1).astype(jnp.int32)
    return _ransac_core_3d(rc, tc, cand_mask, n_cand, enough, neighbor_min,
                           error_threshold, seed, trials=trials,
                           samples=samples)


def _ransac_core_3d(rc, tc, cand_mask, n_cand, enough, neighbor_min,
                    error_threshold, seed, *, trials, samples):
    f32 = jnp.float32
    n, kc = rc.shape[0], rc.shape[1]

    key = jax.random.PRNGKey(seed)
    u = jax.random.randint(key, (4, n, trials), 0, 1 << 30)
    nn = jnp.maximum(n_cand, samples)[:, None]
    j1 = u[0] % nn
    j2 = (j1 + 1 + u[1] % (nn - 1)) % nn
    lo = jnp.minimum(j1, j2)
    hi = jnp.maximum(j1, j2)
    j3 = u[2] % jnp.maximum(nn - 2, 1)
    j3 = jnp.where(j3 >= lo, j3 + 1, j3)
    j3 = jnp.where(j3 >= hi, j3 + 1, j3)
    # fourth distinct index
    s = jnp.sort(jnp.stack([j1, j2, j3], -1), axis=-1)  # [N, T, 3]
    j4 = u[3] % jnp.maximum(nn - 3, 1)
    j4 = jnp.where(j4 >= s[..., 0], j4 + 1, j4)
    j4 = jnp.where(j4 >= s[..., 1], j4 + 1, j4)
    j4 = jnp.where(j4 >= s[..., 2], j4 + 1, j4)
    sample_idx = jnp.stack([j1, j2, j3, j4], axis=-1)  # [N, T, 4]

    take = jax.vmap(lambda c, i: c[i])
    a_ref = take(rc, sample_idx)  # [N, T, 4, 3]
    a_tar = take(tc, sample_idx)
    ones = jnp.ones(a_ref.shape[:-1] + (1,), f32)
    amat = jnp.concatenate([a_ref, ones], axis=-1)  # [N, T, 4, 4]
    bmat = jnp.concatenate([a_tar, ones], axis=-1)
    affine = linalg_ops.solve_small(amat, bmat)

    # Fused-broadcast consensus (see _ransac_core_2d): no [N, T, kc, 3]
    # prediction tensor ever reaches HBM.
    def _trial_errs(aff):  # aff [N, T', 4, 4] -> err [N, T', kc]
        e2 = None
        for d in range(3):
            pd = (rc[:, None, :, 0] * aff[..., 0, d, None]
                  + rc[:, None, :, 1] * aff[..., 1, d, None]
                  + rc[:, None, :, 2] * aff[..., 2, d, None]
                  + aff[..., 3, d, None])
            dd = pd - tc[:, None, :, d]
            e2 = dd * dd if e2 is None else e2 + dd * dd
        return jnp.sqrt(e2)

    err = _trial_errs(affine)
    inlier = (err < error_threshold) & cand_mask[:, None, :]
    set_size = jnp.sum(inlier, axis=2)
    err_sum = jnp.sum(jnp.where(inlier, err, 0.0), axis=2)
    mean_err = err_sum / set_size

    best_t = jnp.argmax(set_size, axis=1)
    best_size = jnp.take_along_axis(set_size, best_t[:, None], 1)[:, 0]
    best_aff = jnp.take_along_axis(
        affine, best_t[:, None, None, None], 1)  # [N, 1, 4, 4]
    best_err = _trial_errs(best_aff)[:, 0]  # [N, kc]
    best_inlier = (best_err < error_threshold) & cand_mask

    run_max = jax.lax.associative_scan(jnp.maximum, set_size, axis=1)
    stop_ok = (run_max >= neighbor_min) & ~(mean_err > error_threshold / neighbor_min)
    any_stop = jnp.any(stop_ok, axis=1)
    iteration = jnp.where(any_stop, jnp.argmax(stop_ok, axis=1) + 1, trials).astype(f32)

    rch = jnp.concatenate([rc, jnp.ones((n, kc, 1), f32)], axis=-1)
    wm = best_inlier.astype(f32)
    aw = rch * wm[..., None]
    ata = jnp.einsum("nki,nkj->nij", aw, rch)
    atb = jnp.einsum("nki,nkj->nij", aw, jnp.concatenate(
        [tc, jnp.ones((n, kc, 1), f32)], axis=-1))
    af = linalg_ops.solve_small(ata, atb)  # [N, 4, 4]

    # 12-dof from the affine (u ux uy uz v vx vy vz w wx wy wz).
    p12 = jnp.stack(
        [
            af[:, 3, 0], af[:, 0, 0] - 1.0, af[:, 1, 0], af[:, 2, 0],
            af[:, 3, 1], af[:, 0, 1], af[:, 1, 1] - 1.0, af[:, 2, 1],
            af[:, 3, 2], af[:, 0, 2], af[:, 1, 2], af[:, 2, 2] - 1.0,
        ],
        axis=-1,
    )

    consensus_ok = best_size >= samples
    ok = enough & consensus_ok
    zncc_out = jnp.where(ok, f32(0.0), jnp.where(enough, f32(-2.0), f32(-1.0)))
    p12 = jnp.where(ok[:, None], p12, jnp.zeros_like(p12))
    return p12, zncc_out, iteration, best_size.astype(f32), ok
