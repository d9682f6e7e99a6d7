"""Batched inverse-compositional Levenberg-Marquardt (IC-LM) refinement.

Reference: ``oc_iclm.cpp`` — identical skeleton to IC-GN but with a damped
Hessian ``(H + lambda I)^-1`` recomputed every iteration (:266).  The damping
factor starts at ``pow(lambda0, znssd/4) - 1`` on the first iteration
(:259-263, znssd0 initialized to 4), then each step is accepted
(znssd < znssd0: lambda *= alpha, warp updated, znssd0 <- znssd) or rejected
(lambda *= beta, parameters kept) (:292-310).  Damping defaults
{lambda=100, alpha=0.1, beta=10} (oc_iclm.h:32-37).  Unlike IC-GN there is no
out-of-bounds abort: -1 interpolation sentinels blend into the cost exactly as
in the reference.

TPU design identical to ops/icgn.py: POI batch axis, masked lax.while_loop,
per-POI (lambda, znssd0) state, batched damped inverses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import bspline, linalg as linalg_ops, warp as warp_ops
from .icgn import gather_subsets_2d, make_windowed_eval2d
from ..utils.precision import highest_precision


@functools.partial(jax.jit, static_argnames=("order", "rx", "ry",
                                             "window_margin", "eval_mode"))
@highest_precision
def iclm2d(
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    ref_img: jnp.ndarray,
    tar_lut: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    p_in: jnp.ndarray,  # [N, 12]
    zncc_in: jnp.ndarray,
    conv: jnp.ndarray,
    max_iter: jnp.ndarray,
    damping: jnp.ndarray,  # [3] (lambda, alpha, beta)
    tar_img=None,
    *,
    order: int,
    rx: int,
    ry: int,
    window_margin=None,
    eval_mode: str = "lattice",
):
    """Returns (p_out[N,12], u0, v0, zncc, iteration, convergence, computed)."""
    h, w = ref_img.shape
    n = xs.shape[0]
    sh, sw = 2 * ry + 1, 2 * rx + 1
    s = sh * sw
    k = 6 if order == 1 else 12
    f32 = jnp.float32

    u_in = p_in[:, 0]
    v_in = p_in[:, 6]
    valid = (
        (ys - ry >= 0) & (xs - rx >= 0)
        & (ys + ry <= h - 1) & (xs + rx <= w - 1)
        & (jnp.abs(u_in) < w) & (jnp.abs(v_in) < h)
        & (zncc_in >= 0) & ~jnp.isnan(u_in) & ~jnp.isnan(v_in)
    )

    xi = xs.astype(jnp.int32)
    yi = ys.astype(jnp.int32)
    x0 = jnp.clip(xi - rx, 0, w - sw)
    y0 = jnp.clip(yi - ry, 0, h - sh)

    ref_sub = gather_subsets_2d(ref_img, x0, y0, rx, ry).reshape(n, s)
    ref_zm = ref_sub - jnp.mean(ref_sub, axis=1, keepdims=True)
    rn = jnp.sqrt(jnp.sum(ref_zm * ref_zm, axis=1))

    dyg, dxg = jnp.meshgrid(
        jnp.arange(-ry, ry + 1, dtype=f32),
        jnp.arange(-rx, rx + 1, dtype=f32),
        indexing="ij",
    )
    xl = dxg.reshape(-1)[None, :]
    yl = dyg.reshape(-1)[None, :]

    gxs = gather_subsets_2d(gx, x0, y0, rx, ry).reshape(n, s)
    gys = gather_subsets_2d(gy, x0, y0, rx, ry).reshape(n, s)
    if order == 1:
        sd = jnp.stack([gxs, gxs * xl, gxs * yl, gys, gys * xl, gys * yl], -1)
    else:
        xx = xl * xl * 0.5
        xy = xl * yl
        yy = yl * yl * 0.5
        sd = jnp.stack(
            [gxs, gxs * xl, gxs * yl, gxs * xx, gxs * xy, gxs * yy,
             gys, gys * xl, gys * yl, gys * xx, gys * xy, gys * yy], -1)
    hess = jnp.einsum("nsi,nsj->nij", sd, sd)

    p6_init = p_in[:, jnp.array([0, 1, 2, 6, 7, 8])]
    if order == 1:
        wmat0 = warp_ops.warp2d1_from_p(p6_init)
        warp_from_p = warp_ops.warp2d1_from_p
        p_from_warp = warp_ops.p_from_warp2d1
    else:
        p12_init = jnp.zeros((n, 12), f32).at[:, jnp.array([0, 1, 2, 6, 7, 8])].set(p6_init)
        wmat0 = warp_ops.warp2d2_from_p(p12_init)
        warp_from_p = warp_ops.warp2d2_from_p
        p_from_warp = warp_ops.p_from_warp2d2

    rx2, ry2 = f32(rx * rx), f32(ry * ry)
    rxy2 = f32(rx * rx * ry * ry)
    rx4 = f32(int(rx**4 * 0.25))
    ry4 = f32(int(ry**4 * 0.25))
    if order == 1:
        dp_w = jnp.array([1.0, rx2, ry2, 1.0, rx2, ry2], f32)
    else:
        dp_w = jnp.array(
            [1.0, rx2, ry2, rx4, rxy2, ry4, 1.0, rx2, ry2, rx4, rxy2, ry4], f32)

    if window_margin is not None and eval_mode == "lattice":
        # Gather-free windowed-lattice interpolation (see ops/icgn.py's
        # factory; round-5 device profiling measured the global tile-LUT
        # gather at ~0.55 s per iteration at the 30k flagship queue).
        # Semantic note: unlike IC-GN, the reference IC-LM blends -1
        # sentinels into the cost instead of aborting; with windows, a
        # sample that leaves its (r+margin) window also reads -1 — that
        # only happens once LM has wandered > margin-2 px past the seed.
        eval_tar = make_windowed_eval2d(
            tar_img, tar_lut, xs, ys, p_in[:, 0], p_in[:, 6],
            rx=rx, ry=ry, margin=window_margin)
    else:
        def eval_tar(gxc, gyc, active):
            tval, _ = bspline.bicubic_eval(tar_lut, gxc, gyc)
            return tval

    lam0, alpha, beta = damping[0], damping[1], damping[2]
    eye = jnp.eye(k, dtype=f32)

    def body(state):
        wmat, active, it, dpn, znssd_out, lam, znssd0 = state
        if order == 1:
            pv = jnp.stack([xl * jnp.ones((n, 1)), yl * jnp.ones((n, 1)),
                            jnp.ones((n, s))], axis=-1)
            wxy = jnp.einsum("nrc,nsc->nsr", wmat[:, :2, :], pv)
        else:
            xln = xl * jnp.ones((n, 1))
            yln = yl * jnp.ones((n, 1))
            pv = jnp.stack([xln * xln, xln * yln, yln * yln, xln, yln,
                            jnp.ones((n, s))], axis=-1)
            wxy = jnp.einsum("nrc,nsc->nsr", wmat[:, 3:5, :], pv)
        gxc = xs[:, None] + wxy[..., 0]
        gyc = ys[:, None] + wxy[..., 1]
        tval = eval_tar(gxc, gyc, active)

        tar_zm = tval - jnp.mean(tval, axis=1, keepdims=True)
        tn = jnp.sqrt(jnp.sum(tar_zm * tar_zm, axis=1))
        err = tar_zm * (rn / tn)[:, None] - ref_zm
        znssd = jnp.sum(err * err, axis=1) / (rn * rn)

        # First-iteration damping init (oc_iclm.cpp:259-263).
        lam = jnp.where(it == 0, jnp.power(lam0, znssd / znssd0) - 1.0, lam)

        hinv = linalg_ops.inv_small(hess + lam[:, None, None] * eye[None])
        num = jnp.einsum("nsi,ns->ni", sd, err)
        dp = jnp.einsum("nij,nj->ni", hinv, num)
        winc = warp_from_p(dp)
        wmat_acc = wmat @ linalg_ops.inv_small(winc)
        dpn_new = jnp.sqrt(jnp.sum(dp * dp * dp_w[None, :], axis=1))

        accept = znssd < znssd0
        lam_new = jnp.where(accept, lam * alpha, lam * beta)
        znssd0_new = jnp.where(accept, znssd, znssd0)
        wmat_new = jnp.where(accept[:, None, None], wmat_acc, wmat)

        wmat = jnp.where(active[:, None, None], wmat_new, wmat)
        lam = jnp.where(active, lam_new, lam)
        znssd0 = jnp.where(active, znssd0_new, znssd0)
        znssd_out = jnp.where(active, znssd, znssd_out)
        dpn = jnp.where(active, dpn_new, dpn)
        it = jnp.where(active, it + 1.0, it)
        active = active & (dpn >= conv) & (it < max_iter)
        return wmat, active, it, dpn, znssd_out, lam, znssd0

    zf = jnp.zeros_like(xs)  # sharding-varying under shard_map
    state0 = (
        wmat0, valid,
        zf, zf, zf,
        zf, zf + 4.0,
    )
    wmat, _, it, dpn, znssd, _, _ = jax.lax.while_loop(
        lambda st: jnp.any(st[1]), body, state0
    )

    p_new = p_from_warp(wmat)
    zncc = 0.5 * (2.0 - znssd)
    zncc = jnp.where((dpn >= conv) & (it >= max_iter), f32(-4.0), zncc)
    if order == 1:
        u_new, v_new = p_new[:, 0], p_new[:, 3]
    else:
        u_new, v_new = p_new[:, 0], p_new[:, 6]
    isnan = jnp.isnan(zncc) | jnp.isnan(u_new) | jnp.isnan(v_new)
    zncc = jnp.where(isnan, f32(-5.0), zncc)
    if order == 1:
        p_new = p_new.at[:, 0].set(jnp.where(isnan, u_in, p_new[:, 0]))
        p_new = p_new.at[:, 3].set(jnp.where(isnan, v_in, p_new[:, 3]))
    else:
        p_new = p_new.at[:, 0].set(jnp.where(isnan, u_in, p_new[:, 0]))
        p_new = p_new.at[:, 6].set(jnp.where(isnan, v_in, p_new[:, 6]))

    p_out = p_in
    if order == 1:
        for src, dst in enumerate([0, 1, 2, 6, 7, 8]):
            p_out = p_out.at[:, dst].set(
                jnp.where(valid, p_new[:, src], p_in[:, dst]))
    else:
        p_out = jnp.where(valid[:, None], p_new, p_in)

    zncc_guard = jnp.where(zncc_in >= 0, f32(-3.0), zncc_in)
    zncc_out = jnp.where(valid, zncc, zncc_guard)
    return p_out, u_in, v_in, zncc_out, it, dpn, valid


@functools.partial(jax.jit, static_argnames=("order", "r_max"))
@highest_precision
def iclm2d_adaptive(
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    ref_img: jnp.ndarray,
    tar_lut: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    srx: jnp.ndarray,  # [N] per-POI subset radius x
    sry: jnp.ndarray,
    p_in: jnp.ndarray,
    zncc_in: jnp.ndarray,
    conv: jnp.ndarray,
    max_iter: jnp.ndarray,
    damping: jnp.ndarray,
    *,
    order: int,
    r_max: int,
):
    """Self-adaptive-subset IC-LM (oc_iclm.cpp:158-164, :510-516): the masked
    max-radius formulation of ops/icgn.icgn2d_adaptive applied to the LM
    skeleton."""
    h, w = ref_img.shape
    n = xs.shape[0]
    sh = sw = 2 * r_max + 1
    s = sh * sw
    k = 6 if order == 1 else 12
    f32 = jnp.float32

    rxf = jnp.minimum(srx, f32(r_max))
    ryf = jnp.minimum(sry, f32(r_max))

    u_in = p_in[:, 0]
    v_in = p_in[:, 6]
    valid = (
        (ys - ryf >= 0) & (xs - rxf >= 0)
        & (ys + ryf <= h - 1) & (xs + rxf <= w - 1)
        & (jnp.abs(u_in) < w) & (jnp.abs(v_in) < h)
        & (zncc_in >= 0) & ~jnp.isnan(u_in) & ~jnp.isnan(v_in)
    )

    xi = xs.astype(jnp.int32)
    yi = ys.astype(jnp.int32)
    x0 = jnp.clip(xi - r_max, 0, w - sw)
    y0 = jnp.clip(yi - r_max, 0, h - sh)

    dyg, dxg = jnp.meshgrid(
        jnp.arange(-r_max, r_max + 1, dtype=f32),
        jnp.arange(-r_max, r_max + 1, dtype=f32),
        indexing="ij",
    )
    xl = dxg.reshape(-1)[None, :]
    yl = dyg.reshape(-1)[None, :]
    pmask = (jnp.abs(xl) <= rxf[:, None]) & (jnp.abs(yl) <= ryf[:, None])
    pmf = pmask.astype(f32)
    count = jnp.sum(pmf, axis=1)

    ref_sub = gather_subsets_2d(ref_img, x0, y0, r_max, r_max).reshape(n, s)
    ref_mean = jnp.sum(ref_sub * pmf, axis=1) / count
    ref_zm = (ref_sub - ref_mean[:, None]) * pmf
    rn = jnp.sqrt(jnp.sum(ref_zm * ref_zm, axis=1))

    gxs = gather_subsets_2d(gx, x0, y0, r_max, r_max).reshape(n, s) * pmf
    gys = gather_subsets_2d(gy, x0, y0, r_max, r_max).reshape(n, s) * pmf
    if order == 1:
        sd = jnp.stack([gxs, gxs * xl, gxs * yl, gys, gys * xl, gys * yl], -1)
    else:
        xx = xl * xl * 0.5
        xy = xl * yl
        yy = yl * yl * 0.5
        sd = jnp.stack(
            [gxs, gxs * xl, gxs * yl, gxs * xx, gxs * xy, gxs * yy,
             gys, gys * xl, gys * yl, gys * xx, gys * xy, gys * yy], -1)
    hess = jnp.einsum("nsi,nsj->nij", sd, sd)

    p6_init = p_in[:, jnp.array([0, 1, 2, 6, 7, 8])]
    if order == 1:
        wmat0 = warp_ops.warp2d1_from_p(p6_init)
        warp_from_p = warp_ops.warp2d1_from_p
        p_from_warp = warp_ops.p_from_warp2d1
    else:
        p12_init = jnp.zeros((n, 12), f32).at[
            :, jnp.array([0, 1, 2, 6, 7, 8])].set(p6_init)
        wmat0 = warp_ops.warp2d2_from_p(p12_init)
        warp_from_p = warp_ops.warp2d2_from_p
        p_from_warp = warp_ops.p_from_warp2d2

    rx2 = rxf * rxf
    ry2 = ryf * ryf
    rxy2 = rx2 * ry2
    rx4 = jnp.trunc(rx2 * rx2 * 0.25)
    ry4 = jnp.trunc(ry2 * ry2 * 0.25)
    one = jnp.ones_like(rx2)
    if order == 1:
        dp_w = jnp.stack([one, rx2, ry2, one, rx2, ry2], axis=-1)
    else:
        dp_w = jnp.stack(
            [one, rx2, ry2, rx4, rxy2, ry4, one, rx2, ry2, rx4, rxy2, ry4],
            axis=-1)

    lam0, alpha, beta = damping[0], damping[1], damping[2]
    eye = jnp.eye(k, dtype=f32)

    def body(state):
        wmat, active, it, dpn, znssd_out, lam, znssd0 = state
        if order == 1:
            pv = jnp.stack([xl * jnp.ones((n, 1)), yl * jnp.ones((n, 1)),
                            jnp.ones((n, s))], axis=-1)
            wxy = jnp.einsum("nrc,nsc->nsr", wmat[:, :2, :], pv)
        else:
            xln = xl * jnp.ones((n, 1))
            yln = yl * jnp.ones((n, 1))
            pv = jnp.stack([xln * xln, xln * yln, yln * yln, xln, yln,
                            jnp.ones((n, s))], axis=-1)
            wxy = jnp.einsum("nrc,nsc->nsr", wmat[:, 3:5, :], pv)
        gxc = xs[:, None] + wxy[..., 0]
        gyc = ys[:, None] + wxy[..., 1]
        tval, _ = bspline.bicubic_eval(tar_lut, gxc, gyc)

        tar_mean = jnp.sum(tval * pmf, axis=1) / count
        tar_zm = (tval - tar_mean[:, None]) * pmf
        tn = jnp.sqrt(jnp.sum(tar_zm * tar_zm, axis=1))
        err = tar_zm * (rn / tn)[:, None] - ref_zm
        znssd = jnp.sum(err * err, axis=1) / (rn * rn)

        lam = jnp.where(it == 0, jnp.power(lam0, znssd / znssd0) - 1.0, lam)
        hinv = linalg_ops.inv_small(hess + lam[:, None, None] * eye[None])
        num = jnp.einsum("nsi,ns->ni", sd, err)
        dp = jnp.einsum("nij,nj->ni", hinv, num)
        winc = warp_from_p(dp)
        wmat_acc = wmat @ linalg_ops.inv_small(winc)
        dpn_new = jnp.sqrt(jnp.sum(dp * dp * dp_w, axis=1))

        accept = znssd < znssd0
        lam_new = jnp.where(accept, lam * alpha, lam * beta)
        znssd0_new = jnp.where(accept, znssd, znssd0)
        wmat_new = jnp.where(accept[:, None, None], wmat_acc, wmat)

        wmat = jnp.where(active[:, None, None], wmat_new, wmat)
        lam = jnp.where(active, lam_new, lam)
        znssd0 = jnp.where(active, znssd0_new, znssd0)
        znssd_out = jnp.where(active, znssd, znssd_out)
        dpn = jnp.where(active, dpn_new, dpn)
        it = jnp.where(active, it + 1.0, it)
        active = active & (dpn >= conv) & (it < max_iter)
        return wmat, active, it, dpn, znssd_out, lam, znssd0

    zf = jnp.zeros_like(xs)
    state0 = (wmat0, valid, zf, zf, zf, zf, zf + 4.0)
    wmat, _, it, dpn, znssd, _, _ = jax.lax.while_loop(
        lambda st: jnp.any(st[1]), body, state0
    )

    p_new = p_from_warp(wmat)
    zncc = 0.5 * (2.0 - znssd)
    zncc = jnp.where((dpn >= conv) & (it >= max_iter), f32(-4.0), zncc)
    if order == 1:
        u_new, v_new = p_new[:, 0], p_new[:, 3]
    else:
        u_new, v_new = p_new[:, 0], p_new[:, 6]
    isnan = jnp.isnan(zncc) | jnp.isnan(u_new) | jnp.isnan(v_new)
    zncc = jnp.where(isnan, f32(-5.0), zncc)
    if order == 1:
        p_new = p_new.at[:, 0].set(jnp.where(isnan, u_in, p_new[:, 0]))
        p_new = p_new.at[:, 3].set(jnp.where(isnan, v_in, p_new[:, 3]))
    else:
        p_new = p_new.at[:, 0].set(jnp.where(isnan, u_in, p_new[:, 0]))
        p_new = p_new.at[:, 6].set(jnp.where(isnan, v_in, p_new[:, 6]))

    p_out = p_in
    if order == 1:
        for src, dst in enumerate([0, 1, 2, 6, 7, 8]):
            p_out = p_out.at[:, dst].set(
                jnp.where(valid, p_new[:, src], p_in[:, dst]))
    else:
        p_out = jnp.where(valid[:, None], p_new, p_in)

    zncc_guard = jnp.where(zncc_in >= 0, f32(-3.0), zncc_in)
    zncc_out = jnp.where(valid, zncc, zncc_guard)
    return p_out, u_in, v_in, zncc_out, it, dpn, valid
