"""Batched forward-additive Newton-Raphson refinement (the classic method,
kept for historical comparison per 4_Processing_methods.md:180).

Reference: ``oc_nr.cpp`` — ``prepare()`` builds B-spline LUTs of the *target*
image and of both of its gradient maps (:119-158).  Each iteration re-samples
the warped target subset and its gradients, rebuilds the Hessian from the
*target* steepest-descent images (:214-243), error image =
ref*(tn/rn) - tar normalized by the target norm (:246-249), and applies a
forward-additive update p <- p + dp (:276-277).  Guard failures use code -1
(:170), unlike IC-GN's -3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import bspline, linalg as linalg_ops
from .icgn import gather_subsets_2d, make_windowed_eval2d
from ..utils.precision import highest_precision


@functools.partial(jax.jit, static_argnames=("rx", "ry", "window_margin",
                                             "eval_mode"))
@highest_precision
def nr2d1(
    ref_img: jnp.ndarray,
    tar_lut: jnp.ndarray,
    tar_lut_gx: jnp.ndarray,
    tar_lut_gy: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    p_in: jnp.ndarray,  # [N, 12]
    zncc_in: jnp.ndarray,
    conv: jnp.ndarray,
    max_iter: jnp.ndarray,
    tar_img=None,
    tar_gx_img=None,
    tar_gy_img=None,
    *,
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

    rx2, ry2 = f32(rx * rx), f32(ry * ry)
    dp_w = jnp.array([1.0, rx2, ry2, 1.0, rx2, ry2], f32)

    if window_margin is not None and eval_mode == "lattice":
        # NR re-samples the target AND its gradient maps each iteration:
        # three windowed-lattice evals (the factory works for any
        # (image, LUT) pair — gradient images included).  The global LUT
        # gathers measured ~17.9 s of real device time at the flagship
        # queue (3 evals x ~0.55 s x ~10 iterations).
        mk = lambda img, lut: make_windowed_eval2d(
            img, lut, xs, ys, u_in, v_in, rx=rx, ry=ry,
            margin=window_margin)
        ev_t = mk(tar_img, tar_lut)
        ev_gx = mk(tar_gx_img, tar_lut_gx)
        ev_gy = mk(tar_gy_img, tar_lut_gy)
    else:
        def _mk(lut):
            def ev(gxc, gyc, active):
                tval, _ = bspline.bicubic_eval(lut, gxc, gyc)
                return tval
            return ev
        ev_t, ev_gx, ev_gy = _mk(tar_lut), _mk(tar_lut_gx), _mk(tar_lut_gy)

    # sd channels are tg * monomial: keep the Hessian/numerator as fused
    # VPU reductions (the per-iteration [N,S,6] einsums were MXU-row-bound
    # and HBM-heavy; ops/icgn.py has the same structure)
    monos6 = (None, None)  # placeholder, rebuilt per iteration below

    def body(state):
        p6, active, it, dpn, znssd_out = state
        # Forward warp of the local grid with the current parameters.
        u, ux, uy, v, vx, vy = (p6[:, i, None] for i in range(6))
        gxc = xs[:, None] + (1.0 + ux) * xl + uy * yl + u
        gyc = ys[:, None] + vx * xl + (1.0 + vy) * yl + v
        tval = ev_t(gxc, gyc, active)
        tgx = ev_gx(gxc, gyc, active)
        tgy = ev_gy(gxc, gyc, active)

        tar_zm = tval - jnp.mean(tval, axis=1, keepdims=True)
        tn = jnp.sqrt(jnp.sum(tar_zm * tar_zm, axis=1))

        def sd_ch(i, base):
            g = tgx if i < 3 else tgy
            m = (None, xl, yl)[i % 3]
            return g * base if m is None else g * m * base

        hess = jnp.stack(
            [jnp.stack(
                [jnp.sum(sd_ch(i, sd_ch(j, jnp.ones_like(tgx))), axis=1)
                 for j in range(6)], -1)
             for i in range(6)], -2)
        hinv = linalg_ops.inv_small(hess)

        # error image and ZNSSD use the *target* norm (oc_nr.cpp:246-249)
        err = ref_zm * (tn / rn)[:, None] - tar_zm
        znssd = jnp.sum(err * err, axis=1) / (tn * tn)

        num = jnp.stack(
            [jnp.sum(sd_ch(i, err), axis=1) for i in range(6)], -1)
        dp = jnp.einsum("nij,nj->ni", hinv, num)
        p6_new = p6 + dp  # forward-additive (oc_nr.cpp:276-277)
        dpn_new = jnp.sqrt(jnp.sum(dp * dp * dp_w[None, :], axis=1))

        p6 = jnp.where(active[:, None], p6_new, p6)
        znssd_out = jnp.where(active, znssd, znssd_out)
        dpn = jnp.where(active, dpn_new, dpn)
        it = jnp.where(active, it + 1.0, it)
        active = active & (dpn >= conv) & (it < max_iter)
        return p6, active, it, dpn, znssd_out

    p6_init = p_in[:, jnp.array([0, 1, 2, 6, 7, 8])]
    zf = jnp.zeros_like(xs)  # sharding-varying under shard_map
    state0 = (p6_init, valid, zf, zf, zf)
    p6, _, it, dpn, znssd = jax.lax.while_loop(
        lambda st: jnp.any(st[1]), body, state0
    )

    zncc = 0.5 * (2.0 - znssd)
    zncc = jnp.where((dpn >= conv) & (it >= max_iter), f32(-4.0), zncc)
    isnan = jnp.isnan(zncc) | jnp.isnan(p6[:, 0]) | jnp.isnan(p6[:, 3])
    zncc = jnp.where(isnan, f32(-5.0), zncc)
    p6 = p6.at[:, 0].set(jnp.where(isnan, u_in, p6[:, 0]))
    p6 = p6.at[:, 3].set(jnp.where(isnan, v_in, p6[:, 3]))

    p_out = p_in
    for src, dst in enumerate([0, 1, 2, 6, 7, 8]):
        p_out = p_out.at[:, dst].set(jnp.where(valid, p6[:, src], p_in[:, dst]))

    # Guard code -1 (oc_nr.cpp:170): kept if already below -1.
    zncc_guard = jnp.where(zncc_in < -1.0, zncc_in, f32(-1.0))
    zncc_out = jnp.where(valid, zncc, zncc_guard)
    return p_out, u_in, v_in, zncc_out, it, dpn, valid
