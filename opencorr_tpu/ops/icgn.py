"""Batched inverse-compositional Gauss-Newton (IC-GN) refinement.

Reference semantics: ``oc_icgn.cpp`` — per POI: entry guard (bounds / NaN /
prior failure -> ZNCC -3, oc_icgn.cpp:160-167); reference subset + zero-mean
norm (:174-176); steepest-descent images and KxK Hessian accumulated once from
the reference gradients (:179-207); Hessian inverted once (:210); then iterate
(do-while, at most ``stop_condition`` times, oc_icgn.cpp:225-307): warp the
local grid with the current shape function, sample the target via the B-spline
LUT, reject the POI if any sample is out of range (-1 sentinel -> ZNCC -3,
:251-255), error image = tar*(rn/tn) - ref (:260), ZNSSD = |err|^2/rn^2 (:263),
dp = H^-1 . (sd^T err) (:266-287), inverse-compositional update
W <- W . W(dp)^-1 (:290), convergence norm weighted by the subset radii
(:296-306).  Exit codes -4 (not converged, :329-332) and -5 (NaN, :335-340).

TPU design: the POI queue is the batch axis.  Every POI runs the same
fixed-shape iteration inside one ``lax.while_loop`` with a per-POI ``active``
mask; converged/failed POIs freeze their state, and the loop ends when all are
inactive (identical per-POI results to the reference's data-dependent loop).
Hessian solves are batched ``jnp.linalg.inv`` on [N, K, K]; interpolation is a
contiguous-tile gather + einsum (see ops/bspline.py).

The stereo ``center_offset`` variant (oc_icgn.cpp:353-560) is the same kernel
with a per-POI float offset of the target-subset center and of the local
coordinates used for the steepest-descent images; passing zeros reproduces the
plain path bit-for-bit.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import bspline, linalg as linalg_ops, warp as warp_ops
from . import pallas_gather2d as gather2d
from .pallas_lattice import lattice_eval
from .pallas_lattice2d import lattice_eval_2d
from ..utils.precision import highest_precision


# Queue width above which the 2D GN loop runs two-phase: full width until
# <= 1/4 of the POIs are active, then a compacted quarter-width tail.
_COMPACT_MIN = 4096


def _slice2d(img, y0, x0, sh, sw):
    return jax.lax.dynamic_slice(img, (y0, x0), (sh, sw))


def gather_subsets_2d(img: jnp.ndarray, x0: jnp.ndarray, y0: jnp.ndarray,
                      rx: int, ry: int) -> jnp.ndarray:
    """[N] int corner coords -> [N, 2ry+1, 2rx+1] windows."""
    sh, sw = 2 * ry + 1, 2 * rx + 1
    return jax.vmap(_slice2d, in_axes=(None, 0, 0, None, None))(
        img, y0, x0, sh, sw
    )


def _gather2d(img, x0, y0, rx, ry):
    """Window gather through the DMA kernel on TPU (the vmapped slice
    serializes per POI there); interpret/CPU keeps the slice loop."""
    if jax.default_backend() != "tpu":
        return gather_subsets_2d(img, x0, y0, rx, ry)
    return gather2d.gather_windows_2d(
        img, y0, x0, sh=2 * ry + 1, sw=2 * rx + 1)


def compact_idx(mask: jnp.ndarray, k: int):
    """Indices of the first k set bits of ``mask`` in scan order.

    Returns ``(gi, si, ok)``: ``gi`` [k] int32 gather indices (clamped
    in-range duplicates on padding slots), ``si`` [k] int32 scatter
    indices (= n on padding slots so ``.at[si].set(..., mode="drop")``
    discards them — no duplicate-index nondeterminism), ``ok`` [k] bool.
    Cumsum + searchsorted like sift2d._compact (scatter-free)."""
    n = mask.shape[0]
    cs = jnp.cumsum(mask.astype(jnp.int32))
    raw = jnp.searchsorted(
        cs, jnp.arange(1, k + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    ok = jnp.arange(k) < cs[-1]
    return jnp.minimum(raw, n - 1), jnp.where(ok, raw, n), ok


def make_windowed_eval2d_state(img, lut, cx, cy, u_seed, v_seed, *, rx, ry,
                               margin):
    """Factory for the gather-free windowed-lattice 2D interpolation used
    by the iterative refiners (IC-GN here; ICLM/NR reuse it — any
    "evaluate a warped subset through a bicubic LUT each iteration" loop
    has the same structure, including LUTs of gradient images).

    ``img``/``lut``: the image being sampled and its exact per-pixel tile
    LUT (the compacted-correction / escalation fallback).  ``cx``/``cy``:
    per-POI subset centers (float, including any stereo center offset);
    ``u_seed``/``v_seed``: the seeded displacement the windows are
    centered on.  Returns ``(state, eval_fn)``: ``state`` is a dict of
    per-POI arrays (leading axis N) so callers can index-compact it, and
    ``eval_fn(state, gxc, gyc, active) -> [N', S]`` evaluates with the
    reference's -1 out-of-range sentinel; samples leaving their
    (r+margin) window read as out-of-range, which only happens when the
    solver has wandered > margin-2 px past the seed.
    """
    f32 = jnp.float32
    h, w = img.shape
    sh, sw = 2 * ry + 1, 2 * rx + 1
    s = sh * sw
    # Per-POI target-IMAGE windows around the seeded center, padded
    # 1+D per side (the 3D lesson: an edge-clipped window shifts every
    # lattice placement out of range and spuriously triggers the
    # whole-chunk fallback).
    mx, my = rx + margin, ry + margin
    swx, swy = 2 * mx + 1, 2 * my + 1
    wcx = jnp.clip(jnp.floor(cx + u_seed).astype(jnp.int32) - mx,
                   0, w - swx)
    wcy = jnp.clip(jnp.floor(cy + v_seed).astype(jnp.int32) - my,
                   0, h - swy)
    # D=2 with a FIXED base from the seeded center: the extended block
    # is gathered ONCE per compute (the per-iteration vmapped slice
    # cost ~45 ms at 30k POIs), and the [0, 2D] placement range
    # absorbs up to ~2 px of combined solver drift + strain deviation
    # before the compacted correction kicks in.
    D = 2
    pw = 1 + D
    wlat = 4 + 2 * D
    elx, ely = sw + wlat - 1, sh + wlat - 1
    iixf = jnp.tile(jnp.arange(sw, dtype=jnp.int32), sh)  # x fastest
    iiyf = jnp.repeat(jnp.arange(sh, dtype=jnp.int32), sw)
    interp = jax.default_backend() != "tpu"
    # Seed-centered lattice base in PADDED-window coords.  The block is
    # gathered straight from the image at (wc - pw + b0): the 1+D pad
    # only exists so edge bases stay unclipped — valid samples' taps
    # never reach it (min tap = floor-1 >= 0 under the window-exit
    # test), so real pixels there are as good as the old zero pad.
    # The base bounds keep the gather corner inside the image;
    # image-edge POIs whose base rises above the seed-centered value
    # simply route through the compacted correction.
    seed_cx = jnp.floor(cx + u_seed).astype(jnp.int32) - wcx
    seed_cy = jnp.floor(cy + v_seed).astype(jnp.int32) - wcy
    bx0 = jnp.clip(seed_cx + pw - rx - 1 - D,
                   jnp.maximum(0, pw - wcx),
                   jnp.minimum(swx + 2 * pw - elx, w - elx + pw - wcx))
    by0 = jnp.clip(seed_cy + pw - ry - 1 - D,
                   jnp.maximum(0, pw - wcy),
                   jnp.minimum(swy + 2 * pw - ely, h - ely + pw - wcy))
    eblk = gather2d.gather_windows_2d(
        img, wcy - pw + by0, wcx - pw + bx0, sh=ely, sw=elx,
        interpret=interp)
    state = dict(wcxf=wcx.astype(f32), wcyf=wcy.astype(f32),
                 bx0=bx0, by0=by0, eblk=eblk)
    # correction-subset cap: covers a few percent of wobbled POIs.  Sized
    # at the FACTORY width: the compacted-tail phase concentrates exactly
    # the wobbled (high-strain) POIs, so a width-proportional cap there
    # would overflow and drag every tail iteration onto the whole-chunk
    # exact fallback (measured +0.5 s on the flagship queue).
    n0 = cx.shape[0]
    CAP0 = min(n0, max(256, n0 // 32))

    def eval_fn(st, gxc, gyc, active):
        n = gxc.shape[0]
        CAP2D = min(n, CAP0)
        wcxf = st["wcxf"][:, None]
        wcyf = st["wcyf"][:, None]
        bx0, by0, eblk = st["bx0"], st["by0"], st["eblk"]
        # global range guard — the EXACT float comparisons the LUT
        # path runs (bspline.bicubic_eval); local-domain tests are
        # int32-only (the round-3 miscompile lesson, ops/bspline.py)
        oob_g = (
            (gxc < 1) | (gyc < 1) | (gxc >= w - 2) | (gyc >= h - 2)
            | jnp.isnan(gxc) | jnp.isnan(gyc)
        )
        lx = jnp.where(oob_g, f32(2.0), gxc - wcxf)
        ly = jnp.where(oob_g, f32(2.0), gyc - wcyf)
        exf = jnp.floor(jnp.clip(lx, -9.0, swx + 9.0)).astype(jnp.int32)
        eyf = jnp.floor(jnp.clip(ly, -9.0, swy + 9.0)).astype(jnp.int32)
        oob = (
            oob_g
            | (exf < 1) | (exf > swx - 3)
            | (eyf < 1) | (eyf > swy - 3)
        )
        # flat [N, S] math throughout (a [N, 33, 33] layout pads its
        # 33-lane trailing dim 4x; only the kernel boundary reshapes)
        fxf = lx - exf.astype(f32)
        fyf = ly - eyf.astype(f32)
        pdx = exf + pw - 1 - bx0[:, None] - iixf[None, :]
        pdy = eyf + pw - 1 - by0[:, None] - iiyf[None, :]
        pdx = jnp.where(oob, -1, pdx)
        pdy = jnp.where(oob, -1, pdy)
        doomed = jnp.any(oob, axis=1)
        # Only ACTIVE POIs need exact values: a frozen POI (converged,
        # failed, or invalid from entry) still evaluates every
        # iteration, but its values are discarded by the step mask.
        wobble = (
            (pdx < 0) | (pdx > 2 * D) | (pdy < 0) | (pdy > 2 * D)
        ) & ~oob & (~doomed & active)[:, None]
        wob_poi = jnp.any(wobble, axis=1)
        n_wob = jnp.sum(wob_poi)

        r3 = lambda a: a.reshape(n, sh, sw)
        val = lattice_eval_2d(
            eblk, r3(pdy), r3(pdx), r3(fyf), r3(fxf), d_wobble=D,
            interpret=interp)
        val = jnp.where(oob, f32(-1.0), val.reshape(n, s))

        # Wobbled POIs (high local strain / large solver drift — e.g.
        # the oht hole boundary, ~2% of that queue) are corrected on a
        # COMPACTED fixed-size subset with a D=6 lattice eval over
        # freshly gathered image blocks RE-CENTERED at the current warp
        # (the seed-centered D=2 base absorbs ~2 px of deviation; the
        # re-centered D=6 base absorbs 6 px, i.e. 37% strain at r=16).
        # The previous exact-LUT gather here ran at ~17M samples/s and
        # cost ~125 ms per flagship compute (round-5 device profile);
        # the D=6 path is the same real tap sum reordered (~1e-6 rel),
        # and the rare residual (>D=6 deviation or an image-edge-clipped
        # base) escalates to the exact LUT eval under a nested cond.
        # If more than CAP POIs wobble, the whole chunk falls back to
        # the exact eval — correct for any deformation, slow.
        D6 = 6
        w6 = 4 + 2 * D6
        e6x, e6y = sw + w6 - 1, sh + w6 - 1
        cidx = (sh // 2) * sw + sw // 2

        def _correct(v):
            gi, si, okc = compact_idx(wob_poi, CAP2D)
            gxq = jnp.where(oob[gi], f32(2.0), gxc[gi])
            gyq = jnp.where(oob[gi], f32(2.0), gyc[gi])
            oob_c = oob[gi]
            exg = jnp.floor(gxq).astype(jnp.int32)  # [C, S] image coords
            eyg = jnp.floor(gyq).astype(jnp.int32)
            fxg = gxq - exg.astype(f32)
            fyg = gyq - eyg.astype(f32)
            bx = jnp.clip(exg[:, cidx] - rx - 1 - D6, 0, w - e6x)
            by = jnp.clip(eyg[:, cidx] - ry - 1 - D6, 0, h - e6y)
            pdx = exg - 1 - bx[:, None] - iixf[None, :]
            pdy = eyg - 1 - by[:, None] - iiyf[None, :]
            pdx = jnp.where(oob_c, -1, pdx)
            pdy = jnp.where(oob_c, -1, pdy)
            eblk6 = gather2d.gather_windows_2d(
                img, by, bx, sh=e6y, sw=e6x, interpret=interp)
            c = gi.shape[0]
            r36 = lambda a: a.reshape(c, sh, sw)
            v6 = lattice_eval_2d(
                eblk6, r36(pdy), r36(pdx), r36(fyg), r36(fxg),
                d_wobble=D6, interpret=interp).reshape(c, s)
            still = jnp.any(
                ((pdx < 0) | (pdx > 2 * D6) | (pdy < 0) | (pdy > 2 * D6))
                & ~oob_c, axis=1)

            # ``still`` is tiny in practice (1-2 POIs with garbage
            # warps on the flagship queue vs ~370 wobbled): evaluate the
            # exact LUT on a 64-POI nested compaction — firing the exact
            # branch at the full correction width cost ~106 ms/compute.
            ns = jnp.sum(still)
            caps = min(CAP2D, 64)

            def _exact(vals):
                gj, sj, okj = compact_idx(still, caps)
                tv, _u = bspline.bicubic_eval(lut, gxq[gj], gyq[gj])
                return vals.at[sj].set(tv, mode="drop")

            def _exact_all(vals):
                tv, _u = bspline.bicubic_eval(lut, gxq, gyq)
                return jnp.where(still[:, None], tv, vals)

            v6 = jax.lax.cond(ns > 0, _exact, lambda x: x, v6)
            v6 = jax.lax.cond(ns > caps, _exact_all, lambda x: x, v6)
            v6 = jnp.where(oob_c, f32(-1.0), v6)
            # padding rows scatter out of range and are dropped
            return v.at[si].set(v6, mode="drop")

        def _full(v):
            tval, _unused = bspline.bicubic_eval(lut, gxc, gyc)
            return jnp.where(oob, f32(-1.0), tval).reshape(n, s)

        val = jax.lax.cond(n_wob > 0, _correct, lambda v: v, val)
        return jax.lax.cond(n_wob > CAP2D, _full, lambda v: v, val)

    return state, eval_fn


def make_windowed_eval2d(img, lut, cx, cy, u_seed, v_seed, *, rx, ry,
                         margin):
    """Closure form of :func:`make_windowed_eval2d_state` (ICLM/NR)."""
    st, fn = make_windowed_eval2d_state(
        img, lut, cx, cy, u_seed, v_seed, rx=rx, ry=ry, margin=margin)
    return lambda gxc, gyc, active: fn(st, gxc, gyc, active)


@functools.partial(
    jax.jit, static_argnames=("order", "rx", "ry", "window_margin",
                              "eval_mode")
)
@highest_precision
def icgn2d(
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    ref_img: jnp.ndarray,
    tar_lut: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    p_in: jnp.ndarray,  # [N, 12] full deformation vector (2D layout)
    zncc_in: jnp.ndarray,  # [N]
    conv: jnp.ndarray,
    max_iter: jnp.ndarray,
    center_offset: Optional[jnp.ndarray],  # [N, 2] or None
    tar_img: Optional[jnp.ndarray] = None,
    *,
    order: int,
    rx: int,
    ry: int,
    window_margin: Optional[int] = None,
    eval_mode: str = "lattice",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (p_out[N,12], u0, v0, zncc, iteration, convergence, computed).

    ``window_margin``/``eval_mode``: None keeps the global per-pixel
    tile-LUT eval (oc_cubic_bspline.cpp:134-181 precomputation) — which
    round-5 device profiling showed runs at ~17M gathered samples/s on
    v5e, ~0.55 s per GN iteration at the flagship 30k r=16 queue.  An int
    margin M switches to per-POI target-IMAGE windows of half-extent r+M
    around the seeded center and the gather-free 2D lattice kernel
    (ops/pallas_lattice2d.py — same real value, f32 reordering ~1e-6):
    samples whose lattice deviation exceeds D=1 (strain > ~D/r or GN
    drift) fall back in-program to the exact LUT eval; samples leaving
    their window read as out-of-range (-3), which only happens when GN
    has wandered > M-2 px past the seed (the 3D kernel's semantics,
    ops/icgn.icgn3d1)."""
    h, w = ref_img.shape
    n = xs.shape[0]
    sh, sw = 2 * ry + 1, 2 * rx + 1
    s = sh * sw
    f32 = jnp.float32

    if center_offset is None:
        center_offset = jnp.zeros((n, 2), f32)
    ox, oy = center_offset[:, 0], center_offset[:, 1]

    u_in = p_in[:, 0]
    v_in = p_in[:, 6]
    # Entry guard (oc_icgn.cpp:160-167).
    valid = (
        (ys - ry >= 0)
        & (xs - rx >= 0)
        & (ys + ry <= h - 1)
        & (xs + rx <= w - 1)
        & (jnp.abs(u_in) < w)
        & (jnp.abs(v_in) < h)
        & (zncc_in >= 0)
        & ~jnp.isnan(u_in)
        & ~jnp.isnan(v_in)
    )

    xi = xs.astype(jnp.int32)  # C-style truncation, (int)poi->x
    yi = ys.astype(jnp.int32)
    x0 = jnp.clip(xi - rx, 0, w - sw)
    y0 = jnp.clip(yi - ry, 0, h - sh)

    # Reference subset, zero-mean norm (oc_subset.cpp:39-53).
    ref_sub = _gather2d(ref_img, x0, y0, rx, ry).reshape(n, s)
    ref_mean = jnp.mean(ref_sub, axis=1, keepdims=True)
    ref_zm = ref_sub - ref_mean
    rn = jnp.sqrt(jnp.sum(ref_zm * ref_zm, axis=1))  # [N]

    # Local integer grid (x fastest, row-major like the reference loops).
    dyg, dxg = jnp.meshgrid(
        jnp.arange(-ry, ry + 1, dtype=f32),
        jnp.arange(-rx, rx + 1, dtype=f32),
        indexing="ij",
    )
    xl_i = dxg.reshape(-1)  # [S] integer-valued local coords
    yl_i = dyg.reshape(-1)
    # Offset local coords used for sd images and warping (oc_icgn.cpp:400-408).
    xl = xl_i[None, :] - ox[:, None]  # [N, S]
    yl = yl_i[None, :] - oy[:, None]

    # Steepest-descent images + Hessian (oc_icgn.cpp:179-210, :719-759).
    # The sd channels are g * monomial products, so the Hessian and the
    # per-iteration numerator are plain weighted REDUCTIONS: materializing
    # sd [N, S, K] (784 MB at the flagship queue) and einsum-ing it ran
    # MXU-row-bound (~22 ms/iteration of real device time for a [K]-wide
    # output); the factored form is a handful of fused VPU reduce passes.
    gxs = _gather2d(gx, x0, y0, rx, ry).reshape(n, s)
    gys = _gather2d(gy, x0, y0, rx, ry).reshape(n, s)
    if order == 1:
        monos = (None, xl, yl)  # sd = (gx*m..., gy*m...), None = 1
    else:
        monos = (None, xl, yl, xl * xl * 0.5, xl * yl, yl * yl * 0.5)
    nm = len(monos)
    k_ch = 2 * nm

    def _sd_ch(i, base):
        """sd channel i applied to ``base`` ([N, S])."""
        g = gxs if i < nm else gys
        m = monos[i % nm]
        return g * base if m is None else g * m * base

    hess = jnp.stack(
        [jnp.stack(
            [jnp.sum(_sd_ch(i, _sd_ch(j, jnp.ones_like(gxs))), axis=1)
             for j in range(k_ch)], -1)
         for i in range(k_ch)], -2)
    hinv = linalg_ops.inv_small(hess)

    # Initial guess: always the first-order part (oc_icgn.cpp:216, :765).
    p6_init = p_in[:, jnp.array([0, 1, 2, 6, 7, 8])]
    if order == 1:
        wmat0 = warp_ops.warp2d1_from_p(p6_init)
        warp_from_p = warp_ops.warp2d1_from_p
        p_from_warp = warp_ops.p_from_warp2d1
    else:
        p12_init = jnp.zeros((n, 12), f32)
        p12_init = p12_init.at[:, jnp.array([0, 1, 2, 6, 7, 8])].set(p6_init)
        wmat0 = warp_ops.warp2d2_from_p(p12_init)
        warp_from_p = warp_ops.warp2d2_from_p
        p_from_warp = warp_ops.p_from_warp2d2

    tar_cx = xs + ox  # target subset center (oc_icgn.cpp:425-426)
    tar_cy = ys + oy

    if window_margin is not None and eval_mode == "lattice":
        ev_state, ev_fn = make_windowed_eval2d_state(
            tar_img, tar_lut, tar_cx, tar_cy, u_in, v_in,
            rx=rx, ry=ry, margin=window_margin)
    else:
        ev_state = {}

        def ev_fn(st, gxc, gyc, active):
            tval, _ = bspline.bicubic_eval(tar_lut, gxc, gyc)
            return tval

    rx2 = f32(rx * rx)
    ry2 = f32(ry * ry)
    # Convergence-norm weights (oc_icgn.cpp:296-306, :836-856).  The reference
    # computes the 2nd-order r^4 weights as ints truncated from r^4/4
    # (oc_icgn.cpp:840-841) — reproduced exactly.
    rxy2 = f32(rx * rx * ry * ry)
    rx4 = f32(int(rx * rx * rx * rx * 0.25))
    ry4 = f32(int(ry * ry * ry * ry * 0.25))
    if order == 1:
        dp_w = jnp.array([1.0, rx2, ry2, 1.0, rx2, ry2], f32)
    else:
        dp_w = jnp.array(
            [1.0, rx2, ry2, rx4, rxy2, ry4, 1.0, rx2, ry2, rx4, rxy2, ry4], f32
        )

    # Per-POI loop constants as an indexable pytree: the two-phase
    # active-set compaction below gathers a shrunken copy of everything
    # the GN body reads, so straggler iterations stop paying full queue
    # width (most POIs converge in ~4 iterations; -4 stragglers run 10).
    cc = dict(tcx=tar_cx, tcy=tar_cy, xl=xl, yl=yl, gxs=gxs, gys=gys,
              ref_zm=ref_zm, rn=rn, hinv=hinv, ev=ev_state)

    def make_body(cc):
        xl, yl = cc["xl"], cc["yl"]
        gxs, gys = cc["gxs"], cc["gys"]
        ref_zm, rn, hinv = cc["ref_zm"], cc["rn"], cc["hinv"]
        tcx, tcy = cc["tcx"], cc["tcy"]
        if order == 1:
            monos = (None, xl, yl)
        else:
            monos = (None, xl, yl, xl * xl * 0.5, xl * yl, yl * yl * 0.5)

        def _sd_ch(i, base):
            g = gxs if i < nm else gys
            m = monos[i % nm]
            return g * base if m is None else g * m * base

        def body(state):
            wmat, active, it, dpn, znssd, oob_fail = state
            # Warp the local grid (oc_deformation.cpp:94-105 / :268-282)
            # with explicit FMAs: the einsum form materialized a
            # [N, S, 3|6] basis stack (393 MB/iteration at the flagship
            # queue) and ran as MXU rows.
            if order == 1:
                rows = wmat[:, :2, :]
                basis = (xl, yl, None)  # None = the constant-1 column
            else:
                rows = wmat[:, 3:5, :]
                basis = (xl * xl, xl * yl, yl * yl, xl, yl, None)

            def wrow(r):
                acc = rows[:, r, len(basis) - 1][:, None]
                for c, b in enumerate(basis[:-1]):
                    acc = acc + rows[:, r, c][:, None] * b
                return acc

            gx_c = tcx[:, None] + wrow(0)
            gy_c = tcy[:, None] + wrow(1)
            tval = ev_fn(cc["ev"], gx_c, gy_c, active)

            # Out-of-range detection, -1 sentinel (oc_icgn.cpp:244-255).
            fail_now = jnp.any(tval < 0.0, axis=1) & active

            tar_mean = jnp.mean(tval, axis=1, keepdims=True)
            tar_zm = tval - tar_mean
            tn = jnp.sqrt(jnp.sum(tar_zm * tar_zm, axis=1))
            err = tar_zm * (rn / tn)[:, None] - ref_zm
            znssd_new = jnp.sum(err * err, axis=1) / (rn * rn)
            num = jnp.stack(
                [jnp.sum(_sd_ch(i, err), axis=1) for i in range(k_ch)], -1)
            dp = jnp.einsum("nij,nj->ni", hinv, num)
            winc = warp_from_p(dp)
            wmat_new = wmat @ linalg_ops.inv_small(winc)
            dpn_new = jnp.sqrt(jnp.sum(dp * dp * dp_w[None, :], axis=1))

            step = active & ~fail_now
            wmat = jnp.where(step[:, None, None], wmat_new, wmat)
            znssd = jnp.where(step, znssd_new, znssd)
            dpn = jnp.where(step, dpn_new, dpn)
            it = jnp.where(step, it + 1.0, it)
            oob_fail = oob_fail | fail_now
            active = step & (dpn >= conv) & (it < max_iter)
            return wmat, active, it, dpn, znssd, oob_fail

        return body

    zf = jnp.zeros_like(xs)  # derived from inputs: sharding-varying under shard_map
    state0 = (
        wmat0,
        valid,
        zf,
        zf,
        zf,
        valid & ~valid,
    )
    body = make_body(cc)
    if n >= _COMPACT_MIN:
        # Phase 1 at full width until <= n/4 POIs remain active; phase 2
        # re-runs the SAME body on a gather-compacted quarter-width state
        # (per-POI results identical: each POI's math is independent and
        # unchanged — only the batch it shares a program with differs).
        m = -(-n // 4)
        st1 = jax.lax.while_loop(
            lambda st: jnp.any(st[1]) & (jnp.sum(st[1]) > m), body, state0)
        wmat, active1, it, dpn, znssd, oob_fail = st1
        gi, si, okc = compact_idx(active1, m)
        cc_s = jax.tree_util.tree_map(lambda a: a[gi], cc)
        sub0 = (wmat[gi], active1[gi] & okc, it[gi], dpn[gi], znssd[gi],
                oob_fail[gi])
        sub = jax.lax.while_loop(
            lambda st: jnp.any(st[1]), make_body(cc_s), sub0)
        put = lambda full, v: full.at[si].set(v, mode="drop")
        wmat = put(wmat, sub[0])
        it = put(it, sub[2])
        dpn = put(dpn, sub[3])
        znssd = put(znssd, sub[4])
        oob_fail = put(oob_fail, sub[5])
    else:
        wmat, _, it, dpn, znssd, oob_fail = jax.lax.while_loop(
            lambda st: jnp.any(st[1]), body, state0
        )

    computed = valid & ~oob_fail
    p_new = p_from_warp(wmat)  # [N, 6] or [N, 12]
    zncc = 0.5 * (2.0 - znssd)
    # Not-converged code (oc_icgn.cpp:329-332).
    zncc = jnp.where((dpn >= conv) & (it >= max_iter), f32(-4.0), zncc)

    if order == 1:
        u_new, v_new = p_new[:, 0], p_new[:, 3]
    else:
        u_new, v_new = p_new[:, 0], p_new[:, 6]
    # NaN fallback (oc_icgn.cpp:335-340): restore u, v to the initial guess.
    isnan = jnp.isnan(zncc) | jnp.isnan(u_new) | jnp.isnan(v_new)
    zncc = jnp.where(isnan, f32(-5.0), zncc)
    if order == 1:
        p_new = p_new.at[:, 0].set(jnp.where(isnan, u_in, p_new[:, 0]))
        p_new = p_new.at[:, 3].set(jnp.where(isnan, v_in, p_new[:, 3]))
    else:
        p_new = p_new.at[:, 0].set(jnp.where(isnan, u_in, p_new[:, 0]))
        p_new = p_new.at[:, 6].set(jnp.where(isnan, v_in, p_new[:, 6]))

    # Merge updated components back into the 12-dof table rows.
    p_out = p_in
    if order == 1:
        for src, dst in enumerate([0, 1, 2, 6, 7, 8]):
            p_out = p_out.at[:, dst].set(
                jnp.where(computed, p_new[:, src], p_in[:, dst])
            )
    else:
        p_out = jnp.where(computed[:, None], p_new, p_in)

    # Failure ZNCC for guarded-out POIs (oc_icgn.cpp:165).
    zncc_guard = jnp.where(zncc_in >= 0, f32(-3.0), zncc_in)
    zncc_out = jnp.where(valid, jnp.where(oob_fail, f32(-3.0), zncc), zncc_guard)

    return p_out, u_in, v_in, zncc_out, it, dpn, computed


@functools.partial(jax.jit, static_argnames=("order", "r_max"))
@highest_precision
def icgn2d_adaptive(
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    ref_img: jnp.ndarray,
    tar_lut: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    srx: jnp.ndarray,  # [N] per-POI subset radius x (float, from the table)
    sry: jnp.ndarray,
    p_in: jnp.ndarray,
    zncc_in: jnp.ndarray,
    conv: jnp.ndarray,
    max_iter: jnp.ndarray,
    *,
    order: int,
    r_max: int,
):
    """Self-adaptive-subset IC-GN (oc_icgn.cpp:152-158): per-POI subset radii.

    The reference re-allocates per-thread scratch at each POI's radius; here
    every POI runs on the static ``r_max`` grid with a per-POI pixel mask —
    one compilation, identical numerics (masked pixels contribute zero to all
    sums and the masked mean/count reductions reproduce the smaller subset
    exactly).

    Returns (p_out, u0, v0, zncc, iteration, convergence, computed).
    """
    h, w = ref_img.shape
    n = xs.shape[0]
    sh = sw = 2 * r_max + 1
    s = sh * sw
    f32 = jnp.float32

    rxf = jnp.minimum(srx, f32(r_max))
    ryf = jnp.minimum(sry, f32(r_max))

    u_in = p_in[:, 0]
    v_in = p_in[:, 6]
    valid = (
        (ys - ryf >= 0)
        & (xs - rxf >= 0)
        & (ys + ryf <= h - 1)
        & (xs + rxf <= w - 1)
        & (jnp.abs(u_in) < w)
        & (jnp.abs(v_in) < h)
        & (zncc_in >= 0)
        & ~jnp.isnan(u_in)
        & ~jnp.isnan(v_in)
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
    xl = dxg.reshape(-1)[None, :]  # [1, S]
    yl = dyg.reshape(-1)[None, :]
    pmask = (jnp.abs(xl) <= rxf[:, None]) & (jnp.abs(yl) <= ryf[:, None])
    pmf = pmask.astype(f32)  # [N, S]
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
    hinv = linalg_ops.inv_small(hess)

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

    # per-POI convergence weights (traced radii)
    rx2 = rxf * rxf
    ry2 = ryf * ryf
    rxy2 = rx2 * ry2
    rx4 = jnp.trunc(rx2 * rx2 * 0.25)
    ry4 = jnp.trunc(ry2 * ry2 * 0.25)
    one = jnp.ones_like(rx2)
    if order == 1:
        dp_w = jnp.stack([one, rx2, ry2, one, rx2, ry2], axis=-1)  # [N, 6]
    else:
        dp_w = jnp.stack(
            [one, rx2, ry2, rx4, rxy2, ry4, one, rx2, ry2, rx4, rxy2, ry4],
            axis=-1)

    def body(state):
        wmat, active, it, dpn, znssd, oob_fail = state
        if order == 1:
            pv = jnp.stack(
                [xl * jnp.ones((n, 1)), yl * jnp.ones((n, 1)),
                 jnp.ones((n, s))], axis=-1)
            wxy = jnp.einsum("nrc,nsc->nsr", wmat[:, :2, :], pv)
        else:
            xln = xl * jnp.ones((n, 1))
            yln = yl * jnp.ones((n, 1))
            pv = jnp.stack(
                [xln * xln, xln * yln, yln * yln, xln, yln, jnp.ones((n, s))],
                axis=-1)
            wxy = jnp.einsum("nrc,nsc->nsr", wmat[:, 3:5, :], pv)
        gx_c = xs[:, None] + wxy[..., 0]
        gy_c = ys[:, None] + wxy[..., 1]
        tval, _ = bspline.bicubic_eval(tar_lut, gx_c, gy_c)

        fail_now = jnp.any((tval < 0.0) & pmask, axis=1) & active

        tar_mean = jnp.sum(tval * pmf, axis=1) / count
        tar_zm = (tval - tar_mean[:, None]) * pmf
        tn = jnp.sqrt(jnp.sum(tar_zm * tar_zm, axis=1))
        err = tar_zm * (rn / tn)[:, None] - ref_zm
        znssd_new = jnp.sum(err * err, axis=1) / (rn * rn)
        num = jnp.einsum("nsi,ns->ni", sd, err)
        dp = jnp.einsum("nij,nj->ni", hinv, num)
        winc = warp_from_p(dp)
        wmat_new = wmat @ linalg_ops.inv_small(winc)
        dpn_new = jnp.sqrt(jnp.sum(dp * dp * dp_w, axis=1))

        step = active & ~fail_now
        wmat = jnp.where(step[:, None, None], wmat_new, wmat)
        znssd = jnp.where(step, znssd_new, znssd)
        dpn = jnp.where(step, dpn_new, dpn)
        it = jnp.where(step, it + 1.0, it)
        oob_fail = oob_fail | fail_now
        active = step & (dpn >= conv) & (it < max_iter)
        return wmat, active, it, dpn, znssd, oob_fail

    zf = jnp.zeros_like(xs)  # sharding-varying under shard_map
    state0 = (
        wmat0, valid,
        zf, zf, zf,
        valid & ~valid,
    )
    wmat, _, it, dpn, znssd, oob_fail = jax.lax.while_loop(
        lambda st: jnp.any(st[1]), body, state0
    )

    computed = valid & ~oob_fail
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
                jnp.where(computed, p_new[:, src], p_in[:, dst]))
    else:
        p_out = jnp.where(computed[:, None], p_new, p_in)

    zncc_guard = jnp.where(zncc_in >= 0, f32(-3.0), zncc_in)
    zncc_out = jnp.where(valid, jnp.where(oob_fail, f32(-3.0), zncc), zncc_guard)
    return p_out, u_in, v_in, zncc_out, it, dpn, computed


def _slice3d(vol, z0, y0, x0, sz, sy, sx):
    return jax.lax.dynamic_slice(vol, (z0, y0, x0), (sz, sy, sx))


def gather_subsets_3d(vol, x0, y0, z0, rx, ry, rz):
    sz, sy, sx = 2 * rz + 1, 2 * ry + 1, 2 * rx + 1
    return jax.vmap(_slice3d, in_axes=(None, 0, 0, 0, None, None, None))(
        vol, z0, y0, x0, sz, sy, sx
    )


@functools.partial(
    jax.jit,
    static_argnames=("rx", "ry", "rz", "window_margin", "eval_mode"))
@highest_precision
def icgn3d1(
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    gz: jnp.ndarray,
    ref_vol: jnp.ndarray,
    tar_coeff: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    zs: jnp.ndarray,
    p_in: jnp.ndarray,  # [N, 12] 3D layout
    zncc_in: jnp.ndarray,
    conv: jnp.ndarray,
    max_iter: jnp.ndarray,
    *,
    rx: int,
    ry: int,
    rz: int,
    window_margin: Optional[int] = None,
    eval_mode: str = "tile",
    z_guard_lo=None,
    z_guard_hi=None,
):
    """3D IC-GN (oc_icgn.cpp:1270-1490). Returns
    (p_out, u0, v0, w0, zncc, iteration, convergence, computed).

    ``z_guard_lo``/``z_guard_hi`` optionally tighten the interpolation range
    guard along z (used by the sharded DVC path to impose the *global* volume
    boundary on a halo-extended block): a warped voxel with z < lo or
    z >= hi fails the subset with -3 like any out-of-range warp.

    ``window_margin``: None evaluates target samples through the GLOBAL
    coefficient volume (a 64-scattered-tap gather per sample — at CT scale
    the big-operand gather is the whole runtime, PERF.md "DVC at CT scale").
    An int M switches to per-POI coefficient WINDOWS of half-extent r+M per
    axis, centered on the warped subset center (POI + integer initial
    displacement), gathered once per chunk with contiguous dynamic slices
    and expanded into contiguous 64-wide tile LUTs
    (bspline.tricubic_window_tiles) — one contiguous gather row per sample.
    Values are bit-identical to the global path for every sample inside its
    window (integer corners keep the fractional parts exact).  A sample
    LEAVING its window reads as out-of-range (-3 subset failure): with the
    default margin M=8 that only happens when Gauss-Newton has wandered
    > M-2 voxels past the seeded position, i.e. the subset is diverging —
    such POIs fail with -3 instead of the global path's "keep iterating
    toward -4/garbage" (semantic note argued in CLAUDE.md round-3 lead)."""
    dz, dy, dx = ref_vol.shape
    n = xs.shape[0]
    sx, sy, sz = 2 * rx + 1, 2 * ry + 1, 2 * rz + 1
    s = sx * sy * sz
    f32 = jnp.float32

    u_in, v_in, w_in = p_in[:, 0], p_in[:, 4], p_in[:, 8]
    valid = (
        (xs - rx >= 0) & (ys - ry >= 0) & (zs - rz >= 0)
        & (xs + rx <= dx - 1) & (ys + ry <= dy - 1) & (zs + rz <= dz - 1)
        & (jnp.abs(u_in) < dx) & (jnp.abs(v_in) < dy) & (jnp.abs(w_in) < dz)
        & (zncc_in >= 0)
        & ~jnp.isnan(u_in) & ~jnp.isnan(v_in) & ~jnp.isnan(w_in)
    )

    xi = xs.astype(jnp.int32)
    yi = ys.astype(jnp.int32)
    zi = zs.astype(jnp.int32)
    x0 = jnp.clip(xi - rx, 0, dx - sx)
    y0 = jnp.clip(yi - ry, 0, dy - sy)
    z0 = jnp.clip(zi - rz, 0, dz - sz)

    ref_sub = gather_subsets_3d(ref_vol, x0, y0, z0, rx, ry, rz).reshape(n, s)
    ref_mean = jnp.mean(ref_sub, axis=1, keepdims=True)
    ref_zm = ref_sub - ref_mean
    rn = jnp.sqrt(jnp.sum(ref_zm * ref_zm, axis=1))

    zg, yg, xg = jnp.meshgrid(
        jnp.arange(-rz, rz + 1, dtype=f32),
        jnp.arange(-ry, ry + 1, dtype=f32),
        jnp.arange(-rx, rx + 1, dtype=f32),
        indexing="ij",
    )
    xl = xg.reshape(-1)[None, :]
    yl = yg.reshape(-1)[None, :]
    zl = zg.reshape(-1)[None, :]

    gxs = gather_subsets_3d(gx, x0, y0, z0, rx, ry, rz).reshape(n, s)
    gys = gather_subsets_3d(gy, x0, y0, z0, rx, ry, rz).reshape(n, s)
    gzs = gather_subsets_3d(gz, x0, y0, z0, rx, ry, rz).reshape(n, s)

    # sd channel order matches the 3D p layout (oc_icgn.cpp:1314-1325).
    sd = jnp.stack(
        [
            gxs, gxs * xl, gxs * yl, gxs * zl,
            gys, gys * xl, gys * yl, gys * zl,
            gzs, gzs * xl, gzs * yl, gzs * zl,
        ],
        axis=-1,
    )  # [N, S, 12]
    hess = jnp.einsum("nsi,nsj->nij", sd, sd)
    hinv = linalg_ops.inv_small(hess)

    wmat0 = warp_ops.warp3d1_from_p(p_in)

    if window_margin is not None:
        # Per-POI coefficient windows, gathered ONCE per chunk (amortized
        # over all GN iterations) and expanded to contiguous tile LUTs.
        mx, my, mz = rx + window_margin, ry + window_margin, rz + window_margin
        swx, swy, swz = 2 * mx + 1, 2 * my + 1, 2 * mz + 1
        wcx = jnp.clip(jnp.floor(xs + u_in).astype(jnp.int32) - mx,
                       0, dx - swx)
        wcy = jnp.clip(jnp.floor(ys + v_in).astype(jnp.int32) - my,
                       0, dy - swy)
        wcz = jnp.clip(jnp.floor(zs + w_in).astype(jnp.int32) - mz,
                       0, dz - swz)

        def _win(z0, y0, x0):
            return jax.lax.dynamic_slice(
                tar_coeff, (z0, y0, x0), (swz, swy, swx))

        cwin = jax.vmap(_win)(wcz, wcy, wcx)
        if eval_mode == "tile":
            w64 = bspline.tricubic_window_tiles(cwin)
        wcxf = wcx.astype(f32)[:, None]
        wcyf = wcy.astype(f32)[:, None]
        wczf = wcz.astype(f32)[:, None]

        def _local_oob(gxc, gyc, gzc):
            # Global range guard: the EXACT float comparisons the global
            # path runs (bspline._tricubic_eval_impl) — round 3's windowed
            # wiring computed this mask on localized floats inside the
            # fused GN program and hit a sandbox-TPU miscompile (7e9e2e9);
            # all local-domain tests below are int32-only.
            oob_g = (
                (gxc < 1) | (gyc < 1) | (gzc < 1)
                | (gxc >= dx - 2) | (gyc >= dy - 2) | (gzc >= dz - 2)
                | jnp.isnan(gxc) | jnp.isnan(gyc) | jnp.isnan(gzc)
            )
            # Localize; sanitize masked samples so floor/int stay defined.
            lx = jnp.where(oob_g, f32(2.0), gxc - wcxf)
            ly = jnp.where(oob_g, f32(2.0), gyc - wcyf)
            lz = jnp.where(oob_g, f32(2.0), gzc - wczf)
            # Integer-domain window-exit test (bounded before the cast).
            exf = jnp.floor(jnp.clip(lx, -9.0, swx + 9.0)).astype(jnp.int32)
            eyf = jnp.floor(jnp.clip(ly, -9.0, swy + 9.0)).astype(jnp.int32)
            ezf = jnp.floor(jnp.clip(lz, -9.0, swz + 9.0)).astype(jnp.int32)
            oob = (
                oob_g
                | (exf < 1) | (exf > swx - 3)
                | (eyf < 1) | (eyf > swy - 3)
                | (ezf < 1) | (ezf > swz - 3)
            )
            return lx, ly, lz, exf, eyf, ezf, oob

        if eval_mode == "tile":
            def eval_tar(gxc, gyc, gzc, active):
                lx, ly, lz, _, _, _, oob = _local_oob(gxc, gyc, gzc)
                return bspline.tricubic_eval_tiled(
                    w64, (swz, swy, swx), lx, ly, lz, oob)
        else:
            # Gather-free lattice eval (ops/pallas_lattice.py): warped
            # subset samples sit on a near-regular integer lattice, so the
            # 64-tap tricubic sum becomes (4+2D)^3 statically shifted VMEM
            # slices of a per-POI extended block — pure VPU work, zero
            # gathers (measured 4.3x the tile path's per-iteration cost at
            # Torus scale, bench_gather_ab.py P1 vs C).  Samples whose
            # lattice deviation exceeds D ("wobble overflow": |strain|
            # above ~D/r, or GN drift past the block edge) are detected
            # with int32 compares OUTSIDE the kernel and the whole
            # iteration falls back to the exact global-volume eval under a
            # lax.cond, so semantics stay exact for any deformation.
            D = 1
            wlat = 4 + 2 * D
            elx, ely, elz = sx + wlat - 1, sy + wlat - 1, sz + wlat - 1
            iix = jnp.arange(sx, dtype=jnp.int32)
            iiy = jnp.arange(sy, dtype=jnp.int32)
            iiz = jnp.arange(sz, dtype=jnp.int32)
            interp = jax.default_backend() != "tpu"
            # Pad the windows by 1+D per side: near the volume edge the
            # coefficient window is clipped off-center, which would clip
            # the lattice base and shift every placement offset out of
            # range (a spurious whole-chunk fallback for ~6% of the Torus
            # queue).  With the pad, any POI whose samples are ALL
            # in-range keeps an unclipped base; samples touching the pad
            # are globally out-of-range and masked anyway.
            pw = 1 + D
            cwin_p = jnp.pad(cwin, ((0, 0), (pw, pw), (pw, pw), (pw, pw)))

            def eval_tar(gxc, gyc, gzc, active):
                lx, ly, lz, exf, eyf, ezf, oob = _local_oob(gxc, gyc, gzc)
                xi = exf.reshape(n, sz, sy, sx)
                yi = eyf.reshape(n, sz, sy, sx)
                zi = ezf.reshape(n, sz, sy, sx)
                fx = lx.reshape(n, sz, sy, sx) - xi.astype(f32)
                fy = ly.reshape(n, sz, sy, sx) - yi.astype(f32)
                fz = lz.reshape(n, sz, sy, sx) - zi.astype(f32)
                oob4 = oob.reshape(n, sz, sy, sx)
                # Lattice base from the center sample's integer corner, in
                # PADDED window coords (xi + pw).
                bx0 = jnp.clip(xi[:, rz, ry, rx] + pw - rx - 1 - D,
                               0, swx + 2 * pw - elx)
                by0 = jnp.clip(yi[:, rz, ry, rx] + pw - ry - 1 - D,
                               0, swy + 2 * pw - ely)
                bz0 = jnp.clip(zi[:, rz, ry, rx] + pw - rz - 1 - D,
                               0, swz + 2 * pw - elz)
                pdx = (xi + pw - 1 - bx0[:, None, None, None]
                       - iix[None, None, None, :])
                pdy = (yi + pw - 1 - by0[:, None, None, None]
                       - iiy[None, None, :, None])
                pdz = (zi + pw - 1 - bz0[:, None, None, None]
                       - iiz[None, :, None, None])
                # OOB samples must contribute nothing: -1 matches no slot.
                pdx = jnp.where(oob4, -1, pdx)
                pdy = jnp.where(oob4, -1, pdy)
                pdz = jnp.where(oob4, -1, pdz)
                # A POI with ANY out-of-range sample fails -3 this
                # iteration regardless of values (fail_any below), so its
                # placements must not trigger the exact-path fallback.
                doomed = jnp.any(oob4, axis=(1, 2, 3))
                # active-masked like the 2D path: frozen POIs must not
                # keep the whole chunk on the exact fallback
                wobble = (
                    (pdx < 0) | (pdx > 2 * D)
                    | (pdy < 0) | (pdy > 2 * D)
                    | (pdz < 0) | (pdz > 2 * D)
                ) & ~oob4 & (~doomed & active)[:, None, None, None]
                overflow = jnp.any(wobble)

                def _lat(_):
                    eblk = jax.vmap(
                        lambda cw, z0, y0, x0: jax.lax.dynamic_slice(
                            cw, (z0, y0, x0), (elz, ely, elx)))(
                        cwin_p, bz0, by0, bx0)
                    val = lattice_eval(
                        eblk, pdz, pdy, pdx, fz, fy, fx,
                        d_wobble=D, slab=None, interpret=interp)
                    return jnp.where(oob4, f32(-1.0), val).reshape(n, s)

                def _fallback(_):
                    # Exact path: global-volume eval (bit-identical to the
                    # tile path for in-window samples) with the same
                    # window-exit -3 semantics imposed via the oob mask.
                    tval, _unused = bspline.tricubic_eval(
                        tar_coeff, gxc, gyc, gzc)
                    return jnp.where(oob, f32(-1.0), tval)

                return jax.lax.cond(overflow, _fallback, _lat, 0)
    else:
        def eval_tar(gxc, gyc, gzc, active):
            tval, _ = bspline.tricubic_eval(tar_coeff, gxc, gyc, gzc)
            return tval

    def body(state):
        wmat, active, it, dpn, znssd, oob_fail = state
        # Warp local grid: [N, 3] rows of the 4x4 matrix applied to (x,y,z,1).
        wx = (
            wmat[:, 0, 0, None] * xl + wmat[:, 0, 1, None] * yl
            + wmat[:, 0, 2, None] * zl + wmat[:, 0, 3, None]
        )
        wy = (
            wmat[:, 1, 0, None] * xl + wmat[:, 1, 1, None] * yl
            + wmat[:, 1, 2, None] * zl + wmat[:, 1, 3, None]
        )
        wz = (
            wmat[:, 2, 0, None] * xl + wmat[:, 2, 1, None] * yl
            + wmat[:, 2, 2, None] * zl + wmat[:, 2, 3, None]
        )
        gxc = xs[:, None] + wx
        gyc = ys[:, None] + wy
        gzc = zs[:, None] + wz
        tval = eval_tar(gxc, gyc, gzc, active)
        fail_any = jnp.any(tval < 0.0, axis=1)
        if z_guard_lo is not None:
            fail_any = fail_any | jnp.any(
                (gzc < z_guard_lo) | (gzc >= z_guard_hi), axis=1)
        fail_now = fail_any & active

        tar_mean = jnp.mean(tval, axis=1, keepdims=True)
        tar_zm = tval - tar_mean
        tn = jnp.sqrt(jnp.sum(tar_zm * tar_zm, axis=1))
        err = tar_zm * (rn / tn)[:, None] - ref_zm
        znssd_new = jnp.sum(err * err, axis=1) / (rn * rn)
        num = jnp.einsum("nsi,ns->ni", sd, err)
        dp = jnp.einsum("nij,nj->ni", hinv, num)
        winc = warp_ops.warp3d1_from_p(dp)
        wmat_new = wmat @ linalg_ops.inv_small(winc)
        # 3D convergence norm uses displacements only (oc_icgn.cpp:1445).
        dpn_new = jnp.sqrt(
            dp[:, 0] ** 2 + dp[:, 4] ** 2 + dp[:, 8] ** 2
        )

        step = active & ~fail_now
        wmat = jnp.where(step[:, None, None], wmat_new, wmat)
        znssd = jnp.where(step, znssd_new, znssd)
        dpn = jnp.where(step, dpn_new, dpn)
        it = jnp.where(step, it + 1.0, it)
        oob_fail = oob_fail | fail_now
        active = step & (dpn >= conv) & (it < max_iter)
        return wmat, active, it, dpn, znssd, oob_fail

    zf = jnp.zeros_like(xs)  # derived from inputs: sharding-varying under shard_map
    state0 = (
        wmat0,
        valid,
        zf,
        zf,
        zf,
        valid & ~valid,
    )
    wmat, _, it, dpn, znssd, oob_fail = jax.lax.while_loop(
        lambda st: jnp.any(st[1]), body, state0
    )

    computed = valid & ~oob_fail
    p_new = warp_ops.p_from_warp3d1(wmat)
    zncc = 0.5 * (2.0 - znssd)
    zncc = jnp.where((dpn >= conv) & (it >= max_iter), f32(-4.0), zncc)
    isnan = (
        jnp.isnan(zncc)
        | jnp.isnan(p_new[:, 0])
        | jnp.isnan(p_new[:, 4])
        | jnp.isnan(p_new[:, 8])
    )
    zncc = jnp.where(isnan, f32(-5.0), zncc)
    p_new = p_new.at[:, 0].set(jnp.where(isnan, u_in, p_new[:, 0]))
    p_new = p_new.at[:, 4].set(jnp.where(isnan, v_in, p_new[:, 4]))
    p_new = p_new.at[:, 8].set(jnp.where(isnan, w_in, p_new[:, 8]))

    p_out = jnp.where(computed[:, None], p_new, p_in)
    zncc_guard = jnp.where(zncc_in >= 0, f32(-3.0), zncc_in)
    zncc_out = jnp.where(valid, jnp.where(oob_fail, f32(-3.0), zncc), zncc_guard)
    return p_out, u_in, v_in, w_in, zncc_out, it, dpn, computed
