"""Cubic B-spline interpolation (bicubic 2D, tricubic 3D).

2D — implementation of Z. Pan et al., TAML 6(3):126-130 (2016), matching the
reference's per-pixel 4x4 coefficient LUT (``oc_cubic_bspline.cpp:84-132``):
for each interior pixel, the 4x4 grayscale neighborhood Q is mapped to the
polynomial coefficient matrix C = flip(BC . Q . BC^T) where BC is the fixed
basis*control matrix (``oc_cubic_bspline.h:52-58``); a query then evaluates the
bivariate cubic polynomial sum_{k,l} C[k,l] * yd^k * xd^l
(``oc_cubic_bspline.cpp:134-181``).  Out-of-range queries (x<1, y<1, x>=W-2,
y>=H-2, or NaN) return the -1.0 sentinel the refinement kernels use to detect
out-of-bounds warps (``oc_cubic_bspline.cpp:137-141``).

On TPU the LUT is one einsum over 16 shifted copies of the image, stored as
[H, W, 4, 4] so each query gathers one contiguous 64-byte tile; evaluation is a
power-basis einsum that XLA fuses with the gather.

3D — implementation of J. Yang et al., OLEN 136:106323 (2021): a global
separable 15-tap symmetric prefilter along x, y, z with edge clamping (taps
``oc_cubic_bspline.h:80-90``, loops ``oc_cubic_bspline.cpp:214-351``), then a
4x4x4 basis-function evaluation per query (``oc_cubic_bspline.cpp:353-405``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.precision import highest_precision

# Layout note (measured on v5e): a "flat-16" variant of the bicubic gather
# (linear-index gather from [H*W, 16], like the tricubic flat-64 fix) OOMs —
# XLA materializes the [N*1089, 16] gather output padded 8x to 128 lanes
# (15.6 GB at 30k POIs), whereas the [..., 4, 4] tile gather below fuses into
# the einsum without materializing and the fused ICGN kernel already reaches
# ~82% of fp32 MXU peak by XLA's cost model.  Do not revisit.

# BC = B * C from oc_cubic_bspline.h:52-58.
BC_MATRIX = np.array(
    [
        [-144.0 / 336.0, 384.0 / 336.0, -384.0 / 336.0, 144.0 / 336.0],
        [342.0 / 336.0, -702.0 / 336.0, 450.0 / 336.0, -90.0 / 336.0],
        [-198.0 / 336.0, -18.0 / 336.0, 270.0 / 336.0, -54.0 / 336.0],
        [0.0, 1.0, 0.0, 0.0],
    ],
    dtype=np.float32,
)

# Symmetric prefilter taps b0..b7 from oc_cubic_bspline.h:80-90.
BSPLINE_PREFILTER = np.array(
    [
        1.732176555412860,
        -0.464135309171000,
        0.124364681271139,
        -0.033323415913556,
        0.008928982383084,
        -0.002392513618779,
        0.000641072092032,
        -0.000171774749350,
    ],
    dtype=np.float32,
)


def _below(bound: int) -> np.float32:
    """Largest float32 strictly below ``bound`` (a static Python int).

    Used as the upper clip for in-range samples: the range guards exclude
    x >= bound, so every unmasked sample is < bound and the clip must not
    perturb its fractional part (the old ``bound - 0.001`` clip shifted
    samples in (bound-0.001, bound), contradicting reference parity in that
    band — advisor round 4)."""
    return np.nextafter(np.float32(bound), np.float32(0.0))


@highest_precision
def bicubic_prepare(img: jnp.ndarray) -> jnp.ndarray:
    """Build the [H, W, 4, 4] coefficient LUT (oc_cubic_bspline.cpp:84-132).

    Border pixels (r<1, r>=H-2, c<1, c>=W-2) keep zero coefficients exactly as
    the reference leaves them unset; queries never touch them (range guard).
    """
    h, w = img.shape
    bc = jnp.asarray(BC_MATRIX)
    # q[r, c, n, m] = img[r-1+n, c-1+m] for the interior; build via shifts.
    interior = jnp.zeros((h, w, 4, 4), jnp.float32)
    # Stack 16 shifted views of the valid region r in [1, h-3], c in [1, w-3].
    rows = []
    for n in range(4):
        cols = []
        for m in range(4):
            cols.append(img[n : n + h - 3, m : m + w - 3])
        rows.append(jnp.stack(cols, axis=-1))
    q = jnp.stack(rows, axis=-2)  # [h-3, w-3, 4(n), 4(m)]
    # mat_p[k, l] = sum_{m,n} BC[l, m] * BC[k, n] * q[n, m]  (cpp:108-120)
    p = jnp.einsum("kn,hwnm,lm->hwkl", bc, q, bc)
    # coefficient[k][l] = mat_p[3-k][3-l]  (cpp:123-129)
    p = p[:, :, ::-1, ::-1]
    return interior.at[1 : h - 2, 1 : w - 2].set(p)


@highest_precision
def bicubic_eval(lut: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray):
    """Evaluate the bicubic spline at float coords.

    Returns ``(value, oob)`` where oob marks queries outside the interpolatable
    range; their value is the reference's -1.0 sentinel
    (oc_cubic_bspline.cpp:134-181).
    """
    h, w = lut.shape[:2]
    oob = (
        (xs < 1)
        | (ys < 1)
        | (xs >= w - 2)
        | (ys >= h - 2)
        | jnp.isnan(xs)
        | jnp.isnan(ys)
    )
    # Clip to just below the range guard (largest f32 < w-2): a sample in
    # [nextafter(w-2), w-2) passes the guard and must evaluate at its exact
    # fractional part like the reference's unclipped eval
    # (oc_cubic_bspline.cpp:137-181); the clip only sanitizes masked samples.
    xq = jnp.clip(xs, 1.0, _below(w - 2))
    yq = jnp.clip(ys, 1.0, _below(h - 2))
    xi = jnp.floor(xq).astype(jnp.int32)
    yi = jnp.floor(yq).astype(jnp.int32)
    xd = xq - xi.astype(jnp.float32)
    yd = yq - yi.astype(jnp.float32)
    one = jnp.ones_like(xd)
    px = jnp.stack([one, xd, xd * xd, xd * xd * xd], axis=-1)
    py = jnp.stack([one, yd, yd * yd, yd * yd * yd], axis=-1)
    c = lut[yi, xi]  # [..., 4, 4] — one 64B tile per query
    val = jnp.einsum("...kl,...k,...l->...", c, py, px)
    return jnp.where(oob, jnp.float32(-1.0), val), oob


def _prefilter_axis(vol: jnp.ndarray, axis: int) -> jnp.ndarray:
    """15-tap symmetric convolution with edge clamping along one axis
    (oc_cubic_bspline.cpp:223-351).

    The reference clamps only the *outward* side of the stencil near each
    boundary (``getHigh(k-t, 0)`` at the low edge, ``getLow(k+t, dim-1)`` at the
    high edge) and never both — mirrored here by clamping the shifted index
    arrays, which is exactly equivalent because for interior points no clamp
    fires.
    """
    taps = jnp.asarray(BSPLINE_PREFILTER)
    n = vol.shape[axis]
    idx = jnp.arange(n)
    out = taps[0] * vol
    for t in range(1, 8):
        lo = jnp.clip(idx - t, 0, n - 1)
        hi = jnp.clip(idx + t, 0, n - 1)
        out = out + taps[t] * (
            jnp.take(vol, lo, axis=axis) + jnp.take(vol, hi, axis=axis)
        )
    return out


@highest_precision
def tricubic_prepare(vol: jnp.ndarray) -> jnp.ndarray:
    """Prefiltered coefficient volume [Z, Y, X] (oc_cubic_bspline.cpp:214-351).

    Axis order matches the reference: x first, then y, then z.
    """
    coeff = _prefilter_axis(vol, axis=2)
    coeff = _prefilter_axis(coeff, axis=1)
    coeff = _prefilter_axis(coeff, axis=0)
    return coeff


def _basis(d: jnp.ndarray) -> jnp.ndarray:
    """Cubic B-spline basis functions stacked on the last axis
    (oc_cubic_bspline.cpp:35-53)."""
    b0 = (1.0 / 6.0) * (d * (d * (-d + 3.0) - 3.0) + 1.0)
    b1 = (1.0 / 6.0) * (d * d * (3.0 * d - 6.0) + 4.0)
    b2 = (1.0 / 6.0) * (d * (d * (-3.0 * d + 3.0) + 3.0) + 1.0)
    b3 = (1.0 / 6.0) * (d * d * d)
    return jnp.stack([b0, b1, b2, b3], axis=-1)


@highest_precision
def tricubic_eval(coeff: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray,
                  zs: jnp.ndarray):
    """Evaluate the tricubic spline at float coords; -1 sentinel outside
    [1, dim-2) on any axis (oc_cubic_bspline.cpp:353-405).

    Large sample batches are evaluated in slabs under a lax.map: the 64-tap
    gather materializes [P, 64] f32 — at DVC CT scale (a 250-POI ICGN chunk
    is P = 9M warped samples PER Gauss-Newton iteration) that is a 2.3 GB
    transient which, scheduled alongside the iteration's other buffers,
    OOM-faulted the v5e (the fault only surfaced at the next readback)."""
    size = 1
    for d in xs.shape:
        size *= d
    slab = 1 << 20
    if size > 2 * slab:
        shp = xs.shape
        pad = -size % slab
        flat = lambda a: jnp.pad(a.reshape(-1), (0, pad)).reshape(-1, slab)
        vals, oobs = jax.lax.map(
            lambda t: _tricubic_eval_impl(coeff, *t),
            (flat(xs), flat(ys), flat(zs)))
        return (vals.reshape(-1)[:size].reshape(shp),
                oobs.reshape(-1)[:size].reshape(shp))
    return _tricubic_eval_impl(coeff, xs, ys, zs)


@highest_precision
def tricubic_eval_windowed(cwin: jnp.ndarray, lx: jnp.ndarray,
                           ly: jnp.ndarray, lz: jnp.ndarray,
                           oob_extra: jnp.ndarray):
    """Tricubic eval against per-POI coefficient windows.

    ``cwin``: [N, swz, swy, swx] window slices of the prefiltered coefficient
    volume; ``lx/ly/lz``: [N, S] sample coords LOCAL to each window;
    ``oob_extra``: [N, S] out-of-range override (the caller's global-volume
    range guard).  Returns (val, oob) with the reference's -1 sentinel.

    Why windows: evaluating DVC subsets through the global coefficient
    volume is a huge-operand gather (64 scattered taps x 9M samples per
    250-POI Gauss-Newton iteration at CT scale) that TPUs run at ~2.5M
    samples/s; per-POI windows keep each gather operand VMEM-sized —
    measured 17.6x faster for the same taps.  Samples outside their window
    read as out-of-range (-1 sentinel); the caller sizes the margin so that
    only happens for diverging subsets (models/icgn.py ICGN3D1).
    """
    n, swz, swy, swx = cwin.shape
    s = lx.shape[1]
    oob = (
        (lx < 1) | (ly < 1) | (lz < 1)
        | (lx >= swx - 2) | (ly >= swy - 2) | (lz >= swz - 2)
        | jnp.isnan(lx) | jnp.isnan(ly) | jnp.isnan(lz)
        | oob_extra
    )
    xq = jnp.clip(lx, 1.0, _below(swx - 2))
    yq = jnp.clip(ly, 1.0, _below(swy - 2))
    zq = jnp.clip(lz, 1.0, _below(swz - 2))
    xi = jnp.floor(xq).astype(jnp.int32)
    yi = jnp.floor(yq).astype(jnp.int32)
    zi = jnp.floor(zq).astype(jnp.int32)
    bx = _basis(xq - xi.astype(jnp.float32))
    by = _basis(yq - yi.astype(jnp.float32))
    bz = _basis(zq - zi.astype(jnp.float32))
    flat = cwin.reshape(n, swz * swy * swx)
    off = jnp.arange(-1, 3)

    def eval_block(xi_c, yi_c, zi_c, bx_c, by_c, bz_c):
        blk = xi_c.shape[1]
        lin = (
            ((zi_c[..., None] + off)[..., :, None, None] * swy
             + (yi_c[..., None] + off)[..., None, :, None]) * swx
            + (xi_c[..., None] + off)[..., None, None, :]
        ).reshape(n, blk * 64)
        # flat-64 trailing axes only: rank-5 [.., 4, 4, 4] tensors get their
        # last dims tile-padded to (8, 128) — a 32x memory blowup
        nb = jnp.take_along_axis(flat, lin, axis=1).reshape(n, blk, 64)
        w = (bz_c[..., :, None, None] * by_c[..., None, :, None]
             * bx_c[..., None, None, :]).reshape(n, blk, 64)
        return jnp.sum(nb * w, axis=-1)

    # Slab the sample axis so the [N, s_slab, 64] gather transient stays
    # bounded (~64M gathered elements = 256 MB f32 per slab).
    slab = max(256, (1 << 26) // 64 // max(n, 1))
    if s > 2 * slab:
        pad = -s % slab
        nsl = (s + pad) // slab

        def sl(a, fill=0):
            a = jnp.pad(a, ((0, 0), (0, pad)) + ((0, 0),) * (a.ndim - 2),
                        constant_values=fill)
            return jnp.moveaxis(
                a.reshape((n, nsl, slab) + a.shape[2:]), 1, 0)

        vals = jax.lax.map(
            lambda t: eval_block(*t),
            (sl(xi), sl(yi), sl(zi), sl(bx), sl(by), sl(bz)))
        val = jnp.moveaxis(vals, 0, 1).reshape(n, -1)[:, :s]
    else:
        val = eval_block(xi, yi, zi, bx, by, bz)
    return jnp.where(oob, jnp.float32(-1.0), val), oob


def tricubic_window_tiles(cwin: jnp.ndarray) -> jnp.ndarray:
    """Expand per-POI coefficient windows into contiguous 64-wide tile LUTs.

    ``cwin``: [N, swz, swy, swx] -> [N, (swz-3)*(swy-3)*(swx-3), 64] where
    row ``((z-1)*(swy-3) + (y-1))*(swx-3) + (x-1)`` holds the flattened
    4x4x4 neighborhood of base voxel (z, y, x), z/y/x in [1, sw-3].

    This is the 3D analog of the 2D engine's per-pixel [H, W, 4, 4] tile LUT
    (oc_cubic_bspline.cpp:84-132 structure): each tricubic query then gathers
    ONE contiguous 256-byte row instead of 64 scattered taps — 64x fewer
    gather indices at 64x window memory, which is only affordable per-window
    (globally it would be 64x the volume).  Built once per ICGN chunk and
    amortized over all Gauss-Newton iterations.
    """
    n, swz, swy, swx = cwin.shape
    tz_n, ty_n, tx_n = swz - 3, swy - 3, swx - 3
    tiles = []
    for tz in range(4):
        for ty in range(4):
            for tx in range(4):
                tiles.append(jax.lax.slice(
                    cwin, (0, tz, ty, tx),
                    (n, tz + tz_n, ty + ty_n, tx + tx_n)))
    return jnp.stack(tiles, axis=-1).reshape(n, tz_n * ty_n * tx_n, 64)


@highest_precision
def tricubic_eval_tiled(w64: jnp.ndarray, sw: tuple, lx: jnp.ndarray,
                        ly: jnp.ndarray, lz: jnp.ndarray,
                        oob: jnp.ndarray):
    """Tricubic eval against per-POI tile LUTs (``tricubic_window_tiles``).

    ``sw``: (swz, swy, swx) original window dims; ``lx/ly/lz``: [N, S]
    window-LOCAL sample coords, pre-sanitized by the caller (finite, any
    value); ``oob``: [N, S] combined out-of-range mask computed BY THE
    CALLER — from the global-volume range guard plus the integer-domain
    window-exit test (see icgn.py) — masked samples return the reference's
    -1 sentinel (oc_cubic_bspline.cpp:353-360).

    The mask is deliberately an input: round 3's windowed wiring computed a
    float range mask on localized coordinates inside the fused GN program
    and hit a reproducible sandbox-TPU miscompile (mask read all-true;
    commit 7e9e2e9).  Here all float comparisons happen on global
    coordinates in the caller (the exact expressions the global path has
    always run on TPU) and the only local-domain test is on int32 floors.

    Because window corners are integers, ``lx - floor(lx)`` is bit-identical
    to the global path's ``x - floor(x)`` (exact f32 subtraction of an
    integer below 2^23), so values match the global eval exactly.
    """
    swz, swy, swx = sw
    n, s = lx.shape
    tz_n, ty_n, tx_n = swz - 3, swy - 3, swx - 3
    # _below, not -2.001: a sample in (swx-2.001, swx-2) passes the caller's
    # integer window-exit test (floor <= swx-3) and must evaluate at its
    # exact fractional part to keep the documented bit-identity with the
    # global path (advisor round 4).
    xq = jnp.clip(lx, 1.0, _below(swx - 2))
    yq = jnp.clip(ly, 1.0, _below(swy - 2))
    zq = jnp.clip(lz, 1.0, _below(swz - 2))
    xi = jnp.floor(xq).astype(jnp.int32)
    yi = jnp.floor(yq).astype(jnp.int32)
    zi = jnp.floor(zq).astype(jnp.int32)
    bx = _basis(xq - xi.astype(jnp.float32))
    by = _basis(yq - yi.astype(jnp.float32))
    bz = _basis(zq - zi.astype(jnp.float32))

    def eval_block(xi_c, yi_c, zi_c, bx_c, by_c, bz_c):
        blk = xi_c.shape[1]
        lin = ((zi_c - 1) * ty_n + (yi_c - 1)) * tx_n + (xi_c - 1)
        nb = jnp.take_along_axis(w64, lin[:, :, None], axis=1)  # [N,blk,64]
        wgt = (bz_c[..., :, None, None] * by_c[..., None, :, None]
               * bx_c[..., None, None, :]).reshape(n, blk, 64)
        return jnp.sum(nb * wgt, axis=-1)

    # Slab the sample axis: the [N, s_slab, 64] gather output is materialized
    # (~2x lane padding), keep it ~256 MB (round-3 OOM lesson).
    slab = max(256, (1 << 26) // 64 // max(n, 1))
    if s > 2 * slab:
        pad = -s % slab
        nsl = (s + pad) // slab

        def sl(a):
            a = jnp.pad(a, ((0, 0), (0, pad)) + ((0, 0),) * (a.ndim - 2))
            return jnp.moveaxis(a.reshape((n, nsl, slab) + a.shape[2:]), 1, 0)

        vals = jax.lax.map(lambda t: eval_block(*t),
                           (sl(xi), sl(yi), sl(zi), sl(bx), sl(by), sl(bz)))
        val = jnp.moveaxis(vals, 0, 1).reshape(n, -1)[:, :s]
    else:
        val = eval_block(xi, yi, zi, bx, by, bz)
    return jnp.where(oob, jnp.float32(-1.0), val)


def _tricubic_eval_impl(coeff, xs, ys, zs):
    dz, dy, dx = coeff.shape
    oob = (
        (xs < 1) | (ys < 1) | (zs < 1)
        | (xs >= dx - 2) | (ys >= dy - 2) | (zs >= dz - 2)
        | jnp.isnan(xs) | jnp.isnan(ys) | jnp.isnan(zs)
    )
    xq = jnp.clip(xs, 1.0, _below(dx - 2))
    yq = jnp.clip(ys, 1.0, _below(dy - 2))
    zq = jnp.clip(zs, 1.0, _below(dz - 2))
    xi = jnp.floor(xq).astype(jnp.int32)
    yi = jnp.floor(yq).astype(jnp.int32)
    zi = jnp.floor(zq).astype(jnp.int32)
    bx = _basis(xq - xi.astype(jnp.float32))  # [..., 4]
    by = _basis(yq - yi.astype(jnp.float32))
    bz = _basis(zq - zi.astype(jnp.float32))
    # Gather the 4x4x4 neighborhood as one flat 64-wide axis via linear
    # indices: a trailing [.., 4, 4, 4] gather gets padded 32x by TPU tiling
    # (last dim 4 vs the 128-lane requirement); a trailing 64 pads only 2x.
    off = jnp.arange(-1, 3)
    zidx = zi[..., None] + off  # [..., 4]
    yidx = yi[..., None] + off
    xidx = xi[..., None] + off
    lin = (
        (zidx[..., :, None, None] * dy + yidx[..., None, :, None]) * dx
        + xidx[..., None, None, :]
    ).reshape(*xs.shape, 64)
    nb = coeff.reshape(-1)[lin]  # [..., 64]
    w = (
        bz[..., :, None, None] * by[..., None, :, None] * bx[..., None, None, :]
    ).reshape(*xs.shape, 64)
    val = jnp.sum(nb * w, axis=-1)
    return jnp.where(oob, jnp.float32(-1.0), val), oob
