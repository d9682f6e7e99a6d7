"""Batched FFT-accelerated zero-mean cross-correlation (integer-pixel initial
guess).

Reference: ``oc_fftcc.cpp`` — per POI, a 2rx x 2ry (x 2rz) window is filled from
the reference image at the POI and from the target image displaced by the
existing initial guess (so FFTCC can be chained after another stage,
oc_fftcc.cpp:187-219); both windows are zero-meaned (:225-231); the conjugate
spectral product conj(R).T is inverted (:237-243); the argmax of the circular
correlation is unwrapped to a signed displacement (:246-266); ZNCC =
peak / (|ref| |tar|) (:274, FFTW's unnormalized inverse cancels the window-size
factor).  POIs whose window would cross the image edge are silently skipped
(:190-196; deformation left unchanged).

TPU design: all windows are gathered at once into [N, 2ry, 2rx] and a single
batched rfft2/irfft2 handles the queue — the FFTW per-thread plan pool
(oc_fftcc.cpp:21-46) is replaced by XLA's batched FFT.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(None)
def _dft_mat(s: int) -> np.ndarray:
    """Symmetric s-point DFT matrix (complex64)."""
    j = np.arange(s)
    return np.exp(-2j * np.pi * np.outer(j, j) / s).astype(np.complex64)


def _circ_corr2d(ref_zm: jnp.ndarray, tar_zm: jnp.ndarray) -> jnp.ndarray:
    """Normalized circular cross-correlation surface via DFT MATMULS.

    Round-5 device profiling found ``jnp.fft.irfft2`` MISCOMPILED on this
    stack whenever its consumer wants the flattened layout: 934 of 1024
    bins of a 32x32 surface came back up to 11% wrong (deterministic,
    layout-dependent — the [N, 32, 32]-shaped output of the SAME graph is
    1e-7-exact, and lax.optimization_barrier does not help because layouts
    propagate through it).  This corruption is what made the f32 argmax
    disagree with the reference for ~3% of flagship POIs — previously
    misattributed to FFT rounding and patched by the integer re-rank.
    DFT matmuls sidestep the fft lowering entirely, run on the MXU, and
    support any window size; f32 error vs an f64 FFT is ~1e-6 relative.
    """
    wh, ww = ref_zm.shape[-2:]
    c64 = jnp.complex64
    wy = jnp.asarray(_dft_mat(wh))
    wx = jnp.asarray(_dft_mat(ww))

    def dft2(a):
        f = jnp.einsum("ab,nbc->nac", wy, a.astype(c64))
        return jnp.einsum("nac,cd->nad", f, wx)  # W symmetric

    cf = jnp.conj(dft2(ref_zm)) * dft2(tar_zm)
    inv = jnp.einsum("ab,nbc->nac", jnp.conj(wy), cf)
    inv = jnp.einsum("nac,cd->nad", inv, jnp.conj(wx))
    return jnp.real(inv) / (wh * ww)


def _circ_corr3d(ref_zm: jnp.ndarray, tar_zm: jnp.ndarray) -> jnp.ndarray:
    """3D analogue of _circ_corr2d (same miscompile avoidance)."""
    wd, wh, ww = ref_zm.shape[-3:]
    c64 = jnp.complex64
    wz = jnp.asarray(_dft_mat(wd))
    wy = jnp.asarray(_dft_mat(wh))
    wx = jnp.asarray(_dft_mat(ww))

    def dft3(a):
        f = jnp.einsum("ab,nbcd->nacd", wz, a.astype(c64))
        f = jnp.einsum("cb,nabd->nacd", wy, f)
        return jnp.einsum("db,nacb->nacd", wx, f)

    cf = jnp.conj(dft3(ref_zm)) * dft3(tar_zm)
    inv = jnp.einsum("ab,nbcd->nacd", jnp.conj(wz), cf)
    inv = jnp.einsum("cb,nabd->nacd", jnp.conj(wy), inv)
    inv = jnp.einsum("db,nacb->nacd", jnp.conj(wx), inv)
    return jnp.real(inv) / (wd * wh * ww)


def _slice2d(img, y0, x0, sh, sw):
    return jax.lax.dynamic_slice(img, (y0, x0), (sh, sw))


def _slice3d(vol, z0, y0, x0, sz, sy, sx):
    return jax.lax.dynamic_slice(vol, (z0, y0, x0), (sz, sy, sx))


@functools.partial(jax.jit, static_argnames=("rx", "ry"))
def fftcc2d(
    ref_img: jnp.ndarray,
    tar_img: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    u_in: jnp.ndarray,
    v_in: jnp.ndarray,
    *,
    rx: int,
    ry: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (u, v, zncc, valid); invalid POIs keep their inputs."""
    h, w = ref_img.shape
    n = xs.shape[0]
    ww, wh = 2 * rx, 2 * ry

    xi = xs.astype(jnp.int32)  # (int)poi->x — C truncation
    yi = ys.astype(jnp.int32)
    txi = (xs + u_in).astype(jnp.int32)  # int(poi->x + u)
    tyi = (ys + v_in).astype(jnp.int32)

    # Boundary guard (oc_fftcc.cpp:190-196).
    valid = (
        (xi >= rx) & (xi < w - rx) & (yi >= ry) & (yi < h - ry)
        & (txi >= rx) & (txi < w - rx) & (tyi >= ry) & (tyi < h - ry)
    )

    rx0 = jnp.clip(xi - rx, 0, w - ww)
    ry0 = jnp.clip(yi - ry, 0, h - wh)
    tx0 = jnp.clip(txi - rx, 0, w - ww)
    ty0 = jnp.clip(tyi - ry, 0, h - wh)

    if jax.default_backend() == "tpu":
        from .pallas_gather2d import gather_windows_2d

        ref_w = gather_windows_2d(ref_img, ry0, rx0, sh=wh, sw=ww)
        tar_w = gather_windows_2d(tar_img, ty0, tx0, sh=wh, sw=ww)
    else:
        gather = jax.vmap(_slice2d, in_axes=(None, 0, 0, None, None))
        ref_w = gather(ref_img, ry0, rx0, wh, ww)  # [N, wh, ww]
        tar_w = gather(tar_img, ty0, tx0, wh, ww)

    ref_zm = ref_w - jnp.mean(ref_w, axis=(1, 2), keepdims=True)
    tar_zm = tar_w - jnp.mean(tar_w, axis=(1, 2), keepdims=True)
    ref_norm = jnp.sum(ref_zm * ref_zm, axis=(1, 2))
    tar_norm = jnp.sum(tar_zm * tar_zm, axis=(1, 2))

    corr = _circ_corr2d(ref_zm, tar_zm)  # [N, wh, ww]

    flat = corr.reshape(n, wh * ww)
    idx = jnp.argmax(flat, axis=1)

    # Exact peak re-rank: near-tie peaks can flip vs the reference's FFTW
    # argmax (f32 noise ~1e-6 relative on an accurate surface; note the
    # historical "~3% flips" were the _circ_corr2d-documented irfft2
    # MISCOMPILE, not FFT rounding).  The true argmax is recoverable
    # exactly for 8-bit images: over the circular window the zero-mean
    # correction -S*mean_r*mean_t is shift-independent, so argmax_d
    # corr_zm[d] = argmax_d sum(R * T_shift_d), an integer
    # <= 2rx*2ry*255^2 < 2^31 that int32 computes exactly.  Re-evaluate
    # the top-16 f32 candidates with the exact integer sum; exact ties
    # take the first flat index in scan order, matching the reference's
    # strict-> first-max loop (oc_fftcc.cpp:246-255).  Non-integral images
    # keep the f32 argmax.  Measured vs the oht_cfrp_4 golden u0/v0 on
    # TPU with the DFT-matmul surface: 99.97% exact match with the gated
    # re-rank below (vs 99.99% re-ranking everything at ~10 s of device
    # time — the residual is FFTW-side rounding on true near-ties).
    ri = jnp.round(ref_w)
    ti = jnp.round(tar_w)
    is_int = (
        jnp.all(ref_w == ri, axis=(1, 2)) & jnp.all(tar_w == ti, axis=(1, 2))
    )
    # Range guard: the exact path needs max|R|*max|T|*S < 2^31 (8-bit images
    # give 1024*255^2 ~ 2^26; a 16-bit integral image would overflow int32
    # and silently corrupt the argmax — fall back to the f32 peak there).
    cap = (
        jnp.max(jnp.abs(ri), axis=(1, 2))
        * jnp.max(jnp.abs(ti), axis=(1, 2))
        * (wh * ww)
    )
    is_int = is_int & (cap < 0.99 * 2.0**31)
    ri_flat = ri.reshape(n, wh * ww).astype(jnp.int32)
    ti_flat = ti.reshape(n, wh * ww).astype(jnp.int32)
    topv, cand = jax.lax.top_k(flat, 16)  # [N, 16], first-occurrence ties
    yy, xx = jnp.divmod(jnp.arange(wh * ww, dtype=jnp.int32), ww)

    def _rerank(ri_b, ti_b, cand_b):
        """Exact int32 scores of the 16 candidates ([B, S] operands)."""
        scores = []
        for j in range(16):
            dv_j = (cand_b[:, j] // ww).astype(jnp.int32)
            du_j = (cand_b[:, j] % ww).astype(jnp.int32)
            src = ((yy[None, :] + dv_j[:, None]) % wh) * ww + (
                (xx[None, :] + du_j[:, None]) % ww
            )
            tg = jnp.take_along_axis(ti_b, src, axis=1)
            scores.append(jnp.sum(ri_b * tg, axis=1))
        scores = jnp.stack(scores, axis=1)  # [B, 16] exact int32
        best = jnp.max(scores, axis=1, keepdims=True)
        return jnp.min(
            jnp.where(scores == best, cand_b, wh * ww), axis=1)

    # The shifted-window gathers run at ~1 element/cycle on TPU — the full
    # 16-candidate re-rank over a 30k queue cost ~10 s of REAL device time
    # (round-5 jax.profiler; this WAS the FFTCC stage).  Only near-tie
    # peaks can flip (f32 FFT noise is ~1e-6 relative), so re-rank a
    # COMPACTED subset of POIs whose top-2 gap is under a 1e-3-relative
    # safety margin (1000x the noise bound); clear winners keep the f32
    # argmax, which the exact score then provably agrees with.  If more
    # than the cap are near ties, escalate to the full re-rank (correct,
    # just slow).
    from .sift2d import _compact

    near_tie = (topv[:, 0] - topv[:, 1]) <= 3e-3 * jnp.maximum(
        jnp.abs(topv[:, 0]), 1e-20)
    need = is_int & near_tie
    n_need = jnp.sum(need)
    # near-tie counts on the oht flagship pair (accurate DFT surface):
    # 187 @ 1e-3, 585 @ 3e-3, 1028 @ 5e-3 — the 3e-3 gate under an n/16
    # cap keeps seed parity at 99.99% without ever escalating there
    capf = min(n, max(256, n // 16))

    def _gated(i0):
        idx_r, okr = _compact(need, capf)
        ex = _rerank(ri_flat[idx_r], ti_flat[idx_r], cand[idx_r])
        ex = jnp.where(okr, ex, i0[idx_r])
        return i0.at[idx_r].set(ex.astype(i0.dtype))

    def _full(i0):
        return jnp.where(is_int,
                         _rerank(ri_flat, ti_flat, cand).astype(i0.dtype),
                         i0)

    idx = jax.lax.cond(n_need > 0, _gated, lambda i0: i0, idx)
    idx = jax.lax.cond(n_need > capf, _full, lambda i0: i0, idx)

    peak = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
    du = (idx % ww).astype(jnp.int32)
    dv = (idx // ww).astype(jnp.int32)
    du = jnp.where(du > rx, du - ww, du)
    dv = jnp.where(dv > ry, dv - wh, dv)

    u_out = du.astype(jnp.float32) + u_in
    v_out = dv.astype(jnp.float32) + v_in
    # numpy's normalized irfft2 already divides by the window size, so
    # ZNCC = peak / sqrt(ref_norm * tar_norm) (cf. oc_fftcc.cpp:274 where the
    # unnormalized FFTW inverse needs the explicit / subset_size).
    zncc = peak / jnp.sqrt(ref_norm * tar_norm)

    return (
        jnp.where(valid, u_out, u_in),
        jnp.where(valid, v_out, v_in),
        zncc,
        valid,
    )


@functools.partial(jax.jit, static_argnames=("rx", "ry", "rz"))
def fftcc3d(
    ref_vol: jnp.ndarray,
    tar_vol: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    zs: jnp.ndarray,
    u_in: jnp.ndarray,
    v_in: jnp.ndarray,
    w_in: jnp.ndarray,
    *,
    rx: int,
    ry: int,
    rz: int,
):
    """3D FFTCC (oc_fftcc.cpp:327-427). Returns (u, v, w, zncc, valid).

    The reference 3D path has no boundary guard; one is added here (windows that
    would cross the volume edge are skipped like the 2D path) since a clamped
    gather would silently correlate wrong data.

    Like the 2D path, integral-valued volumes get an exact integer re-rank of
    the top-8 f32 correlation peaks so the argmax is TPU-deterministic.  The
    window integer correlation reaches (2r)^3 * 255^2 (~1.4e10 at r=30), past
    int32 — so each product is split hi/lo (p = 256*(p>>8) + (p&0xFF), exact
    in two's complement) and the two partial sums, each bounded by
    V * 255 < 2^31 for any window under ~8.4M voxels, are compared
    lexicographically after carry normalization.  Exact ties take the first
    flat index in scan order (oc_fftcc.cpp's strict-> first-max loop).
    """
    dz, dy, dx = ref_vol.shape
    n = xs.shape[0]
    wx, wy, wz = 2 * rx, 2 * ry, 2 * rz

    xi = xs.astype(jnp.int32)
    yi = ys.astype(jnp.int32)
    zi = zs.astype(jnp.int32)
    txi = (xs + u_in).astype(jnp.int32)
    tyi = (ys + v_in).astype(jnp.int32)
    tzi = (zs + w_in).astype(jnp.int32)

    valid = (
        (xi >= rx) & (xi < dx - rx) & (yi >= ry) & (yi < dy - ry)
        & (zi >= rz) & (zi < dz - rz)
        & (txi >= rx) & (txi < dx - rx) & (tyi >= ry) & (tyi < dy - ry)
        & (tzi >= rz) & (tzi < dz - rz)
    )

    rx0 = jnp.clip(xi - rx, 0, dx - wx)
    ry0 = jnp.clip(yi - ry, 0, dy - wy)
    rz0 = jnp.clip(zi - rz, 0, dz - wz)
    tx0 = jnp.clip(txi - rx, 0, dx - wx)
    ty0 = jnp.clip(tyi - ry, 0, dy - wy)
    tz0 = jnp.clip(tzi - rz, 0, dz - wz)

    gather = jax.vmap(_slice3d, in_axes=(None, 0, 0, 0, None, None, None))
    ref_w = gather(ref_vol, rz0, ry0, rx0, wz, wy, wx)  # [N, wz, wy, wx]
    tar_w = gather(tar_vol, tz0, ty0, tx0, wz, wy, wx)

    ref_zm = ref_w - jnp.mean(ref_w, axis=(1, 2, 3), keepdims=True)
    tar_zm = tar_w - jnp.mean(tar_w, axis=(1, 2, 3), keepdims=True)
    ref_norm = jnp.sum(ref_zm * ref_zm, axis=(1, 2, 3))
    tar_norm = jnp.sum(tar_zm * tar_zm, axis=(1, 2, 3))

    corr = _circ_corr3d(ref_zm, tar_zm)

    flat = corr.reshape(n, wz * wy * wx)
    idx = jnp.argmax(flat, axis=1)

    # Exact hi/lo-int32 peak re-rank (see docstring; 2D twin above).
    v = wz * wy * wx
    ri = jnp.round(ref_w)
    ti = jnp.round(tar_w)
    is_int = (
        jnp.all(ref_w == ri, axis=(1, 2, 3))
        & jnp.all(tar_w == ti, axis=(1, 2, 3))
    )
    # Partial-sum range guard: V * (max|p|/256 + 1) bounds the hi sum, and
    # V * 255 bounds the lo sum regardless of cap (negative products leave
    # p & 0xFF up to 255 even when cap is small) — both must stay in int32.
    cap = jnp.max(jnp.abs(ri), axis=(1, 2, 3)) * jnp.max(
        jnp.abs(ti), axis=(1, 2, 3))
    is_int = is_int & (v * (cap / 256.0 + 1.0) < 0.99 * 2.0**31)
    is_int = is_int & (v * 255.0 < 0.99 * 2.0**31)
    ri_flat = ri.reshape(n, v).astype(jnp.int32)
    ti_flat = ti.reshape(n, v).astype(jnp.int32)
    _, cand = jax.lax.top_k(flat, 8)  # [N, 8]
    lin = jnp.arange(v, dtype=jnp.int32)
    zz = lin // (wy * wx)
    yy = (lin // wx) % wy
    xx = lin % wx
    his, los = [], []
    for j in range(8):
        dw_j = (cand[:, j] // (wx * wy)).astype(jnp.int32)
        dv_j = ((cand[:, j] // wx) % wy).astype(jnp.int32)
        du_j = (cand[:, j] % wx).astype(jnp.int32)
        src = (
            ((zz[None, :] + dw_j[:, None]) % wz) * (wy * wx)
            + ((yy[None, :] + dv_j[:, None]) % wy) * wx
            + ((xx[None, :] + du_j[:, None]) % wx)
        )
        tg = jnp.take_along_axis(ti_flat, src, axis=1)
        p = ri_flat * tg  # |p| <= 255^2 < 2^31
        hi = jnp.sum(p >> 8, axis=1)
        lo = jnp.sum(p & 0xFF, axis=1)
        his.append(hi + (lo >> 8))  # carry-normalize: lo in [0, 255]
        los.append(lo & 0xFF)
    his = jnp.stack(his, axis=1)  # [N, 8]
    los = jnp.stack(los, axis=1)
    best_hi = jnp.max(his, axis=1, keepdims=True)
    sel1 = his == best_hi
    best_lo = jnp.max(jnp.where(sel1, los, jnp.int32(-(2**31))), axis=1,
                      keepdims=True)
    sel = sel1 & (los == best_lo)
    idx_exact = jnp.min(jnp.where(sel, cand, v), axis=1).astype(idx.dtype)
    idx = jnp.where(is_int, idx_exact, idx)

    peak = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
    du = (idx % wx).astype(jnp.int32)
    dv = ((idx // wx) % wy).astype(jnp.int32)
    dw = (idx // (wx * wy)).astype(jnp.int32)
    du = jnp.where(du > rx, du - wx, du)
    dv = jnp.where(dv > ry, dv - wy, dv)
    dw = jnp.where(dw > rz, dw - wz, dw)

    u_out = du.astype(jnp.float32) + u_in
    v_out = dv.astype(jnp.float32) + v_in
    w_out = dw.astype(jnp.float32) + w_in
    zncc = peak / jnp.sqrt(ref_norm * tar_norm)

    return (
        jnp.where(valid, u_out, u_in),
        jnp.where(valid, v_out, v_in),
        jnp.where(valid, w_out, w_in),
        zncc,
        valid,
    )
