"""A/B microbench: tricubic sample-gather layouts for ICGN3D1 at CT scale.

The DVC refine loop is gather-bound (PERF.md "DVC at CT scale"): each
Gauss-Newton iteration evaluates the tricubic spline at N_poi * (2r+1)^3
warped points, 64 taps each.  Candidates:

  A  global volume, scattered flat-64 gather      (ops/bspline._tricubic_eval_impl)
  B  per-POI coefficient windows, flat-64 gather  (ops/bspline.tricubic_eval_windowed)
  C  per-POI windows expanded to a contiguous 64-wide TILE LUT
     (the 3D analog of the 2D engine's [H, W, 4, 4] tile gather,
     oc_cubic_bspline.cpp:84-132 structure): ONE gather index per sample
     reading 64 contiguous floats — 64x fewer indices than A/B at 64x
     window memory (only viable per-window; globally it would be 39 GB)
  W  the per-chunk window slice gather (setup cost for B/C)
  T  the per-chunk tile-LUT build (setup cost for C)

Timing method (this sandbox, CLAUDE.md): `block_until_ready` returns at
ENQUEUE through the axon tunnel — even for single programs here — so each
measurement chains k data-dependent runs and forces ONE scalar readback;
the (k_hi - k_lo) slope across two fresh subprocesses cancels both setup
and tunnel queue-drain constants.  Orchestrate: `python bench_gather_ab.py`.
Single run: `python bench_gather_ab.py run CAND K [N]`.
"""

import json
import subprocess
import sys
import time

import numpy as np

DIMS = (568, 288, 940)  # Torus volume [z, y, x]
R = 16
WIN_MARGIN = 8


def build_inputs(n):
    import jax
    import jax.numpy as jnp

    dz, dy, dx = DIMS
    sw = 2 * (R + WIN_MARGIN) + 1
    side = 2 * R + 1
    s = side ** 3

    key = jax.random.PRNGKey(0)
    kv, kw = jax.random.split(key)
    coeff = jax.random.uniform(kv, DIMS, jnp.float32, 0.0, 255.0)

    rng = np.random.default_rng(0)
    cx = rng.uniform(R + WIN_MARGIN + 2, dx - R - WIN_MARGIN - 3, n)
    cy = rng.uniform(R + WIN_MARGIN + 2, dy - R - WIN_MARGIN - 3, n)
    cz = rng.uniform(R + WIN_MARGIN + 2, dz - R - WIN_MARGIN - 3, n)
    cxd = jnp.asarray(cx, jnp.float32)
    cyd = jnp.asarray(cy, jnp.float32)
    czd = jnp.asarray(cz, jnp.float32)

    loc = np.arange(-R, R + 1, dtype=np.float32)
    zl, yl, xl = np.meshgrid(loc, loc, loc, indexing="ij")
    xl = jnp.asarray(xl.reshape(-1))
    yl = jnp.asarray(yl.reshape(-1))
    zl = jnp.asarray(zl.reshape(-1))
    jit_x = jax.random.uniform(kw, (n, s), jnp.float32, -0.49, 0.49)
    gxc = cxd[:, None] + xl[None, :] + jit_x
    gyc = cyd[:, None] + yl[None, :] + jit_x * 0.7
    gzc = czd[:, None] + zl[None, :] - jit_x * 0.3

    wcx = jnp.floor(cxd).astype(jnp.int32) - (R + WIN_MARGIN)
    wcy = jnp.floor(cyd).astype(jnp.int32) - (R + WIN_MARGIN)
    wcz = jnp.floor(czd).astype(jnp.int32) - (R + WIN_MARGIN)
    lx = gxc - wcx[:, None].astype(jnp.float32)
    ly = gyc - wcy[:, None].astype(jnp.float32)
    lz = gzc - wcz[:, None].astype(jnp.float32)
    no_oob = jnp.zeros((n, s), bool)
    return dict(coeff=coeff, gxc=gxc, gyc=gyc, gzc=gzc, wcx=wcx, wcy=wcy,
                wcz=wcz, lx=lx, ly=ly, lz=lz, no_oob=no_oob, sw=sw, s=s, n=n)


def run_candidate(cand, k, n):
    import jax
    import jax.numpy as jnp

    from opencorr_tpu.ops import bspline
    from opencorr_tpu.utils.precision import highest_precision

    env = build_inputs(n)
    sw, s = env["sw"], env["s"]
    ti = sw - 3

    def gather_windows(coeff, wcx, wcy, wcz):
        def one(z0, y0, x0):
            return jax.lax.dynamic_slice(coeff, (z0, y0, x0), (sw, sw, sw))
        return jax.vmap(one)(wcz, wcy, wcx)

    def build_tiles(cwin):
        tiles = []
        for tz in range(4):
            for ty in range(4):
                for tx in range(4):
                    tiles.append(jax.lax.slice(
                        cwin, (0, tz, ty, tx), (n, tz + ti, ty + ti, tx + ti)))
        return jnp.stack(tiles, axis=-1).reshape(n, ti * ti * ti, 64)

    # Device buffers ride as traced ARGUMENTS — a jit closure that captures
    # a concrete device array embeds it as a program constant via a host
    # readback (CLAUDE.md; base._assert_capture_free).
    if cand == "A":
        @jax.jit
        @highest_precision
        def step(bias, coeff, gxc, gyc, gzc):
            v, _ = bspline.tricubic_eval(coeff, gxc + bias, gyc, gzc)
            return jnp.sum(v) * 1e-22  # non-foldable: keeps the chain live

        bufs = (env["coeff"], env["gxc"], env["gyc"], env["gzc"])

    elif cand == "B":
        cwin = gather_windows(env["coeff"], env["wcx"], env["wcy"], env["wcz"])

        @jax.jit
        @highest_precision
        def step(bias, cwin, lx, ly, lz, no_oob):
            v, _ = bspline.tricubic_eval_windowed(
                cwin, lx + bias, ly, lz, no_oob)
            return jnp.sum(v) * 1e-22  # non-foldable: keeps the chain live

        bufs = (cwin, env["lx"], env["ly"], env["lz"], env["no_oob"])

    elif cand == "C":
        cwin = gather_windows(env["coeff"], env["wcx"], env["wcy"], env["wcz"])
        w64 = jax.jit(build_tiles)(cwin)

        @jax.jit
        @highest_precision
        def step(bias, w64, lx, ly, lz, no_oob):
            lx = lx + bias
            xq = jnp.clip(lx, 1.0, sw - 2.001)
            yq = jnp.clip(ly, 1.0, sw - 2.001)
            zq = jnp.clip(lz, 1.0, sw - 2.001)
            xi = jnp.floor(xq).astype(jnp.int32)
            yi = jnp.floor(yq).astype(jnp.int32)
            zi = jnp.floor(zq).astype(jnp.int32)
            bx = bspline._basis(xq - xi.astype(jnp.float32))
            by = bspline._basis(yq - yi.astype(jnp.float32))
            bz = bspline._basis(zq - zi.astype(jnp.float32))
            lin = ((zi - 1) * ti + (yi - 1)) * ti + (xi - 1)
            nb = jnp.take_along_axis(w64, lin[:, :, None], axis=1)
            w = (bz[..., :, None, None] * by[..., None, :, None]
                 * bx[..., None, None, :]).reshape(n, s, 64)
            val = jnp.sum(nb * w, axis=-1)
            val = jnp.where(no_oob, jnp.float32(-1.0), val)
            return jnp.sum(val) * 1e-22

        bufs = (w64, env["lx"], env["ly"], env["lz"], env["no_oob"])

    elif cand == "CF":
        # C with a flattened 2D gather ([N*L, 64] operand, global row idx)
        cwin = gather_windows(env["coeff"], env["wcx"], env["wcy"], env["wcz"])
        w64f = jax.jit(lambda cw: build_tiles(cw).reshape(n * ti * ti * ti,
                                                          64))(cwin)

        @jax.jit
        @highest_precision
        def step(bias, w64f, lx, ly, lz, no_oob):
            lx = lx + bias
            xq = jnp.clip(lx, 1.0, sw - 2.001)
            yq = jnp.clip(ly, 1.0, sw - 2.001)
            zq = jnp.clip(lz, 1.0, sw - 2.001)
            xi = jnp.floor(xq).astype(jnp.int32)
            yi = jnp.floor(yq).astype(jnp.int32)
            zi = jnp.floor(zq).astype(jnp.int32)
            bx = bspline._basis(xq - xi.astype(jnp.float32))
            by = bspline._basis(yq - yi.astype(jnp.float32))
            bz = bspline._basis(zq - zi.astype(jnp.float32))
            lin = ((zi - 1) * ti + (yi - 1)) * ti + (xi - 1)
            lin = lin + (jnp.arange(n, dtype=jnp.int32)
                         * (ti * ti * ti))[:, None]
            nb = w64f[lin.reshape(-1)].reshape(n, s, 64)
            w = (bz[..., :, None, None] * by[..., None, :, None]
                 * bx[..., None, None, :]).reshape(n, s, 64)
            return jnp.sum(jnp.sum(nb * w, axis=-1)) * 1e-22

        bufs = (w64f, env["lx"], env["ly"], env["lz"], env["no_oob"])

    elif cand in ("R33", "R33b"):
        # Row-block: ONE gather per subset x-row (33 samples) reading a
        # [4+2B, 4+2B, sw] tube; x-tap selection becomes a banded one-hot
        # matmul (MXU), y/z selection small weighted reduces.  B=2 covers
        # within-row y/z drift for |strain| <= 2/R.
        cwin = gather_windows(env["coeff"], env["wcx"], env["wcy"], env["wcz"])
        B = 2
        side = 2 * R + 1
        nrows = side * side

        @jax.jit
        @highest_precision
        def step(bias, cwin, lx, ly, lz):
            lx = (lx + bias).reshape(n, nrows, side)
            lyr = ly.reshape(n, nrows, side)
            lzr = lz.reshape(n, nrows, side)
            xq = jnp.clip(lx, 1.0, sw - 2.001)
            yq = jnp.clip(lyr, 1.0, sw - 2.001)
            zq = jnp.clip(lzr, 1.0, sw - 2.001)
            xi = jnp.floor(xq).astype(jnp.int32)
            yi = jnp.floor(yq).astype(jnp.int32)
            zi = jnp.floor(zq).astype(jnp.int32)
            bx = bspline._basis(xq - xi.astype(jnp.float32))  # [n,r,33,4]
            by = bspline._basis(yq - yi.astype(jnp.float32))
            bz = bspline._basis(zq - zi.astype(jnp.float32))
            y0 = jnp.clip(jnp.min(yi, axis=2) - 1, 0, sw - 4 - 2 * B)
            z0 = jnp.clip(jnp.min(zi, axis=2) - 1, 0, sw - 4 - 2 * B)

            def blk_one(cw, z0r, y0r):
                return jax.lax.dynamic_slice(
                    cw, (z0r, y0r, 0), (4 + 2 * B, 4 + 2 * B, sw))

            blk = jax.vmap(jax.vmap(blk_one, in_axes=(None, 0, 0)),
                           in_axes=(0, 0, 0))(cwin, z0, y0)
            # [n, rows, 4+2B, 4+2B, sw]
            # x one-hot: wx[n, rows, sw, 33] = sum_t bx * ind(x == xi-1+t)
            xiota = jnp.arange(sw, dtype=jnp.int32)
            wx = jnp.zeros((n, nrows, sw, side), jnp.float32)
            for t in range(4):
                hit = (xiota[None, None, :, None]
                       == (xi - 1 + t)[:, :, None, :])
                wx = wx + jnp.where(hit, bx[..., t][:, :, None, :], 0.0)
            zy = (4 + 2 * B) * (4 + 2 * B)
            t1 = jnp.einsum(
                "nrcx,nrxi->nrci",
                blk.reshape(n, nrows, zy, sw), wx)  # [n,rows,zy,33]
            t1 = t1.reshape(n, nrows, 4 + 2 * B, 4 + 2 * B, side)
            # y/z selection: small one-hot weighted reduces
            yio = jnp.arange(4 + 2 * B, dtype=jnp.int32)
            ry = yi - y0[:, :, None]  # tap0 row = ry - 1
            wy = jnp.zeros((n, nrows, 4 + 2 * B, side), jnp.float32)
            for t in range(4):
                hit = (yio[None, None, :, None] == (ry - 1 + t)[:, :, None, :])
                wy = wy + jnp.where(hit, by[..., t][:, :, None, :], 0.0)
            t2 = jnp.einsum("nrzyi,nryi->nrzi", t1, wy)
            rz = zi - z0[:, :, None]
            wz = jnp.zeros((n, nrows, 4 + 2 * B, side), jnp.float32)
            for t in range(4):
                hit = (yio[None, None, :, None] == (rz - 1 + t)[:, :, None, :])
                wz = wz + jnp.where(hit, bz[..., t][:, :, None, :], 0.0)
            val = jnp.einsum("nrzi,nrzi->nri", t2, wz)
            return jnp.sum(val) * 1e-22

        bufs = (cwin, env["lx"], env["ly"], env["lz"])

    elif cand == "L":
        # Gather-free "shift-register" lattice eval: subset samples sit on a
        # near-regular lattice, so each sample's 64 taps live within a
        # bounded offset window (|delta| <= D wobble) of the nominal
        # lattice; the eval becomes (4+2D)^3 STATIC shifted slices of a
        # per-POI block, weighted by per-sample basis-placement vectors —
        # pure elementwise VPU work, zero gathers.
        cwin = gather_windows(env["coeff"], env["wcx"], env["wcy"], env["wcz"])
        D = 2
        W8 = 4 + 2 * D
        side = 2 * R + 1
        ext = side + W8 - 1  # 40

        @jax.jit
        @highest_precision
        def step(bias, cwin, lx, ly, lz):
            lx = lx + bias
            xq = jnp.clip(lx, 1.0, sw - 2.001).reshape(n, side, side, side)
            yq = jnp.clip(ly, 1.0, sw - 2.001).reshape(n, side, side, side)
            zq = jnp.clip(lz, 1.0, sw - 2.001).reshape(n, side, side, side)
            xi = jnp.floor(xq).astype(jnp.int32)
            yi = jnp.floor(yq).astype(jnp.int32)
            zi = jnp.floor(zq).astype(jnp.int32)
            bx = bspline._basis(xq - xi.astype(jnp.float32))  # [n,33,33,33,4]
            by = bspline._basis(yq - yi.astype(jnp.float32))
            bz = bspline._basis(zq - zi.astype(jnp.float32))
            # nominal lattice base from the center sample
            c = side // 2
            nx0 = xi[:, c, c, c] - c
            ny0 = yi[:, c, c, c] - c
            nz0 = zi[:, c, c, c] - c
            iio = jnp.arange(side, dtype=jnp.int32)
            dx = xi - (nx0[:, None, None, None] + iio[None, None, None, :])
            dy = yi - (ny0[:, None, None, None] + iio[None, None, :, None])
            dz = zi - (nz0[:, None, None, None] + iio[None, :, None, None])
            # basis placement: bxp[..., t] = bx[..., t - D - dx]
            def place(b, d):
                # LEADING offset axis: a trailing dim of 8 would tile-pad
                # 16x (8 -> 128 lanes)
                slots = []
                for t in range(W8):
                    acc_t = jnp.zeros(b.shape[:-1], jnp.float32)
                    for tap in range(4):
                        acc_t = acc_t + jnp.where(d == t - tap - D,
                                                  b[..., tap], 0.0)
                    slots.append(acc_t)
                return slots
            bxp = place(bx, dx)
            byp = place(by, dy)
            bzp = place(bz, dz)
            # extended block: eblk[n, k+oz, j+oy, i+ox]
            #   = cwin[n, nz0-1-D + (k+oz), ...]
            def eb(cw, z0, y0, x0):
                return jax.lax.dynamic_slice(cw, (z0, y0, x0),
                                             (ext, ext, ext))
            eblk = jax.vmap(eb)(cwin,
                                jnp.clip(nz0 - 1 - D, 0, sw - ext),
                                jnp.clip(ny0 - 1 - D, 0, sw - ext),
                                jnp.clip(nx0 - 1 - D, 0, sw - ext))
            acc = jnp.zeros((n, side, side, side), jnp.float32)
            for oz in range(W8):
                for oy in range(W8):
                    wzy = bzp[oz] * byp[oy]
                    for ox in range(W8):
                        sh = jax.lax.slice(
                            eblk, (0, oz, oy, ox),
                            (n, oz + side, oy + side, ox + side))
                        acc = acc + wzy * bxp[ox] * sh
            return jnp.sum(acc) * 1e-22

        bufs = (cwin, env["lx"], env["ly"], env["lz"])

    elif cand == "CNW":
        # C's gather alone (constant weights): isolates gather-row cost
        cwin = gather_windows(env["coeff"], env["wcx"], env["wcy"], env["wcz"])
        w64 = jax.jit(build_tiles)(cwin)

        @jax.jit
        @highest_precision
        def step(bias, w64, lx, ly, lz):
            lx = lx + bias
            xq = jnp.clip(lx, 1.0, sw - 2.001)
            yq = jnp.clip(ly, 1.0, sw - 2.001)
            zq = jnp.clip(lz, 1.0, sw - 2.001)
            xi = jnp.floor(xq).astype(jnp.int32)
            yi = jnp.floor(yq).astype(jnp.int32)
            zi = jnp.floor(zq).astype(jnp.int32)
            lin = ((zi - 1) * ti + (yi - 1)) * ti + (xi - 1)
            nb = jnp.take_along_axis(w64, lin[:, :, None], axis=1)
            return jnp.sum(nb) * 1e-22

        bufs = (w64, env["lx"], env["ly"], env["lz"])

    elif cand == "CW":
        # C's weight build + product alone (fixed gather result)
        cwin = gather_windows(env["coeff"], env["wcx"], env["wcy"], env["wcz"])

        @jax.jit
        @highest_precision
        def step(bias, lx, ly, lz):
            lx = lx + bias
            xq = jnp.clip(lx, 1.0, sw - 2.001)
            yq = jnp.clip(ly, 1.0, sw - 2.001)
            zq = jnp.clip(lz, 1.0, sw - 2.001)
            xi = jnp.floor(xq).astype(jnp.int32)
            yi = jnp.floor(yq).astype(jnp.int32)
            zi = jnp.floor(zq).astype(jnp.int32)
            bx = bspline._basis(xq - xi.astype(jnp.float32))
            by = bspline._basis(yq - yi.astype(jnp.float32))
            bz = bspline._basis(zq - zi.astype(jnp.float32))
            wgt = (bz[..., :, None, None] * by[..., None, :, None]
                   * bx[..., None, None, :]).reshape(n, s, 64)
            return jnp.sum(wgt) * 1e-22

        bufs = (env["lx"], env["ly"], env["lz"])

    elif cand in ("P", "P1"):
        # Pallas gather-free lattice kernel (ops/pallas_lattice.py)
        from opencorr_tpu.ops.pallas_lattice import lattice_eval
        cwin = gather_windows(env["coeff"], env["wcx"], env["wcy"], env["wcz"])
        D = 1 if cand == "P1" else 2
        side = 2 * R + 1
        W8 = 4 + 2 * D
        ext = side + W8 - 1

        @jax.jit
        @highest_precision
        def step(bias, cwin, lx, ly, lz):
            lx = (lx + bias).reshape(n, side, side, side)
            lyr = ly.reshape(n, side, side, side)
            lzr = lz.reshape(n, side, side, side)
            xi = jnp.floor(lx).astype(jnp.int32)
            yi = jnp.floor(lyr).astype(jnp.int32)
            zi = jnp.floor(lzr).astype(jnp.int32)
            fx = lx - xi.astype(jnp.float32)
            fy = lyr - yi.astype(jnp.float32)
            fz = lzr - zi.astype(jnp.float32)
            c = side // 2
            bx0 = jnp.clip(xi[:, c, c, c] - c - 1 - D, 0, sw - ext)
            by0 = jnp.clip(yi[:, c, c, c] - c - 1 - D, 0, sw - ext)
            bz0 = jnp.clip(zi[:, c, c, c] - c - 1 - D, 0, sw - ext)
            eblk = jax.vmap(lambda cw, z0, y0, x0: jax.lax.dynamic_slice(
                cw, (z0, y0, x0), (ext, ext, ext)))(cwin, bz0, by0, bx0)
            ii = jnp.arange(side, dtype=jnp.int32)
            ddx = xi - 1 - bx0[:, None, None, None] - ii[None, None, None, :]
            ddy = yi - 1 - by0[:, None, None, None] - ii[None, None, :, None]
            ddz = zi - 1 - bz0[:, None, None, None] - ii[None, :, None, None]
            val = lattice_eval(eblk, ddz, ddy, ddx, fz, fy, fx,
                               d_wobble=D, slab=8)
            return jnp.sum(val) * 1e-22

        bufs = (cwin, env["lx"], env["ly"], env["lz"])

    elif cand == "PK":
        # lattice kernel with PREPACKED inputs: isolates kernel cost from
        # the per-iteration pack/unpack transposes
        from opencorr_tpu.ops import pallas_lattice as pla
        import functools as ft
        cwin = gather_windows(env["coeff"], env["wcx"], env["wcy"], env["wcz"])
        D = 1
        side = 2 * R + 1
        W6 = 4 + 2 * D
        ext = side + W6 - 1

        def build(cwin, lx, ly, lz):
            lx = lx.reshape(n, side, side, side)
            lyr = ly.reshape(n, side, side, side)
            lzr = lz.reshape(n, side, side, side)
            xi = jnp.floor(lx).astype(jnp.int32)
            yi = jnp.floor(lyr).astype(jnp.int32)
            zi = jnp.floor(lzr).astype(jnp.int32)
            fx = lx - xi.astype(jnp.float32)
            fy = lyr - yi.astype(jnp.float32)
            fz = lzr - zi.astype(jnp.float32)
            c = side // 2
            bx0 = jnp.clip(xi[:, c, c, c] - c - 1 - D, 0, sw - ext)
            by0 = jnp.clip(yi[:, c, c, c] - c - 1 - D, 0, sw - ext)
            bz0 = jnp.clip(zi[:, c, c, c] - c - 1 - D, 0, sw - ext)
            eblk = jax.vmap(lambda cw, z0, y0, x0: jax.lax.dynamic_slice(
                cw, (z0, y0, x0), (ext, ext, ext)))(cwin, bz0, by0, bx0)
            ii = jnp.arange(side, dtype=jnp.int32)
            ddx = xi - 1 - bx0[:, None, None, None] - ii[None, None, None, :]
            ddy = yi - 1 - by0[:, None, None, None] - ii[None, None, :, None]
            ddz = zi - 1 - bz0[:, None, None, None] - ii[None, :, None, None]
            return eblk, ddz, ddy, ddx, fz, fy, fx

        args = jax.jit(build)(cwin, env["lx"], env["ly"], env["lz"])

        @jax.jit
        @highest_precision
        def step(bias, eblk, ddz, ddy, ddx, fz, fy, fx):
            val = pla.lattice_eval(eblk + bias * 1e-30, ddz, ddy, ddx,
                                   fz, fy, fx, d_wobble=D, slab=8)
            return jnp.sum(val) * 1e-22

        bufs = args

    elif cand == "M":
        # pure bandwidth probe: one elementwise pass over 1 GB
        big = jax.random.uniform(jax.random.PRNGKey(2), (256 * 1024 * 1024,),
                                 jnp.float32)

        @jax.jit
        def step(bias, big):
            return jnp.sum(big * (1.0 + bias * 1e-30)) * 1e-22

        bufs = (big,)

    elif cand == "MM":
        # MXU probe: [4096, 4096] f32 matmul (~137 GFLOP at k-chain)
        a = jax.random.uniform(jax.random.PRNGKey(3), (4096, 4096),
                               jnp.float32)

        @jax.jit
        @highest_precision
        def step(bias, a):
            return jnp.sum(a @ (a + bias * 1e-30)) * 1e-22

        bufs = (a,)

    elif cand == "W":
        @jax.jit
        def step(bias, coeff, wcx, wcy, wcz):
            cw = gather_windows(coeff, wcx + bias, wcy, wcz)
            return (jnp.sum(cw[:, 0, 0, 0]).astype(jnp.int32)) % 2  # {0,1}: jitters the corner one voxel, keeps the chain live

        bufs = (env["coeff"], env["wcx"], env["wcy"], env["wcz"])

    elif cand == "T":
        cwin = gather_windows(env["coeff"], env["wcx"], env["wcy"], env["wcz"])

        @jax.jit
        def step(bias, cwin):
            w64 = build_tiles(cwin + bias.astype(jnp.float32))
            return (jnp.sum(w64[:, 0, 0]).astype(jnp.int32)) % 2

        bufs = (cwin,)
    else:
        raise SystemExit(f"unknown candidate {cand}")

    bias0 = jnp.zeros((), jnp.int32 if cand in "WT" else jnp.float32)
    b = step(bias0, *bufs)  # compile + first (enqueue-only) execution
    jax.block_until_ready(b)
    t0 = time.time()
    for _ in range(k):
        b = step(b, *bufs)
    forced = float(np.asarray(b))  # single readback: waits for the chain
    elapsed = time.time() - t0
    print(json.dumps({"cand": cand, "k": k, "n": n,
                      "elapsed": round(elapsed, 3), "forced": forced}),
          flush=True)


def orchestrate(n):
    results = {}
    for cand in ("A", "B", "C", "W", "T"):
        per = {}
        for k in (2, 10):
            for attempt in range(3):
                try:
                    out = subprocess.run(
                        [sys.executable, "-u", __file__, "run", cand, str(k),
                         str(n)],
                        capture_output=True, text=True, timeout=900)
                    line = [l for l in out.stdout.splitlines()
                            if l.startswith("{")]
                    if line:
                        per[k] = json.loads(line[-1])["elapsed"]
                        break
                except subprocess.TimeoutExpired:
                    pass
                print(json.dumps({"cand": cand, "k": k,
                                  "retry": attempt + 1}), flush=True)
        if 2 in per and 10 in per:
            slope = (per[10] - per[2]) / 8.0
            results[cand] = slope
            s = (2 * R + 1) ** 3
            print(json.dumps({
                "cand": cand, "t_k2": per[2], "t_k10": per[10],
                "per_run_s": round(slope, 4),
                "msamples_per_s": round(n * s / max(slope, 1e-9) / 1e6, 2)
                if cand in "ABC" else None}), flush=True)
    if "A" in results and "C" in results:
        print(json.dumps({
            "stage": "summary", "n_poi": n,
            "speedup_B_vs_A": round(results["A"] / results["B"], 1)
            if "B" in results else None,
            "speedup_C_vs_A": round(results["A"] / results["C"], 1),
            "speedup_C_vs_B": round(results["B"] / results["C"], 1)
            if "B" in results else None,
            "setup_window_s": round(results.get("W", float("nan")), 4),
            "setup_tiles_s": round(results.get("T", float("nan")), 4),
        }), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "run":
        run_candidate(sys.argv[2], int(sys.argv[3]),
                      int(sys.argv[4]) if len(sys.argv) > 4 else 64)
    else:
        orchestrate(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
