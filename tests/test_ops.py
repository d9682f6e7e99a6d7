"""Unit tests for the L2 kernels: gradients, B-splines, warps.

Mirrors the reference test strategy (SURVEY.md §4): analytic cases plus values
recomputed from the reference formulas in float64 numpy.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from opencorr_tpu.ops import bspline, gradient, warp as warp_ops


class TestGradient:
    def test_polynomial_exact_2d(self):
        # 4th-order stencil differentiates cubics exactly.
        y, x = np.mgrid[0:32, 0:40].astype(np.float32)
        img = 0.5 * x**3 / 100 + 2 * x + 3 * y + 7
        gx = np.asarray(gradient.gradient_x_2d(jnp.asarray(img)))
        expect = 1.5 * x**2 / 100 + 2
        assert np.allclose(gx[:, 2:-2], expect[:, 2:-2], atol=1e-3)
        assert (gx[:, :2] == 0).all() and (gx[:, -2:] == 0).all()

    def test_reference_stencil_values_2d(self):
        # Recompute one pixel with the reference formula (oc_gradient.cpp:49-54).
        rng = np.random.default_rng(0)
        img = rng.random((8, 9)).astype(np.float32) * 255
        gy = np.asarray(gradient.gradient_y_2d(jnp.asarray(img)))
        r, c = 4, 3
        want = (-img[r + 2, c] / 12 + img[r + 1, c] * 2 / 3
                - img[r - 1, c] * 2 / 3 + img[r - 2, c] / 12)
        assert abs(gy[r, c] - want) < 1e-4

    def test_polynomial_exact_3d(self):
        z, y, x = np.mgrid[0:16, 0:17, 0:18].astype(np.float32)
        vol = x * 2 + y * y * 0.1 + z * 3
        gy = np.asarray(gradient.gradient_y_3d(jnp.asarray(vol)))
        gz = np.asarray(gradient.gradient_z_3d(jnp.asarray(vol)))
        assert np.allclose(gy[:, 2:-2, :], 0.2 * y[:, 2:-2, :], atol=1e-3)
        assert np.allclose(gz[2:-2], 3.0, atol=1e-3)


class TestBicubic:
    def test_interpolates_at_integer_points(self):
        rng = np.random.default_rng(1)
        img = rng.random((20, 24)).astype(np.float32) * 255
        lut = bspline.bicubic_prepare(jnp.asarray(img))
        ys, xs = np.mgrid[2:17, 2:21]
        vals, oob = bspline.bicubic_eval(
            lut, jnp.asarray(xs.ravel(), jnp.float32),
            jnp.asarray(ys.ravel(), jnp.float32))
        # Pan et al.'s LUT passes through the samples at integer locations.
        assert not bool(np.asarray(oob).any())
        assert np.allclose(np.asarray(vals), img[ys.ravel(), xs.ravel()],
                           atol=0.51)

    def test_matches_reference_formula(self):
        """Cross-check against a float64 transcription of
        oc_cubic_bspline.cpp:84-181."""
        rng = np.random.default_rng(2)
        img = rng.random((12, 13)).astype(np.float32) * 255
        lut = bspline.bicubic_prepare(jnp.asarray(img))
        bc = bspline.BC_MATRIX.astype(np.float64)

        def ref_eval(x, y):
            xi, yi = int(np.floor(x)), int(np.floor(y))
            q = img[yi - 1 : yi + 3, xi - 1 : xi + 3].astype(np.float64)
            p = np.zeros((4, 4))
            for k in range(4):
                for l in range(4):
                    for m in range(4):
                        for n in range(4):
                            p[k, l] += bc[l, m] * bc[k, n] * q[n, m]
            c = p[::-1, ::-1]
            xd, yd = x - xi, y - yi
            return sum(c[k, l] * yd**k * xd**l for k in range(4) for l in range(4))

        pts = [(2.25, 3.75), (5.5, 4.125), (9.9, 8.01), (1.0, 1.0)]
        xs = jnp.asarray([p[0] for p in pts], jnp.float32)
        ys = jnp.asarray([p[1] for p in pts], jnp.float32)
        vals, _ = bspline.bicubic_eval(lut, xs, ys)
        for v, (x, y) in zip(np.asarray(vals), pts):
            assert abs(v - ref_eval(x, y)) < 5e-3

    def test_oob_sentinel(self):
        img = jnp.ones((10, 10))
        lut = bspline.bicubic_prepare(img)
        xs = jnp.asarray([0.5, 8.0, 3.0, jnp.nan])
        ys = jnp.asarray([5.0, 5.0, 9.5, 2.0])
        vals, oob = bspline.bicubic_eval(lut, xs, ys)
        assert np.asarray(oob).tolist() == [True, True, True, True]
        assert (np.asarray(vals) == -1.0).all()


class TestTricubic:
    def test_prefilter_matches_reference_loop(self):
        """Float64 transcription of the x-axis pass with edge clamping
        (oc_cubic_bspline.cpp:229-261)."""
        rng = np.random.default_rng(3)
        vol = rng.random((4, 5, 20)).astype(np.float32)
        got = np.asarray(bspline._prefilter_axis(jnp.asarray(vol), axis=2))
        taps = bspline.BSPLINE_PREFILTER.astype(np.float64)
        v = vol.astype(np.float64)
        want = np.zeros_like(v)
        nx = vol.shape[2]
        for i in range(vol.shape[0]):
            for j in range(vol.shape[1]):
                for k in range(nx):
                    acc = taps[0] * v[i, j, k]
                    for t in range(1, 8):
                        lo = max(k - t, 0)
                        hi = min(k + t, nx - 1)
                        acc += taps[t] * (v[i, j, lo] + v[i, j, hi])
                    want[i, j, k] = acc
        assert np.allclose(got, want, atol=1e-4)

    def test_interpolates_smooth_volume(self):
        z, y, x = np.mgrid[0:20, 0:20, 0:20].astype(np.float32)
        vol = np.sin(x * 0.3) + np.cos(y * 0.25) + z * 0.1
        coeff = bspline.tricubic_prepare(jnp.asarray(vol))
        pts = np.array([[5.3, 7.8, 9.1], [10.0, 10.0, 10.0], [3.25, 12.5, 6.75]])
        vals, oob = bspline.tricubic_eval(
            coeff, jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
            jnp.asarray(pts[:, 2]))
        want = (np.sin(pts[:, 0] * 0.3) + np.cos(pts[:, 1] * 0.25)
                + pts[:, 2] * 0.1)
        assert not bool(np.asarray(oob).any())
        assert np.allclose(np.asarray(vals), want, atol=2e-2)

    def test_oob_sentinel(self):
        coeff = bspline.tricubic_prepare(jnp.ones((16, 16, 16)))
        vals, oob = bspline.tricubic_eval(
            coeff, jnp.asarray([0.0]), jnp.asarray([5.0]), jnp.asarray([5.0]))
        assert bool(oob[0]) and float(vals[0]) == -1.0


class TestWarp:
    def test_roundtrip_2d1(self):
        p = jnp.asarray(np.random.default_rng(4).normal(size=(7, 6)), jnp.float32)
        w = warp_ops.warp2d1_from_p(p)
        assert np.allclose(np.asarray(warp_ops.p_from_warp2d1(w)), np.asarray(p),
                           atol=1e-6)

    def test_roundtrip_2d2(self):
        p = jnp.asarray(
            np.random.default_rng(5).normal(size=(7, 12)) * 0.1, jnp.float32)
        w = warp_ops.warp2d2_from_p(p)
        assert np.allclose(np.asarray(warp_ops.p_from_warp2d2(w)), np.asarray(p),
                           atol=1e-5)

    def test_roundtrip_3d1(self):
        p = jnp.asarray(
            np.random.default_rng(6).normal(size=(5, 12)) * 0.2, jnp.float32)
        w = warp_ops.warp3d1_from_p(p)
        assert np.allclose(np.asarray(warp_ops.p_from_warp3d1(w)), np.asarray(p),
                           atol=1e-6)

    def test_identity(self):
        w = warp_ops.warp2d1_from_p(jnp.zeros((1, 6)))
        assert np.allclose(np.asarray(w)[0], np.eye(3))
        w6 = warp_ops.warp2d2_from_p(jnp.zeros((1, 12)))
        assert np.allclose(np.asarray(w6)[0], np.eye(6))

    def test_warp2d2_reference_formula(self):
        """Spot-check the S-matrix entries against oc_deformation.cpp:301-350."""
        rng = np.random.default_rng(7)
        u, ux, uy, uxx, uxy, uyy, v, vx, vy, vxx, vxy, vyy = rng.normal(size=12) * 0.1
        p = jnp.asarray([[u, ux, uy, uxx, uxy, uyy, v, vx, vy, vxx, vxy, vyy]],
                        jnp.float32)
        w = np.asarray(warp_ops.warp2d2_from_p(p))[0]
        assert abs(w[0, 0] - (1 + 2 * ux + ux * ux + u * uxx)) < 1e-5
        assert abs(w[1, 1] - (1 + uy * vx + ux * vy + v * uxy + u * vxy + vy + ux)) < 1e-5
        assert abs(w[2, 4] - (2 * v * (1 + vy))) < 1e-5
        assert abs(w[4, 0] - 0.5 * vxx) < 1e-6


def test_tricubic_eval_windowed_matches_global():
    """Per-POI windowed tricubic eval (bspline.tricubic_eval_windowed) must
    match the whole-volume eval exactly for in-window samples, including the
    lax.map slab path (forced via many samples)."""
    import numpy as np
    import jax.numpy as jnp
    from opencorr_tpu.ops import bspline
    from opencorr_tpu.ops.icgn import gather_subsets_3d

    rng = np.random.default_rng(3)
    vol = rng.random((40, 44, 48)).astype(np.float32) * 100
    coeff = bspline.tricubic_prepare(jnp.asarray(vol))
    dz, dy, dx = coeff.shape
    n, s = 16, 2048
    r, mgn = 8, 8
    sw = 2 * (r + mgn) + 1
    cx = rng.uniform(18, 30, n).astype(np.float32)
    cy = rng.uniform(18, 26, n).astype(np.float32)
    cz = rng.uniform(18, 22, n).astype(np.float32)
    gx = jnp.asarray(cx[:, None] + rng.uniform(-7, 7, (n, s)).astype(np.float32))
    gy = jnp.asarray(cy[:, None] + rng.uniform(-7, 7, (n, s)).astype(np.float32))
    gz = jnp.asarray(cz[:, None] + rng.uniform(-7, 7, (n, s)).astype(np.float32))
    x0 = np.clip(np.floor(cx + 0.5).astype(np.int32) - r - mgn, 0, dx - sw)
    y0 = np.clip(np.floor(cy + 0.5).astype(np.int32) - r - mgn, 0, dy - sw)
    z0 = np.clip(np.floor(cz + 0.5).astype(np.int32) - r - mgn, 0, dz - sw)
    cwin = gather_subsets_3d(coeff, jnp.asarray(x0), jnp.asarray(y0),
                             jnp.asarray(z0), r + mgn, r + mgn, r + mgn)
    oobg = (gx < 1) | (gy < 1) | (gz < 1) | (gx >= dx - 2) | (gy >= dy - 2) | (gz >= dz - 2)
    v_w, o_w = bspline.tricubic_eval_windowed(
        cwin, gx - jnp.asarray(x0.astype(np.float32))[:, None],
        gy - jnp.asarray(y0.astype(np.float32))[:, None],
        gz - jnp.asarray(z0.astype(np.float32))[:, None], oobg)
    v_g, o_g = bspline.tricubic_eval(coeff, gx, gy, gz)
    a, b = np.asarray(v_g), np.asarray(v_w)
    both = np.asarray(~o_g & ~o_w)
    assert both.mean() > 0.95  # margin covers nearly all samples
    assert np.allclose(a[both], b[both], atol=1e-3)
    # windowed never reports in-range where global says out-of-range
    assert not np.any(np.asarray(o_g & ~o_w))


def test_tricubic_eval_tiled_matches_global():
    """The per-window contiguous tile-LUT eval (bspline.tricubic_window_tiles
    + tricubic_eval_tiled) must match the whole-volume eval bit-exactly for
    in-window samples (integer window corners keep fractional parts exact),
    including the slab lax.map path."""
    import numpy as np
    import jax.numpy as jnp
    from opencorr_tpu.ops import bspline
    from opencorr_tpu.ops.icgn import gather_subsets_3d

    rng = np.random.default_rng(4)
    vol = rng.random((40, 44, 48)).astype(np.float32) * 100
    coeff = bspline.tricubic_prepare(jnp.asarray(vol))
    dz, dy, dx = coeff.shape
    n, s = 16, 2048
    r, mgn = 8, 8
    sw = 2 * (r + mgn) + 1
    cx = rng.uniform(18, 30, n).astype(np.float32)
    cy = rng.uniform(18, 26, n).astype(np.float32)
    cz = rng.uniform(18, 22, n).astype(np.float32)
    gx = jnp.asarray(cx[:, None] + rng.uniform(-9, 9, (n, s)).astype(np.float32))
    gy = jnp.asarray(cy[:, None] + rng.uniform(-9, 9, (n, s)).astype(np.float32))
    gz = jnp.asarray(cz[:, None] + rng.uniform(-9, 9, (n, s)).astype(np.float32))
    x0 = np.clip(np.floor(cx).astype(np.int32) - r - mgn, 0, dx - sw)
    y0 = np.clip(np.floor(cy).astype(np.int32) - r - mgn, 0, dy - sw)
    z0 = np.clip(np.floor(cz).astype(np.int32) - r - mgn, 0, dz - sw)
    cwin = gather_subsets_3d(coeff, jnp.asarray(x0), jnp.asarray(y0),
                             jnp.asarray(z0), r + mgn, r + mgn, r + mgn)
    w64 = bspline.tricubic_window_tiles(cwin)
    lx = gx - jnp.asarray(x0.astype(np.float32))[:, None]
    ly = gy - jnp.asarray(y0.astype(np.float32))[:, None]
    lz = gz - jnp.asarray(z0.astype(np.float32))[:, None]
    # caller-side mask: global guard + int-domain window-exit (as in icgn3d1)
    oobg = ((gx < 1) | (gy < 1) | (gz < 1)
            | (gx >= dx - 2) | (gy >= dy - 2) | (gz >= dz - 2))
    ex = jnp.floor(jnp.clip(lx, -9.0, sw + 9.0)).astype(jnp.int32)
    ey = jnp.floor(jnp.clip(ly, -9.0, sw + 9.0)).astype(jnp.int32)
    ez = jnp.floor(jnp.clip(lz, -9.0, sw + 9.0)).astype(jnp.int32)
    oob = (oobg | (ex < 1) | (ex > sw - 3) | (ey < 1) | (ey > sw - 3)
           | (ez < 1) | (ez > sw - 3))
    v_t = bspline.tricubic_eval_tiled(w64, (sw, sw, sw), lx, ly, lz, oob)
    v_g, o_g = bspline.tricubic_eval(coeff, gx, gy, gz)
    a, b = np.asarray(v_g), np.asarray(v_t)
    both = np.asarray(~o_g) & ~np.asarray(oob)
    assert both.mean() > 0.9
    assert np.array_equal(a[both], b[both])  # bit-exact
    # tiled never reports a value where global says out-of-range
    assert not np.any(np.asarray(o_g) & ~np.asarray(oob))

    # slab path: repeat samples past the slab threshold
    reps = (2 * (1 << 26) // 64 // n) // s + 2
    lxs = jnp.tile(lx, (1, reps))
    lys = jnp.tile(ly, (1, reps))
    lzs = jnp.tile(lz, (1, reps))
    oobs = jnp.tile(oob, (1, reps))
    v_s = bspline.tricubic_eval_tiled(w64, (sw, sw, sw), lxs, lys, lzs, oobs)
    assert np.array_equal(np.asarray(v_s)[:, :s][both], a[both])


def test_icgn3d1_windowed_matches_global():
    """The windowed-coefficient GN kernel must reproduce the global-volume
    kernel's results for converging POIs (ops/icgn.icgn3d1 window_margin)."""
    import numpy as np
    import jax.numpy as jnp
    import opencorr_tpu as oc

    from scipy.ndimage import gaussian_filter, map_coordinates

    rng = np.random.default_rng(11)
    dims = (40, 36, 44)
    ref = gaussian_filter(rng.standard_normal(dims), 1.4) * 50 + 128
    zz, yy, xx = np.meshgrid(*[np.arange(d, dtype=np.float64) for d in dims],
                             indexing="ij")
    tar = map_coordinates(ref, [zz - 0.4, yy + 0.25, xx - 0.6], order=3,
                          mode="nearest")
    pois = oc.poi_grid_3d((14, 14, 14), 3, 2, 3, 6)

    outs = {}
    for margin in (None, 8):
        # eval_mode="tile" pins the bit-exact windowed path (the default
        # lattice kernel reorders the f32 tap sum; TestLatticeEval covers it)
        ic = oc.ICGN3D1(8, 8, 8, 0.001, 10, window_margin=margin,
                        eval_mode="tile")
        ic.set_images(ref.astype(np.float32), tar.astype(np.float32))
        ic.prepare()
        f = oc.FFTCC3D(8, 8, 8)
        f.set_images(ref.astype(np.float32), tar.astype(np.float32))
        outs[margin] = ic.compute(f.compute(pois))
    za = np.asarray(outs[None].zncc)
    zb = np.asarray(outs[8].zncc)
    assert (za > 0).all() and (zb > 0).all()
    np.testing.assert_array_equal(np.asarray(outs[None].p),
                                  np.asarray(outs[8].p))
    np.testing.assert_array_equal(za, zb)


class TestLatticeEval:
    """Gather-free lattice ICGN3D1 (ops/pallas_lattice.py, eval_mode on
    ops/icgn.icgn3d1).  The lattice kernel computes the SAME 64 products as
    the reference's 4x4x4 tricubic evaluation (oc_cubic_bspline.cpp:353-405)
    in a different f32 summation order, so results match the tile path to
    reorder level; the wobble-overflow fallback path is bit-exact."""

    @staticmethod
    def _setup(e, seed=0):
        from scipy.ndimage import gaussian_filter, map_coordinates
        from opencorr_tpu.ops import icgn as icgn_ops, gradient as grad_ops

        rng = np.random.default_rng(seed)
        D, H, W = 48, 52, 56
        ref = gaussian_filter(rng.standard_normal((D, H, W)), 1.6) * 55 + 128
        ref = ref.astype(np.float32)
        zz, yy, xx = np.meshgrid(np.arange(D), np.arange(H), np.arange(W),
                                 indexing="ij")
        tar = map_coordinates(
            ref, [zz - 0.4 + e * (zz - D / 2), yy + 0.25, xx - 0.6],
            order=3, mode="nearest").astype(np.float32)
        coeff = bspline.tricubic_prepare(jnp.asarray(tar))
        gx = grad_ops.gradient_x_3d(jnp.asarray(ref))
        gy = grad_ops.gradient_y_3d(jnp.asarray(ref))
        gz = grad_ops.gradient_z_3d(jnp.asarray(ref))
        n = 7
        xs = jnp.asarray(rng.uniform(16, W - 17, n), jnp.float32)
        ys = jnp.asarray(rng.uniform(16, H - 17, n), jnp.float32)
        zs = jnp.asarray(rng.uniform(16, D - 17, n), jnp.float32)
        p0 = np.zeros((n, 12), np.float32)
        if e:
            # seed near truth so GN iterates at the high-strain warp
            p0[:, 8] = 0.4 - e * (np.asarray(zs) - D / 2)
            p0[:, 11] = -e
        args = (gx, gy, gz, jnp.asarray(ref), coeff, xs, ys, zs,
                jnp.asarray(p0), jnp.zeros(n, jnp.float32),
                jnp.float32(0.001), jnp.float32(10))
        kw = dict(rx=8, ry=8, rz=8, window_margin=8)
        run = lambda mode: icgn_ops.icgn3d1(*args, **kw, eval_mode=mode)
        return run

    def test_small_strain_matches_tile(self):
        run = self._setup(e=0.01)
        out_t, out_l = run("tile"), run("lattice")
        zt, zl = np.asarray(out_t[4]), np.asarray(out_l[4])
        assert (zt > 0.99).all() and (zl > 0.99).all()
        np.testing.assert_allclose(np.asarray(out_l[0]),
                                   np.asarray(out_t[0]), atol=2e-5)
        np.testing.assert_array_equal(np.asarray(out_t[5]),
                                      np.asarray(out_l[5]))  # same iterations

    def test_wobble_overflow_falls_back_bit_exact(self):
        # 25% strain: lattice deviation at r=8 is ~2 voxels > D=1, so every
        # iteration takes the lax.cond fallback (global eval, bit-identical
        # to the tile path) — outputs must match EXACTLY.
        run = self._setup(e=0.25)
        out_t, out_l = run("tile"), run("lattice")
        assert (np.asarray(out_t[4]) > 0.99).all()
        for a, b in zip(out_t, out_l):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_icgn2d_two_phase_compaction_matches_batch_split():
    """The two-phase active-set compaction (ops/icgn._COMPACT_MIN) must be
    invisible in results: a queue wide enough to trigger it (n >= 4096)
    produces bit-identical outputs to the same POIs computed in two
    sub-4096 halves (single-phase).  Per-POI GN math is batch-independent,
    so any difference would be a compaction indexing/scatter bug."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import opencorr_tpu as oc
    from opencorr_tpu.data import poi as pm
    from opencorr_tpu.ops import icgn as icgn_ops
    from scipy.ndimage import gaussian_filter, map_coordinates

    assert icgn_ops._COMPACT_MIN <= 4100
    rng = np.random.default_rng(3)
    h, w = 140, 200
    ref = (gaussian_filter(rng.standard_normal((h, w)), 1.5) * 55
           + 128).astype(np.float32)
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    # mild shift over most of the image (fast convergence) plus a
    # short-wavelength patch on the right quarter so the compacted tail
    # phase runs on a real straggler set
    hard = np.clip((xx - 0.7 * w) / (0.1 * w), 0.0, 1.0)
    tar = map_coordinates(
        ref, [yy + 0.2 + hard * 1.1 * np.cos(yy / 7.0),
              xx - 0.3 + hard * 1.3 * np.sin(xx / 8.0)],
        order=3, mode="nearest").astype(np.float32)

    pois = oc.poi_grid_2d((12, 12), 82, 50, 2)  # 4100 >= _COMPACT_MIN
    f = oc.FFTCC2D(8, 8)
    f.set_images(ref, tar)
    seeded = f.compute(pois)
    ic = oc.ICGN2D1(8, 8, 1e-4, 10)
    ic.set_images(ref, tar)
    ic.prepare()
    out = ic.compute(seeded)

    it = np.asarray(out.r[:, pm.R_ITER])
    z = np.asarray(out.r[:, pm.R_ZNCC])
    assert (z > 0).mean() > 0.95
    # phase 2 must actually have run: a majority converge early while a
    # nonempty straggler set iterates past the compaction point
    assert (it[z > 0] <= 4).mean() > 0.3 and it.max() >= 5

    halves = []
    for sl in (slice(0, 2050), slice(2050, 4100)):
        sub = jax.tree_util.tree_map(lambda a: a[sl], seeded)
        halves.append(ic.compute(sub))
    for field in ("p", "r"):
        full = np.asarray(getattr(out, field))
        split = np.concatenate([np.asarray(getattr(hh, field))
                                for hh in halves], axis=0)
        np.testing.assert_array_equal(full, split)
