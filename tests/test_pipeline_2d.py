"""Integration tests for the 2D pipeline on synthetic speckle with known
displacement, plus failure-code semantics."""

import jax.numpy as jnp
import numpy as np

import opencorr_tpu as oc
from opencorr_tpu.data import poi as poi_mod


def test_fftcc_integer_translation(speckle_pair_2d):
    ref, tar, tu, tv = speckle_pair_2d
    pois = oc.poi_grid_2d((30, 30), 10, 8, 12)
    f = oc.FFTCC2D(10, 10)
    f.set_images(ref, tar)
    pois = f.compute(pois)
    u = np.asarray(pois.u)
    v = np.asarray(pois.v)
    assert np.all(np.abs(u - tu) < 2) and np.all(np.abs(v - tv) < 2)
    assert np.mean(np.abs(u - tu) <= 1) > 0.8
    assert np.mean(np.abs(v - tv) <= 1) > 0.8
    assert np.asarray(pois.zncc).min() > 0.5
    # u0/v0 recorded (oc_fftcc.cpp:272-273)
    assert np.all(np.asarray(pois.r[:, poi_mod.R_U0]) == 0)


def test_fftcc_chained_initial_guess(speckle_pair_2d):
    """FFTCC starts its window from an existing initial displacement
    (oc_fftcc.cpp:187)."""
    ref, tar, tu, tv = speckle_pair_2d
    pois = oc.poi_grid_2d((40, 40), 4, 4, 10)
    pois = pois.replace(p=pois.p.at[:, poi_mod.U].set(2.0))
    f = oc.FFTCC2D(8, 8)
    f.set_images(ref, tar)
    out = f.compute(pois)
    assert np.all(np.abs(np.asarray(out.u) - round(tu)) <= 1)
    assert np.all(np.asarray(out.r[:, poi_mod.R_U0]) == 2.0)


def test_fftcc_exact_rerank_matches_f64(speckle_pair_2d):
    """For 8-bit images the exact int32 peak re-rank (ops/fftcc.py) must
    reproduce the f64 circular-correlation argmax (first max in scan order,
    oc_fftcc.cpp:246-255) on every POI."""
    ref, tar, tu, tv = speckle_pair_2d
    r8 = np.clip(np.round(ref), 0, 255).astype(np.float32)
    t8 = np.clip(np.round(tar), 0, 255).astype(np.float32)
    pois = oc.poi_grid_2d((30, 30), 12, 12, 9)
    f = oc.FFTCC2D(10, 10)
    f.set_images(oc.Image2D(r8), oc.Image2D(t8))
    out = f.compute(pois)
    u = np.asarray(out.u)
    v = np.asarray(out.v)

    x = np.asarray(pois.x).astype(int)
    y = np.asarray(pois.y).astype(int)
    rx = ry = 10
    for i in range(len(x)):
        rw = r8[y[i] - ry : y[i] + ry, x[i] - rx : x[i] + rx].astype(np.float64)
        tw = t8[y[i] - ry : y[i] + ry, x[i] - rx : x[i] + rx].astype(np.float64)
        rz = rw - rw.mean()
        tz = tw - tw.mean()
        corr = np.fft.irfft2(np.conj(np.fft.rfft2(rz)) * np.fft.rfft2(tz),
                             s=(2 * ry, 2 * rx))
        k = int(np.argmax(corr))
        du, dv = k % (2 * rx), k // (2 * rx)
        du = du - 2 * rx if du > rx else du
        dv = dv - 2 * ry if dv > ry else dv
        assert u[i] == du and v[i] == dv, (i, u[i], v[i], du, dv)


def test_fftcc_16bit_range_guard(speckle_pair_2d):
    """Integral images whose correlation would overflow int32 (16-bit scale)
    must fall back to the f32 peak, not silently corrupt the argmax."""
    ref, tar, tu, tv = speckle_pair_2d
    r16 = np.clip(np.round(ref), 0, 255).astype(np.float32) * 257.0
    t16 = np.clip(np.round(tar), 0, 255).astype(np.float32) * 257.0
    pois = oc.poi_grid_2d((30, 30), 10, 8, 12)
    f = oc.FFTCC2D(10, 10)
    f.set_images(oc.Image2D(r16), oc.Image2D(t16))
    out = f.compute(pois)
    u = np.asarray(out.u)
    v = np.asarray(out.v)
    # intensity scaling must not change the recovered displacement
    assert np.all(np.abs(u - tu) < 2) and np.all(np.abs(v - tv) < 2)
    assert np.asarray(out.zncc).min() > 0.5


def test_icgn1_subpixel(speckle_pair_2d):
    ref, tar, tu, tv = speckle_pair_2d
    pois = oc.poi_grid_2d((30, 30), 10, 8, 12)
    f = oc.FFTCC2D(10, 10)
    f.set_images(ref, tar)
    pois = f.compute(pois)
    icgn = oc.ICGN2D1(10, 10, 0.001, 10)
    icgn.set_images(ref, tar)
    icgn.prepare()
    pois = icgn.compute(pois)
    z = np.asarray(pois.zncc)
    conv = z > 0
    assert conv.mean() > 0.9
    assert abs(np.asarray(pois.u)[conv].mean() - tu) < 0.02
    assert abs(np.asarray(pois.v)[conv].mean() - tv) < 0.02
    assert np.asarray(pois.r[conv, poi_mod.R_CONV]).max() < 0.001
    assert np.all(np.asarray(pois.sr[conv]) == 10)


def test_icgn2_subpixel(speckle_pair_2d):
    ref, tar, tu, tv = speckle_pair_2d
    pois = oc.poi_grid_2d((30, 30), 8, 6, 14)
    f = oc.FFTCC2D(10, 10)
    f.set_images(ref, tar)
    pois = f.compute(pois)
    icgn = oc.ICGN2D2(10, 10, 0.001, 10)
    icgn.set_images(ref, tar)
    icgn.prepare()
    pois = icgn.compute(pois)
    z = np.asarray(pois.zncc)
    conv = z > 0
    assert conv.mean() > 0.9
    assert abs(np.asarray(pois.u)[conv].mean() - tu) < 0.02
    assert abs(np.asarray(pois.v)[conv].mean() - tv) < 0.02


def test_icgn_failure_codes(speckle_pair_2d):
    ref, tar, _, _ = speckle_pair_2d
    icgn = oc.ICGN2D1(16, 16, 0.001, 10)
    icgn.set_images(ref, tar)
    icgn.prepare()
    t = oc.new_table_2d([5.0, 40.0, 40.0, 40.0], [5.0, 40.0, 40.0, 40.0])
    # POI 2: prior failure propagates; POI 3: huge displacement -> -3
    t = t.replace(
        r=t.r.at[2, poi_mod.R_ZNCC].set(-1.0),
        p=t.p.at[3, poi_mod.U].set(1e4),
    )
    out = icgn.compute(t)
    z = np.asarray(out.zncc)
    assert z[0] == -3.0  # border guard
    assert z[1] > 0.0
    assert z[2] == -1.0  # prior code preserved (oc_icgn.cpp:165)
    assert z[3] == -3.0  # |u| >= width
    # failed POIs keep their deformation input
    assert np.asarray(out.p)[3, poi_mod.U] == 1e4


def test_icgn_oob_warp_aborts(speckle_pair_2d):
    """A guess that pushes the warped subset outside the target image hits the
    -1 interpolation sentinel -> ZNCC -3 (oc_icgn.cpp:244-255)."""
    ref, tar, _, _ = speckle_pair_2d
    icgn = oc.ICGN2D1(12, 12, 0.001, 10)
    icgn.set_images(ref, tar)
    icgn.prepare()
    t = oc.new_table_2d([20.0], [20.0])
    t = t.replace(p=t.p.at[0, poi_mod.U].set(-15.0))  # warp exits left edge
    out = icgn.compute(t)
    assert float(out.zncc[0]) == -3.0


def test_strain_linear_field():
    """A pure affine displacement field must reproduce its exact gradients."""
    pois = oc.poi_grid_2d((10, 10), 20, 15, 4)
    x = np.asarray(pois.x)
    y = np.asarray(pois.y)
    ux, uy, vx, vy = 1e-3, 2e-3, -5e-4, 3e-3
    u = 0.5 + ux * x + uy * y
    v = -0.2 + vx * x + vy * y
    p = np.zeros((pois.n, 12), np.float32)
    p[:, poi_mod.U] = u
    p[:, poi_mod.V] = v
    r = np.zeros((pois.n, 6), np.float32)
    r[:, poi_mod.R_ZNCC] = 0.99
    pois = pois.replace(p=jnp.asarray(p), r=jnp.asarray(r))
    strain = oc.Strain(subregion_radius=10.0, neighbor_number_min=5)
    out = strain.compute(pois)
    e = np.asarray(out.e)
    assert np.allclose(e[:, 0], ux, atol=1e-5)
    assert np.allclose(e[:, 1], vy, atol=1e-5)
    assert np.allclose(e[:, 2], 0.5 * (uy + vx), atol=1e-5)


def test_strain_zncc_gate():
    pois = oc.poi_grid_2d((10, 10), 8, 8, 4)
    r = np.zeros((pois.n, 6), np.float32)
    r[:, poi_mod.R_ZNCC] = 0.99
    r[0, poi_mod.R_ZNCC] = 0.5  # below threshold -> untouched
    p = np.zeros((pois.n, 12), np.float32)
    p[:, poi_mod.U] = 0.001 * np.asarray(pois.x)
    pois = pois.replace(p=jnp.asarray(p), r=jnp.asarray(r))
    out = oc.Strain(10.0, 5).compute(pois)
    e = np.asarray(out.e)
    assert e[0, 0] == 0.0
    assert abs(e[1, 0] - 0.001) < 1e-5


def test_green_lagrange():
    pois = oc.poi_grid_2d((10, 10), 10, 10, 4)
    x = np.asarray(pois.x)
    ux = 0.01
    p = np.zeros((pois.n, 12), np.float32)
    p[:, poi_mod.U] = ux * x
    r = np.zeros((pois.n, 6), np.float32)
    r[:, poi_mod.R_ZNCC] = 0.99
    pois = pois.replace(p=jnp.asarray(p), r=jnp.asarray(r))
    s = oc.Strain(12.0, 5)
    s.set_approximation(2)
    out = s.compute(pois)
    e = np.asarray(out.e)
    assert np.allclose(e[:, 0], ux + 0.5 * ux * ux, atol=1e-5)


def test_icgn_self_adaptive_matches_fixed(speckle_pair_2d):
    """With uniform per-POI radii, adaptive mode must equal the fixed kernel."""
    import jax.numpy as jnp

    ref, tar, tu, tv = speckle_pair_2d
    pois = oc.poi_grid_2d((35, 35), 6, 5, 15)
    f = oc.FFTCC2D(10, 10)
    f.set_images(ref, tar)
    pois = f.compute(pois)

    fixed = oc.ICGN2D1(10, 10, 0.001, 10)
    fixed.set_images(ref, tar)
    fixed.prepare()
    out_fixed = fixed.compute(pois)

    adap = oc.ICGN2D1(10, 10, 0.001, 10)
    adap.set_images(ref, tar)
    adap.prepare()
    adap.set_self_adaptive(True)
    pois_a = pois.replace(sr=jnp.full((pois.n, 2), 10.0, jnp.float32))
    out_a = adap.compute(pois_a)

    assert np.allclose(np.asarray(out_fixed.p), np.asarray(out_a.p), atol=1e-4)
    assert np.allclose(np.asarray(out_fixed.zncc), np.asarray(out_a.zncc),
                       atol=1e-4)


def test_icgn_self_adaptive_mixed_radii(speckle_pair_2d):
    import jax.numpy as jnp

    ref, tar, tu, tv = speckle_pair_2d
    pois = oc.poi_grid_2d((40, 40), 5, 4, 15)
    f = oc.FFTCC2D(10, 10)
    f.set_images(ref, tar)
    pois = f.compute(pois)
    rng = np.random.default_rng(0)
    radii = rng.integers(8, 16, (pois.n, 2)).astype(np.float32)
    pois = pois.replace(sr=jnp.asarray(radii))
    m = oc.ICGN2D1(10, 10, 0.001, 10)
    m.set_images(ref, tar)
    m.prepare()
    m.set_self_adaptive(True)
    out = m.compute(pois)
    z = np.asarray(out.zncc)
    ok = z > 0
    assert ok.mean() > 0.8
    assert abs(np.asarray(out.u)[ok].mean() - tu) < 0.02
    assert abs(np.asarray(out.v)[ok].mean() - tv) < 0.02


def test_icgn_center_offset_chunked_matches_unchunked(speckle_pair_2d):
    """Center offsets ([N, 2], the stereo overload oc_icgn.cpp:353-560) must
    be padded/sliced alongside the table when the queue exceeds chunk_size."""
    ref, tar, tu, tv = speckle_pair_2d
    pois = oc.poi_grid_2d((30, 30), 6, 5, 9)
    f = oc.FFTCC2D(10, 10)
    f.set_images(ref, tar)
    pois = f.compute(pois)
    rng = np.random.default_rng(0)
    offs = rng.uniform(-0.4, 0.4, size=(pois.n, 2)).astype(np.float32)

    whole = oc.ICGN2D1(10, 10, 0.001, 10)
    whole.set_images(ref, tar)
    whole.prepare()
    base_out = whole.compute(pois, center_offset=offs)

    small = oc.ICGN2D1(10, 10, 0.001, 10, chunk_size=128)
    small.set_images(ref, tar)
    small.prepare()
    out = small.compute(pois, center_offset=offs)

    np.testing.assert_allclose(np.asarray(out.u), np.asarray(base_out.u),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.v), np.asarray(base_out.v),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.zncc),
                               np.asarray(base_out.zncc), atol=1e-6)


def test_strain_knn_fallback_large_neighbor_min():
    """neighbor_number_min beyond the old kmax=16 cap must still fit: sparse
    POIs force the exact-k KNN fallback (oc_strain.cpp:173-188 with
    search_k = neighbor_number_min)."""
    rng = np.random.default_rng(3)
    n = 400
    x = rng.uniform(0, 200, n).astype(np.float32)
    y = rng.uniform(0, 200, n).astype(np.float32)
    exx, eyy, exy_u, exy_v = 0.01, -0.005, 0.002, 0.004
    u = exx * x + exy_u * y
    v = exy_v * x + eyy * y
    t = oc.new_table_2d(x, y)
    p = np.zeros((n, 12), np.float32)
    p[:, poi_mod.U] = u
    p[:, poi_mod.V] = v
    r = np.zeros_like(np.asarray(t.r))
    r[:, poi_mod.R_ZNCC] = 0.99
    t = t.replace(p=p, r=jnp.asarray(r))

    # radius too small for 24 neighbors at this density -> KNN fallback
    strain = oc.Strain(subregion_radius=6.0, neighbor_number_min=24)
    out = strain.compute(t)
    e = np.asarray(out.e)
    assert np.abs(e[:, 0] - exx).max() < 1e-4
    assert np.abs(e[:, 1] - eyy).max() < 1e-4
    assert np.abs(e[:, 2] - 0.5 * (exy_u + exy_v)).max() < 1e-4


def test_strain_grid_path_matches_kdtree_path():
    """The grid-stencil fast path and the general cKDTree path must select
    identical neighbor sets (strict dist < radius) and produce the same fit."""
    from opencorr_tpu.ops import strain as strain_ops

    rng = np.random.default_rng(1)
    xs, ys = np.meshgrid(np.arange(40) * 2.0 + 30, np.arange(25) * 2.0 + 40)
    x = xs.ravel().astype(np.float32)
    y = ys.ravel().astype(np.float32)
    n = x.size
    u = 0.01 * x + 0.003 * y + rng.normal(0, 0.01, n)
    v = -0.002 * x + 0.008 * y + rng.normal(0, 0.01, n)
    t = oc.new_table_2d(x, y)
    p = np.zeros((n, 12), np.float32)
    p[:, poi_mod.U] = u
    p[:, poi_mod.V] = v
    r = np.zeros_like(np.asarray(t.r))
    # fail a random subset to exercise the zncc filter
    zn = np.where(rng.uniform(size=n) < 0.1, -3.0, 0.99)
    r[:, poi_mod.R_ZNCC] = zn
    t = t.replace(p=p, r=jnp.asarray(r))

    s = oc.Strain(subregion_radius=10.0, neighbor_number_min=5)
    out_grid = s.compute(t)
    assert s._grid_2d(x, y) is not None  # grid path actually taken

    # force the scattered path by perturbing nothing but the dispatch:
    nb_idx, nb_ok, use_radius = s._neighbors(np.stack([x, y], -1))
    e_kd = strain_ops.strain2d(
        t.x, t.y, jnp.asarray(u, jnp.float32), jnp.asarray(v, jnp.float32),
        t.r[:, poi_mod.R_ZNCC],
        t.x, t.y, t.r[:, poi_mod.R_ZNCC], t.e,
        nb_idx, nb_ok, use_radius,
        jnp.float32(10.0), jnp.float32(0.9), jnp.float32(5),
        approximation=1)
    np.testing.assert_allclose(np.asarray(out_grid.e), np.asarray(e_kd),
                               atol=2e-6)
