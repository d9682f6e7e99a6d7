"""Volume-block sharding with halo exchange: sharded DVC ICGN must match the
single-device result."""

import jax
import numpy as np

import opencorr_tpu as oc
from opencorr_tpu.parallel import halo as halo_mod
from opencorr_tpu.parallel import mesh as mesh_mod


def test_sharded_icgn3d_matches_single(speckle_pair_3d):
    ref, tar, tu, tv, tw = speckle_pair_3d  # 48^3 volume
    # 8 virtual devices -> z-blocks of 6; halo needs small radii
    r = 3
    pois = oc.poi_grid_3d((14, 14, 14), 3, 3, 3, 7)
    f = oc.FFTCC3D(6, 6, 6)
    f.set_images(ref, tar)
    pois = f.compute(pois)

    single = oc.ICGN3D1(r, r, r, 0.001, 10)
    single.set_images(ref, tar)
    single.prepare()
    base = single.compute(pois)

    mesh = mesh_mod.make_mesh(4, axis="z")  # blocks of 12 >= halo 12
    sharded = halo_mod.ShardedICGN3D1(r, r, r, 0.001, 10)
    sharded.set_images(ref, tar)
    out = sharded.compute(pois, mesh)

    zb = np.asarray(base.zncc)
    zo = np.asarray(out.zncc)
    ok = (zb > 0) & (zo > 0)
    assert ok.mean() > 0.8
    du = np.abs(np.asarray(base.u) - np.asarray(out.u))[ok]
    dv = np.abs(np.asarray(base.v) - np.asarray(out.v))[ok]
    dw = np.abs(np.asarray(base.w) - np.asarray(out.w))[ok]
    # block-local prefilter vs global prefilter differ only by tap decay
    assert du.max() < 1e-3
    assert dv.max() < 1e-3
    assert dw.max() < 1e-3


def test_sharded_edge_blocks_match_clamped_global(speckle_pair_3d):
    """POIs whose subsets touch the global z boundary: the edge blocks'
    clamp-filled halos must reproduce the global clamped prefilter and the
    zeroed gradient_z border, not the old wrapped slabs."""
    ref, tar, tu, tv, tw = speckle_pair_3d  # 48^3 volume
    r = 3
    # subsets span z in [1, 7] and [38, 44]: prefilter taps reach past the
    # global edges and gradient_z's 2-px zero border is inside the low subset
    # (the w=+1 integer seed must keep the warped subset under the dim-2 guard)
    t = oc.new_table_3d([12.0, 36.0, 12.0], [12.0, 36.0, 12.0], [4.0, 41.0, 4.0])
    # seed the integer-rounded true shift (FFTCC's radius would cross the edge)
    p = np.zeros((3, 12), np.float32)
    p[:, 0], p[:, 4], p[:, 8] = round(tu), round(tv), round(tw)
    t = t.replace(p=p)

    single = oc.ICGN3D1(r, r, r, 0.001, 10)
    single.set_images(ref, tar)
    single.prepare()
    base = single.compute(t)

    mesh = mesh_mod.make_mesh(4, axis="z")
    m = halo_mod.ShardedICGN3D1(r, r, r, 0.001, 10)
    m.set_images(ref, tar)
    out = m.compute(t, mesh)

    zb = np.asarray(base.zncc)
    zo = np.asarray(out.zncc)
    assert (zb > 0).all(), zb
    np.testing.assert_allclose(zo, zb, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.u), np.asarray(base.u), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.w), np.asarray(base.w), atol=1e-4)


def test_sharded_global_boundary_guard(speckle_pair_3d):
    ref, tar, _, _, _ = speckle_pair_3d
    r = 3
    t = oc.new_table_3d([20.0, 20.0], [20.0, 20.0], [1.0, 24.0])
    # seed the interior POI so the zero-guess basin isn't an issue
    f = oc.FFTCC3D(6, 6, 6)
    f.set_images(ref, tar)
    t = f.compute(t)
    mesh = mesh_mod.make_mesh(4, axis="z")
    m = halo_mod.ShardedICGN3D1(r, r, r, 0.01, 10)
    m.set_images(ref, tar)
    out = m.compute(t, mesh)
    single = oc.ICGN3D1(r, r, r, 0.01, 10)
    single.set_images(ref, tar)
    single.prepare()
    base = single.compute(t)
    z = np.asarray(out.zncc)
    assert z[0] == -3.0  # subset crosses global z edge
    assert abs(z[1] - float(base.zncc[1])) < 1e-3
    assert abs(float(out.u[1]) - float(base.u[1])) < 1e-3


def test_sharded_lattice_fallback_matches_single(speckle_pair_3d):
    """A high-strain seed (|exx| > D/r) overflows the lattice wobble bound,
    so the sharded lattice path must take its in-program exact fallback —
    and still match the single-chip result (which falls back the same way)."""
    ref, tar, tu, tv, tw = speckle_pair_3d
    r = 3
    t = oc.new_table_3d([20.0, 24.0], [20.0, 24.0], [20.0, 28.0])
    p = np.zeros((2, 12), np.float32)
    p[:, 0], p[:, 4], p[:, 8] = round(tu), round(tv), round(tw)
    p[0, 1] = 0.6  # uxx: lattice deviation 0.6*r ~ 1.8 > D=1 -> fallback
    t = t.replace(p=p)

    single = oc.ICGN3D1(r, r, r, 0.001, 10)
    single.set_images(ref, tar)
    single.prepare()
    base = single.compute(t)

    mesh = mesh_mod.make_mesh(4, axis="z")
    m = halo_mod.ShardedICGN3D1(r, r, r, 0.001, 10)
    m.set_images(ref, tar)
    assert m.eval_mode == "lattice" and m.window_margin == 8
    out = m.compute(t, mesh)

    np.testing.assert_allclose(
        np.asarray(out.zncc), np.asarray(base.zncc), atol=1e-5)
    for f in ("u", "v", "w"):
        np.testing.assert_allclose(np.asarray(getattr(out, f)),
                                   np.asarray(getattr(base, f)), atol=1e-3)
