"""ICLM / NR refinement tests."""

import numpy as np

import opencorr_tpu as oc
from opencorr_tpu.data import poi as poi_mod


def _seeded(ref, tar):
    pois = oc.poi_grid_2d((30, 30), 8, 6, 14)
    f = oc.FFTCC2D(10, 10)
    f.set_images(ref, tar)
    return f.compute(pois)


def test_iclm1_subpixel(speckle_pair_2d):
    ref, tar, tu, tv = speckle_pair_2d
    m = oc.ICLM2D1(10, 10, 0.001, 10)
    m.set_images(ref, tar)
    m.prepare()
    out = m.compute(_seeded(ref, tar))
    z = np.asarray(out.zncc)
    conv = z > 0
    assert conv.mean() > 0.9
    assert abs(np.asarray(out.u)[conv].mean() - tu) < 0.02
    assert abs(np.asarray(out.v)[conv].mean() - tv) < 0.02


def test_iclm2_subpixel(speckle_pair_2d):
    ref, tar, tu, tv = speckle_pair_2d
    m = oc.ICLM2D2(10, 10, 0.001, 10)
    m.set_images(ref, tar)
    m.prepare()
    out = m.compute(_seeded(ref, tar))
    z = np.asarray(out.zncc)
    conv = z > 0
    assert conv.mean() > 0.7
    assert abs(np.asarray(out.u)[conv].mean() - tu) < 0.03
    assert abs(np.asarray(out.v)[conv].mean() - tv) < 0.03


def test_nr1_subpixel(speckle_pair_2d):
    ref, tar, tu, tv = speckle_pair_2d
    m = oc.NR2D1(10, 10, 0.001, 10)
    m.set_images(ref, tar)
    m.prepare()
    out = m.compute(_seeded(ref, tar))
    z = np.asarray(out.zncc)
    conv = z > 0
    assert conv.mean() > 0.9
    assert abs(np.asarray(out.u)[conv].mean() - tu) < 0.02
    assert abs(np.asarray(out.v)[conv].mean() - tv) < 0.02


def test_nr_guard_code_minus_one(speckle_pair_2d):
    """NR's guard failure code is -1, not -3 (oc_nr.cpp:170)."""
    ref, tar, _, _ = speckle_pair_2d
    m = oc.NR2D1(16, 16, 0.001, 10)
    m.set_images(ref, tar)
    m.prepare()
    t = oc.new_table_2d([2.0], [2.0])  # border violation
    out = m.compute(t)
    assert float(out.zncc[0]) == -1.0


def test_iclm_agrees_with_icgn(speckle_pair_2d):
    ref, tar, _, _ = speckle_pair_2d
    seeded = _seeded(ref, tar)
    a = oc.ICGN2D1(10, 10, 0.001, 10)
    b = oc.ICLM2D1(10, 10, 0.001, 10)
    for m in (a, b):
        m.set_images(ref, tar)
        m.prepare()
    oa = a.compute(seeded)
    ob = b.compute(seeded)
    za = np.asarray(oa.zncc)
    zb = np.asarray(ob.zncc)
    both = (za > 0) & (zb > 0)
    assert both.mean() > 0.8
    assert np.abs(np.asarray(oa.u) - np.asarray(ob.u))[both].mean() < 1e-3


def test_iclm_self_adaptive_matches_fixed(speckle_pair_2d):
    import jax.numpy as jnp

    ref, tar, tu, tv = speckle_pair_2d
    pois = oc.poi_grid_2d((35, 35), 5, 4, 15)
    f = oc.FFTCC2D(10, 10)
    f.set_images(ref, tar)
    pois = f.compute(pois)

    fixed = oc.ICLM2D1(10, 10, 0.001, 10)
    fixed.set_images(ref, tar)
    fixed.prepare()
    base = fixed.compute(pois)

    adap = oc.ICLM2D1(10, 10, 0.001, 10)
    adap.set_images(ref, tar)
    adap.prepare()
    adap.set_self_adaptive(True)
    out = adap.compute(pois.replace(sr=jnp.full((pois.n, 2), 10.0, jnp.float32)))

    assert np.allclose(np.asarray(base.p), np.asarray(out.p), atol=1e-4)
    assert np.allclose(np.asarray(base.zncc), np.asarray(out.zncc), atol=1e-4)
