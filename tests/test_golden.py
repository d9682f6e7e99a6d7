"""Golden-file regression vs the reference's committed result tables
(SURVEY.md §4: the reference's own test model)."""

import os

import numpy as np
import pytest

import opencorr_tpu as oc

GOLD_2D = "/root/reference/examples/2d_dic"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLD_2D), reason="reference goldens not mounted"
)


def test_fftcc_icgn1_vs_golden_subsample():
    """test_2d_dic_fftcc_icgn1 on a 1/10 subsample of the 30k POI grid: the
    displacement field must match the committed golden within 0.01 px mean."""
    ref = oc.Image2D.load(f"{GOLD_2D}/oht_cfrp_0.bmp")
    tar = oc.Image2D.load(f"{GOLD_2D}/oht_cfrp_4.bmp")
    gold = np.genfromtxt(f"{GOLD_2D}/oht_cfrp_4_fftcc_icgn1_r16.csv",
                         delimiter=",", skip_header=1)
    idx = np.arange(0, gold.shape[0], 10)
    g = gold[idx]
    pois = oc.new_table_2d(g[:, 0], g[:, 1])

    f = oc.FFTCC2D(16, 16)
    f.set_images(ref, tar)
    pois = f.compute(pois)
    # Integer guesses match the golden u0/v0 exactly except for exact
    # correlation-peak ties (2/30000 on the full grid, where FFTW's last-bit
    # rounding picks the other bin).  The exact integer peak re-rank in
    # ops/fftcc.py makes this hold on TPU too (the TPU f32 FFT alone flips
    # ~3% of near-ties); tie-break matches the reference's
    # first-max-in-scan-order (oc_fftcc.cpp:246-255).
    u0 = np.asarray(pois.u)
    v0 = np.asarray(pois.v)
    assert ((u0 == g[:, 4]) & (v0 == g[:, 5])).mean() > 0.999

    icgn = oc.ICGN2D1(16, 16, 0.001, 10)
    icgn.set_images(ref, tar)
    icgn.prepare()
    pois = icgn.compute(pois)
    u = np.asarray(pois.u)
    v = np.asarray(pois.v)
    z = np.asarray(pois.zncc)
    ok = (g[:, 6] > 0) & (z > 0)
    assert ok.mean() > 0.9
    # With the exact integer peak re-rank, the full-grid TPU run reproduces
    # the golden field to 2.4e-7 px mean / 1.1e-6 px p99 (f32 ulp level) —
    # the threshold below only leaves headroom for a subsampled tie POI.
    du = np.abs(u - g[:, 2])[ok]
    dv = np.abs(v - g[:, 3])[ok]
    assert du.mean() < 1e-3, du.mean()
    assert dv.mean() < 1e-3, dv.mean()
    # ZNCC agreement
    assert np.abs(z - g[:, 6])[ok].mean() < 1e-3


def test_load_golden_table_roundtrip(tmp_path):
    from opencorr_tpu.io import table as io_table

    t = io_table.load_table_2d(f"{GOLD_2D}/oht_cfrp_4_fftcc_icgn1_r16.csv")
    assert t.n == 30000
    assert abs(float(t.x[0]) - 30.0) < 1e-6
    assert abs(float(t.p[0, 0]) - (-0.41521394)) < 1e-6
    # write back and re-read
    out = tmp_path / "x.csv"
    io_table.save_table_2d(str(out), t)
    t2 = io_table.load_table_2d(str(out))
    assert np.allclose(np.asarray(t.p), np.asarray(t2.p), atol=1e-6)
    assert np.allclose(np.asarray(t.r), np.asarray(t2.r), atol=1e-6)


def test_fftcc_nr1_vs_golden_subsample():
    """test_2d_dic_fftcc_nr1 vs its committed golden (1/20 subsample)."""
    ref = oc.Image2D.load(f"{GOLD_2D}/oht_cfrp_0.bmp")
    tar = oc.Image2D.load(f"{GOLD_2D}/oht_cfrp_4.bmp")
    gold = np.genfromtxt(f"{GOLD_2D}/oht_cfrp_4_fftcc_nr1_r16.csv",
                         delimiter=",", skip_header=1)
    g = gold[::20]
    pois = oc.new_table_2d(g[:, 0], g[:, 1])
    f = oc.FFTCC2D(16, 16)
    f.set_images(ref, tar)
    pois = f.compute(pois)
    nr = oc.NR2D1(16, 16, 0.001, 10)
    nr.set_images(ref, tar)
    nr.prepare()
    out = nr.compute(pois)
    z = np.asarray(out.zncc)
    ok = (z > 0) & (g[:, 6] > 0)
    assert ok.mean() > 0.9
    assert np.abs(np.asarray(out.u) - g[:, 2])[ok].mean() < 0.01
    assert np.abs(np.asarray(out.v) - g[:, 3])[ok].mean() < 0.01


def test_sift_icgn2_vs_gpu_golden_subsample():
    """SIFT + FeatureAffine + ICGN2 vs the committed GPU-run golden table
    (the reference's CPU-vs-GPU cross-validation twin, SURVEY.md §4.3)."""
    ref = oc.Image2D.load(f"{GOLD_2D}/oht_cfrp_0.bmp")
    tar = oc.Image2D.load(f"{GOLD_2D}/oht_cfrp_4.bmp")
    gold = np.genfromtxt(f"{GOLD_2D}/oht_cfrp_4_sift_icgn2(gpu)_r16.csv",
                         delimiter=",", skip_header=1)
    g = gold[::20]
    sift = oc.SIFT2D()
    sift.set_images(ref, tar)
    sift.prepare()
    sift.compute()
    fa = oc.FeatureAffine2D(16, 16)
    fa.set_keypoint_pair(sift.ref_matched_kp, sift.tar_matched_kp)
    pois = fa.compute(oc.new_table_2d(g[:, 0], g[:, 1]))
    ic2 = oc.ICGN2D2(16, 16, 0.001, 10)
    ic2.set_images(ref, tar)
    ic2.prepare()
    out = ic2.compute(pois)
    z = np.asarray(out.zncc)
    ok = (z > 0.9) & (g[:, 6] > 0.9)
    assert ok.mean() > 0.8
    # a handful of weak-texture POIs near the specimen hole land in different
    # local optima than the golden run; gate on the robust center instead
    assert np.median(np.abs(np.asarray(out.u) - g[:, 2])[ok]) < 0.01
    assert np.median(np.abs(np.asarray(out.v) - g[:, 3])[ok]) < 0.01


def test_strain_vs_golden_eyy_map():
    """test_2d_dic_strain: resume from the golden ICGN table, compute strain
    (r=20), compare eyy at every POI against the committed eyy value map."""
    from opencorr_tpu.io import table as io_table

    pois = io_table.load_table_2d(f"{GOLD_2D}/oht_cfrp_4_fftcc_icgn1_r16.csv")
    strain = oc.Strain(subregion_radius=20.0, neighbor_number_min=5)
    out = strain.compute(pois)
    gold_map = np.genfromtxt(f"{GOLD_2D}/oht_cfrp_4_eyy.csv", delimiter=",")
    xs = np.asarray(pois.x).astype(np.int32)
    ys = np.asarray(pois.y).astype(np.int32)
    gold_eyy = gold_map[ys, xs]
    eyy = np.asarray(out.e)[:, 1]
    sel = np.asarray(pois.zncc) > 0.9
    d = np.abs(eyy - gold_eyy)[sel]
    assert d.mean() < 1e-6, d.mean()
    assert d.max() < 1e-4, d.max()


def test_gt4_stereo_pipeline_vs_golden_subsample():
    """Full GT4 stereo pipeline (epipolar + SIFT + triangulation,
    test_3d_dic_epipolar_sift.cpp) on a 1/20 POI subsample vs the committed
    golden table.  SIFT runs on the OpenCV backend here to keep the CPU gate
    fast — the TPU SIFT backend has its own gates (test_sift2d.py and
    test_sift_icgn2_vs_gpu_golden_subsample)."""
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "stereo_example",
        _os.path.join(_os.path.dirname(__file__), "..", "examples",
                      "stereo_3d_dic_epipolar_sift.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    stride = 20
    result, _ = mod.run(out_path="/tmp/gt4_test.csv", poi_stride=stride,
                        sift_backend="opencv", sift_features=20000)
    gold = np.genfromtxt(
        "/root/reference/examples/3d_dic/GT4-0273_0_epipolar_sift_r16.csv",
        delimiter=",", skip_header=1)[::stride]
    u = np.asarray(result.p)[:, 0]
    v = np.asarray(result.p)[:, 1]
    w = np.asarray(result.p)[:, 2]
    zmin = np.asarray(result.r)[:, 0:3].min(axis=1)
    gz = gold[:, 5:8].min(axis=1)
    ok = (zmin > 0.9) & (gz > 0.9)
    assert ok.mean() > 0.9
    du = np.abs(u - gold[:, 2])[ok]
    dv = np.abs(v - gold[:, 3])[ok]
    dw = np.abs(w - gold[:, 4])[ok]
    assert du.mean() < 0.01, du.mean()
    assert dv.mean() < 0.01, dv.mean()
    assert dw.mean() < 0.01, dw.mean()
