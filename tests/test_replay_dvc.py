"""DVC numerics gate: the TPU FFTCC3D + ICGN3D1 path vs the committed f64
reference-replay fixture (tests/replay_dvc.py; VERDICT round-3 item 3).

Unlike the synthetic-truth tests (which check the *physics*), this gates the
implementation against the reference's *numerics* — the replay reimplements
``oc_fftcc.cpp:327-427`` / ``oc_icgn.cpp:1270-1490`` /
``oc_cubic_bspline.cpp:214-405`` scalar-faithfully in f64, so any semantic
drift (window conventions, unwrap, zero-mean order, warp composition,
failure codes) shows up here even without the al_foam4 download.  Tolerance
0.01 voxel absorbs the f32-vs-f64 accumulation difference.
"""

import os

import numpy as np

import opencorr_tpu as oc
from opencorr_tpu.data import poi as poi_mod

from replay_dvc import CONV, R, STOP, poi_grid, synth_pair

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "dvc_replay.npz")


def test_dvc_pipeline_matches_reference_replay():
    fx = np.load(FIXTURE)
    ref, tar = synth_pair()
    xs, ys, zs = poi_grid()
    np.testing.assert_array_equal(fx["x"], xs)  # fixture is current

    pois = oc.new_table_3d(xs.astype(np.float32), ys.astype(np.float32),
                           zs.astype(np.float32))
    f = oc.FFTCC3D(R, R, R)
    f.set_images(ref.astype(np.float32), tar.astype(np.float32))
    pois = f.compute(pois)

    # Integer initial guesses must match the replay exactly (the exact
    # int-rerank removes f32 peak ambiguity; the speckle has sharp peaks).
    assert np.array_equal(np.asarray(pois.u), fx["u0"]), (
        np.asarray(pois.u), fx["u0"])
    assert np.array_equal(np.asarray(pois.v), fx["v0"])
    assert np.array_equal(np.asarray(pois.w), fx["w0"])
    # FFTCC ZNCC to f32 tolerance.
    np.testing.assert_allclose(np.asarray(pois.zncc), fx["fftcc_zncc"],
                               atol=2e-4)

    ic = oc.ICGN3D1(R, R, R, CONV, STOP)
    ic.set_images(ref.astype(np.float32), tar.astype(np.float32))
    ic.prepare()
    pois = ic.compute(pois)

    zncc = np.asarray(pois.zncc)
    # Same failure-code pattern (all converge in this fixture).
    assert np.array_equal(zncc > 0, fx["zncc"] > 0)
    ok = fx["zncc"] > 0
    assert ok.all(), "fixture expected to converge everywhere"
    p = np.asarray(pois.p)
    for col, name in ((0, "u"), (4, "v"), (8, "w")):
        d = np.abs(p[ok, col] - fx["p"][ok, col])
        assert d.max() < 0.01, f"{name}: max |Δ| = {d.max():.2e} voxel"
    np.testing.assert_allclose(zncc[ok], fx["zncc"][ok], atol=2e-3)
    # Iteration counts should agree (f32 vs f64 may flip a borderline step).
    assert np.abs(np.asarray(pois.r)[:, poi_mod.R3_ITER]
                  - fx["iters"]).max() <= 1
