"""DVC (digital volume correlation) workloads.

Mirrors the reference programs:

* ``fftcc_icgn1`` — test_dvc_fftcc_icgn1.cpp (al_foam4: FFTCC3D + ICGN3D1, r=30)
* ``sift_icgn1``  — test_dvc_sift_icgn1.cpp (Torus: SIFT3D + FeatureAffine3D +
  ICGN3D1, r=16)
* ``strain``      — test_dvc_strain.cpp (resume from a result table)

The reference's CT volumes (al_foam4 .bin pair, the 103 MB Torus set) are
external downloads and not in the repo (examples/dvc/Torus_Images.txt); with no
volume arguments a synthetic deformed speckle volume demonstrates the full
pipeline.  Volumes load from OpenCorr .bin (int32[3] dims header + f32 payload)
or multi-page TIFF.

Usage: python examples/dvc.py [fftcc_icgn1|sift_icgn1|strain] [ref.bin tar.bin
       [poi_csv]] [out_prefix]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

import opencorr_tpu as oc
from opencorr_tpu.io import table as io_table
from opencorr_tpu.utils.timing import StageTimer


def synthetic_pair(d=96, seed=0):
    from scipy.ndimage import gaussian_filter, shift as ndshift

    rng = np.random.default_rng(seed)
    pad = 12
    base = gaussian_filter(
        rng.standard_normal((d + 2 * pad,) * 3).astype(np.float32), 1.4
    ) * 80 + 128
    ref = base[pad:-pad, pad:-pad, pad:-pad]
    tar = ndshift(base, (1.2, -0.8, 0.5), order=3)[pad:-pad, pad:-pad, pad:-pad]
    return oc.Image3D.from_array(ref), oc.Image3D.from_array(tar)


def run(workload="fftcc_icgn1", ref_path=None, tar_path=None, poi_csv=None,
        out_prefix="/tmp/dvc"):
    timer = StageTimer()

    if workload == "strain":
        pois = io_table.load_table_3d(ref_path)
        strain = oc.Strain(subregion_radius=30.0, neighbor_number_min=10)
        with timer.stage("Strain calculation"):
            pois = strain.compute(pois)
            jax.block_until_ready(pois.e)
        io_table.save_table_3d(f"{out_prefix}_strain_r30.csv", pois)
        timer.save_csv(f"{out_prefix}_strain_r30_time.csv", pois.n)
        return pois, timer

    if ref_path is None:
        ref, tar = synthetic_pair()
        r = 10
        pois = oc.poi_grid_3d((20, 20, 20), 6, 6, 6, 10)
    else:
        ref = oc.Image3D.load(ref_path)
        tar = oc.Image3D.load(tar_path)
        r = 30 if workload == "fftcc_icgn1" else 16
        if poi_csv:
            pts = np.genfromtxt(poi_csv, delimiter=",", skip_header=1,
                                dtype=np.float32)
            pois = oc.new_table_3d(pts[:, 0], pts[:, 1], pts[:, 2])
        else:
            pois = oc.poi_grid_3d(
                (40, 40, 40),
                (ref.dim_x - 80) // 20, (ref.dim_y - 80) // 20,
                (ref.dim_z - 80) // 20, 20)

    if workload == "fftcc_icgn1":
        fftcc = oc.FFTCC3D(r, r, r)
        fftcc.set_images(ref, tar)
        with timer.stage("FFTCC"):
            pois = fftcc.compute(pois)
            jax.block_until_ready(pois.p)
    else:  # sift_icgn1
        sift = oc.SIFT3D()
        sift.set_images(ref, tar)
        with timer.stage("SIFT"):
            sift.prepare()
            sift.compute()
        fa = oc.FeatureAffine3D(r, r, r)
        fa.set_keypoint_pair(sift.ref_matched_kp, sift.tar_matched_kp)
        with timer.stage("FeatureAffine"):
            pois = fa.compute(pois)
            jax.block_until_ready(pois.p)

    icgn = oc.ICGN3D1(r, r, r, 0.001, 10)
    icgn.set_images(ref, tar)
    with timer.stage("ICGN"):
        icgn.prepare()
        pois = icgn.compute(pois)
        jax.block_until_ready(pois.p)

    io_table.save_table_3d(f"{out_prefix}_{workload}.csv", pois)
    io_table.save_matrix_bin_3d(
        f"{out_prefix}_{workload}.bin", pois,
        dims=(ref.dim_x, ref.dim_y, ref.dim_z))
    timer.save_csv(f"{out_prefix}_{workload}_time.csv", pois.n)
    return pois, timer


if __name__ == "__main__":
    wl = sys.argv[1] if len(sys.argv) > 1 else "fftcc_icgn1"
    pois, timer = run(wl, *sys.argv[2:])
    z = np.asarray(pois.zncc)
    print(timer.report())
    print(f"converged {(z > 0.9).mean():.3f}  u med {np.median(np.asarray(pois.u)):.3f}"
          f"  v med {np.median(np.asarray(pois.v)):.3f}  w med {np.median(np.asarray(pois.w)):.3f}")
