"""2D DIC workloads: every planar pipeline from the reference example suite.

One script covers the reference programs (6_Examples.md):

* ``fftcc_icgn1``  — test_2d_dic_fftcc_icgn1.cpp (path-independent DIC)
* ``fftcc_iclm1``  — test_2d_dic_fftcc_iclm1.cpp
* ``fftcc_nr1``    — test_2d_dic_fftcc_nr1.cpp
* ``sift_icgn2``   — test_2d_dic_sift_icgn2.cpp (large rotation)
* ``sift_iclm2``   — test_2d_dic_sift_iclm2.cpp
* ``self_adaptive``— test_2d_dic_self_adaptive_subset.cpp
* ``strain``       — test_2d_dic_strain.cpp (resume from a result table)

Usage:
  python examples/dic_2d.py fftcc_icgn1 <ref> <tar> [out_prefix]
  python examples/dic_2d.py strain <table_csv> [out_prefix]

With no image arguments, the reference's shipped datasets are used.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

import opencorr_tpu as oc
from opencorr_tpu.io import table as io_table
from opencorr_tpu.utils.timing import StageTimer

REF_DIR = "/root/reference/examples/2d_dic"


def _grid_for(workload):
    # grids per the reference example programs
    if workload in ("fftcc_icgn1", "fftcc_iclm1", "fftcc_nr1"):
        return oc.poi_grid_2d((30, 30), 100, 300, 2)  # oht_cfrp
    if workload in ("sift_icgn2", "sift_iclm2"):
        return oc.poi_grid_2d((50, 50), 205, 205, 2)  # rotation
    if workload == "self_adaptive":
        return oc.poi_grid_2d((50, 50), 480, 80, 5)  # utn
    raise ValueError(workload)


def _default_images(workload):
    if workload in ("fftcc_icgn1", "fftcc_iclm1", "fftcc_nr1"):
        return f"{REF_DIR}/oht_cfrp_0.bmp", f"{REF_DIR}/oht_cfrp_4.bmp"
    if workload in ("sift_icgn2", "sift_iclm2"):
        return f"{REF_DIR}/rotation_000.tif", f"{REF_DIR}/rotation_170.tif"
    if workload == "self_adaptive":
        return f"{REF_DIR}/utn_00.bmp", f"{REF_DIR}/utn_30.bmp"
    raise ValueError(workload)


def run(workload: str, ref_path=None, tar_path=None, out_prefix="/tmp/dic2d"):
    timer = StageTimer()

    if workload == "strain":
        table_path = ref_path or f"{REF_DIR}/oht_cfrp_4_fftcc_icgn1_r16.csv"
        pois = io_table.load_table_2d(table_path)
        strain = oc.Strain(subregion_radius=20.0, neighbor_number_min=5)
        with timer.stage("Strain calculation"):
            strain.prepare(pois)
            pois = strain.compute(pois)
            jax.block_until_ready(pois.e)
        io_table.save_table_2d(f"{out_prefix}_strain_r20.csv", pois)
        io_table.save_map_2d(f"{out_prefix}_eyy.csv", pois, "eyy", 900, 280)
        timer.save_csv(f"{out_prefix}_strain_r20_time.csv", pois.n)
        return pois, timer

    if ref_path is None:
        ref_path, tar_path = _default_images(workload)
    ref = oc.Image2D.load(ref_path)
    tar = oc.Image2D.load(tar_path)
    pois = _grid_for(workload)
    rx = ry = {"fftcc_icgn1": 16, "fftcc_iclm1": 16, "fftcc_nr1": 16,
               "sift_icgn2": 12, "sift_iclm2": 12, "self_adaptive": 30}[workload]

    if workload.startswith("fftcc"):
        fftcc = oc.FFTCC2D(rx, ry)
        fftcc.set_images(ref, tar)
        with timer.stage("FFTCC"):
            pois = fftcc.compute(pois)
            jax.block_until_ready(pois.p)
        refine = {
            "fftcc_icgn1": oc.ICGN2D1,
            "fftcc_iclm1": oc.ICLM2D1,
            "fftcc_nr1": oc.NR2D1,
        }[workload](rx, ry, 0.001, 10)
        stage = workload.split("_")[1].upper()
        refine.set_images(ref, tar)
        with timer.stage(stage):
            refine.prepare()
            pois = refine.compute(pois)
            jax.block_until_ready(pois.p)
    elif workload.startswith("sift"):
        sift = oc.SIFT2D()
        sift.set_images(ref, tar)
        with timer.stage("SIFT"):
            sift.prepare()
            sift.compute()
        fa = oc.FeatureAffine2D(rx, ry)
        fa.set_keypoint_pair(sift.ref_matched_kp, sift.tar_matched_kp)
        with timer.stage("FeatureAffine"):
            pois = fa.compute(pois)
            jax.block_until_ready(pois.p)
        refine = (oc.ICGN2D2 if workload == "sift_icgn2" else oc.ICLM2D2)(
            rx, ry, 0.001, 10)
        refine.set_images(ref, tar)
        with timer.stage(workload.split("_")[1].upper()):
            refine.prepare()
            pois = refine.compute(pois)
            jax.block_until_ready(pois.p)
    elif workload == "self_adaptive":
        sift = oc.SIFT2D()
        sift.set_images(ref, tar)
        with timer.stage("Feature extraction and matching"):
            sift.prepare()
            sift.compute()
        fa = oc.FeatureAffine2D(rx, ry)
        # reference example: neighbor_num = 2 * getNeighborMin() = 14
        neighbor_num = 2 * fa.neighbor_number_min
        fa.set_search(float(np.sqrt(2.0 * rx * rx)), neighbor_num)
        fa.set_self_adaptive(True)
        fa.set_subset_adjustment(neighbor_num, 10)
        fa.set_keypoint_pair(sift.ref_matched_kp, sift.tar_matched_kp)
        with timer.stage("Subset optimization"):
            pois = fa.compute(pois)
            jax.block_until_ready(pois.p)
        icgn = oc.ICGN2D1(rx, ry, 0.001, 10)
        icgn.set_images(ref, tar)
        icgn.set_self_adaptive(True)
        with timer.stage("ICGN"):
            icgn.prepare()
            pois = icgn.compute(pois)
            jax.block_until_ready(pois.p)
        strain = oc.Strain(25.0, 10)
        with timer.stage("Strain"):
            pois = strain.compute(pois)
            jax.block_until_ready(pois.e)

    io_table.save_table_2d(f"{out_prefix}_{workload}.csv", pois)
    io_table.save_deformation_table_2d(
        f"{out_prefix}_{workload}_deformation.csv", pois)
    timer.save_csv(f"{out_prefix}_{workload}_time.csv", pois.n)
    return pois, timer


if __name__ == "__main__":
    wl = sys.argv[1] if len(sys.argv) > 1 else "fftcc_icgn1"
    _, timer = run(wl, *sys.argv[2:])
    print(timer.report())
