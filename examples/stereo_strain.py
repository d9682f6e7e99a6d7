"""Stereo/3D DIC strain (reference: test_3d_dic_strain.cpp): resume from a
stereo result table, fit strains against the reconstructed 3D coordinates.

Usage: python examples/stereo_strain.py [table_2ds_csv] [out_csv]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

import opencorr_tpu as oc
from opencorr_tpu.io import table as io_table
from opencorr_tpu.utils.timing import StageTimer


def run(table_path="/root/reference/examples/3d_dic/GT4-0273_0_epipolar_sift_r16.csv",
        out_path="/tmp/GT4-0273_0_strain_r20.csv"):
    pois = io_table.load_table_2ds(table_path)
    strain = oc.Strain(subregion_radius=20.0, neighbor_number_min=5)
    timer = StageTimer()
    with timer.stage("Strain calculation"):
        pois = strain.compute(pois)
        jax.block_until_ready(pois.e)
    io_table.save_table_2ds(out_path, pois)
    timer.save_csv(out_path.replace(".csv", "_time.csv"), pois.n)
    return pois, timer


if __name__ == "__main__":
    pois, timer = run(*sys.argv[1:])
    e = np.asarray(pois.e)
    print(timer.report())
    print("exx stats:", np.percentile(e[:, 0], [5, 50, 95]))
