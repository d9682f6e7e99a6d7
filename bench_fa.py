"""FeatureAffine micro-bench on the TPU: measures the 2D 30k-POI stage and a
FA3D Torus-shaped stage, steady-state, before any device->host transfer
(CLAUDE.md tunnel gotcha).  Prints one JSON line per stage.

Usage: python bench_fa.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax

import opencorr_tpu as oc


def median_time(fn, reps=7):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)

    # --- fa_2d_30k: same workload as bench_report.py -----------------------
    pois = oc.poi_grid_2d((30, 30), 100, 300, 2)
    jj, ii = np.meshgrid(np.arange(100), np.arange(300))
    pts30k = np.stack([(30 + jj * 2).reshape(-1), (30 + ii * 2).reshape(-1)],
                      -1).astype(np.float32)
    kp_ref = rng.uniform([20, 20], [260, 880], (8000, 2)).astype(np.float32)
    kp_tar = kp_ref + np.array([0.5, -4.0], np.float32)
    fa = oc.FeatureAffine2D(16, 16)
    fa.set_keypoint_pair(kp_ref, kp_tar)
    fa.prepare(pois, points=pts30k)
    idx, _, _ = fa._candidates(pois, points=pts30k)
    dt = median_time(lambda: fa.compute(pois).p)
    print(json.dumps({"stage": "fa_2d_30k", "seconds": round(dt, 5),
                      "kc_eff": int(idx.shape[1]),
                      "poi_per_s": round(30000 / dt)}), flush=True)

    # --- fa_3d Torus-shaped: 78,700 POIs, keypoint density like the DVC run -
    n_kp = 60000
    dims = np.array([940.0, 288.0, 568.0], np.float32)  # x, y, z
    kp3 = rng.uniform([20, 20, 20], dims - 20, (n_kp, 3)).astype(np.float32)
    kp3t = kp3 + np.array([0.8, -0.4, 0.3], np.float32)
    n_poi = 78700
    q3 = rng.uniform([24, 24, 24], dims - 24, (n_poi, 3)).astype(np.float32)
    t3 = oc.new_table_3d(q3[:, 0], q3[:, 1], q3[:, 2])
    fa3 = oc.FeatureAffine3D(16, 16, 16)
    fa3.set_keypoint_pair(kp3, kp3t)
    fa3.prepare(t3, points=q3)
    idx3, _, _ = fa3._candidates(t3, points=q3)
    dt3 = median_time(lambda: fa3.compute(t3).p, reps=5)
    print(json.dumps({"stage": "fa_3d_torus_79k", "seconds": round(dt3, 5),
                      "kc_eff": int(idx3.shape[1]),
                      "poi_per_s": round(n_poi / dt3)}), flush=True)


if __name__ == "__main__":
    main()
