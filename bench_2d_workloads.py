"""Per-stage TPU timings for the remaining 2D baseline-table workloads:

* utn fixed-subset r=30 (38,400 POIs): SIFT + FeatureAffine + ICGN1 + strain
  — ``utn_30_sift_icgn1_r30_time.csv`` (0.716 / 0.105 / 1.485 / 0.066 s).
* utn self-adaptive subsets (38,400 POIs): SIFT + subset optimization +
  self-adaptive ICGN1 + strain — ``utn_30_self_adaptive_time.csv``
  (0.675 / 0.909 / 1.535 / 0.044 s).
* rotation_170 SIFT+ICLM2 r=12 (42,025 POIs): FeatureAffine + ICLM2 —
  ``rotation_170_sift_iclm2_r12_time.csv`` (0.0518 / 0.903 s).

Sandbox structure (CLAUDE.md): the SIFT keypoint readback flips the axon
session into polled dispatch, so SIFT device time is measured in its own
process (matches saved to npz) and the downstream stages run with host
keypoints, timed steady-state before any transfer.

Usage: python bench_2d_workloads.py [all|feature_utn|feature_rot|utn|rot]
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax

import opencorr_tpu as oc

D2 = "/root/reference/examples/2d_dic"
UTN_NPZ = "/tmp/bench_utn_matches.npz"
ROT_NPZ = "/tmp/bench_rot_matches.npz"


def median_time(fn, reps=7):
    fn()  # warm (compile + per-shape dispatch overhead)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _sift_device(ref_path, tar_path, npz, tag, baseline_s):
    ref = oc.Image2D.load(ref_path)
    tar = oc.Image2D.load(tar_path)
    sift = oc.SIFT2D()
    sift.set_images(ref, tar)
    sift.prepare()
    jax.block_until_ready(sift.compute_device())  # warm
    t0 = time.time()
    keep, idx, rx, ry, tx, ty = sift.compute_device()
    jax.block_until_ready((keep, idx, rx, ry, tx, ty))
    device_s = time.time() - t0
    print(json.dumps({"stage": f"{tag}_sift_device",
                      "seconds": round(device_s, 4),
                      "vs_baseline": round(baseline_s / device_s, 1)}),
          flush=True)
    keep = np.asarray(keep)
    idx = np.asarray(idx)
    rxy = np.stack([np.asarray(rx), np.asarray(ry)], -1)
    txy = np.stack([np.asarray(tx), np.asarray(ty)], -1)
    np.savez(npz, ref_kp=rxy[keep], tar_kp=txy[idx[keep]],
             device_s=np.float64(device_s))
    print(json.dumps({"stage": f"{tag}_sift_readback_tail",
                      "n_matches": int(keep.sum())}), flush=True)


def _utn_grid():
    pois = oc.poi_grid_2d((50, 50), 480, 80, 5)
    jj, ii = np.meshgrid(np.arange(480), np.arange(80))
    pts = np.stack([(50 + jj * 5).reshape(-1), (50 + ii * 5).reshape(-1)],
                   -1).astype(np.float32)
    return pois, pts


def bench_utn():
    d = np.load(UTN_NPZ)
    ref_mk, tar_mk = d["ref_kp"], d["tar_kp"]
    ref = oc.Image2D.load(f"{D2}/utn_00.bmp")
    tar = oc.Image2D.load(f"{D2}/utn_30.bmp")
    rx = ry = 30

    # --- fixed-subset r=30 pipeline -----------------------------------------
    pois, pts = _utn_grid()
    fa = oc.FeatureAffine2D(rx, ry)
    fa.set_keypoint_pair(ref_mk, tar_mk)
    fa.prepare(pois, points=pts)
    dt = median_time(lambda: fa.compute(pois).p)
    print(json.dumps({"stage": "utn_fa_r30", "seconds": round(dt, 5),
                      "vs_baseline": round(0.105383 / dt, 1)}), flush=True)

    seeded = fa.compute(pois)
    icgn = oc.ICGN2D1(rx, ry, 0.001, 10)
    icgn.set_images(ref, tar)
    icgn.prepare()
    dt = median_time(lambda: icgn.compute(seeded).p)
    print(json.dumps({"stage": "utn_icgn1_r30", "seconds": round(dt, 5),
                      "vs_baseline": round(1.48505 / dt, 1)}), flush=True)

    refined = icgn.compute(seeded)
    strain = oc.Strain(25.0, 10)
    strain.prepare(refined, points=pts)
    dt = median_time(lambda: strain.compute(refined).e)
    print(json.dumps({"stage": "utn_strain_r25", "seconds": round(dt, 5),
                      "vs_baseline": round(0.0661277 / dt, 1)}), flush=True)

    # --- self-adaptive pipeline (test_2d_dic_self_adaptive_subset.cpp) ------
    pois_sa, pts_sa = _utn_grid()
    fa_sa = oc.FeatureAffine2D(rx, ry)
    neighbor_num = 2 * fa_sa.neighbor_number_min
    fa_sa.set_search(float(np.sqrt(2.0 * rx * rx)), neighbor_num)
    fa_sa.set_self_adaptive(True)
    fa_sa.set_subset_adjustment(neighbor_num, 10)
    fa_sa.set_keypoint_pair(ref_mk, tar_mk)
    fa_sa.prepare()
    dt = median_time(lambda: fa_sa.compute(pois_sa).p, reps=5)
    print(json.dumps({"stage": "utn_sa_subset_opt", "seconds": round(dt, 5),
                      "vs_baseline": round(0.909428 / dt, 1)}), flush=True)

    adapted = fa_sa.compute(pois_sa)
    icgn_sa = oc.ICGN2D1(rx, ry, 0.001, 10)
    icgn_sa.set_images(ref, tar)
    icgn_sa.set_self_adaptive(True)
    icgn_sa.prepare()
    dt = median_time(lambda: icgn_sa.compute(adapted).p, reps=5)
    print(json.dumps({"stage": "utn_sa_icgn1", "seconds": round(dt, 5),
                      "vs_baseline": round(1.5352 / dt, 1)}), flush=True)

    refined_sa = icgn_sa.compute(adapted)
    strain_sa = oc.Strain(25.0, 10)
    strain_sa.prepare(refined_sa)  # moved POIs: host coords via hint registry
    dt = median_time(lambda: strain_sa.compute(refined_sa).e, reps=5)
    print(json.dumps({"stage": "utn_sa_strain", "seconds": round(dt, 5),
                      "vs_baseline": round(0.0442872 / dt, 1)}), flush=True)

    sift_s = float(np.load(UTN_NPZ)["device_s"])
    print(json.dumps({"metric": "utn_sift_icgn1_r30_total_s",
                      "value": round(sift_s, 3), "unit": "s",
                      "note": "sift device time; stage rows above"}),
          flush=True)


def bench_rot():
    d = np.load(ROT_NPZ)
    ref_mk, tar_mk = d["ref_kp"], d["tar_kp"]
    ref = oc.Image2D.load(f"{D2}/rotation_000.tif")
    tar = oc.Image2D.load(f"{D2}/rotation_170.tif")
    rx = ry = 12

    pois = oc.poi_grid_2d((50, 50), 205, 205, 2)
    jj, ii = np.meshgrid(np.arange(205), np.arange(205))
    pts = np.stack([(50 + jj * 2).reshape(-1), (50 + ii * 2).reshape(-1)],
                   -1).astype(np.float32)
    fa = oc.FeatureAffine2D(rx, ry)
    fa.set_keypoint_pair(ref_mk, tar_mk)
    fa.prepare(pois, points=pts)
    dt = median_time(lambda: fa.compute(pois).p)
    print(json.dumps({"stage": "rot_fa_r12", "seconds": round(dt, 5),
                      "vs_baseline": round(0.0518265 / dt, 1)}), flush=True)

    seeded = fa.compute(pois)
    iclm = oc.ICLM2D2(rx, ry, 0.001, 10)
    iclm.set_images(ref, tar)
    iclm.prepare()
    dt = median_time(lambda: iclm.compute(seeded).p)
    print(json.dumps({"stage": "rot_iclm2_r12", "seconds": round(dt, 5),
                      "vs_baseline": round(0.90302 / dt, 1)}), flush=True)


def _run_mode(mode, timeout_s=600, retries=3):
    for attempt in range(retries):
        try:
            r = subprocess.run([sys.executable, "-u", __file__, mode],
                               timeout=timeout_s)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(json.dumps({"stage": mode, "retry": attempt + 1}), flush=True)
    print(json.dumps({"stage": mode, "error": "exhausted retries"}), flush=True)
    return False


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which == "all":
        _run_mode("feature_utn")
        _run_mode("utn", timeout_s=900)
        _run_mode("feature_rot")
        _run_mode("rot", timeout_s=900)
    elif which == "feature_utn":
        _sift_device(f"{D2}/utn_00.bmp", f"{D2}/utn_30.bmp", UTN_NPZ,
                     "utn", 0.715856)
    elif which == "feature_rot":
        _sift_device(f"{D2}/rotation_000.tif", f"{D2}/rotation_170.tif",
                     ROT_NPZ, "rot", 0.361648)
    elif which == "utn":
        bench_utn()
    elif which == "rot":
        bench_rot()


if __name__ == "__main__":
    main()
