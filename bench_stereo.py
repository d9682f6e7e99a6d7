"""Stereo + reconstruction benchmarks vs the reference's committed baselines.

Three workloads (VERDICT round-1 item 2):

1. GT4 full stereo DIC pipeline (9,997 POIs):
   test_3d_dic_epipolar_sift.cpp — baseline 15.48 s total
   (GT4-0273_0_epipolar_sift_r16_time.csv: init 0.047 + r1_to_r2 6.91 +
   r1_to_t1 1.47 + r1_to_t2 7.05 + reconstruction 0.002).

2. Reconstruction via plain epipolar search at Step18 scale (97,969 POIs,
   search radius 150 step 4, ICGN r=20 conv 0.05/5, then ICGN2D2 r=9 refine):
   test_3d_reconstruction_epipolar.cpp — baseline 262.0 s matching
   (Step18 00,00-0005_1_reconstruction_epipolar_time.csv).

3. Same with SIFT-estimated parallax and the tighter search (radius 90
   step 3): test_3d_reconstruction_sift_epipolar.cpp — baseline 35.7 s
   matching + 3.4 s feature stage.

The Step18 image pair is an external download, so workloads 2-3 run on the
GT4 stereo pair with a grid of the same POI count (343 x 286 = 98,098 ~=
313^2 = 97,969; the reference's own 313x313-from-(420,250) grid does not fit
GT4's 1920x1200 frame).  Candidate count and subset sizes — the actual work —
match the reference exactly.

Prints one JSON line per stage.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax
import jax.numpy as jnp

import opencorr_tpu as oc
from opencorr_tpu.data import poi as poi_mod

D3 = "/root/reference/examples/3d_dic"


def bench_gt4_pipeline():
    from examples.stereo_3d_dic_epipolar_sift import run

    t0 = time.time()
    timings = run(out_path="/tmp/bench_gt4.csv")[1]
    total = time.time() - t0
    base = {"r1_to_r2": 6.91372, "r1_to_t1": 1.46762, "r1_to_t2": 7.04864,
            "reconstruction": 0.0021454}
    for k, v in timings.items():
        line = {"stage": f"gt4_{k}", "seconds": round(v, 3)}
        if k in base:
            line["vs_baseline"] = round(base[k] / v, 1)
        print(json.dumps(line), flush=True)
    base_total = 15.4796
    print(json.dumps({"metric": "stereo_gt4_total_s",
                      "value": round(total, 2), "unit": "s", "n_poi": 9997,
                      "poi_per_s": round(9997 / total, 1),
                      "vs_baseline": round(base_total / total, 1)}),
          flush=True)


def _step18_grid():
    # 343 x 286 = 98,098 POIs, step 5/4, inside GT4's 1920x1200 frame with
    # margin for r=20 subsets + parallax ~(-30,-40) + search 150.
    xs0 = 60 + 5 * np.arange(343, dtype=np.float32)   # 60..1770
    ys0 = 60 + 4 * np.arange(286, dtype=np.float32)   # 60..1200-60
    xx, yy = np.meshgrid(xs0, ys0)
    return oc.new_table_2d(xx.ravel(), yy.ravel())


def _fit_parallax(ref_kp, tar_kp, width, height):
    dx = tar_kp[:, 0] - ref_kp[:, 0]
    dy = tar_kp[:, 1] - ref_kp[:, 1]
    a = np.stack([ref_kp[:, 0] - width // 2, ref_kp[:, 1] - height // 2,
                  np.ones(len(ref_kp))], axis=1)
    cx, *_ = np.linalg.lstsq(a, dx, rcond=None)
    cy, *_ = np.linalg.lstsq(a, dy, rcond=None)
    return cx.astype(np.float32), cy.astype(np.float32)


def bench_reconstruction(use_sift: bool):
    from examples.reconstruction_epipolar import gt4_cameras

    view1 = oc.Image2D.load(f"{D3}/GT4-0000_0.tif")
    view2 = oc.Image2D.load(f"{D3}/GT4-0000_1.tif")
    cam1, cam2 = gt4_cameras()
    cam1.prepare(view1.height, view1.width)
    cam2.prepare(view2.height, view2.width)

    tag = "sift_epipolar" if use_sift else "epipolar"
    epi = oc.EpipolarSearch(cam1, cam2)
    feature_s = 0.0
    if use_sift:
        # test_3d_reconstruction_sift_epipolar.cpp:151-171 — SIFT parallax
        # estimate, then search radius 90 step 3.
        sift = oc.SIFT2D()
        sift.set_images(view1, view2)
        t0 = time.time()
        sift.prepare()
        sift.compute()
        cx, cy = _fit_parallax(sift.ref_matched_kp, sift.tar_matched_kp,
                               view1.width, view1.height)
        feature_s = time.time() - t0
        print(json.dumps({"stage": f"step18_{tag}_feature",
                          "seconds": round(feature_s, 3),
                          "vs_baseline": round(3.3706 / feature_s, 1)}),
              flush=True)
        epi.set_parallax(cx, cy)
        epi.set_search(90, 3)
    else:
        # test_3d_reconstruction_epipolar.cpp:142-146.
        epi.set_parallax((-30.0, -40.0))
        epi.set_search(150, 4)
    epi.create_icgn(20, 20, 0.05, 5)
    epi.set_images(view1, view2)
    epi.prepare()

    icgn2 = oc.ICGN2D2(9, 9, 0.001, 10)
    icgn2.set_images(view1, view2)
    icgn2.prepare()

    pois = _step18_grid()
    n = int(pois.n)
    t0 = time.time()
    pois = epi.compute(pois)
    pois = icgn2.compute(pois)
    jax.block_until_ready(pois.p)
    match_s = time.time() - t0

    sv = oc.Stereovision(cam1, cam2)
    sv.prepare()
    t0 = time.time()
    p1 = jnp.stack([pois.x, pois.y], -1)
    p2 = jnp.stack([pois.x + pois.p[:, poi_mod.U],
                    pois.y + pois.p[:, poi_mod.V]], -1)
    world = sv.reconstruct(p1, p2)
    jax.block_until_ready(world)
    rec_s = time.time() - t0

    zncc = np.asarray(pois.zncc)
    base_match = 262.025 if not use_sift else 35.7451
    base_rec = 0.0085629 if not use_sift else 0.0129834
    print(json.dumps({"stage": f"step18_{tag}_matching",
                      "seconds": round(match_s, 3),
                      "vs_baseline": round(base_match / match_s, 1)}),
          flush=True)
    print(json.dumps({"stage": f"step18_{tag}_reconstruction",
                      "seconds": round(rec_s, 4),
                      "vs_baseline": round(base_rec / rec_s, 1)}),
          flush=True)
    total = feature_s + match_s + rec_s
    base_total = base_match + base_rec + (3.3706 + 0.0027 if use_sift else 0)
    print(json.dumps({"metric": f"step18_{tag}_total_s",
                      "value": round(total, 2), "unit": "s", "n_poi": n,
                      "poi_per_s": round(n / total, 1),
                      "good_frac": round(float((zncc > 0.9).mean()), 3),
                      "vs_baseline": round(base_total / total, 1)}),
          flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("gt4", "all"):
        bench_gt4_pipeline()
    if which in ("epipolar", "all"):
        bench_reconstruction(use_sift=False)
    if which in ("sift", "all"):
        bench_reconstruction(use_sift=True)


if __name__ == "__main__":
    main()
