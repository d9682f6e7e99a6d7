"""Stereo/3D DIC: epipolar search + SIFT feature matching + triangulation.

TPU-native reproduction of the reference workload
``examples/test_3d_dic_epipolar_sift.cpp`` (the deepest pipeline, SURVEY.md
§3.3): four phases — stereo match ref1->ref2, temporal match ref1->tar1,
cross match ref1->tar2 (epipolar on rounded POIs + displacement composition),
then triangulation of both pairs into 3D displacements.

Usage: python examples/stereo_3d_dic_epipolar_sift.py [data_dir] [out_csv]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

import jax
import jax.numpy as jnp

import opencorr_tpu as oc
from opencorr_tpu.data import poi as poi_mod


def run(data_dir: str = "/root/reference/examples/3d_dic",
        out_path: str = "/tmp/GT4-0273_0_epipolar_sift_r16.csv",
        poi_stride: int = 1, sift_backend=None, sift_features: int = 0,
        sift_matches=None):
    """``poi_stride``: subsample the 9997-POI queue (tests use a stride so
    the golden gate stays fast); ``sift_backend``: override SIFT2D backend;
    ``sift_features``: retainBest cap (0 = keep all, like the reference);
    ``sift_matches``: optional (ref_kp, tar_kp) host arrays — skips the SIFT
    stage so the rest of the pipeline runs with zero device->host transfers
    (the keypoint readback is the one unavoidable host sync; benches time it
    separately).  ``out_path=None`` skips the CSV write (also a readback)."""
    ref_view1 = oc.Image2D.load(f"{data_dir}/GT4-0000_0.tif")
    ref_view2 = oc.Image2D.load(f"{data_dir}/GT4-0000_1.tif")
    tar_view1 = oc.Image2D.load(f"{data_dir}/GT4-0273_0.tif")
    tar_view2 = oc.Image2D.load(f"{data_dir}/GT4-0273_1.tif")

    pts = np.genfromtxt(f"{data_dir}/GT4-POIs.csv", delimiter=",",
                        skip_header=1, dtype=np.float32)
    pts = pts[::poi_stride]

    # camera parameters (test_3d_dic_epipolar_sift.cpp:58-100)
    view1_intr = oc.CameraIntrinsics(
        fx=6673.315918, fy=6669.302734, fs=0.0, cx=872.15778, cy=579.95532,
        k1=0.032258954, k2=-1.01141417, k3=29.78838921)
    view1_extr = oc.CameraExtrinsics()
    view2_intr = oc.CameraIntrinsics(
        fx=6607.618164, fy=6602.857422, fs=0.0, cx=917.9733887, cy=531.6352539,
        k1=0.064598486, k2=-4.531373978, k3=29.78838921)
    view2_extr = oc.CameraExtrinsics(
        tx=122.24886, ty=1.8488892, tz=17.624638,
        rx=0.00307711, ry=-0.33278773, rz=0.00524556)

    cam1 = oc.Calibration(view1_intr, view1_extr)
    cam2 = oc.Calibration(view2_intr, view2_extr)
    cam1.prepare(ref_view1.height, ref_view1.width)
    cam2.prepare(ref_view2.height, ref_view2.width)
    stereo = oc.Stereovision(cam1, cam2)

    pois = oc.new_table_2d(pts[:, 0], pts[:, 1])
    result = oc.new_table_2ds(pts[:, 0], pts[:, 1])

    subset_rx = subset_ry = 16
    icgn1 = oc.ICGN2D1(subset_rx, subset_ry, 0.001, 10)
    icgn2 = oc.ICGN2D2(subset_rx, subset_ry, 0.001, 10)
    sift = oc.SIFT2D(backend=sift_backend)
    if sift_features:
        cfg = sift.sift_config
        cfg.n_features = int(sift_features)
        sift.set_sift_config(cfg)
    fa = oc.FeatureAffine2D(subset_rx, subset_ry)

    epi = oc.EpipolarSearch(cam1, cam2)
    epi.set_parallax((-30.0, -40.0))
    epi.set_search(30, 5)
    # NOTE: the reference example source sets stop_condition=5
    # (test_3d_dic_epipolar_sift.cpp:67), but a reference-faithful scalar
    # replay shows ~23% of the GT4 POIs need 6-10 coarse iterations, while
    # the committed golden table is 100% converged — the golden must have
    # been produced with a larger budget.  10 reproduces it (PARITY.md).
    epi.create_icgn(20, 20, 0.05, 10)

    timings = {}

    # PHASE 1: stereo match ref1 -> ref2 (coarse epipolar + ICGN2 refine)
    t0 = time.time()
    epi.set_images(ref_view1, ref_view2)
    epi.prepare()
    pois = epi.compute(pois)
    icgn2.set_images(ref_view1, ref_view2)
    icgn2.prepare()
    pois = icgn2.compute(pois)
    jax.block_until_ready(pois.p)
    timings["r1_to_r2"] = time.time() - t0

    ref_view2_pts = jnp.stack(
        [pois.x + pois.p[:, poi_mod.U], pois.y + pois.p[:, poi_mod.V]], -1)
    r = result.r
    r = r.at[:, 3].set(ref_view2_pts[:, 0]).at[:, 4].set(ref_view2_pts[:, 1])
    r = r.at[:, 0].set(pois.r[:, poi_mod.R_ZNCC])
    result = result.replace(r=r)

    # PHASE 2: temporal match ref1 -> tar1 (SIFT + FeatureAffine + ICGN1)
    t0 = time.time()
    if sift_matches is None:
        sift.set_images(ref_view1, tar_view1)
        sift.prepare()
        sift.compute()
        ref_mk, tar_mk = sift.ref_matched_kp, sift.tar_matched_kp
    else:
        ref_mk, tar_mk = sift_matches
    fa.set_images(ref_view1, tar_view1)
    fa.set_keypoint_pair(ref_mk, tar_mk)
    # fresh deformation state for the temporal match; host POI coordinates
    # passed through so the candidate precompute never reads back a device
    # buffer (FeatureAffine2D.prepare contract)
    pois_t = oc.new_table_2d(pts[:, 0], pts[:, 1])
    fa.prepare(pois_t, points=pts[:, :2])
    pois_t = fa.compute(pois_t)
    icgn1.set_images(ref_view1, tar_view1)
    icgn1.prepare()
    pois_t = icgn1.compute(pois_t)
    jax.block_until_ready(pois_t.p)
    timings["r1_to_t1"] = time.time() - t0

    tar_view1_pts = jnp.stack(
        [pois_t.x + pois_t.p[:, poi_mod.U], pois_t.y + pois_t.p[:, poi_mod.V]], -1)
    r = result.r
    r = r.at[:, 5].set(tar_view1_pts[:, 0]).at[:, 6].set(tar_view1_pts[:, 1])
    r = r.at[:, 1].set(pois_t.r[:, poi_mod.R_ZNCC])
    result = result.replace(r=r)

    # PHASE 3: cross match ref1 -> tar2 (epipolar tar1->tar2 on rounded POIs,
    # displacement composition, ICGN2 ref1 vs tar2)
    t0 = time.time()
    round_pois = oc.new_table_2d(
        jnp.round(tar_view1_pts[:, 0]), jnp.round(tar_view1_pts[:, 1]))
    epi.set_parallax((-30.0, -40.0))
    epi.set_images(tar_view1, tar_view2)
    epi.prepare()
    round_pois = epi.compute(round_pois)

    p = pois_t.p
    p = p.at[:, poi_mod.U].add(round_pois.p[:, poi_mod.U])
    p = p.at[:, poi_mod.V].add(round_pois.p[:, poi_mod.V])
    pois_x = pois_t.replace(p=p)
    icgn2.set_images(ref_view1, tar_view2)
    icgn2.prepare()
    pois_x = icgn2.compute(pois_x)
    jax.block_until_ready(pois_x.p)
    timings["r1_to_t2"] = time.time() - t0

    tar_view2_pts = jnp.stack(
        [pois_x.x + pois_x.p[:, poi_mod.U], pois_x.y + pois_x.p[:, poi_mod.V]], -1)
    r = result.r
    r = r.at[:, 7].set(tar_view2_pts[:, 0]).at[:, 8].set(tar_view2_pts[:, 1])
    r = r.at[:, 2].set(pois_x.r[:, poi_mod.R_ZNCC])
    result = result.replace(r=r)

    # PHASE 4: triangulation of both pairs -> 3D displacement
    t0 = time.time()
    stereo.prepare()
    ref_pts = jnp.stack([pois.x, pois.y], -1)
    ref_3d = stereo.reconstruct(ref_pts, ref_view2_pts)
    tar_3d = stereo.reconstruct(tar_view1_pts, tar_view2_pts)
    disp = tar_3d - ref_3d
    jax.block_until_ready(disp)
    timings["reconstruction"] = time.time() - t0

    result = result.replace(ref_coor=ref_3d, tar_coor=tar_3d, p=disp)

    if out_path is not None:
        from opencorr_tpu.io import table as io_table
        io_table.save_table_2ds(out_path, result)
    return result, timings


if __name__ == "__main__":
    args = sys.argv[1:]
    res, times = run(*args)
    for k, v in times.items():
        print(f"{k}: {v:.3f}s")
