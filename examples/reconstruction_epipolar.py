"""3D surface reconstruction from one stereo pair (reference:
test_3d_reconstruction_epipolar.cpp and test_3d_reconstruction_sift_epipolar.cpp).

Matches a dense POI grid from view 1 into view 2 with the epipolar search
(optionally seeding the parallax bilinear model from SIFT matches — the
reference reports a 7.3x speedup from the tighter search this enables), then
triangulates each matched pair into 3D.

The reference's "Step18" dataset is not committed, so the GT4 stereo pair is
the default input.

Usage: python examples/reconstruction_epipolar.py [--sift] [view1 view2 out_csv]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import opencorr_tpu as oc
from opencorr_tpu.data import poi as poi_mod
from opencorr_tpu.utils.timing import StageTimer

D3 = "/root/reference/examples/3d_dic"


def gt4_cameras():
    v1i = oc.CameraIntrinsics(fx=6673.315918, fy=6669.302734, cx=872.15778,
                              cy=579.95532, k1=0.032258954, k2=-1.01141417,
                              k3=29.78838921)
    v2i = oc.CameraIntrinsics(fx=6607.618164, fy=6602.857422, cx=917.9733887,
                              cy=531.6352539, k1=0.064598486, k2=-4.531373978,
                              k3=29.78838921)
    v2e = oc.CameraExtrinsics(tx=122.24886, ty=1.8488892, tz=17.624638,
                              rx=0.00307711, ry=-0.33278773, rz=0.00524556)
    return (oc.Calibration(v1i, oc.CameraExtrinsics()),
            oc.Calibration(v2i, v2e))


def fit_parallax(ref_kp, tar_kp, width, height):
    """Bilinear parallax model fitted to SIFT matches
    (test_3d_reconstruction_sift_epipolar.cpp)."""
    dx = tar_kp[:, 0] - ref_kp[:, 0]
    dy = tar_kp[:, 1] - ref_kp[:, 1]
    a = np.stack(
        [ref_kp[:, 0] - width // 2, ref_kp[:, 1] - height // 2,
         np.ones(len(ref_kp))], axis=1)
    cx, *_ = np.linalg.lstsq(a, dx, rcond=None)
    cy, *_ = np.linalg.lstsq(a, dy, rcond=None)
    return cx.astype(np.float32), cy.astype(np.float32)


def run(use_sift=True, view1_path=f"{D3}/GT4-0000_0.tif",
        view2_path=f"{D3}/GT4-0000_1.tif",
        out_path="/tmp/reconstruction.csv"):
    view1 = oc.Image2D.load(view1_path)
    view2 = oc.Image2D.load(view2_path)
    cam1, cam2 = gt4_cameras()
    cam1.prepare(view1.height, view1.width)
    cam2.prepare(view2.height, view2.width)

    timer = StageTimer()
    epi = oc.EpipolarSearch(cam1, cam2)
    if use_sift:
        sift = oc.SIFT2D()
        sift.set_images(view1, view2)
        with timer.stage("SIFT"):
            sift.prepare()
            sift.compute()
        with timer.stage("Parallax fit"):
            cx, cy = fit_parallax(sift.ref_matched_kp, sift.tar_matched_kp,
                                  view1.width, view1.height)
        epi.set_parallax(cx, cy)
        epi.set_search(8, 2)  # tight search around the fitted model
    else:
        epi.set_parallax((-30.0, -40.0))
        epi.set_search(30, 5)
    epi.create_icgn(20, 20, 0.05, 5)
    epi.set_images(view1, view2)
    epi.prepare()

    pois = oc.poi_grid_2d((100, 100), (view1.width - 200) // 5,
                          (view1.height - 200) // 5, 5)
    with timer.stage("Epipolar matching"):
        pois = epi.compute(pois)
        jax.block_until_ready(pois.p)

    sv = oc.Stereovision(cam1, cam2)
    sv.prepare()
    with timer.stage("Reconstruction"):
        p1 = jnp.stack([pois.x, pois.y], -1)
        p2 = jnp.stack([pois.x + pois.p[:, poi_mod.U],
                        pois.y + pois.p[:, poi_mod.V]], -1)
        world = sv.reconstruct(p1, p2)
        jax.block_until_ready(world)

    z = np.asarray(pois.zncc)
    w = np.asarray(world)
    rows = np.column_stack([np.asarray(pois.x), np.asarray(pois.y), w, z])
    with open(out_path, "w") as f:
        f.write("x,y,X,Y,Z,ZNCC\n")
        np.savetxt(f, rows, delimiter=",", fmt="%.6f")
    return rows, timer


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    rows, timer = run("--sift" in sys.argv or not args, *args)
    good = rows[:, 5] > 0.9
    print(timer.report())
    print(f"POIs {len(rows)}, ZNCC>0.9: {good.mean():.3f}, "
          f"Z range {np.percentile(rows[good, 4], [5, 50, 95])}")
