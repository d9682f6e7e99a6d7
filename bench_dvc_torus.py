"""Torus-scale DVC benchmark: SIFT3D + FeatureAffine3D + ICGN3D1.

The reference's second-hottest workload is test_dvc_sift_icgn1 on the Torus
CT pair (78 700 POIs, r=16): SIFT3D 233.5 s + FA3D 0.51 s + ICGN3D1 66.6 s on
CPU (examples/dvc/Torus_def_sift_icgn1_r16_time.csv).  The Torus volumes are
external downloads, so this benchmark synthesizes a speckle volume of the
same dimensions (the POI list and physical layout are the committed ones),
deforms it with a smooth displacement field, and runs the full TPU pipeline.

Prints one JSON line per stage plus the total.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

import opencorr_tpu as oc

BASE = {"SIFT": 233.48, "FeatureAffine": 0.510974, "ICGN": 66.5677}


def synth_torus_pair(dims=(568, 288, 940), seed=0):
    """Speckle volume pair at Torus scale ([z, y, x]; POIs span x<=930,
    y<=280, z<=561) with a smooth sinusoidal warp (~1.5 vx amplitude).

    Trilinear resampling in float32, chunked over z: order-3 at 153M voxels
    takes >10 min on this host; the bench only needs a plausibly-warped
    speckle pair (convergence is sanity-checked, accuracy is gated by the
    synthetic-truth tests in tests/)."""
    from scipy.ndimage import gaussian_filter, map_coordinates

    dz, dy, dx = dims
    rng = np.random.default_rng(seed)
    ref = gaussian_filter(rng.standard_normal(dims).astype(np.float32), 1.6)
    ref = (ref * 55 + 128).astype(np.float32)

    tar = np.empty_like(ref)
    yy, xx = np.meshgrid(np.arange(dy, dtype=np.float32),
                         np.arange(dx, dtype=np.float32), indexing="ij")
    for z0 in range(0, dz, 64):
        z1 = min(z0 + 64, dz)
        zz = np.arange(z0, z1, dtype=np.float32)[:, None, None]
        u = 1.2 * np.sin(2 * np.pi * xx / dx) * np.cos(2 * np.pi * zz / dz)
        v = 0.8 * np.cos(2 * np.pi * yy / dy) + 0 * zz
        w = 1.0 * np.sin(2 * np.pi * (xx + zz) / (dx + dz))
        coords = [
            (zz - w).astype(np.float32) + 0 * xx,
            (yy - v).astype(np.float32),
            (xx - u).astype(np.float32),
        ]
        coords = np.broadcast_arrays(*coords)
        tar[z0:z1] = map_coordinates(ref, coords, order=1, mode="nearest")
    return ref, tar


def main():
    t0 = time.time()
    cache = "/tmp/torus_synth.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        ref, tar = d["ref"], d["tar"]
    else:
        ref, tar = synth_torus_pair()
        np.savez(cache, ref=ref, tar=tar)
    print(json.dumps({"stage": "synthesize", "seconds": round(time.time() - t0, 2),
                      "dims": list(ref.shape)}), flush=True)

    pois_xyz = np.genfromtxt("/root/reference/examples/dvc/Torus_POIs.csv",
                             delimiter=",", skip_header=1, dtype=np.float32)
    pois = oc.new_table_3d(pois_xyz[:, 0], pois_xyz[:, 1], pois_xyz[:, 2])
    timings = {}

    sift = oc.SIFT3D(pyramid_backend="device")
    sift.set_images(ref, tar)
    t0 = time.time()
    sift.prepare()
    sift.compute()
    timings["SIFT"] = time.time() - t0
    print(json.dumps({"stage": "SIFT", "seconds": round(timings['SIFT'], 2),
                      "kp": [int(sift.ref_kp_count), int(sift.tar_kp_count)],
                      "matches": int(len(sift.ref_matched_kp)),
                      "vs_baseline": round(BASE['SIFT'] / timings['SIFT'], 1)}),
          flush=True)

    fa = oc.FeatureAffine3D(16, 16, 16)
    fa.set_images(ref, tar)
    fa.set_keypoint_pair(sift.ref_matched_kp, sift.tar_matched_kp)
    t0 = time.time()
    fa.prepare()
    pois = fa.compute(pois)
    jax.block_until_ready(pois.p)
    timings["FeatureAffine"] = time.time() - t0
    print(json.dumps({"stage": "FeatureAffine",
                      "seconds": round(timings['FeatureAffine'], 2),
                      "vs_baseline": round(
                          BASE['FeatureAffine'] / timings['FeatureAffine'], 1)}),
          flush=True)

    icgn = oc.ICGN3D1(16, 16, 16, 0.001, 10)
    icgn.set_images(ref, tar)
    t0 = time.time()
    icgn.prepare()
    pois = icgn.compute(pois)
    jax.block_until_ready(pois.p)
    timings["ICGN"] = time.time() - t0
    print(json.dumps({"stage": "ICGN", "seconds": round(timings['ICGN'], 2),
                      "vs_baseline": round(BASE['ICGN'] / timings['ICGN'], 1)}),
          flush=True)

    z = np.asarray(pois.zncc)
    conv = float((z > 0.8).mean())
    total = sum(timings.values())
    base_total = sum(BASE.values())
    print(json.dumps({
        "metric": "dvc_sift_icgn1_torus_total_s", "value": round(total, 2),
        "unit": "s", "n_poi": int(pois.n), "converged_frac": round(conv, 3),
        "vs_baseline": round(base_total / total, 1)}), flush=True)


if __name__ == "__main__":
    main()
