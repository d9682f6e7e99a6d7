"""Forced-readback Torus ICGN3D1: the VERDICT round-3 "done" criterion.

Runs ONLY the ICGN3D1 stage of the Torus DVC workload (78,700 POIs, r=16,
reference CPU 66.6 s — examples/dvc/Torus_def_sift_icgn1_r16_time.csv) in a
fresh process with host-computed seeds, so the whole queue dispatches in the
fast (pre-readback) mode and ONE final scalar readback waits for true device
completion (block_until_ready returns at enqueue through this sandbox's
tunnel — PERF.md measurement validity).  The readback also scores accuracy
against the known synthetic warp, so the time is provably for CONVERGED
work, not a faulted no-op.

Seeds mimic FFTCC3D output: integer-voxel displacements from the known
warp (the reference pipeline seeds ICGN from FFTCC integer peaks or FA3D
affine predictions).

Usage: python bench_icgn3d_forced.py [eval_mode] [chunk]
  eval_mode: lattice (default) | tile | global
  WORKLOAD=alfoam runs the al_foam4 case instead (5,733 POIs, r=30 at
  [700, 100, 100] dims, reference CPU 52.83 s —
  al_foam4_1_fftcc_icgn1_r30_time.csv:2); the POI grid is the committed
  golden table's, the volume a cached synthetic speckle pair.
"""

import json
import os
import sys
import time

import numpy as np

from bench_dvc_torus import CACHE, _load_pair, _warp_displacement

BASE_ICGN_S = 66.5677
BASE_ALFOAM_S = 52.83
ALFOAM_CACHE = "/tmp/alfoam_synth_u8.npz"
ALFOAM_DIMS = (700, 100, 100)


def _alfoam_warp(x, y, z, dims=ALFOAM_DIMS):
    """Gentle z-wavelength displacement field (~1%/voxel strain, like real
    al_foam compression steps).  The Torus warp's x-wavelength equals the
    100-voxel al_foam x-extent, i.e. 7.5%/voxel strain — unrepresentative
    of real CT loading and beyond what a 1st-order r=30 subset can model
    (the tile probe converged to the wrong truth by ~0.25 vx there)."""
    dz = dims[0]
    u = 1.2 * np.sin(2 * np.pi * z / dz)
    v = 0.8 * np.cos(2 * np.pi * z / dz)
    w = 1.0 * np.sin(2 * np.pi * z / dz + 1.0)
    return u, v, w


def _load_alfoam_pair():
    """Synthetic speckle pair at al_foam4 dims warped by _alfoam_warp."""
    from scipy.ndimage import gaussian_filter, map_coordinates

    if os.path.exists(ALFOAM_CACHE):
        d = np.load(ALFOAM_CACHE)
        return d["ref"], d["tar"]
    dz, dy, dx = ALFOAM_DIMS
    rng = np.random.default_rng(5)
    ref = gaussian_filter(
        rng.standard_normal(ALFOAM_DIMS).astype(np.float32), 1.6)
    ref = (ref * 55 + 128).astype(np.float32)
    zz = np.arange(dz, dtype=np.float32)[:, None, None]
    yy = np.arange(dy, dtype=np.float32)[None, :, None]
    xx = np.arange(dx, dtype=np.float32)[None, None, :]
    u, v, w = _alfoam_warp(xx, yy, zz)
    coords = np.broadcast_arrays(zz - w, yy - v + 0 * zz, xx - u + 0 * zz)
    tar = map_coordinates(ref, [c.astype(np.float32) for c in coords],
                          order=1, mode="nearest")
    ref_u8 = np.clip(np.rint(ref), 0, 255).astype(np.uint8)
    tar_u8 = np.clip(np.rint(tar), 0, 255).astype(np.uint8)
    np.savez(ALFOAM_CACHE, ref=ref_u8, tar=tar_u8)
    return ref_u8, tar_u8


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "lattice"
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else None
    workload = os.environ.get("WORKLOAD", "torus")

    import jax
    import jax.numpy as jnp
    import opencorr_tpu as oc
    from opencorr_tpu.data import poi as poi_mod

    if workload == "alfoam":
        ref, tar = _load_alfoam_pair()
        gold = np.genfromtxt(
            "/root/reference/examples/dvc/al_foam4_1_fftcc_icgn1_r30.csv",
            delimiter=",", skip_header=1, dtype=np.float32)
        pois_xyz = gold[:, :3]
        radius, base_s, dims = 30, BASE_ALFOAM_S, ALFOAM_DIMS
        metric = "icgn3d1_alfoam_r30_forced_s"
    else:
        ref, tar = _load_pair()
        pois_xyz = np.genfromtxt(
            "/root/reference/examples/dvc/Torus_POIs.csv",
            delimiter=",", skip_header=1, dtype=np.float32)
        radius, base_s, dims = 16, BASE_ICGN_S, (568, 288, 940)
        metric = "icgn3d1_torus_forced_s"
    limit = int(os.environ.get("N_POI", "0"))
    if limit:
        pois_xyz = pois_xyz[:limit]
    x, y, z = pois_xyz[:, 0], pois_xyz[:, 1], pois_xyz[:, 2]
    warp = _alfoam_warp if workload == "alfoam" else _warp_displacement
    u, v, w = warp(x, y, z, dims=dims)
    useed = np.rint(u).astype(np.float32)
    vseed = np.rint(v).astype(np.float32)
    wseed = np.rint(w).astype(np.float32)

    table = oc.new_table_3d(x, y, z)
    p = np.zeros((len(x), 12), np.float32)
    p[:, 0], p[:, 4], p[:, 8] = useed, vseed, wseed
    r = np.zeros((len(x), 7), np.float32)  # fresh host copy, no readback
    r[:, poi_mod.R3_ZNCC] = 0.5  # valid seed (>= 0)
    table = table.replace(p=jnp.asarray(p), r=jnp.asarray(r))

    kw = {}
    if mode == "global":
        kw["window_margin"] = None
    else:
        kw["eval_mode"] = mode
    icgn = oc.ICGN3D1(radius, radius, radius, 0.001, 10, chunk_size=chunk,
                      **kw)
    icgn.set_images(ref, tar)

    t0 = time.time()
    icgn.prepare()
    jax.block_until_ready(icgn._coeff)  # enqueue-level; folded into forced
    prep_s = time.time() - t0

    t1 = time.time()
    out = icgn.compute(table)
    # ONE forced readback: drains the whole queue, waits for completion,
    # and proves convergence + accuracy in the same transfer.
    p_host = np.asarray(out.p)
    uo, vo, wo = p_host[:, 0], p_host[:, 4], p_host[:, 8]
    zncc = np.asarray(out.r)[:, poi_mod.R3_ZNCC]
    forced_s = time.time() - t1
    total_s = time.time() - t0

    ok = zncc > 0.8
    du = np.abs(uo - u)[ok]
    dv = np.abs(vo - v)[ok]
    dw = np.abs(wo - w)[ok]
    print(json.dumps({
        "metric": metric, "value": round(forced_s, 2),
        "unit": "s", "mode": mode, "n_poi": int(len(x)),
        "chunk": icgn.chunk_size, "prepare_s": round(prep_s, 2),
        "total_s": round(total_s, 2),
        "vs_baseline": round(base_s / forced_s, 2),
        "converged_frac": round(float(ok.mean()), 4),
        "mean_abs_du": round(float(du.mean()), 4) if ok.any() else None,
        "p99_abs_du": round(float(np.percentile(du, 99)), 4)
        if ok.any() else None,
        "mean_abs_dw": round(float(dw.mean()), 4) if ok.any() else None,
    }), flush=True)


if __name__ == "__main__":
    main()
