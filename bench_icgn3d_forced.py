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
"""

import json
import os
import sys
import time

import numpy as np

from bench_dvc_torus import CACHE, _load_pair, _warp_displacement

BASE_ICGN_S = 66.5677


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "lattice"
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else None

    import jax
    import jax.numpy as jnp
    import opencorr_tpu as oc
    from opencorr_tpu.data import poi as poi_mod

    ref, tar = _load_pair()

    pois_xyz = np.genfromtxt("/root/reference/examples/dvc/Torus_POIs.csv",
                             delimiter=",", skip_header=1, dtype=np.float32)
    limit = int(os.environ.get("N_POI", "0"))
    if limit:
        pois_xyz = pois_xyz[:limit]
    x, y, z = pois_xyz[:, 0], pois_xyz[:, 1], pois_xyz[:, 2]
    u, v, w = _warp_displacement(x, y, z)
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
    icgn = oc.ICGN3D1(16, 16, 16, 0.001, 10, chunk_size=chunk, **kw)
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
        "metric": "icgn3d1_torus_forced_s", "value": round(forced_s, 2),
        "unit": "s", "mode": mode, "n_poi": int(len(x)),
        "chunk": icgn.chunk_size, "prepare_s": round(prep_s, 2),
        "total_s": round(total_s, 2),
        "vs_baseline": round(BASE_ICGN_S / forced_s, 2),
        "converged_frac": round(float(ok.mean()), 4),
        "mean_abs_du": round(float(du.mean()), 4) if ok.any() else None,
        "p99_abs_du": round(float(np.percentile(du, 99)), 4)
        if ok.any() else None,
        "mean_abs_dw": round(float(dw.mean()), 4) if ok.any() else None,
    }), flush=True)


if __name__ == "__main__":
    main()
