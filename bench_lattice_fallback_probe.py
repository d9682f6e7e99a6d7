"""Forced-fallback canary for the lattice ICGN3D1 path (advisor round-4
high finding): one POI in a PRODUCTION-SIZE chunk (500 POIs at r=16, Torus
volume dims, 18M poi*voxels) is seeded with uxx = 0.2 — lattice deviation
0.2 * 16 = 3.2 > D = 1, a genuine wobble overflow — so the whole chunk
takes the in-program lax.cond fallback to the exact global tricubic eval.

Round-4 observed device faults when the fallback ran at n=500 (then
eliminated the SPURIOUS triggers via window padding but never re-tested a
genuine one).  Round-5 result on v5e: completes cleanly — 500/500
converged, the overflow POI at zncc 0.994, mean |du| of the others
8.7e-3 vx, 63 s forced for the chunk (compile + the 18M-sample exact
fallback iterations).  Re-run this after kernel/toolchain changes.
"""

import json
import time

import numpy as np

from bench_dvc_torus import _load_pair, _warp_displacement


def main():
    import jax.numpy as jnp

    import opencorr_tpu as oc
    from opencorr_tpu.data import poi as poi_mod

    ref, tar = _load_pair()
    pois_xyz = np.genfromtxt(
        "/root/reference/examples/dvc/Torus_POIs.csv",
        delimiter=",", skip_header=1, dtype=np.float32)[:500]
    x, y, z = pois_xyz[:, 0], pois_xyz[:, 1], pois_xyz[:, 2]
    u, v, w = _warp_displacement(x, y, z)
    p = np.zeros((500, 12), np.float32)
    p[:, 0], p[:, 4], p[:, 8] = np.rint(u), np.rint(v), np.rint(w)
    p[250, 1] = 0.2  # wobble overflow: 0.2 * r = 3.2 > D = 1
    r = np.zeros((500, 7), np.float32)
    r[:, poi_mod.R3_ZNCC] = 0.5
    t = oc.new_table_3d(x, y, z).replace(p=jnp.asarray(p), r=jnp.asarray(r))

    icgn = oc.ICGN3D1(16, 16, 16, 0.001, 10)  # default lattice, chunk 500
    icgn.set_images(ref, tar)
    icgn.prepare()
    t0 = time.time()
    out = icgn.compute(t)
    zncc = np.asarray(out.r)[:, poi_mod.R3_ZNCC]  # forced readback
    dt = time.time() - t0
    uo = np.asarray(out.p)[:, 0]
    ok = zncc > 0.8
    print(json.dumps({
        "metric": "lattice_fallback_probe_forced_s", "value": round(dt, 2),
        "unit": "s", "converged": int(ok.sum()), "n": 500,
        "overflow_poi_zncc": round(float(zncc[250]), 4),
        "mean_abs_du_others": round(float(np.abs(uo - u)[ok].mean()), 5),
    }), flush=True)
    assert ok.sum() == 500 and zncc[250] > 0.9


if __name__ == "__main__":
    main()
