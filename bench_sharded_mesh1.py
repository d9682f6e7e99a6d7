"""ShardedICGN3D1 on a mesh of ONE device vs the single-chip class
(VERDICT round-4 item 2 done-criterion: the sharded path, now on the
lattice kernel with a device-resident compute, should match the 48-51 s
forced Torus class of the plain ICGN3D1).

Same workload as bench_icgn3d_forced.py: committed 78,700-POI list, r=16,
synthetic Torus pair, integer seeds from the known warp, ONE forced table
readback proving convergence + accuracy.
"""

import json
import time

import numpy as np

from bench_dvc_torus import _load_pair, _warp_displacement

BASE_ICGN_S = 66.5677


def main():
    import jax
    import jax.numpy as jnp

    import opencorr_tpu as oc
    from opencorr_tpu.data import poi as poi_mod
    from opencorr_tpu.parallel import halo as halo_mod
    from jax.sharding import Mesh

    ref, tar = _load_pair()
    pois_xyz = np.genfromtxt("/root/reference/examples/dvc/Torus_POIs.csv",
                             delimiter=",", skip_header=1, dtype=np.float32)
    x, y, z = pois_xyz[:, 0], pois_xyz[:, 1], pois_xyz[:, 2]
    u, v, w = _warp_displacement(x, y, z)
    p = np.zeros((len(x), 12), np.float32)
    p[:, 0], p[:, 4], p[:, 8] = np.rint(u), np.rint(v), np.rint(w)
    r = np.zeros((len(x), 7), np.float32)
    r[:, poi_mod.R3_ZNCC] = 0.5
    table = oc.new_table_3d(x, y, z).replace(
        p=jnp.asarray(p), r=jnp.asarray(r))

    mesh = Mesh(np.array(jax.devices()[:1]), ("z",))
    m = halo_mod.ShardedICGN3D1(16, 16, 16, 0.001, 10)
    m.set_images(ref, tar)

    t0 = time.time()
    out = m.compute(table, mesh)
    zncc = np.asarray(out.r)[:, poi_mod.R3_ZNCC]  # forced
    forced_s = time.time() - t0
    uo = np.asarray(out.p)[:, 0]
    ok = zncc > 0.8
    print(json.dumps({
        "metric": "sharded_icgn3d1_mesh1_torus_forced_s",
        "value": round(forced_s, 2), "unit": "s", "n_poi": int(table.n),
        "vs_baseline": round(BASE_ICGN_S / forced_s, 2),
        "converged_frac": round(float(ok.mean()), 4),
        "mean_abs_du": round(float(np.abs(uo - u)[ok].mean()), 5),
    }), flush=True)


if __name__ == "__main__":
    main()
