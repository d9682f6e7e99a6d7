"""Honest FeatureAffine3D timing at the Torus workload.

History of the measurement (each round replaced the previous artifact):
  round 3: 3.4 s "forced" = first-readback tunnel latency, not the stage.
  round 4: 0.278 s slope across enqueued multi-chunk passes = the
           sandbox's POLLED QUEUE-DRAIN rate (~30 ms per queued program
           after the session's first transfer), not device time — proven
           in round 5 by making the whole 78.7k-POI queue ONE program:
           the "slope" stayed ~0.3 s/pass while a per-call
           ``block_until_ready`` (honest for single jitted programs,
           CLAUDE.md) measures 0.3 ms, and an in-program cumulative bisect
           of the RANSAC core confirms every stage is sub-ms.

Current method: k back-to-back ``compute()`` calls, each blocked to
completion (one jitted program per call — block is honest there), plus one
final forced scalar readback whose cost is the tunnel's fixed
once-per-process transfer flip (~1.7 s here, identical for any stage and
absent on directly-attached hardware).

Baseline: 0.511 s CPU (Torus_def_sift_icgn1_r16_time.csv).

Run: python -u bench_fa3d_forced.py
"""

import json
import sys
import time

import numpy as np

BASE_S = 0.510974


def main(k=10):
    import jax
    import jax.numpy as jnp

    import opencorr_tpu as oc
    from bench_dvc_torus import _ground_truth_matches

    mk1, mk2 = _ground_truth_matches()
    pois_xyz = np.genfromtxt("/root/reference/examples/dvc/Torus_POIs.csv",
                             delimiter=",", skip_header=1, dtype=np.float32)
    pois0 = oc.new_table_3d(pois_xyz[:, 0], pois_xyz[:, 1], pois_xyz[:, 2])

    fa = oc.FeatureAffine3D(16, 16, 16)
    fa.set_keypoint_pair(mk1, mk2)
    fa.prepare(pois0, points=pois_xyz[:, :3])
    out = fa.compute(pois0)  # compile + candidate cache
    jax.block_until_ready((out.p, out.r))

    t0 = time.time()
    for _ in range(k):
        out = fa.compute(pois0)
        jax.block_until_ready((out.p, out.r))
    per_call = (time.time() - t0) / k

    t1 = time.time()
    out = fa.compute(pois0)
    forced = float(np.asarray(jnp.sum(out.p[:, 0])))
    forced_s = time.time() - t1
    seeded = float((np.asarray(out.r[:, 3]) >= 0).mean())

    print(json.dumps({
        "stage": "FeatureAffine3D", "n_poi": int(pois0.n), "k": k,
        "per_compute_blocked_s": round(per_call, 5),
        "forced_one_s": round(forced_s, 3),
        "note": "forced_one includes the tunnel's fixed once-per-process "
                "first-transfer flip (~1.7 s, stage-independent)",
        "seeded_frac": round(seeded, 4), "checksum": round(forced, 3),
        "vs_baseline_blocked": round(BASE_S / max(per_call, 1e-9), 1),
    }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
