"""Honest FeatureAffine3D timing at the Torus workload (VERDICT round-3
weak #3: the 3.4 s forced number was first-readback tunnel latency, not the
stage).

Method: the slope estimator from bench_gather_ab.py — enqueue k
steady-state ``compute()`` passes (the device executes programs in order)
and force ONE scalar readback; the (k_hi - k_lo)/(k_hi-k_lo) slope across
two fresh subprocesses cancels warmup, compile and tunnel queue-drain
constants.  Baseline: 0.511 s CPU (Torus_def_sift_icgn1_r16_time.csv).

Run: python -u bench_fa3d_forced.py            # orchestrates both ks
     python -u bench_fa3d_forced.py run K      # one measurement
"""

import json
import subprocess
import sys
import time

import numpy as np

BASE_S = 0.510974


def run_one(k):
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
    out = fa.compute(pois0)  # compile + candidate cache, enqueue only
    jax.block_until_ready(out.p)

    t0 = time.time()
    for _ in range(k):
        out = fa.compute(pois0)
    forced = float(np.asarray(jnp.sum(out.p[:, 0])))
    elapsed = time.time() - t0
    print(json.dumps({"k": k, "elapsed": round(elapsed, 3),
                      "forced": round(forced, 3)}), flush=True)


def main():
    per = {}
    for k in (2, 10):
        for attempt in range(3):
            try:
                out = subprocess.run(
                    [sys.executable, "-u", __file__, "run", str(k)],
                    capture_output=True, text=True, timeout=900)
                lines = [l for l in out.stdout.splitlines()
                         if l.startswith("{")]
                if lines:
                    per.setdefault(k, []).append(
                        json.loads(lines[-1])["elapsed"])
            except subprocess.TimeoutExpired:
                pass
    if per.get(2) and per.get(10):
        slope = (min(per[10]) - min(per[2])) / 8.0
        print(json.dumps({
            "stage": "FeatureAffine3D_steady", "n_poi": 78700,
            "per_compute_s": round(slope, 4),
            "t_k2": min(per[2]), "t_k10": min(per[10]),
            "vs_baseline": round(BASE_S / max(slope, 1e-9), 1)}), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "run":
        run_one(int(sys.argv[2]))
    else:
        main()
