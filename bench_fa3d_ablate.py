"""FA3D RANSAC sub-stage attribution (round-5: the single-program queue
measured 0.33 s forced — NOT dispatch-bound as round 4 hypothesized, so the
wall is inside the kernel).

Stages (cumulative, Torus workload: 78,700 POIs, kc from the host
candidate stage, T=32 trials):
  prng   threefry sample-index generation [4, N, T]
  solve  + candidate gathers + per-trial 4x4 affine solves
  errs   + fused-broadcast consensus (the [N, T, kc] error field)
  full   the complete feature_affine_3d_idx (+ best-trial refit/select)

Slope method (bench_gather_ab.py): chain k data-dependent repetitions,
force ONE scalar readback, difference two k values across fresh
subprocesses.

Run: python -u bench_fa3d_ablate.py            # orchestrate
     python -u bench_fa3d_ablate.py run STAGE K
"""

import json
import subprocess
import sys
import time

import numpy as np


def run_stage(stage, k):
    import jax
    import jax.numpy as jnp

    import opencorr_tpu as oc
    from bench_dvc_torus import _ground_truth_matches
    from opencorr_tpu.models import feature_affine as famod
    from opencorr_tpu.ops import feature_affine as fa_ops
    from opencorr_tpu.ops import linalg as linalg_ops

    mk1, mk2 = _ground_truth_matches()
    pois_xyz = np.genfromtxt("/root/reference/examples/dvc/Torus_POIs.csv",
                             delimiter=",", skip_header=1, dtype=np.float32)
    fa = oc.FeatureAffine3D(16, 16, 16)
    fa.set_keypoint_pair(mk1, mk2)
    from scipy.spatial import cKDTree

    fa._tree = cKDTree(fa.ref_kp)
    idx_np, cand_np, enough_np = famod._host_candidates(
        fa._tree, pois_xyz[:, :3].astype(np.float64), 128,
        fa.neighbor_search_radius, fa.neighbor_number_min, 4)
    n, kc = idx_np.shape
    print(json.dumps({"kc_eff": kc, "n": n}), flush=True)

    trials, samples = 32, 4
    ref_kp = jnp.asarray(fa.ref_kp)
    tar_kp = jnp.asarray(fa.tar_kp)
    xs = jnp.asarray(pois_xyz[:, 0])
    ys = jnp.asarray(pois_xyz[:, 1])
    zs = jnp.asarray(pois_xyz[:, 2])
    idx = jnp.asarray(idx_np)
    cand = jnp.asarray(cand_np)
    enough = jnp.asarray(enough_np)

    def prng_part(seed, n_cand):
        key = jax.random.PRNGKey(seed)
        u = jax.random.randint(key, (4, n, trials), 0, 1 << 30)
        nn = jnp.maximum(n_cand, samples)[:, None]
        j1 = u[0] % nn
        j2 = (j1 + 1 + u[1] % (nn - 1)) % nn
        lo = jnp.minimum(j1, j2)
        hi = jnp.maximum(j1, j2)
        j3 = u[2] % jnp.maximum(nn - 2, 1)
        j3 = jnp.where(j3 >= lo, j3 + 1, j3)
        j3 = jnp.where(j3 >= hi, j3 + 1, j3)
        s = jnp.sort(jnp.stack([j1, j2, j3], -1), axis=-1)
        j4 = u[3] % jnp.maximum(nn - 3, 1)
        j4 = jnp.where(j4 >= s[..., 0], j4 + 1, j4)
        j4 = jnp.where(j4 >= s[..., 1], j4 + 1, j4)
        j4 = jnp.where(j4 >= s[..., 2], j4 + 1, j4)
        return jnp.stack([j1, j2, j3, j4], axis=-1)

    if stage == "prng":
        @jax.jit
        def step(bias, idx_b, cand_b):
            n_cand = jnp.sum(cand_b, axis=1).astype(jnp.int32)
            si = prng_part(jnp.int32(bias), n_cand)
            return jnp.sum(si) * 1e-12 + bias * 0

        bufs = (idx, cand)
    elif stage in ("solve", "errs"):
        @jax.jit
        def step(bias, idx_b, cand_b, rkp, tkp, xb, yb, zb):
            ctr = jnp.stack([xb, yb, zb], axis=-1)
            rc = rkp[idx_b] - ctr[:, None] + bias * 1e-20
            tc = tkp[idx_b] - ctr[:, None]
            n_cand = jnp.sum(cand_b, axis=1).astype(jnp.int32)
            si = prng_part(jnp.int32(0), n_cand)
            take = jax.vmap(lambda c, i: c[i])
            a_ref = take(rc, si)
            a_tar = take(tc, si)
            ones = jnp.ones(a_ref.shape[:-1] + (1,), jnp.float32)
            amat = jnp.concatenate([a_ref, ones], axis=-1)
            bmat = jnp.concatenate([a_tar, ones], axis=-1)
            affine = linalg_ops.solve_small(amat, bmat)
            if stage == "solve":
                return jnp.sum(affine) * 1e-12
            e2 = None
            for d in range(3):
                pd = (rc[:, None, :, 0] * affine[..., 0, d, None]
                      + rc[:, None, :, 1] * affine[..., 1, d, None]
                      + rc[:, None, :, 2] * affine[..., 2, d, None]
                      + affine[..., 3, d, None])
                dd = pd - tc[:, None, :, d]
                e2 = dd * dd if e2 is None else e2 + dd * dd
            err = jnp.sqrt(e2)
            inlier = (err < 3.2) & cand_b[:, None, :]
            return jnp.sum(jnp.sum(inlier, axis=2)) * 1e-12

        bufs = (idx, cand, ref_kp, tar_kp, xs, ys, zs)
    elif stage == "full":
        @jax.jit
        def step(bias, idx_b, cand_b, en_b, rkp, tkp, xb, yb, zb):
            out = fa_ops.feature_affine_3d_idx(
                rkp, tkp, xb + bias * 1e-20, yb, zb, idx_b, cand_b, en_b,
                jnp.float32(16.0), jnp.float32(3.2), jnp.int32(0),
                trials=trials, samples=samples)
            return jnp.sum(out[0]) * 1e-12

        bufs = (idx, cand, enough, ref_kp, tar_kp, xs, ys, zs)
    else:
        raise SystemExit(f"unknown stage {stage}")

    b = step(jnp.float32(0.0), *bufs)
    jax.block_until_ready(b)
    t0 = time.time()
    for _ in range(k):
        b = step(b, *bufs)
    forced = float(np.asarray(b))
    print(json.dumps({"stage": stage, "k": k,
                      "elapsed": round(time.time() - t0, 2),
                      "forced": forced}), flush=True)


def orchestrate():
    stages = (sys.argv[1].split(",") if len(sys.argv) > 1
              else ["prng", "solve", "errs", "full"])
    ks = (2, 12)
    for stage in stages:
        per = {}
        for k in ks:
            for attempt in range(2):
                try:
                    out = subprocess.run(
                        [sys.executable, "-u", __file__, "run", stage,
                         str(k)], capture_output=True, text=True,
                        timeout=900)
                    line = [l for l in out.stdout.splitlines()
                            if '"elapsed"' in l]
                    if line:
                        per[k] = json.loads(line[-1])["elapsed"]
                        break
                    print(json.dumps({"stage": stage, "k": k,
                                      "stderr": out.stderr[-300:]}),
                          flush=True)
                except subprocess.TimeoutExpired:
                    pass
        if ks[0] in per and ks[1] in per:
            print(json.dumps({
                "stage": stage, "t_lo": per[ks[0]], "t_hi": per[ks[1]],
                "per_run_s": round(
                    (per[ks[1]] - per[ks[0]]) / (ks[1] - ks[0]), 4)}),
                flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "run":
        run_stage(sys.argv[2], int(sys.argv[3]))
    else:
        orchestrate()
