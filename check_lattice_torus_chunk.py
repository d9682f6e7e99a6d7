"""Isolate the Torus-scale lattice hang: prefilter, then ONE 250-POI chunk.

Prints a line after each step; run under timeout to find where it stalls.
"""
import json
import os
import sys
import time

import numpy as np

from bench_dvc_torus import _load_pair, _warp_displacement


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    mode = sys.argv[2] if len(sys.argv) > 2 else "lattice"
    import jax
    import jax.numpy as jnp
    from opencorr_tpu.ops import icgn as icgn_ops, bspline, gradient

    from opencorr_tpu.models.base import _upload_f32

    ref, tar = _load_pair()
    t0 = time.time()
    refd = _upload_f32(ref)
    tard = _upload_f32(tar)
    coeff = bspline.tricubic_prepare(tard)
    gx = gradient.gradient_x_3d(refd)
    gy = gradient.gradient_y_3d(refd)
    gz = gradient.gradient_z_3d(refd)
    jax.block_until_ready((coeff, gx, gy, gz))
    print(json.dumps({"step": "prepare_enqueued",
                      "s": round(time.time() - t0, 1)}), flush=True)

    pois_xyz = np.genfromtxt("/root/reference/examples/dvc/Torus_POIs.csv",
                             delimiter=",", skip_header=1, dtype=np.float32)

    k = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    start = int(os.environ.get("START", "0"))
    t0 = time.time()
    dep = jnp.float32(0.0)
    outs = []
    us = []
    for c in range(k):
        blk = pois_xyz[start + c * n:start + (c + 1) * n]
        x, y, z = blk[:, 0], blk[:, 1], blk[:, 2]
        u, v, w = _warp_displacement(x, y, z)
        us.append(u)
        p0 = np.zeros((n, 12), np.float32)
        p0[:, 0] = np.rint(u)
        p0[:, 4] = np.rint(v)
        p0[:, 8] = np.rint(w)
        out = icgn_ops.icgn3d1(
            gx, gy, gz, refd, coeff,
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(z),
            jnp.asarray(p0) + dep, jnp.zeros(n, jnp.float32),
            jnp.float32(0.001), jnp.float32(10),
            rx=16, ry=16, rz=16, window_margin=8, eval_mode=mode)
        # serializing dependency (value stays 0.0): forces in-order
        # execution so queued chunks don't hold temps concurrently
        d0 = out[4].ravel()[0]
        dep = jnp.where(jnp.isfinite(d0), d0, 0.0) * 0.0
        outs.append(out)
    jax.block_until_ready(out[0])
    print(json.dumps({"step": "chunk_enqueued", "k": k,
                      "s": round(time.time() - t0, 1)}), flush=True)

    t0 = time.time()
    zncc = np.concatenate([np.asarray(o[4]) for o in outs])
    uo = np.concatenate([np.asarray(o[0][:, 0]) for o in outs])
    its = np.stack([np.asarray(o[5]) for o in outs])
    print(json.dumps({"step": "forced", "s": round(time.time() - t0, 1),
                      "converged": float((zncc > 0.8).mean()),
                      "mean_du": float(np.abs(uo - np.concatenate(us)).mean()),
                      "it_max_per_chunk": [float(m) for m in its.max(1)],
                      "it_mean": round(float(its.mean()), 2)}), flush=True)


if __name__ == "__main__":
    main()
