"""Sub-stage attribution for SIFT3D octave 0 (the 100-of-111-seconds stage,
bench_sift3d_breakdown.py).

The per-octave forced numbers are contaminated by the tunnel's fixed
transfer/drain noise (+-60 s observed on identical programs — PERF.md
round-4 DVC section), so each stage is timed by the SLOPE method from
bench_gather_ab.py: chain k data-dependent repetitions, force one scalar
readback, and difference two k values across fresh subprocesses.

Stages (octave 0, full [568, 288, 940] dims, real synth volume):
  blur   the 6-layer incremental blur chain + 5 DoGs + max|.|
  ext    extrema_compact x3 layers (k_e = 65536)
  orient orient_keypoints x3 layers (r=16, chunk 256) on REAL extrema
  desc   describe_keypoints x3 layers (r=24/32/40, chunk 64/32/16) on REAL
         surviving keypoints

Run: python -u bench_sift3d_stages.py            # orchestrate
     python -u bench_sift3d_stages.py run STAGE K
"""

import json
import subprocess
import sys
import time

import numpy as np

from bench_dvc_torus import _load_pair

SIGMAS = None  # filled from the model config at runtime


def _setup():
    import opencorr_tpu as oc
    from opencorr_tpu.models import sift3d as msift
    from opencorr_tpu.models.base import _upload_f32

    ref, _ = _load_pair()
    sift = oc.SIFT3D(pyramid_backend="device")
    sift.set_images(ref, ref)
    sift.prepare()
    cfg = sift.sift_config
    layers = sift._plan_layers(ref.shape)
    lpo_g = cfg.n_octave_layers + 3
    sigmas = tuple(layers[n].sigma for n in range(lpo_g))
    units = layers[0].units
    return _upload_f32(ref), cfg, layers, sigmas, units, msift


def run_stage(stage, k):
    import math

    import jax
    import jax.numpy as jnp
    from opencorr_tpu.ops import sift3d as ops3d

    vol, cfg, layers, sigmas, units, msift = _setup()
    # Python floats / numpy only: a jitted closure capturing a DEVICE array
    # is read back at lowering and flips the session into polled dispatch
    # mode (CLAUDE.md) — every device buffer must be a traced argument.
    alpha = float(cfg.alpha)
    grad_thr = float(cfg.gradient_threshold)
    beta = float(cfg.beta)
    gamma = float(cfg.gamma)
    trunc = float(cfg.truncate_threshold)
    units_arr = np.array(units, np.float32)

    def layer_param(n):
        g = layers[n]
        voxels = int(np.prod(g.dims))
        k_e = int(np.clip(voxels // 1024, 256, 65536))
        k_e = 1 << (k_e - 1).bit_length()
        scale = g.scale
        r_cap = (min(g.dims) - 1) // 2
        r_o = min(msift._bucket8(
            int(math.ceil(3.0 * 1.5 * scale / g.units[0])) + 1), r_cap)
        sphere = 2.0 * 5.0 * math.sqrt(2.0) * scale
        r_d = min(msift._bucket8(
            int(math.ceil(sphere / g.units[0])) + 1), r_cap)
        chunk_o = ops3d._pow2_chunk(k_e, 2 * r_o + 1)
        k_d = max(k_e // 2, 256)
        chunk_d = ops3d._pow2_chunk(k_d, 2 * r_d + 1)
        return k_e, r_o, chunk_o, k_d, r_d, chunk_d, scale

    if stage == "blur":
        @jax.jit
        def step(bias, seed):
            g, dogs, mx = ops3d.octave_stack(
                seed + bias, sigmas=sigmas, unit_xyz=units)
            return sum(mx) * 1e-9

        bufs = (vol,)
    else:
        # build the blur stack + per-layer extrema once (enqueued)
        g, dogs, max_abs = ops3d.octave_stack(
            vol, sigmas=sigmas, unit_xyz=units)
        if stage == "ext":
            @jax.jit
            def step(bias, ma1, ma2, ma3, *dogs):
                mas = (ma1, ma2, ma3)
                acc = jnp.float32(0.0)
                for n in (1, 2, 3):
                    k_e = layer_param(n)[0]
                    x, y, z, ok = ops3d.extrema_compact(
                        dogs[n - 1], dogs[n], dogs[n + 1],
                        (alpha + bias) * mas[n - 1], k_cap=k_e)
                    acc = acc + jnp.sum(x * ok) * 1e-9
                return acc * 1e-9

            bufs = (max_abs[1], max_abs[2], max_abs[3]) + tuple(dogs)
        else:
            exts = []
            for n in (1, 2, 3):
                k_e, r_o, chunk_o, k_d, r_d, chunk_d, scale = layer_param(n)
                x, y, z, ok = ops3d.extrema_compact(
                    dogs[n - 1], dogs[n], dogs[n + 1], alpha * max_abs[n],
                    k_cap=k_e)
                exts.append((n, x, y, z, ok, scale))
            if stage == "orient":
                @jax.jit
                def step(bias, g1, g2, g3, *ext_flat):
                    gs = (g1, g2, g3)
                    acc = jnp.float32(0.0)
                    for i, (n, scale) in enumerate(
                            [(e[0], e[5]) for e in exts]):
                        x, y, z, ok = ext_flat[4 * i: 4 * i + 4]
                        _, r_o, chunk_o, _, _, _, _ = layer_param(n)
                        rot, ok2 = ops3d.orient_keypoints(
                            gs[i], x, y, z, ok, jnp.float32(scale),
                            units_arr, grad_thr + bias, beta, gamma,
                            r=r_o, chunk=chunk_o)
                        acc = acc + jnp.sum(rot[:, 0, 0] * ok2)
                    return acc * 1e-9

                flat = []
                for e in exts:
                    flat += [e[1], e[2], e[3], e[4]]
                bufs = (g[1], g[2], g[3], *flat)
            elif stage.startswith("desc"):
                parts = {"desc": "full", "desc_fused": "fused",
                         "desc_nobary": "nobary",
                         "desc_noein": "noein"}[stage]
                surv = []
                for (n, x, y, z, ok, scale) in exts:
                    _, r_o, chunk_o, k_d, r_d, chunk_d, _ = layer_param(n)
                    rot, ok2 = ops3d.orient_keypoints(
                        g[n], x, y, z, ok, jnp.float32(scale), units_arr,
                        grad_thr, beta, gamma, r=r_o, chunk=chunk_o)
                    xd, yd, zd, rotd, okd = ops3d.compact_gather(
                        ok & ok2, x, y, z, rot, k_cap=k_d)
                    surv.append((n, xd, yd, zd, rotd, okd, scale))

                from opencorr_tpu.ops.sift3d import _sphere_crop

                @jax.jit
                def step(bias, g1, g2, g3, *sflat):
                    gs = (g1, g2, g3)
                    acc = jnp.float32(0.0)
                    for i, (n, scale) in enumerate(
                            [(s[0], s[6]) for s in surv]):
                        xd, yd, zd, rotd, okd = sflat[5 * i: 5 * i + 5]
                        _, _, _, k_d, r_d, chunk_d, _ = layer_param(n)
                        if parts == "fused":
                            crop = _sphere_crop(r_d, scale, units)
                            desc = ops3d.describe_keypoints_fused(
                                gs[i], xd, yd, zd, okd, rotd, trunc + bias,
                                crop=crop, scale=scale,
                                unit_xyz=units, chunk=chunk_d)
                        else:
                            desc = ops3d.describe_keypoints(
                                gs[i], xd, yd, zd, okd, rotd,
                                jnp.float32(scale), units_arr, trunc + bias,
                                r=r_d, chunk=chunk_d, parts=parts)
                        acc = acc + jnp.sum(desc[:, 0] * okd)
                    return acc * 1e-9

                flat = []
                for s in surv:
                    flat += [s[1], s[2], s[3], s[4], s[5]]
                bufs = (g[1], g[2], g[3], *flat)
            else:
                raise SystemExit(f"unknown stage {stage}")

    b = step(jnp.float32(0.0), *bufs)
    jax.block_until_ready(b)  # compile + enqueue
    t0 = time.time()
    for _ in range(k):
        b = step(b * 1e-20, *bufs)
    forced = float(np.asarray(b))
    print(json.dumps({"stage": stage, "k": k,
                      "elapsed": round(time.time() - t0, 2),
                      "forced": forced}), flush=True)


def orchestrate():
    ks = (2, 22)
    import sys as _sys
    stages = (_sys.argv[1].split(",") if len(_sys.argv) > 1
              else ["blur", "ext", "orient", "desc"])
    for stage in stages:
        per = {}
        for k in ks:
            for attempt in range(2):
                try:
                    out = subprocess.run(
                        [sys.executable, "-u", __file__, "run", stage,
                         str(k)], capture_output=True, text=True,
                        timeout=2400)
                    line = [l for l in out.stdout.splitlines()
                            if '"elapsed"' in l]
                    if line:
                        per[k] = json.loads(line[-1])["elapsed"]
                        break
                    print(json.dumps({"stage": stage, "k": k,
                                      "stderr": out.stderr[-400:]}),
                          flush=True)
                except subprocess.TimeoutExpired:
                    pass
                print(json.dumps({"stage": stage, "k": k,
                                  "retry": attempt + 1}), flush=True)
        if ks[0] in per and ks[1] in per:
            print(json.dumps({
                "stage": stage, "t_lo": per[ks[0]], "t_hi": per[ks[1]],
                "per_run_s": round(
                    (per[ks[1]] - per[ks[0]]) / (ks[1] - ks[0]), 3)}),
                flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "run":
        run_stage(sys.argv[2], int(sys.argv[3]))
    else:
        orchestrate()
