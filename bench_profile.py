"""Roofline evidence for the ICGN1 kernel on the real chip (VERDICT weak #3).

Two sources of truth:

1. XLA's own cost model: `compiled.cost_analysis()` reports the FLOP count and
   bytes-accessed of the lowered ICGN program.  Dividing by the measured
   steady-state execution time gives achieved FLOP/s and HBM bandwidth, which
   we compare against TPU v5e peak (197 TFLOP/s bf16 / ~49 TFLOP/s fp32 MXU,
   819 GB/s HBM — jax-ml.github.io/scaling-book numbers).

2. Optional `jax.profiler` trace (PROFILE_TRACE=/path): a TensorBoard trace of
   the pipelined steady-state loop for op-level inspection on real hardware.

Run on the TPU: `python bench_profile.py`.  Under the axon tunnel no
device->host transfer happens before timing (CLAUDE.md gotcha).
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

import opencorr_tpu as oc
from opencorr_tpu.data import poi as poi_mod
from opencorr_tpu.models import icgn as icgn_model

GOLD_DIR = "/root/reference/examples/2d_dic"

# TPU v5e peaks (scaling-book): bf16 MXU 1.97e14 FLOP/s, fp32 ~4.9e13,
# HBM 8.1e11 B/s.
PEAK_BF16 = 1.97e14
PEAK_F32 = 4.9e13
PEAK_HBM = 8.1e11


def main():
    ref = oc.Image2D.load(f"{GOLD_DIR}/oht_cfrp_0.bmp").mat
    tar = oc.Image2D.load(f"{GOLD_DIR}/oht_cfrp_4.bmp").mat

    pois0 = oc.poi_grid_2d((30, 30), 100, 300, 2)
    n = int(pois0.n)

    fftcc = oc.FFTCC2D(16, 16)
    fftcc.set_images(ref, tar)
    icgn = oc.ICGN2D1(16, 16, 0.001, 10)
    icgn.set_images(ref, tar)
    icgn.prepare()

    seeded = fftcc.compute(pois0)
    jax.block_until_ready(seeded.p)

    # Lower the exact fused program the model wrapper runs and pull XLA's cost
    # analysis for it.
    r = icgn.subset_radius_x
    args = (icgn._gx, icgn._gy, icgn.ref_img, icgn._lut, seeded.x, seeded.y,
            seeded.p, seeded.r, seeded.sr, jnp.float32(icgn.conv_criterion),
            jnp.float32(icgn.stop_condition), None)
    lowered = icgn_model._icgn2d_full.lower(
        *args, order=1, rx=r, ry=r)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    # Steady state: pipeline 20 async dispatches per measurement.
    out = icgn.compute(seeded)
    jax.block_until_ready(out.p)
    reps = 20
    times = []
    trace_dir = os.environ.get("PROFILE_TRACE")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    for _ in range(5):
        t0 = time.perf_counter()
        outs = [icgn.compute(seeded) for _ in range(reps)]
        jax.block_until_ready([o.p for o in outs])
        times.append((time.perf_counter() - t0) / reps)
    if trace_dir:
        jax.profiler.stop_trace()
    dt = float(np.median(times))

    achieved_flops = flops / dt
    achieved_bw = bytes_acc / dt
    print(json.dumps({
        "kernel": "icgn2d1_r16_30k_fused",
        "xla_flops": flops,
        "xla_bytes_accessed": bytes_acc,
        "steady_s": round(dt, 6),
        "poi_per_s": round(n / dt, 1),
        "achieved_tflop_s": round(achieved_flops / 1e12, 3),
        "achieved_hbm_gb_s": round(achieved_bw / 1e9, 2),
        "pct_peak_f32_mxu": round(100 * achieved_flops / PEAK_F32, 2),
        "pct_peak_bf16_mxu": round(100 * achieved_flops / PEAK_BF16, 2),
        "pct_peak_hbm": round(100 * achieved_bw / PEAK_HBM, 2),
        "arith_intensity_flop_per_byte": round(flops / max(bytes_acc, 1), 2),
        "note": ("XLA cost model counts every POI at the static 10-iteration "
                 "bound; real converged iterations average fewer, so achieved "
                 "numbers are upper bounds on useful work"),
    }), flush=True)


if __name__ == "__main__":
    main()
