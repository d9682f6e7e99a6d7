"""FORCED-readback timings for the 2D baseline-table workloads.

Round-5 established that block_until_ready returns at enqueue on this
backend even for single programs (PERF.md round-5 device-profiling
section), so every earlier "steady" 2D row is an upper bound on nothing.
This harness re-measures each stage honestly: warm up (compile + first
readback so the session is in its steady polled mode), then time ONE
compute ended by a scalar readback derived from its outputs.

Each stage prints one JSON row {stage, forced_s, reference_s, speedup}.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

import opencorr_tpu as oc

GOLD = "/root/reference/examples/2d_dic"


def forced(fn, *readback_of):
    out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    _ = float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0])))
    t0 = time.perf_counter()
    out = fn()
    _ = float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0])))
    return time.perf_counter() - t0, out


def row(stage, dt, base):
    print(json.dumps({"stage": stage, "forced_s": round(dt, 3),
                      "reference_s": base,
                      "speedup": round(base / dt, 2)}), flush=True)


def main():
    ref = oc.Image2D.load(f"{GOLD}/oht_cfrp_0.bmp")
    tar = oc.Image2D.load(f"{GOLD}/oht_cfrp_4.bmp")
    pois0 = oc.poi_grid_2d((30, 30), 100, 300, 2)

    f = oc.FFTCC2D(16, 16)
    f.set_images(ref, tar)
    dt, seeded = forced(lambda: f.compute(pois0))
    row("fftcc_2d_30k_r16", dt, 0.0334)

    ic = oc.ICGN2D1(16, 16, 0.001, 10)
    ic.set_images(ref, tar)
    ic.prepare()
    dt, out1 = forced(lambda: ic.compute(seeded))
    row("icgn1_2d_30k_r16", dt, 0.552)

    icl = oc.ICLM2D1(16, 16, 0.001, 10)
    icl.set_images(ref, tar)
    icl.prepare()
    dt, _o = forced(lambda: icl.compute(seeded))
    row("iclm1_2d_30k_r16", dt, 0.738)

    nr = oc.NR2D1(16, 16, 0.001, 10)
    nr.set_images(ref, tar)
    nr.prepare()
    dt, _o = forced(lambda: nr.compute(seeded))
    row("nr1_2d_30k_r16", dt, 1.082)

    ic2 = oc.ICGN2D2(16, 16, 0.001, 10)
    ic2.set_images(ref, tar)
    ic2.prepare()
    dt, _o = forced(lambda: ic2.compute(seeded))
    row("icgn2_2d_30k_r16", dt, 0.194)  # reference GPU number

    st = oc.Strain(20)
    st.prepare(out1)
    dt, _o = forced(lambda: st.compute(out1))
    row("strain_2d_30k_r20", dt, 0.187)

    # SIFT2D on the rotation pair (device pipeline, forced through the
    # matched-keypoint readback the model already performs)
    r0 = oc.Image2D.load(f"{GOLD}/rotation_000.tif")
    r1 = oc.Image2D.load(f"{GOLD}/rotation_170.tif")
    s2 = oc.SIFT2D()
    s2.set_images(r0, r1)
    s2.prepare()
    s2.compute()  # warm
    t0 = time.perf_counter()
    s2.compute()
    dt = time.perf_counter() - t0
    row("sift2d_rotation_pair", dt, 0.357)
    print(json.dumps({"stage": "sift2d_matches",
                      "n": int(len(s2.ref_matched_kp))}), flush=True)


if __name__ == "__main__":
    main()
