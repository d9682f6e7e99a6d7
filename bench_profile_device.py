"""REAL device-time profiles via jax.profiler (round 5: the axon backend
turns out to support tracing — the first measured device numbers in this
sandbox, superseding the cost-model caps and enqueue-rate wall clocks).

For each workload: warm up, trace k back-to-back steady-state calls, sum
the /device:TPU lane's event durations from the trace, and report device
ms per call.  The device lane cannot be inflated by dispatch pipelining or
deflated by tunnel stalls — it is the chip's own timeline.

Workloads: the flagship 2D ICGN1 (30k POIs, r=16), FFTCC2D, one lattice
ICGN3D1 chunk (500 POIs, r=16, Torus dims), and the fused SIFT3D
descriptor at octave-0 layer-1 shapes.

Run: python -u bench_profile_device.py [workload ...]
"""

import glob
import gzip
import json
import os
import sys
import time

import numpy as np

TRACE_DIR = "/tmp/oc_device_trace"


def device_ms_from_trace(trace_dir):
    """Sum X-phase event durations on the /device:TPU lane (ms)."""
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(paths[-1]) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e["args"].get("name", ""))}
    return sum(e.get("dur", 0) for e in ev
               if e.get("ph") == "X" and e["pid"] in dev_pids) / 1e3


def profile(name, fn, k=10):
    import jax

    out = fn()
    jax.block_until_ready(out)
    d = os.path.join(TRACE_DIR, name)
    with jax.profiler.trace(d):
        for _ in range(k):
            out = fn()
        jax.block_until_ready(out)
    ms = device_ms_from_trace(d) / k
    return ms


def wl_icgn2d():
    import jax
    import jax.numpy as jnp

    import opencorr_tpu as oc

    ref = oc.Image2D.load("/root/reference/examples/2d_dic/oht_cfrp_0.bmp")
    tar = oc.Image2D.load("/root/reference/examples/2d_dic/oht_cfrp_4.bmp")
    pois = oc.poi_grid_2d((30, 30), 100, 300, 2)
    f = oc.FFTCC2D(16, 16)
    f.set_images(ref, tar)
    pois = f.compute(pois)
    ic = oc.ICGN2D1(16, 16, 0.001, 10)
    ic.set_images(ref, tar)
    ic.prepare()
    n = int(pois.n)

    ms = profile("icgn2d", lambda: ic.compute(pois).p)
    poi_s = n / (ms / 1e3)
    print(json.dumps({
        "workload": "icgn1_2d_30k_r16", "n_poi": n,
        "device_ms_per_compute": round(ms, 3),
        "device_poi_per_s": round(poi_s),
        "vs_cpu_baseline": round(poi_s / (n / 0.552), 1)}), flush=True)

    ms = profile("fftcc2d", lambda: f.compute(pois).p)
    print(json.dumps({
        "workload": "fftcc_2d_30k_r16", "n_poi": n,
        "device_ms_per_compute": round(ms, 3),
        "device_poi_per_s": round(n / (ms / 1e3))}), flush=True)


def wl_icgn3d():
    import jax
    import jax.numpy as jnp

    import opencorr_tpu as oc
    from opencorr_tpu.data import poi as poi_mod
    from bench_dvc_torus import _load_pair, _warp_displacement

    ref, tar = _load_pair()
    pois_xyz = np.genfromtxt(
        "/root/reference/examples/dvc/Torus_POIs.csv",
        delimiter=",", skip_header=1, dtype=np.float32)[:500]
    x, y, z = pois_xyz[:, 0], pois_xyz[:, 1], pois_xyz[:, 2]
    u, v, w = _warp_displacement(x, y, z)
    p = np.zeros((500, 12), np.float32)
    p[:, 0], p[:, 4], p[:, 8] = np.rint(u), np.rint(v), np.rint(w)
    r = np.zeros((500, 7), np.float32)
    r[:, poi_mod.R3_ZNCC] = 0.5
    t = oc.new_table_3d(x, y, z).replace(p=jnp.asarray(p), r=jnp.asarray(r))
    icgn = oc.ICGN3D1(16, 16, 16, 0.001, 10)
    icgn.set_images(ref, tar)
    icgn.prepare()

    ms = profile("icgn3d_chunk", lambda: icgn.compute(t).p, k=5)
    print(json.dumps({
        "workload": "icgn3d1_lattice_chunk_500_r16",
        "device_ms_per_chunk": round(ms, 2),
        "projected_full_queue_s": round(ms / 1e3 * (78700 / 500), 1),
        "cpu_baseline_s": 66.5677}), flush=True)


def main():
    which = sys.argv[1:] or ["icgn2d", "icgn3d"]
    if "icgn2d" in which:
        wl_icgn2d()
    if "icgn3d" in which:
        wl_icgn3d()


if __name__ == "__main__":
    main()
