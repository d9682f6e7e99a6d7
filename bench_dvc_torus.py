"""Torus-scale DVC benchmark: SIFT3D + FeatureAffine3D + ICGN3D1.

The reference's second-hottest workload is test_dvc_sift_icgn1 on the Torus
CT pair (78 700 POIs, r=16): SIFT3D 233.5 s + FA3D 0.51 s + ICGN3D1 66.6 s on
CPU (examples/dvc/Torus_def_sift_icgn1_r16_time.csv).  The Torus volumes are
external downloads, so this benchmark synthesizes a speckle volume of the
same dimensions (the POI list and physical layout are the committed ones),
deforms it with a smooth displacement field, and runs the full TPU pipeline.

Sandbox structure (CLAUDE.md gotchas): two subprocess stages (``sift`` then
``dic``), each starting in the fast dispatch mode; every timing JSON line is
printed BEFORE the first device->host transfer of its process (the axon
tunnel's transfer path can wedge permanently after a heavy dispatch chain,
while dispatches and block_until_ready keep working).  ``python
bench_dvc_torus.py`` orchestrates both with retries; the persistent XLA
compile cache makes killed retries resume cheaply.

Prints one JSON line per stage plus the total.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

import opencorr_tpu as oc

BASE = {"SIFT": 233.48, "FeatureAffine": 0.510974, "ICGN": 66.5677}
CACHE = "/tmp/torus_synth_u8.npz"
KPS_NPZ = "/tmp/torus_sift_kps.npz"


def _warp_displacement(x, y, z, dims=(568, 288, 940)):
    """The synthetic warp's displacement (x/y/z voxel coords -> u, v, w),
    matching synth_torus_pair's resampling exactly."""
    dz, dy, dx = dims
    u = 1.2 * np.sin(2 * np.pi * x / dx) * np.cos(2 * np.pi * z / dz)
    v = 0.8 * np.cos(2 * np.pi * y / dy)
    w = 1.0 * np.sin(2 * np.pi * (x + z) / (dx + dz))
    return u, v, w


def _ground_truth_matches(dims=(568, 288, 940), n=20000, seed=1):
    """Keypoint matches from the known warp: ref points on a jittered grid,
    target = fixed point of q = p + d(q) (the synthesis warps target coords).

    Sandbox fallback only: after the Torus-scale SIFT dispatch chain, ANY
    device->host transfer crashes this sandbox's TPU worker (even a scalar),
    so the real matched keypoints cannot be read back here.  FA3D/ICGN3D cost
    does not depend on match provenance (same N, same neighbor structure), so
    the downstream stage timings remain representative; on real hardware the
    primary path reads back the true SIFT matches."""
    dz, dy, dx = dims
    rng = np.random.default_rng(seed)
    mk1 = np.stack([
        rng.uniform(8, dx - 8, n), rng.uniform(8, dy - 8, n),
        rng.uniform(8, dz - 8, n)], -1).astype(np.float32)
    q = mk1.copy()
    for _ in range(3):
        u, v, w = _warp_displacement(q[:, 0], q[:, 1], q[:, 2], dims)
        q = mk1 + np.stack([u, v, w], -1).astype(np.float32)
    return mk1, q


def synth_torus_pair(dims=(568, 288, 940), seed=0):
    """Speckle volume pair at Torus scale ([z, y, x]; POIs span x<=930,
    y<=280, z<=561) with a smooth sinusoidal warp (~1.5 vx amplitude).

    Trilinear resampling in float32, chunked over z: order-3 at 153M voxels
    takes >10 min on this host; the bench only needs a plausibly-warped
    speckle pair (convergence is sanity-checked, accuracy is gated by the
    synthetic-truth tests in tests/)."""
    from scipy.ndimage import gaussian_filter, map_coordinates

    dz, dy, dx = dims
    rng = np.random.default_rng(seed)
    ref = gaussian_filter(rng.standard_normal(dims).astype(np.float32), 1.6)
    ref = (ref * 55 + 128).astype(np.float32)

    tar = np.empty_like(ref)
    yy, xx = np.meshgrid(np.arange(dy, dtype=np.float32),
                         np.arange(dx, dtype=np.float32), indexing="ij")
    for z0 in range(0, dz, 64):
        z1 = min(z0 + 64, dz)
        zz = np.arange(z0, z1, dtype=np.float32)[:, None, None]
        u = 1.2 * np.sin(2 * np.pi * xx / dx) * np.cos(2 * np.pi * zz / dz)
        v = 0.8 * np.cos(2 * np.pi * yy / dy) + 0 * zz
        w = 1.0 * np.sin(2 * np.pi * (xx + zz) / (dx + dz))
        coords = [
            (zz - w).astype(np.float32) + 0 * xx,
            (yy - v).astype(np.float32),
            (xx - u).astype(np.float32),
        ]
        coords = np.broadcast_arrays(*coords)
        tar[z0:z1] = map_coordinates(ref, coords, order=1, mode="nearest")
    # 8-bit quantization: real CT volumes are uint8 (the reference's Torus
    # .bin payloads); the thin-wire upload path (models/base._upload_f32)
    # then moves 1 byte/voxel over the host link instead of 4.
    return (np.clip(np.rint(ref), 0, 255).astype(np.uint8),
            np.clip(np.rint(tar), 0, 255).astype(np.uint8))


def _load_pair():
    t0 = time.time()
    if os.path.exists(CACHE):
        d = np.load(CACHE)
        ref, tar = d["ref"], d["tar"]
    else:
        ref, tar = synth_torus_pair()
        np.savez(CACHE, ref=ref, tar=tar)
    print(json.dumps({"stage": "synthesize",
                      "seconds": round(time.time() - t0, 2),
                      "dims": list(ref.shape)}), flush=True)
    return ref, tar


def stage_sift():
    """SIFT3D feature extraction + matching, timed on device.

    The device phase (pyramids, extrema, orientation, descriptors, 2-NN
    tables) is timed to block_until_ready and reported before the keypoint
    readback; the readback + host elimination tail is reported separately
    (through this sandbox's tunnel a readback costs seconds of polled
    dispatch — on real hardware it is microseconds)."""
    ref, tar = _load_pair()
    sift = oc.SIFT3D(pyramid_backend="device",
                     hist_bf16=os.environ.get("SIFT3D_BF16") == "1")
    sift.set_images(ref, tar)
    sift.prepare()

    from opencorr_tpu.ops import sift3d as ops3d

    from opencorr_tpu.models.base import _upload_f32
    refd = _upload_f32(ref)
    tard = _upload_f32(tar)

    def run():
        kp1d, desc1d, ok1d = sift._extract_device(refd)
        kp2d, desc2d, ok2d = sift._extract_device(tard)
        d12, i12 = ops3d.match_top2(desc1d, desc2d, ok2d,
                                    chunk=min(2048, desc1d.shape[0]))
        jax.block_until_ready((kp1d, ok1d, kp2d, ok2d, d12, i12))
        return kp1d, desc1d, ok1d, kp2d, desc2d, ok2d, d12, i12

    def run_forced():
        """One full pipeline pass timed to a SCALAR readback: through the
        axon tunnel, block_until_ready on a multi-program chain returns at
        enqueue, not completion (PERF.md measurement-validity note) — only a
        value readback proves the device finished."""
        t0 = time.time()
        out = run()
        n_matches = int(np.asarray(jnp.sum(out[2])) + np.asarray(jnp.sum(out[5])))
        return time.time() - t0, out, n_matches

    t0 = time.time()
    run()  # compile / compile-cache load (enqueue only)
    cold_s = time.time() - t0
    dt1, _, _ = run_forced()  # absorbs compile/first-exec stragglers
    device_s, (kp1d, desc1d, ok1d, kp2d, desc2d, ok2d, d12, i12), nkp = \
        run_forced()
    print(json.dumps({"stage": "SIFT_device", "cold_s": round(cold_s, 2),
                      "warm_s": round(dt1, 2),
                      "seconds": round(device_s, 2), "kp_total": nkp,
                      "vs_baseline": round(BASE["SIFT"] / device_s, 1)}),
          flush=True)

    # keypoint/match readback + host many-to-one elimination tail
    t0 = time.time()
    try:
        kp1, ok1 = np.asarray(kp1d), np.asarray(ok1d)
        kp2, ok2 = np.asarray(kp2d), np.asarray(ok2d)
        from opencorr_tpu.models.sift3d import _mono_eliminate
        mk1, mk2 = _mono_eliminate(kp1, ok1, kp2, int(ok2.sum()),
                                   np.asarray(d12), np.asarray(i12),
                                   sift.matching_ratio)
        tail_s = time.time() - t0
        np.savez(KPS_NPZ, mk1=mk1, mk2=mk2,
                 device_s=device_s, tail_s=tail_s)
        print(json.dumps({"stage": "SIFT_readback_tail",
                          "seconds": round(tail_s, 2),
                          "kp": [int(ok1.sum()), int(ok2.sum())],
                          "matches": int(len(mk1))}), flush=True)
    except Exception as e:  # axon: worker crashes on ANY post-chain transfer
        mk1, mk2 = _ground_truth_matches()
        np.savez(KPS_NPZ, mk1=mk1[:, :3], mk2=mk2[:, :3],
                 device_s=device_s, tail_s=float("nan"))
        print(json.dumps({"stage": "SIFT_readback_tail", "crashed": True,
                          "error": type(e).__name__,
                          "fallback": "ground_truth_warp_matches",
                          "matches": int(len(mk1))}), flush=True)


def stage_dic():
    """FA3D seeding + ICGN3D1 at the committed Torus POI list as ONE device
    pipeline: FA3D's seeded table feeds ICGN3D1 directly on device (no
    intermediate readback — the first readback flips this sandbox's tunnel
    into a polled dispatch mode that would serialize the 158 ICGN chunk
    programs at seconds each, PERF.md round-4), and a single final table
    readback forces completion and proves convergence.  Per-stage numbers
    come from the dedicated harnesses (bench_fa3d_forced.py slope,
    bench_icgn3d_forced.py single-stage forced)."""
    ref, tar = _load_pair()
    d = np.load(KPS_NPZ)
    mk1, mk2 = d["mk1"], d["mk2"]
    sift_device_s = float(d["device_s"])

    pois_xyz = np.genfromtxt("/root/reference/examples/dvc/Torus_POIs.csv",
                             delimiter=",", skip_header=1, dtype=np.float32)
    pois0 = oc.new_table_3d(pois_xyz[:, 0], pois_xyz[:, 1], pois_xyz[:, 2])

    fa = oc.FeatureAffine3D(16, 16, 16)
    fa.set_keypoint_pair(mk1, mk2)
    icgn = oc.ICGN3D1(16, 16, 16, 0.001, 10,
                      eval_mode=os.environ.get("DVC_EVAL_MODE", "lattice"))
    icgn.set_images(ref, tar)

    t0 = time.time()
    fa.prepare(pois0, points=pois_xyz[:, :3])
    seeded = fa.compute(pois0)
    icgn.prepare()
    pois = icgn.compute(seeded)
    zncc = np.asarray(pois.r[:, 3])  # ONE forced readback: FA + ICGN
    dic_s = time.time() - t0
    conv = float((zncc > 0.8).mean())
    print(json.dumps({"stage": "DIC_pipeline_forced",
                      "seconds": round(dic_s, 2), "n_poi": int(pois.n),
                      "converged_frac": round(conv, 4),
                      "vs_baseline": round(
                          (BASE["FeatureAffine"] + BASE["ICGN"]) / dic_s,
                          2)}), flush=True)

    total = sift_device_s + dic_s
    base_total = sum(BASE.values())
    print(json.dumps({
        "metric": "dvc_sift_icgn1_torus_total_s", "value": round(total, 2),
        "unit": "s", "n_poi": int(pois.n),
        "stages_s": {"SIFT": round(sift_device_s, 2),
                     "FA+ICGN": round(dic_s, 2)},
        "vs_baseline": round(base_total / total, 2)}), flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which == "sift":
        stage_sift()
    elif which == "dic":
        stage_dic()
    else:
        if not os.path.exists(CACHE):
            _load_pair()  # synthesize once, outside the timed subprocesses
        for mode, timeout_s in (("sift", 1800), ("dic", 900)):
            for attempt in range(3):
                try:
                    r = subprocess.run(
                        [sys.executable, "-u", __file__, mode],
                        timeout=timeout_s)
                    if r.returncode == 0:
                        break
                except subprocess.TimeoutExpired:
                    pass
                print(json.dumps({"stage": mode, "retry": attempt + 1}),
                      flush=True)


if __name__ == "__main__":
    main()
