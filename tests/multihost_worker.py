"""Worker for the 2-process jax.distributed smoke test (run by
test_multihost.py; also runnable by hand:

    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    python tests/multihost_worker.py <coordinator> <num_procs> <pid>

Each process owns 4 virtual CPU devices; the global mesh is all 8.  The POI
batch is assembled from per-process local shards
(jax.make_array_from_process_local_data), the standard ICGN kernel runs as
one global SPMD program, and each process checks convergence on the POIs it
owns — the exact multi-host recipe in parallel/mesh.py's docstring.
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    coord, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(coord, num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from opencorr_tpu.ops import bspline, gradient
    from opencorr_tpu.ops import icgn as icgn_ops

    # identical on every process (replicated inputs); smoothed speckle so the
    # correlation basin is wide enough for a zero-seeded IC-GN (raw white
    # noise has no basin beyond +-1 px)
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(0)
    h = w = 96
    # keep pixels far from 0: the bicubic LUT flags out-of-range samples with
    # a -1 sentinel (matching the reference's value<0 check), so image values
    # near 0 — or interpolation undershoot past 0 — would read as OOB
    ref_np = (gaussian_filter(
        rng.standard_normal((h, w)).astype(np.float32), 1.5) * 60 + 128)
    tar_np = np.roll(ref_np, (1, 2), axis=(0, 1))
    ref = jnp.asarray(ref_np)
    gx = gradient.gradient_x_2d(ref)
    gy = gradient.gradient_y_2d(ref)
    lut = bspline.bicubic_prepare(jnp.asarray(tar_np))

    n_global = 64
    side = 8
    xs_g, ys_g = np.meshgrid(np.linspace(14, w - 15, side),
                             np.linspace(14, h - 15, side))
    xs_g = np.round(xs_g).ravel().astype(np.float32)
    ys_g = np.round(ys_g).ravel().astype(np.float32)

    mesh = Mesh(np.array(jax.devices()), ("poi",))
    sh = NamedSharding(mesh, P("poi"))

    # each process contributes its contiguous half of the batch
    lo = pid * (n_global // nprocs)
    hi = lo + n_global // nprocs
    mk = lambda a: jax.make_array_from_process_local_data(sh, a[lo:hi])
    xs = mk(xs_g)
    ys = mk(ys_g)
    # integer-guess seed (u=2, v=1), as FFTCC would supply in the pipeline
    p_local = np.zeros((n_global // nprocs, 6), np.float32)
    p_local[:, 0] = 2.0
    p_local[:, 3] = 1.0
    p = jax.make_array_from_process_local_data(sh, p_local)
    zin = mk(np.zeros(n_global, np.float32))

    out = icgn_ops.icgn2d(gx, gy, ref, lut, xs, ys, p, zin,
                          jnp.float32(0.001), jnp.float32(10.0), None,
                          order=1, rx=8, ry=8)
    p_out, u0, v0, zncc, it, dpn, computed = out

    zl = np.concatenate([np.asarray(s.data).ravel()
                         for s in zncc.addressable_shards])
    ul = np.concatenate([np.asarray(s.data)[..., 0].ravel()
                         for s in p_out.addressable_shards])
    assert zl.shape[0] == n_global // nprocs
    assert (zl > 0.99).all(), f"proc {pid}: zncc min {zl.min()}"
    # true displacement: tar = roll(ref, (1,2)) => u = +2, v = +1
    assert np.abs(ul - 2.0).max() < 1e-2, f"proc {pid}: u err {ul}"
    print(f"MULTIHOST_OK pid={pid} n_local={zl.shape[0]} "
          f"zncc_min={zl.min():.4f}", flush=True)


if __name__ == "__main__":
    main()
