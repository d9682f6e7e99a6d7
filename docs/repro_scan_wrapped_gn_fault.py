"""Minimal reproducer: scan-wrapping a masked Gauss-Newton while_loop faults
the device on this sandbox's TPU stack (axon tunnel + remote compile).

Symptom (round 3, CLAUDE.md "SCAN_GROUP=1 default"): a chunked IC-GN body
that converges when dispatched as per-chunk programs kills the TPU worker
when the same body runs under ``lax.scan`` — the fault surfaces only at the
next device->host readback (device-side faults are silent until then).

This script reduces it to the smallest structure we know to trigger the
class: a while_loop whose body does a batched gather + reduction with a
convergence-style predicate, scanned over stacked chunk inputs.  Run on the
TPU (no JAX_PLATFORMS override):

    timeout 300 python -u docs/repro_scan_wrapped_gn_fault.py direct   # OK
    timeout 300 python -u docs/repro_scan_wrapped_gn_fault.py scan     # faults here

Both modes print a forced checksum; on this sandbox the ``scan`` mode's
readback raises (worker crash / hang) while ``direct`` completes.  If both
complete on your stack, the workaround (OPENCORR_TPU_SCAN_GROUP=1 in
models/base.py) can be lifted.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

N, S, ITERS = 256, 33 * 33, 10
CHUNKS = 8


def gn_like(img, xs, ys):
    """A masked while_loop with a gather inside — the IC-GN skeleton."""
    h, w = img.shape

    def body(state):
        u, active, it = state
        gx = jnp.clip(xs[:, None] + jnp.arange(S)[None, :] % 33 + u[:, None],
                      0, w - 1).astype(jnp.int32)
        gy = jnp.clip(ys[:, None] + jnp.arange(S)[None, :] // 33, 0,
                      h - 1).astype(jnp.int32)
        v = img[gy, gx]  # [N, S] gather
        du = jnp.tanh(jnp.mean(v, axis=1) * 1e-3) * 0.5
        u = jnp.where(active, u + du, u)
        it = it + 1.0
        active = active & (jnp.abs(du) > 1e-4) & (it < ITERS)
        return u, active, it

    u0 = jnp.zeros_like(xs)
    state = (u0, jnp.ones(xs.shape[0], bool), jnp.zeros_like(xs))
    u, _, it = jax.lax.while_loop(lambda st: jnp.any(st[1]), body, state)
    return u, it


def main(mode):
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (512, 512), jnp.float32, 0, 255)
    xs = jax.random.uniform(key, (CHUNKS, N), jnp.float32, 40, 400)
    ys = jax.random.uniform(key, (CHUNKS, N), jnp.float32, 40, 400)

    if mode == "direct":
        run = jax.jit(gn_like)
        outs = [run(img, xs[i], ys[i]) for i in range(CHUNKS)]
        total = sum(jnp.sum(u) + jnp.sum(it) for u, it in outs)
    else:
        @jax.jit
        def run(img, xs, ys):
            def step(_, xy):
                return None, gn_like(img, *xy)
            _, (us, its) = jax.lax.scan(step, None, (xs, ys))
            return jnp.sum(us) + jnp.sum(its)

        total = run(img, xs, ys)

    t0 = time.time()
    print("forced checksum:", float(np.asarray(total)),
          f"({time.time() - t0:.1f}s readback)", flush=True)
    print(f"{mode}: OK", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "direct")
