"""Minimal reproducer attempt: the round-3 windowed-eval range-mask
miscompile (commit 7e9e2e9).

Symptom (round 3): wiring ``bspline.tricubic_eval_windowed`` into the fused
ICGN3D1 Gauss-Newton program made its float range mask — computed on
window-LOCAL coordinates (``lx < 1 | lx >= sw-2`` after ``lx = gxc - wcx``)
— read ALL-TRUE for coordinates whose min/max were provably in-range, on
this sandbox's TPU stack only (CPU exact; every isolated composition on TPU
exact).  Four-way bisect at the time: with/without highest_precision,
warp-matmul vs broadcast coordinates — all reproduced inside the fused
program.

This script reconstructs the failing composition at minimal scale: per-POI
window gather (vmapped dynamic_slice) -> while_loop whose body localizes
warped float coords against the integer corners and computes the float mask
on the LOCALIZED values, fused in ONE jit program.  It compares the mask
population and values against the global-volume eval computed by the same
program.  Run on the TPU:

    timeout 300 python -u docs/repro_windowed_mask_miscompile.py

Prints MISCOMPILE if the localized-float mask disagrees with the global
mask, CLEAN otherwise.  Round 4 could NOT reproduce the failure with this
reduction (see the printed result committed in docs/device_faults.md) —
the production kernel nevertheless avoids the pattern entirely: it computes
range masks from GLOBAL coordinates plus an int32-domain window-exit test
(ops/icgn.py ``eval_tar``), which is immune to this failure class either
way.
"""

import numpy as np

import jax
import jax.numpy as jnp

from opencorr_tpu.ops import bspline
from opencorr_tpu.utils.precision import highest_precision

N, S, ITERS = 64, 33 ** 2, 5
R, M = 16, 8
DIMS = (200, 180, 220)


@jax.jit
@highest_precision
def fused(coeff, cx, cy, cz):
    dz, dy, dx = coeff.shape
    sw = 2 * (R + M) + 1
    wcx = jnp.floor(cx).astype(jnp.int32) - (R + M)
    wcy = jnp.floor(cy).astype(jnp.int32) - (R + M)
    wcz = jnp.floor(cz).astype(jnp.int32) - (R + M)
    cwin = jax.vmap(lambda z0, y0, x0: jax.lax.dynamic_slice(
        coeff, (z0, y0, x0), (sw, sw, sw)))(wcz, wcy, wcx)

    loc = jnp.arange(-16, 17, dtype=jnp.float32)
    ll = (loc[:, None] + loc[None, :] * 0).reshape(-1)
    lt = (loc[None, :] + loc[:, None] * 0).reshape(-1)

    def body(state):
        it, bad_counts, diff_max = state
        # warped coords drift a little each "iteration"
        sh = 0.1 * it
        gxc = cx[:, None] + ll[None, :] + sh
        gyc = cy[:, None] + lt[None, :] - sh
        gzc = cz[:, None] + 0.3 * ll[None, :] + sh
        # THE SUSPECT PATTERN: localize, then float-compare the result
        lx = gxc - wcx[:, None].astype(jnp.float32)
        ly = gyc - wcy[:, None].astype(jnp.float32)
        lz = gzc - wcz[:, None].astype(jnp.float32)
        mask_local = (
            (lx < 1) | (ly < 1) | (lz < 1)
            | (lx >= sw - 2) | (ly >= sw - 2) | (lz >= sw - 2)
        )
        v_win, o_win = bspline.tricubic_eval_windowed(
            cwin, lx, ly, lz, jnp.zeros_like(mask_local))
        v_glo, o_glo = bspline.tricubic_eval(coeff, gxc, gyc, gzc)
        ok = ~o_glo & ~mask_local & ~o_win
        diff = jnp.max(jnp.where(ok, jnp.abs(v_win - v_glo), 0.0))
        bad = jnp.sum(mask_local) - jnp.sum(o_glo)  # should be ~0: POIs
        # are interior, so local mask == global mask for every sample
        bad_counts = bad_counts.at[it.astype(jnp.int32)].set(bad)
        return it + 1.0, bad_counts, jnp.maximum(diff_max, diff)

    state = (jnp.float32(0.0), jnp.zeros(ITERS, jnp.int32), jnp.float32(0.0))
    _, bad_counts, diff_max = jax.lax.while_loop(
        lambda st: st[0] < ITERS, body, state)
    return bad_counts, diff_max


def main():
    key = jax.random.PRNGKey(1)
    dz, dy, dx = DIMS
    coeff = jax.random.uniform(key, DIMS, jnp.float32, 1.0, 255.0)
    ks = jax.random.split(key, 3)
    lo = R + M + 3
    cx = jax.random.uniform(ks[0], (N,), jnp.float32, lo, dx - lo - 1)
    cy = jax.random.uniform(ks[1], (N,), jnp.float32, lo, dy - lo - 1)
    cz = jax.random.uniform(ks[2], (N,), jnp.float32, lo, dz - lo - 1)
    bad_counts, diff_max = fused(coeff, cx, cy, cz)
    bad = np.asarray(bad_counts)
    dm = float(np.asarray(diff_max))
    print("mask mismatches per iteration:", bad.tolist(), flush=True)
    print("max |windowed - global| on in-range samples:", dm, flush=True)
    if np.any(bad != 0) or dm > 1e-3:
        print("MISCOMPILE: localized-float mask disagrees with global mask")
    else:
        print("CLEAN: could not reproduce on this stack")


if __name__ == "__main__":
    main()
