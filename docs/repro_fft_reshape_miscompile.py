"""Reproducer: batched irfft2 miscompiles when fused with a flatten.

Round-5 finding on this sandbox's TPU stack (v5e via axon, remote
compile): the SAME correlation graph returns
  * 1e-7-accurate values when the program's output keeps the [N, 32, 32]
    shape, and
  * up to-11%-wrong values in ~934 of 1024 bins per surface when the
    program instead returns ``corr.reshape(n, -1)`` (deterministic across
    runs and across programs with the same output layout;
    ``lax.optimization_barrier`` between irfft2 and the reshape does NOT
    help — layout assignment propagates through it).

This silently flipped ~3% of FFTCC peak argmaxes vs the reference (the
motivation, round 2, for the exact integer re-rank — then misattributed
to f32 FFT rounding).  The production fix avoids jnp.fft entirely:
ops/fftcc._circ_corr2d computes the correlation with DFT matmuls.

Run on the TPU:  timeout 300 python -u docs/repro_fft_reshape_miscompile.py
Prints MISCOMPILE if the flat-output program disagrees with the
shaped-output program beyond 1e-3 relative, CLEAN otherwise.
"""

import numpy as np

import jax
import jax.numpy as jnp


def main():
    rng = np.random.default_rng(0)
    n = 30000  # reproduces at this scale; 4096 measured CLEAN
    win = np.float32(rng.integers(0, 256, (n, 32, 32)))
    win2 = np.float32(rng.integers(0, 256, (n, 32, 32)))
    a = jnp.asarray(win)
    b = jnp.asarray(win2)

    def corr_graph(x, y):
        xz = x - jnp.mean(x, (1, 2), keepdims=True)
        yz = y - jnp.mean(y, (1, 2), keepdims=True)
        return jnp.fft.irfft2(
            jnp.conj(jnp.fft.rfft2(xz)) * jnp.fft.rfft2(yz), s=(32, 32))

    shaped = jax.jit(lambda x, y: corr_graph(x, y))
    flat = jax.jit(lambda x, y: corr_graph(x, y).reshape(x.shape[0], -1))

    c3 = np.asarray(shaped(a, b)).reshape(n, -1)
    c1 = np.asarray(flat(a, b))
    # f64 arbiter on a few rows: which program is the wrong one?
    for row in (0, n // 2, n - 1):
        xz = win[row].astype(np.float64)
        yz = win2[row].astype(np.float64)
        xz -= xz.mean(); yz -= yz.mean()
        c64 = np.fft.irfft2(np.conj(np.fft.rfft2(xz)) * np.fft.rfft2(yz),
                            s=(32, 32)).ravel()
        sc = np.abs(c64).max()
        print(f"row {row}: shaped err {np.abs(c3[row]-c64).max()/sc:.2e} "
              f"flat err {np.abs(c1[row]-c64).max()/sc:.2e}")
    scale = np.abs(c3).max(axis=1, keepdims=True)
    rel = np.abs(c1 - c3) / np.maximum(scale, 1e-20)
    bad = rel > 1e-3
    print("max rel disagreement:", float(rel.max()))
    print("bins disagreeing > 1e-3:", int(bad.sum()), "of", bad.size)
    if bad.any():
        cols = sorted(set((np.nonzero(bad.any(0))[0] % 32).tolist()))
        print("MISCOMPILE: affected x-columns", cols[:12], "...")
    else:
        print("CLEAN: could not reproduce on this stack")


if __name__ == "__main__":
    main()
