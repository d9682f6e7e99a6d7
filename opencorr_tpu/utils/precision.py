"""Matmul-precision control.

TPU matmul/einsum units default to bf16 input precision; the DIC kernels need
true f32 contractions (interpolation polynomials, Hessians, normal equations) —
bf16's ~3 significant digits put a floor on the Gauss-Newton step norm far above
the 1e-3 convergence criterion.  Every accuracy-critical op wraps itself with
this decorator, which pins the tracing-time default matmul precision to
"highest" (full f32).
"""

from __future__ import annotations

import functools

import jax


def highest_precision(fn):
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper
