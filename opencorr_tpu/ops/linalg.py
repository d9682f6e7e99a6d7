"""Batched small-matrix inverses/solves tuned for TPU.

XLA's LAPACK-style batched LU (``jnp.linalg.inv``/``solve``) is very slow on
TPU for large batches of tiny matrices (the 3x3..12x12 systems that dominate
DIC: warp inverses, Hessians, RANSAC affines, strain normal equations — cf.
Eigen usage at oc_icgn.cpp:210/290, oc_strain.cpp:213).  These routines instead
run an unrolled Gauss-Jordan elimination without pivoting: K^2 fused
element-wise passes over [..., K, K], which the VPU eats.

No pivoting is safe for every system this engine produces: DIC Hessians and
normal equations are SPD; warp matrices are near-identity compositions.  A
zero pivot yields inf/NaN, which the callers' NaN taxonomy (-5) already
handles — the same failure mode as a singular matrix through Eigen's inverse.
"""

from __future__ import annotations

import jax.numpy as jnp


def inv_small(a: jnp.ndarray) -> jnp.ndarray:
    """Inverse of [..., K, K] (K static, small) via unrolled Gauss-Jordan."""
    k = a.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(k, dtype=a.dtype), a.shape)
    aug = jnp.concatenate([a, eye], axis=-1)  # [..., K, 2K]
    for i in range(k):
        pivot = aug[..., i : i + 1, i : i + 1]  # [..., 1, 1]
        row = aug[..., i : i + 1, :] / pivot  # [..., 1, 2K]
        factors = aug[..., :, i : i + 1]  # [..., K, 1]
        aug = aug - factors * row
        aug = aug.at[..., i, :].set(row[..., 0, :])
    return aug[..., :, k:]


def solve_small(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve a x = b with a [..., K, K] and b [..., K] or [..., K, M]."""
    vec = b.ndim == a.ndim - 1
    if vec:
        b = b[..., None]
    aug = jnp.concatenate([a, b], axis=-1)
    k = a.shape[-1]
    for i in range(k):
        pivot = aug[..., i : i + 1, i : i + 1]
        row = aug[..., i : i + 1, :] / pivot
        factors = aug[..., :, i : i + 1]
        aug = aug - factors * row
        aug = aug.at[..., i, :].set(row[..., 0, :])
    x = aug[..., :, k:]
    return x[..., 0] if vec else x
