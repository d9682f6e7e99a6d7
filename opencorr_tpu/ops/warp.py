"""Shape-function parameter vectors <-> homogeneous warp matrices.

Mirrors ``oc_deformation.cpp`` but batched: every function maps [N, dof]
parameter arrays to [N, d, d] warp matrices and back.

* 2D 1st order: 6 dof (u ux uy v vx vy) <-> 3x3 affine (oc_deformation.cpp:117-128)
* 2D 2nd order: 12 dof <-> 6x6 quadratic warp (oc_deformation.cpp:301-350),
  full second-order composition per Gao et al.
* 3D 1st order: 12 dof <-> 4x4 affine (oc_deformation.cpp:495-516)

Parameter index order follows the POI unions (see data/poi.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def warp2d1_from_p(p6: jnp.ndarray) -> jnp.ndarray:
    """[N, 6] (u ux uy v vx vy) -> [N, 3, 3] (oc_deformation.cpp:117-128)."""
    u, ux, uy, v, vx, vy = (p6[..., i] for i in range(6))
    one = jnp.ones_like(u)
    zero = jnp.zeros_like(u)
    rows = [
        jnp.stack([1.0 + ux, uy, u], axis=-1),
        jnp.stack([vx, 1.0 + vy, v], axis=-1),
        jnp.stack([zero, zero, one], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def p_from_warp2d1(w: jnp.ndarray) -> jnp.ndarray:
    """[N, 3, 3] -> [N, 6] (oc_deformation.cpp:107-115)."""
    return jnp.stack(
        [
            w[..., 0, 2],
            w[..., 0, 0] - 1.0,
            w[..., 0, 1],
            w[..., 1, 2],
            w[..., 1, 0],
            w[..., 1, 1] - 1.0,
        ],
        axis=-1,
    )


def warp2d2_from_p(p12: jnp.ndarray) -> jnp.ndarray:
    """[N, 12] (u ux uy uxx uxy uyy v vx vy vxx vxy vyy) -> [N, 6, 6]
    (oc_deformation.cpp:301-350)."""
    u, ux, uy, uxx, uxy, uyy, v, vx, vy, vxx, vxy, vyy = (
        p12[..., i] for i in range(12)
    )
    one = jnp.ones_like(u)
    zero = jnp.zeros_like(u)
    r0 = jnp.stack(
        [
            1.0 + 2.0 * ux + ux * ux + u * uxx,
            2.0 * u * uxy + 2.0 * (1.0 + ux) * uy,
            uy * uy + u * uyy,
            2.0 * u * (1.0 + ux),
            2.0 * u * uy,
            u * u,
        ],
        axis=-1,
    )
    r1 = jnp.stack(
        [
            0.5 * (v * uxx + 2.0 * (1.0 + ux) * vx + u * vxx),
            1.0 + uy * vx + ux * vy + v * uxy + u * vxy + vy + ux,
            0.5 * (v * uyy + 2.0 * uy * (1.0 + vy) + u * vyy),
            v + v * ux + u * vx,
            u + v * uy + u * vy,
            u * v,
        ],
        axis=-1,
    )
    r2 = jnp.stack(
        [
            vx * vx + v * vxx,
            2.0 * v * vxy + 2.0 * vx * (1.0 + vy),
            1.0 + 2.0 * vy + vy * vy + v * vyy,
            2.0 * v * vx,
            2.0 * v * (1.0 + vy),
            v * v,
        ],
        axis=-1,
    )
    r3 = jnp.stack([0.5 * uxx, uxy, 0.5 * uyy, 1.0 + ux, uy, u], axis=-1)
    r4 = jnp.stack([0.5 * vxx, vxy, 0.5 * vyy, vx, 1.0 + vy, v], axis=-1)
    r5 = jnp.stack([zero, zero, zero, zero, zero, one], axis=-1)
    return jnp.stack([r0, r1, r2, r3, r4, r5], axis=-2)


def p_from_warp2d2(w: jnp.ndarray) -> jnp.ndarray:
    """[N, 6, 6] -> [N, 12] (oc_deformation.cpp:284-299)."""
    return jnp.stack(
        [
            w[..., 3, 5],
            w[..., 3, 3] - 1.0,
            w[..., 3, 4],
            w[..., 3, 0] * 2.0,
            w[..., 3, 1],
            w[..., 3, 2] * 2.0,
            w[..., 4, 5],
            w[..., 4, 3],
            w[..., 4, 4] - 1.0,
            w[..., 4, 0] * 2.0,
            w[..., 4, 1],
            w[..., 4, 2] * 2.0,
        ],
        axis=-1,
    )


def warp3d1_from_p(p12: jnp.ndarray) -> jnp.ndarray:
    """[N, 12] (u ux uy uz v vx vy vz w wx wy wz) -> [N, 4, 4]
    (oc_deformation.cpp:495-516)."""
    u, ux, uy, uz, v, vx, vy, vz, w, wx, wy, wz = (p12[..., i] for i in range(12))
    one = jnp.ones_like(u)
    zero = jnp.zeros_like(u)
    rows = [
        jnp.stack([1.0 + ux, uy, uz, u], axis=-1),
        jnp.stack([vx, 1.0 + vy, vz, v], axis=-1),
        jnp.stack([wx, wy, 1.0 + wz, w], axis=-1),
        jnp.stack([zero, zero, zero, one], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def p_from_warp3d1(w: jnp.ndarray) -> jnp.ndarray:
    """[N, 4, 4] -> [N, 12] (oc_deformation.cpp:416-432)."""
    return jnp.stack(
        [
            w[..., 0, 3],
            w[..., 0, 0] - 1.0,
            w[..., 0, 1],
            w[..., 0, 2],
            w[..., 1, 3],
            w[..., 1, 0],
            w[..., 1, 1] - 1.0,
            w[..., 1, 2],
            w[..., 2, 3],
            w[..., 2, 0],
            w[..., 2, 1],
            w[..., 2, 2] - 1.0,
        ],
        axis=-1,
    )
