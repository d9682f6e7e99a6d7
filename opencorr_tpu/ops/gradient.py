"""4th-order-accurate first-derivative maps.

Reference: ``oc_gradient.cpp`` — central difference with stencil ±2 px and
coefficients 1/12, 2/3 (oc_gradient.cpp:21-22), border 2 px left at zero.
Implemented as whole-image shifted-slice arithmetic (XLA fuses this into one
pass); no convolution primitive needed for a 5-tap stencil.
"""

from __future__ import annotations

import jax.numpy as jnp

FIRST = jnp.float32(1.0 / 12.0)
SECOND = jnp.float32(2.0 / 3.0)


def gradient_x_2d(img: jnp.ndarray) -> jnp.ndarray:
    """d/dx with zero 2-px borders (oc_gradient.cpp:37-57). img: [H, W]."""
    g = (img[:, :-4] - img[:, 4:]) * FIRST + (img[:, 3:-1] - img[:, 1:-3]) * SECOND
    return jnp.pad(g, ((0, 0), (2, 2)))


def gradient_y_2d(img: jnp.ndarray) -> jnp.ndarray:
    """d/dy with zero 2-px borders (oc_gradient.cpp:59-79)."""
    g = (img[:-4, :] - img[4:, :]) * FIRST + (img[3:-1, :] - img[1:-3, :]) * SECOND
    return jnp.pad(g, ((2, 2), (0, 0)))


def gradient_xy_2d(img: jnp.ndarray) -> jnp.ndarray:
    """d²/dxdy = d/dy applied to gradient_x (oc_gradient.cpp:81-106)."""
    return gradient_y_2d(gradient_x_2d(img))


def gradient_x_3d(vol: jnp.ndarray) -> jnp.ndarray:
    """d/dx over [Z, Y, X] volume (oc_gradient.cpp:143-171)."""
    g = (vol[:, :, :-4] - vol[:, :, 4:]) * FIRST + (vol[:, :, 3:-1] - vol[:, :, 1:-3]) * SECOND
    return jnp.pad(g, ((0, 0), (0, 0), (2, 2)))


def gradient_y_3d(vol: jnp.ndarray) -> jnp.ndarray:
    g = (vol[:, :-4, :] - vol[:, 4:, :]) * FIRST + (vol[:, 3:-1, :] - vol[:, 1:-3, :]) * SECOND
    return jnp.pad(g, ((0, 0), (2, 2), (0, 0)))


def gradient_z_3d(vol: jnp.ndarray) -> jnp.ndarray:
    g = (vol[:-4, :, :] - vol[4:, :, :]) * FIRST + (vol[3:-1, :, :] - vol[1:-3, :, :]) * SECOND
    return jnp.pad(g, ((2, 2), (0, 0), (0, 0)))
