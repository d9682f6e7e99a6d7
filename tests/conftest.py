"""Test harness config: force the CPU backend with 8 virtual devices.

The axon sitecustomize force-registers the TPU backend and overrides
JAX_PLATFORMS, so the platform must be pinned via jax.config before any jax
use (see .claude/skills/verify/SKILL.md).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
# XLA:CPU AOT cache entries are machine-feature strict (mismatch risks
# SIGILL); the package's persistent compile cache is for the TPU backend
os.environ.setdefault("OPENCORR_TPU_NO_COMPILE_CACHE", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest
from scipy.ndimage import gaussian_filter, shift as ndshift


REFERENCE_DIR = "/root/reference/examples"


def make_speckle(shape, sigma=2.0, seed=0, scale=50.0, offset=128.0):
    rng = np.random.default_rng(seed)
    img = gaussian_filter(rng.standard_normal(shape).astype(np.float32), sigma)
    return (img * scale + offset).astype(np.float32)


@pytest.fixture(scope="session")
def speckle_pair_2d():
    """(ref, tar, true_u, true_v): tar is ref translated by a subpixel shift."""
    H, W = 160, 180
    base = make_speckle((H + 40, W + 40), sigma=2.0, seed=1)
    true_u, true_v = 2.3, -1.6
    ref = base[20 : 20 + H, 20 : 20 + W]
    tar = ndshift(base, (true_v, true_u), order=3)[20 : 20 + H, 20 : 20 + W]
    return ref, tar, true_u, true_v


@pytest.fixture(scope="session")
def speckle_pair_3d():
    D = 48
    base = make_speckle((D + 20, D + 20, D + 20), sigma=1.5, seed=2)
    tu, tv, tw = 1.4, -0.7, 0.9
    ref = base[10 : 10 + D, 10 : 10 + D, 10 : 10 + D]
    tar = ndshift(base, (tw, tv, tu), order=3)[10 : 10 + D, 10 : 10 + D, 10 : 10 + D]
    return ref, tar, tu, tv, tw
