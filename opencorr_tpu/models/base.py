"""Common base for DIC/DVC processing modules.

Mirrors the abstract ``DIC`` / ``DVC`` classes (``oc_dic.h:43-86``): every
module holds the reference/target images and subset radii, and exposes
``prepare()`` and ``compute(poi_table)``.  Unlike the reference, ``compute`` is
functional — it returns a new POI table instead of mutating in place — and the
per-thread scratch pools (``oc_icgn.cpp:82-88`` et al.) have no equivalent: the
whole queue is one batch.

``chunk_size`` bounds device memory for large subsets (DVC): the queue is
processed in fixed-shape chunks so the jitted kernel compiles once; the last
chunk is padded with replicas of the final POI and the padding is dropped.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# ZNCC failure codes (oc_dic.h:28-34).
ZNCC_RESET = 0.0
ZNCC_FEATURES_INSUFFICIENT = -1.0
ZNCC_RANSAC_INCONSISTENT = -2.0
ZNCC_ABORTED = -3.0
ZNCC_NOT_CONVERGED = -4.0
ZNCC_NAN = -5.0


def _pad_len(n: int, chunk: int) -> int:
    return (n + chunk - 1) // chunk * chunk


import os as _os

# Chunks per lax.scan dispatch in chunked() (1 = plain per-chunk host loop).
SCAN_GROUP = int(_os.environ.get("OPENCORR_TPU_SCAN_GROUP", "8"))


def chunked(fn, table, chunk_size: Optional[int], *extras):
    """Apply ``fn(sub_table, *sub_extras) -> sub_table`` over fixed-size POI
    chunks.  ``extras`` are optional per-POI arrays (leading axis = queue
    length, e.g. EpipolarSearch's center offsets) padded and sliced alongside
    the table.

    ``fn`` must be shape-polymorphic only in data values.  Chunks are run in
    groups of ``SCAN_GROUP`` as one ``lax.scan`` program per group — the body
    compiles once at the chunk shape (bounding XLA graph size and device
    working set) and each group is ONE device dispatch, cutting per-chunk
    dispatch round-trips (the tunnel adds ~0.5 ms each) by the group factor.
    The group size is fixed, so one compiled [group, chunk] program serves
    every group and every queue length; tail chunks (< one group) fall back
    to per-chunk calls of ``fn``'s own chunk-shape program.  Raise
    ``OPENCORR_TPU_SCAN_GROUP`` on real hardware for fewer dispatches (the
    sandbox's TPU worker dies on scans longer than ~8 of the heavier
    bodies); 1 disables scanning entirely.
    """
    n = table.n
    if chunk_size is None or n <= chunk_size:
        return fn(table, *extras)
    padded = _pad_len(n, chunk_size)
    pad = padded - n
    k = padded // chunk_size
    group = max(1, SCAN_GROUP)
    g, tail = divmod(k, group)

    def pad_leaf(a):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(jnp.asarray(a), widths, mode="edge")

    bundle = (table,) + extras
    flat, treedef = jax.tree_util.tree_flatten(bundle)
    is_arr = [getattr(a, "ndim", 0) > 0 for a in flat]
    big = [pad_leaf(a) if arr else a for a, arr in zip(flat, is_arr)]

    def body(_, xs):
        it = iter(xs)
        sub_flat = [next(it) if arr else a for a, arr in zip(flat, is_arr)]
        out = fn(*jax.tree_util.tree_unflatten(treedef, sub_flat))
        return None, out

    outs = []
    for i in range(g):  # full groups: one scan dispatch each
        stacked = [
            jax.lax.dynamic_slice_in_dim(
                a, i * group * chunk_size, group * chunk_size, 0
            ).reshape((group, chunk_size) + a.shape[1:])
            for a, arr in zip(big, is_arr) if arr
        ]
        _, out = jax.lax.scan(body, None, stacked)
        outs.append(jax.tree_util.tree_map(
            lambda a: a.reshape((group * chunk_size,) + a.shape[2:])
            if a.ndim > 1 else a, out))
    for j in range(tail):  # tail chunks: chunk-shape program
        start = (g * group + j) * chunk_size
        sub_flat = [
            jax.lax.dynamic_slice_in_dim(a, start, chunk_size, 0)
            if arr else a
            for a, arr in zip(big, is_arr)
        ]
        outs.append(fn(*jax.tree_util.tree_unflatten(treedef, sub_flat)))

    if len(outs) == 1:
        cat = outs[0]
    else:
        cat = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate([jnp.atleast_1d(x) for x in xs], 0),
            *outs)
    return jax.tree_util.tree_map(
        lambda a: a[:n] if a.ndim else a, cat)


class Module2D:
    """Base for 2D modules: image state + subset radii (oc_dic.h:43-64)."""

    def __init__(self, subset_radius_x: int, subset_radius_y: int):
        self.subset_radius_x = int(subset_radius_x)
        self.subset_radius_y = int(subset_radius_y)
        self.ref_img: Optional[jnp.ndarray] = None
        self.tar_img: Optional[jnp.ndarray] = None
        self.self_adaptive = False

    def set_images(self, ref_img, tar_img) -> None:
        self.ref_img = jnp.asarray(_as_mat(ref_img), jnp.float32)
        self.tar_img = jnp.asarray(_as_mat(tar_img), jnp.float32)

    def set_subset_radii(self, rx: int, ry: int) -> None:
        self.subset_radius_x = int(rx)
        self.subset_radius_y = int(ry)

    def set_self_adaptive(self, flag: bool) -> None:
        self.self_adaptive = bool(flag)

    def prepare(self) -> None:  # pragma: no cover - overridden
        pass


class Module3D:
    """Base for DVC modules (oc_dic.h:66-86)."""

    def __init__(self, subset_radius_x: int, subset_radius_y: int,
                 subset_radius_z: int):
        self.subset_radius_x = int(subset_radius_x)
        self.subset_radius_y = int(subset_radius_y)
        self.subset_radius_z = int(subset_radius_z)
        self.ref_vol: Optional[jnp.ndarray] = None
        self.tar_vol: Optional[jnp.ndarray] = None

    def set_images(self, ref_vol, tar_vol) -> None:
        self.ref_vol = jnp.asarray(_as_mat(ref_vol), jnp.float32)
        self.tar_vol = jnp.asarray(_as_mat(tar_vol), jnp.float32)

    def set_subset_radii(self, rx: int, ry: int, rz: int) -> None:
        self.subset_radius_x = int(rx)
        self.subset_radius_y = int(ry)
        self.subset_radius_z = int(rz)

    def prepare(self) -> None:  # pragma: no cover - overridden
        pass


def _as_mat(img):
    """Accept Image2D/Image3D wrappers, numpy or jax arrays."""
    return getattr(img, "mat", img)


def sort_by_zncc(table):
    """Descending ZNCC order (``sortByZNCC``, oc_dic.cpp:57) — returns a
    reordered table and the permutation."""
    zncc = np.asarray(table.zncc)
    order = np.argsort(-zncc, kind="stable")
    idx = jnp.asarray(order)
    out = jax.tree_util.tree_map(lambda a: a[idx] if a.ndim else a, table)
    return out, order
