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


import collections
import os as _os

# Chunks per lax.scan dispatch in chunked() (1 = plain per-chunk programs).
# Default 1: wrapping the IC-GN while_loop in a lax.scan/fori FAULTS the
# TPU through this sandbox's stack (verified round 3 by forcing readbacks:
# a single direct chunk converges, the same body under a scan kills the
# worker).  Grouping only saves per-dispatch overhead; re-enable on real
# hardware after verifying a scan-wrapped chunk end-to-end.
SCAN_GROUP = int(_os.environ.get("OPENCORR_TPU_SCAN_GROUP", "1"))


class Memo:
    """One-slot keyed memo for device-resident per-call constants.

    Model ``compute()`` wrappers used to rebuild scalar parameters with
    ``jnp.float32(...)`` on every call; through the axon tunnel each fresh
    host->device buffer is a dispatch, and a fresh buffer in a run-closure's
    cells defeats the chunked() program cache (see ``_fn_key``).  Memoizing on
    the parameter values keeps the SAME device objects across calls until a
    setter changes them."""

    __slots__ = ("_key", "_val")

    def __init__(self):
        self._key = object()  # never equal to a user key
        self._val = None

    def get(self, key, build):
        if key != self._key:
            self._val = build()
            self._key = key
        return self._val

    def clear(self):
        self._key = object()
        self._val = None


from ..utils.hosthints import host_hint, register_host_hint  # re-exported


def _carry_host_hints(src, dst, fields=("x", "y", "z")):
    """Propagate host hints across a compute() that rebuilt the coordinate
    buffers with identical values (the chunk glue's pad/slice/concat).

    Only fields no compute() ever mutates are carried by default.  ``sr`` is
    deliberately NOT in the list: non-adaptive ICGN/ICLM rewrite sr to their
    static radii for computed POIs (models/icgn.py), so a carried pre-compute
    hint would silently clamp a later self-adaptive kernel's r_max to stale
    values (round-3 advisor finding)."""
    for f in fields:
        s = getattr(src, f, None)
        d = getattr(dst, f, None)
        if s is None or d is None or d is s:
            continue
        h = host_hint(s)
        if h is not None:
            register_host_hint(d, h)


_VAL_TYPES = (int, float, bool, str, bytes, type(None))


def _fn_key(fn):
    """Stable cache identity for a run-closure: its code object plus the
    identity (or value, for plain Python scalars) of every captured cell and
    default.  A model that re-runs ``prepare()`` rebinds new device buffers
    into a structurally identical closure — the changed ids yield a new key,
    so a stale compiled program (whose baked constants reference the OLD
    buffers) can never be reused.  id() reuse is safe: the cached programs
    retain references to the captured objects, so their ids stay occupied for
    the life of the cache entry."""
    code = getattr(fn, "__code__", None)
    if code is None:
        return ("obj", fn)  # jitted fn / callable object: identity-stable
    cells = []
    for c in fn.__closure__ or ():
        try:
            v = c.cell_contents
        except ValueError:  # empty cell
            cells.append(("empty",))
            continue
        cells.append(("v", v) if isinstance(v, _VAL_TYPES) else ("id", id(v)))
    dflts = tuple(
        ("v", d) if isinstance(d, _VAL_TYPES) else ("id", id(d))
        for d in fn.__defaults__ or ())
    return ("code", code, tuple(cells), dflts)


class _ChunkPrograms:
    """The four jitted programs behind one chunked() call site: pad, group
    scan, tail chunk, concat+unpad.  Compiled once per (closure identity,
    bundle structure, chunk size) and reused across calls — the previous eager
    implementation re-traced the scan body and paid ~30 eager dispatch sends
    per call, which dominated the chunk-path stage times (e.g. the
    FeatureAffine RANSAC kernel itself is ~60 us pipelined at 30k POIs)."""

    def __init__(self, fn, treedef, is_arr, n_flat, const_treedef, chunk,
                 group):
        self.chunk = chunk
        self.group = group
        # fn (and through it the model's device buffers) is retained here,
        # keeping every id in the cache key occupied — see _fn_key.
        self.fn = fn

        def split(args):
            return list(args[:n_flat]), jax.tree_util.tree_unflatten(
                const_treedef, list(args[n_flat:]))

        def unflatten_sub(flat, subs):
            it = iter(subs)
            leaves = [next(it) if arr else a for a, arr in zip(flat, is_arr)]
            return jax.tree_util.tree_unflatten(treedef, leaves)

        def pad_body(pad, *flat):
            return [
                jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1), mode="edge")
                if arr else a
                for a, arr in zip(flat, is_arr)
            ]

        def tail_body(start, *args):
            flat, consts = split(args)
            subs = [jax.lax.dynamic_slice_in_dim(a, start, chunk, 0)
                    for a, arr in zip(flat, is_arr) if arr]
            return fn(*unflatten_sub(flat, subs), *consts)

        def group_body(start, *args):
            flat, consts = split(args)
            stacked = [
                jax.lax.dynamic_slice_in_dim(a, start, group * chunk, 0)
                .reshape((group, chunk) + a.shape[1:])
                for a, arr in zip(flat, is_arr) if arr
            ]

            def body(_, xs):
                return None, fn(*unflatten_sub(flat, list(xs)), *consts)

            _, out = jax.lax.scan(body, None, stacked)
            return jax.tree_util.tree_map(
                lambda a: a.reshape((group * chunk,) + a.shape[2:])
                if a.ndim > 1 else a, out)

        def cat_body(n, outs):
            cat = outs[0] if len(outs) == 1 else jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate([jnp.atleast_1d(x) for x in xs],
                                            0), *outs)
            return jax.tree_util.tree_map(
                lambda a: a[:n] if a.ndim else a, cat)

        self.pad = jax.jit(pad_body, static_argnums=0)
        self.tail = jax.jit(tail_body)
        self.group_run = jax.jit(group_body)
        self.cat = jax.jit(cat_body, static_argnums=0)

    def run(self, flat, const_flat, n):
        chunk, group = self.chunk, self.group
        padded = _pad_len(n, chunk)
        pad = padded - n
        k = padded // chunk
        # group == 1: per-chunk tail programs only (no lax.scan wrapper at
        # all — see the SCAN_GROUP note; a length-1 scan still wraps the
        # body in loop machinery)
        g, tail = (0, k) if group == 1 else divmod(k, group)
        big = list(self.pad(pad, *flat)) if pad else list(flat)
        args = big + list(const_flat)
        # Chunk-fault canary (env-gated): device-side faults (OOM, bad
        # kernels) surface only at the NEXT readback, so an unchecked
        # 158-chunk CT run can silently produce garbage-at-readback.  Every
        # K chunk programs, read ONE element of the newest result — the
        # sync surfaces any queued fault as an exception HERE, with the
        # chunk index, instead of at the final table readback.  Off by
        # default: in this sandbox a readback flips the session into
        # polled dispatch mode (CLAUDE.md); enable in production.
        canary = int(_os.environ.get("OPENCORR_TPU_CANARY_EVERY", "0") or 0)
        outs = []
        for i in range(g):
            outs.append(self.group_run(i * group * chunk, *args))
            if canary and len(outs) % canary == 0:
                _canary_check(outs[-1], len(outs))
        for j in range(tail):
            outs.append(self.tail((g * group + j) * chunk, *args))
            if canary and len(outs) % canary == 0:
                _canary_check(outs[-1], len(outs))
        return self.cat(n, tuple(outs))


def _canary_check(out, n_done: int) -> None:
    """Force one element of a chunk result to the host; raise with the
    chunk count if the sync surfaces a device fault or a non-finite value
    in the first table field (POI coordinates — pass-through, so any
    non-finite value there means corrupted output, not a failure code)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    try:
        val = np.asarray(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)
    except Exception as e:
        raise RuntimeError(
            f"chunk canary: device fault surfaced after {n_done} chunk "
            f"programs") from e
    if not np.all(np.isfinite(val)):
        raise RuntimeError(
            f"chunk canary: non-finite result after {n_done} chunk programs")


_CHUNK_PROGRAMS = collections.OrderedDict()
_CHUNK_CAP = 32
# code objects whose closures churn captured objects call-to-call: compiled
# programs would never be reused, so route them to the eager path instead
_KEYS_PER_CODE = collections.defaultdict(set)
_UNSTABLE_LIMIT = 4


def _assert_capture_free(fn):
    """Reject run-closures that capture device arrays.

    Tracing a jit whose closure holds a concrete ``jax.Array`` embeds it as a
    program constant, which requires reading its VALUE back to the host at
    lowering time.  Under this sandbox's axon tunnel that device->host read
    permanently flips the session into a ~26 ms-per-dispatch polled mode
    (CLAUDE.md), turning sub-ms chunk programs into ~100 ms ones; on real
    hardware it still bloats executables and defeats buffer reuse.  Every
    device buffer must instead ride the traced-argument channels: per-POI
    arrays as ``extras``, loop-invariant arrays as ``consts``."""
    for c in getattr(fn, "__closure__", None) or ():
        try:
            v = c.cell_contents
        except ValueError:
            continue
        if isinstance(v, jax.Array):
            raise TypeError(
                "chunked(): run-closure captures a device array "
                f"({v.shape}, {v.dtype}); pass it via consts=/extras instead "
                "(closure-captured arrays are read back to host at jit "
                "lowering, which poisons dispatch latency)")
    for d in getattr(fn, "__defaults__", None) or ():
        if isinstance(d, jax.Array):
            raise TypeError(
                "chunked(): run-closure default is a device array; pass it "
                "via consts=/extras instead")


def chunked(fn, table, chunk_size: Optional[int], *extras, consts=()):
    """Apply ``fn(sub_table, *sub_extras, *consts) -> sub_table`` over
    fixed-size POI chunks.  ``extras`` are optional per-POI arrays (leading
    axis = queue length, e.g. EpipolarSearch's center offsets) padded and
    sliced alongside the table.  ``consts`` are loop-invariant arrays passed
    WHOLE to every chunk (e.g. strain's full-table neighbor-source fields) —
    they enter the compiled programs as traced arguments, so per-call derived
    arrays don't defeat the program cache.

    ``fn`` must NOT capture device arrays in its closure (see
    ``_assert_capture_free``); scalars/ints/strings are fine.

    ``fn`` must be shape-polymorphic only in data values.  Chunks are run in
    groups of ``SCAN_GROUP`` as one ``lax.scan`` program per group — the body
    compiles once at the chunk shape (bounding XLA graph size and device
    working set) and each group is ONE device dispatch, cutting per-chunk
    dispatch round-trips (the tunnel adds ~0.5 ms each) by the group factor.
    Tail chunks (< one group) run as per-chunk programs.  Raise
    ``OPENCORR_TPU_SCAN_GROUP`` on real hardware for fewer dispatches (the
    sandbox's TPU worker dies on scans longer than ~8 of the heavier
    bodies); 1 disables scanning entirely.

    All glue (pad / slice / scan / concat / unpad) runs as jitted programs
    cached on ``_fn_key(fn)`` — closures must therefore capture their device
    buffers directly (locals or memoized scalars), NOT rebuild them per call;
    per-call derived arrays belong in ``consts``.  Closures whose captures
    churn anyway are detected (>= ``_UNSTABLE_LIMIT`` distinct keys for one
    code object) and demoted to an uncached eager path.
    """
    n = table.n
    if chunk_size is None or n <= chunk_size:
        res = fn(table, *extras, *consts)
        _carry_host_hints(table, res)
        return res
    _assert_capture_free(fn)
    bundle = (table,) + extras
    flat, treedef = jax.tree_util.tree_flatten(bundle)
    is_arr = tuple(getattr(a, "ndim", 0) > 0 for a in flat)
    const_flat, const_treedef = jax.tree_util.tree_flatten(consts)
    group = max(1, SCAN_GROUP)

    fkey = _fn_key(fn)
    code = fkey[1] if fkey[0] == "code" else fkey
    key = (fkey, treedef, is_arr, const_treedef, chunk_size, group)
    progs = _CHUNK_PROGRAMS.get(key)
    if progs is None:
        seen = _KEYS_PER_CODE[code]
        if len(seen) >= _UNSTABLE_LIMIT and key not in seen:
            res = _chunked_eager(fn, flat, treedef, is_arr, const_flat,
                                 const_treedef, n, chunk_size, group)
            _carry_host_hints(table, res)
            return res
        seen.add(key)
        progs = _ChunkPrograms(fn, treedef, is_arr, len(flat), const_treedef,
                               chunk_size, group)
        _CHUNK_PROGRAMS[key] = progs
        while len(_CHUNK_PROGRAMS) > _CHUNK_CAP:
            old_key, _ = _CHUNK_PROGRAMS.popitem(last=False)
            ocode = old_key[0][1] if old_key[0][0] == "code" else old_key[0]
            _KEYS_PER_CODE[ocode].discard(old_key)
    else:
        _CHUNK_PROGRAMS.move_to_end(key)
    res = progs.run(flat, const_flat, n)
    _carry_host_hints(table, res)
    return res


def _chunked_eager(fn, flat, treedef, is_arr, const_flat, const_treedef, n,
                   chunk_size, group):
    """Uncached fallback for unstable closures: the round-1 eager glue."""
    padded = _pad_len(n, chunk_size)
    pad = padded - n
    k = padded // chunk_size
    g, tail = divmod(k, group)
    consts = jax.tree_util.tree_unflatten(const_treedef, list(const_flat))

    def pad_leaf(a):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(jnp.asarray(a), widths, mode="edge")

    big = [pad_leaf(a) if arr else a for a, arr in zip(flat, is_arr)]

    def body(_, xs):
        it = iter(xs)
        sub_flat = [next(it) if arr else a for a, arr in zip(flat, is_arr)]
        out = fn(*jax.tree_util.tree_unflatten(treedef, sub_flat), *consts)
        return None, out

    outs = []
    for i in range(g):
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
    for j in range(tail):
        start = (g * group + j) * chunk_size
        sub_flat = [
            jax.lax.dynamic_slice_in_dim(a, start, chunk_size, 0)
            if arr else a
            for a, arr in zip(big, is_arr)
        ]
        outs.append(fn(
            *jax.tree_util.tree_unflatten(treedef, sub_flat), *consts))

    if len(outs) == 1:
        cat = outs[0]
    else:
        cat = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate([jnp.atleast_1d(x) for x in xs], 0),
            *outs)
    return jax.tree_util.tree_map(
        lambda a: a[:n] if a.ndim else a, cat)


def budget_chunk(chunk_size: Optional[int], rx: int, ry: int,
                 budget: int = 40_000_000) -> Optional[int]:
    """Effective POI chunk for a 2D refine kernel: the user's ``chunk_size``
    capped by a poi*pixel working-set budget (mirrors ICGN3D's poi*voxel
    budget).  40M keeps the flagship 30k r=16 queue a single dispatch while a
    38.4k r=30 queue (utn) splits into 4 — unbounded it allocates multi-GB of
    [N, (2r+1)^2] iteration buffers."""
    if chunk_size is None:
        return None
    s = (2 * rx + 1) * (2 * ry + 1)
    return min(chunk_size, max(1024, budget // s))


@jax.jit
def _cast_f32(x):
    return x.astype(jnp.float32)


def _upload_f32(arr) -> jnp.ndarray:
    """Device-resident f32 image/volume with a thin-wire upload: integer
    host data (CT volumes are 8/16-bit) is transferred at its native width
    and cast ON DEVICE — a 612 MB f32 Torus volume rides the host link as
    153 MB of uint8 (exact: uint8/16 -> f32 is lossless)."""
    dt = getattr(arr, "dtype", None)
    if dt is not None and np.issubdtype(dt, np.integer):
        return _cast_f32(jnp.asarray(arr))
    return jnp.asarray(arr, jnp.float32)


class Module2D:
    """Base for 2D modules: image state + subset radii (oc_dic.h:43-64)."""

    def __init__(self, subset_radius_x: int, subset_radius_y: int):
        self.subset_radius_x = int(subset_radius_x)
        self.subset_radius_y = int(subset_radius_y)
        self.ref_img: Optional[jnp.ndarray] = None
        self.tar_img: Optional[jnp.ndarray] = None
        self.self_adaptive = False
        self._memo = Memo()

    def set_images(self, ref_img, tar_img) -> None:
        self.ref_img = _upload_f32(_as_mat(ref_img))
        self.tar_img = _upload_f32(_as_mat(tar_img))

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
        self._memo = Memo()

    def set_images(self, ref_vol, tar_vol) -> None:
        self.ref_vol = _upload_f32(_as_mat(ref_vol))
        self.tar_vol = _upload_f32(_as_mat(tar_vol))

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
