"""Volume-block sharding with halo exchange for DVC.

The reference has no distributed story (single process + OpenMP, SURVEY.md
§2.8); this module supplies the TPU-native design from SURVEY.md §5.8: CT
volumes are sharded in z-blocks across the device mesh, each device exchanges
boundary slabs with its neighbors over ICI (``lax.ppermute``), computes
gradient/coefficient state on its extended block, and refines the POIs that
fall in its block — no other communication until the final field gather.

Halo sizing: a POI touches at most a (2r+1)^3 window, the 4th-order gradient
stencil adds +-2, the tricubic prefilter has 15-tap (+-7) support
(oc_cubic_bspline.cpp:229); with ``halo = r + 2 + 7`` the per-block
coefficient/gradient state matches the global computation to prefilter-tap
decay (b7 ~ 1.7e-4).  Warped subsets that wander beyond the halo hit the
interpolation range guard and are reported -3, exactly like an out-of-image
warp in the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data import poi as poi_mod
from ..models import base as model_base
from ..ops import bspline, gradient, icgn as icgn_ops


def halo_exchange_z(block: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Extend a local z-block with neighbor slabs: [Bz, Y, X] ->
    [halo + Bz + halo, Y, X].  Edge devices replace the wrapped ring slab with
    an edge-clamped replication of their boundary plane, so the 15-tap clamped
    tricubic prefilter (oc_cubic_bspline.cpp:223-351, ``getHigh(k-t, 0)`` /
    ``getLow(k+t, dim-1)``) computed on the extended block matches the global
    clamped computation exactly at the volume boundary."""
    n = jax.lax.axis_size(axis_name)
    dev = jax.lax.axis_index(axis_name)
    top = block[:halo]  # slab to send to the previous device's bottom
    bot = block[-halo:]
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_prev = jax.lax.ppermute(bot, axis_name, fwd)  # prev device's bottom
    from_next = jax.lax.ppermute(top, axis_name, bwd)  # next device's top
    clamp_lo = jnp.broadcast_to(block[:1], from_prev.shape)
    clamp_hi = jnp.broadcast_to(block[-1:], from_next.shape)
    from_prev = jnp.where(dev == 0, clamp_lo, from_prev)
    from_next = jnp.where(dev == n - 1, clamp_hi, from_next)
    return jnp.concatenate([from_prev, block, from_next], axis=0)


def partition_pois_z(table: poi_mod.POITable3D, n_blocks: int, dim_z: int):
    """Host-side: assign each POI to the z-block containing it, pad every
    block's queue to the max count (replicating the first POI with a poisoned
    status so padding never computes), and return the stacked [n_blocks, Np]
    table plus the scatter indices to restore original order.

    POI z-coordinates come from the host-hint registry (new_table_3d
    registers them): only an ad-hoc table without hints pays one readback,
    which is then registered so it happens at most once."""
    z = model_base.host_hint(table.z)
    if z is None:
        z = np.asarray(table.z)
        model_base.register_host_hint(table.z, z)
    bz = dim_z // n_blocks
    owner = np.clip((z // bz).astype(np.int64), 0, n_blocks - 1)
    order = np.argsort(owner, kind="stable")
    counts = np.bincount(owner, minlength=n_blocks)
    cap = int(counts.max()) if len(order) else 1

    idx = np.zeros((n_blocks, cap), np.int64)
    valid = np.zeros((n_blocks, cap), bool)
    pos = 0
    for b in range(n_blocks):
        c = counts[b]
        idx[b, :c] = order[pos : pos + c]
        idx[b, c:] = order[pos] if c else 0
        valid[b, :c] = True
        pos += c
    return idx, valid, owner, bz


@functools.partial(
    jax.jit, static_argnames=("halo", "mesh_axis", "mesh"))
def _sharded_prepare_ref(ref_vol, *, halo, mesh_axis, mesh):
    """Sharded reference-side prepare: halo-extended block + gradients.
    Split from the target-side coefficient program (and from the POI chunk
    programs) to bound peak HBM — fused together they OOM'd at CT scale
    (19 GB at mesh=1), and fused into every chunk they also re-ran ~158x
    per queue.  Outputs are [n_dev, ext_z, Y, X] arrays sharded on their
    leading axis (each device holds only its own block)."""

    def block_fn(ref_blk):
        dev = jax.lax.axis_index(mesh_axis)
        n_dev = jax.lax.axis_size(mesh_axis)
        bz = ref_blk.shape[0]
        ref_ext = halo_exchange_z(ref_blk, halo, mesh_axis)
        gx = gradient.gradient_x_3d(ref_ext)
        gy = gradient.gradient_y_3d(ref_ext)
        gz = gradient.gradient_z_3d(ref_ext)
        # The global gradient_z leaves 2-px zero borders at the volume z
        # edges (oc_gradient.cpp:143); re-impose them on the edge blocks,
        # where the clamp-filled halo would otherwise yield a nonzero
        # stencil result.
        zidx = jnp.arange(ref_ext.shape[0])[:, None, None]
        lo_border = (dev == 0) & (zidx >= halo) & (zidx < halo + 2)
        hi_border = ((dev == n_dev - 1) & (zidx >= halo + bz - 2)
                     & (zidx < halo + bz))
        gz = jnp.where(lo_border | hi_border, 0.0, gz)
        return (gx[None], gy[None], gz[None], ref_ext[None])

    fn = jax.shard_map(
        block_fn, mesh=mesh,
        in_specs=(P(mesh_axis),),
        out_specs=P(mesh_axis), check_vma=False)
    return fn(ref_vol)


@functools.partial(
    jax.jit, static_argnames=("halo", "mesh_axis", "mesh"))
def _sharded_extend(vol, *, halo, mesh_axis, mesh):
    """Halo exchange only -> [n_dev, ext_z, Y, X] sharded on axis 0."""

    def block_fn(blk):
        return halo_exchange_z(blk, halo, mesh_axis)[None]

    return jax.shard_map(
        block_fn, mesh=mesh, in_specs=(P(mesh_axis),),
        out_specs=P(mesh_axis), check_vma=False)(vol)


@jax.jit
def _blocks_prepare_coeff(tar_ext):
    """Per-block tricubic prefilter as a PLAIN jit on the block-sharded
    array: the leading axis is sharded per device and the prefilter is
    block-local, so GSPMD runs it without communication — and XLA schedules
    it exactly like the proven single-chip prepare.  Inside shard_map the
    same take-based 15-tap expression kept ~25 full-volume copies live and
    OOM'd HBM at mesh=1 (18.3 GB for a 615 MB block)."""
    return jax.vmap(bspline.tricubic_prepare)(tar_ext)


def _sharded_prepare_coeff(tar_vol, *, halo, mesh_axis, mesh):
    return _blocks_prepare_coeff(
        _sharded_extend(tar_vol, halo=halo, mesh_axis=mesh_axis, mesh=mesh))


def _sharded_prepare(ref_vol, tar_vol, *, halo, mesh_axis, mesh):
    gx, gy, gz, ref_ext = _sharded_prepare_ref(
        ref_vol, halo=halo, mesh_axis=mesh_axis, mesh=mesh)
    coeff = _sharded_prepare_coeff(
        tar_vol, halo=halo, mesh_axis=mesh_axis, mesh=mesh)
    return gx, gy, gz, ref_ext, coeff


@functools.partial(
    jax.jit,
    static_argnames=("rx", "ry", "rz", "halo", "mesh_axis", "mesh",
                     "window_margin", "eval_mode"),
)
def _sharded_icgn3d(
    gx_e, gy_e, gz_e, ref_e, coeff_e, xs, ys, zs, p_in, zncc_in, valid,
    conv, max_iter,
    *, rx, ry, rz, halo, mesh_axis, mesh, window_margin=None,
    eval_mode="tile",
):

    def block_fn(gx_b, gy_b, gz_b, ref_b, coeff_b, xs_b, ys_b, zs_b, p_b,
                 z_b, ok_b):
        # drop the leading block axis shard_map leaves on every input
        gx, gy, gz = gx_b[0], gy_b[0], gz_b[0]
        ref_ext, coeff = ref_b[0], coeff_b[0]
        xs_b, ys_b, zs_b = xs_b[0], ys_b[0], zs_b[0]
        p_b, z_b, ok_b = p_b[0], z_b[0], ok_b[0]
        dev = jax.lax.axis_index(mesh_axis)
        n_dev = jax.lax.axis_size(mesh_axis)
        bz = ref_ext.shape[0] - 2 * halo
        # translate POI z into extended-block coordinates
        z_local = zs_b - (dev * bz).astype(jnp.float32) + halo
        zin = jnp.where(ok_b, z_b, jnp.float32(-10.0))  # poison padding
        # Interpolation range guard in *global* coordinates: a warp past the
        # global z edge must fail with -3 exactly as tricubic_eval's
        # [1, dim-2) guard would in the unsharded computation, instead of
        # interpolating the clamp-filled halo.
        zlo = jnp.where(dev == 0, jnp.float32(halo + 1), jnp.float32(-jnp.inf))
        zhi = jnp.where(dev == n_dev - 1, jnp.float32(halo + bz - 2),
                        jnp.float32(jnp.inf))
        out = icgn_ops.icgn3d1(
            gx, gy, gz, ref_ext, coeff, xs_b, ys_b, z_local, p_b, zin,
            conv, max_iter, rx=rx, ry=ry, rz=rz,
            window_margin=window_margin, eval_mode=eval_mode,
            z_guard_lo=zlo, z_guard_hi=zhi,
        )
        return tuple(o[None] for o in out[:6])

    fn = jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(P(mesh_axis),) * 11,
        out_specs=P(mesh_axis),
        # the lattice path's pallas_call has no vma annotation on its
        # out_shape; every output here is per-block anyway
        check_vma=False,
    )
    return fn(gx_e, gy_e, gz_e, ref_e, coeff_e, xs, ys, zs, p_in, zncc_in,
              valid)


@jax.jit
def _to_f32(x):
    return x.astype(jnp.float32)


@jax.jit
def _gather_queue(table_x, table_y, table_z, table_p, table_r, idx, valid):
    """Device-side block-queue gather (idx [B, Np] into the original order)."""
    g = lambda a: a[idx]
    return (g(table_x), g(table_y), g(table_z), g(table_p),
            g(table_r[:, poi_mod.R3_ZNCC]), valid)


@functools.partial(jax.jit, static_argnames=("rz", "dim_z"))
def _scatter_back(p_old, r_old, z_all, p_out, u0, v0, w0, zncc, it,
                  idx, valid, *, rz, dim_z):
    """Scatter block results to original queue order ON DEVICE, then
    re-impose the reference's global z-edge guard (oc_icgn.cpp:1279) —
    the per-block guard cannot see the global boundary (the ring halo
    wraps).  Padding rows scatter to an out-of-range target (mode=drop)."""
    n = p_old.shape[0]
    flat_idx = idx.reshape(-1)
    tgt = jnp.where(valid.reshape(-1), flat_idx, n)
    p_new = p_old.at[tgt].set(p_out.reshape(-1, 12), mode="drop")
    r_new = r_old
    for col, vals in ((poi_mod.R3_U0, u0), (poi_mod.R3_V0, v0),
                      (poi_mod.R3_W0, w0), (poi_mod.R3_ZNCC, zncc),
                      (poi_mod.R3_ITER, it)):
        r_new = r_new.at[tgt, col].set(vals.reshape(-1), mode="drop")
    bad = (z_all - rz < 0) | (z_all + rz > dim_z - 1)
    zncc_in = r_old[:, poi_mod.R3_ZNCC]
    r_new = r_new.at[:, poi_mod.R3_ZNCC].set(jnp.where(
        bad, jnp.where(zncc_in >= 0, jnp.float32(-3.0), zncc_in),
        r_new[:, poi_mod.R3_ZNCC]))
    p_new = jnp.where(bad[:, None], p_old, p_new)
    return p_new, r_new


class ShardedICGN3D1:
    """DVC IC-GN over a z-sharded volume (multi-chip DVC).

    Usage mirrors ICGN3D1 but compute() takes the mesh. The volume z-dimension
    must divide the mesh size. Each POI is refined by the device owning its
    z-block; results are gathered back into the original queue order.

    ``window_margin``/``eval_mode`` select the same windowed/lattice kernels
    as the single-chip ICGN3D1 (gather-free Pallas lattice by default — the
    CT-scale path; round 4 left the sharded path on the global gather eval,
    ~170x slower per chip at CT scale).  The halo (rz + max(9, margin+1))
    keeps a POI's coefficient window (half-extent r+margin around its
    seeded center) inside the extended block for seeds within ~1 voxel of
    the block edge; larger seed displacements read edge-clipped windows
    exactly like the single-chip path does at the volume edge (subset
    still covered, GN drift slack reduced), and genuine window exits fail
    -3.  compute() is device-resident end to end: POI partitioning uses
    the host-hint registry (utils/hosthints) and the queue gather/result
    scatter run as jitted device programs — no np.asarray in the path
    (the round-2/3 finding: any readback flips the dispatch session into
    polled mode).
    """

    def __init__(self, subset_radius_x: int, subset_radius_y: int,
                 subset_radius_z: int, conv_criterion: float = 0.001,
                 stop_condition: float = 10,
                 window_margin=8, eval_mode: str = "lattice"):
        self.rx = int(subset_radius_x)
        self.ry = int(subset_radius_y)
        self.rz = int(subset_radius_z)
        self.conv_criterion = float(conv_criterion)
        self.stop_condition = float(stop_condition)
        self.window_margin = window_margin
        self.eval_mode = eval_mode
        # rz + 2 covers the gradient stencil, +7 the prefilter taps;
        # rz + margin + 1 fits seeded windows (see class docstring)
        margin = 0 if window_margin is None else int(window_margin)
        self.halo = self.rz + max(2 + 7, margin + 1)
        self.ref_vol = None
        self.tar_vol = None

    def set_images(self, ref_vol, tar_vol):
        # native width: integer CT volumes ride the host link at 1 B/voxel
        # and are cast to f32 ON DEVICE (same thin-wire rule as
        # models/base._upload_f32 — the 1.2 GB f32 Torus upload cost ~30 s
        # and most of the run-to-run spread)
        self.ref_vol = np.asarray(getattr(ref_vol, "mat", ref_vol))
        self.tar_vol = np.asarray(getattr(tar_vol, "mat", tar_vol))
        if not np.issubdtype(self.ref_vol.dtype, np.integer):
            self.ref_vol = self.ref_vol.astype(np.float32)
        if not np.issubdtype(self.tar_vol.dtype, np.integer):
            self.tar_vol = self.tar_vol.astype(np.float32)

    def compute(self, table: poi_mod.POITable3D, mesh: Mesh,
                axis: str = "z") -> poi_mod.POITable3D:
        n_dev = mesh.devices.size
        dim_z, dim_y, dim_x = self.ref_vol.shape
        if dim_z % n_dev:
            raise ValueError(
                f"volume z={dim_z} not divisible by mesh size {n_dev}")
        if dim_z // n_dev < self.halo:
            raise ValueError("block smaller than halo; use fewer devices")
        margin = self.window_margin
        if margin is not None:
            # same small-volume guard as models/icgn.ICGN3D1: the windowed
            # slice must fit the EXTENDED block on every axis
            bz_ext = dim_z // n_dev + 2 * self.halo
            if (min(dim_x - 2 * self.rx, dim_y - 2 * self.ry,
                    bz_ext - 2 * self.rz) - 1 < 2 * margin):
                margin = None

        idx, valid, owner, bz = partition_pois_z(table, n_dev, dim_z)

        vol_sh = NamedSharding(mesh, P(axis))
        up = lambda a: _to_f32(jax.device_put(jnp.asarray(a), vol_sh))
        ref_d = up(self.ref_vol)
        tar_d = up(self.tar_vol)
        prep = _sharded_prepare(ref_d, tar_d, halo=self.halo,
                                mesh_axis=axis, mesh=mesh)

        # Per-device POI chunking, orchestrated on the host like
        # models/base.chunked (an in-program lax.map would scan-wrap the GN
        # while_loop — the known device-fault pattern, CLAUDE.md
        # SCAN_GROUP=1): each dispatch refines [n_dev, chunk] POIs, chunk
        # sized by the same radius-aware lattice/global budgets as the
        # single-chip path.
        s = (2 * self.rx + 1) * (2 * self.ry + 1) * (2 * self.rz + 1)
        if margin is not None and self.eval_mode == "lattice":
            budget = 18_000_000 if s <= 50_000 else 7_300_000
        else:
            budget = 9_000_000
        chunk = max(8, budget // s)
        cap = idx.shape[1]
        pad = -cap % chunk if cap > chunk else 0
        if pad:
            idx = np.pad(idx, ((0, 0), (0, pad)))
            valid = np.pad(valid, ((0, 0), (0, pad)))
        idx_d = jnp.asarray(idx)
        valid_d = jnp.asarray(valid)

        parts = []
        for lo in range(0, idx.shape[1], chunk):
            idx_c = idx_d[:, lo:lo + chunk]
            val_c = valid_d[:, lo:lo + chunk]
            xs, ys, zs, ps, zncc_in, val = _gather_queue(
                table.x, table.y, table.z, table.p, table.r, idx_c, val_c)
            parts.append(_sharded_icgn3d(
                *prep, xs, ys, zs, ps, zncc_in, val,
                jnp.float32(self.conv_criterion),
                jnp.float32(self.stop_condition),
                rx=self.rx, ry=self.ry, rz=self.rz, halo=self.halo,
                mesh_axis=axis, mesh=mesh,
                window_margin=margin, eval_mode=self.eval_mode,
            ))
        if len(parts) == 1:
            p_out, u0, v0, w0, zncc, it = parts[0]
        else:
            p_out, u0, v0, w0, zncc, it = (
                jnp.concatenate([p[i] for p in parts], axis=1)
                for i in range(6))
        p_new, r_new = _scatter_back(
            table.p, table.r, table.z, p_out, u0, v0, w0, zncc, it,
            idx_d, valid_d, rz=self.rz, dim_z=dim_z)
        return table.replace(p=p_new, r=r_new)
