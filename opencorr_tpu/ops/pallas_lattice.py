"""Pallas TPU kernel: gather-free "lattice" tricubic evaluation.

The DVC Gauss-Newton hot loop evaluates the tricubic spline at every warped
subset voxel — N_poi * (2r+1)^3 samples x 64 taps per iteration.  Measured
on v5e (bench_gather_ab.py): scattered gathers run ~1M samples/s, per-window
contiguous tile gathers ~62M samples/s, while the same chip moves 690 GB/s
and 35 f32 TFLOP/s — gather *row processing* is the wall, two orders of
magnitude below the VPU.

This kernel removes gathers entirely by exploiting the subset's lattice
structure: warped samples sit on a near-regular integer lattice, so sample
(k, j, i)'s 4x4x4 tap neighborhood lives at offset (k, j, i) + o within a
per-POI extended block, where o ranges over a STATIC window of
(4+2D)^3 offsets (D bounds the per-sample "wobble" = fractional-floor
crossings + the warp's deviation from translation, |delta| <= D).  The
evaluation becomes

    val[k,j,i] = sum_o  wz[o_z] * wy[o_y] * wx[o_x] * eblk[k+o_z, j+o_y, i+o_x]

with per-sample placement weights w built from the B-spline basis values
(oc_cubic_bspline.cpp:353-405 numerics) and the per-sample integer offsets.
All (4+2D)^3 terms are shifted VMEM slices — pure VPU work, no gathers.
Samples whose wobble exceeds D are detected OUTSIDE the kernel (int
compares) and the caller falls back to the exact tile-gather path for that
chunk (ops/icgn.py), so the semantics stay exact for any strain.

Reference semantics note: the 64 contributing terms are mathematically the
same products as the reference's 4x4x4 evaluation; only the f32 summation
order differs (a ~1e-5-relative reordering, verified under the golden
gates).

Structure notes (Mosaic VMEM): the (oz, oy) loops are DYNAMIC fori_loops
with z/y weights rebuilt on the fly — a fully-unrolled 512-term expression
kept ~70 MB of temporaries live on the VMEM stack and failed to compile.
Only the innermost x offsets are statically unrolled, with the x placement
weights precomputed once per step into a VMEM scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _basis4(d, tap):
    """Cubic B-spline basis value for tap 0..3 (oc_cubic_bspline.cpp:35-53)."""
    if tap == 0:
        return (1.0 / 6.0) * (d * (d * (-d + 3.0) - 3.0) + 1.0)
    if tap == 1:
        return (1.0 / 6.0) * (d * d * (3.0 * d - 6.0) + 4.0)
    if tap == 2:
        return (1.0 / 6.0) * (d * (d * (-3.0 * d + 3.0) + 3.0) + 1.0)
    return (1.0 / 6.0) * (d * d * d)


def _slot_weight(d_int, frac, o, w):
    """Placement weight for offset slot ``o`` (traced or static):
    sum_tap basis_tap(frac) * (d_int == o - tap).  Only d_int in
    [0, w-4] can contribute, so out-of-range placements (padding, wobble
    overflow) yield exactly zero when ``o`` is static; for a traced ``o``
    the d_int range restriction gives the same result."""
    acc = jnp.zeros_like(frac)
    for tap in range(4):
        cond = d_int == o - tap
        cond = cond & (d_int >= 0) & (d_int <= w - 4)
        acc = acc + jnp.where(cond, _basis4(frac, tap), 0.0)
    return acc


def _lattice_kernel(eblk_ref, dz_ref, dy_ref, dx_ref, fz_ref, fy_ref,
                    fx_ref, out_ref, wx_scr, wy_scr, *, w, slab, side_y,
                    lanes):
    """One (POI-group, z-slab) step.

    eblk_ref: [1, Z, side_y + w - 1, lanes + w - 1] (the group's WHOLE
    padded block — z-slabs overlap by w-1 planes, which BlockSpec's
    block-unit index maps cannot express, so the kernel slices its slab out
    with pl.ds); d*_ref: [1, slab, side_y, lanes] int32 placement offsets
    (delta'); f*_ref: same-shaped f32 fractional parts; out_ref: [1, slab,
    side_y, lanes]; wx_scr/wy_scr: [w, slab, side_y, lanes] VMEM scratches.

    ``lanes`` may pack SEVERAL POIs side-by-side on the lane axis (segments
    of stride >= side_x + w - 1, see ``lattice_eval``'s npack): the x shift
    structure is per-lane-relative, so one slice serves every segment.
    """
    base = pl.program_id(1) * slab
    dz = dz_ref[0]
    dy = dy_ref[0]
    dx = dx_ref[0]
    fz = fz_ref[0]
    fy = fy_ref[0]
    fx = fx_ref[0]

    for o in range(w):
        wx_scr[o] = _slot_weight(dx, fx, o, w)
        wy_scr[o] = _slot_weight(dy, fy, o, w)

    # Only the z offset is dynamic (major dim — cheap addressing); the y/x
    # offsets are STATIC unrolls: dynamic sublane/lane offsets lower to
    # element-wise copies on Mosaic and were ~100x slower.
    def oz_body(oz, acc):
        wz_oz = _slot_weight(dz, fz, oz, w)
        planes = eblk_ref[0, pl.ds(base + oz, slab), :, :]
        for oy in range(w):
            wzy = wz_oz * wy_scr[oy]
            plane = planes[:, oy:oy + side_y, :]
            for ox in range(w):
                acc = acc + wzy * wx_scr[ox] * plane[:, :, ox:ox + lanes]
        return acc

    acc = jnp.zeros((slab, side_y, lanes), jnp.float32)
    out_ref[0] = jax.lax.fori_loop(0, w, oz_body, acc)


def _auto_slab(sz, sy, ext_x, npack, w):
    """Largest z-slab (8, 4, 2, 1) whose estimated VMEM footprint fits the
    16 MB scoped limit with headroom.  r=16 subsets (33^3) keep slab 8; the
    al_foam r=30 case (61^3, ext 66) was 256 KB over the limit at 8 and
    drops to 4."""
    lanes = npack * ext_x
    lanepad = -(-lanes // 128) * 128
    for slab in (8, 4, 2, 1):
        n_slabs = -(-sz // slab)
        zfull = n_slabs * slab + w - 1
        eblk_b = zfull * (sy + w - 1) * (lanes + w - 1) * 4
        io_b = 7 * slab * sy * lanepad * 4
        scr_b = 2 * w * slab * sy * lanepad * 4
        # threshold calibrated on hardware: r=16 (est ~5.1 MB) compiled at
        # slab 8; r=30 (est ~9.1 MB) measured 16.25 MB scoped (the estimate
        # excludes in-kernel temporaries), so the cut sits between them
        if 2 * (eblk_b + io_b) + scr_b < 8 << 20:
            return slab
    return 1


@functools.partial(jax.jit,
                   static_argnames=("d_wobble", "slab", "npack", "interpret"))
def lattice_eval(eblk: jnp.ndarray, dz: jnp.ndarray, dy: jnp.ndarray,
                 dx: jnp.ndarray, fz: jnp.ndarray, fy: jnp.ndarray,
                 fx: jnp.ndarray, *, d_wobble: int = 1, slab=None,
                 npack: int = 0, interpret: bool = False) -> jnp.ndarray:
    """Evaluate the lattice tricubic sum for every subset sample.

    eblk: [N, ext_z, ext_y, ext_x] per-POI extended blocks with
    ext_i = side_i + (4 + 2*d_wobble) - 1; dz/dy/dx: [N, sz, sy, sx] int32
    placement offsets (delta' in [0, 2*d_wobble]; out-of-range values
    contribute nothing — the caller must detect them separately); fz/fy/fx:
    [N, sz, sy, sx] f32 fractional parts.  Returns [N, sz, sy, sx] f32.

    ``npack`` POIs are packed side-by-side on the TPU lane axis (segments
    of stride ext_x): a lone 33-wide subset row uses 33 of 128 lanes, so
    packing three lifts lane efficiency ~3x.  0 = auto (128 // ext_x,
    minimum 1).  The grid is (POI group, z-slab).
    """
    n, sz, sy, sx = dz.shape
    w = 4 + 2 * d_wobble
    ext_z, ext_y, ext_x = sz + w - 1, sy + w - 1, sx + w - 1
    assert eblk.shape[1:] == (ext_z, ext_y, ext_x), (eblk.shape,)
    if npack == 0:
        npack = max(1, 128 // ext_x)
    if slab is None:
        slab = _auto_slab(sz, sy, ext_x, npack, w)

    npad = -n % npack
    if npad:
        pad_n = lambda a, v=0: jnp.pad(
            a, ((0, npad),) + ((0, 0),) * (a.ndim - 1), constant_values=v)
        eblk = pad_n(eblk)
        dz, dy, dx = pad_n(dz, -1), pad_n(dy, -1), pad_n(dx, -1)
        fz, fy, fx = pad_n(fz), pad_n(fy), pad_n(fx)
    g = (n + npad) // npack
    lanes = npack * ext_x

    def pack(a, fill):
        # [G*npack, ..., X] -> [G, ..., npack*ext_x] with POI p in lane
        # segment [p*ext_x, p*ext_x + X)
        x = a.shape[-1]
        a = jnp.pad(a, ((0, 0),) * (a.ndim - 1) + ((0, ext_x - x),),
                    constant_values=fill)
        a = a.reshape((g, npack) + a.shape[1:])
        a = jnp.moveaxis(a, 1, -2)
        return a.reshape(a.shape[:-2] + (lanes,))

    eblk = pack(eblk, 0)
    eblk = jnp.pad(eblk, ((0, 0),) * 3 + ((0, w - 1),))
    dz, dy, dx = pack(dz, -1), pack(dy, -1), pack(dx, -1)
    fz, fy, fx = pack(fz, 0), pack(fy, 0), pack(fx, 0)

    n_slabs = -(-sz // slab)
    zpad = n_slabs * slab - sz
    eblk = jnp.pad(eblk, ((0, 0), (0, zpad), (0, 0), (0, 0)))
    if zpad:
        # pad subset z so slabs tile evenly; padded samples get d=-1 (no
        # slot matches -> zero weight) so the padded eblk reads are benign
        pad4 = ((0, 0), (0, zpad), (0, 0), (0, 0))
        dz = jnp.pad(dz, pad4, constant_values=-1)
        dy = jnp.pad(dy, pad4, constant_values=-1)
        dx = jnp.pad(dx, pad4, constant_values=-1)
        fz = jnp.pad(fz, pad4)
        fy = jnp.pad(fy, pad4)
        fx = jnp.pad(fx, pad4)

    kernel = functools.partial(_lattice_kernel, w=w, slab=slab, side_y=sy,
                               lanes=lanes)
    grid = (g, n_slabs)
    zfull = n_slabs * slab + w - 1
    in_specs = [
        pl.BlockSpec((1, zfull, ext_y, lanes + w - 1),
                     lambda p, s: (p, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((1, slab, sy, lanes), lambda p, s: (p, s, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(6)
    ]
    out_spec = pl.BlockSpec((1, slab, sy, lanes),
                            lambda p, s: (p, s, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((g, n_slabs * slab, sy, lanes),
                                       jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((w, slab, sy, lanes), jnp.float32),
                        pltpu.VMEM((w, slab, sy, lanes), jnp.float32)],
        interpret=interpret,
    )(eblk, dz, dy, dx, fz, fy, fx)
    # unpack: [G, Z, sy, npack*ext_x] -> [N, sz, sy, sx]
    out = out[:, :sz].reshape(g, sz, sy, npack, ext_x)
    out = jnp.moveaxis(out, 3, 1).reshape(g * npack, sz, sy, ext_x)
    return out[:n, :, :, :sx]
