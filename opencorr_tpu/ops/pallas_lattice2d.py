"""Pallas TPU kernel: gather-free "lattice" bicubic evaluation (2D).

Round-5 device profiling (bench_profile_device.py — the first REAL device
timelines in this sandbox) showed the flagship 2D IC-GN kernel spends
~0.55 s PER GAUSS-NEWTON ITERATION in the [H, W, 4, 4] tile-LUT gather
(30k POIs x 1089 samples x 16-f32 rows ~ 17M samples/s): the whole 30k-POI
compute is ~5.7 s of device time — ~10x SLOWER than the reference CPU.
Every earlier sub-ms "2D ICGN" number was enqueue-rate fantasy
(block_until_ready returns at enqueue on this backend even for single
programs; see PERF.md round-5 device-profiling section).

The fix is the same lattice structure that made DVC fast
(ops/pallas_lattice.py): the reference's per-cell polynomial evaluation
(oc_cubic_bspline.cpp:134-181) is algebraically a SEPARABLE 4x4-tap sum
over the raw image lattice,

  val(x, y) = sum_{n,m} img[yi-1+n, xi-1+m] * wy_n(yd) * wx_m(xd),
  wx_m(f)   = BC[3,m] + BC[2,m] f + BC[1,m] f^2 + BC[0,m] f^3

(derivation: val = sum C[k,l] yd^k xd^l with C = flip(BC.Q.BC^T) — the
per-pixel tile LUT is exactly this factorization precomputed, so the
lattice form evaluates the SAME real number with only f32 reordering,
~1e-6 relative).  Warped subset samples sit on a near-regular integer
lattice, so the 16 taps become (4+2D)^2 statically shifted VMEM slices of
a per-POI extended image window — pure VPU work, zero gathers.  Samples
whose lattice deviation exceeds D are detected OUTSIDE the kernel and the
caller falls back in-program to the exact global LUT eval (ops/icgn.py),
preserving exact semantics for any strain.

Multiple POIs pack side-by-side on the 128-lane axis (a lone 33-wide
subset row would use 33 lanes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bc_matrix():
    from .bspline import BC_MATRIX

    return BC_MATRIX  # [4(j: coeff of f^{3-j}), 4(tap)]


def _slot_weight(d_int, frac, o, w):
    """Placement weight for offset slot ``o``: sum_tap wtap(frac) *
    (d_int == o - tap), wtap the BC polynomial above.  Out-of-range
    placements (padding, wobble overflow, d_int outside [0, w-4])
    contribute exactly zero."""
    bc = _bc_matrix()
    acc = jnp.zeros_like(frac)
    for tap in range(4):
        cond = (d_int == o - tap) & (d_int >= 0) & (d_int <= w - 4)
        poly = (bc[3, tap]
                + frac * (bc[2, tap]
                          + frac * (bc[1, tap] + frac * bc[0, tap])))
        acc = acc + jnp.where(cond, poly, 0.0)
    return acc


def _lattice2d_kernel(eblk_ref, dy_ref, dx_ref, fy_ref, fx_ref, out_ref,
                      wx_scr, *, w, side_y, lanes):
    """One grid step covers ``gb`` lane-packed POI groups (a single-group
    step left the VPU ~30x under-occupied at flagship scale: 10k grid steps
    of [33, 114] work each).  out[gb, sy, lanes] = sum over (oy, ox)
    placements of shifted eblk slices; x-slot weights precomputed into a
    VMEM scratch; both placement loops statically unrolled."""
    dy = dy_ref[:]
    dx = dx_ref[:]
    fy = fy_ref[:]
    fx = fx_ref[:]

    for o in range(w):
        wx_scr[o] = _slot_weight(dx, fx, o, w)

    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for oy in range(w):
        wy_o = _slot_weight(dy, fy, oy, w)
        rows = eblk_ref[:, oy:oy + side_y, :]
        for ox in range(w):
            acc = acc + wy_o * wx_scr[ox] * rows[:, :, ox:ox + lanes]
    out_ref[:] = acc


@functools.partial(jax.jit,
                   static_argnames=("d_wobble", "npack", "interpret"))
def lattice_eval_2d(eblk: jnp.ndarray, dy: jnp.ndarray, dx: jnp.ndarray,
                    fy: jnp.ndarray, fx: jnp.ndarray, *, d_wobble: int = 1,
                    npack: int = 0, interpret: bool = False) -> jnp.ndarray:
    """eblk: [N, ext_y, ext_x] per-POI extended IMAGE blocks with
    ext_i = side_i + (4 + 2 d_wobble) - 1; dy/dx: [N, sy, sx] int32
    placement offsets (delta' in [0, 2 d_wobble]; out-of-range values
    contribute nothing); fy/fx: [N, sy, sx] f32 fractional parts.
    Returns [N, sy, sx] f32."""
    n, sy, sx = dy.shape
    w = 4 + 2 * d_wobble
    ext_y, ext_x = sy + w - 1, sx + w - 1
    assert eblk.shape[1:] == (ext_y, ext_x), (eblk.shape,)
    if npack == 0:
        npack = max(1, 128 // ext_x)

    npad = -n % npack
    if npad:
        pad_n = lambda a, v=0: jnp.pad(
            a, ((0, npad),) + ((0, 0),) * (a.ndim - 1), constant_values=v)
        eblk = pad_n(eblk)
        dy, dx = pad_n(dy, -1), pad_n(dx, -1)
        fy, fx = pad_n(fy), pad_n(fx)
    g = (n + npad) // npack
    lanes = npack * ext_x

    def pack(a, fill):
        x = a.shape[-1]
        a = jnp.pad(a, ((0, 0),) * (a.ndim - 1) + ((0, ext_x - x),),
                    constant_values=fill)
        a = a.reshape((g, npack) + a.shape[1:])
        a = jnp.moveaxis(a, 1, -2)
        return a.reshape(a.shape[:-2] + (lanes,))

    eblk = pack(eblk, 0)
    eblk = jnp.pad(eblk, ((0, 0), (0, 0), (0, w - 1)))
    dy, dx = pack(dy, -1), pack(dx, -1)
    fy, fx = pack(fy, 0), pack(fx, 0)

    # POI-groups per grid step: bound the VMEM working set.  The explicit
    # buffers are ~(5+w) [gb, sy, lanepad] f32 + the extended blocks, but
    # Mosaic's measured scoped footprint ran ~4x that estimate (unrolled
    # placement-loop temporaries), so the budget is calibrated to the
    # hardware: gb=30 hit 25.75 MB scoped (limit 16); ~1.5 MB estimated
    # keeps the real footprint ~6 MB.
    lanepad = -(-lanes // 128) * 128
    per_gb = (ext_y * (lanes + w - 1) + (5 + w) * sy * lanepad) * 4
    gb = max(1, min(g, (3 << 19) // per_gb))
    gpad = -g % gb
    if gpad:
        pad_g = lambda a, v: jnp.pad(
            a, ((0, gpad),) + ((0, 0),) * (a.ndim - 1), constant_values=v)
        eblk = pad_g(eblk, 0)
        dy, dx = pad_g(dy, -1), pad_g(dx, -1)
        fy, fx = pad_g(fy, 0), pad_g(fx, 0)
    ng = (g + gpad) // gb

    kernel = functools.partial(_lattice2d_kernel, w=w, side_y=sy,
                               lanes=lanes)
    in_specs = [
        pl.BlockSpec((gb, ext_y, lanes + w - 1), lambda p: (p, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((gb, sy, lanes), lambda p: (p, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(4)
    ]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ng * gb, sy, lanes), jnp.float32),
        grid=(ng,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((gb, sy, lanes), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((w, gb, sy, lanes), jnp.float32)],
        interpret=interpret,
    )(eblk, dy, dx, fy, fx)
    out = out[:g]
    # unpack [G, sy, npack*ext_x] -> [N, sy, sx]
    out = out.reshape(g, sy, npack, ext_x)
    out = jnp.moveaxis(out, 2, 1).reshape(g * npack, sy, ext_x)
    return out[:n, :, :sx]
