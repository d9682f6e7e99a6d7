"""Fused Pallas kernel for the SIFT3D descriptor histogram
(constructDescriptor, oc_sift.cpp:1051-1250).

The einsum path (ops/sift3d.construct_descriptor) materializes six [K, V]
flats plus per-slab [K, vs, 64] cube weights in HBM and runs TWO
voxel-row-bound MXU passes (the 20-triangle one-hot fold and the [12]x[64]
contraction) — at Torus scale that is ~1.5 TB of HBM traffic and ~12e9
f32 MXU rows per volume.  This kernel restructures the math so one voxel
costs ONE MXU row and no HBM intermediate:

* **Argmax-face barycentric.**  The icosahedron is convex with the origin
  inside, so a gradient direction g lies in exactly one face — the one
  whose (unit) normal maximizes n_t . g.  The intersection point of ray g
  with that face's plane is g * (d / max_dot), and barycentric coordinates
  are LINEAR on the plane: b = B_t @ p with B_t = inv([v1 v2 v3]) (columns).
  This replaces the reference's 20-iteration Moller-Trumbore loop (20
  divides/voxel; cartisan2Barycentric, oc_sift.cpp:579-624) with 20 dot
  products, one argmax and one divide.  Agreement with the first-match
  loop was verified exhaustively on random directions (identical face,
  bary diff ~1e-8 in f64); they differ only for g exactly on a face edge
  (measure zero), where the weight of the disagreeing vertex is itself
  O(eps).  The reference's det/kk/residual rejections are automatically
  satisfied: max_t n_t.g >= cos(face circumradius) * |g| ~ 0.79 |g| > 0.

* **Deferred vertex binning.**  desc[j, c] = sum_v mag*b_j(v) * cube_w[v, c]
  with b = B_t @ g * alpha factorizes as W'[j, (t,a)] @ S[(t,a), c] where
    S[(t,a), c] = sum_v (onehot20_t * alpha * g_a)[v] * cube_w[v, c]
  and W'[j, (t,a)] = sum_i [tri[t,i]==j] B_t[i, a] is a static [12, 60]
  matrix.  The kernel accumulates S with ONE [60, V] x [V, 64] MXU
  contraction per keypoint; the [12, 60] @ [60, 64] fold runs per KEYPOINT
  (not per voxel) outside the kernel.

* **Separable Gaussian weights.**  exp(-0.5 d^2/sigma^2) with d^2 = px^2 +
  py^2 + pz^2 factors into three per-axis exp tables of size O(s), not
  O(s^3) exps (the volume border mask, oc_sift.h:22 IMG_BORDER, folds into
  the same tables); the sphere test d <= 2 sigma runs on d^2 (no sqrt).

Everything between the gradient windows and the [K, 60, 64] output lives
in VMEM per (keypoint-tile, z-slice) grid step: the rotations, sub-cube
coordinates, face argmax, tent weights (with the reference's (int)
truncation quirk, oc_sift.cpp:1184-1199) and cube outer products never
touch HBM.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS10 = float(np.finfo(np.float32).eps * 10.0)  # oc_sift.cpp threshold


@functools.lru_cache(None)
def _face_tables():
    """(normals [20, 3], dhat scalar, W' [12, 60]) in f32 (f64 build)."""
    from .sift3d import ICOSA_TRIPLETS, ICOSA_VERTICES

    tri = ICOSA_TRIPLETS
    v = ICOSA_VERTICES.astype(np.float64)
    n = np.zeros((20, 3))
    w = np.zeros((12, 20, 3))
    dhat = 0.0
    for t in range(20):
        v1, v2, v3 = v[tri[t]]
        nt = v1 + v2 + v3
        nt /= np.linalg.norm(nt)
        n[t] = nt
        dhat = float(nt @ v1)  # identical for every face (regular solid)
        bt = np.linalg.inv(np.stack([v1, v2, v3], axis=1))
        for i in range(3):
            w[tri[t, i], t] += bt[i]
    # 60-axis ordering is (a, t) — a * 20 + t — matching the kernel's
    # [Kt, 3, 20, CYX] -> [Kt, 60, CYX] reshape (keeps the 20-dim next to
    # the lane dim, where its pad-to-24 costs 1.2x instead of the 2.7x a
    # 3-sublane layout would).
    return (n.astype(np.float32), np.float32(dhat),
            np.ascontiguousarray(w.transpose(0, 2, 1)).reshape(12, 60)
            .astype(np.float32))


def _desc_kernel(gx_ref, gy_ref, gz_ref, wz_ref, pz_ref, pz2_ref,
                 wyx_ref, px_ref, py_ref, pyx2_ref, rot_ref, out_ref,
                 *, r2, inv_cr, cr, bf16=False):
    """One (keypoint-tile, z-slice, yx-tile) grid step: accumulate
    S [Kt, 60, 64]."""
    f32 = jnp.float32
    nf, dhat, _ = _face_tables()
    first = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

    # per-voxel weight: separable Gaussian x border masks x sphere test
    w = wz_ref[0] * wyx_ref[:]  # [Kt, 1] * [Kt, CYX]
    w = jnp.where(pz2_ref[0] + pyx2_ref[:] <= r2, w, 0.0)
    gx = gx_ref[0] * w
    gy = gy_ref[0] * w
    gz = gz_ref[0] * w

    rot = rot_ref[:]  # [Kt, 9] row-major rows of the 3x3

    def rotc(i, ax, ay, az):
        return (rot[:, 3 * i + 0][:, None] * ax
                + rot[:, 3 * i + 1][:, None] * ay
                + rot[:, 3 * i + 2][:, None] * az)

    ggx = rotc(0, gx, gy, gz)
    ggy = rotc(1, gx, gy, gz)
    ggz = rotc(2, gx, gy, gz)

    px = px_ref[:]
    py = py_ref[:]
    pz = pz_ref[0]  # [Kt, 1]
    rx = rotc(0, px, py, pz)
    ry = rotc(1, px, py, pz)
    rz = rotc(2, px, py, pz)
    # sub-cube coordinates, 2 (r + cr)/cr - 0.5 (oc_sift.cpp:1160-1171)
    sub_x = 2.0 * (rx + cr) * inv_cr - 0.5
    sub_y = 2.0 * (ry + cr) * inv_cr - 0.5
    sub_z = 2.0 * (rz + cr) * inv_cr - 0.5
    in_cube = ((sub_x > -0.5) & (sub_x < 3.5) & (sub_y > -0.5)
               & (sub_y < 3.5) & (sub_z > -0.5) & (sub_z < 3.5))

    mag2 = ggx * ggx + ggy * ggy + ggz * ggz
    okv = in_cube & (mag2 >= EPS10)
    mg = jnp.sqrt(mag2)

    # containing face = argmax of 20 normal dots (see module docstring)
    best = nf[0, 0] * ggx + nf[0, 1] * ggy + nf[0, 2] * ggz
    idx = jnp.zeros_like(best, jnp.int32)
    for t in range(1, 20):
        d_t = nf[t, 0] * ggx + nf[t, 1] * ggy + nf[t, 2] * ggz
        upd = d_t > best
        idx = jnp.where(upd, t, idx)
        best = jnp.maximum(best, d_t)
    alpha = jnp.where(okv, mg * (dhat / jnp.maximum(best, f32(1e-30))), 0.0)
    kt, cyx = alpha.shape

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Corner (z, yx-tile) steps whose voxels all fall outside the sphere /
    # cube contribute nothing — skip their operand build and MXU pass (the
    # crop box is ~1.9x the sphere volume, so a sizable fraction of tiles
    # is fully dead).
    @pl.when(jnp.any(okv))
    def _():
        # NOTE: building the operands directly in bf16 was measured
        # SLOWER on v5e (22.4 vs 18.6 s for the Torus both-volumes total —
        # bf16 elementwise pays conversion/tiling overhead), so the bf16
        # opt-in casts only at the dot below; the build stays f32
        od = f32
        # left operand u [Kt, 60, CYX]: row a*20+t = onehot(t) * alpha*g_a
        # (built [Kt, 3, 20, CYX] so the tiled trailing dims stay
        # (20, CYX) — the (a, t) ordering matches _face_tables' W')
        ag3 = jnp.concatenate(
            [(alpha * ggx)[:, None, :], (alpha * ggy)[:, None, :],
             (alpha * ggz)[:, None, :]], axis=1)  # [Kt, 3, CYX]
        tio = jax.lax.broadcasted_iota(jnp.int32, (kt, 20, cyx), 1)
        hit = (idx[:, None, :] == tio).astype(f32)  # [Kt, 20, CYX]
        u = (ag3[:, :, None, :] * hit[:, None, :, :]).reshape(kt, 60, cyx)

        # trilinear tents with the reference's (int) truncation quirk
        # (ix truncated toward zero, dfrac from floor; oc_sift.cpp:1184-99)
        def tent4(sub):
            i = sub.astype(jnp.int32)  # trunc, like the (int) cast
            dfrac = sub - jnp.floor(sub)
            cio = jax.lax.broadcasted_iota(jnp.int32, (kt, 4, cyx), 1)
            ib = i[:, None, :]
            fb = dfrac[:, None, :]
            return ((ib == cio).astype(f32) * (1.0 - fb)
                    + (ib == cio - 1).astype(f32) * fb)

        wx4 = tent4(sub_x)  # [Kt, 4, CYX]
        wy4 = tent4(sub_y)
        wz4 = tent4(sub_z)
        # cube weights [Kt, 64, CYX], row (cz*4+cy)*4+cx (same ordering as
        # the einsum path's cube_w reshape); built (yx)-first so the
        # trailing tile dims stay (16, CYX) — pad-free
        wyx16 = (wy4[:, :, None, :] * wx4[:, None, :, :]).reshape(
            kt, 16, cyx)
        cw = (wz4[:, :, None, :] * wyx16[:, None, :, :]).reshape(
            kt, 64, cyx)

        md = jnp.bfloat16 if bf16 else f32
        s_tile = jnp.stack(
            [jax.lax.dot_general(u[k].astype(md), cw[k].astype(md),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32)
             for k in range(kt)], axis=0)  # [Kt, 60, 64]
        out_ref[:] += s_tile


def descriptor_hist(gxw, gyw, gzw, wz, pz, pz2, wyx, px, py, pyx2, rot,
                    *, scale, kt=8, hist_bf16=False, interpret=False):
    """Accumulate the [K, 60, 64] deferred histogram S.

    gxw/gyw/gzw: [CZ, K, CYX] central-difference gradients of the crop
    voxels (w.r.t. physical coordinates; z LEADING so the per-z-slice
    blocks satisfy Mosaic's trailing-two-dims tiling rule).  wz/pz/pz2:
    [CZ, K, 1] per-z Gaussian-x-border weight, physical z offset, squared
    offset.  wyx/px/py/pyx2: [K, CYX] per-(y,x) combined weight, physical
    offsets, squared radial offset.  rot: [K, 9].  ``scale`` is the
    layer's static physical scale (sets sigma = 5 sqrt(2) scale, sphere
    radius 2 sigma, cube radius sphere/sqrt(2); oc_sift.cpp:1130-1140).
    ``kt`` must keep the [kt, CYX] table blocks 8-sublane aligned.
    """
    cz, k, cyx = gxw.shape
    if k % kt:
        kt = math.gcd(k, kt)
    sigma = 5.0 * math.sqrt(2.0) * float(scale)
    sphere_radius = 2.0 * sigma
    cube_radius = sphere_radius / math.sqrt(2.0)

    # yx tiling: the per-step u/cw intermediates are [kt, 60|64, cyx_t] —
    # cap cyx_t so they stay ~8 MB of VMEM (a full 73x73 layer-3 slice
    # blew the 16 MB scoped limit).  Pad tail voxels with ZERO weight
    # (wyx = 0 -> zero gradients -> mag2 < eps -> alpha = 0 -> zero rows).
    cyx_t = min(-(-cyx // 128) * 128, 1024)
    pad = -cyx % cyx_t
    if pad:
        gxw, gyw, gzw = (jnp.pad(a, ((0, 0), (0, 0), (0, pad)))
                         for a in (gxw, gyw, gzw))
        wyx, px, py, pyx2 = (jnp.pad(a, ((0, 0), (0, pad)))
                             for a in (wyx, px, py, pyx2))
    nyx = (cyx + pad) // cyx_t

    kernel = functools.partial(
        _desc_kernel, r2=sphere_radius * sphere_radius,
        inv_cr=1.0 / cube_radius, cr=cube_radius, bf16=hist_bf16)
    grid = (k // kt, cz, nyx)
    bs_zk = pl.BlockSpec((1, kt, cyx_t), lambda i, z, j: (z, i, j))
    bs_z1 = pl.BlockSpec((1, kt, 1), lambda i, z, j: (z, i, 0))
    bs_yx = pl.BlockSpec((kt, cyx_t), lambda i, z, j: (i, j))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bs_zk, bs_zk, bs_zk, bs_z1, bs_z1, bs_z1,
                  bs_yx, bs_yx, bs_yx, bs_yx,
                  pl.BlockSpec((kt, 9), lambda i, z, j: (i, 0))],
        out_specs=pl.BlockSpec((kt, 60, 64), lambda i, z, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((k, 60, 64), jnp.float32),
        interpret=interpret,
    )(gxw, gyw, gzw, wz, pz, pz2, wyx, px, py, pyx2, rot)


@functools.partial(jax.jit, static_argnames=("crop", "scale", "unit_xyz",
                                             "hist_bf16", "interpret"))
def construct_descriptor_fused(
    vol: jnp.ndarray,   # [dz, dy, dx] Gaussian layer
    xi: jnp.ndarray,    # [K] int32 keypoint coords
    yi: jnp.ndarray,
    zi: jnp.ndarray,
    rot: jnp.ndarray,   # [K, 3, 3]
    truncate: jnp.ndarray,
    *,
    crop,               # static (caz, cay, cax) active radii
    scale: float,       # static layer scale
    unit_xyz,           # static (ux, uy, uz)
    hist_bf16: bool = False,
    interpret: bool = False,
):
    """[K, 768] descriptors through the fused kernel.

    Gathers (2 ca + 3)^3 windows (crop + 1-voxel gradient margin) with
    edge-clamped starts, builds the per-axis weight/offset tables from the
    ABSOLUTE voxel coordinates (so off-center keypoints in clamped windows
    are handled exactly), runs the kernel, folds W' and applies the
    reference's normalize -> truncate -> renormalize (oc_sift.cpp:1217-1248).
    """
    f32 = jnp.float32
    dz, dy, dx = vol.shape
    ux, uy, uz = unit_xyz
    caz, cay, cax = crop
    cz_n, cy_n, cx_n = 2 * caz + 1, 2 * cay + 1, 2 * cax + 1
    swz, swy, swx = cz_n + 2, cy_n + 2, cx_n + 2
    k = xi.shape[0]

    x0 = jnp.clip(xi - (cax + 1), 0, dx - swx)
    y0 = jnp.clip(yi - (cay + 1), 0, dy - swy)
    z0 = jnp.clip(zi - (caz + 1), 0, dz - swz)

    def one(z, y, x):
        return jax.lax.dynamic_slice(vol, (z, y, x), (swz, swy, swx))

    win = jax.vmap(one)(z0, y0, x0)  # [K, swz, swy, swx]
    cyx = cy_n * cx_n
    # z-leading layout (see descriptor_hist)
    gxw = jnp.moveaxis(
        ((win[:, 1:-1, 1:-1, 2:] - win[:, 1:-1, 1:-1, :-2])
         * f32(0.5 / ux)).reshape(k, cz_n, cyx), 1, 0)
    gyw = jnp.moveaxis(
        ((win[:, 1:-1, 2:, 1:-1] - win[:, 1:-1, :-2, 1:-1])
         * f32(0.5 / uy)).reshape(k, cz_n, cyx), 1, 0)
    gzw = jnp.moveaxis(
        ((win[:, 2:, 1:-1, 1:-1] - win[:, :-2, 1:-1, 1:-1])
         * f32(0.5 / uz)).reshape(k, cz_n, cyx), 1, 0)

    sigma = 5.0 * math.sqrt(2.0) * float(scale)
    inv_2s2 = f32(-0.5 / (sigma * sigma))
    border = 1  # IMG_BORDER, oc_sift.h:22

    def axis_tables(c0, ci, n, unit, dim):
        coords = c0[:, None] + 1 + jnp.arange(n)[None, :]  # crop voxel coords
        p = (coords - ci[:, None]).astype(f32) * f32(unit)
        inb = (coords >= border) & (coords <= dim - 1 - border)
        wgt = jnp.exp(inv_2s2 * p * p) * inb
        return p, p * p, wgt

    pzt, pz2t, wzt = axis_tables(z0, zi, cz_n, uz, dz)
    pyt, py2t, wyt = axis_tables(y0, yi, cy_n, uy, dy)
    pxt, px2t, wxt = axis_tables(x0, xi, cx_n, ux, dx)
    wyx = (wyt[:, :, None] * wxt[:, None, :]).reshape(k, cyx)
    pyx2 = (py2t[:, :, None] + px2t[:, None, :]).reshape(k, cyx)
    pxf = jnp.broadcast_to(pxt[:, None, :], (k, cy_n, cx_n)).reshape(k, cyx)
    pyf = jnp.broadcast_to(pyt[:, :, None], (k, cy_n, cx_n)).reshape(k, cyx)
    ztab = lambda a: a.T[:, :, None]  # [K, CZ] -> [CZ, K, 1]

    s_hist = descriptor_hist(
        gxw, gyw, gzw, ztab(wzt), ztab(pzt), ztab(pz2t), wyx, pxf, pyf,
        pyx2, rot.reshape(k, 9), scale=scale, hist_bf16=hist_bf16,
        interpret=interpret)

    _, _, w_fold = _face_tables()
    desc = jnp.einsum("ja,kac->kjc", jnp.asarray(w_fold), s_hist,
                      preferred_element_type=f32)
    desc = desc.transpose(0, 2, 1).reshape(k, 768)

    eps = jnp.float32(np.finfo(np.float32).eps)
    desc = desc / (jnp.sqrt(jnp.sum(desc * desc, -1, keepdims=True)) + eps)
    desc = jnp.minimum(desc, truncate)
    desc = desc / (jnp.sqrt(jnp.sum(desc * desc, -1, keepdims=True)) + eps)
    return desc
