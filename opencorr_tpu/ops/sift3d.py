"""3D SIFT device kernels (implementation of B. Rister et al., IEEE TIP 26(10)
4900-4910, following the reference's from-scratch version in ``oc_sift.cpp``).

Pipeline (reference lines in parentheses):

* Gaussian pyramid: octave count ``floor(log2(min_dim) - log2(min_dimension))+1``,
  kappa = 2^(1/n_layers), per-layer anisotropic blur honoring voxel physical
  units (createGaussianPyramid :676-754), separable mirror-padded blur
  (gaussianBlur :365-548), stride-2 downsampling (:549-562).
* DoG pyramid + per-layer max |DoG| (:756-793).
* Extrema: strict max/min over 6 spatial + 2 scale neighbors with threshold
  alpha * max_abs (detectExtrema :795-847).
* Orientation: eigen-decomposition of the Gaussian-weighted gradient structure
  tensor in a spherical window (r = 3 * 1.5 * scale), rejecting weak gradients
  and ambiguous eigenvalues/angles, yielding a 3x3 rotation per keypoint
  (assignOrientation :849-1050).
* Descriptor: 768-d = 4x4x4 spatial cubes x 12 icosahedron vertex bins;
  gradients rotated into the keypoint frame, soft-assigned barycentrically
  onto the intersected icosahedron triangle, trilinearly over the 8 adjacent
  cubes (constructDescriptor :1051-1250); truncate + renormalize.

TPU design: whole-volume pyramid ops; keypoints batched per (octave, layer)
group with static window sizes (the voxel-space window radius is
octave-independent because scale and voxel pitch both double per octave);
descriptor accumulation is one scatter-add of the 24 static contributions per
voxel; matching is a [N1,768]x[768,N2] matmul + top-2.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.precision import highest_precision

IMG_BORDER = 1  # oc_sift.h:22

# Icosahedron triangle tiles (oc_sift.cpp:209-232): vertex indices and vertex
# coordinates per triangle.
_T = 0.5257311
_S = 0.8506508
ICOSA_TRIPLETS = np.array(
    [
        [1, 0, 8], [8, 0, 4], [4, 0, 5], [5, 0, 9], [9, 0, 1],
        [6, 1, 8], [6, 8, 10], [10, 8, 4], [10, 4, 2], [2, 4, 5],
        [2, 5, 11], [11, 5, 9], [11, 9, 7], [7, 9, 1], [7, 1, 6],
        [6, 3, 7], [7, 3, 11], [11, 3, 2], [2, 3, 10], [10, 3, 6],
    ],
    np.int32,
)
ICOSA_VERTICES = np.array(
    [
        [0, _T, _S], [0, -_T, _S], [0, _T, -_S], [0, -_T, -_S],
        [_T, _S, 0], [-_T, _S, 0], [_T, -_S, 0], [-_T, -_S, 0],
        [_S, 0, _T], [-_S, 0, _T], [_S, 0, -_T], [-_S, 0, -_T],
    ],
    np.float32,
)


def _blur_body(vol: jnp.ndarray, sigma: float, unit_xyz) -> jnp.ndarray:
    """Traced body of the separable mirror-extension blur (oc_sift.cpp:
    365-548).  Kernel radius per axis: ceil(3 sigma) scaled by
    unit_max/unit_axis (rounded), minimum radius 1; taps exp(-0.5 (i/sigma)^2),
    normalized."""
    unit_max = max(unit_xyz)
    if sigma > 0:
        kernel_radius = max(int(math.ceil(3.0 * sigma)), 1)
    else:
        sigma = 0.0
        kernel_radius = 1

    out = vol
    for axis, unit in ((2, unit_xyz[0]), (1, unit_xyz[1]), (0, unit_xyz[2])):
        radius = kernel_radius * int(math.floor(unit_max / unit + 0.5))
        taps = np.ones(radius + 1, np.float32)
        for i in range(1, radius + 1):
            x = i / (sigma + np.finfo(np.float32).eps)
            taps[i] = math.exp(-0.5 * x * x)
            taps[0] += taps[i] * 2.0
        taps[0] = 1.0 / taps[0]
        taps[1:] *= taps[0]

        pad = [(0, 0)] * 3
        pad[axis] = (radius, radius)
        padded = jnp.pad(out, pad, mode="reflect")
        acc = taps[0] * out
        n = vol.shape[axis]
        for r in range(1, radius + 1):
            lo = jax.lax.slice_in_dim(padded, radius - r, radius - r + n, axis=axis)
            hi = jax.lax.slice_in_dim(padded, radius + r, radius + r + n, axis=axis)
            acc = acc + taps[r] * (lo + hi)
        out = acc
    return out


@functools.partial(jax.jit, static_argnames=("sigma", "unit_xyz"))
def gaussian_blur(vol: jnp.ndarray, sigma: float, unit_xyz) -> jnp.ndarray:
    """One jitted blur (host-path twin; the device pipeline uses
    ``octave_stack``)."""
    return _blur_body(vol, sigma, unit_xyz)


@functools.partial(jax.jit,
                   static_argnames=("sigmas", "unit_xyz", "downsample_to"))
def octave_stack(seed: jnp.ndarray, *, sigmas, unit_xyz, downsample_to=None):
    """ONE program per octave: optional stride-2 downsample of the seed, the
    octave's whole blur chain, every DoG layer and its max|.|.

    The per-layer program chain (6 blurs + 5 DoGs per octave) cost ~30
    dispatches per octave; through the axon tunnel a degraded session pays
    ~10-25 ms EACH, which dominated SIFT3D wall time (device compute for the
    full Torus extraction is ~0.1 s).  ``sigmas[i]`` is layer i's incremental
    blur (None for a downsampled layer 0).

    Returns (g_vols tuple, dogs tuple, max_abs tuple).
    """
    if downsample_to is not None:
        dz, dy, dx = downsample_to
        seed = seed[: 2 * dz : 2, : 2 * dy : 2, : 2 * dx : 2]
    g = []
    v = seed
    for i, s in enumerate(sigmas):
        if s is None:
            v = seed
        else:
            v = _blur_body(g[i - 1] if i else seed, s, unit_xyz)
        g.append(v)
    dogs = [g[i + 1] - g[i] for i in range(len(g) - 1)]
    max_abs = [jnp.max(jnp.abs(d)) for d in dogs]
    return tuple(g), tuple(dogs), tuple(max_abs)


def downsample(vol: jnp.ndarray, dst_shape) -> jnp.ndarray:
    """Stride-2 sampling (oc_sift.cpp:549-562)."""
    dz, dy, dx = dst_shape
    return vol[: 2 * dz : 2, : 2 * dy : 2, : 2 * dx : 2]


@jax.jit
def dog_layer(upper: jnp.ndarray, lower: jnp.ndarray):
    d = upper - lower
    return d, jnp.max(jnp.abs(d))


@jax.jit
def extrema_mask(dog_prev, dog_cur, dog_next, alpha_max_abs):
    """Strict 8-neighbor extremum mask (detectExtrema, oc_sift.cpp:795-847)."""
    v = dog_cur
    big = jnp.abs(v) >= alpha_max_abs

    def shifted(a, dz, dy, dx):
        return jnp.roll(a, (dz, dy, dx), axis=(0, 1, 2))

    neigh = [
        shifted(dog_cur, 1, 0, 0), shifted(dog_cur, -1, 0, 0),
        shifted(dog_cur, 0, 1, 0), shifted(dog_cur, 0, -1, 0),
        shifted(dog_cur, 0, 0, 1), shifted(dog_cur, 0, 0, -1),
        dog_prev, dog_next,
    ]
    gt = big
    lt = big
    for nb in neigh:
        gt = gt & (v > nb)
        lt = lt & (v < nb)
    mask = gt | lt
    # zero the 1-voxel border
    mask = mask.at[:IMG_BORDER].set(False).at[-IMG_BORDER:].set(False)
    mask = mask.at[:, :IMG_BORDER].set(False).at[:, -IMG_BORDER:].set(False)
    mask = mask.at[:, :, :IMG_BORDER].set(False).at[:, :, -IMG_BORDER:].set(False)
    return mask


def _sym_eigh_desc_3x3(a: jnp.ndarray):
    """Closed-form eigendecomposition of symmetric [..., 3, 3], eigenvalues in
    DESCENDING order with normalized eigenvectors [..., 3(vec), 3(comp)]."""
    a00 = a[..., 0, 0]
    a01 = a[..., 0, 1]
    a02 = a[..., 0, 2]
    a11 = a[..., 1, 1]
    a12 = a[..., 1, 2]
    a22 = a[..., 2, 2]
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2, 1e-30) / 6.0)
    inv_p = 1.0 / p
    b00 = (a00 - q) * inv_p
    b01 = a01 * inv_p
    b02 = a02 * inv_p
    b11 = (a11 - q) * inv_p
    b12 = a12 * inv_p
    b22 = (a22 - q) * inv_p
    detb = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    l1 = q + 2.0 * p * jnp.cos(phi)
    l3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    l2 = 3.0 * q - l1 - l3

    def eigvec(lam):
        # rows of (A - lam I); eigenvector = largest cross product of rows
        r0 = jnp.stack([a00 - lam, a01, a02], -1)
        r1 = jnp.stack([a01, a11 - lam, a12], -1)
        r2 = jnp.stack([a02, a12, a22 - lam], -1)
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        n01 = jnp.sum(c01 * c01, -1)
        n02 = jnp.sum(c02 * c02, -1)
        n12 = jnp.sum(c12 * c12, -1)
        best = jnp.argmax(jnp.stack([n01, n02, n12], -1), axis=-1)
        cands = jnp.stack([c01, c02, c12], axis=-2)  # [..., 3cand, 3]
        v = jnp.take_along_axis(cands, best[..., None, None].repeat(3, -1), -2)[..., 0, :]
        return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, -1, keepdims=True), 1e-30))

    vecs = jnp.stack([eigvec(l1), eigvec(l2), eigvec(l3)], axis=-2)
    vals = jnp.stack([l1, l2, l3], axis=-1)
    return vals, vecs


@functools.partial(jax.jit, static_argnames=())
@highest_precision
def assign_orientation(
    win: jnp.ndarray,  # [K, s, s, s] pre-gathered windows (clamped starts)
    x0: jnp.ndarray,  # [K] window start coords in the layer
    y0: jnp.ndarray,
    z0: jnp.ndarray,
    xi: jnp.ndarray,  # [K] int keypoint coords in this layer
    yi: jnp.ndarray,
    zi: jnp.ndarray,
    dims: jnp.ndarray,  # [3] (dx, dy, dz) of the layer
    scale: jnp.ndarray,  # scalar: layer scale (physical)
    units: jnp.ndarray,  # [3] voxel pitch of this layer
    grad_threshold: jnp.ndarray,
    beta: jnp.ndarray,
    gamma: jnp.ndarray,
):
    """Returns (rot[K, 3, 3] row-major as in the reference, ok[K])."""
    f32 = jnp.float32
    dx, dy, dz = dims[0], dims[1], dims[2]
    s = win.shape[1]

    og = jnp.arange(s)
    zc = (z0[:, None] + og[None, :])  # absolute coords [K, s]
    yc = (y0[:, None] + og[None, :])
    xc = (x0[:, None] + og[None, :])
    inbz = (zc >= IMG_BORDER) & (zc <= dz - 1 - IMG_BORDER)
    inby = (yc >= IMG_BORDER) & (yc <= dy - 1 - IMG_BORDER)
    inbx = (xc >= IMG_BORDER) & (xc <= dx - 1 - IMG_BORDER)

    sigma_w = 1.5 * scale
    wrad = 3.0 * sigma_w
    # physical offsets from the keypoint (voxel offset * unit)
    px = (xc.astype(f32) - xi.astype(f32)[:, None]) * units[0]  # [K, s]
    py = (yc.astype(f32) - yi.astype(f32)[:, None]) * units[1]
    pz = (zc.astype(f32) - zi.astype(f32)[:, None]) * units[2]
    # Separable Gaussian: exp(-0.5 d2/s^2) = ex*ey*ez from per-AXIS tables
    # (O(s) exps instead of O(s^3) — the exp/sqrt per voxel dominated this
    # stage at CT scale); the sphere test runs on d2, no sqrt; the border
    # masks fold into the axis tables.
    inv2s2 = -0.5 / (sigma_w * sigma_w)
    ex = jnp.exp(inv2s2 * px * px) * inbx
    ey = jnp.exp(inv2s2 * py * py) * inby
    ez = jnp.exp(inv2s2 * pz * pz) * inbz

    # central-difference gradients w.r.t. physical coordinates
    # (0.5 (I[k+1] - I[k-1]), oc_sift.cpp:905-907; note _sh(+1)[x] = win[x-1],
    # so the POSITIVE-side sample comes from the -1 shift — round-4 had the
    # operands swapped, negating every gradient: self-consistent for
    # matching, but the reference's orientation/descriptor sign convention)
    gxv = 0.5 * (_sh(win, 0, 0, -1) - _sh(win, 0, 0, 1)) / units[0]
    gyv = 0.5 * (_sh(win, 0, -1, 0) - _sh(win, 0, 1, 0)) / units[1]
    gzv = 0.5 * (_sh(win, -1, 0, 0) - _sh(win, 1, 0, 0)) / units[2]

    # The weighted reductions run on a [K, s, s^2] layout: a trailing dim
    # of s (33/41) pads to 128 lanes (~4x wasted VPU/HBM); s^2 pads ~6%.
    k = win.shape[0]
    cyx = s * s
    fl = lambda a: a.reshape(k, s, cyx)
    gxf, gyf, gzf = fl(gxv), fl(gyv), fl(gzv)
    wyx = (ey[:, :, None] * ex[:, None, :]).reshape(k, cyx)
    pyx2 = (py[:, :, None] ** 2 + px[:, None, :] ** 2).reshape(k, cyx)
    sphere = (pz[:, :, None] ** 2 + pyx2[:, None, :]) <= wrad * wrad
    weight = ez[:, :, None] * wyx[:, None, :] * sphere  # [K, s, s^2]

    axes = (1, 2)
    st = jnp.stack(
        [
            jnp.stack([jnp.sum(gxf * gxf * weight, axes),
                       jnp.sum(gxf * gyf * weight, axes),
                       jnp.sum(gxf * gzf * weight, axes)], -1),
            jnp.stack([jnp.sum(gxf * gyf * weight, axes),
                       jnp.sum(gyf * gyf * weight, axes),
                       jnp.sum(gyf * gzf * weight, axes)], -1),
            jnp.stack([jnp.sum(gxf * gzf * weight, axes),
                       jnp.sum(gyf * gzf * weight, axes),
                       jnp.sum(gzf * gzf * weight, axes)], -1),
        ],
        axis=-2,
    )  # [K, 3, 3]
    d_vec = jnp.stack(
        [jnp.sum(gxf * weight, axes), jnp.sum(gyf * weight, axes),
         jnp.sum(gzf * weight, axes)], -1)  # [K, 3]

    ok = jnp.sum(d_vec * d_vec, -1) >= grad_threshold

    vals, vecs = _sym_eigh_desc_3x3(st)
    l1, l2, l3 = vals[:, 0], vals[:, 1], vals[:, 2]
    eps = jnp.float32(np.finfo(np.float32).eps)
    ok = ok & ~(
        (l2 / l1 > beta) | (l3 / l2 > beta)
        | (jnp.abs(l1 - l2) < eps) | (jnp.abs(l2 - l3) < eps)
        | (jnp.abs(l3 - l1) < eps)
    )

    dn = jnp.sqrt(jnp.maximum(jnp.sum(d_vec * d_vec, -1), 1e-30))
    q1 = vecs[:, 0]
    q2 = vecs[:, 1]
    qd1 = jnp.sum(q1 * d_vec, -1)
    qd2 = jnp.sum(q2 * d_vec, -1)
    cos1 = jnp.abs(qd1) / dn  # |q| = 1
    cos2 = jnp.abs(qd2) / dn
    cos_phi = jnp.minimum(cos1, cos2)
    ok = ok & (cos_phi >= gamma)
    r1 = q1 * jnp.where(qd1 > 0, 1.0, -1.0)[:, None]
    r2 = q2 * jnp.where(qd2 > 0, 1.0, -1.0)[:, None]
    rc = jnp.cross(r1, r2)
    rot = jnp.stack([r1, r2, rc], axis=-2)  # rows (oc_sift.cpp:1015-1027)
    return rot, ok


def _sh(win, dz, dy, dx):
    return jnp.roll(win, (dz, dy, dx), axis=(1, 2, 3))


def _sphere_crop(r, scale, unit_xyz):
    """Static per-axis active radii of the descriptor sphere: window
    voxels with |offset_axis| * unit > 2 sigma = 10 sqrt(2) scale have
    dist > sphere_radius and contribute exactly zero (+1 voxel float
    safety).  The window radius r is bucketed to multiples of 8, so this
    trims the dead shell (~40% of the cube at Torus scales)."""
    rad = 2.0 * 5.0 * math.sqrt(2.0) * float(scale)
    return tuple(min(r, int(rad / u) + 1) for u in
                 (unit_xyz[2], unit_xyz[1], unit_xyz[0]))


@functools.partial(jax.jit, static_argnames=("parts", "crop", "hist_bf16"))
@highest_precision
def construct_descriptor(
    win: jnp.ndarray,  # [K, s, s, s]
    x0: jnp.ndarray,
    y0: jnp.ndarray,
    z0: jnp.ndarray,
    xi: jnp.ndarray,
    yi: jnp.ndarray,
    zi: jnp.ndarray,
    dims: jnp.ndarray,
    rot: jnp.ndarray,  # [K, 3, 3]
    scale: jnp.ndarray,
    units: jnp.ndarray,
    truncate: jnp.ndarray,
    parts: str = "full",
    crop=None,
    hist_bf16: bool = False,
):
    """Returns [K, 768] descriptors (constructDescriptor, oc_sift.cpp:1051-1250).

    ``parts`` (bench-only knob, bench_sift3d_stages.py): "nobary" replaces
    the 20-triangle barycentric search with a fixed one-hot; "noein"
    replaces the [vs,64]x[vs,12] histogram contraction with a cheap
    reduce — each isolates one term of the per-voxel cost.

    ``crop``: optional static (cz, cy, cx) active radii — the window is
    bucketed to multiples of 8 (r_desc) but only voxels within the
    descriptor sphere (dist <= 2 sigma) contribute; cropping the dead
    shell statically removes ~40% of the per-voxel work with identical
    results up to f32 summation order (the callers compute the bound from
    the STATIC layer scale; every cropped voxel has dist > sphere_radius
    and thus contributed exactly zero).  The crop box is centered on the
    KEYPOINT's position inside the window (xi - x0, ...), not the window
    center: near-border keypoints sit off-center in their edge-clamped
    window, and a fixed center crop would discard in-sphere, in-volume
    voxels with nonzero weight (advisor round 4).

    ``hist_bf16``: run the histogram contraction with bf16 operands (f32
    accumulate) — ~2x MXU rate, ~0.4%-per-product rounding that averages
    out over the ~1e5-voxel sums.  Default False: the reference's
    descriptors are f32 (CLAUDE.md numerics convention), so bf16 is an
    explicit opt-in (SIFT3D(hist_bf16=True))."""
    f32 = jnp.float32
    k = xi.shape[0]
    s = win.shape[1]
    v = s * s * s
    dx, dy, dz = dims[0], dims[1], dims[2]

    sqrt2 = jnp.sqrt(jnp.float32(2.0))
    sigma = 5.0 * sqrt2 * scale
    sphere_radius = 2.0 * sigma
    cube_radius = sphere_radius / sqrt2

    og = jnp.arange(s)
    zc = z0[:, None] + og[None, :]
    yc = y0[:, None] + og[None, :]
    xc = x0[:, None] + og[None, :]
    inb = (
        ((zc >= IMG_BORDER) & (zc <= dz - 1 - IMG_BORDER))[:, :, None, None]
        & ((yc >= IMG_BORDER) & (yc <= dy - 1 - IMG_BORDER))[:, None, :, None]
        & ((xc >= IMG_BORDER) & (xc <= dx - 1 - IMG_BORDER))[:, None, None, :]
    )

    px = (xc.astype(f32) - xi.astype(f32)[:, None]) * units[0]
    py = (yc.astype(f32) - yi.astype(f32)[:, None]) * units[1]
    pz = (zc.astype(f32) - zi.astype(f32)[:, None]) * units[2]
    pxb = px[:, None, None, :]
    pyb = py[:, None, :, None]
    pzb = pz[:, :, None, None]
    dist = jnp.sqrt(pxb**2 + pyb**2 + pzb**2)
    valid = (dist <= sphere_radius) & inb

    # rotate local coordinates into the keypoint frame
    def rotate(rmat, ax, ay, az):
        rx = rmat[:, 0, 0, None, None, None] * ax + rmat[:, 0, 1, None, None, None] * ay + rmat[:, 0, 2, None, None, None] * az
        ry = rmat[:, 1, 0, None, None, None] * ax + rmat[:, 1, 1, None, None, None] * ay + rmat[:, 1, 2, None, None, None] * az
        rz = rmat[:, 2, 0, None, None, None] * ax + rmat[:, 2, 1, None, None, None] * ay + rmat[:, 2, 2, None, None, None] * az
        return rx, ry, rz

    rx, ry, rz = rotate(rot, pxb + 0 * dist, pyb + 0 * dist, pzb + 0 * dist)
    sub_x = 2.0 * (rx + cube_radius) / cube_radius - 0.5
    sub_y = 2.0 * (ry + cube_radius) / cube_radius - 0.5
    sub_z = 2.0 * (rz + cube_radius) / cube_radius - 0.5
    valid = valid & (sub_x > -0.5) & (sub_x < 3.5) & (sub_y > -0.5) \
        & (sub_y < 3.5) & (sub_z > -0.5) & (sub_z < 3.5)

    weight = jnp.exp(-0.5 * (dist / sigma) ** 2)
    # same +0.5 (I[k+1] - I[k-1]) convention as oc_sift.cpp:1131-1133
    # (see assign_orientation for the _sh sign note)
    gxv = 0.5 * (_sh(win, 0, 0, -1) - _sh(win, 0, 0, 1)) / units[0] * weight
    gyv = 0.5 * (_sh(win, 0, -1, 0) - _sh(win, 0, 1, 0)) / units[1] * weight
    gzv = 0.5 * (_sh(win, -1, 0, 0) - _sh(win, 1, 0, 0)) / units[2] * weight
    ggx, ggy, ggz = rotate(rot, gxv, gyv, gzv)

    if crop is not None:
        caz, cay, cax = crop
        csz = (2 * caz + 1, 2 * cay + 1, 2 * cax + 1)
        # Per-keypoint crop start, centered on the keypoint WITHIN the
        # window and clipped into it.  Coverage: an in-volume voxel with
        # nonzero weight has per-axis offset |o| <= ca from the keypoint
        # and window coord >= 0, and the clipped [c0, c0+2ca] box contains
        # every such coord (c0 = kp - ca when unclipped; when clipped the
        # keypoint is within ca of the window edge and the box reaches it).
        cz0 = jnp.clip(zi - z0 - caz, 0, s - csz[0])
        cy0 = jnp.clip(yi - y0 - cay, 0, s - csz[1])
        cx0 = jnp.clip(xi - x0 - cax, 0, s - csz[2])

        def sl(a):
            return jax.vmap(lambda w, cz, cy, cx: jax.lax.dynamic_slice(
                w, (cz, cy, cx), csz))(a, cz0, cy0, cx0)

        ggx, ggy, ggz = sl(ggx), sl(ggy), sl(ggz)
        sub_x, sub_y, sub_z = sl(sub_x), sl(sub_y), sl(sub_z)
        valid = sl(valid)
        v = csz[0] * csz[1] * csz[2]

    # --- slab-scanned histogram ---------------------------------------------
    # Everything per-voxel from here on (gradient magnitude, icosahedron
    # barycentric search, trilinear tent weights, the [64, vs] x [vs, 12]
    # MXU contraction) runs per voxel-SLAB inside one lax.scan, so the
    # [K, V] working tensors live in VMEM per slab instead of HBM:
    #
    # * the original per-voxel scatter-add serialized on conflicting bins
    #   (~80 ms PER KEYPOINT at octave-0 CT scale) and a full-cap descriptor
    #   program ran long enough to kill the TPU worker;
    # * a whole-V barycentric loop rewrote five [K, V] accumulators per
    #   triangle (~8 GB of HBM traffic per 64-keypoint chunk);
    # * a whole-V [K, V, 64] cube-weight operand would be GBs.
    #
    # The 8-corner trilinear spread is a per-axis tent kernel over the 4
    # cube bins, so the histogram is
    #   desc[cube, vertex] = sum_v (tent_z (x) tent_y (x) tent_x)[v, cube]
    #                              * (mag * sum_j bary_j * onehot12(vidx_j))
    # with the tent construction reproducing the reference's (int)
    # truncation quirk exactly (ix truncated, dxw from floor;
    # oc_sift.cpp:1184-1199).  Only six [K, V] f32 flats (rotated weighted
    # gradients + rotated sub-coordinates) and one validity mask are
    # materialized between the rank-4 stage and the scan.
    eps10 = jnp.float32(np.finfo(np.float32).eps * 10.0)
    tol = -eps10
    verts = ICOSA_VERTICES
    tri = ICOSA_TRIPLETS

    # slab size: A/B'd on hardware — 16384 measured 24.8 s/pass vs 22.1 s
    # at 4096 (bigger slabs spill VMEM; smaller ones pay step overhead)
    vs = min(4096, v)
    pad_v = -v % vs
    nv = (v + pad_v) // vs

    def _slab_view(a, fill=0):
        a = a.reshape(k, v)
        a = jnp.pad(a, ((0, 0), (0, pad_v)), constant_values=fill)
        return a.reshape(k, nv, vs).transpose(1, 0, 2)  # [nv, K, vs]

    slabs = tuple(_slab_view(a) for a in (
        ggx, ggy, ggz, sub_x, sub_y, sub_z)) + (_slab_view(valid, False),)
    a4 = jnp.arange(4, dtype=f32)
    j12 = jnp.arange(12, dtype=f32)

    def body(acc, xs):
        gx_f, gy_f, gz_f, sxf, syf, szf, ok_in = xs
        mag2 = gx_f * gx_f + gy_f * gy_f + gz_f * gz_f
        okv = ok_in & (mag2 >= eps10)
        mg = jnp.sqrt(jnp.maximum(mag2, 1e-30))

        # icosahedron triangle search (cartisan2Barycentric, :579-624);
        # the first-matching triangle's barycentric coordinates fold into
        # per-vertex weights vw0 directly (static one-hot rows per triangle)
        found = jnp.zeros_like(mag2, bool)
        tsel = jnp.zeros_like(mag2, jnp.int32)
        b0 = jnp.zeros_like(mag2)
        b1 = jnp.zeros_like(mag2)
        b2 = jnp.zeros_like(mag2)
        tri_range = () if parts == "nobary" else range(20)
        if parts == "nobary":
            found = found | True
            b0 = b0 + 1.0
        for t in tri_range:
            v1, v2, v3 = verts[tri[t, 0]], verts[tri[t, 1]], verts[tri[t, 2]]
            e1 = v2 - v1
            e2 = v3 - v1
            tv = -v1
            qv = np.cross(tv, e1).astype(np.float32)
            qe2 = float(np.dot(qv, e2))
            p0 = gy_f * e2[2] - gz_f * e2[1]
            p1 = gz_f * e2[0] - gx_f * e2[2]
            p2 = gx_f * e2[1] - gy_f * e2[0]
            det = e1[0] * p0 + e1[1] * p1 + e1[2] * p2
            det_ok = jnp.abs(det) >= eps10
            det_inv = 1.0 / jnp.where(det_ok, det, 1.0)
            bz_t = det_inv * (gx_f * qv[0] + gy_f * qv[1] + gz_f * qv[2])
            by_t = det_inv * (p0 * tv[0] + p1 * tv[1] + p2 * tv[2])
            bx_t = 1.0 - by_t - bz_t
            kk = det_inv * qe2
            ok_t = det_ok & (kk >= 0) & (bx_t > tol) & (by_t > tol) & (bz_t > tol)
            # residual check (oc_sift.cpp:615-620)
            r0 = kk * gx_f - (bx_t * v1[0] + by_t * v2[0] + bz_t * v3[0])
            r1 = kk * gy_f - (bx_t * v1[1] + by_t * v2[1] + bz_t * v3[1])
            r2 = kk * gz_f - (bx_t * v1[2] + by_t * v2[2] + bz_t * v3[2])
            ok_t = ok_t & (r0 * r0 + r1 * r1 + r2 * r2 <= eps10 * eps10)
            take_t = ok_t & ~found
            tsel = jnp.where(take_t, t, tsel)
            b0 = jnp.where(take_t, bx_t, b0)
            b1 = jnp.where(take_t, by_t, b1)
            b2 = jnp.where(take_t, bz_t, b2)
            found = found | ok_t
        okv = okv & found
        mgf = mg * okv
        # the selected triangle's vertex ids (static tri table folded into
        # 20 int compares), then the 12-bin weights built ONCE — keeping
        # the 12-wide one-hot out of the 20-triangle loop halves its cost
        id0 = jnp.zeros_like(tsel)
        id1 = jnp.zeros_like(tsel)
        id2 = jnp.zeros_like(tsel)
        for t in range(0 if parts == "nobary" else 20):
            hit = tsel == t
            id0 = jnp.where(hit, int(tri[t, 0]), id0)
            id1 = jnp.where(hit, int(tri[t, 1]), id1)
            id2 = jnp.where(hit, int(tri[t, 2]), id2)
        i12 = jnp.arange(12, dtype=jnp.int32)
        vw0 = ((i12 == id0[..., None]) * b0[..., None]
               + (i12 == id1[..., None]) * b1[..., None]
               + (i12 == id2[..., None]) * b2[..., None])

        # trilinear tents ((int) truncation, oc_sift.cpp:1184-1186)
        def tent(sub):
            i = sub.astype(jnp.int32).astype(f32)
            dfrac = sub - jnp.floor(sub)
            return ((a4 == i[..., None]) * (1.0 - dfrac[..., None])
                    + (a4 == i[..., None] + 1.0) * dfrac[..., None])

        wx = tent(sxf)  # [K, vs, 4]
        wy = tent(syf)
        wz = tent(szf)
        cube_w = (wz[:, :, :, None, None] * wy[:, :, None, :, None]
                  * wx[:, :, None, None, :]).reshape(k, vs, 64)
        vert_w = vw0 * mgf[..., None]  # [K, vs, 12]
        if parts == "noein":
            cheap = (jnp.sum(cube_w, 1)[:, None, :]
                     + jnp.sum(vert_w, 1)[:, :, None])
            return acc + cheap * 1e-20, None
        # operand dtype: f32 by default (reference parity); bf16 opt-in
        # (see docstring)
        hd = jnp.bfloat16 if hist_bf16 else f32
        return acc + jnp.einsum("kvj,kvc->kjc", vert_w.astype(hd),
                                cube_w.astype(hd),
                                preferred_element_type=f32), None

    desc, _ = jax.lax.scan(body, jnp.zeros((k, 12, 64), f32), slabs)
    desc = desc.transpose(0, 2, 1).reshape(k, 768)

    # normalize -> truncate -> normalize (oc_sift.cpp:1217-1248)
    eps = jnp.float32(np.finfo(np.float32).eps)
    desc = desc / (jnp.sqrt(jnp.sum(desc * desc, -1, keepdims=True)) + eps)
    desc = jnp.minimum(desc, truncate)
    desc = desc / (jnp.sqrt(jnp.sum(desc * desc, -1, keepdims=True)) + eps)
    return desc


# --- fully-device per-layer pipeline (no host syncs between layers) ---------

def _pow2_chunk(k_cap: int, s: int, budget_bytes: int = 1 << 29) -> int:
    """Largest power-of-2 chunk with ~12 live [chunk, s^3] f32 buffers under
    the budget; k_cap (a power-of-2 multiple of 2048) stays divisible."""
    c = max(budget_bytes // (s ** 3 * 4 * 12), 8)
    p = 1 << (c.bit_length() - 1)
    return int(min(p, 2048, k_cap))


@functools.partial(jax.jit, static_argnames=("k_cap",))
def extrema_compact(dog_prev, dog_cur, dog_next, alpha_max_abs, *, k_cap):
    """Extremum mask -> first k_cap candidate coordinates in scan order
    (replaces the host np.nonzero sync of the host path)."""
    from .sift2d import _compact

    mask = extrema_mask(dog_prev, dog_cur, dog_next, alpha_max_abs)
    idx, ok = _compact(mask.reshape(-1), k_cap)
    dz, dy, dx = dog_cur.shape
    z = (idx // (dy * dx)).astype(jnp.int32)
    rem = idx % (dy * dx)
    y = (rem // dx).astype(jnp.int32)
    x = (rem % dx).astype(jnp.int32)
    return x, y, z, ok


def _gather_windows_3d(vol, xi, yi, zi, r):
    """[C, s, s, s] windows with edge-clamped starts (host-path semantics)."""
    s = 2 * r + 1
    dz, dy, dx = vol.shape
    x0 = jnp.clip(xi - r, 0, dx - s)
    y0 = jnp.clip(yi - r, 0, dy - s)
    z0 = jnp.clip(zi - r, 0, dz - s)

    def one(z, y, x):
        return jax.lax.dynamic_slice(vol, (z, y, x), (s, s, s))

    return jax.vmap(one)(z0, y0, x0), x0, y0, z0


@functools.partial(jax.jit, static_argnames=("r", "chunk"))
def orient_keypoints(vol, xi, yi, zi, ok_in, scale, units, grad_threshold,
                     beta, gamma, *, r, chunk):
    """Device window gather + assign_orientation, streamed in lax.map chunks.
    Candidates are front-compacted (extrema_compact), so all-padding chunks
    skip the gather+histogram entirely via lax.cond — at Torus scale the
    static k_cap is far above the real extremum count and the skipped
    chunks dominate.  Returns (rot [K, 3, 3], ok [K])."""
    dz, dy, dx = vol.shape
    dims = jnp.array([dx, dy, dz], jnp.int32)
    nch = max(xi.shape[0] // chunk, 1)
    ch = lambda a: a.reshape(nch, -1)

    def body(args):
        xc, yc, zc, okc = args

        def live(_):
            win, x0, y0, z0 = _gather_windows_3d(vol, xc, yc, zc, r)
            return assign_orientation(win, x0, y0, z0, xc, yc, zc, dims,
                                      scale, units, grad_threshold, beta,
                                      gamma)

        def dead(_):
            c = xc.shape[0]
            return (jnp.zeros((c, 3, 3), jnp.float32), jnp.zeros((c,), bool))

        return jax.lax.cond(jnp.any(okc), live, dead, None)

    rot, ok = jax.lax.map(body, (ch(xi), ch(yi), ch(zi), ch(ok_in)))
    return rot.reshape(-1, 3, 3), ok.reshape(-1)


@functools.partial(jax.jit,
                   static_argnames=("r", "chunk", "parts", "crop",
                                    "hist_bf16"))
def describe_keypoints(vol, xi, yi, zi, ok_in, rot, scale, units, truncate, *,
                       r, chunk, parts="full", crop=None, hist_bf16=False):
    """Device window gather + construct_descriptor, streamed in chunks.
    All-padding chunks (front-compacted survivors, see orient_keypoints)
    skip the descriptor pipeline via lax.cond.  Returns desc [K, 768]."""
    dz, dy, dx = vol.shape
    dims = jnp.array([dx, dy, dz], jnp.int32)
    nch = max(xi.shape[0] // chunk, 1)
    ch = lambda a: a.reshape(nch, -1, *a.shape[1:])

    def body(args):
        xc, yc, zc, okc, rc = args

        def live(_):
            win, x0, y0, z0 = _gather_windows_3d(vol, xc, yc, zc, r)
            return construct_descriptor(win, x0, y0, z0, xc, yc, zc, dims,
                                        rc, scale, units, truncate,
                                        parts=parts, crop=crop,
                                        hist_bf16=hist_bf16)

        def dead(_):
            return jnp.zeros((xc.shape[0], 768), jnp.float32)

        return jax.lax.cond(jnp.any(okc), live, dead, None)

    desc = jax.lax.map(body, (ch(xi), ch(yi), ch(zi), ch(ok_in), ch(rot)))
    return desc.reshape(-1, 768)


@functools.partial(jax.jit,
                   static_argnames=("crop", "scale", "unit_xyz", "chunk",
                                    "hist_bf16", "interpret"))
def describe_keypoints_fused(vol, xi, yi, zi, ok_in, rot, truncate, *,
                             crop, scale, unit_xyz, chunk,
                             hist_bf16=False, interpret=False):
    """Chunked driver for the fused Pallas descriptor kernel
    (ops/pallas_desc.construct_descriptor_fused): same cond-skip chunking
    as describe_keypoints, ~f32-ulp-identical output (3e-8 measured vs the
    einsum path), one MXU row per voxel instead of two plus ~1.5 TB of HBM
    intermediates at Torus scale."""
    from . import pallas_desc

    nch = max(xi.shape[0] // chunk, 1)
    ch = lambda a: a.reshape(nch, -1, *a.shape[1:])

    def body(args):
        xc, yc, zc, okc, rc = args

        def live(_):
            return pallas_desc.construct_descriptor_fused(
                vol, xc, yc, zc, rc, truncate, crop=crop, scale=scale,
                unit_xyz=unit_xyz, hist_bf16=hist_bf16,
                interpret=interpret)

        def dead(_):
            return jnp.zeros((xc.shape[0], 768), jnp.float32)

        return jax.lax.cond(jnp.any(okc), live, dead, None)

    desc = jax.lax.map(body, (ch(xi), ch(yi), ch(zi), ch(ok_in), ch(rot)))
    return desc.reshape(-1, 768)


@functools.partial(jax.jit, static_argnames=(
    "sigmas", "unit_xyz", "downsample_to", "layer_params", "seed_layer",
    "hist_bf16"))
def octave_features(
    seed: jnp.ndarray,
    alpha: jnp.ndarray,
    grad_threshold: jnp.ndarray,
    beta: jnp.ndarray,
    gamma: jnp.ndarray,
    truncate: jnp.ndarray,
    *,
    sigmas,
    unit_xyz,
    downsample_to,
    layer_params,
    seed_layer: int,
    hist_bf16: bool = False,
):
    """An octave's ENTIRE feature path as one program: downsample + blur
    chain + DoGs + per-layer extrema compaction, orientation, survivor
    compaction and descriptors.

    Rationale: the per-stage chain is ~30 programs per octave; after a TPU
    worker crash this sandbox's sessions dispatch at ~10-40 ms each
    (polled mode), so wall time is dispatch-count-bound — device compute for
    a full Torus-scale extraction is ~0.1 s.  One program per octave (plus
    the final assembly) makes the pipeline latency-robust; XLA's buffer
    assignment also frees each blur/DoG as soon as its last consumer runs,
    which the per-stage chain could only approximate with per-octave drains.

    ``layer_params``: tuple of (layer_index, k_e, r_orient, chunk_o, k_d,
    r_desc, chunk_d, scale) per extraction layer.  Returns
    (next_seed, ((x, y, z, ok, desc) per layer, ...)).
    """
    if downsample_to is not None:
        dz, dy, dx = downsample_to
        seed = seed[: 2 * dz : 2, : 2 * dy : 2, : 2 * dx : 2]
    g = []
    for i, s in enumerate(sigmas):
        if s is None:
            g.append(seed)
        else:
            g.append(_blur_body(g[i - 1] if i else seed, s, unit_xyz))
    dogs = [g[i + 1] - g[i] for i in range(len(g) - 1)]
    max_abs = [jnp.max(jnp.abs(d)) for d in dogs]

    units_arr = jnp.asarray(np.array(unit_xyz, np.float32))
    interp = jax.default_backend() != "tpu"
    outs = []
    for (n, k_e, r_o, chunk_o, k_d, r_d, chunk_d, scale) in layer_params:
        crop = _sphere_crop(r_d, scale, unit_xyz)
        x, y, z, ok = extrema_compact(
            dogs[n - 1], dogs[n], dogs[n + 1], alpha * max_abs[n], k_cap=k_e)
        rot, ok2 = orient_keypoints(
            g[n], x, y, z, ok, jnp.float32(scale), units_arr,
            grad_threshold, beta, gamma, r=r_o, chunk=chunk_o)
        ok = ok & ok2
        xd, yd, zd, rotd, okd = compact_gather(ok, x, y, z, rot, k_cap=k_d)
        # fused Pallas kernel whenever its crop+gradient-margin window fits
        # the layer (every production-sized layer); tiny top-octave layers
        # keep the einsum path's clamped-window semantics
        fits = all(2 * (c + 1) + 1 <= d
                   for c, d in zip(crop, g[n].shape))
        if fits:
            desc = describe_keypoints_fused(
                g[n], xd, yd, zd, okd, rotd, truncate, crop=crop,
                scale=scale, unit_xyz=unit_xyz, chunk=chunk_d,
                hist_bf16=hist_bf16, interpret=interp)
        else:
            desc = describe_keypoints(
                g[n], xd, yd, zd, okd, rotd, jnp.float32(scale), units_arr,
                truncate, r=r_d, chunk=chunk_d, crop=crop,
                hist_bf16=hist_bf16)
        outs.append((xd, yd, zd, okd, desc))
    return g[seed_layer], tuple(outs)


@functools.partial(jax.jit, static_argnames=("k_cap",))
def compact_keypoints(ok, k_cap):
    """Scan-order compaction of a validity mask: (idx [k_cap], ok [k_cap])."""
    from .sift2d import _compact

    return _compact(ok, k_cap)


@functools.partial(jax.jit, static_argnames=("k_cap",))
def compact_gather(ok, x, y, z, rot, *, k_cap):
    """Compaction + survivor gathers in one program (the eager x[idx] chain
    cost 4 extra dispatches per pyramid layer).  Returns
    (x, y, z, rot, ok) at [k_cap]."""
    from .sift2d import _compact

    idx, okc = _compact(ok, k_cap)
    return x[idx], y[idx], z[idx], rot[idx], okc


@functools.partial(jax.jit, static_argnames=("k_cap",))
def assemble_keypoints(xs, ys, zs, oks, descs, metas, *, k_cap):
    """Merge per-(octave, layer) staged keypoints into ONE fixed-size device
    table: concatenate all layers, compact the valid entries in scan order,
    and gather their records.  Replaces the host path's per-layer
    ``np.asarray`` loop (~6 transfers x 18 layers through the tunnel; at CT
    scale ~2 GB of descriptors) with a single device program whose outputs
    are the only arrays that ever leave the device.

    xs/ys/zs: per-layer int32 [k_i]; oks: bool [k_i]; descs: f32 [k_i, 768];
    metas: per-layer f32 [4] = (coord_factor 2^octave, octave, layer, scale).
    Returns (kp [k_cap, 6] f32 (x, y, z, octave, layer, scale),
    desc [k_cap, 768], ok [k_cap])."""
    from .sift2d import _compact

    rows = []
    for x, y, z, mt in zip(xs, ys, zs, metas):
        coor = jnp.stack([x.astype(jnp.float32) * mt[0],
                          y.astype(jnp.float32) * mt[0],
                          z.astype(jnp.float32) * mt[0]], axis=1)
        rows.append(jnp.concatenate(
            [coor, jnp.broadcast_to(mt[1:4], (x.shape[0], 3))], axis=1))
    kp = jnp.concatenate(rows, axis=0)
    ok = jnp.concatenate(oks, axis=0)
    desc = jnp.concatenate(descs, axis=0)
    idx, okc = _compact(ok, k_cap)
    return kp[idx], desc[idx], okc


@functools.partial(jax.jit, static_argnames=("chunk",))
@highest_precision
def match_top2(desc1, desc2, ok2, *, chunk=2048):
    """Masked 2-NN squared distances on device (FLANN twin, oc_sift.cpp:1251):
    for each row of desc1, the two smallest ||d1 - d2||^2 over VALID rows of
    desc2.  Invalid desc2 rows (padding from the fixed-size compaction) are
    +inf so they never win.  Streamed over desc1 in ``chunk`` rows to bound
    the [chunk, K2] distance tile.  Returns (d2 [K1, 2], idx [K1, 2])."""
    k1 = desc1.shape[0]
    nch = max(k1 // chunk, 1)
    tt = jnp.sum(desc2 * desc2, axis=1)[None, :]
    big = jnp.float32(3.4e38)

    def body(d1c):
        rr = jnp.sum(d1c * d1c, axis=1, keepdims=True)
        dist2 = jnp.maximum(rr + tt - 2.0 * (d1c @ desc2.T), 0.0)
        dist2 = jnp.where(ok2[None, :], dist2, big)
        neg2, idx2 = jax.lax.top_k(-dist2, 2)
        return -neg2, idx2

    d2, idx = jax.lax.map(body, desc1.reshape(nch, -1, desc1.shape[1]))
    return d2.reshape(k1, 2), idx.reshape(k1, 2)
