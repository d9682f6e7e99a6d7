"""SIFT3D feature extraction + matching on a synthetic shifted volume."""

import numpy as np
from scipy.ndimage import gaussian_filter, shift as ndshift

import opencorr_tpu as oc


def test_sift3d_integer_shift():
    rng = np.random.default_rng(3)
    D = 48
    base = gaussian_filter(
        rng.standard_normal((D + 12, D + 12, D + 12)).astype(np.float32), 1.2
    ) * 80 + 128
    ref = base[6 : 6 + D, 6 : 6 + D, 6 : 6 + D]
    tar = ndshift(base, (2.0, -3.0, 1.0), order=3)[6 : 6 + D, 6 : 6 + D, 6 : 6 + D]

    s = oc.SIFT3D()
    s.set_images(ref, tar)
    s.prepare()
    s.compute()
    assert s.ref_kp_count > 5
    assert len(s.ref_matched_kp) >= 3
    d = s.tar_matched_kp - s.ref_matched_kp
    med = np.median(d, axis=0)
    # keypoint coords are integer voxels; expect the shift to within 1 voxel
    assert abs(med[0] - 1.0) <= 1.0
    assert abs(med[1] + 3.0) <= 1.0
    assert abs(med[2] - 2.0) <= 1.0


def _pair(D=48, seed=2, shift=(2.0, -1.0, 1.5)):
    rng = np.random.default_rng(seed)
    base = gaussian_filter(
        rng.standard_normal((D + 20,) * 3).astype(np.float32), 1.5) * 50 + 128
    ref = base[10 : 10 + D, 10 : 10 + D, 10 : 10 + D]
    tar = ndshift(base, shift, order=3)[10 : 10 + D, 10 : 10 + D, 10 : 10 + D]
    return ref, tar


def test_device_path_matches_host_path():
    """pyramid_backend="device" (the CT-scale path: on-device extrema
    compaction + window gathers, no per-layer host syncs) must reproduce the
    host path's keypoints and matches exactly."""
    ref, tar = _pair()
    outs = {}
    for backend in ("host", "device"):
        s = oc.SIFT3D(pyramid_backend=backend)
        s.set_images(ref, tar)
        s.compute()
        outs[backend] = (s.ref_kp_count, s.tar_kp_count,
                         np.round(s.ref_matched_kp, 3),
                         np.round(s.tar_matched_kp, 3))
    assert outs["host"][0] == outs["device"][0]
    assert outs["host"][1] == outs["device"][1]
    hs = set(map(tuple, outs["host"][2].tolist()))
    ds = set(map(tuple, outs["device"][2].tolist()))
    assert hs == ds


def test_orientation_rejection_beta_gamma():
    """assign_orientation must reject keypoints whose structure-tensor
    eigenvalues are ambiguous (beta) or whose gradient is nearly orthogonal
    to the leading eigenvectors (gamma) — oc_sift.cpp:965-1013."""
    import jax.numpy as jnp
    from opencorr_tpu.ops import sift3d as ops3d

    rng = np.random.default_rng(0)
    s = 17
    r = (s - 1) // 2
    # isotropic random texture -> lambda1 ~= lambda2 -> beta rejection likely
    iso = rng.standard_normal((s, s, s)).astype(np.float32)
    # strongly anisotropic texture: a ramp along x with x-dependent modulation
    zz, yy, xx = np.meshgrid(*([np.arange(s, dtype=np.float32)] * 3),
                             indexing="ij")
    aniso = (np.sin(xx * 0.9) * 40 + np.sin(yy * 0.31) * 9
             + np.sin(zz * 0.17) * 3).astype(np.float32)
    wins = jnp.asarray(np.stack([iso, aniso]))
    c = jnp.asarray(np.array([r, r], np.int32))
    dims = jnp.asarray(np.array([s, s, s], np.int32))
    z0 = jnp.asarray(np.zeros(2, np.int32))
    rot, ok = ops3d.assign_orientation(
        wins, z0, z0, z0, c, c, c, dims,
        jnp.float32(1.6), jnp.asarray(np.ones(3, np.float32)),
        jnp.float32(1e-10), jnp.float32(0.9), jnp.float32(0.4))
    okn = np.asarray(ok)
    rotn = np.asarray(rot)
    assert not okn[0]  # isotropic window rejected
    assert okn[1]
    # accepted rotation must be orthonormal with det +1
    rr = rotn[1]
    np.testing.assert_allclose(rr @ rr.T, np.eye(3), atol=1e-4)
    assert np.linalg.det(rr) > 0.9


def test_bidirectional_vs_mono_many_to_one():
    """With duplicated target descriptors creating many-to-one candidates,
    monodirectional matching (with its second ratio test) must drop the
    ambiguous pairs, and bidirectional must keep only mutual best matches
    (oc_sift.cpp:1251-1489)."""
    from opencorr_tpu.models.sift3d import (_bidirectional_match,
                                            _monodirectional_match)

    rng = np.random.default_rng(1)
    n = 12
    desc = rng.uniform(0.1, 1.0, (n, 768)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    kp1 = np.arange(n * 3, dtype=np.float32).reshape(n, 3)
    # two refs share the same best target (index 0) at equal distance ->
    # ambiguous; the rest map one-to-one
    desc1 = desc.copy()
    desc1[1] = desc[0]  # ref 0 and ref 1 both look like target 0
    mk1, mk2 = _monodirectional_match(kp1, desc1, kp1, desc, 0.85)
    # ambiguous refs 0/1 must not BOTH claim target 0
    tset = [tuple(t) for t in mk2.tolist()]
    assert tset.count(tuple(kp1[0].tolist())) <= 1
    b1, b2 = _bidirectional_match(kp1, desc1, kp1, desc, 0.85)
    bset = [tuple(t) for t in b2.tolist()]
    assert bset.count(tuple(kp1[0].tolist())) <= 1
    # the unambiguous pairs survive in both modes
    assert len(mk1) >= n - 3
    assert len(b1) >= n - 4


def test_fused_descriptor_parity():
    """The fused Pallas descriptor (argmax-face barycentric, deferred
    vertex binning, separable weights) must match the exact einsum path at
    f32-ulp level, including near-border keypoints off-center in their
    edge-clamped windows (oc_sift.cpp:1051-1250 semantics)."""
    import math

    import jax.numpy as jnp

    from opencorr_tpu.ops import pallas_desc as pd
    from opencorr_tpu.ops import sift3d as ops3d

    rng = np.random.default_rng(42)
    dz, dy, dx = 40, 44, 48
    vol = jnp.asarray(np.float32(128 + 40 * rng.standard_normal((dz, dy, dx))))
    xi = np.array([24, 5, 45, 24, 2, 24, 30, 46], np.int32)
    yi = np.array([22, 22, 22, 3, 41, 22, 20, 2], np.int32)
    zi = np.array([20, 20, 20, 20, 20, 2, 37, 38], np.int32)
    rots = []
    for _ in range(len(xi)):
        a = rng.standard_normal(3)
        a /= np.linalg.norm(a)
        b = rng.standard_normal(3)
        b -= (b @ a) * a
        b /= np.linalg.norm(b)
        rots.append(np.stack([a, b, np.cross(a, b)]))
    rot = jnp.asarray(np.float32(rots))
    scale, units = 1.0, (1.0, 1.0, 1.0)
    trunc = jnp.float32(0.2 * 128 / 768)
    r_desc = 16
    crop = ops3d._sphere_crop(r_desc, scale, units)
    dims = jnp.asarray(np.array([dx, dy, dz], np.int32))
    win, x0, y0, z0 = ops3d._gather_windows_3d(
        vol, jnp.asarray(xi), jnp.asarray(yi), jnp.asarray(zi), r_desc)
    de = np.asarray(ops3d.construct_descriptor(
        win, x0, y0, z0, jnp.asarray(xi), jnp.asarray(yi), jnp.asarray(zi),
        dims, rot, jnp.float32(scale), jnp.asarray(np.float32(units)),
        trunc, crop=crop))
    df = np.asarray(pd.construct_descriptor_fused(
        vol, jnp.asarray(xi), jnp.asarray(yi), jnp.asarray(zi), rot, trunc,
        crop=crop, scale=scale, unit_xyz=units, interpret=True))
    assert np.abs(de - df).max() < 1e-6
    assert np.allclose(np.linalg.norm(df, axis=1), 1.0, atol=1e-5)


def test_gradient_sign_matches_reference():
    """Orientation/descriptor gradients are +0.5 (I[k+1] - I[k-1])
    (oc_sift.cpp:905-907): a pure x-ramp volume must produce a dominant
    gradient along +x (round-4 had the _sh operands swapped, negating every
    gradient)."""
    import jax.numpy as jnp

    from opencorr_tpu.ops import sift3d as ops3d

    s = 17
    ramp = np.broadcast_to(
        np.arange(s, dtype=np.float32), (s, s, s)).copy()
    win = jnp.asarray(ramp[None])
    zero = jnp.zeros((1,), jnp.int32)
    c = jnp.full((1,), s // 2, jnp.int32)
    dims = jnp.asarray(np.array([s, s, s], np.int32))
    rot, ok = ops3d.assign_orientation(
        win, zero, zero, zero, c, c, c, dims, jnp.float32(1.0),
        jnp.asarray(np.float32([1, 1, 1])), jnp.float32(1e-10),
        jnp.float32(0.9), jnp.float32(0.0))
    # d_vec ~ +x, so the first rotation row (dominant eigvec signed toward
    # d_vec) must have positive x component
    assert float(rot[0, 0, 0]) > 0.5
