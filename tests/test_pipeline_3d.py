"""DVC pipeline tests on synthetic volumes."""

import jax.numpy as jnp
import numpy as np

import opencorr_tpu as oc
from opencorr_tpu.data import poi as poi_mod


def test_dvc_fftcc_icgn(speckle_pair_3d):
    ref, tar, tu, tv, tw = speckle_pair_3d
    pois = oc.poi_grid_3d((16, 16, 16), 3, 3, 3, 6)
    f = oc.FFTCC3D(8, 8, 8)
    f.set_images(ref, tar)
    pois = f.compute(pois)
    assert np.all(np.abs(np.asarray(pois.u) - round(tu)) <= 1)
    ic = oc.ICGN3D1(8, 8, 8, 0.001, 10)
    ic.set_images(ref, tar)
    ic.prepare()
    pois = ic.compute(pois)
    z = np.asarray(pois.zncc)
    assert (z > 0).all()
    assert abs(np.asarray(pois.u).mean() - tu) < 0.05
    assert abs(np.asarray(pois.v).mean() - tv) < 0.05
    assert abs(np.asarray(pois.w).mean() - tw) < 0.05


def test_dvc_chunked_equivalent(speckle_pair_3d):
    ref, tar, _, _, _ = speckle_pair_3d
    pois = oc.poi_grid_3d((16, 16, 16), 3, 3, 2, 6)
    ic = oc.ICGN3D1(6, 6, 6, 0.001, 10, chunk_size=None)
    ic.set_images(ref, tar)
    ic.prepare()
    a = ic.compute(pois)
    ic.chunk_size = 7  # forces padding of the last chunk
    b = ic.compute(pois)
    assert np.allclose(np.asarray(a.p), np.asarray(b.p), atol=1e-5)


def test_fftcc3d_exact_integer_rerank():
    """The hi/lo-int32 top-8 re-rank must pick exactly the int64 circular
    correlation argmax (first flat index in scan order on ties) whenever the
    f32 peak set contains it — validated per POI against a brute-force int64
    replay on 8-bit-valued volumes (ops/fftcc.py fftcc3d)."""
    from opencorr_tpu.ops import fftcc as fftcc_ops

    rng = np.random.default_rng(7)
    r = 4
    w = 2 * r
    dims = (24, 24, 24)
    ref = rng.integers(0, 256, dims).astype(np.float32)
    tar = np.roll(ref, (1, -2, 3), axis=(0, 1, 2)).astype(np.float32)
    tar += rng.integers(0, 3, dims).astype(np.float32)  # integral noise
    n = 27
    xs = rng.integers(r, dims[2] - r, n).astype(np.float32)
    ys = rng.integers(r, dims[1] - r, n).astype(np.float32)
    zs = rng.integers(r, dims[0] - r, n).astype(np.float32)
    zero = np.zeros(n, np.float32)
    u, v, wd, zncc, valid = fftcc_ops.fftcc3d(
        jnp.asarray(ref), jnp.asarray(tar), jnp.asarray(xs), jnp.asarray(ys),
        jnp.asarray(zs), jnp.asarray(zero), jnp.asarray(zero),
        jnp.asarray(zero), rx=r, ry=r, rz=r)
    u, v, wd = np.asarray(u), np.asarray(v), np.asarray(wd)

    for i in range(n):
        xi, yi, zi = int(xs[i]), int(ys[i]), int(zs[i])
        rw = ref[zi - r : zi + r, yi - r : yi + r, xi - r : xi + r]
        tw = tar[zi - r : zi + r, yi - r : yi + r, xi - r : xi + r]
        ri = rw.astype(np.int64)
        ti = tw.astype(np.int64)
        best_score, best_idx = None, None
        for dz in range(w):
            for dy in range(w):
                for dx in range(w):
                    s = int(np.sum(ri * np.roll(ti, (-dz, -dy, -dx),
                                                axis=(0, 1, 2))))
                    if best_score is None or s > best_score:
                        best_score = s
                        best_idx = (dz * w + dy) * w + dx
        du = best_idx % w
        dv = (best_idx // w) % w
        dw_ = best_idx // (w * w)
        du = du - w if du > r else du
        dv = dv - w if dv > r else dv
        dw_ = dw_ - w if dw_ > r else dw_
        assert (u[i], v[i], wd[i]) == (du, dv, dw_), (
            i, (u[i], v[i], wd[i]), (du, dv, dw_))


def test_strain_3d_linear_field():
    pois = oc.poi_grid_3d((4, 4, 4), 8, 8, 8, 3)
    x, y, z = (np.asarray(a) for a in (pois.x, pois.y, pois.z))
    grads = dict(ux=1e-3, uy=2e-3, uz=-1e-3, vx=4e-4, vy=-2e-3, vz=5e-4,
                 wx=-3e-4, wy=8e-4, wz=1.5e-3)
    u = grads["ux"] * x + grads["uy"] * y + grads["uz"] * z
    v = grads["vx"] * x + grads["vy"] * y + grads["vz"] * z
    w = grads["wx"] * x + grads["wy"] * y + grads["wz"] * z
    p = np.zeros((pois.n, 12), np.float32)
    p[:, poi_mod.U3] = u
    p[:, poi_mod.V3] = v
    p[:, poi_mod.W3] = w
    r = np.zeros((pois.n, 7), np.float32)
    r[:, poi_mod.R3_ZNCC] = 0.99
    pois = pois.replace(p=jnp.asarray(p), r=jnp.asarray(r))
    out = oc.Strain(8.0, 10).compute(pois)
    e = np.asarray(out.e)
    assert np.allclose(e[:, 0], grads["ux"], atol=1e-5)
    assert np.allclose(e[:, 1], grads["vy"], atol=1e-5)
    assert np.allclose(e[:, 2], grads["wz"], atol=1e-5)
    assert np.allclose(e[:, 3], 0.5 * (grads["uy"] + grads["vx"]), atol=1e-5)
    assert np.allclose(e[:, 4], 0.5 * (grads["vz"] + grads["wy"]), atol=1e-5)
    assert np.allclose(e[:, 5], 0.5 * (grads["wx"] + grads["uz"]), atol=1e-5)
