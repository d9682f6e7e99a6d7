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
