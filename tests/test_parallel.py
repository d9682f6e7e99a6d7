"""Sharded execution on the virtual 8-device CPU mesh: sharded results must
equal single-device results."""

import jax
import numpy as np

import opencorr_tpu as oc
from opencorr_tpu.parallel import mesh as mesh_mod


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_icgn_matches_single(speckle_pair_2d):
    ref, tar, tu, tv = speckle_pair_2d
    pois = oc.poi_grid_2d((30, 30), 8, 8, 12)

    f = oc.FFTCC2D(10, 10)
    f.set_images(ref, tar)
    icgn = oc.ICGN2D1(10, 10, 0.001, 10)
    icgn.set_images(ref, tar)
    icgn.prepare()

    base = icgn.compute(f.compute(pois))

    m = mesh_mod.make_mesh()
    padded, n = mesh_mod.pad_to_multiple(pois, len(jax.devices()))
    sharded = mesh_mod.shard_table(padded, m)
    out = icgn.compute(f.compute(sharded))
    out = mesh_mod.unpad(out, n)

    assert np.allclose(np.asarray(out.p), np.asarray(base.p), atol=1e-5)
    assert np.allclose(np.asarray(out.r), np.asarray(base.r), atol=1e-4)
