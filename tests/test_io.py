"""I/O schema tests."""

import numpy as np

import opencorr_tpu as oc
from opencorr_tpu.data import poi as poi_mod
from opencorr_tpu.io import table as io_table


def test_table2d_roundtrip(tmp_path):
    t = oc.poi_grid_2d((5, 6), 3, 2, 4)
    p = np.random.default_rng(0).normal(size=(t.n, 12)).astype(np.float32)
    t = t.replace(p=p)
    path = tmp_path / "t.csv"
    io_table.save_table_2d(str(path), t)
    head = open(path).readline()
    assert head.startswith("x,y,u,v,u0,v0,ZNCC,iteration,convergence,feature,")
    t2 = io_table.load_table_2d(str(path))
    assert np.allclose(np.asarray(t2.p[:, poi_mod.U]), p[:, poi_mod.U], atol=1e-6)


def test_deformation_table(tmp_path):
    t = oc.poi_grid_2d((5, 6), 2, 2, 4)
    path = tmp_path / "d.csv"
    io_table.save_deformation_table_2d(str(path), t)
    head = open(path).readline()
    assert head.split(",")[:8] == ["x", "y", "u", "ux", "uy", "uxx", "uxy", "uyy"]


def test_map2d(tmp_path):
    t = oc.poi_grid_2d((1, 1), 2, 2, 2)
    t = t.replace(p=t.p.at[:, poi_mod.U].set(7.0))
    path = tmp_path / "m.csv"
    io_table.save_map_2d(str(path), t, "u", height=6, width=6)
    rows = [r.split(",") for r in open(path).read().splitlines()]
    assert float(rows[1][1]) == 7.0
    assert float(rows[0][0]) == 0.0


def test_table3d_roundtrip(tmp_path):
    t = oc.poi_grid_3d((1, 2, 3), 2, 2, 2, 5)
    p = np.random.default_rng(1).normal(size=(t.n, 12)).astype(np.float32)
    t = t.replace(p=p)
    path = tmp_path / "t3.csv"
    io_table.save_table_3d(str(path), t)
    t2 = io_table.load_table_3d(str(path))
    assert np.allclose(np.asarray(t2.p[:, poi_mod.U3]), p[:, poi_mod.U3], atol=1e-6)
    assert np.allclose(np.asarray(t2.z), np.asarray(t.z))


def test_matrix_bin_roundtrip(tmp_path):
    t = oc.poi_grid_3d((1, 2, 3), 2, 2, 1, 5)
    path = tmp_path / "m.bin"
    io_table.save_matrix_bin_3d(str(path), t, dims=(64, 64, 32))
    rec, dims = io_table.load_matrix_bin_3d(str(path))
    assert dims == (64, 64, 32)
    assert rec.shape == (t.n, 8)
    assert np.allclose(rec[:, 0], np.asarray(t.x))


def test_volume_bin_roundtrip(tmp_path):
    vol = np.random.default_rng(2).random((4, 5, 6)).astype(np.float32)
    img = oc.Image3D.from_array(vol)
    path = tmp_path / "v.bin"
    img.save_bin(str(path))
    img2 = oc.Image3D.load(str(path))
    assert img2.dim_x == 6 and img2.dim_y == 5 and img2.dim_z == 4
    assert np.allclose(img2.mat, vol)
