"""Aux subsystems: calibration CSV, stage timing, speckle quality, native IO."""

import numpy as np

import opencorr_tpu as oc
from opencorr_tpu.io import calibration_io, native, table as io_table
from opencorr_tpu.utils.timing import StageTimer


def test_calibration_csv_roundtrip(tmp_path):
    c1 = oc.Calibration(
        oc.CameraIntrinsics(fx=1000, fy=1001, cx=320, cy=240, k1=0.01),
        oc.CameraExtrinsics())
    c2 = oc.Calibration(
        oc.CameraIntrinsics(fx=1100, fy=1102, cx=300, cy=250),
        oc.CameraExtrinsics(tx=100, ry=-0.3))
    path = tmp_path / "calib.csv"
    calibration_io.save_calibration(str(path), c1, c2)
    a, b = calibration_io.load_calibration(str(path))
    assert a.intrinsics.fx == 1000
    assert a.intrinsics.k1 == 0.01
    assert b.extrinsics.ry == -0.3
    assert np.allclose(b.projection_matrix, c2.projection_matrix)


def test_stage_timer_csv(tmp_path):
    t = StageTimer()
    with t.stage("A"):
        pass
    with t.stage("B"):
        pass
    path = tmp_path / "t.csv"
    t.save_csv(str(path), 123)
    lines = open(path).read().splitlines()
    assert lines[0] == "POI number,A,B"
    assert lines[1].startswith("123,")


def test_native_write_matches_python(tmp_path):
    if not native.available():
        return
    t = oc.poi_grid_2d((5, 6), 4, 3, 2)
    p1 = tmp_path / "nat.csv"
    io_table.save_table_2d(str(p1), t)
    import opencorr_tpu.io.native as nat

    saved = (nat._lib, nat._tried)
    nat._lib, nat._tried = None, True
    try:
        p2 = tmp_path / "py.csv"
        io_table.save_table_2d(str(p2), t)
    finally:
        nat._lib, nat._tried = saved
    assert open(p1).read() == open(p2).read()


def test_maps_2ds_and_3d(tmp_path):
    t3 = oc.poi_grid_3d((1, 1, 1), 2, 2, 2, 2)
    io_table.save_map_3d(str(tmp_path / "m3.csv"), t3, "u", (6, 6, 6))
    txt = open(tmp_path / "m3.csv").read()
    assert len(txt.splitlines()) == 6 * 7  # 6 slices x (6 rows + blank)
    ts = oc.new_table_2ds([3.0], [4.0])
    io_table.save_map_2ds(str(tmp_path / "m2s.csv"), ts, "zncc_r1r2", 6, 6)
    assert len(open(tmp_path / "m2s.csv").read().splitlines()) == 6


def test_speckle_quality():
    from scipy.ndimage import gaussian_filter, shift as ndshift

    from opencorr_tpu.utils.speckle_quality import assess

    rng = np.random.default_rng(0)
    base = gaussian_filter(
        rng.standard_normal((200, 200)).astype(np.float32), 1.0) * 80 + 128
    q = assess(base, ndshift(base, (1.5, 2.5), order=3))
    assert q.matches > 50
    assert q.mean_error < 0.5
    assert q.evenness < 2.0
