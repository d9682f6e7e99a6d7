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
