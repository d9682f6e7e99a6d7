"""opencorr_tpu — a TPU-native DIC/DVC engine.

A from-scratch JAX/XLA implementation of the full OpenCorr capability surface
(see SURVEY.md): FFT-CC initial guesses, IC-GN / IC-LM / NR sub-pixel
refinement with cubic B-spline interpolation, SIFT + feature-affine seeding,
stereo calibration / epipolar search / triangulation, strain fields, and
OpenCorr-compatible I/O — all batched over the POI axis and shardable over a
TPU device mesh.
"""

from .data.image import ColorfulImage2D, Image2D, Image3D
from .data.poi import (
    POITable2D,
    POITable2DS,
    POITable3D,
    new_table_2d,
    new_table_2ds,
    new_table_3d,
    poi_grid_2d,
    poi_grid_3d,
)
from .models.calibration import Calibration, CameraExtrinsics, CameraIntrinsics
from .models.epipolar import EpipolarSearch
from .models.feature_affine import FeatureAffine2D, FeatureAffine3D, RansacConfig
from .models.fftcc import FFTCC2D, FFTCC3D
from .models.icgn import ICGN2D1, ICGN2D2, ICGN3D1
from .models.iclm import ICLM2D1, ICLM2D2
from .models.nr import NR2D1
from .models.sift2d import SIFT2D, Sift2dConfig
from .models.sift3d import SIFT3D, Sift3dConfig
from .models.stereovision import Stereovision
from .models.strain import Strain

__all__ = [
    "ColorfulImage2D",
    "Image2D",
    "Image3D",
    "POITable2D",
    "POITable2DS",
    "POITable3D",
    "new_table_2d",
    "new_table_2ds",
    "new_table_3d",
    "poi_grid_2d",
    "poi_grid_3d",
    "Calibration",
    "CameraIntrinsics",
    "CameraExtrinsics",
    "EpipolarSearch",
    "Stereovision",
    "FeatureAffine2D",
    "FeatureAffine3D",
    "RansacConfig",
    "SIFT2D",
    "Sift2dConfig",
    "SIFT3D",
    "Sift3dConfig",
    "FFTCC2D",
    "FFTCC3D",
    "ICGN2D1",
    "ICGN2D2",
    "ICGN3D1",
    "ICLM2D1",
    "ICLM2D2",
    "NR2D1",
    "Strain",
]

__version__ = "0.1.0"
