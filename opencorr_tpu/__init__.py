"""opencorr_tpu — a TPU-native DIC/DVC engine.

A from-scratch JAX/XLA implementation of the full OpenCorr capability surface
(see SURVEY.md): FFT-CC initial guesses, IC-GN / IC-LM / NR sub-pixel
refinement with cubic B-spline interpolation, SIFT + feature-affine seeding,
stereo calibration / epipolar search / triangulation, strain fields, and
OpenCorr-compatible I/O — all batched over the POI axis and shardable over a
TPU device mesh.
"""

import os as _os


def _enable_compile_cache():
    """Point JAX's persistent compilation cache at a per-user directory.

    The engine's pipelines compile a dozen-plus XLA programs (per model /
    subset radius / queue shape); on a cold process that dominates wall clock
    (~7-40 s per program through a remote compiler).  Caching serialized
    executables across processes is the production behaviour — equivalent to
    the reference shipping pre-built binaries.  Opt out with
    ``OPENCORR_TPU_NO_COMPILE_CACHE=1``; an explicit
    ``JAX_COMPILATION_CACHE_DIR`` env wins.  Backends that cannot serialize
    executables are skipped by JAX itself.
    """
    if _os.environ.get("OPENCORR_TPU_NO_COMPILE_CACHE") == "1":
        return
    if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        import jax

        # XLA:CPU cache entries are ahead-of-time machine code with a strict
        # machine-feature check; a stale/mismatched entry can load as garbage
        # (observed: silent wrong results on the virtual CPU mesh).  The cache
        # exists for the remote-compiled TPU backend — skip it when the
        # process explicitly targets CPU.
        platforms = jax.config.jax_platforms or _os.environ.get(
            "JAX_PLATFORMS", "")
        if platforms and set(platforms.split(",")) <= {"cpu"}:
            return

        path = _os.path.join(
            _os.path.expanduser("~"), ".cache", "opencorr_tpu", "xla")
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything: under a remote compile service even trivial
        # programs cost a round-trip (and can hang), so no time floor
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # cache is an optimization; never block import
        pass


_enable_compile_cache()

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
