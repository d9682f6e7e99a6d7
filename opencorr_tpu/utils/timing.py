"""Stage timing in the reference's CSV schema.

The reference examples hand-time each stage with ``omp_get_wtime`` and append a
``*_time.csv`` with a header row of stage names and one row of seconds
(e.g. examples/test_2d_dic_fftcc_icgn1.cpp:131-139); those committed CSVs double
as the performance baselines.  ``StageTimer`` reproduces that artifact and can
also wrap stages in a ``jax.profiler`` trace.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional


class StageTimer:
    def __init__(self, profile_dir: Optional[str] = None):
        self.names: List[str] = []
        self.seconds: List[float] = []
        self.profile_dir = profile_dir

    @contextlib.contextmanager
    def stage(self, name: str):
        ctx = contextlib.nullcontext()
        if self.profile_dir:
            import jax

            ctx = jax.profiler.trace(self.profile_dir)
        t0 = time.perf_counter()
        with ctx:
            yield
        self.names.append(name)
        self.seconds.append(time.perf_counter() - t0)

    def save_csv(self, path: str, poi_number: int, delimiter: str = ","):
        """Header 'POI number,<stage>,...' + one data row (reference schema)."""
        with open(path, "w") as f:
            f.write(delimiter.join(["POI number"] + self.names) + "\n")
            f.write(delimiter.join(
                [str(poi_number)] + [repr(round(s, 7)) for s in self.seconds]
            ) + "\n")

    def report(self) -> str:
        return ", ".join(
            f"{n}: {s:.3f}s" for n, s in zip(self.names, self.seconds))
