"""Device-mesh distribution of POI batches.

The reference's only parallel strategy is an OpenMP thread team over the POI
queue with per-thread scratch pools (SURVEY.md §2.8).  Here the equivalent —
and the multi-chip strategy the reference lacks — is sharding the POI batch
axis over a ``jax.sharding.Mesh``:

* images / volumes / LUTs are replicated (2D images are tens of MB at most);
* every ``[N, ...]`` POI array is sharded along axis 0 (``P('poi')``);
* the jitted kernels then run SPMD with zero collectives in the hot loop —
  the only communication is the initial image broadcast and the final field
  gather, exactly the plan in SURVEY.md §5.8.

Multi-host: ``jax.distributed.initialize()`` + the same mesh over all devices;
``shard_table`` works unchanged with a global mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "poi") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def pad_to_multiple(table, multiple: int):
    """Pad the POI batch (edge-replicating) so it divides the mesh; returns
    (padded_table, original_n)."""
    n = table.n
    rem = n % multiple
    if rem == 0:
        return table, n
    pad = multiple - rem

    def pad_leaf(a):
        if a.ndim == 0:
            return a
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths, mode="edge")

    return jax.tree_util.tree_map(pad_leaf, table), n


def unpad(table, n: int):
    return jax.tree_util.tree_map(lambda a: a[:n] if a.ndim else a, table)


def shard_table(table, mesh: Mesh, axis: str = "poi"):
    """Place every POI array sharded along its leading axis."""
    sharding = NamedSharding(mesh, P(axis))

    def place(a):
        if a.ndim == 0:
            return a
        return jax.device_put(a, sharding)

    return jax.tree_util.tree_map(place, table)


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
