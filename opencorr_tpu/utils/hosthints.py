"""Host-side value hints for device buffers.

Several host-side precomputes need the VALUE of a device buffer the engine
itself produced from host data (strain/FA neighbor structures need POI
coordinates, self-adaptive ICGN/ICLM derive the static max radius from
``table.sr``).  Reading a device array back (``np.asarray``) costs a transfer
per call — and under this sandbox's axon tunnel the first transfer flips the
session into a slow polled dispatch mode (CLAUDE.md) — so producers register
the host value they already hold and consumers check here first.

Keyed on buffer identity (a weakref guards id reuse); entries fall off an
LRU of 64.
"""

from __future__ import annotations

import collections
import weakref

_HINTS = collections.OrderedDict()


def register_host_hint(dev_arr, host_arr) -> None:
    """Record ``host_arr`` as the host-side value of ``dev_arr``."""
    _HINTS[id(dev_arr)] = (weakref.ref(dev_arr), host_arr)
    while len(_HINTS) > 64:
        _HINTS.popitem(last=False)


def host_hint(dev_arr):
    """The registered host value of ``dev_arr``, or None."""
    e = _HINTS.get(id(dev_arr))
    if e is not None and e[0]() is dev_arr:
        return e[1]
    return None
