"""Host-side mirrors of device arrays, for solver-build-time planning.

The solver factories build observation groupings (window plan, flat
plans, cols plan, cluster plan) from the CONCRETE observation index
arrays on the host.  When the problem lives on the tunneled TPU, reading
those arrays back is a device→host transfer that can queue behind the
problem upload for minutes (measured: 95 s for a 1.8 MB index array
right after generation).  Producers that still hold the host originals
(synthetic generator, BAL loader) register them here; `asnumpy` then
resolves without touching the device.

Keyed by `id()` of the device array with a bounded FIFO so the cache
cannot grow unboundedly if eviction hooks are unavailable.
"""
from __future__ import annotations

import collections
import weakref

import numpy as np

_MAX_ENTRIES = 256
_cache: "collections.OrderedDict[int, np.ndarray]" = collections.OrderedDict()


def put(device_arr, host_arr: np.ndarray) -> None:
    """Register `host_arr` as the host mirror of `device_arr`."""
    key = id(device_arr)
    _cache[key] = np.asarray(host_arr)
    _cache.move_to_end(key)
    while len(_cache) > _MAX_ENTRIES:
        _cache.popitem(last=False)
    try:
        weakref.finalize(device_arr, _cache.pop, key, None)
    except TypeError:          # object does not support weakrefs
        pass


def put_tree(device_tree, host_tree) -> None:
    import jax
    jax.tree.map(put, device_tree, host_tree)


def asnumpy(x) -> np.ndarray:
    """Host mirror if registered, else a (possibly slow) device read."""
    hit = _cache.get(id(x))
    if hit is not None:
        return hit
    return np.asarray(x)
