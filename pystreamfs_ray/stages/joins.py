"""Broadcast semi / anti joins.

The scalable pattern for filtering a big fact table by a (much smaller)
key set: ``ray.put`` the key set once, filter inside ``map_batches``
with a vectorized membership test — no shuffle of the big side. (At
extreme key-set sizes, swap the set for a Bloom filter; the call shape
is unchanged.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def _key_array(keys) -> pa.Array:
    if isinstance(keys, pa.Array):
        return keys
    return pa.array(list(keys))


def semi_join(ds, keys, on: str):
    """Rows of ``ds`` whose ``on`` value IS in ``keys`` (small side)."""
    ref = ray.put(_key_array(keys))

    def fn(t: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        return t.filter(pc.is_in(t[on], value_set=ks))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def anti_join(ds, keys, on: str):
    """Rows of ``ds`` whose ``on`` value is NOT in ``keys``."""
    ref = ray.put(_key_array(keys))

    def fn(t: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        return t.filter(pc.invert(pc.is_in(t[on], value_set=ks)))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
