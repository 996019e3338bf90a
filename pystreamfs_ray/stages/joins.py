"""Broadcast semi / anti joins, with a Bloom-filter path for key sets
too big to broadcast exactly.

The scalable pattern for filtering a big fact table by a (much smaller)
key set: ``ray.put`` the key set once, filter inside ``map_batches``
with a vectorized membership test — no shuffle of the big side. At
extreme key-set sizes the exact array is replaced by a ``BloomFilter``
(~1.2 GB per 10^9 keys at 1% FP vs ~8 GB of raw int64 keys): the call
shape is unchanged, membership gains a bounded false-positive rate, so
the Bloom path is a *prefilter* — exact for recall (every true match
survives), approximate for precision. Chain an exact shuffle join after
it when exact semantics are required; never use it for anti joins
(a false positive would silently DROP a valid row — ``anti_join``
therefore has no bloom method).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray


def _key_array(keys) -> pa.Array:
    if isinstance(keys, pa.Array):
        return keys
    return pa.array(list(keys))


def _hash2(vals) -> tuple[np.ndarray, np.ndarray]:
    """Two independent vectorized 64-bit hash lanes (double hashing)."""
    h1 = pd.util.hash_array(np.asarray(vals), categorize=False)
    # splitmix64 finalizer on h1 → an independent second lane
    z = (h1 + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z ^= z >> np.uint64(30)
    z = (z * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    z ^= z >> np.uint64(27)
    z = (z * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    h2 = (z ^ (z >> np.uint64(31))) | np.uint64(1)  # odd → full stride
    return h1, h2


class BloomFilter:
    """Vectorized numpy Bloom filter (double hashing, k derived from
    the target false-positive rate). Build once, ``ray.put`` once, test
    whole batches with one numpy pass."""

    def __init__(self, capacity: int, fp_rate: float = 0.01):
        capacity = max(1, int(capacity))
        m = int(np.ceil(-capacity * np.log(fp_rate) / (np.log(2) ** 2)))
        self.m = np.uint64(max(64, m))
        self.k = max(1, int(round(m / capacity * np.log(2))))
        self.bits = np.zeros((int(self.m) + 7) // 8, dtype=np.uint8)

    def _positions(self, vals) -> np.ndarray:
        h1, h2 = _hash2(vals)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % self.m).astype(np.int64)

    def add(self, vals) -> None:
        pos = self._positions(vals).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))

    def contains(self, vals) -> np.ndarray:
        """Boolean mask; no false negatives, FP rate ≈ ``fp_rate``."""
        pos = self._positions(vals)
        hit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=0).astype(bool)


def build_bloom(keys_ds, on: str, *, fp_rate: float = 0.01,
                capacity: int | None = None) -> BloomFilter:
    """Build a BloomFilter from a key Dataset: batches stream through
    the driver, only bits are kept. When ``capacity`` must be probed,
    the projected key column (not the full table) is materialized once
    so the count and the bit-fill don't recompute the upstream. (At
    multi-node scale, build per-partition filters in ``map_batches``
    and OR-reduce the bitarrays — same structure, kept simple here.)"""
    if capacity is None:
        # the count probe and the bit-fill below both consume the key
        # dataset — materialize the (projected) keys once instead of
        # re-deriving them per consumer
        keys_ds = keys_ds.select_columns([on]).materialize()
        capacity = keys_ds.count()
    bf = BloomFilter(capacity, fp_rate)
    for batch in keys_ds.select_columns([on]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        bf.add(batch[on].to_numpy(zero_copy_only=False))
    return bf


def semi_join(ds, keys, on: str):
    """Rows of ``ds`` whose ``on`` value IS in ``keys`` (small side)."""
    if isinstance(keys, BloomFilter):
        return bloom_semi_join(ds, keys, on)
    ref = ray.put(_key_array(keys))

    def fn(t: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        return t.filter(pc.is_in(t[on], value_set=ks))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def bloom_semi_join(ds, bloom: BloomFilter, on: str):
    """Semi join against a Bloom filter: keeps every true match plus a
    ~fp_rate fraction of non-matches. The scale path when the key set
    is too large to broadcast exactly."""
    ref = ray.put(bloom)

    def fn(t: pa.Table) -> pa.Table:
        bf = ray.get(ref)
        mask = bf.contains(t[on].to_numpy(zero_copy_only=False))
        return t.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def anti_join(ds, keys, on: str):
    """Rows of ``ds`` whose ``on`` value is NOT in ``keys``. Exact-set
    only — a Bloom's false positives would silently drop valid rows."""
    ref = ray.put(_key_array(keys))

    def fn(t: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        return t.filter(pc.invert(pc.is_in(t[on], value_set=ks)))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
