"""Small shared helpers (hashing, bucketing, fingerprints)."""

from __future__ import annotations

import hashlib
import json
from typing import Any

import numpy as np


def stable_hash64(*parts: Any) -> int:
    """Deterministic 64-bit hash of the string repr of ``parts``.

    Used for per-(entity, window) RNG seeding and for hash-bucketing
    entities across partitions. Independent of PYTHONHASHSEED.
    """
    h = hashlib.blake2b(digest_size=8)
    for p in parts:
        h.update(str(p).encode("utf-8"))
        h.update(b"\x1f")
    return int.from_bytes(h.digest(), "little")


def bucket_of(key: str, num_buckets: int) -> int:
    return stable_hash64(key) % num_buckets


def bucket_array(keys, num_buckets: int) -> np.ndarray:
    """Vectorized-ish bucket assignment for an iterable of string keys."""
    return np.fromiter(
        (stable_hash64(k) % num_buckets for k in keys), dtype=np.int32, count=len(keys)
    )


def params_fingerprint(obj: Any) -> str:
    """Stable fingerprint of a JSON-serializable params dict."""
    return hashlib.blake2b(
        json.dumps(obj, sort_keys=True, default=str).encode(), digest_size=8
    ).hexdigest()
