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


_HASH_KEY = "pystreamfs_ray03"  # fixed 16-byte key → deterministic across processes


def bucket_of(key: str, num_buckets: int) -> int:
    import pandas as pd

    h = pd.util.hash_array(np.asarray([str(key)], dtype=object), hash_key=_HASH_KEY)
    return int(h[0] % np.uint64(num_buckets))


def bucket_array(keys, num_buckets: int) -> np.ndarray:
    """Vectorized deterministic bucket assignment (SipHash via
    pandas.util.hash_array with a pinned key; ~100× faster than a
    per-key blake2 loop on big batches)."""
    import pandas as pd

    s = pd.Series(keys)
    if s.dtype != object:
        s = s.astype(str)  # hash the string form for any key dtype
    h = pd.util.hash_array(s.to_numpy(dtype=object), hash_key=_HASH_KEY)
    return (h % np.uint64(num_buckets)).astype(np.int32)


def content_hash64(values) -> np.ndarray:
    """Vectorized deterministic 64-bit content hash of a string array
    (SipHash, pinned key) — a PARTITIONER, not an identity: callers
    must resolve collisions by grouping on the value itself."""
    import pandas as pd

    return pd.util.hash_array(np.asarray(values, dtype=object), hash_key=_HASH_KEY)


def params_fingerprint(obj: Any) -> str:
    """Stable fingerprint of a JSON-serializable params dict."""
    return hashlib.blake2b(
        json.dumps(obj, sort_keys=True, default=str).encode(), digest_size=8
    ).hexdigest()


def ensure_cols(df, schema: dict):
    """Guarantee ``df`` has the given columns: Ray's ``to_pandas()`` on
    an EMPTY aggregate yields a frame with NO columns, so downstream
    `df[col]` raises on a legitimately-empty input. Missing columns are
    added as typed empty (or all-null for non-empty frames)."""
    import pandas as pd

    for col, dtype in schema.items():
        if col not in df.columns:
            df[col] = pd.Series([None] * len(df)).astype(dtype) if len(df) \
                else pd.Series([], dtype=dtype)
    return df


_PAGE_SIZE = None


def rss_bytes() -> int:
    """Current process resident-set size in bytes — the sandbox stand-in
    for the reference's per-window USS probe
    (`/root/reference/pystreamfs/pystreamfs.py:74`; psutil is absent
    here). /proc read costs ~5 µs — same per-window cadence as the
    reference. Falls back to ru_maxrss (peak, kB) off Linux."""
    global _PAGE_SIZE
    import os

    try:
        with open("/proc/self/statm", "rb") as f:
            if _PAGE_SIZE is None:
                _PAGE_SIZE = os.sysconf("SC_PAGE_SIZE")
            return int(f.read().split()[1]) * _PAGE_SIZE
    except OSError:
        import resource

        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024


def spread_sample_values(ds, col: str, *, per_block: int = 8,
                         max_blocks: int = 4096) -> np.ndarray:
    """Sorted sample of ``col`` drawn ACROSS the dataset for
    range-partition boundary estimation.

    ``ds.limit(n)`` takes the FIRST n rows — on inputs sorted or
    clustered by ``col`` (typical for event/time data) every boundary
    collapses into the leading value range and the two-phase scans
    degrade to near-single-partition execution. Instead each block
    contributes its own ``per_block``-point quantile grid (evenly
    spaced sorted values), so a value-sorted input still yields
    boundaries spanning the full range. Driver pull is bounded by
    ``per_block × num_blocks`` scalars (~6.4 M floats at 100 TB /
    128 MB blocks); exactness never depends on the sample — only
    partition balance does."""
    import pyarrow as pa

    def block_grid(t: pa.Table) -> pa.Table:
        arr = t[col].combine_chunks()
        n = len(arr)
        if n == 0:
            return pa.table({col: arr})
        import pyarrow.compute as pc

        sorted_idx = pc.sort_indices(arr)
        pick = np.linspace(0, n - 1, num=min(per_block, n)).astype(np.int64)
        return pa.table({col: arr.take(sorted_idx.take(pa.array(pick)))})

    grid = (ds.select_columns([col])
            .map_batches(block_grid, batch_format="pyarrow")
            .limit(per_block * max_blocks)  # hard cap, not a prefix bias:
            # each upstream block already shrank to per_block rows, so the
            # cap covers max_blocks blocks' worth of spread points
            .to_pandas())
    if col not in grid.columns:  # empty input → Ray drops the column
        return np.array([], dtype=np.float64)
    return np.sort(grid[col].to_numpy())


def quantile_bounds(values: np.ndarray, num_partitions: int) -> np.ndarray:
    """Range-partition boundaries (deduped interior quantiles) from a
    sorted sample; empty array → everything lands in partition 0."""
    if len(values) == 0 or num_partitions <= 1:
        return np.array([], dtype=values.dtype if len(values) else np.float64)
    qs = np.linspace(0, 1, num_partitions + 1)[1:-1]
    if not np.issubdtype(values.dtype, np.number):
        # string/object keys: positional nearest-quantiles of the sorted
        # sample (np.quantile is numeric-only); same semantics
        vs = np.sort(values)
        idx = np.rint(qs * (len(vs) - 1)).astype(np.int64)
        return np.unique(vs[idx])
    return np.unique(np.quantile(values, qs, method="nearest"))


def arrow_block(df):
    """pandas → metadata-free Arrow table. Return this from any
    map_batches COMBINER that feeds a groupby/aggregate: pandas blocks
    through Ray's sort-based shuffle cost ~60× more map/reduce CPU
    than Arrow blocks (measured — see BASELINE.md), and the pandas
    schema-metadata blob additionally defeats shuffle schema-dedup."""
    import pyarrow as pa

    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def arrow_combiner(fn):
    """Adapter for a pandas-implemented COMBINER feeding a
    groupby/aggregate: declares ``batch_format="pyarrow"`` semantics
    (convert the input table inside the fn) so the fused shuffle
    map-side keeps the fast Arrow sort path. Declaring
    ``batch_format="pandas"`` switches the fused sort to pandas blocks
    even when the fn RETURNS Arrow — measured 4-6× slower on a
    150k-key aggregate. Use as
    ``map_batches(arrow_combiner(partial), batch_format="pyarrow")``."""
    import pyarrow as pa

    def wrapped(t: pa.Table):
        out = fn(t.to_pandas())
        return out if isinstance(out, pa.Table) else arrow_block(out)

    return wrapped


def drop_empty_blocks(ds, num_blocks: int):
    """Ray's hash aggregator can emit zero-row blocks with an EMPTY
    (zero-column) schema; a downstream hash join then fails FieldRef
    resolution on the key ("No match or multiple matches ... on right
    side of the join"). ``map_batches`` never sees empty blocks, so
    the Dataset-level fix is a split/merge ``repartition`` (no
    shuffle), which discards them. Use on any groupby/aggregate output
    that feeds a join; pick ``num_blocks`` ≈ the join partition
    count."""
    return ds.repartition(num_blocks)


def stats_table(ds) -> "pd.DataFrame":
    """Parse ``ds.stats()`` into a compact per-operator observability
    table: (operator, tasks, wall_total_s, cpu_total_s). The judge of
    a pipeline's health at scale is whether wall time is dominated by
    useful compute — this surfaces exactly that per stage without
    reading the raw stats dump. Parsing is tolerant of missing
    fields (barrier operators report no remote times) and of future
    Ray wording changes (unmatched operators still appear with NaNs).
    """
    import re

    import pandas as pd

    text = ds.stats()
    rows = []
    for block in re.split(r"\n(?=Operator )", text):
        m = re.match(r"Operator (\d+) (.+?):", block)
        if not m:
            continue
        tasks = re.search(r"(\d+) tasks executed", block)
        wall = re.search(
            r"Remote wall time:.*?, ([\d.]+)(us|ms|s|m) total", block)
        cpu = re.search(
            r"Remote cpu time:.*?, ([\d.]+)(us|ms|s|m) total", block)

        def _sec(g):
            if not g:
                return float("nan")
            v, unit = float(g.group(1)), g.group(2)
            return v * {"us": 1e-6, "ms": 1e-3, "s": 1.0, "m": 60.0}[unit]

        rows.append({
            "operator": m.group(2).strip()[:80],
            "tasks": int(tasks.group(1)) if tasks else 0,
            "wall_total_s": round(_sec(wall), 3),
            "cpu_total_s": round(_sec(cpu), 3),
        })
    return pd.DataFrame(rows)
