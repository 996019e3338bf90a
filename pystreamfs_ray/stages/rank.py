"""Global order statistics without a global sort: distributed
percent-rank (and the strictly-less rank it is built on).

The reference ranks only *within* a window (top-m by ``abs(w)`` —
`/root/reference/pystreamfs/pystreamfs.py:66`); at corpus scale the
analogous need is a rank against the WHOLE dataset (quantile
normalization, percentile outlier cuts). A naive global ``sort`` +
row-number materializes a total order; instead this uses the same
two-phase scan as ``stages/packing.distributed_prefix_sum``:

1. sample value boundaries → range-partition (equal values always land
   in the same partition, so ties never straddle a boundary);
2. per-partition row counts → driver exclusive-scan of P integers;
3. inside each partition, ``searchsorted(sorted_values, v, 'left')``
   gives the local strictly-less count, vectorized; plus the partition
   offset it is the GLOBAL strictly-less count.

``percent_rank = strictly_less / (n - 1)`` — exactly SQL
``PERCENT_RANK() OVER (ORDER BY value)`` including tie semantics.
Only ``(id, value)`` pairs move; nothing but P integers reaches the
driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_PART = "__part"


def global_percent_rank(ds, *, value_col: str, id_col: str,
                        out_col: str = "pr", num_partitions: int = 64,
                        boundary_sample: int = 8192, ndigits: int = 6):
    """Append the global percent-rank of ``value_col`` (ties share the
    rank of their strictly-less count, as in SQL ``PERCENT_RANK``).
    Returns a Dataset of ``(id_col, out_col)`` rounded to ``ndigits``."""
    from pystreamfs_ray.util import ensure_cols, quantile_bounds, spread_sample_values

    # per-block spread sample: ds.limit() would take the FIRST rows and
    # collapse all boundaries on value-sorted input (ADVICE r2)
    vals = spread_sample_values(
        ds, value_col, max_blocks=max(boundary_sample // 8, 1)).astype(np.float64)
    bounds = quantile_bounds(vals, num_partitions)

    def assign(t: pa.Table) -> pa.Table:
        part = np.searchsorted(bounds, t[value_col].to_numpy(zero_copy_only=False),
                               side="left")
        return t.append_column(_PART, pa.array(part.astype(np.int32)))

    parted = ds.select_columns([id_col, value_col]).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=False)

    # phase 1: one integer per partition (Ray pre-combines per block)
    from ray.data.aggregate import Count

    counts = ensure_cols(
        parted.groupby(_PART).aggregate(Count(alias_name="__c")).to_pandas(),
        {_PART: np.int32, "__c": np.int64})
    by_part = dict(zip(counts[_PART].astype(int), counts["__c"].astype(np.int64)))
    n_parts = len(bounds) + 1
    offsets = np.zeros(n_parts, dtype=np.int64)
    run = 0
    for p in range(n_parts):
        offsets[p] = run
        run += by_part.get(p, 0)
    n_total = int(run)
    denom = max(n_total - 1, 1)

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        p = int(g[_PART].iloc[0])
        v = g[value_col].to_numpy()
        sv = np.sort(v)
        less = np.searchsorted(sv, v, side="left") + offsets[p]
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            out_col: np.round(less / denom, ndigits),
        })

    return parted.groupby(_PART).map_groups(rank_part, batch_format="pandas")


def global_ntile(ds, n: int, *, value_col: str, id_col: str,
                 out_col: str = "bucket", num_partitions: int = 64,
                 boundary_sample: int = 8192,
                 extra_cols: list[str] | None = None):
    """Equal-size quantile bucketing: exactly SQL
    ``NTILE(n) OVER (ORDER BY value, id)`` — the first ``total % n``
    buckets get ``ceil(total/n)`` rows, the rest ``floor(total/n)``.

    Same two-phase shape as :func:`global_percent_rank`: because ties
    on ``value`` never straddle a range-partition boundary and the
    within-partition order is ``(value, id)``, partition offset +
    local (value, id) rank IS the global 0-based row number; the NTILE
    bucket is then arithmetic on that row number. No global sort, no
    total-order materialization.

    ``extra_cols``: passthrough columns that ride the one range
    partition exchange and come back next to the bucket (e.g. a label
    for a per-decile calibration table) — cheaper than joining the
    bucket back to the source afterwards."""
    from pystreamfs_ray.util import ensure_cols, quantile_bounds, spread_sample_values

    vals = spread_sample_values(
        ds, value_col, max_blocks=max(boundary_sample // 8, 1)).astype(np.float64)
    bounds = quantile_bounds(vals, num_partitions)

    def assign(t: pa.Table) -> pa.Table:
        part = np.searchsorted(bounds, t[value_col].to_numpy(zero_copy_only=False),
                               side="left")
        return t.append_column(_PART, pa.array(part.astype(np.int32)))

    extra = list(extra_cols or [])
    parted = ds.select_columns([id_col, value_col] + extra).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=False)

    from ray.data.aggregate import Count

    counts = ensure_cols(
        parted.groupby(_PART).aggregate(Count(alias_name="__c")).to_pandas(),
        {_PART: np.int32, "__c": np.int64})
    by_part = dict(zip(counts[_PART].astype(int), counts["__c"].astype(np.int64)))
    n_parts = len(bounds) + 1
    offsets = np.zeros(n_parts, dtype=np.int64)
    run = 0
    for p in range(n_parts):
        offsets[p] = run
        run += by_part.get(p, 0)
    total = int(run)
    q, r = divmod(total, n)  # first r buckets hold q+1 rows

    def tile_part(g: pd.DataFrame) -> pd.DataFrame:
        p = int(g[_PART].iloc[0])
        order = np.lexsort((g[id_col].to_numpy(), g[value_col].to_numpy()))
        rownum = np.empty(len(g), dtype=np.int64)
        rownum[order] = offsets[p] + np.arange(len(g), dtype=np.int64)
        big = r * (q + 1)
        bucket = np.where(
            rownum < big,
            rownum // max(q + 1, 1) + 1,
            (r + (rownum - big) // max(q, 1) + 1) if q > 0 else r,
        ).astype(np.int64)
        out = pd.DataFrame({id_col: g[id_col].to_numpy(), out_col: bucket})
        for c in extra:
            out[c] = g[c].to_numpy()
        return out

    return parted.groupby(_PART).map_groups(tile_part, batch_format="pandas")


def zorder_keys(ds, col_a: str, col_b: str, *, bits: int = 16,
                out_col: str = "zkey"):
    """Z-order (Morton) interleave of two integer columns' low ``bits``
    bits — the space-filling-curve sort/partition key that co-locates
    rows close in BOTH dimensions, so range predicates on either column
    prune contiguous key ranges (the data-layout step before a
    `sort(zkey)`/`write_partitioned_parquet` clustering pass at 100 TB).
    Pure vectorized bit arithmetic (``bits`` numpy ops per batch, no
    shuffle); deterministic, SQL-mirrorable bit-for-bit.
    """
    mask = (1 << bits) - 1

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        a = df[col_a].to_numpy(np.int64) & mask
        b = df[col_b].to_numpy(np.int64) & mask
        z = np.zeros(len(df), np.int64)
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        df[out_col] = z
        return df

    return ds.map_batches(fn, batch_format="pandas")
