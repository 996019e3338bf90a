"""Data-quality audit: one summary row of integrity counts for a
table — row count, duplicate-key count, out-of-range values, null
counts, value bounds.

The reference trusts its inputs (numpy matrices prepared in-process);
a corpus engine ingesting external parquet needs the audit pass that
gates a pipeline run ("refuse to train if keys collide or prices go
negative"). Everything here is the combiner pattern: per-batch partial
counts (a handful of int64s per batch) plus one groupby-count on the
key column for duplicate detection — the only shuffle, keyed and
combiner-pre-aggregated, so the exchange is key-cardinality-bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pystreamfs_ray.util import arrow_block, arrow_combiner


def table_audit(ds, *, key_col: str, numeric_col: str,
                min_value: float = 0.0) -> pd.DataFrame:
    """One-row integrity summary:

    - ``n_rows``: total rows
    - ``n_dup_keys``: keys appearing more than once
    - ``n_null_key`` / ``n_null_num``: nulls in the key / numeric col
    - ``n_below_min``: numeric values below ``min_value``
    - ``min_num`` / ``max_num``: numeric bounds (rounded to 6)
    """
    from ray.data.aggregate import Count, Max, Min, Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[numeric_col]
        vn = v.to_numpy(np.float64)
        ok = ~np.isnan(vn)
        return arrow_block(pd.DataFrame({
            "n_rows": [np.int64(len(df))],
            "n_null_key": [np.int64(df[key_col].isna().sum())],
            "n_null_num": [np.int64((~ok).sum())],
            "n_below_min": [np.int64((vn[ok] < min_value).sum())],
            "mn": [float(vn[ok].min()) if ok.any() else np.nan],
            "mx": [float(vn[ok].max()) if ok.any() else np.nan],
        }))

    sums = (ds.select_columns([key_col, numeric_col])
            .map_batches(arrow_combiner(partial), batch_format="pyarrow")
            .aggregate(Sum("n_rows", alias_name="n_rows"),
                       Sum("n_null_key", alias_name="n_null_key"),
                       Sum("n_null_num", alias_name="n_null_num"),
                       Sum("n_below_min", alias_name="n_below_min"),
                       Min("mn", alias_name="mn"),
                       Max("mx", alias_name="mx")))

    # duplicate keys: combiner per-batch value_counts → groupby-sum →
    # count of keys with total > 1 (key-cardinality-bounded shuffle)
    def key_counts(df: pd.DataFrame):
        vc = df[key_col].value_counts()
        return arrow_block(pd.DataFrame({key_col: vc.index,
                                         "c": vc.to_numpy(np.int64)}))

    from ray.data.aggregate import Sum as _Sum

    kc = (ds.select_columns([key_col])
          .map_batches(arrow_combiner(key_counts), batch_format="pyarrow")
          .groupby(key_col).aggregate(_Sum("c", alias_name="c")))
    n_dup = int(kc.map_batches(
        lambda df: pd.DataFrame({"d": [np.int64((df["c"] > 1).sum())]}),
        batch_format="pandas").sum("d") or 0)

    return pd.DataFrame({
        "n_rows": [np.int64(sums["n_rows"])],
        "n_dup_keys": [np.int64(n_dup)],
        "n_null_key": [np.int64(sums["n_null_key"])],
        "n_null_num": [np.int64(sums["n_null_num"])],
        "n_below_min": [np.int64(sums["n_below_min"])],
        "min_num": [round(float(sums["mn"]), 6)],
        "max_num": [round(float(sums["mx"]), 6)],
    })
