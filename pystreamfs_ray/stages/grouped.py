"""Grouped order-statistics operators: per-group top-k and exact
per-group quantiles.

Both are one-shuffle designs keyed on the group column:

- ``grouped_topk`` runs a per-batch COMBINER first (each input batch
  contributes at most k rows per group it contains), so the shuffle
  moves O(k x groups-per-batch) rows per block instead of the whole
  table — the standard partial-top-k trick that keeps a "top 3 per key"
  query cheap at 100 TB even with millions of rows per key.
- ``grouped_quantiles`` shuffles only ``(group, value)`` pairs and
  sorts within each group. Exact quantiles are not combinable, so the
  per-group value list must co-locate; project the two columns before
  calling so nothing else rides the shuffle. At extreme per-group
  cardinality the scale path is a mergeable sketch (t-digest / KLL)
  with bounded error — this operator is the exact form.

No reference analog (beyond-reference engine addition, like
``stages/joins.py``); tie-breaking and interpolation are pinned so the
DuckDB oracles (row_number window / quantile_cont) hash-match exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def grouped_topk(ds, group_col: str, order_col: str, k: int, *,
                 tiebreak_col: str, descending: bool = True):
    """Top-``k`` rows per group by ``order_col`` (desc by default) with
    a deterministic ``(order_col, tiebreak_col)`` ordering; emits an
    additional 1-based ``rank`` column. One hash shuffle on
    ``group_col``, volume pre-cut by the in-batch combiner."""
    ascending = [not descending, True]
    sort_cols = [order_col, tiebreak_col]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # combiner: a batch can never contribute more than k rows per
        # group to the final answer
        return (df.sort_values(sort_cols, ascending=ascending, kind="mergesort")
                  .groupby(group_col, sort=False).head(k))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.sort_values(sort_cols, ascending=ascending, kind="mergesort")
                 .head(k).reset_index(drop=True))
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out

    return (ds.map_batches(partial, batch_format="pandas")
              .groupby(group_col)
              .map_groups(final, batch_format="pandas"))


def pivot_counts(ds, key_col: str, pivot_col: str, values: list[str]):
    """Long → wide: one row per key with an ``n_<value>`` count column
    per pivoted value. The in-batch combiner (indicator columns +
    per-batch groupby-sum) shrinks the shuffle to distinct-keys-per-
    batch rows; the global groupby then sums partials — the standard
    two-level aggregation, so the exchange volume is bounded by key
    cardinality, not input size."""
    from ray.data.aggregate import Sum

    cols = [f"n_{v}" for v in values]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({key_col: df[key_col]})
        for v, c in zip(values, cols):
            out[c] = (df[pivot_col] == v).to_numpy(dtype=np.int64)
        return out.groupby(key_col, as_index=False, sort=False).sum()

    return (ds.map_batches(partial, batch_format="pandas")
              .groupby(key_col)
              .aggregate(*[Sum(c, alias_name=c) for c in cols]))


def grouped_quantiles(ds, group_col: str, value_col: str,
                      qs: list[float], names: list[str], *,
                      ndigits: int = 6):
    """Exact per-group quantiles with linear interpolation (numpy
    default == DuckDB ``quantile_cont``), one output row per group,
    values rounded to ``ndigits`` for order-independent comparison."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        row: dict = {group_col: [df[group_col].iloc[0]]}
        for q, nm in zip(qs, names):
            row[nm] = [round(float(np.quantile(v, q)), ndigits)] if len(v) else [None]
        row["n"] = [np.int64(len(v))]
        return pd.DataFrame(row)

    return (ds.select_columns([group_col, value_col])
              .groupby(group_col)
              .map_groups(fn, batch_format="pandas"))
