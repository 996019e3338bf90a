"""Temporal / behavioral analytics over event streams: first-seen
(cohort) counts and ordered-sequence funnels.

These generalize the reference's stream bookkeeping (window ids and
per-window stats threaded in event order — `/root/reference/pystreamfs/
pystreamfs.py:59-99`) to the entity dimension: instead of "which window
is this row in", they answer "when did this entity first appear" and
"how far through an ordered event sequence did it get".

Scale shapes:

- ``first_seen_counts``: one combiner-friendly ``groupby(entity).min(ts)``
  shuffle (Ray aggregates pre-combine per block, so only per-block
  partial minima move), then a time-bucket roll-up whose cardinality is
  bounded by the calendar, not the data — the running total over that
  tiny table is driver-side by design.
- ``funnel_counts``: ONE hash shuffle on the entity key; each bucket
  resolves every stage for all its entities with vectorized pandas
  passes (one merge + groupby-min per stage, never a per-entity Python
  loop). Rows not matching any funnel stage are filtered before the
  shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pystreamfs_ray.stages.window import per_bucket


def first_seen_counts(ds, *, entity_col: str = "user_id",
                      ts_col: str = "ts", freq: str = "D") -> pd.DataFrame:
    """Per time-bucket count of entities whose FIRST event falls in that
    bucket, plus the running cumulative total (the classic new-users /
    cumulative-users curve). Returns a small pandas frame (bucket
    cardinality is calendar-bounded)."""
    from ray.data.aggregate import Min

    firsts = (ds.select_columns([entity_col, ts_col])
              .groupby(entity_col).aggregate(Min(ts_col, alias_name="__fts")))

    def to_bucket(df: pd.DataFrame) -> pd.DataFrame:
        day = pd.to_datetime(df["__fts"]).dt.floor(freq)
        vc = day.value_counts()
        return pd.DataFrame({"day": vc.index, "pc": vc.to_numpy(np.int64)})

    from pystreamfs_ray.util import ensure_cols

    raw = ensure_cols(firsts.map_batches(to_bucket, batch_format="pandas")
                      .to_pandas(), {"day": "datetime64[us]",
                                     "pc": np.int64})
    out = (raw.groupby("day", as_index=False)["pc"].sum()
           .sort_values("day", ignore_index=True))
    return pd.DataFrame({
        "day": out["day"],
        "new_users": out["pc"].astype(np.int64),
        "cum_users": out["pc"].cumsum().astype(np.int64),
    })


from pystreamfs_ray.util import ensure_cols


def funnel_counts(ds, stages: list[str], *, entity_col: str = "user_id",
                  ts_col: str = "ts", type_col: str = "event_type",
                  num_buckets: int = 64) -> pd.DataFrame:
    """Strict ordered funnel: an entity reaches stage *k* iff it has an
    event of type ``stages[k]`` STRICTLY LATER than the timestamp at
    which it reached stage *k-1* (earliest-completion semantics: the
    reach time of stage k is the minimum such timestamp). Returns one
    row per stage: ``(stage_idx, stage, n_users)``."""
    stages = list(stages)

    import pyarrow.compute as pc

    def keep_stage_rows(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[type_col], value_set=pa.array(stages)))

    filtered = (ds.select_columns([entity_col, ts_col, type_col])
                .map_batches(keep_stage_rows, batch_format="pyarrow",
                             zero_copy_batch=True))

    def bucket_funnel(g: pd.DataFrame) -> pd.DataFrame:
        # reach[entity] = ts at which the entity completed the previous
        # stage; advance one vectorized pass per stage
        reach = None  # None → stage 0: no lower bound
        counts = np.zeros(len(stages), dtype=np.int64)
        for k, s in enumerate(stages):
            rows = g[g[type_col].to_numpy() == s]
            if reach is None:
                cur = rows.groupby(entity_col, sort=False)[ts_col].min()
            else:
                m = rows.merge(reach.rename("__prev"), left_on=entity_col,
                               right_index=True, how="inner")
                m = m[m[ts_col].to_numpy() > m["__prev"].to_numpy()]
                cur = m.groupby(entity_col, sort=False)[ts_col].min()
            counts[k] = len(cur)
            if len(cur) == 0:
                break
            reach = cur
        return pd.DataFrame({"stage_idx": np.arange(len(stages), dtype=np.int64),
                             "n_users_pc": counts})

    partials = per_bucket(filtered, bucket_funnel, entity_col=entity_col,
                          num_buckets=num_buckets)
    tot = ensure_cols(partials.to_pandas(),
                      {"stage_idx": np.int64, "n_users_pc": np.int64})
    tot = (tot.groupby("stage_idx", as_index=False)["n_users_pc"].sum()
           .sort_values("stage_idx", ignore_index=True))
    return pd.DataFrame({
        "stage_idx": tot["stage_idx"].astype(np.int64),
        "stage": [stages[i] for i in tot["stage_idx"]],
        "n_users": tot["n_users_pc"].astype(np.int64),
    })


def late_event_stats(ds, *, entity_col: str = "user_id",
                     order_col: str = "event_id", ts_col: str = "ts",
                     num_buckets: int = 32, concurrency=None):
    """Out-of-order (late-arrival) audit per entity: walking each
    entity's events in ARRIVAL order (``order_col`` — the ingest
    sequence), count events whose event-time ``ts`` is EARLIER than the
    entity's running maximum, and the worst lateness in exact integer
    µs. This is the disorder statistic that sizes streaming watermarks
    and backfill windows (how late can data be before a window must
    reopen).

    Scale shape: columns pruned to (entity, order, ts) before ONE
    entity-hash shuffle; each bucket resolves all its entities with a
    vectorized grouped cummax (C-backed, no per-entity Python loop).
    Output is entity-count-sized."""

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([entity_col, order_col],
                            kind="mergesort", ignore_index=True)
        ts_i = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        df["__ts_i"] = ts_i
        g = df.groupby(entity_col, sort=False)
        cm = g["__ts_i"].cummax()
        prev = cm.shift(1)
        first = ~df[entity_col].duplicated()  # segment starts
        prev[first.to_numpy()] = np.nan
        late = prev.notna().to_numpy() & (ts_i < prev.fillna(-1).to_numpy())
        lateness = np.where(late, prev.fillna(0).to_numpy() - ts_i, 0)
        out = pd.DataFrame({entity_col: df[entity_col], "__late": late,
                            "__lateness": lateness.astype(np.int64)})
        agg = (out.groupby(entity_col, sort=False)
               .agg(n_events=("__late", "size"), n_late=("__late", "sum"),
                    max_late_us=("__lateness", "max")).reset_index())
        return agg.astype({"n_events": np.int64, "n_late": np.int64,
                           "max_late_us": np.int64})

    return per_bucket(ds.select_columns([entity_col, order_col, ts_col]),
                      bucket_fn, entity_col=entity_col,
                      num_buckets=num_buckets, concurrency=concurrency)
