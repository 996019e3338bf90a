"""Transcript-table sources.

``read_transcripts`` reads a Parquet dir/file already in the
``input_hint`` shape (e.g. the synthesized FIXTURES.md tables).

``transcripts_from_events`` derives a deterministic transcript-shaped
table from the driver testdata ``events`` table so every transcript
operator is exercisable (and DuckDB-oracle-checkable) on
``/root/testdata/sf*``: each user is a conversation, events in
(ts, event_id) order are its turns. The mapping is pure SQL-expressible
(see ``__ray_entry__.oracle_sql``).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray.data as rd

from pystreamfs_ray.sources import read_parquet

from pystreamfs_ray.stages.window import per_bucket, sort_entity

ROLE_OF_EVENT = {"click": "user", "view": "user", "purchase": "assistant",
                 "signup": "assistant", "error": "system"}
TOOL_OF_EVENT = {"purchase": "search", "signup": "code", "error": "calc"}


def read_transcripts(path: str):
    return read_parquet(path)


def transcripts_from_events(sf_dir: str, *, num_buckets: int = 64, concurrency=None):
    events = read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )

    def _derive(group: pd.DataFrame) -> pd.DataFrame:
        group = sort_entity(group, entity_col="user_id", order_cols=("ts", "event_id"))
        turn_idx = group.groupby("user_id", sort=False).cumcount().astype(np.int32)
        out = pd.DataFrame(
            {
                "conv_id": group["user_id"].astype(str),
                "turn_idx": turn_idx,
                "role": group["event_type"].map(ROLE_OF_EVENT).fillna("tool"),
                "text": group["props"].astype(str),
                "tool": group["event_type"].map(TOOL_OF_EVENT).fillna(""),
                "ts": group["ts"],
            }
        )
        return out

    return per_bucket(
        events, _derive, entity_col="user_id", num_buckets=num_buckets,
        concurrency=concurrency,
    )
