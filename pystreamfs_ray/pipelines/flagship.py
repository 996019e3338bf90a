"""Flagship pipeline: transcripts → featurize → selector → as-of join →
metrics (SURVEY.md §3.4 lifecycle).

Stages and shuffles:

1. ``read_parquet`` (column-pruned) → stateless ``map_batches``
   featurizer (Arrow, zero-copy);
2. shuffle #1: hash-bucket entities → per-bucket stable sort, lag
   features, tumbling windows, sequential kernel fold per entity
   (stateful actor pool when ``concurrency`` is set), optional
   prequential evaluation, per-bucket checkpoint;
3. shuffle #2: as-of join of window-end feature state onto label
   timestamps (zero leakage);
4. metrics aggregation (tiny).
"""

from __future__ import annotations

from typing import Any

from pystreamfs_ray.stages.asof import asof_join
from pystreamfs_ray.stages.featurize import featurize
from pystreamfs_ray.stages.selector import run_selector
from pystreamfs_ray.pipelines.metrics import global_summary


def feature_windows(
    transcripts_ds,
    *,
    kernel: str = "ofs",
    batch_size: int = 50,
    num_features: int = 5,
    kernel_params: dict[str, Any] | None = None,
    evaluate: str | None = None,
    max_history: int | None = None,
    num_buckets: int = 64,
    concurrency=None,
    checkpoint_dir: str | None = None,
    fingerprint: str = "",
    streaming: bool = False,
    flush: bool = True,
    load_state: bool = False,
):
    """transcripts → per-(entity, window) selector output Dataset."""
    feats = featurize(transcripts_ds)
    return run_selector(
        feats,
        kernel=kernel,
        batch_size=batch_size,
        num_features=num_features,
        kernel_params=kernel_params,
        order_cols=("turn_idx",),
        evaluate=evaluate,
        max_history=max_history,
        num_buckets=num_buckets,
        concurrency=concurrency,
        checkpoint_dir=checkpoint_dir,
        fingerprint=fingerprint,
        streaming=streaming,
        flush=flush,
        load_state=load_state,
    )


def flagship(
    transcripts_ds,
    labels_ds=None,
    *,
    kernel: str | list = "ofs",
    batch_size: int = 50,
    num_features: int = 5,
    evaluate: str | None = None,
    max_history: int | None = None,
    num_buckets: int = 64,
    concurrency=None,
    checkpoint_dir: str | None = None,
):
    """Full pipeline; returns (windows_ds, joined_ds_or_None, summary_df)."""
    windows = feature_windows(
        transcripts_ds,
        kernel=kernel,
        batch_size=batch_size,
        num_features=num_features,
        evaluate=evaluate,
        max_history=max_history,
        num_buckets=num_buckets,
        concurrency=concurrency,
        checkpoint_dir=checkpoint_dir,
    )
    joined = None
    if labels_ds is not None:
        joined = asof_join(
            labels_ds,
            windows.select_columns(["conv_id", "window_id", "ts_end", "w", "selected"]),
            by="conv_id",
            left_on="ts",
            right_on="ts_end",
            how="inner",
            num_buckets=num_buckets,
        )
    return windows, joined, global_summary(windows)
