"""Selector stage: per-entity sequential kernel folds, parallel across
entity buckets, as a stateful actor-pool group stage.

This is the engine form of the reference's ``simulate_stream`` loop
(`/root/reference/pystreamfs/pystreamfs.py:59-90`): within one entity
the kernel state is threaded window-to-window (strictly sequential —
the reference contract forbids intra-entity parallelism); across
entities everything is parallel. Entities are hash-bucketed once
(shuffle #1) and each bucket runs as one group task inside a
``map_groups`` actor pool (``concurrency=N`` → callable-class actors,
kernel registry resolved once per actor in ``__init__``).

Per entity × window the stage emits: weight vector ``w``, top-m
``selected`` set, ``fscr`` vs the previous window
(`/root/reference/pystreamfs/utils.py:4-18`), optional prequential
accuracy (`utils.py:21-54`), window-end timestamp and kernel wall time.

Optional per-bucket checkpointing (see ``state/checkpoint.py``): each
bucket atomically writes its rows + a manifest line; a resumed run skips
finished buckets entirely.
"""

from __future__ import annotations

import os
import time
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

from pystreamfs_ray.kernels.base import fscr as fscr_score
from pystreamfs_ray.kernels.base import top_m_features
from pystreamfs_ray.models import MODELS
from pystreamfs_ray.oracle import classify_window
from pystreamfs_ray.schema import FEATURE_COLS, SELECTOR_OUTPUT_SCHEMA
from pystreamfs_ray.stages.window import add_bucket
from pystreamfs_ray.util import params_fingerprint


def _entity_slices(keys: np.ndarray) -> list[tuple[int, int]]:
    """[start, end) slices of equal consecutive keys (input pre-sorted)."""
    if len(keys) == 0:
        return []
    bounds = np.flatnonzero(keys[1:] != keys[:-1]) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(keys)]))
    return list(zip(starts, ends))


class BucketSelector:
    """Callable-class group runner: one call = one entity bucket."""

    __name__ = "BucketSelector"  # map_groups expects named callables

    def __init__(
        self,
        kernel: str | list[str] = "ofs",
        batch_size: int = 50,
        num_features: int = 5,
        kernel_params: dict[str, Any] | None = None,
        entity_col: str = "conv_id",
        order_cols: tuple = ("turn_idx",),
        feature_cols: list[str] | None = None,
        label_col: str = "label",
        ts_col: str | None = "ts",
        evaluate: str | None = None,
        max_history: int | None = None,
        checkpoint_dir: str | None = None,
        fingerprint: str = "",
    ):
        # actor-pool setup: resolve kernels once per actor, not per batch.
        # A list runs several kernels per entity in ONE pass — the shuffle
        # is paid once and amortized over every kernel's fold.
        from pystreamfs_ray.kernels import get_kernel

        names = [kernel] if isinstance(kernel, str) else list(kernel)
        self.kernels = [(n, get_kernel(n)) for n in names]
        self.kernel_name = ",".join(names)
        self.batch_size = batch_size
        self.num_features = num_features
        self.kernel_params = dict(kernel_params or {})
        self.kernel_params.setdefault("num_features", num_features)
        self.entity_col = entity_col
        self.order_cols = tuple(order_cols)
        self.feature_cols = list(feature_cols or FEATURE_COLS)
        self.label_col = label_col
        self.ts_col = ts_col
        self.evaluate = evaluate
        self.max_history = max_history
        self.checkpoint_dir = checkpoint_dir
        self.fingerprint = fingerprint

    def __call__(self, group: pd.DataFrame) -> pa.Table:
        t_start = time.perf_counter()
        bucket_id = int(group["__bucket"].iloc[0]) if "__bucket" in group.columns else -1
        group = group.sort_values(
            [self.entity_col, *self.order_cols], kind="mergesort", ignore_index=True
        )
        if (
            "f_ts_delta_s" in self.feature_cols
            and "f_ts_delta_s" not in group.columns
            and self.ts_col
            and self.ts_col in group.columns
        ):
            # lag feature needs entity ordering → computed here, after the
            # one shuffle, instead of in the stateless featurizer
            from pystreamfs_ray.stages.window import add_lag_delta

            group = add_lag_delta(group, entity_col=self.entity_col, ts_col=self.ts_col)
        conv = group[self.entity_col].to_numpy()
        X_all = group[self.feature_cols].to_numpy(dtype=np.float64)
        Y_all = group[self.label_col].to_numpy()
        ts_all = (
            group[self.ts_col].to_numpy()
            if self.ts_col and self.ts_col in group.columns
            else None
        )

        o_kern: list[str] = []
        o_conv: list[str] = []
        o_wid: list[int] = []
        o_tsend: list = []
        o_nrows: list[int] = []
        o_w: list[np.ndarray] = []
        o_sel: list[np.ndarray] = []
        o_fscr: list = []
        o_acc: list = []
        o_wall: list[float] = []

        n_convs = 0
        for s, e in _entity_slices(conv):
            n_convs += 1
            cid = conv[s]
            X, Y = X_all[s:e], Y_all[s:e]
            for kname, kernel in self.kernels:
                state = kernel.init_state(X.shape[1], self.kernel_params)
                model = MODELS[self.evaluate]() if self.evaluate else None
                prev_sel = None
                for wid, i in enumerate(range(0, X.shape[0], self.batch_size)):
                    t0 = time.perf_counter()
                    w, state = kernel.update(
                        state,
                        X[i:i + self.batch_size],
                        Y[i:i + self.batch_size],
                        {"conv_id": cid, "window_id": wid},
                        **self.kernel_params,
                    )
                    selected = top_m_features(w, self.num_features)
                    wall_ms = (time.perf_counter() - t0) * 1000.0

                    acc = None
                    if model is not None:
                        acc = classify_window(
                            X, Y, i, self.batch_size, selected, model,
                            max_history=self.max_history,
                        )
                    o_kern.append(kname)
                    o_conv.append(cid)
                    o_wid.append(wid)
                    o_tsend.append(
                        ts_all[min(e - 1, s + i + self.batch_size - 1)]
                        if ts_all is not None else None
                    )
                    o_nrows.append(min(self.batch_size, X.shape[0] - i))
                    o_w.append(np.asarray(w, dtype=np.float64))
                    o_sel.append(selected.astype(np.int32))
                    o_fscr.append(
                        fscr_score(prev_sel, selected, self.num_features) if wid >= 1 else None
                    )
                    o_acc.append(acc)
                    o_wall.append(wall_ms)
                    prev_sel = selected

        out = pa.table(
            {
                "kernel": pa.array(o_kern, type=pa.string()),
                "conv_id": pa.array(o_conv, type=pa.string()),
                "window_id": pa.array(o_wid, type=pa.int64()),
                "ts_end": pa.array(o_tsend, type=pa.timestamp("us")),
                "n_rows": pa.array(o_nrows, type=pa.int32()),
                "w": pa.array([list(w) for w in o_w], type=pa.list_(pa.float64())),
                "selected": pa.array([list(s) for s in o_sel], type=pa.list_(pa.int32())),
                "fscr": pa.array(o_fscr, type=pa.float64()),
                "acc": pa.array(o_acc, type=pa.float64()),
                "wall_ms": pa.array(o_wall, type=pa.float64()),
            },
            schema=SELECTOR_OUTPUT_SCHEMA,
        )

        if self.checkpoint_dir is not None and bucket_id >= 0:
            from pystreamfs_ray.state.checkpoint import write_bucket_checkpoint

            wall_s = time.perf_counter() - t_start
            write_bucket_checkpoint(
                self.checkpoint_dir,
                bucket_id,
                out,
                kernel=self.kernel_name,
                params_fp=params_fingerprint(self.kernel_params),
                input_fp=self.fingerprint,
                n_convs=n_convs,
                rows_done=len(conv),
                wall_s=wall_s,
            )
        return out


def run_selector(
    features_ds,
    *,
    kernel: str = "ofs",
    batch_size: int = 50,
    num_features: int = 5,
    kernel_params: dict[str, Any] | None = None,
    entity_col: str = "conv_id",
    order_cols: tuple = ("turn_idx",),
    feature_cols: list[str] | None = None,
    label_col: str = "label",
    ts_col: str | None = "ts",
    evaluate: str | None = None,
    max_history: int | None = None,
    num_buckets: int = 64,
    concurrency=None,
    checkpoint_dir: str | None = None,
    fingerprint: str = "",
):
    """features Dataset → selector-output Dataset (one shuffle)."""
    kwargs = dict(
        kernel=kernel,
        batch_size=batch_size,
        num_features=num_features,
        kernel_params=kernel_params,
        entity_col=entity_col,
        order_cols=order_cols,
        feature_cols=feature_cols,
        label_col=label_col,
        ts_col=ts_col,
        evaluate=evaluate,
        max_history=max_history,
        checkpoint_dir=checkpoint_dir,
        fingerprint=fingerprint,
    )
    keep = [entity_col, *order_cols, label_col]
    if ts_col:
        keep.append(ts_col)
    keep += list(feature_cols or FEATURE_COLS)
    # prune to the columns the stage actually needs before the shuffle
    cols = [c for c in dict.fromkeys(keep) if c in features_ds.schema().names]
    ds = features_ds.select_columns(cols)
    bucketed = add_bucket(ds, entity_col, num_buckets)
    grouped = bucketed.groupby("__bucket")
    if concurrency is not None:
        # actor pool: kernel/registry setup happens once per actor
        return grouped.map_groups(
            BucketSelector,
            batch_format="pandas",
            fn_constructor_kwargs=kwargs,
            concurrency=concurrency,
        )
    return grouped.map_groups(BucketSelector(**kwargs), batch_format="pandas")
