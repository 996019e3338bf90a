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
    salt_eval_threshold: int | None = None,
    salt_chunk_windows: int = 25,
):
    """transcripts → per-(entity, window) selector output Dataset.

    ``salt_eval_threshold`` turns on the SKEW ROUTER for the prequential
    evaluation: the kernel fold is sequential per entity by contract,
    but the eval of a mega-conversation (one entity with ≫ threshold
    turns) is the straggler task that caps utilization. Entities above
    the threshold keep their fold inline but have their eval offloaded
    to the salted parallel evaluator (stages/evaluate.py, bit-identical
    by test) in ``salt_chunk_windows``-window chunks, then the acc
    values are patched back. Mega entities are by definition FEW (the
    skew tail), so the patch table broadcast is bounded; requires
    ``evaluate`` and a bounded ``max_history``. Incompatible with
    streaming/checkpoint runs (eval state is not carried) — ignored
    there."""
    feats = featurize(transcripts_ds)
    salting = bool(
        salt_eval_threshold and evaluate and max_history and not streaming
        and checkpoint_dir is None
    )
    mega_ids: frozenset = frozenset()
    if salting:
        # count on the RAW transcripts (one pruned column), not on the
        # featurized rows — the counts pass must not pay the featurizer
        mega_ids = _entities_above(
            transcripts_ds.select_columns(["conv_id"]), "conv_id",
            salt_eval_threshold)
        salting = bool(mega_ids)
    windows = run_selector(
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
        skip_eval_ids=mega_ids,
    )
    if not salting:
        return windows
    # windows feed BOTH the spec extraction and the patch base —
    # materialize so the selector fold runs once (its output is
    # n_windows rows, ~batch_size× smaller than the input; at true
    # scale this is the point where you'd write_parquet instead)
    windows = windows.materialize()
    import ray
    from pystreamfs_ray.stages.evaluate import evaluate_windows

    ids_ref = ray.put(mega_ids)

    def only_mega(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        ids = ray.get(ids_ref)
        return t.filter(pc.is_in(t["conv_id"], value_set=pa.array(list(ids))))

    specs_mega = windows.map_batches(only_mega, batch_format="pyarrow") \
        .select_columns(["kernel", "conv_id", "window_id", "selected"])
    # featurize AFTER the id filter (stateless per row, so filter and
    # featurize commute) — only the few mega entities' rows pay it twice
    feats_mega = featurize(
        transcripts_ds.map_batches(only_mega, batch_format="pyarrow"))
    accs = evaluate_windows(
        feats_mega, specs_mega, batch_size=batch_size,
        max_history=max_history, model=evaluate,
        chunk_windows=salt_chunk_windows,
        num_buckets=min(num_buckets, 64),
    ).to_pandas()  # bounded: windows of the FEW mega entities only
    patch_ref = ray.put({
        (k, c, int(w)): a
        for k, c, w, a in zip(accs["kernel"], accs["conv_id"],
                              accs["window_id"], accs["acc"])
    })

    def patch_acc(df):
        import numpy as np
        import pandas as pd

        ids = ray.get(ids_ref)
        lut = ray.get(patch_ref)
        m = df["conv_id"].isin(ids).to_numpy()
        if m.any():
            keys = list(zip(df.loc[m, "kernel"], df.loc[m, "conv_id"],
                            df.loc[m, "window_id"].astype(int)))
            df = df.copy()
            df.loc[m, "acc"] = pd.array(
                [lut.get(k, np.nan) for k in keys], dtype="float64")
        return df

    return windows.map_batches(patch_acc, batch_format="pandas")


def _entities_above(ds, entity_col: str, threshold: int,
                    summary_capacity: int = 4096) -> frozenset:
    """Entity ids with row count > threshold, as a SKEW DETECTOR.

    A full per-entity count aggregate would shuffle one partial row per
    (entity, block) — with millions of entities that is as large as the
    input (measured: the naive groupby cost 8 s where the whole counts
    pass should cost well under 1 s). Instead:

    1. candidate pass (bounded-summary heavy hitters): each batch emits
       (id, local_count) only for ids with local_count > len(batch)/k
       (k = ``summary_capacity``; at most k ids can clear that floor),
       plus one sentinel row carrying len(batch). Summing the partials,
       any id's undercount is ≤ Σ len(batch)/k = n/k — the Misra-Gries
       bound — so every entity with true count > threshold has summed
       count > threshold − n/k. Ids above that slack-adjusted cutoff
       are the candidates. Sound at ANY batch/block count (the round-3
       version pigeonholed on an assumed ≤64 blocks and silently went
       lossy beyond it); shuffle ≤ (k+1) rows per batch regardless of
       entity cardinality.
    2. exact pass: count ONLY the candidates (broadcast set, vectorized
       filter) — a shuffle of |candidates| × blocks partial rows —
       because pass-1 sums are undercounts and include near-misses.

    Requires a string-typed ``entity_col`` (the sentinel rides in-band).
    """
    import numpy as np
    import pandas as pd

    import ray
    from pystreamfs_ray.util import arrow_block

    k = int(summary_capacity)
    sentinel = "\x00__rows__"

    def local_heavy(df: pd.DataFrame) -> pd.DataFrame:
        floor = max(1, len(df) // k)
        vc = df[entity_col].value_counts()
        vc = vc[vc > floor]
        return arrow_block(pd.DataFrame({
            entity_col: np.concatenate(
                [vc.index.to_numpy(dtype=object), [sentinel]]),
            "__n": np.concatenate(
                [vc.to_numpy(dtype=np.int64), [len(df)]]),
        }))

    from ray.data.aggregate import Sum

    col = ds.select_columns([entity_col])
    partial = (col.map_batches(local_heavy, batch_format="pandas")
               .groupby(entity_col).aggregate(Sum("__n", alias_name="__n"))
               .to_pandas())
    if len(partial) == 0 or entity_col not in partial.columns:
        return frozenset()
    is_sent = partial[entity_col] == sentinel
    n_total = int(partial.loc[is_sent, "__n"].sum())
    cutoff = int(threshold) - (n_total // k)  # slack-adjusted: no false negatives
    cand_pdf = partial.loc[~is_sent & (partial["__n"] > cutoff)]
    if len(cand_pdf) == 0:
        return frozenset()
    candidates = frozenset(cand_pdf[entity_col])
    cand_ref = ray.put(candidates)

    def count_candidates(df: pd.DataFrame) -> pd.DataFrame:
        cand = ray.get(cand_ref)
        vc = df.loc[df[entity_col].isin(cand), entity_col].value_counts()
        return arrow_block(pd.DataFrame(
            {entity_col: vc.index.to_numpy(), "__n": vc.to_numpy()}))

    from ray.data.aggregate import Sum

    exact = (col.map_batches(count_candidates, batch_format="pandas")
             .groupby(entity_col).aggregate(Sum("__n", alias_name="__n"))
             .filter(expr=f"__n > {int(threshold)}")
             .to_pandas())
    if len(exact) == 0 or entity_col not in exact.columns:
        return frozenset()
    return frozenset(exact[entity_col])


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
    salt_eval_threshold: int | None = None,
    salt_chunk_windows: int = 25,
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
        salt_eval_threshold=salt_eval_threshold,
        salt_chunk_windows=salt_chunk_windows,
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
