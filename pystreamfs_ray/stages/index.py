"""Inverted index construction: term → (document frequency, posting
list) over a text column.

The reference never indexes (it streams feature matrices); a corpus
engine needs the inverted index for exact phrase/term search and for
df-based filters (the TF-IDF operator in ``stages/textstats`` already
computes df — this materializes the postings themselves).

Scale shape: the per-batch combiner dedups (term, doc) pairs locally,
so the single hash shuffle on the term carries one row per DISTINCT
(term, doc) pair, not one per occurrence. Posting lists concentrate on
the term's reducer — bounded by ``max_df`` (stopword-scale terms are
the skew hazard at corpus scale: a term in every document would gather
n_docs ids on one reducer; cap or drop them, which search engines do
anyway).

Tokens are ``\\S+`` runs, matching ``stages/textstats`` and the DuckDB
oracle's ``regexp_extract_all(text, '\\S+')``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def inverted_index(ds, *, id_col: str = "doc_id", text_col: str = "text",
                   min_df: int = 2, max_df: int | None = None):
    """Dataset of ``(term, df, postings)`` where ``postings`` is the
    comma-joined ascending id list of documents containing the term
    (string form — hashable/portable, and the natural on-disk layout).
    Terms with ``df < min_df`` (or ``> max_df`` if set) are dropped."""

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        # combiner: unique (term, doc) within the batch
        s = df[text_col].str.findall(r"\S+")
        n = s.map(len).to_numpy(np.int64)
        out = pd.DataFrame({
            "term": np.concatenate([np.array(v, dtype=object) for v in s])
            if n.sum() else np.array([], dtype=object),
            id_col: np.repeat(df[id_col].to_numpy(), n),
        })
        return out.drop_duplicates()

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].to_numpy())
        df_count = len(ids)
        if df_count < min_df or (max_df is not None and df_count > max_df):
            return pd.DataFrame({"term": [], "df": pd.Series([], dtype=np.int64),
                                 "postings": []})
        return pd.DataFrame({
            "term": [g["term"].iloc[0]],
            "df": np.array([df_count], dtype=np.int64),
            "postings": [",".join(map(str, ids))],
        })

    return (ds.select_columns([id_col, text_col])
            .map_batches(pairs, batch_format="pandas")
            .groupby("term")
            .map_groups(finish, batch_format="pandas"))
