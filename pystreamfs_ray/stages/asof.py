"""As-of (point-in-time) join — the engine's leakage-free centerpiece.

The reference's only join-like computation is the prequential prefix
rule: the model scored at window *i* trains only on rows before *i*
(`/root/reference/pystreamfs/utils.py:35-45`). Generalized over entity
time-series: for every left row (label event) take the latest right row
(feature state) of the same entity with ``right.ts <= left.ts``
(direction="backward", exact matches allowed) — zero temporal leakage by
construction, asserted by a property test.

Execution: ONE hash shuffle. Both sides are projected onto a common
Arrow schema with a side tag, unioned, hash-bucketed by the entity key,
and each bucket merges per entity. Blocks stay **Arrow end-to-end**
(list/nested payload columns like weight vectors survive untouched);
only a minimal (key, ts, row-index) frame goes through
``pandas.merge_asof``, and payloads are gathered back with Arrow
``take``. Skew note: a mega-entity's rows all land in one bucket, but
the per-bucket merge is O(n log n) sort + O(n) scan — no quadratic
blowup; raise ``num_buckets`` so a hot key shares its bucket with
little else.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from pystreamfs_ray.stages.window import DEFAULT_BUCKETS
from pystreamfs_ray.util import bucket_array

_RTS = "__rts"
_SIDE = "__side"
_BUCKET = "__bucket"


def _ensure_arrow(ds):
    """Return (ds, {name: pyarrow type}); converts pandas-block datasets
    (whose schema reports numpy dtypes) to Arrow blocks first."""
    sch = ds.schema()
    if not all(isinstance(t, pa.DataType) for t in sch.types):
        ds = ds.map_batches(lambda t: t, batch_format="pyarrow")
        sch = ds.schema()
    return ds, dict(zip(sch.names, sch.types))


def asof_join(
    left_ds,
    right_ds,
    *,
    by: str = "conv_id",
    left_on: str = "ts",
    right_on: str = "ts",
    how: str = "inner",
    direction: str = "backward",
    allow_exact_matches: bool = True,
    right_suffix: str = "_r",
    matched_name: str | None = None,
    num_buckets: int = DEFAULT_BUCKETS,
    concurrency=None,
):
    """Point-in-time join of ``right_ds`` features onto ``left_ds`` rows."""
    left_ds, ltypes = _ensure_arrow(left_ds)
    right_ds, rtypes = _ensure_arrow(right_ds)

    left_cols = [c for c in ltypes if c != by]
    right_payload = [c for c in rtypes if c not in (by, right_on)]
    rename_right = {
        c: (c + right_suffix if c in ltypes or c == by else c) for c in right_payload
    }
    matched = matched_name or f"{right_on}_matched"

    fields = [pa.field(by, ltypes[by]), pa.field(_SIDE, pa.int8())]
    fields += [pa.field(c, ltypes[c]) for c in left_cols]
    fields += [pa.field(_RTS, rtypes[right_on])]
    fields += [pa.field(rename_right[c], rtypes[c]) for c in right_payload]
    union_schema = pa.schema(fields)

    right_out_cols = [rename_right[c] for c in right_payload]
    out_schema = pa.schema(
        [pa.field(by, ltypes[by])]
        + [pa.field(c, ltypes[c]) for c in left_cols]
        + [pa.field(matched, rtypes[right_on])]
        + [pa.field(rename_right[c], rtypes[c]) for c in right_payload]
    )

    def _project(side: int, src_names: dict[str, str]):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            arrays = []
            for field in union_schema:
                if field.name == _SIDE:
                    arrays.append(pa.array(np.full(n, side, dtype=np.int8)))
                elif field.name == _BUCKET:
                    continue
                elif field.name in src_names:
                    arrays.append(t[src_names[field.name]].cast(field.type))
                else:
                    arrays.append(pa.nulls(n, field.type))
            return pa.Table.from_arrays(arrays, schema=union_schema)

        return fn

    lmap = {by: by, **{c: c for c in left_cols}}
    rmap = {by: by, _RTS: right_on, **{rename_right[c]: c for c in right_payload}}
    lt = left_ds.map_batches(_project(0, lmap), batch_format="pyarrow")
    rt = right_ds.map_batches(_project(1, rmap), batch_format="pyarrow")
    both = lt.union(rt)

    def _assign(t: pa.Table) -> pa.Table:
        keys = t[by].cast(pa.string()).to_pylist()
        return t.append_column(
            _BUCKET, pa.array(bucket_array(keys, num_buckets), type=pa.int32())
        )

    def _merge(group: pa.Table) -> pa.Table:
        if isinstance(group, dict):  # map_groups may hand dict-of-numpy
            group = pa.table(group)
        left_t = group.filter(pc.equal(group[_SIDE], 0)).select([by, *left_cols])
        right_t = group.filter(pc.equal(group[_SIDE], 1)).select(
            [by, _RTS, *right_out_cols]
        )
        if len(left_t) == 0:
            return out_schema.empty_table()

        # minimal frames: (key, ts, row-index); payloads stay in Arrow
        ldf = pd.DataFrame(
            {
                by: left_t[by].to_pandas(),
                "__lts": left_t[left_on].to_pandas(),
                "__li": np.arange(len(left_t), dtype=np.int64),
            }
        ).sort_values("__lts", kind="mergesort", ignore_index=True)
        rdf = pd.DataFrame(
            {
                by: right_t[by].to_pandas(),
                _RTS: right_t[_RTS].to_pandas(),
                "__ri": np.arange(len(right_t), dtype=np.int64),
            }
        ).sort_values(_RTS, kind="mergesort", ignore_index=True)

        m = pd.merge_asof(
            ldf,
            rdf,
            left_on="__lts",
            right_on=_RTS,
            by=by,
            direction=direction,
            allow_exact_matches=allow_exact_matches,
        )
        if how == "inner":
            m = m[m["__ri"].notna()]

        li = pa.array(m["__li"].to_numpy(dtype=np.int64))
        ri = pa.array(
            [None if pd.isna(v) else int(v) for v in m["__ri"]], type=pa.int64()
        )
        left_sel = left_t.take(li)
        right_sel = right_t.take(ri)

        arrays = [left_sel[by]]
        arrays += [left_sel[c] for c in left_cols]
        arrays += [right_sel[_RTS]]
        arrays += [right_sel[c] for c in right_out_cols]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return (
        both.map_batches(_assign, batch_format="pyarrow")
        .groupby(_BUCKET)
        .map_groups(_merge, batch_format="pyarrow", concurrency=concurrency)
    )
