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


def asof_join_time(
    left_ds,
    right_ds,
    *,
    left_on: str = "ts",
    right_on: str = "ts",
    how: str = "inner",
    allow_exact_matches: bool = True,
    right_suffix: str = "_r",
    matched_name: str | None = None,
    num_partitions: int = 32,
    boundary_sample: int = 4096,
    right_tiebreak: str | None = None,
):
    """GLOBAL (keyless) backward as-of join — the time-RANGE-partitioned
    variant for when there is no entity key to hash on (e.g. join every
    event to the latest preceding global state/price tick).

    Execution: time-range partition both sides on boundaries sampled
    from the right side, then fix the partition-edge case exactly: the
    latest right row of every PRECEDING partition is computed (one tiny
    per-partition argmax pass), cumulated on the driver (P rows), and
    the relevant carry row is replicated into each partition — so a
    left row at the start of a partition still sees its true
    predecessor. Output is EXACT for any boundary choice; boundary
    quality affects only balance. Payloads stay in Arrow; only
    timestamps and row indices are compared.

    ``right_tiebreak`` names a right column that breaks ties among
    right rows sharing the matched timestamp (the max value wins) —
    set it when right timestamps can repeat, so the join is
    deterministic and SQL-oracle-exact.
    """
    left_ds, ltypes = _ensure_arrow(left_ds)
    right_ds, rtypes = _ensure_arrow(right_ds)
    import ray
    import ray.data as rd

    left_cols = list(ltypes)
    right_payload = [c for c in rtypes if c != right_on]
    rename_right = {c: (c + right_suffix if c in ltypes else c) for c in right_payload}
    matched = matched_name or f"{right_on}_matched"

    fields = [pa.field(_SIDE, pa.int8()), pa.field(_RTS, rtypes[right_on])]
    fields += [pa.field(c, ltypes[c]) for c in left_cols]
    fields += [pa.field(rename_right[c], rtypes[c]) for c in right_payload]
    union_schema = pa.schema(fields)
    right_out_cols = [rename_right[c] for c in right_payload]
    out_schema = pa.schema(
        [pa.field(c, ltypes[c]) for c in left_cols]
        + [pa.field(matched, rtypes[right_on])]
        + [pa.field(rename_right[c], rtypes[c]) for c in right_payload]
    )

    # boundaries from a cheap right-side sample (exactness does NOT
    # depend on them — only partition balance does)
    from pystreamfs_ray.util import quantile_bounds, spread_sample_values

    # spread sample (not .limit() — prefix-biased on time-sorted input)
    ts_sample = spread_sample_values(
        right_ds, right_on, max_blocks=max(boundary_sample // 8, 1)
    ).astype("datetime64[us]").astype(np.int64)
    bounds = quantile_bounds(ts_sample, num_partitions).astype(np.int64)

    def _ts64(arr) -> np.ndarray:
        return arr.cast(pa.timestamp("us")).to_numpy(zero_copy_only=False).astype(np.int64)

    def _project(side: int, src_names: dict[str, str], on_col: str):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            arrays = []
            for field in union_schema:
                if field.name == _SIDE:
                    arrays.append(pa.array(np.full(n, side, dtype=np.int8)))
                elif field.name == _RTS:
                    arrays.append(t[on_col].cast(field.type))
                elif field.name in src_names:
                    arrays.append(t[src_names[field.name]].cast(field.type))
                else:
                    arrays.append(pa.nulls(n, field.type))
            out = pa.Table.from_arrays(arrays, schema=union_schema)
            part = np.searchsorted(bounds, _ts64(out[_RTS]), side="left")
            return out.append_column("__part", pa.array(part.astype(np.int32)))

        return fn

    lt = left_ds.map_batches(
        _project(0, {c: c for c in left_cols}, left_on), batch_format="pyarrow"
    )
    rt = right_ds.map_batches(
        _project(1, {rename_right[c]: c for c in right_payload}, right_on),
        batch_format="pyarrow",
    )

    # per-partition latest right row → cumulative carry (P rows total)
    def _latest(group: pa.Table) -> pa.Table:
        if isinstance(group, dict):
            group = pa.table(group)
        r = group.filter(pc.equal(group[_SIDE], 1))
        if len(r) == 0:
            return group.schema.empty_table()
        ts = _ts64(r[_RTS])
        if right_tiebreak is not None:
            tb = r[rename_right.get(right_tiebreak, right_tiebreak)].to_numpy(zero_copy_only=False)
            i = int(np.lexsort((tb, ts))[-1])
        else:
            i = int(np.argmax(ts))
        return r.slice(i, 1)

    latest_pdf = (
        rt.groupby("__part").map_groups(_latest, batch_format="pyarrow").to_pandas()
    )
    carries = []
    if len(latest_pdf):
        latest_pdf = latest_pdf.sort_values("__part", ignore_index=True)
        best = None  # latest right row among parts <= current
        by_part = {int(r["__part"]): r for _, r in latest_pdf.iterrows()}
        for p in range(len(bounds) + 1):
            if best is not None:
                c = best.copy()
                c["__part"] = p
                carries.append(c)
            cand = by_part.get(p)
            if cand is not None and (best is None or cand[_RTS] >= best[_RTS]):
                best = cand
    both = lt.union(rt)
    if carries:
        carry_t = pa.Table.from_pandas(
            pd.DataFrame(carries), preserve_index=False
        ).select([f.name for f in union_schema] + ["__part"])
        carry_t = pa.table(
            {
                **{f.name: carry_t[f.name].cast(f.type) for f in union_schema},
                "__part": carry_t["__part"].cast(pa.int32()),
            }
        )
        both = both.union(rd.from_arrow(carry_t))

    def _merge(group: pa.Table) -> pa.Table:
        if isinstance(group, dict):
            group = pa.table(group)
        left_t = group.filter(pc.equal(group[_SIDE], 0))
        right_t = group.filter(pc.equal(group[_SIDE], 1))
        if len(left_t) == 0:
            return out_schema.empty_table()
        lts = _ts64(left_t[_RTS])
        rts = _ts64(right_t[_RTS])
        if right_tiebreak is not None and len(right_t):
            tb = right_t[rename_right.get(right_tiebreak, right_tiebreak)].to_numpy(zero_copy_only=False)
            order = np.lexsort((tb, rts))
        else:
            order = np.argsort(rts, kind="stable")
        rts_sorted = rts[order]
        side = "right" if allow_exact_matches else "left"
        pos = np.searchsorted(rts_sorted, lts, side=side) - 1
        have = pos >= 0
        if how == "inner":
            keep = np.flatnonzero(have)
        else:
            keep = np.arange(len(left_t))
        ri = pa.array(
            [int(order[pos[i]]) if have[i] else None for i in keep], type=pa.int64()
        )
        left_sel = left_t.take(pa.array(keep.astype(np.int64)))
        right_sel = right_t.take(ri)
        arrays = [left_sel[c] for c in left_cols]
        arrays.append(right_sel[_RTS])
        arrays += [right_sel[c] for c in right_out_cols]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return both.groupby("__part").map_groups(_merge, batch_format="pyarrow")
