"""Sources: CSV parity ingestion (S1), opt-in shuffle (O2), and
metadata-free block schemas (shuffle schema-dedup fast path)."""

import numpy as np
import pandas as pd
import pytest

CREDIT_CSV = "/root/reference/datasets/credit.csv"


def test_read_parquet_strips_pandas_metadata(ray_session):
    from pystreamfs_ray.sources import read_parquet

    ds = read_parquet("/root/testdata/sf0.001/events.parquet")
    t = ds.take_batch(10, batch_format="pyarrow")
    assert t.schema.metadata in (None, {})
    # metadata-free schemas are hashable → Ray's shuffle schema-dedup
    # fast path works (the "Failed to hash the schemas" warning source)
    hash(t.schema)


def test_read_csv_credit_shape(ray_session):
    from pystreamfs_ray.sources import read_csv

    ds = read_csv(CREDIT_CSV)
    assert ds.count() == 965
    t = ds.take_batch(5, batch_format="pyarrow")
    assert "target" in t.column_names
    hash(t.schema)


def test_csv_stream_source_selector_parity(ray_session, credit_data):
    """credit.csv via the CSV source through the distributed selector
    reproduces the reference kernel window-for-window (S1 + engine)."""
    from pystreamfs_ray.oracle import run_stream
    from pystreamfs_ray.sources import csv_stream_source
    from pystreamfs_ray.stages.selector import run_selector

    X, Y = credit_data
    ds = csv_stream_source(CREDIT_CSV, entity="credit")
    names = [f"f{i:02d}" for i in range(X.shape[1])]
    out = run_selector(
        ds, kernel="ofs", batch_size=50, num_features=5,
        feature_cols=names, ts_col=None, num_buckets=2,
    ).to_pandas().sort_values("window_id")
    oracle = run_stream(X, Y, "ofs", batch_size=50, num_features=5, conv_id="credit")
    assert len(out) == len(oracle)
    for _, row in out.iterrows():
        o = oracle[int(row["window_id"])]
        np.testing.assert_allclose(np.array(row["w"]), o["w"], rtol=1e-9, atol=1e-12)
        assert set(row["selected"]) == set(o["selected"])


def test_shuffle_stream_semantics_and_determinism(ray_session, credit_data):
    """O2: the opt-in stream shuffle is a seeded per-entity permutation
    of the order column — identical across block layouts, and the
    selector on the shuffled stream == the reference on the same
    permuted matrix."""
    from pystreamfs_ray.oracle import run_stream
    from pystreamfs_ray.sources import csv_stream_source, shuffle_stream
    from pystreamfs_ray.stages.selector import run_selector
    from pystreamfs_ray.util import stable_hash64

    X, Y = credit_data
    names = [f"f{i:02d}" for i in range(X.shape[1])]
    seed = 11

    outs = []
    for nblocks in (1, 4):
        ds = csv_stream_source(CREDIT_CSV, entity="credit").repartition(nblocks)
        sh = shuffle_stream(ds, seed=seed, num_buckets=4)
        outs.append(sh.to_pandas().sort_values("turn_idx", ignore_index=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])

    # ranks are a permutation of 0..n-1, and the row→rank map changed:
    # the stream read in rank order differs from the unshuffled stream
    ranks = outs[0]["turn_idx"].to_numpy()
    assert sorted(ranks) == list(range(len(ranks)))
    plain = (
        csv_stream_source(CREDIT_CSV, entity="credit")
        .to_pandas().sort_values("turn_idx", ignore_index=True)
    )
    assert (outs[0]["f00"].to_numpy() != plain["f00"].to_numpy()).any()

    # parity: selector on the shuffled stream == reference kernel on
    # the matrix reordered the same way
    sh = shuffle_stream(
        csv_stream_source(CREDIT_CSV, entity="credit"), seed=seed, num_buckets=4
    )
    out = run_selector(
        sh, kernel="ofs", batch_size=50, num_features=5,
        feature_cols=names, ts_col=None, num_buckets=2,
    ).to_pandas().sort_values("window_id")

    rng = np.random.default_rng([seed, stable_hash64("credit") & 0x7FFFFFFF])
    new_order = np.arange(len(X))[rng.permutation(len(X))]
    stream = np.argsort(new_order, kind="stable")
    oracle = run_stream(X[stream], Y[stream], "ofs", batch_size=50,
                        num_features=5, conv_id="credit")
    assert len(out) == len(oracle)
    for _, row in out.iterrows():
        o = oracle[int(row["window_id"])]
        np.testing.assert_allclose(np.array(row["w"]), o["w"], rtol=1e-9, atol=1e-12)


def test_random_shuffle_preserves_rows(ray_session):
    from pystreamfs_ray.sources import random_shuffle, read_parquet

    ds = read_parquet("/root/testdata/sf0.001/events.parquet",
                      columns=["event_id"])
    a = random_shuffle(ds, seed=5).to_pandas()["event_id"]
    base = read_parquet("/root/testdata/sf0.001/events.parquet",
                        columns=["event_id"]).to_pandas()["event_id"]
    assert sorted(a) == sorted(base)


def test_read_jsonl_roundtrip(ray_session, tmp_path):
    """JSONL ingest edge: transcript-shaped rows round-trip with the
    same values the parquet path yields."""
    import json

    import ray.data as rd

    from pystreamfs_ray.sources import read_jsonl

    rows = [
        {"conv_id": f"c{i % 3}", "turn_idx": i, "role": "user",
         "text": f"turn {i}", "tool": ""}
        for i in range(50)
    ]
    p = tmp_path / "t.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    ds = read_jsonl(str(p))
    df = ds.to_pandas().sort_values("turn_idx", ignore_index=True)
    assert len(df) == 50
    assert df["conv_id"].tolist() == [f"c{i % 3}" for i in range(50)]
    t = ds.take_batch(5, batch_format="pyarrow")
    hash(t.schema)  # metadata-free


def test_write_partitioned_parquet_layout(ray_session, tmp_path):
    """Hive-style partition dirs; a reader prunes by partition value."""
    import pyarrow as pa
    import ray.data as rd

    from pystreamfs_ray.sources import read_parquet, write_partitioned_parquet

    ds = rd.from_arrow(pa.table({
        "bucket": [0, 0, 1, 1, 2], "v": [1, 2, 3, 4, 5]
    }))
    out = str(tmp_path / "out")
    write_partitioned_parquet(ds, out, by="bucket")
    import os

    dirs = sorted(d for d in os.listdir(out) if d.startswith("bucket="))
    assert dirs == ["bucket=0", "bucket=1", "bucket=2"]
    only1 = read_parquet(os.path.join(out, "bucket=1")).to_pandas()
    assert sorted(only1["v"]) == [3, 4]


def test_hash_sampling_deterministic_and_stratified(ray_session):
    """sample_by_hash: layout-invariant keep set; stratified variant
    applies per-stratum rates with the same keep rule (so a stratum
    sampled at the same rate keeps IDENTICAL rows)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from pystreamfs_ray.sources import sample_by_hash, stratified_sample_by_hash

    n = 4000
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "src": np.where(np.arange(n) % 2 == 0, "a", "b")})
    t = pa.Table.from_pandas(df, preserve_index=False)

    kept1 = set(sample_by_hash(rd.from_arrow(t), "id", 0.5)
                .to_pandas()["id"])
    kept7 = set(sample_by_hash(rd.from_arrow(t).repartition(7), "id", 0.5)
                .to_pandas()["id"])
    assert kept1 == kept7  # pure function of the key, any parallelism
    assert 0.4 < len(kept1) / n < 0.6

    strat = stratified_sample_by_hash(
        rd.from_arrow(t), "src", "id", {"a": 0.5, "b": 0.1}).to_pandas()
    a = strat[strat.src == "a"]; b = strat[strat.src == "b"]
    # stratum 'a' at 0.5 == plain 0.5 sampling restricted to 'a'
    assert set(a["id"]) == {i for i in kept1 if i % 2 == 0}
    assert set(b["id"]) <= kept1  # 0.1 threshold is a subset of 0.5's
    assert 0.05 < len(b) / (n / 2) < 0.2


def test_write_jsonl_roundtrip(ray_session, tmp_path):
    """write_jsonl → read_jsonl round-trips values and row count."""
    import ray.data as rd

    from pystreamfs_ray.sources import read_jsonl, write_jsonl

    df = pd.DataFrame({"doc_id": np.arange(20, dtype=np.int64),
                       "text": [f"line {i}" for i in range(20)]})
    out_dir = str(tmp_path / "jsonl_sink")
    write_jsonl(rd.from_pandas(df).repartition(3), out_dir)
    back = (read_jsonl(out_dir).to_pandas()
            .sort_values("doc_id", ignore_index=True))
    pd.testing.assert_frame_equal(back[["doc_id", "text"]], df)
