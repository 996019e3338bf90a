"""Broadcast semi/anti joins and the Bloom-filter scale path."""

import numpy as np
import pyarrow as pa
import pytest


def test_bloom_no_false_negatives_and_bounded_fp():
    from pystreamfs_ray.stages.joins import BloomFilter

    rng = np.random.default_rng(3)
    present = rng.choice(10_000_000, size=50_000, replace=False).astype(np.int64)
    bf = BloomFilter(len(present), fp_rate=0.01)
    bf.add(present)
    assert bf.contains(present).all()  # no false negatives, ever

    absent = (present + 10_000_000).astype(np.int64)
    fp = bf.contains(absent).mean()
    assert fp < 0.03  # ~1% target with slack


def test_bloom_string_keys():
    from pystreamfs_ray.stages.joins import BloomFilter

    keys = np.array([f"conv-{i}" for i in range(5000)], dtype=object)
    bf = BloomFilter(len(keys), fp_rate=0.01)
    bf.add(keys)
    assert bf.contains(keys).all()
    other = np.array([f"other-{i}" for i in range(5000)], dtype=object)
    assert bf.contains(other).mean() < 0.03


def test_bloom_semi_join_superset_of_exact(ray_session):
    import ray.data as rd

    from pystreamfs_ray.stages.joins import BloomFilter, semi_join

    ids = np.arange(20_000, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"k": ids, "v": ids * 2})).repartition(4)
    keys = np.arange(0, 20_000, 7, dtype=np.int64)

    exact = semi_join(ds, keys, on="k").to_pandas()
    bf = BloomFilter(len(keys), fp_rate=0.01)
    bf.add(keys)
    bloomed = semi_join(ds, bf, on="k").to_pandas()  # dispatches on type

    # recall-exact: every true match survives; precision approximate
    assert set(exact["k"]) <= set(bloomed["k"])
    extras = len(bloomed) - len(exact)
    assert extras <= 0.03 * (len(ds.to_pandas()) - len(exact))


def test_build_bloom_from_dataset(ray_session):
    import ray.data as rd

    from pystreamfs_ray.stages.joins import build_bloom

    keys = np.arange(1000, dtype=np.int64) * 3
    kds = rd.from_arrow(pa.table({"k": keys})).repartition(3)
    bf = build_bloom(kds, "k", fp_rate=0.01)
    assert bf.contains(keys).all()
