"""FIXTURES.md §F5: the reference's own dataset (credit.csv) pushed
through the DISTRIBUTED engine as a single-entity stream must reproduce
the reference kernels window-for-window (engine ↔ oracle here; oracle ↔
reference verbatim is asserted in test_kernels_parity.py — together:
engine ↔ reference)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pystreamfs_ray.oracle import run_stream
from pystreamfs_ray.stages.selector import run_selector

FEATURE_NAMES = [f"f{i:02d}" for i in range(23)]


def _credit_ds(credit_data, n_files=3):
    """credit.csv as a transcript-shaped table, rows shuffled across
    blocks so ordering must be recovered."""
    X, Y = credit_data
    df = pd.DataFrame(X, columns=FEATURE_NAMES)
    df.insert(0, "conv_id", "credit")
    df.insert(1, "turn_idx", np.arange(len(df), dtype=np.int32))
    df["label"] = Y.astype(np.int8)
    rng = np.random.default_rng(3)
    df = df.iloc[rng.permutation(len(df))].reset_index(drop=True)
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


@pytest.mark.parametrize("kernel", ["ofs", "efs", "fsds"])
def test_engine_on_credit_matches_reference_math(ray_session, credit_data, kernel):
    X, Y = credit_data
    ds = _credit_ds(credit_data)
    out = run_selector(
        ds, kernel=kernel, batch_size=50, num_features=5,
        feature_cols=FEATURE_NAMES, ts_col=None, num_buckets=4,
    ).to_pandas().sort_values("window_id")
    oracle = run_stream(X, Y, kernel, batch_size=50, num_features=5, conv_id="credit")
    assert len(out) == len(oracle) == 20
    for _, row in out.iterrows():
        o = oracle[int(row["window_id"])]
        np.testing.assert_allclose(np.array(row["w"]), o["w"], rtol=1e-9, atol=1e-12)
        assert set(row["selected"]) == set(o["selected"])


def test_block_permutation_invariance(ray_session, credit_data):
    """Different input file/block layouts must give identical results
    (ordering recovered, never assumed)."""
    outs = []
    for n_files in (1, 5):
        ds = _credit_ds(credit_data, n_files).repartition(n_files)
        out = run_selector(
            ds, kernel="ofs", batch_size=50, num_features=5,
            feature_cols=FEATURE_NAMES, ts_col=None, num_buckets=4,
        ).to_pandas().sort_values("window_id", ignore_index=True)
        outs.append(out)
    a, b = outs
    for wa, wb in zip(a["w"], b["w"]):
        assert np.array_equal(np.array(wa), np.array(wb))
