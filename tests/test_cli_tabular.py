"""Tabular feature-materialization CLI: output pinned to the
standalone encoder queries; resume rebuilds only missing shards."""

import glob
import os
import shutil
import subprocess
import sys

import numpy as np
import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _run(out_dir, *extra):
    r = subprocess.run(
        [sys.executable, "-m", "pystreamfs_ray.cli_tabular",
         "--events", f"{SF}/events.parquet", "--out", out_dir,
         "--num-cpus", "4", *extra],
        capture_output=True, text=True, timeout=420, cwd=ROOT,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return r


def _load(out_dir):
    files = glob.glob(f"{out_dir}/features/shard=*/*.parquet")
    return (pd.concat([pd.read_parquet(p) for p in files])
            .sort_values("event_id", ignore_index=True))


def test_cli_tabular_matches_standalone_queries(ray_session, tmp_path):
    out = str(tmp_path / "tab")
    _run(out)
    feat = _load(out)

    from pystreamfs_ray.pipelines.queries import (
        q_cyclical_time, q_freq_encode, q_ordinal_encode,
        q_standard_scale)

    fe = (q_freq_encode(SF).to_pandas()
          .sort_values("event_id", ignore_index=True))
    assert (feat["freq"].to_numpy() == fe["freq"].to_numpy()).all()
    assert (feat["type_count"].to_numpy()
            == fe["type_count"].to_numpy()).all()

    oe = (q_ordinal_encode(SF).to_pandas()
          .sort_values("event_id", ignore_index=True))
    assert (feat["ord_code"].to_numpy() == oe["ord_code"].to_numpy()).all()

    ss = (q_standard_scale(SF).to_pandas()
          .sort_values("event_id", ignore_index=True))
    assert (feat["z_value"].to_numpy() == ss["z_value"].to_numpy()).all()

    ct = (q_cyclical_time(SF).to_pandas()
          .sort_values("event_id", ignore_index=True))
    for c in ("hour_sin", "hour_cos", "dow_sin", "dow_cos"):
        assert (feat[c].to_numpy() == ct[c].to_numpy()).all()

    # report is a valid data card
    import json
    rep = json.load(open(f"{out}/report.json"))
    assert rep["rows"] == len(feat)
    assert set(rep["ordinal_codes"].values()) == set(
        range(1, feat["event_type"].nunique() + 1))


def test_cli_tabular_resume_rebuilds_only_missing_shards(tmp_path):
    out = str(tmp_path / "tab")
    _run(out)
    full = _load(out)
    shard_dirs = sorted(glob.glob(f"{out}/features/shard=*"))
    assert len(shard_dirs) == 16
    # knock out two shards; mark the survivors
    for d in shard_dirs[:2]:
        shutil.rmtree(d)
    sentinel = f"{shard_dirs[5]}/SENTINEL"
    open(sentinel, "w").write("untouched")
    r = _run(out, "--resume")
    assert '"skipped": 14' in r.stdout
    assert os.path.exists(sentinel)  # surviving shards not rewritten
    again = _load(out)
    pd.testing.assert_frame_equal(
        full, again[full.columns].sort_values("event_id",
                                              ignore_index=True))
