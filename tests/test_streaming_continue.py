"""Streaming continuation: split a stream into two runs with carried
kernel state + pending rows + bounded eval history → identical output
to one full run (exact mid-stream resume, SURVEY.md §2.8/§4)."""

import glob

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _split_by_turn(dirpath, frac=0.45):
    t = pa.concat_tables([pq.read_table(p) for p in sorted(glob.glob(f"{dirpath}/*.parquet"))])
    df = t.to_pandas()
    cut = df.groupby("conv_id")["turn_idx"].transform(
        lambda s: int(len(s) * frac)
    )
    part1 = df[df["turn_idx"] < cut]
    part2 = df[df["turn_idx"] >= cut]
    return (pa.Table.from_pandas(part1, preserve_index=False),
            pa.Table.from_pandas(part2, preserve_index=False))


@pytest.mark.parametrize("evaluate,max_history", [(None, None), ("knn", 60)])
def test_two_run_streaming_equals_one_shot(ray_session, synth_dirs, tmp_path,
                                           evaluate, max_history):
    import ray.data as rd

    from pystreamfs_ray.pipelines.flagship import feature_windows

    bs = 20
    ckpt = str(tmp_path / f"stream_ckpt_{evaluate}")
    common = dict(kernel=["ofs", "efs"], batch_size=bs, num_features=5,
                  num_buckets=8, evaluate=evaluate, max_history=max_history)

    full = feature_windows(
        rd.read_parquet(synth_dirs["transcripts"]), **common
    ).to_pandas()

    p1, p2 = _split_by_turn(synth_dirs["transcripts"])
    out1 = feature_windows(
        rd.from_arrow(p1), **common,
        streaming=True, flush=False, checkpoint_dir=ckpt,
    ).to_pandas()
    out2 = feature_windows(
        rd.from_arrow(p2), **common,
        streaming=True, flush=True, load_state=True, checkpoint_dir=ckpt,
    ).to_pandas()

    both = pd.concat([out1, out2], ignore_index=True)
    key = ["kernel", "conv_id", "window_id"]
    a = full.sort_values(key, ignore_index=True)
    b = both.sort_values(key, ignore_index=True)
    assert len(a) == len(b)
    assert (a["window_id"].to_numpy() == b["window_id"].to_numpy()).all()
    assert (a["n_rows"].to_numpy() == b["n_rows"].to_numpy()).all()
    for wa, wb in zip(a["w"], b["w"]):
        np.testing.assert_array_equal(np.array(wa), np.array(wb))
    fa, fb = a["fscr"].to_numpy(), b["fscr"].to_numpy()
    assert ((fa == fb) | (np.isnan(fa) & np.isnan(fb))).all()
    if evaluate:
        ea, eb = a["acc"].to_numpy(), b["acc"].to_numpy()
        np.testing.assert_array_equal(ea, eb)


def test_bucket_state_lineage_validation(tmp_path):
    """State written under one kernel/params/input lineage is rejected
    (→ {}) when read back under a different lineage (ADVICE r1)."""
    from pystreamfs_ray.state.checkpoint import read_bucket_state, write_bucket_state

    root = str(tmp_path / "ckpt")
    lin_a = {"kernel": "ofs", "params_fingerprint": "p1", "input_fingerprint": "i1"}
    lin_b = {"kernel": "fsds", "params_fingerprint": "p2", "input_fingerprint": "i1"}
    states = {"conv-0": {"next_window": 7}}
    write_bucket_state(root, 3, states, lineage=lin_a)
    assert read_bucket_state(root, 3, lineage=lin_a) == states
    assert read_bucket_state(root, 3, lineage=lin_b) == {}
    assert read_bucket_state(root, 99, lineage=lin_a) == {}
