"""CLI surface: flagship over parquet paths → partitioned outputs."""

import glob
import json

import pyarrow.parquet as pq


def test_cli_end_to_end(ray_session, synth_dirs, tmp_path, capsys):
    from pystreamfs_ray.cli import main

    out = str(tmp_path / "out")
    rc = main([
        "--transcripts", synth_dirs["transcripts"],
        "--labels", synth_dirs["labels"],
        "--out", out,
        "--kernel", "ofs",
        "--batch-size", "20",
        "--evaluate", "knn", "--max-history", "100",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--num-buckets", "8",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["windows"] > 0 and report["joined"] > 0

    assert glob.glob(f"{out}/windows/*.parquet")
    assert glob.glob(f"{out}/joined/*.parquet")
    s = pq.read_table(f"{out}/summary.parquet").to_pandas()
    assert 0 <= float(s["acc_avg"][0]) <= 1

    # manifests carry lineage + throughput + watermark lag
    from pystreamfs_ray.state.checkpoint import lineage_summary

    mani = lineage_summary(str(tmp_path / "ckpt"))
    assert mani and all(m["rows_per_sec"] > 0 for m in mani)
    assert all(m.get("window_lag_s") is not None for m in mani)


def test_cli_salt_threshold_same_outputs(ray_session, synth_dirs, tmp_path, capsys):
    """--salt-threshold routes mega-entity eval through the salted
    evaluator; CLI outputs must match the inline run row-for-row."""
    import pandas as pd

    from pystreamfs_ray.cli import main

    outs = {}
    for label, extra in (("inline", []), ("salted", ["--salt-threshold", "60"])):
        out = str(tmp_path / label)
        rc = main([
            "--transcripts", synth_dirs["transcripts"],
            "--out", out,
            "--kernel", "ofs",
            "--batch-size", "20",
            "--evaluate", "knn", "--max-history", "100",
            "--num-buckets", "4",
            *extra,
        ])
        assert rc == 0
        capsys.readouterr()
        df = pq.read_table(f"{out}/windows").to_pandas()
        outs[label] = df.sort_values(
            ["kernel", "conv_id", "window_id"], ignore_index=True)
    a, b = outs["inline"], outs["salted"]
    assert len(a) == len(b) > 0
    pd.testing.assert_frame_equal(
        a[["kernel", "conv_id", "window_id", "acc", "fscr"]],
        b[["kernel", "conv_id", "window_id", "acc", "fscr"]])


def test_cli_curate_end_to_end(ray_session, tmp_path, capsys):
    """Curation CLI: dedup+filters+budget → Hive layout + report."""
    from pystreamfs_ray.cli_curate import main

    out = str(tmp_path / "curated")
    rc = main([
        "--documents", "/root/testdata/sf0.001/documents.parquet",
        "--out", out,
        "--lang", "en", "--quality-min", "0.2",
        "--dedup", "keep-best", "--budget-tokens", "1200",
        "--join-partitions", "2",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["n_docs"] > 0 and report["total_tokens"] > 0

    # resumable Hive layout: one directory per source
    src_dirs = glob.glob(f"{out}/docs/source=*")
    assert len(src_dirs) > 1
    t = pq.read_table(src_dirs[0])
    assert {"doc_id", "n_tokens", "quality_score"} <= set(t.column_names)
    # per-source budget respected
    full = json.load(open(f"{out}/report.json"))
    assert all(s["total_tokens"] <= 1200 for s in full["sources"])


def test_cli_curate_resume_skips_done_sources(ray_session, tmp_path, capsys):
    """--resume leaves finished source partitions alone and the report
    still covers the full on-disk corpus."""
    import os

    from pystreamfs_ray.cli_curate import main

    out = str(tmp_path / "curated_r")
    args = ["--documents", "/root/testdata/sf0.001/documents.parquet",
            "--out", out, "--lang", "en", "--quality-min", "0.2",
            "--join-partitions", "2"]
    assert main(args) == 0
    first = json.load(open(f"{out}/report.json"))
    src_dirs = sorted(glob.glob(f"{out}/docs/source=*"))
    # tamper-proof marker: file count per done partition must not change
    before = {d: len(glob.glob(f"{d}/*.parquet")) for d in src_dirs}
    mtimes = {d: max(os.path.getmtime(f) for f in glob.glob(f"{d}/*.parquet"))
              for d in src_dirs}

    capsys.readouterr()
    assert main(args + ["--resume"]) == 0
    second = json.load(open(f"{out}/report.json"))
    # nothing rewritten...
    after = {d: len(glob.glob(f"{d}/*.parquet")) for d in src_dirs}
    mtimes2 = {d: max(os.path.getmtime(f) for f in glob.glob(f"{d}/*.parquet"))
               for d in src_dirs}
    assert after == before and mtimes2 == mtimes
    # ...and the report still reflects the full corpus
    assert second["n_docs"] == first["n_docs"]
    assert second["total_tokens"] == first["total_tokens"]
