"""The reference's five examples, ported — smoke (matrix path)."""

import subprocess
import sys

import pytest

EX = "/root/repo/examples"


@pytest.mark.parametrize("name", ["fsds", "efs", "mcnn", "cancelout"])
def test_example_matrix_path(name):
    out = subprocess.run(
        [sys.executable, f"{EX}/example_{name}.py"],
        capture_output=True, text=True, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "avg accuracy:" in out.stdout


def test_example_corpus_pipeline():
    """Full curation walkthrough incl. the round-3 ops (temperature
    mixing, unigram-LM nll, RRF probe) — subprocess so it owns its own
    Ray session like a user run."""
    out = subprocess.run(
        [sys.executable, f"{EX}/example_corpus_pipeline.py"],
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "docs kept by T=2 mixing:" in out.stdout
    assert "RRF top-5 doc ids:" in out.stdout


def test_example_preference_data():
    """RLHF/DPO data-prep walk — subprocess owns its Ray session."""
    out = subprocess.run(
        [sys.executable, f"{EX}/example_preference_data.py"],
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "DPO pairs:" in out.stdout
    assert "loss spans:" in out.stdout


def test_example_media_pipeline():
    """Real-codec decode walk + MMR retrieval — subprocess so it owns
    its own Ray session."""
    out = subprocess.run(
        [sys.executable, f"{EX}/example_media_pipeline.py"],
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "round-trip spot checks pass" in out.stdout
    assert "MMR diverse top-8" in out.stdout


def test_example_incremental_ingest(tmp_path):
    """Incremental-ingestion loop: bootstrap index → two arrival-batch
    runs, each deduped against the persisted index — subprocess so it
    owns its Ray session."""
    out = subprocess.run(
        [sys.executable, f"{EX}/example_incremental_ingest.py",
         "/root/testdata/sf0.001", str(tmp_path / "ingest")],
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "bootstrap:" in out.stdout
    assert "run 2 (test): kept" in out.stdout


def test_example_similarity_search(tmp_path):
    """Quantize → persist int8 index → query from the persisted index,
    recall-checked against float exact — subprocess so it owns its Ray
    session."""
    out = subprocess.run(
        [sys.executable, f"{EX}/example_similarity_search.py",
         "/root/testdata/sf0.001", str(tmp_path / "sim")],
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "recall@10" in out.stdout
    mean = float(out.stdout.split("mean=")[1].split()[0])
    assert mean >= 0.9


def test_example_sft_export(tmp_path):
    """SFT export walkthrough: transcripts → pairs → holdout splits →
    sharded JSONL with resume — subprocess so it owns its Ray session."""
    out = subprocess.run(
        [sys.executable, f"{EX}/example_sft_export.py",
         "/root/testdata/sf0.001", str(tmp_path / "sft")],
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "train:" in out.stdout and "resume skipped shards:" in out.stdout


def test_example_data_health():
    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable, f"{EX}/example_data_health.py"],
        capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "language consistency:" in r.stdout
    assert "PSI:" in r.stdout


def test_example_feature_store(tmp_path):
    out = subprocess.run(
        [sys.executable, f"{EX}/example_feature_store.py",
         "/root/testdata/sf0.001", str(tmp_path / "store")],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "feature table:" in out.stdout
    assert "wrote" in out.stdout and "shards" in out.stdout


def test_example_experiment_readout():
    """A/B lift + survival + RFM readout trio — subprocess so it owns
    its own Ray session."""
    out = subprocess.run(
        [sys.executable, f"{EX}/example_experiment_readout.py"],
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ab lift:" in out.stdout
    assert "day-0 hazard=" in out.stdout
    assert "users segmented" in out.stdout


def test_example_feature_selection():
    """Feature-selection readout (MI ranking, WoE/IV, leakage audit,
    PSI drift) — subprocess so it owns its own Ray session."""
    out = subprocess.run(
        [sys.executable, f"{EX}/example_feature_selection.py"],
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "mi ranking:" in out.stdout
    assert "woe encoding:" in out.stdout
    assert "psi drift:" in out.stdout


def test_example_encoders():
    """Categorical-encoder + scaler readout — subprocess so it owns
    its own Ray session."""
    out = subprocess.run(
        [sys.executable, f"{EX}/example_encoders.py"],
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "freq encode:" in out.stdout
    assert "ordinal encode:" in out.stdout
    assert "standard scale:" in out.stdout
    assert "calibration:" in out.stdout


def test_example_quality_audit():
    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable, f"{EX}/example_quality_audit.py"],
        capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "LSH audit:" in r.stdout
    assert "CUSUM:" in r.stdout
