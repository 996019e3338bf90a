"""Round-4 additions: scale-sound skew detector, grouped-quantile
sketch path, streaming skew router, new operator queries."""

import numpy as np
import pandas as pd
import pytest


def test_entities_above_256_blocks(ray_session):
    """The round-3 detector pigeonholed on an assumed <=64 blocks; an
    entity spread thinly over 256 blocks (4 rows/block, 1024 total)
    slipped under its per-block cutoff. The bounded-summary detector
    (undercount <= n/k) must find it regardless of block count."""
    import ray

    from pystreamfs_ray.pipelines.flagship import _entities_above

    rng = np.random.default_rng(5)
    frames = []
    for _ in range(256):
        ids = [f"u{int(i)}" for i in rng.integers(0, 5000, size=60)]
        ids += ["mega"] * 4
        frames.append(pd.DataFrame({"conv_id": ids}))
    ds = ray.data.from_pandas(frames)
    got = _entities_above(ds, "conv_id", 800)
    truth = pd.concat(frames)["conv_id"].value_counts()
    assert got == frozenset(truth[truth > 800].index)
    assert "mega" in got


def test_entities_above_matches_truth_random(ray_session):
    """Detector == ground-truth filter on a skewed random fixture, for
    several thresholds (no false positives either — pass 2 is exact)."""
    import ray

    from pystreamfs_ray.pipelines.flagship import _entities_above

    rng = np.random.default_rng(11)
    # zipf-ish: a few heavy ids + long tail
    ids = ["h%d" % i for i in rng.zipf(1.3, size=20000) % 50]
    df = pd.DataFrame({"conv_id": ids})
    ds = ray.data.from_pandas([df.iloc[i::7].reset_index(drop=True)
                               for i in range(7)])
    truth = df["conv_id"].value_counts()
    for thr in (50, 500, 5000):
        got = _entities_above(ds, "conv_id", thr)
        assert got == frozenset(truth[truth > thr].index), thr
