"""Feature-store materialization walk — the offline half of a serving
feature store (no reference analog; the reference emits per-window
matrices, not entity feature tables):

- the per-user feature vector (counts, hourly-burstiness Fano, daily
  streaks, cent-exact totals, type cardinality) built in ONE
  entity-bucket pass (`q_user_features`),
- a freshness column (4-tap EWMA of value, `q_ewma_value`) joined on as
  the most recent smoothed signal per user,
- written as Hive-partitioned Parquet bucketed by a stable md5 shard of
  user_id, so online loaders prune at the path level and a failed
  materialization reruns only missing shards.

Run: ``python examples/example_feature_store.py [sf_dir] [out_dir]``
(owns its own local Ray session).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001",
         out_dir: str = "/tmp/pystreamfs_ray_feature_store") -> None:
    import numpy as np
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pandas as pd
    import ray.data as rd

    from pystreamfs_ray.pipelines.queries import q_ewma_value, q_user_features
    from pystreamfs_ray.sources import write_partitioned_parquet
    from pystreamfs_ray.stages.dedup import _md5_lower64

    feats = q_user_features(sf_dir).to_pandas()
    print(f"feature table: {len(feats)} users x "
          f"{len(feats.columns) - 1} features")

    # latest smoothed value per user: the EWMA row of the user's last
    # event (max event_id within max ts order is already encoded in the
    # per-bucket sort; the last row per user is the freshest)
    ewma = q_ewma_value(sf_dir).to_pandas()
    latest = (ewma.groupby("user_id", sort=False)
              .tail(1)[["user_id", "ewma"]]
              .rename(columns={"ewma": "latest_ewma"}))
    feats = feats.merge(latest, on="user_id", how="left")

    feats["shard"] = (_md5_lower64([str(u) for u in feats["user_id"]])
                      % np.uint64(8)).astype(np.int64)
    write_partitioned_parquet(rd.from_pandas(feats), out_dir, by="shard")
    shards = sorted(d for d in os.listdir(out_dir) if d.startswith("shard="))
    print(f"wrote {len(shards)} shards under {out_dir}")

    back = rd.read_parquet(out_dir).to_pandas()
    assert len(back) == len(feats)
    top = feats.nlargest(3, "total_cents")[
        ["user_id", "total_cents", "fano", "best_streak", "latest_ewma"]]
    print("top spenders:")
    print(top.to_string(index=False))
    ray.shutdown()


if __name__ == "__main__":
    main(*sys.argv[1:])
