"""Event-stream analytics over the testdata events table — the
behavioral-analytics operator family (funnel, cohorts, retention,
trending, changelog compaction), each a one-or-two-shuffle design
(see SCALE.md).

Run: ``python examples/example_analytics.py [sf_dir]``
(defaults to /root/testdata/sf0.001; owns its own local Ray session).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pystreamfs_ray.pipelines import queries as q

    print("== ordered funnel view→click→purchase ==")
    print(q.q_funnel(sf_dir).to_string(index=False))

    print("\n== new users per day + cumulative ==")
    print(q.q_new_users(sf_dir).head(5).to_string(index=False))

    print("\n== weekly retention cohorts ==")
    print(q.q_retention(sf_dir).to_pandas()
          .sort_values(["cohort", "week_offset"]).to_string(index=False))

    print("\n== top event types per day (first 2 days) ==")
    t = (q.q_trending(sf_dir).to_pandas()
         .sort_values(["day", "rank"], ignore_index=True))
    print(t.head(6).to_string(index=False))

    print("\n== latest event per user (changelog compaction, 5 rows) ==")
    print(q.q_latest_event(sf_dir).to_pandas()
          .sort_values("user_id").head(5).to_string(index=False))

    ray.shutdown()


if __name__ == "__main__":
    main(*sys.argv[1:])
