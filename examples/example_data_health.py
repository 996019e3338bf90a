"""Data-health monitoring pass — the pre-training go/no-go checks a
100-TB pipeline runs before a corpus snapshot ships (no reference
analog; the reference trusts its in-process matrices):

- PSI drift of the event value distribution day-over-day (bounded
  (day, bin) combiner counts; flags a shifted feed),
- feature→future-label leakage correlations (exact int64 sums; flags
  a feature that trivially encodes tomorrow's target),
- per-source language-consistency outliers (majority-language audit),
- parquet footer stats (row-group min/max — verifies the layout still
  supports read-time pruning).

Every check is combiner partials + a bounded driver finish: the
corpus-sized work is one scan per check, nothing data-sized ever
reaches the driver.

Run: ``python examples/example_data_health.py [sf_dir]`` (owns its own
local Ray session).
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

    from pystreamfs_ray.pipelines.queries import (q_footer_stats,
                                                  q_lang_outliers,
                                                  q_leakage_corr,
                                                  q_psi_drift)

    psi = q_psi_drift(sf_dir).sort_values("day")
    worst = psi.loc[psi["psi"].idxmax()] if len(psi) else None
    print(f"PSI: {len(psi)} day-pairs, max {worst['psi']:.4f} "
          f"on {worst['day']}" if worst is not None else "PSI: no days")
    flagged = psi[psi["psi"] > 0.2]
    print(f"  drift alerts (psi > 0.2): {len(flagged)}")

    leak = q_leakage_corr(sf_dir).to_pandas()
    for r in leak.itertuples(index=False):
        flag = "  <-- LEAK?" if abs(r.leak_corr) > 0.5 else ""
        print(f"leakage: {r.feature} corr={r.leak_corr:+.4f} "
              f"(n={r.n}){flag}")

    lang = q_lang_outliers(sf_dir).to_pandas()
    n_bad = int(lang["n_outliers"].sum())
    print(f"language consistency: {len(lang)} sources, "
          f"{n_bad} docs deviate from their source majority")

    foot = q_footer_stats(sf_dir).to_pandas()
    prunable = (foot["min_v"] < foot["max_v"]).sum()
    print(f"layout: {len(foot)} (row-group, int64-column) stats rows, "
          f"{prunable} with a non-degenerate min/max range")

    ray.shutdown()


if __name__ == "__main__":
    main(*sys.argv[1:])
