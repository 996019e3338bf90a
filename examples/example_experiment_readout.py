"""Experiment / lifecycle readout pass — the product-analytics trio a
feature-engineering pipeline publishes alongside its training tables
(no reference analog; the reference has no notion of cohorts):

- one-vs-rest A/B lift per event type with the two-proportion z
  statistic (which arm converts above the rest, and is it noise?),
- the Kaplan-Meier risk table over user lifetimes (how fast does the
  population churn, with exact-integer at-risk counts),
- RFM quintile segmentation (which users are recent/frequent/valuable
  — exact NTILE(5) semantics, no global sort).

Every readout is combiner partials + a bounded driver finish except
RFM, whose per-user feature table is built in ONE entity shuffle and
ranked by the two-phase range-partition NTILE.

Run: ``python examples/example_experiment_readout.py [sf_dir]`` (owns
its own local Ray session).
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

    from pystreamfs_ray.pipelines.queries import q_ab_lift, q_rfm, q_survival

    lift = q_ab_lift(sf_dir)
    best = lift.loc[lift["z"].abs().idxmax()]
    print(f"ab lift: {len(lift)} arms; strongest arm "
          f"{best['event_type']} z={best['z']:+.2f} lift={best['lift']:+.4f}")

    surv = q_survival(sf_dir)
    print(f"survival: {len(surv)} duration rows; "
          f"day-0 hazard={surv['hazard'].iloc[0]:.4f} "
          f"n_risk={int(surv['n_risk'].iloc[0])}")

    rfm = q_rfm(sf_dir)
    rfm = rfm.to_pandas() if hasattr(rfm, "to_pandas") else rfm
    champions = rfm[(rfm["r_score"] == 1) & (rfm["f_score"] == 5)
                    & (rfm["m_score"] == 5)]
    print(f"rfm: {len(rfm)} users segmented; "
          f"champions (R1/F5/M5): {len(champions)}")

    ray.shutdown()


if __name__ == "__main__":
    main(*sys.argv[1:2])
