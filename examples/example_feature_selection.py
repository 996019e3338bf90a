"""Feature-selection / feature-health readout pass — the filter-method
audits a feature-engineering pipeline runs BEFORE training to pick,
encode, and monitor candidate features (no reference analog; the
reference selects features online inside the stream, this is the
offline corpus-scale complement):

- mutual-information ranking of the candidate categorical features
  against the outcome (which raw signals carry information at all),
- weight-of-evidence encoding + information value per category of the
  winning categorical (the credit-scoring encoder, with IV as the
  per-level contribution),
- feature→future-label leakage audit (does any engineered feature
  correlate with the NEXT event's label — the time-travel bug catcher),
- PSI drift of the value distribution day-over-day (is the feature
  stable enough to ship).

Every readout is combiner partials + a bounded driver finish — the
exchanges are |levels|-, |features|- and days×bins-sized, never
data-sized, so the same pass runs unchanged at 100 TB.

Run: ``python examples/example_feature_selection.py [sf_dir]`` (owns
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

    from pystreamfs_ray.pipelines.queries import (
        q_leakage_corr, q_mi_features, q_psi_drift, q_woe_encode)

    mi = q_mi_features(sf_dir)
    mi = mi.to_pandas() if hasattr(mi, "to_pandas") else mi
    top = mi.loc[mi["mi"].idxmax()]
    print(f"mi ranking: {len(mi)} candidate features; top "
          f"{top['feature']} mi={top['mi']:.6f} "
          f"({int(top['n_levels'])} levels)")

    woe = q_woe_encode(sf_dir)
    woe = woe.to_pandas() if hasattr(woe, "to_pandas") else woe
    iv_total = float(woe["iv"].sum())
    strongest = woe.loc[woe["woe"].abs().idxmax()]
    print(f"woe encoding: {len(woe)} levels, total IV={iv_total:.6f}; "
          f"strongest level {strongest['event_type']} "
          f"woe={strongest['woe']:+.4f}")

    leak = q_leakage_corr(sf_dir)
    leak = leak.to_pandas() if hasattr(leak, "to_pandas") else leak
    worst = leak.loc[leak["leak_corr"].abs().idxmax()]
    print(f"leakage audit: {len(leak)} features vs lead(label); "
          f"max |corr| {worst['feature']} corr={worst['leak_corr']:+.4f}")

    psi = q_psi_drift(sf_dir)
    psi = psi.to_pandas() if hasattr(psi, "to_pandas") else psi
    print(f"psi drift: {len(psi)} day-over-day readings; "
          f"max psi={psi['psi'].max():.6f} "
          f"(rule of thumb: <0.1 stable, >0.25 shifted)")

    ray.shutdown()


if __name__ == "__main__":
    main(*sys.argv[1:2])
