"""Categorical-encoder + scaler readout pass — the tabular
feature-preparation sweep a training pipeline runs to turn raw
columns into model-ready features (no reference analog; the reference
consumes pre-numeric matrices, this builds them at corpus scale):

- frequency encoding and rare-category consolidation (cardinality
  control before any one-hot/target encoding),
- ordinal-by-target-mean codes (the monotone integer encoding tree
  models split on),
- balanced class weights for the imbalanced-label loss,
- global standard scaling + cyclical hour/dow encoding of the
  timestamp,
- the decile calibration table (binned target rate vs the value
  feature) as the final sanity check.

Every encoder is a |categories|- or 1-row combiner plus a broadcast
batch-local finish — no data-sized exchange anywhere, so the same
pass runs unchanged at 100 TB.

Run: ``python examples/example_encoders.py [sf_dir]`` (owns its own
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

    from pystreamfs_ray.pipelines.queries import (
        q_calibration, q_class_weights, q_cyclical_time, q_freq_encode,
        q_ordinal_encode, q_rare_categories, q_standard_scale)

    fe = q_freq_encode(sf_dir).to_pandas()
    print(f"freq encode: {len(fe)} rows, "
          f"{fe['event_type'].nunique()} categories, "
          f"freq range [{fe['freq'].min():.4f}, {fe['freq'].max():.4f}]")

    rc = q_rare_categories(sf_dir).to_pandas()
    n_other = int((rc["user_cat"] == "__other__").sum())
    print(f"rare categories: {rc['user_cat'].nunique()} final levels, "
          f"{n_other} rows consolidated to __other__")

    oe = q_ordinal_encode(sf_dir).to_pandas()
    print(f"ordinal encode: codes 1..{oe['ord_code'].max()} "
          f"by descending mean value")

    cw = q_class_weights(sf_dir)
    cw = cw.to_pandas() if hasattr(cw, "to_pandas") else cw
    print(f"class weights: {len(cw)} labels, "
          f"weight range [{cw['weight'].min():.4f}, "
          f"{cw['weight'].max():.4f}]")

    ss = q_standard_scale(sf_dir).to_pandas()
    print(f"standard scale: mean={ss['z_value'].mean():+.2e}, "
          f"std={ss['z_value'].std(ddof=1):.6f}")

    ct = q_cyclical_time(sf_dir).to_pandas()
    rad = (ct["hour_sin"] ** 2 + ct["hour_cos"] ** 2).mean()
    print(f"cyclical time: {len(ct)} rows on the unit circle "
          f"(mean radius {rad:.6f})")

    cal = q_calibration(sf_dir)
    cal = cal.to_pandas() if hasattr(cal, "to_pandas") else cal
    print("calibration: decile purchase rates "
          + " ".join(f"{r:.3f}" for r in
                     cal.sort_values('decile')['rate']))

    ray.shutdown()


if __name__ == "__main__":
    main(*sys.argv[1:2])
