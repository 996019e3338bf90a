"""Corpus quality-audit pass — the session-9 eval family run as one
report (no reference analog; the reference has no corpus tooling):

- LSH detector audit: MinHash candidates vs EXACT shingle-Jaccard
  truth on a bounded sampled subset (precision/recall in ppm),
- KMV bottom-k distinct-user estimates per event type (the cheap
  cardinality screen; exact below k),
- Jensen-Shannon divergence between per-source length distributions
  (which feeds drifted away from the pack),
- diagonal-Mahalanobis embedding anomalies (top suspect vectors),
- per-user CUSUM change-point peaks (who shifted behavior, when).

Every check is combiner partials + a bounded driver finish; the audit
is the go/no-go report a dedup/curation pipeline prints before a
snapshot ships.

Run: ``python examples/example_quality_audit.py [sf_dir]`` (owns its
own local Ray session).
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

    from pystreamfs_ray.pipelines.queries import (q_cusum,
                                                  q_embedding_anomaly,
                                                  q_js_divergence,
                                                  q_kmv_distinct,
                                                  q_lsh_quality)

    lsh = q_lsh_quality(sf_dir).iloc[0]
    print(f"LSH audit: {lsh['n_candidates']} candidates vs "
          f"{lsh['n_truth']} true pairs -> precision "
          f"{lsh['precision_ppm'] / 1e4:.1f}% recall "
          f"{lsh['recall_ppm'] / 1e4:.1f}%")

    kmv = q_kmv_distinct(sf_dir).to_pandas().sort_values("event_type")
    for r in kmv.itertuples(index=False):
        mode = "exact" if r.n_kept < 16 else "sketch"
        print(f"KMV distinct users [{r.event_type}]: "
              f"~{r.est_distinct:.0f} ({mode})")

    js = q_js_divergence(sf_dir)
    worst = js.loc[js["js_div"].idxmax()]
    print(f"JS divergence: {len(js)} source pairs, max "
          f"{worst['js_div']:.4f} between {worst['source_a']} "
          f"and {worst['source_b']}")

    an = q_embedding_anomaly(sf_dir).to_pandas()
    top = an.nlargest(3, "anomaly_ppm")
    print("embedding anomalies (top 3): "
          + ", ".join(f"vec {int(r.vec_id)}={r.anomaly_ppm / 1e6:.1f}"
                      for r in top.itertuples(index=False)))

    cu = q_cusum(sf_dir).to_pandas()
    peak = cu.loc[cu["cusum_abs_scaled"].idxmax()]
    print(f"CUSUM: sharpest shift user {int(peak['user_id'])} "
          f"on day {int(peak['peak_day'])} "
          f"(|n*P_t - t*T| = {int(peak['cusum_abs_scaled'])})")

    ray.shutdown()


if __name__ == "__main__":
    main(*sys.argv[1:])
