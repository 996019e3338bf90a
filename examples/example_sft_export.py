"""End-to-end SFT dataset production over the testdata event log — the
export edge of the engine (no reference analog; the reference is the
feature-selection side).

Stages (each streaming, Arrow-native — see SCALE.md):

  events → transcripts (per-entity ordered derivation) →
  SFT (prompt, response) pair mining → deterministic train/val/test
  holdout assignment (`split_assign`, shuffle-free) → prompt dedup
  accounting → per-split hash-sharded JSONL export (atomic files,
  manifest back, resume-skip on rerun).

Run: ``python examples/example_sft_export.py [sf_dir] [out_dir]``
(defaults to /root/testdata/sf0.001 and a temp dir; owns its own local
Ray session).
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001",
         out_dir: str | None = None) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pystreamfs_ray.pipelines.transcripts import (sft_pairs,
                                                      transcripts_from_events)
    from pystreamfs_ray.sources import export_jsonl_sharded, split_assign

    out_dir = out_dir or tempfile.mkdtemp(prefix="sft_export_")

    pairs = split_assign(
        sft_pairs(transcripts_from_events(sf_dir, num_buckets=4),
                  num_buckets=4),
        "conv_id")

    for split in ("train", "val", "test"):
        sub = pairs.filter(expr=f"split == '{split}'")
        manifest = export_jsonl_sharded(
            sub, os.path.join(out_dir, split), by="conv_id", num_shards=4,
            sort_cols=["conv_id", "turn_idx"])
        print(f"{split}: {int(manifest['n_rows'].clip(lower=0).sum())} pairs "
              f"in {len(manifest)} shards")

    # resumed rerun touches nothing
    again = export_jsonl_sharded(
        pairs.filter(expr="split == 'train'"),
        os.path.join(out_dir, "train"), by="conv_id", num_shards=4,
        resume=True, sort_cols=["conv_id", "turn_idx"])
    print("resume skipped shards:", int(again["skipped"].sum()))
    print("export dir:", out_dir)
    ray.shutdown()


if __name__ == "__main__":
    main(*sys.argv[1:])
