"""Preference-data preparation walkthrough: the RLHF/DPO dataset flow
over transcript tables, end to end.

1. Derive transcripts from the events table (conv_id / turn_idx /
   role / text), mine (prompt, response) SFT pairs.
2. Quality screens on the pairs: prompt-echo rate (responses that
   mostly parrot their prompt teach nothing) and per-conversation
   assistant self-repetition (looping agents).
3. Best-of-n selection per distinct prompt, then DPO preference pairs
   (chosen vs rejected extremes with the score margin).
4. Loss-mask spans for the kept conversations (what an SFT trainer
   actually masks).

Run: ``python examples/example_preference_data.py [sf_dir]``
(owns its own local Ray session).
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

    from pystreamfs_ray.pipelines.queries import (q_dpo_pairs, q_echo_rate,
                                                  q_loss_spans,
                                                  q_self_repetition)
    from pystreamfs_ray.pipelines.transcripts import (best_of_n,
                                                      transcripts_from_events)

    echo = q_echo_rate(sf_dir).to_pandas()
    noisy = echo[echo["echo_ppm"] > 500_000]
    print(f"echo screen: {len(echo)} SFT pairs, "
          f"{len(noisy)} parrot >50% of their prompt's 3-grams")

    rep = q_self_repetition(sf_dir).to_pandas()
    loops = rep[rep["n_repeats"] > 0]
    print(f"self-repetition screen: {len(rep)} conversations, "
          f"{len(loops)} contain repeated assistant turns")

    t = transcripts_from_events(sf_dir, num_buckets=16)
    bon = best_of_n(t, num_buckets=16).to_pandas()
    pools = bon[bon["n_candidates"] >= 2]
    print(f"best-of-n: {len(bon)} distinct prompts, "
          f"{len(pools)} with competing candidates")

    dpo = q_dpo_pairs(sf_dir).to_pandas()
    print(f"DPO pairs: {len(dpo)} (chosen, rejected) pairs, "
          f"median margin {int(dpo['margin'].median())} tokens"
          if len(dpo) else "DPO pairs: 0")

    spans = q_loss_spans(sf_dir).to_pandas()
    tok = int((spans["tok_end"] - spans["tok_start"]).sum())
    print(f"loss spans: {len(spans)} assistant spans, "
          f"{tok} supervised tokens")
    ray.shutdown()


if __name__ == "__main__":
    main(*sys.argv[1:])
