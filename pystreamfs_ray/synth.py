"""Deterministic transcript / label synthesizer (FIXTURES.md §F1, §F3).

Generates the ``input_hint`` table shape (conv_id, turn_idx, role, text,
tool, ts) with a seeded numpy Generator — no external data. Rows are
written in a *shuffled* order across several Parquet files so that stable
turn ordering must always be recovered by the engine, never assumed.

Conversation lengths are a Zipf-ish mix plus a couple of explicit
mega-conversations (skew fixture for salting / partition-balance tests).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pystreamfs_ray.schema import TRANSCRIPT_SCHEMA

_VOCAB = np.array(
    [
        f"w{i:03d}" for i in range(180)
    ]
    + ["the", "and", "of", "to", "query", "table", "stream", "window", "join",
       "sort", "batch", "merge", "data", "model", "agent", "tool", "plan",
       "result", "error", "retry"],
    dtype=object,
)

_TOOL_CHOICES = np.array(["search", "code", "browser", "calc"], dtype=object)

_BASE_TS_US = np.int64(1_700_000_000_000_000)  # 2023-11-14T22:13:20Z, arbitrary fixed epoch


def conv_lengths(n_convs: int, rng: np.random.Generator, mega_convs: int = 2,
                 mega_share: float = 0.2, mean_len: int = 120,
                 mega_turns: int | None = None) -> np.ndarray:
    """Seeded Zipf-ish conversation lengths with a few mega-conversations.

    ``mega_turns`` pins the mega-conversation size absolutely (bench
    fixtures: bounds the irreducible per-entity sequential tail);
    otherwise they take ``mega_share`` of the total (skew-stress tests).
    """
    base = np.minimum(rng.zipf(1.6, size=n_convs) * 3 + rng.integers(2, 30, size=n_convs),
                      mean_len * 8)
    total = int(base.sum())
    if mega_convs > 0 and n_convs > mega_convs:
        if mega_turns is not None:
            per = int(mega_turns)
        else:
            mega_total = int(total * mega_share / max(1e-9, 1 - mega_share))
            per = max(base.max() * 4, mega_total // mega_convs)
        base[:mega_convs] = per
    return base.astype(np.int64)


def generate_transcripts(n_convs: int, seed: int = 7, mega_convs: int = 2,
                         min_words: int = 3, max_words: int = 40,
                         mega_turns: int | None = None) -> pa.Table:
    """Build the transcripts table in memory (deterministic for a seed)."""
    rng = np.random.default_rng(seed)
    lengths = conv_lengths(n_convs, rng, mega_convs=mega_convs, mega_turns=mega_turns)
    n_rows = int(lengths.sum())

    conv_ids = np.repeat(np.array([f"conv{k:06d}" for k in range(n_convs)], dtype=object),
                         lengths)
    # turn_idx: 0..len-1 within each conversation
    turn_idx = (np.arange(n_rows) - np.repeat(np.cumsum(lengths) - lengths, lengths)).astype(np.int32)

    # roles: alternate user/assistant; seeded overrides to system/tool (~6%)
    role = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    override = rng.random(n_rows)
    role[override < 0.03] = "system"
    role[(override >= 0.03) & (override < 0.06)] = "tool"

    # tool: ~15% of assistant turns get a tool
    tool = np.full(n_rows, "", dtype=object)
    is_assistant = role == "assistant"
    tool_draw = rng.random(n_rows)
    tool_pick = rng.integers(0, len(_TOOL_CHOICES), size=n_rows)
    use_tool = is_assistant & (tool_draw < 0.15)
    tool[use_tool] = _TOOL_CHOICES[tool_pick[use_tool]]

    # ts: per-conversation seeded start + cumulative gaps in [1s, 30min);
    # strictly increasing with turn_idx inside a conversation, interleaved
    # across conversations globally.
    starts = _BASE_TS_US + rng.integers(0, 86_400_000_000 * 30, size=n_convs)  # within 30 days
    gaps_us = rng.integers(1_000_000, 1_800_000_000, size=n_rows)  # 1s .. 30min
    gap_cum = np.cumsum(gaps_us)
    first_of_conv = np.repeat(np.cumsum(lengths) - lengths, lengths)
    gap_local = gap_cum - gap_cum[first_of_conv] + gaps_us[first_of_conv]
    ts = np.repeat(starts, lengths) + gap_local

    # text: deterministic template + seeded word sequence (3..max_words
    # words) — built with vectorized Arrow kernels (binary_join), not a
    # Python join per row (~4× faster fixture generation)
    n_words = rng.integers(min_words, max_words + 1, size=n_rows)
    word_ids = rng.integers(0, len(_VOCAB), size=int(n_words.sum()))
    offsets = np.concatenate(([0], np.cumsum(n_words))).astype(np.int32)
    flat_words = pa.array(_VOCAB[word_ids], type=pa.string())
    word_lists = pa.ListArray.from_arrays(pa.array(offsets), flat_words)
    import pyarrow.compute as pc

    body = pc.binary_join(word_lists, " ")
    prefix = pc.binary_join_element_wise(
        pa.array(role, type=pa.string()),
        " turn ",
        pa.array(turn_idx.astype(str), type=pa.string()),
        " of ",
        pa.array(conv_ids, type=pa.string()),
        ": ",
        "",
    )
    texts = pc.binary_join_element_wise(prefix, body, "")

    return pa.table(
        {
            "conv_id": pa.array(conv_ids, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role, type=pa.string()),
            "text": texts,
            "tool": pa.array(tool, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


def generate_labels(transcripts: pa.Table, seed: int = 11,
                    per_turns: int = 20) -> pa.Table:
    """Label events per FIXTURES.md §F3: ~1 per ``per_turns`` turns, with
    ts placed before/at/between/after turn timestamps (as-of join probes)."""
    rng = np.random.default_rng(seed)
    conv = np.asarray(transcripts["conv_id"])
    ts = np.asarray(transcripts["ts"].cast(pa.int64()))
    order = np.lexsort((ts, conv))
    conv, ts = conv[order], ts[order]
    uniq, starts_idx, counts = np.unique(conv, return_index=True, return_counts=True)

    out_conv, out_ts, out_label = [], [], []
    for cid, s, n in zip(uniq, starts_idx, counts):
        t0, t1 = ts[s], ts[s + n - 1]
        k = max(1, int(n // per_turns))
        # one probe before the first turn (no-match case), one exactly on a
        # turn ts, the rest uniform in [t0, t1 + slack]
        probe = [t0 - 5_000_000, int(ts[s + int(rng.integers(0, n))])]
        probe += list(rng.integers(t0, t1 + 3_600_000_000, size=k))
        out_conv += [cid] * len(probe)
        out_ts += probe
        out_label += list(rng.integers(0, 2, size=len(probe)))

    return pa.table(
        {
            "conv_id": pa.array(out_conv, type=pa.string()),
            "ts": pa.array(np.array(out_ts, dtype=np.int64), type=pa.timestamp("us")),
            "label": pa.array(np.array(out_label, dtype=np.int8), type=pa.int8()),
        }
    )


def write_shuffled(table: pa.Table, out_dir: str, n_files: int = 8, seed: int = 13) -> list[str]:
    """Write a table to ``n_files`` Parquet files in shuffled row order."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(table.num_rows)
    shuffled = table.take(pa.array(perm))
    paths = []
    bounds = np.linspace(0, table.num_rows, n_files + 1, dtype=np.int64)
    for i in range(n_files):
        part = shuffled.slice(bounds[i], bounds[i + 1] - bounds[i])
        p = os.path.join(out_dir, f"part-{i:04d}.parquet")
        pq.write_table(part, p)
        paths.append(p)
    return paths


def build_fixture(out_root: str, n_convs: int = 20, seed: int = 7,
                  mega_convs: int = 2, n_files: int = 4,
                  mega_turns: int | None = None) -> dict[str, str]:
    """Materialize transcripts + labels fixture dirs; returns their paths.

    Idempotent for a given (out_root, params): skips if already present.
    """
    tdir = os.path.join(out_root, "transcripts")
    ldir = os.path.join(out_root, "labels")
    done = os.path.join(out_root, "_SYNTH_DONE")
    if not os.path.exists(done):
        t = generate_transcripts(n_convs, seed=seed, mega_convs=mega_convs,
                                 mega_turns=mega_turns)
        write_shuffled(t, tdir, n_files=n_files, seed=seed + 1)
        lbl = generate_labels(t, seed=seed + 2)
        write_shuffled(lbl, ldir, n_files=max(1, n_files // 2), seed=seed + 3)
        with open(done, "w") as f:
            f.write(f"n_convs={n_convs} seed={seed} rows={t.num_rows}\n")
    return {"transcripts": tdir, "labels": ldir}
