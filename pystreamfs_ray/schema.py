"""Arrow schemas and column contracts for the engine.

The primary input shape is the BASELINE.json ``input_hint``::

    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string, ts: timestamp[us]

Feature layout follows FIXTURES.md §F2 (m = 14 float64 features, a
passthrough ``text`` column for byte-equality checks, and an ``int8``
label derived deterministically per turn).
"""

from __future__ import annotations

import pyarrow as pa

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["", "search", "code", "browser", "calc"]

# Stateless features computed per turn by stages/featurize.py (13), plus
# the per-entity lag feature f_ts_delta_s computed after sessionize (1)
# → m = 14, matching FIXTURES.md §F2.
STATELESS_FEATURE_COLS = [
    "f_text_chars",
    "f_text_words",
    "f_text_avg_word_len",
    "f_role_user",
    "f_role_assistant",
    "f_role_system",
    "f_role_tool",
    "f_tool_none",
    "f_tool_search",
    "f_tool_code",
    "f_tool_browser",
    "f_tool_calc",
    "f_turn_idx_norm",
]
LAG_FEATURE_COLS = ["f_ts_delta_s"]
FEATURE_COLS = STATELESS_FEATURE_COLS + LAG_FEATURE_COLS
NUM_FEATURES_M = len(FEATURE_COLS)

LABEL_COL = "label"

LABELS_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("ts", pa.timestamp("us")),
        pa.field("label", pa.int8()),
    ]
)

# Selector-stage output: one row per entity × window (the engine analog of
# the reference's per-batch stats dict, pystreamfs/pystreamfs.py:48-90).
SELECTOR_OUTPUT_SCHEMA = pa.schema(
    [
        pa.field("kernel", pa.string()),
        pa.field("conv_id", pa.string()),
        pa.field("window_id", pa.int64()),
        pa.field("ts_end", pa.timestamp("us")),
        pa.field("n_rows", pa.int32()),
        pa.field("w", pa.list_(pa.float64())),
        pa.field("selected", pa.list_(pa.int32())),
        pa.field("fscr", pa.float64()),  # null for window 0 (reference: t>=1 only)
        pa.field("acc", pa.float64()),  # null when evaluation disabled
        pa.field("wall_ms", pa.float64()),
        # per-window RSS probe — the engine analog of the reference's
        # per-batch USS measurement (pystreamfs/pystreamfs.py:74)
        pa.field("mem_bytes", pa.int64()),
    ]
)

CHECKPOINT_MANIFEST_SCHEMA = pa.schema(
    [
        pa.field("bucket_id", pa.int32()),
        pa.field("kernel", pa.string()),
        pa.field("params_fingerprint", pa.string()),
        pa.field("input_fingerprint", pa.string()),
        pa.field("n_convs", pa.int64()),
        pa.field("n_windows", pa.int64()),
        pa.field("rows_done", pa.int64()),
        pa.field("wall_s", pa.float64()),
        pa.field("rows_per_sec", pa.float64()),
        pa.field("window_lag_s", pa.float64()),
    ]
)
