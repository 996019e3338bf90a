"""PII handling for training-data curation: detect/mask emails and
phone numbers in a text column, and pseudonymize identifier columns
with a salted digest.

Both are doc-local, shuffle-free, vectorized ``map_batches`` stages —
they stream at any scale. Patterns are compiled once at import and are
deliberately RE2-compatible (character classes, bounded repeats, no
backreferences/lookaround) so a DuckDB ``regexp_replace/extract_all``
oracle replays them exactly.

No reference analog (the reference's payloads are numeric matrices);
this is a prompt-mandated LLM-pipeline operator family, like
stages/textstats.py.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# RE2-compatible on purpose (see module docstring)
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\d{3}-\d{3}-\d{4}"

_EMAIL_RE = re.compile(EMAIL_PATTERN)
_PHONE_RE = re.compile(PHONE_PATTERN)


def mask_pii(ds, *, text_col: str = "text", out_col: str = "masked"):
    """Mask emails then phone numbers; emit per-doc match counts.

    Order matters and is part of the contract: emails are masked first
    so digit runs inside a local-part are never double-counted as phone
    fragments. Leftmost non-overlapping matching — identical in Python
    ``re`` and RE2."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].astype(str)
        df = df.copy()
        df["n_emails"] = s.str.count(_EMAIL_RE).astype(np.int64)
        masked = s.str.replace(_EMAIL_RE, "<EMAIL>", regex=True)
        df["n_phones"] = masked.str.count(_PHONE_RE).astype(np.int64)
        df[out_col] = masked.str.replace(_PHONE_RE, "<PHONE>", regex=True)
        return df

    return ds.map_batches(fn, batch_format="pandas")


def pseudonymize(ds, col: str, *, salt: str = "s1",
                 out_col: str | None = None, digest_chars: int = 16):
    """Deterministic salted pseudonym for an identifier column:
    ``md5(salt || ':' || value)`` hex prefix. The same value always maps
    to the same token (joins survive pseudonymization) while the raw id
    leaves the pipeline. md5 here is a stable keyed RENAME, not a
    security boundary — swap in a proper HMAC for adversarial threat
    models; md5 is what the in-sandbox DuckDB oracle can replay."""
    import hashlib

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[out_col or f"{col}_pseudo"] = [
            hashlib.md5(f"{salt}:{v}".encode()).hexdigest()[:digest_chars]
            for v in df[col].astype(str)
        ]
        return df

    return ds.map_batches(fn, batch_format="pandas")
