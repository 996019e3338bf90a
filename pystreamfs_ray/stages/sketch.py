"""Distributed cardinality sketch: HyperLogLog over a Dataset column.

The register state is the distributable object: each batch computes its
observed (register, max-rho) pairs locally (vectorized md5 hashing +
exact integer bit-length — no float log2, so the registers are
bit-identical to the DuckDB oracle), then ONE tiny groupby-max merges
them — registers are max-mergeable, so this runs at any parallelism
and any block layout with an identical result. The float estimate is
derived from the integer registers at the end (driver-side, 2^b rows).

Complements the engine's other sketches (Frequent-Directions in
kernels/fsds.py, MinHash signatures in stages/dedup.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data.aggregate import Max


def _bit_length_u64(v: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 (no float log2 — a 58-bit
    value near a power of two would round the exponent)."""
    v = v.copy()
    bl = np.zeros(v.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= np.uint64(1 << s)
        bl[m] += s
        v[m] >>= np.uint64(s)
    bl[v > 0] += 1
    return bl


def hll_partials(values, *, b: int = 6) -> pd.DataFrame:
    """Observed (reg, rho) pairs for one batch of values (pre-maxed)."""
    from pystreamfs_ray.stages.dedup import _md5_lower64

    h = _md5_lower64([str(v) for v in values])
    rest_bits = 64 - b
    reg = (h >> np.uint64(rest_bits)).astype(np.int64)
    rest = h & np.uint64((1 << rest_bits) - 1)
    # rho: 1-based position of the first set bit from the top of the
    # rest_bits field; all-zero rest → rest_bits + 1
    rho = np.where(rest > 0, rest_bits - _bit_length_u64(rest) + 1,
                   rest_bits + 1).astype(np.int64)
    df = pd.DataFrame({"reg": reg, "rho": rho})
    return df.groupby("reg", sort=False)["rho"].max().reset_index()


def hll_registers(ds, col: str, *, b: int = 6):
    """Dataset → (reg, rho_max) register table (only observed regs)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return hll_partials(df[col].to_numpy(), b=b)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("reg")
        .aggregate(Max("rho", alias_name="rho_max"))
    )


def hll_estimate(registers: pd.DataFrame, *, b: int = 6) -> float:
    """Standard HLL estimate (with small-range linear counting) from a
    (reg, rho_max) frame; unobserved registers count as zero."""
    m = 1 << b
    regs = np.zeros(m, dtype=np.int64)
    regs[registers["reg"].to_numpy()] = registers["rho_max"].to_numpy()
    alpha = 0.709 if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    raw = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if raw <= 2.5 * m and zeros > 0:
        return float(m * np.log(m / zeros))
    return float(raw)


def approx_distinct(ds, col: str, *, b: int = 6) -> float:
    """Approximate COUNT(DISTINCT col) — one pass, one tiny shuffle."""
    return hll_estimate(hll_registers(ds, col, b=b).to_pandas(), b=b)
