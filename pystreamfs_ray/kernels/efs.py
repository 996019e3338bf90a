"""EFS — Extremal Feature Selection (Carvalho & Cohen 2006), numpy.

Semantics match `/root/reference/pystreamfs/algorithms/efs.py:5-52`:
per-instance Modified Balanced Winnow over per-row min-max-normalized
inputs; multiplicative promote/demote of positive model ``u`` and
negative model ``v`` on margin mistakes; importance ``w = |u - v|``.

The reference's per-feature Python loop and its per-row
``MinMaxScaler().fit_transform`` are replaced by equivalent vectorized
numpy expressions (same elementwise operation order → bit-identical).
sklearn's zero-range handling maps a constant row to all-zeros.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from pystreamfs_ray.kernels.base import register


def row_minmax(x: np.ndarray) -> np.ndarray:
    """Per-row min-max normalization, sklearn ``MinMaxScaler`` semantics on
    a single column vector (constant input → zeros)."""
    lo = x.min()
    rng = x.max() - lo
    if rng == 0:
        return x - lo  # all zeros, matching handle_zeros_in_scale (divisor 1)
    return (x - lo) / rng


class EFSKernel:
    name = "efs"

    def init_state(self, m: int, params: dict[str, Any]) -> tuple[np.ndarray, np.ndarray]:
        # defaults from examples/example_efs.py:22-28
        u = np.asarray(params.get("u", np.ones(m) * 2.0), dtype=np.float64).copy()
        v = np.asarray(params.get("v", np.ones(m)), dtype=np.float64).copy()
        return u, v

    def update(self, state: tuple[np.ndarray, np.ndarray], X: np.ndarray, Y: np.ndarray,
               ctx: dict[str, Any] | None = None,
               *, alpha: float = 1.5, beta: float = 0.5,
               threshold: float = 1.0, M: float = 1.0,
               **_: Any) -> tuple[np.ndarray, tuple[np.ndarray, np.ndarray]]:
        u, v = state
        for x, y in zip(X, Y):
            yy = -1.0 if y == 0 else 1.0
            xn = row_minmax(x)
            score = np.dot(xn, u) - np.dot(xn, v) - threshold
            if score * yy <= M:
                if yy > 0:
                    u = u * alpha * (1.0 + xn)
                    v = v * beta * (1.0 - xn)
                else:
                    u = u * beta * (1.0 - xn)
                    v = v * alpha * (1.0 + xn)
        w = np.abs(u - v)
        return w, (u, v)


register(EFSKernel())
