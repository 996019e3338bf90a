"""OFS — Online Feature Selection (Wang et al. 2014), numpy re-derivation.

Semantics match `/root/reference/pystreamfs/algorithms/ofs.py:5-52`:
per-instance perceptron with margin 1; on mistake a gradient step with
eta=0.2, projection onto the L2 ball of radius 1/sqrt(lambda) with
lambda=0.01, then gradient truncation keeping only the ``num_features``
largest |w| entries. State = the weight vector itself (the only
reference kernel stateful through ``w``).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from pystreamfs_ray.kernels.base import register


class OFSKernel:
    name = "ofs"

    def init_state(self, m: int, params: dict[str, Any]) -> np.ndarray:
        # reference starts from integer zeros (pystreamfs.py:47); values identical
        return np.zeros(m, dtype=np.float64)

    def update(self, state: np.ndarray, X: np.ndarray, Y: np.ndarray,
               ctx: dict[str, Any] | None = None,
               *, num_features: int = 5, eta: float = 0.2,
               lamb: float = 0.01, **_: Any) -> tuple[np.ndarray, np.ndarray]:
        w = np.asarray(state, dtype=np.float64)
        sqrt_lamb = np.sqrt(lamb)
        for x, y in zip(X, Y):
            yy = -1.0 if y == 0 else 1.0
            if yy * np.dot(w, x) <= 1.0:
                w = w + eta * yy * x
                # same expression shape as the reference for bit-parity
                w = w * min(1.0, 1.0 / (sqrt_lamb * np.linalg.norm(w)))
                w = _truncate(w, num_features)
        return w, w


def _truncate(w: np.ndarray, num_features: int) -> np.ndarray:
    """Zero all but the ``num_features`` largest-|w| entries (ofs.py:37-52)."""
    if np.count_nonzero(w) > num_features:
        keep = np.argsort(np.abs(w))[-num_features:]
        mask = np.zeros(w.shape[0], dtype=bool)
        mask[keep] = True
        w = np.where(mask, w, 0.0)
    return w


register(OFSKernel())
