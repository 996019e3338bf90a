"""Numpy reimplementation of sklearn's ``mutual_info_classif`` for dense
continuous features vs a discrete target.

The reference MCNN kernel calls ``mutual_info_classif(X, y,
random_state=0)`` (`/root/reference/pystreamfs/algorithms/mcnn.py:179`).
The sandbox has no sklearn/scipy, so this module re-derives the published
estimator (Ross 2014, "Mutual Information between Discrete and Continuous
Data Sets"; Kraskov et al. 2004 for the kNN machinery) following
sklearn's documented procedure:

1. scale each feature by its std (no centering), zero-std left as-is;
2. add 1e-10 * max(1, mean|x|) * N(0,1) jitter with
   ``np.random.RandomState(random_state)`` (C-order draw, as sklearn);
3. per feature: for each class with >1 members find the distance to the
   k-th (k = min(3, count-1)) nearest neighbor *within the class*,
   shrink it one ulp toward zero, count neighbors within that radius in
   the full (class-size>1) sample, and combine via digamma terms:
   ``psi(N) + mean(psi(k)) - mean(psi(class_count)) - mean(psi(m+1))``,
   clipped at 0.

Exact parity with sklearn cannot be asserted in-sandbox; what matters is
that engine and oracle share this single deterministic implementation
(SURVEY.md §7 hard item).
"""

from __future__ import annotations

import numpy as np


def digamma(x) -> np.ndarray:
    """Digamma for positive arguments (vectorized; ~1e-12 accuracy —
    recurrence pushes x ≥ 12 before the asymptotic series)."""
    x = np.array(x, dtype=np.float64, copy=True)
    res = np.zeros_like(x)
    mask = x < 12.0
    while np.any(mask):
        res[mask] -= 1.0 / x[mask]
        x[mask] += 1.0
        mask = x < 12.0
    inv = 1.0 / x
    inv2 = inv * inv
    res += np.log(x) - 0.5 * inv - inv2 * (
        1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 / 252.0)
    )
    return res


def _compute_mi_cd(c: np.ndarray, d: np.ndarray, n_neighbors: int) -> float:
    """MI between one continuous feature ``c`` and discrete target ``d``."""
    n_samples = c.shape[0]
    radius = np.empty(n_samples)
    label_counts = np.empty(n_samples)
    k_all = np.empty(n_samples)

    for label in np.unique(d):
        mask = d == label
        count = int(np.sum(mask))
        if count > 1:
            k = min(n_neighbors, count - 1)
            pts = c[mask]
            # k-th nearest neighbor distance within the class (self excluded)
            diff = np.abs(pts[:, None] - pts[None, :])
            np.fill_diagonal(diff, np.inf)
            kth = np.sort(diff, axis=1)[:, k - 1]
            radius[mask] = np.nextafter(kth, 0)
            k_all[mask] = k
        label_counts[mask] = count

    mask = label_counts > 1
    n_samples = int(np.sum(mask))
    if n_samples == 0:
        return 0.0
    label_counts = label_counts[mask]
    k_all = k_all[mask]
    c = c[mask]
    radius = radius[mask]

    # neighbors within radius over the full retained sample (incl. self),
    # then minus one — direct |c_j - c_i| <= r_i definition
    m_all = np.sum(np.abs(c[None, :] - c[:, None]) <= radius[:, None], axis=1) - 1.0

    mi = (
        digamma(n_samples)
        + np.mean(digamma(k_all))
        - np.mean(digamma(label_counts))
        - np.mean(digamma(m_all + 1.0))
    )
    return max(0.0, float(mi))


def mutual_info_classif(X: np.ndarray, y: np.ndarray, *, n_neighbors: int = 3,
                        random_state: int = 0) -> np.ndarray:
    """Drop-in for sklearn's estimator on dense continuous X, discrete y."""
    X = np.atleast_2d(np.asarray(X, dtype=np.float64)).copy()
    y = np.asarray(y)
    n_samples, n_features = X.shape

    std = np.std(X, axis=0)
    std_safe = np.where(std == 0.0, 1.0, std)
    X = X / std_safe

    rng = np.random.RandomState(random_state)
    means = np.maximum(1.0, np.mean(np.abs(X), axis=0))
    X = X + 1e-10 * means * rng.standard_normal(size=(n_samples, n_features))

    return np.array([_compute_mi_cd(X[:, j], y, n_neighbors) for j in range(n_features)])
