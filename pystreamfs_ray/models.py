"""Numpy stand-ins for the sklearn evaluation models.

The reference re-fits an sklearn model per window on the temporal prefix
(`/root/reference/pystreamfs/utils.py:21-54`; KNN / DecisionTree / SVC in
the examples). The sandbox has no sklearn, so these numpy models define
the engine's evaluation spec: same ``.fit`` / ``.predict`` protocol, the
same prequential train-on-prefix / test-on-window contract.
"""

from __future__ import annotations

import numpy as np


class KNNClassifier:
    """Brute-force k-nearest-neighbor majority vote (euclidean).

    Ties in the vote resolve to the smallest label; k shrinks to the
    training size when the prefix is smaller than k.

    Memory-bandwidth discipline (the prequential eval streams a
    ~max_history×m train matrix per window, so traffic — not flops —
    bounds multi-core scaling): float32 matrices (half the bytes),
    train-side squared norms cached at fit, and the test-side ``‖x‖²``
    term dropped from the distance (a per-row constant — it cannot
    change that row's argpartition ranking).
    """

    def __init__(self, k: int = 5):
        self.k = k
        self._X = None
        self._y = None
        self._norms = None

    def fit(self, X: np.ndarray, y: np.ndarray, norms: np.ndarray | None = None) -> "KNNClassifier":
        """``norms`` (precomputed ‖row‖²) lets a caller that slides a
        window over one big matrix skip the per-fit norm pass — the
        values are identical either way."""
        self._X = np.ascontiguousarray(X, dtype=np.float32)
        self._y = np.asarray(y, dtype=np.int64)
        self._norms = norms if norms is not None else np.einsum("ij,ij->i", self._X, self._X)
        return self

    _TRAIN_CHUNK = 4096  # d2 tile (test × chunk) stays cache-resident

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float32)
        n_train = self._X.shape[0]
        k = min(self.k, n_train)
        preds = np.empty(X.shape[0], dtype=np.int64)
        n_classes = int(self._y.max()) + 1 if self._y.size else 1
        ch = self._TRAIN_CHUNK
        for s in range(0, X.shape[0], 4096):
            xb = X[s:s + 4096]
            # tile over the train side: each d2 tile is computed, top-k
            # selected, and DISCARDED while still cache-hot — the full
            # (test × n_train) distance matrix never touches DRAM
            best_d = best_i = None
            for c0 in range(0, n_train, ch):
                Xc = self._X[c0:c0 + ch]
                d2 = self._norms[c0:c0 + ch][None, :] - 2.0 * (xb @ Xc.T)
                kc = min(k, Xc.shape[0])
                idx = np.argpartition(d2, kc - 1, axis=1)[:, :kc]
                dch = np.take_along_axis(d2, idx, axis=1)
                ich = idx + c0
                if best_d is None:
                    best_d, best_i = dch, ich
                else:
                    cat_d = np.concatenate([best_d, dch], axis=1)
                    cat_i = np.concatenate([best_i, ich], axis=1)
                    kk = min(k, cat_d.shape[1])
                    sel = np.argpartition(cat_d, kk - 1, axis=1)[:, :kk]
                    best_d = np.take_along_axis(cat_d, sel, axis=1)
                    best_i = np.take_along_axis(cat_i, sel, axis=1)
            votes = self._y[best_i]
            counts = np.zeros((xb.shape[0], n_classes), dtype=np.int64)
            for c in range(n_classes):
                counts[:, c] = np.sum(votes == c, axis=1)
            preds[s:s + 4096] = np.argmax(counts, axis=1)
        return preds


class LogisticSGD:
    """Deterministic full-batch logistic regression (gradient descent)."""

    def __init__(self, lr: float = 0.1, epochs: int = 50, l2: float = 1e-4):
        self.lr, self.epochs, self.l2 = lr, epochs, l2
        self.w = None
        self.b = 0.0

    def fit(self, X: np.ndarray, y: np.ndarray) -> "LogisticSGD":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        n, m = X.shape
        self.w = np.zeros(m)
        self.b = 0.0
        for _ in range(self.epochs):
            z = X @ self.w + self.b
            p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
            g = p - y
            self.w -= self.lr * (X.T @ g / n + self.l2 * self.w)
            self.b -= self.lr * float(np.mean(g))
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        z = np.asarray(X, dtype=np.float64) @ self.w + self.b
        return (z > 0).astype(np.int64)


MODELS = {"knn": lambda: KNNClassifier(5), "logistic": lambda: LogisticSGD()}
