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
    """

    def __init__(self, k: int = 5):
        self.k = k
        self._X = None
        self._y = None

    def fit(self, X: np.ndarray, y: np.ndarray) -> "KNNClassifier":
        self._X = np.asarray(X, dtype=np.float64)
        self._y = np.asarray(y, dtype=np.int64)
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        k = min(self.k, self._X.shape[0])
        # chunk the test side so the distance matrix stays bounded
        preds = np.empty(X.shape[0], dtype=np.int64)
        n_classes = int(self._y.max()) + 1 if self._y.size else 1
        for s in range(0, X.shape[0], 4096):
            xb = X[s:s + 4096]
            d2 = (
                np.sum(xb**2, axis=1)[:, None]
                - 2.0 * xb @ self._X.T
                + np.sum(self._X**2, axis=1)[None, :]
            )
            nn = np.argpartition(d2, k - 1, axis=1)[:, :k]
            votes = self._y[nn]
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
