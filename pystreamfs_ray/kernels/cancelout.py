"""CancelOut feature scoring (Borisov et al.), seeded numpy re-derivation.

The reference trains a small unseeded PyTorch net per window
(`/root/reference/pystreamfs/algorithms/cancelout.py:43-159`): a
CancelOut gate ``x * sigmoid(w_c)`` with zero-init gate weights, then
Linear(m, m+1) → ReLU6 → Linear(m+1, 2), cross-entropy loss, Adam
lr=0.01, minibatch 32 with shuffling, ≤20 epochs, early stopping with
patience 3 on the *cumulative* average of all minibatch losses seen so
far (the reference never resets its loss accumulator — quirk preserved).
Returned weights are the gate vector ``w_c``.

DOCUMENTED DEVIATION: the reference is nondeterministic (unseeded torch
RNG for init + DataLoader shuffling). The sandbox has no torch, so this
numpy trainer with per-(entity, window) seeding IS the spec here
(SURVEY.md §5.4); layer init follows torch's documented
U(−1/√fan_in, 1/√fan_in) scheme with a numpy Generator.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from pystreamfs_ray.kernels.base import register
from pystreamfs_ray.util import stable_hash64


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def _softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


class _Adam:
    def __init__(self, shapes, lr=0.01, b1=0.9, b2=0.999, eps=1e-8):
        self.lr, self.b1, self.b2, self.eps = lr, b1, b2, eps
        self.t = 0
        self.m = [np.zeros(s) for s in shapes]
        self.v = [np.zeros(s) for s in shapes]

    def step(self, params, grads):
        self.t += 1
        bc1 = 1.0 - self.b1**self.t
        bc2 = 1.0 - self.b2**self.t
        out = []
        for i, (p, g) in enumerate(zip(params, grads)):
            self.m[i] = self.b1 * self.m[i] + (1 - self.b1) * g
            self.v[i] = self.b2 * self.v[i] + (1 - self.b2) * g * g
            out.append(p - self.lr * (self.m[i] / bc1) / (np.sqrt(self.v[i] / bc2) + self.eps))
        return out


def train_cancelout(X: np.ndarray, Y: np.ndarray, seed: int, *,
                    num_epochs: int = 20, minibatch: int = 32,
                    lr: float = 0.01, patience: int = 3) -> np.ndarray:
    """Train the gate net on one window; return gate weights w_c."""
    rng = np.random.default_rng(seed)
    X = np.asarray(X, dtype=np.float64)
    Y = np.asarray(Y, dtype=np.int64)
    n, m = X.shape
    h = m + 1

    wc = np.zeros(m)
    k1 = 1.0 / np.sqrt(m)
    W1 = rng.uniform(-k1, k1, size=(h, m))
    b1 = rng.uniform(-k1, k1, size=h)
    k2 = 1.0 / np.sqrt(h)
    W2 = rng.uniform(-k2, k2, size=(2, h))
    b2 = rng.uniform(-k2, k2, size=2)

    params = [wc, W1, b1, W2, b2]
    opt = _Adam([p.shape for p in params], lr=lr)

    losses: list[float] = []  # cumulative across epochs (reference quirk)
    best_score = None
    counter = 0
    for _epoch in range(num_epochs):
        order = rng.permutation(n)
        for s in range(0, n, minibatch):
            idx = order[s:s + minibatch]
            xb, yb = X[idx], Y[idx]
            B = xb.shape[0]
            wc, W1, b1, W2, b2 = params

            sg = _sigmoid(wc)
            g = xb * sg
            z1 = g @ W1.T + b1
            a1 = np.minimum(np.maximum(z1, 0.0), 6.0)
            z2 = a1 @ W2.T + b2
            p = _softmax(z2)
            losses.append(float(-np.mean(np.log(p[np.arange(B), yb] + 1e-300))))

            gz2 = p.copy()
            gz2[np.arange(B), yb] -= 1.0
            gz2 /= B
            gW2 = gz2.T @ a1
            gb2 = gz2.sum(axis=0)
            ga1 = gz2 @ W2
            gz1 = ga1 * ((z1 > 0.0) & (z1 < 6.0))
            gW1 = gz1.T @ g
            gb1 = gz1.sum(axis=0)
            gg = gz1 @ W1
            gwc = np.sum(gg * xb, axis=0) * sg * (1.0 - sg)

            params = opt.step(params, [gwc, gW1, gb1, gW2, gb2])

        avg = float(np.mean(losses))
        score = -avg
        if best_score is None:
            best_score = score
        elif score < best_score:
            counter += 1
            if counter >= patience:
                break
        else:
            best_score = score
            counter = 0

    return params[0]


class CancelOutKernel:
    name = "cancelout"

    def init_state(self, m: int, params: dict[str, Any]) -> None:
        return None  # no cross-window state (reference cancelout.py:180-190 commented out)

    def update(self, state: None, X: np.ndarray, Y: np.ndarray,
               ctx: dict[str, Any] | None = None,
               *, num_epochs: int = 20, **_: Any) -> tuple[np.ndarray, None]:
        ctx = ctx or {}
        seed = stable_hash64("cancelout", ctx.get("conv_id", ""), ctx.get("window_id", 0))
        w = train_cancelout(X, Y, seed % (2**63), num_epochs=num_epochs)
        return np.asarray(w, dtype=np.float64), None


register(CancelOutKernel())
