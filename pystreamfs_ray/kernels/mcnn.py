"""MCNN — Micro-Cluster Nearest Neighbor feature selection (Hammoodi et
al. 2018), numpy re-derivation.

Behavior mirrors `/root/reference/pystreamfs/algorithms/mcnn.py:5-473`
exactly (verified in tests by importing the reference module with this
package's ``mutual_info_classif`` injected in place of sklearn's):

- per instance: L1 distance to every centroid; if more than
  ``max_out_of_var_bound`` of the dimensions fall outside the nearest
  cluster's variance boundary a new cluster is born, else the instance
  joins the nearest cluster (FIFO-bounded to ``max_n`` instances) with
  error bookkeeping (nearest same-label penalty), splitting into Q1/Q3
  children when the error count exceeds ``e_threshold``, and the stalest
  cluster is removed after every instance when its FP count is positive;
- per window: per-feature velocity, split/death-rate drift detection
  (percentage-difference > ``p_diff_threshold`` on both rates), kNN
  mutual-information gain over the pooled cluster instances with
  >50%-change relevancy re-activation, and on drift the max-IQR feature
  is marked irrelevant. ``w`` is the IG-weighted relevancy mask.

Dict iteration-order tie semantics of the reference (first-min /
first-max in cluster insertion order, stable sorts) are preserved.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from pystreamfs_ray.kernels.base import register
from pystreamfs_ray.kernels.mutual_info import mutual_info_classif


class _Cluster:
    """One micro-cluster (reference mcnn.py:408-444)."""

    def __init__(self, t_now: int, x: np.ndarray, y, max_n: int, e_threshold: int):
        x = np.asarray(x, dtype=np.float64)
        self.f_val = np.array(x)
        self.f_val2 = np.array(x**2)
        self.t = np.array(t_now)
        self.n = 1
        self.max_n = max_n
        self.label = y
        self.e = 0
        self.e_threshold = e_threshold
        self.fpr = 0
        self.initial_t = t_now
        self.max_iqr = np.zeros(x.shape)
        self.instances = np.array(x, ndmin=2)
        self.instance_labels = np.array(int(y))
        self.centroid = self.f_val / self.n
        self.variance = np.ones(x.shape)
        self.velocity = np.zeros(x.shape)
        self.q1 = np.array(x)
        self.q3 = np.array(x)
        self.iqr = self.q3 - self.q1
        self.f_val_h = np.zeros(x.shape)
        self.n_h = 0


class _Window:
    """Cross-window bookkeeping (reference mcnn.py:447-473)."""

    def __init__(self, x: np.ndarray):
        self.t = 0
        self.n = 0
        self.cluster_idx = 0
        self.drift = False
        self.splits = 0
        self.deaths = 0
        self.split_rate = 0.0
        self.split_rate_h = 0.0
        self.death_rate = 0.0
        self.death_rate_h = 0.0
        self.ftr_relevancy = np.ones(x.shape)
        self.ftr_ig = np.ones(x.shape)
        self.selected_ftr = np.ones(x.shape)


def _update_stats(c: _Cluster) -> _Cluster:
    """Recompute bounded-buffer statistics (reference mcnn.py:322-351)."""
    while c.n > c.max_n:
        c.instances = np.delete(c.instances, 0, 0)
        c.t = np.delete(c.t, 0, 0)
        c.instance_labels = np.delete(c.instance_labels, 0, 0)
        c.n -= 1
    c.f_val = np.sum(c.instances, axis=0)
    c.n = c.instances.shape[0]
    c.f_val2 = np.sum(c.instances**2, axis=0)
    c.label = np.argmax(np.bincount(c.instance_labels))
    with np.errstate(invalid="ignore"):
        c.variance = np.sqrt((c.f_val2 / c.n) - (c.f_val / c.n) ** 2)
    c.centroid = c.f_val / c.n
    c.q1 = np.percentile(c.instances, 25, axis=0)
    c.q3 = np.percentile(c.instances, 75, axis=0)
    c.iqr = c.q3 - c.q1
    return c


def _add_instance(c: _Cluster, c_key: int, x: np.ndarray, y, window: _Window,
                  dist_sums: dict[int, float], clusters: dict[int, _Cluster]) -> dict[int, _Cluster]:
    """Reference mcnn.py:259-319 semantics, including the nearest
    same-label error penalty and the Q1/Q3 split."""
    c.instances = np.append(c.instances, [x], axis=0)
    c.t = np.append(c.t, window.t)
    c.instance_labels = np.append(c.instance_labels, int(y))
    c.n += 1

    if y == c.label:
        if c.e > 0:
            c.e -= 1
    else:
        c.e += 1
        if y == 1:
            c.fpr += 1
        dist_sums.pop(c_key, None)
        for i in sorted(dist_sums, key=dist_sums.get):
            if clusters[i].label == y:
                clusters[i].e += 1
                break

    if c.e > c.e_threshold:
        # split into Q1/Q3 children, drop the parent (and its buffer)
        clusters[window.cluster_idx] = _Cluster(window.t, c.q1, c.label, c.max_n, c.e_threshold)
        window.cluster_idx += 1
        clusters[window.cluster_idx] = _Cluster(window.t, c.q3, c.label, c.max_n, c.e_threshold)
        window.cluster_idx += 1
        window.splits += 1
        clusters.pop(c_key, None)
    else:
        clusters[c_key] = _update_stats(c)
    return clusters


def _remove_stalest(clusters: dict[int, _Cluster], window: _Window):
    """Remove the least-recently-updated cluster if it has FPs
    (reference mcnn.py:379-405). First-max tie in insertion order."""
    best_key, best_val = None, None
    for key, c in clusters.items():
        v = window.t - np.sum(c.t) / c.n
        if best_val is None or v > best_val:
            best_key, best_val = key, v
    if clusters[best_key].fpr:
        clusters.pop(best_key, None)
        window.deaths += 1
    return clusters, window


def _detect_drift(window: _Window, p_diff_threshold: float) -> _Window:
    """Reference mcnn.py:217-256 (ZeroDivision → p_diff 0)."""
    window.split_rate = window.splits / window.n
    window.death_rate = window.deaths / window.n
    mean_split = (window.split_rate + window.split_rate_h) / 2
    mean_death = (window.death_rate + window.death_rate_h) / 2
    p_diff_split = 0.0 if mean_split == 0 else abs(window.split_rate - window.split_rate_h) / mean_split * 100
    p_diff_death = 0.0 if mean_death == 0 else abs(window.death_rate - window.death_rate_h) / mean_death * 100
    window.drift = bool(
        window.split_rate > mean_split
        and window.death_rate > mean_death
        and p_diff_split > p_diff_threshold
        and p_diff_death > p_diff_threshold
    )
    return window


def _calc_info_gain(clusters: dict[int, _Cluster]) -> np.ndarray:
    """Pool cluster buffers, estimate per-feature MI (mcnn.py:158-181)."""
    data = np.concatenate([np.atleast_2d(c.instances) for c in clusters.values()], axis=0)
    labels = np.concatenate([np.atleast_1d(c.instance_labels) for c in clusters.values()])
    return mutual_info_classif(data, labels, random_state=0)


def _update_info_gain(window: _Window, new_ig: np.ndarray, ftr: int) -> _Window:
    """Reference mcnn.py:184-214 (>50% IG change re-activates a feature)."""
    mean_ig = (window.ftr_ig[ftr] + new_ig[ftr]) / 2
    with np.errstate(divide="ignore", invalid="ignore"):
        p_diff_ig = (abs(window.ftr_ig[ftr] - new_ig[ftr]) / mean_ig) * 100
    if p_diff_ig > 50:
        window.ftr_relevancy[ftr] = 1
    window.ftr_ig[ftr] = new_ig[ftr]
    window.selected_ftr[:] = 0
    rel = window.ftr_relevancy == 1
    window.selected_ftr[rel] = window.ftr_ig[rel]
    return window


def _select_features(clusters: dict[int, _Cluster], window: _Window) -> np.ndarray:
    """On drift, mark the max-IQR feature irrelevant (mcnn.py:124-155)."""
    max_iqr_scores = np.zeros(window.selected_ftr.shape)
    for c in clusters.values():
        c.max_iqr[np.argmax(c.iqr)] += 1
        max_iqr_scores += c.max_iqr
    window.ftr_relevancy[np.argmax(max_iqr_scores)] = 0
    window.selected_ftr[:] = 0
    rel = window.ftr_relevancy == 1
    window.selected_ftr[rel] = window.ftr_ig[rel]
    return window.selected_ftr


class MCNNKernel:
    name = "mcnn"

    def init_state(self, m: int, params: dict[str, Any]) -> dict[str, Any]:
        return {"window": None, "clusters": {}}

    def update(self, state: dict[str, Any], X: np.ndarray, Y: np.ndarray,
               ctx: dict[str, Any] | None = None,
               *, max_n: int = 100, e_threshold: int = 3,
               max_out_of_var_bound: float = 0.3, p_diff_threshold: float = 50,
               **_: Any) -> tuple[np.ndarray, dict[str, Any]]:
        window: _Window = state["window"] if state["window"] is not None else _Window(X[0])
        clusters: dict[int, _Cluster] = state["clusters"]

        window.t += 1
        window.n = X.shape[0]
        window.split_rate_h = window.split_rate
        window.death_rate_h = window.death_rate
        window.splits = 0
        window.deaths = 0
        window.split_rate = 0
        window.death_rate = 0

        for x, y in zip(X, Y):
            if clusters:
                # nearest centroid by L1 sum; first-min in insertion order
                dist_sums: dict[int, float] = {}
                min_key, min_sum, min_dist = None, None, None
                for key, c in clusters.items():
                    d = np.abs(c.centroid - x)
                    s = sum(d)
                    dist_sums[key] = s
                    if min_sum is None or s < min_sum:
                        min_key, min_sum, min_dist = key, s, d
                out_of_boundary = np.sum(min_dist > clusters[min_key].variance) / len(min_dist)
                if out_of_boundary > max_out_of_var_bound:
                    clusters[window.cluster_idx] = _Cluster(window.t, x, y, max_n, e_threshold)
                    window.cluster_idx += 1
                else:
                    clusters = _add_instance(clusters[min_key], min_key, x, y,
                                             window, dist_sums, clusters)
            else:
                clusters[window.cluster_idx] = _Cluster(window.t, x, y, max_n, e_threshold)
                window.cluster_idx += 1

            if len(clusters) > 1:
                clusters, window = _remove_stalest(clusters, window)

        # per-feature velocity (first window: n_h = 0 → nan, as reference)
        with np.errstate(divide="ignore", invalid="ignore"):
            for c in clusters.values():
                c.velocity = np.abs(c.f_val / c.n - c.f_val_h / c.n_h)
                c.f_val_h = c.f_val
                c.n_h = c.n

        window = _detect_drift(window, p_diff_threshold)

        if window.t == 1:
            ftr_idx = np.where(window.ftr_relevancy == 1)[0]
        else:
            ftr_idx = np.where(window.ftr_relevancy == 0)[0]
        if ftr_idx.size:
            ig = _calc_info_gain(clusters)
            for ftr in ftr_idx:
                window = _update_info_gain(window, ig, ftr)

        if window.drift:
            w = _select_features(clusters, window)
        else:
            w = window.selected_ftr

        return np.array(w, dtype=np.float64), {"window": window, "clusters": clusters}


register(MCNNKernel())
