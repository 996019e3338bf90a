"""Reference-shaped convenience API (SURVEY.md §3.2/§3.3 parity).

A user of pystreamfs drives three functions: ``prepare_data``,
``simulate_stream`` and ``plot_stats`` (`/root/reference/README.md:42-86`),
optionally passing their own feature-selection function
(`README.md:103-122`). These wrappers give that exact workflow on top of
the engine primitives — single-process on a matrix (oracle-exact), or
distributed via the selector stage when handed a Dataset.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

from pystreamfs_ray.kernels.base import KERNELS, register
from pystreamfs_ray.oracle import run_stream


def prepare_data(data: np.ndarray, target: int, shuffle: bool,
                 seed: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Split the target column out of a dense matrix
    (`/root/reference/pystreamfs/pystreamfs.py:10-26`). Shuffling is
    seeded here (the reference uses global RNG state)."""
    if shuffle:
        rng = np.random.default_rng(seed)
        data = data[rng.permutation(data.shape[0])]
    Y = data[:, target]
    X = np.delete(data, target, 1)
    return X, Y


def simulate_stream(X: np.ndarray, Y: np.ndarray, kernel: str, param: dict[str, Any],
                    evaluate: str | None = None) -> dict[str, Any]:
    """Reference ``simulate_stream`` semantics on one in-memory stream
    (`/root/reference/pystreamfs/pystreamfs.py:29-100`): returns the
    stats dict shape (per-window lists + averages)."""
    batch_size = int(param.get("batch_size", 50))
    num_features = int(param.get("num_features", 5))
    kernel_params = {k: v for k, v in param.items()
                     if k not in ("batch_size", "num_features")}
    out = run_stream(X, Y, kernel, batch_size=batch_size,
                     num_features=num_features, kernel_params=kernel_params,
                     evaluate=evaluate)
    stats = {
        "features": [o["selected"].tolist() for o in out],
        "fscr_measures": [o["fscr"] for o in out if o["fscr"] is not None],
        "acc_measures": [o["acc"] for o in out if o["acc"] is not None],
        "time_measures": [o["time_s"] for o in out],
        "memory_measures": [o["mem_bytes"] for o in out],
        "weights": [o["w"] for o in out],
    }
    stats["fscr_avg"] = float(np.mean(stats["fscr_measures"])) if stats["fscr_measures"] else None
    stats["acc_avg"] = float(np.mean(stats["acc_measures"])) if stats["acc_measures"] else None
    stats["time_avg"] = float(np.mean(stats["time_measures"])) if stats["time_measures"] else None
    stats["memory_avg"] = float(np.mean(stats["memory_measures"])) if stats["memory_measures"] else None
    return stats


class FunctionKernel:
    """Adapter: a reference-style plug-in ``fn(X, Y, w, param) -> (w,
    param)`` becomes a registered SelectorKernel, runnable through every
    engine path (oracle, selector stage, checkpointed runs)."""

    def __init__(self, name: str, fn: Callable):
        self.name = name
        self.fn = fn

    def init_state(self, m: int, params: dict[str, Any]):
        return {"w": np.zeros(m, dtype=np.float64), "param": dict(params)}

    def update(self, state, X, Y, ctx=None, **_ignored):
        w, param = self.fn(X=X, Y=Y, w=state["w"], param=state["param"])
        w = np.asarray(w, dtype=np.float64)
        return w, {"w": w, "param": param}


def register_kernel(name: str, fn: Callable) -> None:
    """Register a user feature-selection function under ``name``
    (engine analog of the reference's ``fs_algorithm`` argument)."""
    register(FunctionKernel(name, fn))


def available_kernels() -> list[str]:
    return sorted(KERNELS)


def plot_stats(stats: dict[str, Any], ftr_names, param: dict[str, Any],
               fs_algorithm: str = "", ml_model: str = ""):
    """Reference ``plot_stats`` (`/root/reference/pystreamfs/pystreamfs.py:103-161`,
    `pystreamfs/plots.py:14-60`): render the 6-panel figure when
    matplotlib is importable, otherwise return the reshaped
    ``plot_data`` dict (this sandbox has no matplotlib — the data path
    is identical either way, so a user can hand the dict to their own
    renderer)."""
    data = plot_data(stats, ftr_names, param)
    data["fs_algorithm"] = fs_algorithm
    data["ml_model"] = ml_model
    try:
        import matplotlib

        matplotlib.use("Agg")  # headless
        import matplotlib.pyplot as plt
    except ImportError:
        return data

    fig, axes = plt.subplots(3, 2, figsize=(12, 10))
    fig.suptitle(f"{fs_algorithm} / {ml_model}")
    panels = [
        ("time (ms)", data["x_time"], data["y_time"], data["avg_time"]),
        ("memory (kB)", data["x_mem"], data["y_mem"], data["avg_mem"]),
        ("accuracy (%)", data["x_acc"], data["y_acc"], data["avg_acc"]),
        ("fscr", data["x_fscr"], data["y_fscr"], data["avg_fscr"]),
    ]
    for ax, (title, x, y, avg) in zip(axes.flat, panels):
        ax.plot(x, y)
        if avg is not None:
            ax.axhline(avg, linestyle="--")
        ax.set_title(title)
    # selected-features scatter (panel 5), parameter text (panel 6)
    ax = axes.flat[4]
    for wid, sel in enumerate(data["selected_ftr"]):
        ax.scatter([wid] * len(sel), sel, marker="s", s=4)
    ax.set_yticks(list(data["y_ticks_ftr"]))
    ax.set_title("selected features")
    axes.flat[5].axis("off")
    axes.flat[5].text(0, 0.5, "\n".join(f"{k}={v}" for k, v in param.items()))
    fig.tight_layout()
    return fig


def plot_data(stats: dict[str, Any], ftr_names, param: dict[str, Any]) -> dict[str, Any]:
    """Reshape stats for plotting, mirroring the reference's
    ``plot_stats`` intermediate (`pystreamfs/pystreamfs.py:117-158`) —
    rendering itself is out of engine scope (SURVEY.md §2.1 S3)."""
    acc = np.array(stats.get("acc_measures", []), dtype=float)
    fscr = np.array(stats.get("fscr_measures", []), dtype=float)
    tms = np.array(stats.get("time_measures", []), dtype=float)
    mem = np.array(stats.get("memory_measures", []), dtype=float)
    out = {
        "ftr_names": list(ftr_names),
        "param": param,
        # time in ms / memory in kB, as the reference scales them
        # (pystreamfs.py:126-134)
        "x_time": np.arange(tms.size),
        "y_time": tms * 1000,
        "avg_time": float(tms.mean() * 1000) if tms.size else None,
        "x_mem": np.arange(mem.size),
        "y_mem": mem / 1000,
        "avg_mem": float(mem.mean() / 1000) if mem.size else None,
        "x_acc": np.arange(acc.size),
        "y_acc": acc * 100,
        "avg_acc": float(acc.mean() * 100) if acc.size else None,
        "q1_acc": float(np.percentile(acc, 25) * 100) if acc.size else None,
        "q3_acc": float(np.percentile(acc, 75) * 100) if acc.size else None,
        "selected_ftr": stats.get("features", []),
        "x_fscr": np.arange(1, fscr.size + 1),
        "y_fscr": fscr,
        "avg_fscr": float(fscr.mean()) if fscr.size else None,
        "y_ticks_ftr": range(len(list(ftr_names))),
    }
    return out
