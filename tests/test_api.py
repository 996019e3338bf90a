"""Reference-shaped API surface: prepare_data / simulate_stream /
plot_data and the user-kernel plug-in contract (SURVEY.md §2.9, §3.2-3.3)."""

import numpy as np

from pystreamfs_ray.api import (
    available_kernels,
    plot_data,
    prepare_data,
    register_kernel,
    simulate_stream,
)
from pystreamfs_ray.oracle import run_stream


def test_prepare_data(credit_data):
    X, Y = credit_data
    data = np.column_stack([Y, X])
    X2, Y2 = prepare_data(data, 0, shuffle=False)
    assert np.array_equal(X2, X) and np.array_equal(Y2, Y)
    X3, Y3 = prepare_data(data, 0, shuffle=True, seed=5)
    assert X3.shape == X.shape and not np.array_equal(X3, X)
    assert sorted(Y3.tolist()) == sorted(Y.tolist())


def test_simulate_stream_stats_shape(credit_data):
    X, Y = credit_data
    stats = simulate_stream(X, Y, "ofs", {"batch_size": 50, "num_features": 5},
                            evaluate="knn")
    assert len(stats["features"]) == 20
    assert len(stats["fscr_measures"]) == 19
    assert len(stats["acc_measures"]) == 20
    assert 0 <= stats["acc_avg"] <= 1
    pd_ = plot_data(stats, [f"f{i}" for i in range(X.shape[1])], {"num_features": 5})
    assert pd_["y_acc"].shape == (20,)
    assert pd_["avg_fscr"] is not None

    # plot_stats renders when matplotlib exists, else returns the dict —
    # either way it must run headless (reference pystreamfs.py:103-161)
    from pystreamfs_ray.api import plot_stats

    out = plot_stats(stats, [f"f{i}" for i in range(X.shape[1])],
                     {"num_features": 5}, fs_algorithm="ofs", ml_model="knn")
    if isinstance(out, dict):
        assert out["y_time"].shape == (20,) and out["fs_algorithm"] == "ofs"
    else:  # matplotlib Figure
        assert out.axes


def test_custom_kernel_plugin(credit_data):
    """A reference-style fn(X, Y, w, param) plug-in runs through the
    standard engine path and matches its own sequential math."""
    X, Y = credit_data

    def variance_fs(X, Y, w, param):
        # toy: weight = running mean of per-window feature variance
        v = X.var(axis=0)
        n = param.get("_n", 0)
        w = (np.asarray(w, dtype=float) * n + v) / (n + 1)
        param["_n"] = n + 1
        return w, param

    register_kernel("variance_fs", variance_fs)
    assert "variance_fs" in available_kernels()

    out = run_stream(X, Y, "variance_fs", batch_size=50, num_features=5)
    assert len(out) == 20
    # window k weight == mean of first k+1 per-window variances
    expect = np.mean([X[i:i + 50].var(axis=0) for i in range(0, 150, 50)], axis=0)
    np.testing.assert_allclose(out[2]["w"], expect, rtol=1e-9)


def test_builtin_kernels_registered():
    assert {"ofs", "efs", "fsds", "mcnn", "cancelout"} <= set(available_kernels())
