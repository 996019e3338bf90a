"""Evaluation-model stand-ins (models.py): the reference accepts any
sklearn-protocol model (`/root/reference/pystreamfs/utils.py:48-51`); the
examples pass KNeighbors / DecisionTree / SVC. These tests pin the numpy
stand-ins' contract: deterministic refits, correct learning on separable
data, and drop-in use through the selector's prequential eval path."""

import numpy as np
import pytest

from pystreamfs_ray.models import MODELS, DecisionTreeCART, LinearSVM


def _blobs(n=200, seed=3):
    rng = np.random.default_rng(seed)
    X0 = rng.normal(loc=-2.0, scale=0.7, size=(n // 2, 4))
    X1 = rng.normal(loc=+2.0, scale=0.7, size=(n // 2, 4))
    X = np.vstack([X0, X1])
    y = np.r_[np.zeros(n // 2, dtype=np.int64), np.ones(n // 2, dtype=np.int64)]
    perm = rng.permutation(n)
    return X[perm], y[perm]


def test_tree_learns_xor_exactly():
    # XOR needs depth 2 — a stump can't do it, CART must recurse
    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, size=(400, 2))
    y = ((X[:, 0] > 0.5) ^ (X[:, 1] > 0.5)).astype(np.int64)
    m = DecisionTreeCART(max_depth=4).fit(X, y)
    assert np.array_equal(m.predict(X), y)


def test_tree_multiclass_and_single_class():
    X = np.array([[0.0], [1.0], [2.0], [3.0], [4.0], [5.0]])
    y = np.array([0, 0, 1, 1, 2, 2])
    m = DecisionTreeCART().fit(X, y)
    assert np.array_equal(m.predict(X), y)
    # degenerate: one class → constant prediction
    m1 = DecisionTreeCART().fit(X, np.ones(6, dtype=np.int64))
    assert np.array_equal(m1.predict(X), np.ones(6, dtype=np.int64))


def test_tree_deterministic_refit():
    X, y = _blobs()
    a = DecisionTreeCART().fit(X, y)
    b = DecisionTreeCART().fit(X, y)
    np.testing.assert_array_equal(a._feat, b._feat)
    np.testing.assert_array_equal(a._thr, b._thr)
    np.testing.assert_array_equal(a._leaf, b._leaf)
    np.testing.assert_array_equal(a.predict(X), b.predict(X))


def test_svm_separable_and_deterministic():
    X, y = _blobs()
    a = LinearSVM().fit(X, y)
    assert np.mean(a.predict(X) == y) == 1.0
    b = LinearSVM().fit(X, y)
    np.testing.assert_array_equal(a.w, b.w)
    assert a.b == b.b


def test_models_registry_fit_predict_protocol():
    X, y = _blobs(n=80)
    norms = np.einsum("ij,ij->i", X, X)
    for name, factory in MODELS.items():
        m = factory()
        m.fit(X, y, norms)  # selector passes norms positionally
        pred = m.predict(X[:10])
        assert pred.shape == (10,)
        assert set(np.unique(pred)) <= {0, 1}


@pytest.mark.parametrize("model", ["tree", "svm"])
def test_selector_eval_with_tree_and_svm_on_credit(ray_session, credit_data, model):
    """The reference's example_fsds / example_mcnn model choices, ported:
    credit.csv through the distributed selector with prequential eval."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from pystreamfs_ray.stages.selector import run_selector

    X, Y = credit_data
    names = [f"f{i:02d}" for i in range(X.shape[1])]
    df = pd.DataFrame(X[:500], columns=names)
    df.insert(0, "conv_id", "credit")
    df.insert(1, "turn_idx", np.arange(len(df), dtype=np.int32))
    df["label"] = Y[:500].astype(np.int8)
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = run_selector(
        ds, kernel="ofs", batch_size=50, num_features=5,
        feature_cols=names, ts_col=None, num_buckets=2, evaluate=model,
    ).to_pandas().sort_values("window_id")
    assert len(out) == 10
    assert out["acc"].notna().all()
    assert ((out["acc"] >= 0) & (out["acc"] <= 1)).all()
