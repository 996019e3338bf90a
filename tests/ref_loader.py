"""Import the reference algorithm modules as test oracles.

The reference is read-only public content used strictly as a behavioral
oracle. Modules that import sklearn get a minimal shim injected (the
sandbox has no sklearn); the shim's math is this package's own
(`row_minmax`, `mutual_info_classif`), so the parity tests check the
reference's *control flow and arithmetic* against ours exactly.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np

REF = "/root/reference/pystreamfs/algorithms"


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ensure_fake_sklearn():
    if "sklearn" in sys.modules and getattr(sys.modules["sklearn"], "_pystreamfs_fake", False):
        return
    from pystreamfs_ray.kernels.mutual_info import mutual_info_classif

    class FakeMinMaxScaler:
        def fit_transform(self, X):
            X = np.asarray(X, dtype=np.float64)
            mn = X.min(axis=0)
            rng = X.max(axis=0) - mn
            rng = np.where(rng == 0, 1.0, rng)
            return (X - mn) / rng

    sk = types.ModuleType("sklearn")
    sk._pystreamfs_fake = True
    pre = types.ModuleType("sklearn.preprocessing")
    pre.MinMaxScaler = FakeMinMaxScaler
    fs = types.ModuleType("sklearn.feature_selection")
    fs.mutual_info_classif = mutual_info_classif
    sk.preprocessing = pre
    sk.feature_selection = fs
    sys.modules["sklearn"] = sk
    sys.modules["sklearn.preprocessing"] = pre
    sys.modules["sklearn.feature_selection"] = fs


def load_ref_ofs():
    return _load("ref_ofs", f"{REF}/ofs.py")


def load_ref_fsds():
    return _load("ref_fsds", f"{REF}/fsds.py")


def load_ref_efs():
    _ensure_fake_sklearn()
    return _load("ref_efs", f"{REF}/efs.py")


def load_ref_mcnn():
    _ensure_fake_sklearn()
    return _load("ref_mcnn", f"{REF}/mcnn.py")


def ref_simulate(X, Y, fn, param, num_features=5, batch_size=50):
    """The reference simulate_stream loop (pystreamfs.py:59-90), kernel
    and ranking only — returns per-window (w, selected)."""
    w = np.zeros(X.shape[1], dtype=int)
    out = []
    for i in range(0, X.shape[0], batch_size):
        w, param = fn(X=X[i:i + batch_size], Y=Y[i:i + batch_size], w=w, param=param)
        selected = np.argsort(np.abs(w))[::-1][:num_features]
        out.append((np.array(w, dtype=np.float64, copy=True), selected.copy()))
    return out
