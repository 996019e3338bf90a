"""Kernel parity vs the reference implementations on credit.csv
(batch_size=50, num_features=5 — the defaults of every reference
example)."""

import numpy as np
import pytest

from pystreamfs_ray.oracle import run_stream
from tests.ref_loader import (
    load_ref_efs,
    load_ref_fsds,
    load_ref_mcnn,
    load_ref_ofs,
    ref_simulate,
)


def _compare(ref_out, my_out):
    assert len(ref_out) == len(my_out)
    for wid, ((rw, rsel), mine) in enumerate(zip(ref_out, my_out)):
        np.testing.assert_allclose(
            mine["w"], rw, rtol=1e-9, atol=1e-12, err_msg=f"window {wid} weights"
        )
        assert set(mine["selected"]) == set(rsel), f"window {wid} selected set"


def test_ofs_parity(credit_data):
    X, Y = credit_data
    ref = ref_simulate(X, Y, load_ref_ofs().run_ofs, {"num_features": 5})
    mine = run_stream(X, Y, "ofs", batch_size=50, num_features=5)
    _compare(ref, mine)
    # OFS is bit-exact (same expressions)
    for (rw, _), m in zip(ref, mine):
        assert np.array_equal(rw, m["w"])


def test_fsds_parity(credit_data):
    X, Y = credit_data
    param = {"num_features": 5, "B": [], "ell": 0, "k": 2, "m": X.shape[1]}
    ref = ref_simulate(X, Y, load_ref_fsds().run_fsds, param)
    mine = run_stream(X, Y, "fsds", batch_size=50, num_features=5, kernel_params={"k": 2})
    _compare(ref, mine)


def test_efs_parity(credit_data):
    X, Y = credit_data
    m = X.shape[1]
    param = {
        "num_features": 5,
        "u": np.ones(m) * 2,
        "v": np.ones(m),
        "alpha": 1.5,
        "beta": 0.5,
        "threshold": 1,
        "M": 1,
    }
    ref = ref_simulate(X, Y, load_ref_efs().run_efs, param)
    mine = run_stream(X, Y, "efs", batch_size=50, num_features=5)
    _compare(ref, mine)


def test_mcnn_parity(credit_data):
    X, Y = credit_data
    X, Y = X[:400], Y[:400]  # MCNN + MI is the slow kernel; 8 windows suffice
    param = {
        "num_features": 5,
        "max_n": 100,
        "e_threshold": 3,
        "max_out_of_var_bound": 0.3,
        "p_diff_threshold": 50,
    }
    ref = ref_simulate(X, Y, load_ref_mcnn().run_mcnn, param)
    mine = run_stream(X, Y, "mcnn", batch_size=50, num_features=5)
    _compare(ref, mine)


def test_cancelout_determinism(credit_data):
    X, Y = credit_data
    X, Y = X[:150], Y[:150]
    a = run_stream(X, Y, "cancelout", batch_size=50, num_features=5, conv_id="c1")
    b = run_stream(X, Y, "cancelout", batch_size=50, num_features=5, conv_id="c1")
    for wa, wb in zip(a, b):
        assert np.array_equal(wa["w"], wb["w"])  # seeded → bit-identical
    c = run_stream(X, Y, "cancelout", batch_size=50, num_features=5, conv_id="c2")
    assert not np.array_equal(a[0]["w"], c[0]["w"])  # per-entity seed differs
    assert a[0]["w"].shape == (X.shape[1],)
    assert np.all(np.isfinite(a[0]["w"]))


def test_fscr_semantics(credit_data):
    X, Y = credit_data
    mine = run_stream(X, Y, "ofs", batch_size=50, num_features=5)
    assert mine[0]["fscr"] is None
    for prev, cur in zip(mine, mine[1:]):
        expect = len(set(prev["selected"]) - set(cur["selected"])) / 5
        assert cur["fscr"] == expect


@pytest.mark.parametrize("kernel", ["ofs", "efs", "fsds"])
def test_short_tail_window(credit_data, kernel):
    """965 rows / bs=50 → 20 windows, last with 15 rows (range-step
    semantics, reference pystreamfs.py:59)."""
    X, Y = credit_data
    out = run_stream(X, Y, kernel, batch_size=50, num_features=5)
    assert len(out) == 20
    assert out[-1]["n_rows"] == 15
