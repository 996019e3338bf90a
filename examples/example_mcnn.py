"""Micro-Cluster Nearest Neighbor (MCNN) — the engine port of
`/root/reference/examples/example_mcnn.py` (SVC evaluation → the
engine's linear-SVM stand-in)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from pystreamfs_ray import api

data = pd.read_csv("/root/reference/datasets/credit.csv")
feature_names = np.array(data.drop("target", axis=1).columns)
data = np.array(data)

X, Y = api.prepare_data(data, 0, False)

# original parameters from the paper (reference example_mcnn.py)
param = {
    "num_features": 5, "batch_size": 50,
    "max_n": 100,          # max saved instances per cluster
    "e_threshold": 3,      # error threshold for cluster split
    "max_out_of_var_bound": 0.3,
    "p_diff_threshold": 50,
}

stats = api.simulate_stream(X, Y, "mcnn", param, evaluate="svm")
print("avg accuracy:", stats["acc_avg"], " avg fscr:", stats["fscr_avg"])
print("last window's features:", feature_names[stats["features"][-1]])
