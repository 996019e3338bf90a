"""Extremal Feature Selection (EFS / balanced Winnow) — the engine port
of `/root/reference/examples/example_efs.py` (SVC evaluation → the
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

# reference example_efs.py params (u/v initialized by the kernel)
param = {
    "num_features": 5, "batch_size": 50,
    "alpha": 1.5,   # promotion
    "beta": 0.5,    # demotion
    "threshold": 1, # prediction threshold
    "M": 1,         # margin
}

stats = api.simulate_stream(X, Y, "efs", param, evaluate="svm")
print("avg accuracy:", stats["acc_avg"], " avg fscr:", stats["fscr_avg"])
print("last window's features:", feature_names[stats["features"][-1]])
