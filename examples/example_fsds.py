"""Feature Selection on Data Streams (FSDS) — the engine port of
`/root/reference/examples/example_fsds.py` (DecisionTree evaluation).
Matrix path is numerically identical to the reference kernel."""

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

# reference example_fsds.py params: B/ell/k/m
param = {
    "num_features": 5, "batch_size": 50,
    "ell": 0,  # initial sketch size (0 → sqrt(m))
    "k": 2,    # no. of singular values (binary classification)
}

# DecisionTree evaluation model (reference passes DecisionTreeClassifier)
stats = api.simulate_stream(X, Y, "fsds", param, evaluate="tree")
print("avg accuracy:", stats["acc_avg"], " avg fscr:", stats["fscr_avg"])
print("last window's features:", feature_names[stats["features"][-1]])
