"""CancelOut feature scoring — the engine port of
`/root/reference/examples/example_cancelout.py` (SVC evaluation → the
engine's linear-SVM stand-in). The reference trains an unseeded torch
MLP; the engine's kernel is a seeded numpy MLP (deterministic spec —
documented deviation, torch absent)."""

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

param = {"num_features": 5, "batch_size": 50}

stats = api.simulate_stream(X, Y, "cancelout", param, evaluate="svm")
print("avg accuracy:", stats["acc_avg"], " avg fscr:", stats["fscr_avg"])
print("last window's features:", feature_names[stats["features"][-1]])
