"""Online Feature Selection (OFS) — the engine port of
`/root/reference/examples/example_ofs.py`.

Same workflow, two execution paths:
1. the reference's matrix path (prepare_data → simulate_stream →
   plot_data) — single-process, numerically identical to pystreamfs;
2. the distributed path — the same CSV as a transcript-shaped stream
   Dataset through the bucketed selector stage (what you would run on
   a cluster over Parquet shards).

The reference example uses har.csv, which is stripped from this
snapshot (`/root/reference/.MISSING_LARGE_BLOBS`); credit.csv is the
shipped dataset.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from pystreamfs_ray import api

# Load a dataset
data = pd.read_csv("/root/reference/datasets/credit.csv")
feature_names = np.array(data.drop("target", axis=1).columns)
data = np.array(data)

# Extract features and target variable
X, Y = api.prepare_data(data, 0, False)

# Define parameters (reference example_ofs.py:18-20)
param = {"num_features": 5, "batch_size": 50}

# Data stream simulation with a KNN evaluation model
stats = api.simulate_stream(X, Y, "ofs", param, evaluate="knn")
print("avg accuracy:", stats["acc_avg"], " avg fscr:", stats["fscr_avg"])
print("last window's features:", feature_names[stats["features"][-1]])

# Plot-ready reshaping (rendering is out of engine scope — no display
# libs on a cluster node; feed this dict to any frontend)
plot = api.plot_data(stats, feature_names, param)
print("accuracy quartiles:", plot["q1_acc"], plot["q3_acc"])

# --- the same selection, distributed ---------------------------------
if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        # workers must import pystreamfs_ray from the repo checkout
        _root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        os.environ["PYTHONPATH"] = _root + os.pathsep + os.environ.get("PYTHONPATH", "")
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    from pystreamfs_ray.sources import csv_stream_source
    from pystreamfs_ray.stages.selector import run_selector

    ds = csv_stream_source("/root/reference/datasets/credit.csv", entity="credit")
    windows = run_selector(
        ds, kernel="ofs", batch_size=50, num_features=5,
        feature_cols=[f"f{i:02d}" for i in range(X.shape[1])],
        ts_col=None, num_buckets=2, evaluate="knn",
    ).to_pandas().sort_values("window_id")
    print("distributed windows:", len(windows),
          "avg acc:", windows["acc"].mean())
    ray.shutdown()
