import numpy as np
import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (required by the driver
    contract: tests never init per-test)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def credit_data():
    """The reference's de facto fixture: datasets/credit.csv, target col 0."""
    data = np.genfromtxt(
        "/root/reference/datasets/credit.csv", delimiter=",", skip_header=1
    )
    Y = data[:, 0]
    X = np.delete(data, 0, 1)
    return X, Y


@pytest.fixture(scope="session")
def synth_dirs(tmp_path_factory):
    """Small deterministic transcript + label fixture (FIXTURES.md F1/F3)."""
    from pystreamfs_ray.synth import build_fixture

    root = tmp_path_factory.mktemp("synth")
    return build_fixture(str(root), n_convs=20, seed=7, mega_convs=2, n_files=4)
