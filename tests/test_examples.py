"""The reference's five examples, ported — smoke (matrix path)."""

import subprocess
import sys

import pytest

EX = "/root/repo/examples"


@pytest.mark.parametrize("name", ["fsds", "efs", "mcnn", "cancelout"])
def test_example_matrix_path(name):
    out = subprocess.run(
        [sys.executable, f"{EX}/example_{name}.py"],
        capture_output=True, text=True, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "avg accuracy:" in out.stdout
