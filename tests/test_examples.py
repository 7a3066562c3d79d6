"""The examples/ scripts must stay runnable — each asserts its own
correctness claims internally, so a clean exit is the check."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
EXAMPLES = os.path.join(ROOT, "examples")


@pytest.mark.parametrize(
    "script",
    [
        "01_offline_upmix.py",
        "02_streaming_checkpoint.py",
        "03_multichip_sharded.py",
        "04_serving.py",
    ],
)
def test_example_runs(script, tmp_path):
    from helpers import cpu_child_env

    env = cpu_child_env()
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import sys, runpy; sys.argv = [sys.argv[1], sys.argv[2]]; "
        "runpy.run_path(sys.argv[0], run_name='__main__')"
    )
    r = subprocess.run(
        [sys.executable, "-c", code, os.path.join(EXAMPLES, script), str(tmp_path)],
        capture_output=True,
        text=True,
        env=env,
        timeout=500,
        cwd=ROOT,
    )
    assert r.returncode == 0, r.stdout[-800:] + r.stderr[-1500:]
