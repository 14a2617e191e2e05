"""Execute the examples/ catalog end-to-end.

The reference's examples bit-rotted against its own env (SURVEY.md
§2.5.12: examples/04 reads obs keys the env never produces). Running ours
in the suite keeps the catalog honest.
"""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
EXAMPLES = [
    "01_basic_usage.py",
    "02_custom_reward.py",
    "03_custom_terrain.py",
    "04_custom_policy.py",
    "05_training_workflow.py",
    "06_configuration.py",
]


def _example_env():
    env = dict(os.environ)
    # run the way users do: single CPU device, warm persistent cache
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    # examples must import the package even when it isn't pip-installed
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.parametrize("script", EXAMPLES)
def test_example_runs(script):
    path = os.path.join(REPO, "examples", script)
    res = subprocess.run([sys.executable, path], cwd=REPO,
                         env=_example_env(), capture_output=True,
                         text=True, timeout=900)
    assert res.returncode == 0, (
        f"{script} failed\nstdout:\n{res.stdout[-2000:]}\n"
        f"stderr:\n{res.stderr[-2000:]}")
