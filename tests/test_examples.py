"""Every shipped example runs end-to-end (VERDICT r1: examples were not
executed by any automated check — a broken example would ship silently).

Each example is executed as a user would run it (its own process, CPU
backend); a nonzero exit or traceback fails the suite.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(
    f for f in os.listdir(os.path.join(REPO, "examples"))
    if f.endswith(".py")
)


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", name)],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert p.returncode == 0, (
        f"{name} exited {p.returncode}\n--- stdout ---\n{p.stdout[-2000:]}"
        f"\n--- stderr ---\n{p.stderr[-2000:]}"
    )
