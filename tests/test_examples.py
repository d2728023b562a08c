"""Smoke-run every example app at sf0.001 — the examples are the
documented user surface, and nothing else executes them: an operator
signature change that breaks a composition shows up here, not in the
operator's own unit tests. Each runs in a SUBPROCESS (own JVM) so an
example that tweaks session confs or leaves cached frames can't bleed
into the rest of the suite; success = exit 0, which every example
guards with its own printed assertions."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(
    f for f in os.listdir(os.path.join(REPO, "examples"))
    if f.endswith(".py")
)


def test_every_example_is_covered():
    # a new example must land in the smoke list automatically
    assert len(EXAMPLES) >= 8


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs_clean(name, sf_dir):
    # pass the suite's sf_dir (honors SPARK_GRAFT_TEST_SF) instead of
    # relying on each example's hardcoded default path
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", name), sf_dir],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, (
        f"{name} exited {proc.returncode}\n"
        f"stdout tail: {proc.stdout[-2000:]}\n"
        f"stderr tail: {proc.stderr[-2000:]}"
    )
