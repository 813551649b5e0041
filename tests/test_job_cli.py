"""job.py CLI contract: mode exclusivity and flag-dependency errors.

Every check here fires in argparse BEFORE a SparkSession exists, so
these pin the user-facing contract (ADVICE r4: silently-ignored flag
combinations) at near-zero cost — each case is one fast subprocess.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "job.py")
BASE = ["--input", "/nonexistent-in", "--output", "/nonexistent-out"]


def _err(extra_args: list[str]) -> str:
    """Run job.py with args expected to die in argparse; return stderr."""
    r = subprocess.run([sys.executable, JOB, *BASE, *extra_args],
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 2, (
        f"expected argparse exit 2, got {r.returncode}\n"
        f"stdout: {r.stdout[-500:]}\nstderr: {r.stderr[-500:]}")
    return r.stderr


@pytest.mark.parametrize("combo", [
    ["--curate", "--classified"],
    ["--curate", "--stream-curate"],
    ["--prepare", "--bench"],
    ["--derive-surrogates", "--curate"],
    ["--derive-surrogates", "--stream-curate"],
    ["--derive-surrogates", "--prepare"],
])
def test_modes_mutually_exclusive(combo):
    assert "mutually exclusive modes" in _err(combo)


@pytest.mark.parametrize("combo, needle", [
    (["--near-dedup"], "--near-dedup requires"),
    (["--classified", "--resume"], "--resume cannot be combined"),
    (["--derive-surrogates", "--resume"], "--resume cannot be combined"),
    (["--benchmark", "/x", "--curate"], "--prepare options"),
    (["--mixture", "a:0.5"], "--prepare options"),
    (["--exact-verify", "--stream-curate"],
     "--exact-verify requires --stream-curate --near-dedup"),
    (["--exact-verify", "--curate", "--near-dedup"],
     "--exact-verify requires --stream-curate --near-dedup"),
    (["--lm-threshold", "1.45"], "--lm-threshold requires --curate"),
    (["--lm-threshold", "1.45", "--classified"],
     "--lm-threshold requires --curate"),
    (["--lm-threshold", "1.45", "--curate", "--resume"],
     "--lm-threshold is not supported with --curate --resume"),
])
def test_flag_dependencies(combo, needle):
    assert needle in _err(combo)
