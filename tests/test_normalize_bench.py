"""tools/normalize_bench.py — the canary-normalization comparator.

Pure-python (no Spark): pins the both-canaries-must-fail-to-explain
regression rule and the pre-r6 raw-ratio fallback."""

import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.normalize_bench import compare

OLD = {"queries": {"a": 1.0, "b": 2.0, "c": 4.0},
       "canary_jvm_sec": 0.2, "canary_udf_sec": 0.8}


def test_slow_window_is_noise_not_regression():
    # Everything doubled — including both canaries: the r5 scenario.
    new = {"queries": {"a": 2.0, "b": 4.0, "c": 8.0},
           "canary_jvm_sec": 0.4, "canary_udf_sec": 1.6}
    out = compare(OLD, new)
    assert out["regressions"] == []
    assert all(r["verdict"] == "noise" for r in out["rows"])
    assert out["canary_ratios"] == {"jvm": 2.0, "udf": 2.0}


def test_real_regression_trips_under_both_canaries():
    # Canaries flat, one query 2x: neither noise class explains it.
    new = {"queries": {"a": 2.0, "b": 2.0, "c": 4.0},
           "canary_jvm_sec": 0.2, "canary_udf_sec": 0.8}
    out = compare(OLD, new)
    assert out["regressions"] == ["a"]
    row = next(r for r in out["rows"] if r["query"] == "a")
    assert row["min_norm"] == 2.0


def test_one_canary_explaining_suffices():
    # UDF canary doubled, JVM flat; a 1.9x query is within the UDF
    # class's swing -> noise (the more forgiving normalization wins).
    new = {"queries": {"a": 1.9, "b": 2.0, "c": 4.0},
           "canary_jvm_sec": 0.2, "canary_udf_sec": 1.6}
    out = compare(OLD, new)
    assert out["regressions"] == []
    row = next(r for r in out["rows"] if r["query"] == "a")
    assert row["min_norm"] == 0.95


def test_improvement_reported():
    new = {"queries": {"a": 0.5, "b": 2.0, "c": 4.0},
           "canary_jvm_sec": 0.2, "canary_udf_sec": 0.8}
    out = compare(OLD, new)
    assert out["improvements"] == ["a"]


def test_pre_r6_fallback_uses_raw_ratio():
    old = {"queries": {"a": 1.0}}          # no canaries (r1-r5 files)
    new = {"queries": {"a": 1.5}, "canary_jvm_sec": 0.2,
           "canary_udf_sec": 0.8}
    out = compare(old, new)
    assert out["canary_ratios"] is None
    assert out["regressions"] == ["a"]     # 1.5 > 1.3 raw


def test_driver_wrapper_unwrapped():
    # The driver's BENCH_r{N}.json nests bench.py's line under "parsed".
    new = {"n": 3, "rc": 0, "tail": "...",
           "parsed": {"queries": {"a": 2.0, "b": 4.0, "c": 8.0},
                      "canary_jvm_sec": 0.4, "canary_udf_sec": 1.6}}
    out = compare(OLD, new)
    assert len(out["rows"]) == 3 and out["regressions"] == []
    assert out["canary_ratios"] == {"jvm": 2.0, "udf": 2.0}


def test_cli_exit_codes(tmp_path):
    o, n = tmp_path / "o.json", tmp_path / "n.json"
    o.write_text(json.dumps(OLD))
    n.write_text(json.dumps({"queries": {"a": 1.0, "b": 2.0, "c": 4.0},
                             "canary_jvm_sec": 0.2,
                             "canary_udf_sec": 0.8}))
    repo = Path(__file__).resolve().parents[1]
    r = subprocess.run([sys.executable, "tools/normalize_bench.py",
                        str(o), str(n)], cwd=repo, capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr
    assert "0 regression(s)" in r.stdout
    n.write_text(json.dumps({"queries": {"a": 9.0, "b": 2.0, "c": 4.0},
                             "canary_jvm_sec": 0.2,
                             "canary_udf_sec": 0.8}))
    r = subprocess.run([sys.executable, "tools/normalize_bench.py",
                        str(o), str(n)], cwd=repo, capture_output=True,
                       text=True)
    assert r.returncode == 1
    assert "REGRESSIONS: a" in r.stdout
