"""tools/normalize_bench.py — the canary-normalization comparator.

Pure-python (no Spark): pins the r7 gate rule (VERDICT r6 #1 + ADVICE):
REGRESSION needs the delta to exceed tol BOTH raw and canary-normalized,
sub-floor queries never gate, and the suite total gates at a tighter
tolerance. Acceptance: an identical-tree A/B (the judge's measured
same-code jitter) exits 0; an injected large slowdown on a >floor query
still exits 1.
"""

import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.normalize_bench import compare

OLD = {"queries": {"a": 2.0, "b": 4.0, "c": 8.0},
       "canary_jvm_sec": 0.2, "canary_udf_sec": 0.8}


def test_identical_tree_ab_exits_clean():
    """The r6 judge A/B: same code, 14 false 'REGRESSION' verdicts under
    the old tol=1.3 rule. Replayed with the judge's actual measured
    swings — the r7 rule must call ALL of it noise/sub-floor."""
    old = {"queries": {"user_set_ops": 0.56, "preprocess_route": 5.78,
                       "rep_signals": 3.69, "mixture_sample": 0.54,
                       "t_mega_skew": 0.51, "embedding_near_dups": 5.08,
                       "t_plain_quality": 6.8, "classify_vote": 6.1},
           "canary_jvm_sec": 0.292, "canary_udf_sec": 0.973}
    new = {"queries": {"user_set_ops": 0.93, "preprocess_route": 9.67,
                       "rep_signals": 1.56, "mixture_sample": 0.28,
                       "t_mega_skew": 0.29, "embedding_near_dups": 3.97,
                       "t_plain_quality": 6.2, "classify_vote": 5.4},
           "canary_jvm_sec": 0.30, "canary_udf_sec": 0.95}
    out = compare(old, new)
    assert out["regressions"] == []
    assert out["suite"]["verdict"] in ("noise", "improved")


def test_slow_window_is_noise_not_regression():
    # Everything doubled — including both canaries: the r5 scenario.
    new = {"queries": {"a": 4.0, "b": 8.0, "c": 16.0},
           "canary_jvm_sec": 0.4, "canary_udf_sec": 1.6}
    out = compare(OLD, new)
    assert out["regressions"] == []
    assert all(r["verdict"] == "noise" for r in out["rows"])
    assert out["canary_ratios"] == {"jvm": 2.0, "udf": 2.0}


def test_injected_slowdown_on_big_query_trips():
    # Canaries flat, one >floor query 3x (above the 2.5 residual
    # envelope): neither noise class explains it -> exit-1 regression.
    new = {"queries": {"a": 6.0, "b": 4.0, "c": 8.0},
           "canary_jvm_sec": 0.2, "canary_udf_sec": 0.8}
    out = compare(OLD, new)
    assert out["regressions"] == ["a"]
    row = next(r for r in out["rows"] if r["query"] == "a")
    assert row["verdict"] == "REGRESSION" and row["min_norm"] == 3.0


def test_moderate_single_query_delta_is_suspect_not_gate():
    # A 2x on one query sits INSIDE the measured identical-tree
    # residual (judge observed up to ~2.4x on unchanged code) —
    # reported as suspect for a human, never exit-1.
    new = {"queries": {"a": 4.0, "b": 4.0, "c": 8.0},
           "canary_jvm_sec": 0.2, "canary_udf_sec": 0.8}
    out = compare(OLD, new)
    assert out["regressions"] == []
    row = next(r for r in out["rows"] if r["query"] == "a")
    assert row["verdict"] == "suspect"


def test_broad_slowdown_trips_suite_gate():
    # Every query 2x with flat canaries: per-query that is sub-tol,
    # but the suite total (which averages out jitter) gates at 1.5.
    new = {"queries": {"a": 4.0, "b": 8.0, "c": 16.0},
           "canary_jvm_sec": 0.2, "canary_udf_sec": 0.8}
    out = compare(OLD, new)
    assert out["regressions"] == ["<suite-total>"]
    assert out["suite"]["verdict"] == "REGRESSION"


def test_sub_floor_never_gates():
    # 4x blowup on a 0.2s query: labeled, not gated (ADVICE: sub-1.5s
    # queries jitter +/-2x even normalized; min_norm 1.84 on a 0.9s
    # query was among the r6 false positives).
    old = {"queries": {"tiny": 0.2, "big": 8.0},
           "canary_jvm_sec": 0.2, "canary_udf_sec": 0.8}
    new = {"queries": {"tiny": 0.9, "big": 8.1},
           "canary_jvm_sec": 0.2, "canary_udf_sec": 0.8}
    out = compare(old, new)
    assert out["regressions"] == []
    row = next(r for r in out["rows"] if r["query"] == "tiny")
    assert row["verdict"] == "sub-floor"


def test_canary_speedup_does_not_flag_unchanged_query():
    # ADVICE r6: both canaries sped up 2x, query flat -> min_norm 2.0
    # under the old rule was a false REGRESSION. raw 1.0 must veto.
    new = {"queries": {"a": 2.0, "b": 4.0, "c": 8.0},
           "canary_jvm_sec": 0.1, "canary_udf_sec": 0.4}
    out = compare(OLD, new)
    assert out["regressions"] == []
    assert all(r["verdict"] == "noise" for r in out["rows"])


def test_one_canary_explaining_suffices():
    # UDF canary doubled, JVM flat; a 1.9x query is within the UDF
    # class's swing -> noise (the more forgiving normalization wins).
    new = {"queries": {"a": 3.8, "b": 4.0, "c": 8.0},
           "canary_jvm_sec": 0.2, "canary_udf_sec": 1.6}
    out = compare(OLD, new)
    assert out["regressions"] == []
    row = next(r for r in out["rows"] if r["query"] == "a")
    assert row["min_norm"] == 0.95 and row["verdict"] == "noise"


def test_improvement_reported():
    new = {"queries": {"a": 1.0, "b": 4.0, "c": 8.0},
           "canary_jvm_sec": 0.2, "canary_udf_sec": 0.8}
    out = compare(OLD, new)
    assert out["improvements"] == ["a"]


def test_zero_canary_degrades_to_raw_path():
    # ADVICE r6: round(...,3) can floor a sub-ms canary to 0.0 in the
    # NEW file; the old guard only checked old[k] > 0 and the norm dict
    # went empty -> ValueError. Must degrade to raw ratios instead.
    new = {"queries": {"a": 2.1, "b": 4.0, "c": 8.0},
           "canary_jvm_sec": 0.0, "canary_udf_sec": 0.8}
    out = compare(OLD, new)
    assert out["canary_ratios"] is None
    assert out["regressions"] == []


def test_pre_r6_fallback_uses_raw_ratio():
    old = {"queries": {"a": 4.0}}          # no canaries (r1-r5 files)
    new = {"queries": {"a": 12.0}, "canary_jvm_sec": 0.2,
           "canary_udf_sec": 0.8}
    out = compare(old, new)
    assert out["canary_ratios"] is None
    assert out["regressions"] == ["a", "<suite-total>"]   # 3.0 raw


def test_driver_wrapper_unwrapped():
    # The driver's BENCH_r{N}.json nests bench.py's line under "parsed".
    new = {"n": 3, "rc": 0, "tail": "...",
           "parsed": {"queries": {"a": 4.0, "b": 8.0, "c": 16.0},
                      "canary_jvm_sec": 0.4, "canary_udf_sec": 1.6}}
    out = compare(OLD, new)
    assert len(out["rows"]) == 3 and out["regressions"] == []
    assert out["canary_ratios"] == {"jvm": 2.0, "udf": 2.0}


def test_cli_exit_codes(tmp_path):
    o, n = tmp_path / "o.json", tmp_path / "n.json"
    o.write_text(json.dumps(OLD))
    n.write_text(json.dumps({"queries": {"a": 2.0, "b": 4.0, "c": 8.0},
                             "canary_jvm_sec": 0.2,
                             "canary_udf_sec": 0.8}))
    repo = Path(__file__).resolve().parents[1]
    r = subprocess.run([sys.executable, "tools/normalize_bench.py",
                        str(o), str(n)], cwd=repo, capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr
    assert "0 regression(s)" in r.stdout
    assert "<suite-total>" in r.stdout
    n.write_text(json.dumps({"queries": {"a": 18.0, "b": 4.0, "c": 8.0},
                             "canary_jvm_sec": 0.2,
                             "canary_udf_sec": 0.8}))
    r = subprocess.run([sys.executable, "tools/normalize_bench.py",
                        str(o), str(n)], cwd=repo, capture_output=True,
                       text=True)
    assert r.returncode == 1
    assert "REGRESSIONS: a" in r.stdout


def test_all_sub_floor_suite_never_gates():
    # r7 review: a comparison made entirely of sub-floor queries (a
    # partial/quick bench file) has nothing to average — its total is
    # the same jitter and must not trip the suite gate.
    old = {"queries": {"a": 0.1, "b": 0.1},
           "canary_jvm_sec": 0.2, "canary_udf_sec": 0.8}
    new = {"queries": {"a": 1.0, "b": 1.0},
           "canary_jvm_sec": 0.2, "canary_udf_sec": 0.8}
    out = compare(old, new)
    assert out["regressions"] == []
    assert out["suite"]["verdict"] == "sub-floor"


def test_sub_floor_family_subtotal_gates_systemic_slowdown():
    """r8 (VERDICT r7 review #1): each sub-floor query is individually
    ungateable, so a uniform 2x slowdown spread across MANY of them was
    invisible unless it moved the whole suite past 1.5x. The family
    subtotal (here 8 x 0.8 s = 6.4 s, well above the floor) must gate
    at the suite tolerance — while each member still reads sub-floor."""
    old = {"queries": {f"q{i}": 0.8 for i in range(8)} | {"big": 20.0},
           "canary_jvm_sec": 0.2, "canary_udf_sec": 0.8}
    new = {"queries": {f"q{i}": 1.4 for i in range(8)} | {"big": 20.5},
           "canary_jvm_sec": 0.2, "canary_udf_sec": 0.8}
    out = compare(old, new)
    assert out["regressions"] == ["<sub-floor-subtotal>"]
    assert out["sub_floor_subtotal"]["verdict"] == "REGRESSION"
    # the suite total (26.4 -> 31.7 = 1.2x) alone would NOT have caught it
    assert out["suite"]["verdict"] != "REGRESSION"
    assert all(r["verdict"] == "sub-floor" for r in out["rows"]
               if r["query"] != "big")


def test_sub_floor_subtotal_ab_and_partial_file_stay_clean():
    """Acceptance for the subtotal gate: the identical-tree A/B's
    sub-floor members (real judge-measured jitter) must keep exiting 0,
    and a quick bench file whose subtotal BASELINE is under the floor
    must label, not gate."""
    # identical-tree A/B sub-floor rows (from the r6 judge measurement)
    old = {"queries": {"user_set_ops": 0.56, "mixture_sample": 0.54,
                       "t_mega_skew": 0.51},
           "canary_jvm_sec": 0.292, "canary_udf_sec": 0.973}
    new = {"queries": {"user_set_ops": 0.93, "mixture_sample": 0.28,
                       "t_mega_skew": 0.29},
           "canary_jvm_sec": 0.30, "canary_udf_sec": 0.95}
    out = compare(old, new)
    assert out["regressions"] == []
    # tiny-baseline blowup: labeled sub-floor, not gated
    old2 = {"queries": {"a": 0.1, "b": 0.1},
            "canary_jvm_sec": 0.2, "canary_udf_sec": 0.8}
    new2 = {"queries": {"a": 1.0, "b": 1.0},
            "canary_jvm_sec": 0.2, "canary_udf_sec": 0.8}
    out2 = compare(old2, new2)
    assert out2["regressions"] == []
    assert out2["sub_floor_subtotal"]["verdict"] == "sub-floor"


def test_slow_canary_window_cannot_fake_an_improvement():
    # r7 review: the raw veto is symmetric — a query that got 3x
    # SLOWER raw must not be advertised as 'improved' just because a
    # canary's window was slower still (min_norm 0.6).
    old = {"queries": {"a": 4.0, "b": 4.0},
           "canary_jvm_sec": 0.2, "canary_udf_sec": 0.8}
    new = {"queries": {"a": 12.0, "b": 4.0},
           "canary_jvm_sec": 1.0, "canary_udf_sec": 4.0}
    out = compare(old, new)
    assert out["improvements"] == []
    row = next(r for r in out["rows"] if r["query"] == "a")
    assert row["verdict"] != "improved"
