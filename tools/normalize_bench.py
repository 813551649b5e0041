"""Round-over-round bench comparison, normalized by the host-noise
canaries (the BENCH/BASELINE.md "Normalization protocol").

Usage:
    python tools/normalize_bench.py BENCH_rOLD.json BENCH_rNEW.json \
        [--tol 1.3] [--improve 0.77]

Why: this sandbox host swings 2-3x between identical runs (steal time +
the python-worker memory pathology), so a raw per-query delta between two
BENCH files says nothing by itself — the r5 headline "regression"
(15,992 -> 6,879 turns/s) cost a full judge A/B to adjudicate as noise.
Since r6, ``bench.py`` emits two FIXED calibration kernels each run:

- ``canary_jvm_sec``  — pure whole-stage-codegen work (CPU + steal class)
- ``canary_udf_sec``  — Arrow/pandas python-worker work (memory-path class)

A query's wall time is dominated by one of those two noise classes, so a
delta that tracks the matching canary's delta is the host, not the code.
Rather than hand-maintaining a query -> class map (and mislabeling a
mixed-plan query), this tool normalizes every query against BOTH
canaries and flags a CODE regression only when the delta exceeds
tolerance under BOTH — i.e. when neither noise class can explain it.
That is conservative in exactly the right direction: a real regression
larger than the host swing still trips it, while a noisy window never
produces a false "regression" verdict that needs a judge A/B.

Exit status: 0 = no query regressed beyond what the canaries explain,
1 = at least one did (usable as a round gate). Files lacking canaries
(pre-r6) degrade to raw-ratio comparison with a warning.
"""

from __future__ import annotations

import argparse
import json
import sys


def _unwrap(d: dict) -> dict:
    """Accept both bench.py's raw JSON line and the driver's
    ``BENCH_r{N}.json`` wrapper (payload under ``"parsed"``)."""
    inner = d.get("parsed")
    return inner if isinstance(inner, dict) else d


def compare(old: dict, new: dict, *, tol: float = 1.3,
            improve: float = 1.0 / 1.3) -> dict:
    """Pure comparison of two bench.py JSON payloads.

    Returns ``{"rows": [...], "regressions": [...], "improvements":
    [...], "canary_ratios": {...} | None}``. Each row carries the raw
    new/old time ratio and, when both files have canaries, the ratio
    normalized by each canary's own new/old ratio; ``min_norm`` is the
    most forgiving of the two (the best noise explanation).

    ``tol``: a query is a regression when min(normalized ratios) > tol
    (or raw ratio > tol when canaries are unavailable) — default 1.3,
    the documented best-of-N residual on this host.
    ``improve``: symmetric threshold for reporting genuine wins.
    """
    old, new = _unwrap(old), _unwrap(new)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    canaries = None
    have = all(k in old and k in new and old[k] > 0
               for k in ("canary_jvm_sec", "canary_udf_sec"))
    if have:
        canaries = {
            "jvm": new["canary_jvm_sec"] / old["canary_jvm_sec"],
            "udf": new["canary_udf_sec"] / old["canary_udf_sec"],
        }
    rows, regressions, improvements = [], [], []
    for q in sorted(set(oq) & set(nq)):
        if not oq[q]:
            continue
        raw = nq[q] / oq[q]
        row = {"query": q, "old_sec": oq[q], "new_sec": nq[q],
               "raw_ratio": round(raw, 3)}
        if canaries:
            norm = {k: raw / r for k, r in canaries.items() if r > 0}
            row.update({f"norm_{k}": round(v, 3) for k, v in norm.items()})
            basis = min(norm.values())
            row["min_norm"] = round(basis, 3)
        else:
            basis = raw
        if basis > tol:
            regressions.append(q)
            row["verdict"] = "REGRESSION"
        elif basis < improve:
            improvements.append(q)
            row["verdict"] = "improved"
        else:
            row["verdict"] = "noise"
        rows.append(row)
    return {"rows": rows, "regressions": regressions,
            "improvements": improvements, "canary_ratios": canaries}


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old_file")
    ap.add_argument("new_file")
    ap.add_argument("--tol", type=float, default=1.3,
                    help="normalized ratio above this = regression")
    ap.add_argument("--improve", type=float, default=1.0 / 1.3,
                    help="normalized ratio below this = improvement")
    args = ap.parse_args(argv)
    with open(args.old_file) as f:
        old = json.load(f)
    with open(args.new_file) as f:
        new = json.load(f)
    out = compare(old, new, tol=args.tol, improve=args.improve)
    if out["canary_ratios"] is None:
        print("WARNING: canaries missing in one file — raw ratios only "
              "(pre-r6 BENCH files have no canary pair)", file=sys.stderr)
    else:
        c = out["canary_ratios"]
        print(f"canary ratios new/old: jvm {c['jvm']:.3f}  "
              f"udf {c['udf']:.3f}")
    width = max((len(r["query"]) for r in out["rows"]), default=5)
    for r in out["rows"]:
        norm = (f"  min_norm {r['min_norm']:6.3f}"
                if "min_norm" in r else "")
        print(f"  {r['query']:<{width}}  {r['old_sec']:7.3f} -> "
              f"{r['new_sec']:7.3f}  raw {r['raw_ratio']:6.3f}{norm}"
              f"  {r['verdict']}")
    print(f"== {len(out['regressions'])} regression(s), "
          f"{len(out['improvements'])} improvement(s), "
          f"{len(out['rows'])} compared")
    if out["regressions"]:
        print("REGRESSIONS:", ", ".join(out["regressions"]))
    return 1 if out["regressions"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
