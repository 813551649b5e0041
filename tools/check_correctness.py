"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` mirror on
DuckDB over the same sf dir, then compares row count + order-insensitive
values (columns sorted by name, rows sorted by all columns, floats via
repr). Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from documentai_spark.sources.session import build_session

    spark = build_session("correctness", master="local[8]",
                          shuffle_partitions=8)
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name would otherwise skip everything and print
        # "0/0 OK" with exit 0 — a false green for whoever asked
        print(f"ERROR: unknown query name(s): {sorted(unknown)}\n"
              f"  (valid: {sorted(qs)})")
        spark.stop()
        sys.exit(2)
    failures = 0
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name:24s} rows-only: {len(sdf)} rows "
                  f"({t_spark:.1f}s) [no oracle]")
            continue
        odf = con.sql(oracles[name]).df()
        a, b = normalize(sdf), normalize(odf)
        ok_rows = len(a) == len(b)
        ok_cols = list(a.columns) == list(b.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              check_exact=True)
                ok_vals = True
            except AssertionError as e:
                msg = str(e).split("\n")[:6]
        status = "OK " if (ok_rows and ok_cols and ok_vals) else "FAIL"
        print(f"  {name:24s} {status} spark={len(sdf)} oracle={len(odf)} "
              f"cols={'=' if ok_cols else 'DIFF'} ({t_spark:.1f}s)")
        if status == "FAIL":
            failures += 1
            if not ok_cols:
                print(f"    spark cols:  {sorted(sdf.columns)}")
                print(f"    oracle cols: {sorted(odf.columns)}")
            elif ok_rows and not ok_vals:
                print("    " + "\n    ".join(msg))
                merged = a.compare(b) if a.shape == b.shape else None
                if merged is not None and len(merged):
                    print(merged.head(5))
    print(f"== {n_run - failures}/{n_run} OK"
          + (f", {failures} FAILED" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
