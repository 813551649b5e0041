"""The SQL-expressed content-kind rule (q_t_kind_dispatch) must agree with
the oracle's detect_kind on every committed test-table row — this is what
makes the driver's cross-engine check meaningful."""

from __future__ import annotations

import duckdb

from __spark_entry__ import (
    _KIND_BLOCKSEP, _KIND_HTML_PAT, _KIND_MULTICOL, TRANSCRIPTS_TEST,
)
from documentai_spark.core.textkind import detect_kind


def test_sql_kind_equals_oracle_kind():
    rows = duckdb.sql(
        f"""SELECT text, CASE
              WHEN regexp_matches(text, '{_KIND_HTML_PAT}') THEN 'html'
              WHEN contains(text, chr(10))
                   AND (regexp_matches(text, '{_KIND_BLOCKSEP}')
                        OR regexp_matches(text, '{_KIND_MULTICOL}'))
                   THEN 'layout'
              ELSE 'plain' END AS kind
            FROM read_parquet('{TRANSCRIPTS_TEST}/*.parquet')""").fetchall()
    assert len(rows) > 5000
    for text, sql_kind in rows:
        assert sql_kind == detect_kind(text), repr(text[:80])
