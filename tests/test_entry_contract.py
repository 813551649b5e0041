"""Driver-contract guard: queries()/oracle_sql() stay aligned and every
query executes at sf0.001 with a stable non-degenerate schema."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_oracle_keys_subset_of_queries():
    qs = set(entry.queries())
    os_ = set(entry.oracle_sql())
    assert os_ <= qs, f"oracle keys without queries: {os_ - qs}"
    # r4: transcript_pipeline gained a frozen expected-output oracle
    # (data/pipeline_expected.parquet) — NO rows-only queries remain
    assert qs - os_ == set()


def test_frozen_pipeline_expected_is_fresh():
    """The committed expected-output table must equal a live regeneration
    from the pure-Python core — a stale artifact after a core/ semantic
    change fails here, not at the driver gate."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tools.freeze_pipeline_expected import OUT, SCHEMA, expected_rows

    committed = pq.read_table(OUT)
    regen = pa.Table.from_pylist(expected_rows(), schema=SCHEMA)
    assert committed.equals(regen), \
        "data/pipeline_expected.parquet is stale — rerun " \
        "tools/freeze_pipeline_expected.py"


def test_entry_returns_rows(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert "verdict" in df.columns


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_query_runs_at_sf0001(spark, name):
    df = entry.queries()[name](spark, SF)
    rows = df.count()
    assert rows >= 0  # executes without error; some are legitimately small
    assert len(df.columns) >= 1
    # no unaliased aggregate column names (driver hashes by column name)
    for c in df.columns:
        assert "(" not in c, f"{name}: unaliased column {c}"
