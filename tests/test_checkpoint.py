"""Resume-idempotency test (FIXTURES.md §4 test 5): kill after k
partitions, resume, final table equal to a single-shot run; lineage
metrics consistent (no double-count)."""

from __future__ import annotations

from documentai_spark.plans.checkpoint import read_manifest, run_checkpointed
from documentai_spark.plans.pipeline import extraction_pipeline


def _collect_sorted(spark, path):
    df = spark.read.parquet(f"{path}/bucket=*")
    return sorted(df.collect(), key=lambda r: (r.conv_id, r.turn_idx))


def test_kill_and_resume_idempotent(spark, transcripts_path, tmp_path):
    out_partial = str(tmp_path / "out_resume")
    out_oneshot = str(tmp_path / "out_oneshot")

    # phase 1: "killed" after 3 of 8 buckets
    s1 = run_checkpointed(spark, transcripts_path, out_partial,
                          n_buckets=8, max_buckets=3, log=lambda *a: None)
    assert s1["buckets_done"] == 3
    assert len(read_manifest(out_partial)) == 3

    # phase 2: resume completes the rest, skips the done ones
    s2 = run_checkpointed(spark, transcripts_path, out_partial,
                          n_buckets=8, log=lambda *a: None)
    assert s2["buckets_skipped"] == 3
    assert s2["buckets_done"] == 5
    manifest = read_manifest(out_partial)
    assert len(manifest) == 8
    assert all(m["status"] == "done" for m in manifest.values())

    # single-shot reference run
    df = extraction_pipeline(spark.read.parquet(transcripts_path))
    one = sorted(df.collect(), key=lambda r: (r.conv_id, r.turn_idx))
    resumed = _collect_sorted(spark, out_partial)
    assert len(resumed) == len(one)
    for a, b in zip(resumed, one):
        assert a.conv_id == b.conv_id and a.turn_idx == b.turn_idx
        assert a.extracted_text == b.extracted_text
        assert a.verdict == b.verdict

    # lineage: no double count after resume
    assert s2["rows_out"] == len(one)
    assert sum(m["rows_out"] for m in manifest.values()) == len(one)
    # conversations never straddle buckets
    assert sum(m["rows_in"] for m in manifest.values()) == len(one)


def test_rerun_done_is_noop(spark, transcripts_path, tmp_path):
    out = str(tmp_path / "out_noop")
    s1 = run_checkpointed(spark, transcripts_path, out, n_buckets=4,
                          log=lambda *a: None)
    s2 = run_checkpointed(spark, transcripts_path, out, n_buckets=4,
                          log=lambda *a: None)
    assert s2["buckets_done"] == 0 and s2["buckets_skipped"] == 4
    assert s2["rows_out"] == s1["rows_out"]


def test_lineage_table(spark, transcripts_path, tmp_path):
    from documentai_spark.plans.checkpoint import lineage_table
    out = str(tmp_path / "out_lineage")
    run_checkpointed(spark, transcripts_path, out, n_buckets=4,
                     log=lambda *a: None)
    lt = lineage_table(spark, out)
    rows = lt.collect()
    assert len(rows) == 4
    assert all(r.status == "done" and r.rows_out == r.rows_in for r in rows)
    assert sum(r.bytes_out for r in rows) > 0
    assert all(r.finished >= r.started for r in rows)


def test_read_transcripts_formats_agree(spark, tmp_path):
    """json/csv landing formats read through the explicit canonical
    schema must yield exactly the parquet rows (including timestamps and
    newline-bearing text); malformed rows drop instead of failing."""
    import csv
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from documentai_spark.plans.pipeline import read_transcripts
    from documentai_spark.sources.transcripts import gen_rows

    rows = list(gen_rows(7, 12))
    assert any("\n" in r["text"] for r in rows)  # multiLine really needed

    pdir = str(tmp_path / "p"); jdir = str(tmp_path / "j")
    cdir = str(tmp_path / "c")
    for d in (pdir, jdir, cdir):
        __import__("os").makedirs(d)
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    pq.write_table(pa.Table.from_pydict(cols), pdir + "/part-0.parquet")
    with open(jdir + "/part-0.json", "w") as f:
        for r in rows:
            rec = dict(r, ts=r["ts"].isoformat())
            f.write(_json.dumps(rec) + "\n")
        f.write('{"broken": \n')           # malformed JSON line
    with open(cdir + "/part-0.csv", "w", newline="") as f:
        w = csv.writer(f, quoting=csv.QUOTE_ALL)
        w.writerow(list(rows[0]))
        for r in rows:
            w.writerow([r["conv_id"], r["turn_idx"], r["role"],
                        r["text"], r["tool"], r["ts"].isoformat()])

    def canon(df):
        return sorted((r.conv_id, r.turn_idx, r.role, r.text, r.tool,
                       r.ts) for r in df.collect())

    base = canon(read_transcripts(spark, pdir))
    assert len(base) == len(rows)
    assert canon(read_transcripts(spark, jdir, fmt="json")) == base
    assert canon(read_transcripts(spark, cdir, fmt="csv")) == base

    import pytest

    with pytest.raises(ValueError, match="unsupported"):
        read_transcripts(spark, pdir, fmt="avro")


def test_curation_checkpoint_resume_and_global_dedup(spark, tmp_path):
    """Checkpointed curation: fingerprint-hash bucketing keeps the
    per-bucket dedup globally exact (flags equal the single-job
    operator's), and a killed run resumes by skipping done buckets."""
    from documentai_spark.operators.curation import curate_documents
    from documentai_spark.plans.checkpoint import (
        run_checkpointed_curation,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    in_dir = str(tmp_path / "docs_in")
    docs.write.parquet(in_dir)
    out_dir = str(tmp_path / "cur_out")

    # partial run (kill analog), then resume
    s1 = run_checkpointed_curation(spark, in_dir, out_dir, n_buckets=4,
                                   max_buckets=2, log=lambda *_: None)
    assert s1["buckets_done"] == 2
    s2 = run_checkpointed_curation(spark, in_dir, out_dir, n_buckets=4,
                                   log=lambda *_: None)
    assert s2["buckets_skipped"] == 2 and s2["buckets_done"] == 2

    got = {r.doc_id: (r.keep, r.is_dup) for r in
           spark.read.parquet(out_dir + "/bucket=*").collect()}
    want = {r.doc_id: (r.keep, r.is_dup) for r in
            curate_documents(docs).collect()}
    assert got == want and len(got) == docs.count()
    assert s2["kept"] == sum(1 for k, _ in got.values() if k)

    # third run: everything skips, totals unchanged
    s3 = run_checkpointed_curation(spark, in_dir, out_dir, n_buckets=4,
                                   log=lambda *_: None)
    assert s3["buckets_skipped"] == 4 and s3["rows_out"] == s2["rows_out"]
    assert s3["kept"] == s2["kept"]
