"""The generated DuckDB quality oracle (functions/quality_sql) is
bit-identical to the pure-Python core over the documents fixture and an
adversarial ASCII set — every metric, confidence, verdict, and the
recommendations string. (The Spark side is pinned to the same core by
test_quality_vec / test_pipeline_oracle, closing the triangle.)"""

from __future__ import annotations

import duckdb

from documentai_spark.core.entities import completeness_from_text
from documentai_spark.core.quality import (
    BLANK_LOW, blank_score, brightness_score, confidence_score,
    contrast_score, edge_crop_score, legibility_score, noise_score,
    recommendations_for, resolution_score, shadow_glare_score, skew_score,
    verdict_for,
)
from documentai_spark.functions.quality_sql import extract_quality_oracle_sql

ADVERSARIAL = [
    "", "   ", " \n\t \n ", "x", "ok", "a" * 200, " a  b   c ",
    "\x00\x01\x02 control", "ALLCAPS TOKENS ONLY", "123 456 789",
    "w" * 25 + " short", "PO NUMBER PO-1 DATED 01.01.2024 USD 5,000.00 FOB",
    "no\nnewlines\nhandled\n\nblocks", "?? ## ~~ mojibake ^^ || \\\\",
    "Even Line One\nEven Line Two\nEven Line Tri",
    "x\n" + "a" * 300 + "\n\nyz\n" + "b" * 250,
    "vertical\x0btab and\x1cseps\x1d\x1e\x1f here",
    # r3 metric stressors: indentation drift (skew), margins (edge_crop),
    # dense/sparse runs (shadow_glare), line widths (resolution)
    "\n".join(" " * (i * 3) + "drifting line of text" for i in range(9)),
    "\n".join(" " * (9 - i) + "reverse drift" for i in range(10)),
    "    uniform indent\n    uniform indent\n    uniform indent",
    " " * 30 + "tiny island" + " " * 30,
    "   \nleading blank margins\nand body text here\n   ",
    "w" * 80 + " " * 12 + "y" * 45 + "\nnormal line follows here",
    "\n".join(["x" * 66] * 4), "\n".join(["x" * 132] * 3),
    "\n".join(["x"] * 12),
    "a b\n" + " " * 8 + "c d" + " " * 9 + "\n\te f",
    "one-liner exactly at the boundary " + "z" * 40,
    # currency_amount can match with ZERO digits ([\d,]+ <- commas only);
    # the vec pre-gate must agree with core and this RE2 replay (r7)
    "USD ,a hello world", "EUR ,,,,x", "GBP , ",
]


def _expected(t: str):
    qb, ql = blank_score(t), legibility_score(t)
    qc = completeness_from_text(t)
    qsk = skew_score(t)
    qn, qco, qbr = noise_score(t), contrast_score(t), brightness_score(t)
    qec, qsg, qre = (edge_crop_score(t), shadow_glare_score(t),
                     resolution_score(t))
    conf = confidence_score(ql, qc, qsk, qn, qco, qbr)
    v = verdict_for(qb, conf)
    if qb >= BLANK_LOW:
        conf = 0.0
    return (qb, ql, qc, qsk, qn, qco, qbr, qec, qsg, qre, conf, v,
            " | ".join(recommendations_for(qb, ql, qc, qsk, qn, qco, qbr,
                                           qec, qsg, qre)))


def _run_oracle(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    return con.execute(extract_quality_oracle_sql()).df()


def test_sql_oracle_bit_identical_adversarial():
    rows = [(i, t) for i, t in enumerate(ADVERSARIAL)]
    df = _run_oracle(rows)
    for (i, t), (_, r) in zip(rows, df.iterrows()):
        (qb, ql, qc, qsk, qn, qco, qbr, qec, qsg, qre, conf, v,
         recs) = _expected(t)
        got = (r.q_blank, r.q_legibility, r.q_completeness, r.q_skew,
               r.q_noise, r.q_contrast, r.q_brightness, r.q_edge_crop,
               r.q_shadow_glare, r.q_resolution, r.confidence)
        assert got == (qb, ql, qc, qsk, qn, qco, qbr, qec, qsg, qre,
                       conf), (i, repr(t[:40]))
        assert r.verdict == v and r.recommendations == recs, (i, repr(t))


def test_sql_oracle_bit_identical_fixture_sample():
    rows = duckdb.sql(
        "SELECT doc_id, text FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet') "
        "ORDER BY doc_id").fetchall()
    df = _run_oracle(rows)
    for (i, t), (_, r) in zip(rows, df.iterrows()):
        (qb, ql, qc, qsk, qn, qco, qbr, qec, qsg, qre, conf, v,
         recs) = _expected(t)
        assert (r.q_blank, r.q_legibility, r.q_completeness, r.q_skew,
                r.q_noise, r.q_contrast, r.q_brightness, r.q_edge_crop,
                r.q_shadow_glare, r.q_resolution, r.confidence) \
            == (qb, ql, qc, qsk, qn, qco, qbr, qec, qsg, qre, conf), i
        assert r.verdict == v and r.recommendations == recs, i


def test_sql_oracle_null_text_matches_core_empty():
    """NULL text must replay core.extract.extract_turn(None) -> '' —
    blank 1.0, verdict 're-scan', confidence zeroed — not NULL-propagate
    into plausible garbage (r7 review: pre-COALESCE the oracle scored a
    NULL row q_blank=0.05 / 'reupload')."""
    df = _run_oracle([(0, None), (1, "")])
    for _, r in df.iterrows():
        (qb, ql, qc, qsk, qn, qco, qbr, qec, qsg, qre, conf, v,
         recs) = _expected("")
        assert (r.q_blank, r.confidence, r.verdict) == (qb, conf, v)
        assert r.q_completeness == qc and r.recommendations == recs


def test_apostrophe_in_advice_text_survives_sql(monkeypatch):
    """Advice wording with an apostrophe must not break the generated
    DuckDB oracle (the '' escaping in quality_sql._q — VERDICT r3 #7):
    the SQL parses AND the emitted line round-trips exactly, matching
    the Python side which reads the same constant."""
    from documentai_spark.core.quality import RECOMMENDATION_TEXT

    spiky = "Don't re-scan; use the operator's 'best' profile"
    monkeypatch.setitem(RECOMMENDATION_TEXT["legibility"], "low", spiky)
    monkeypatch.setitem(RECOMMENDATION_TEXT["legibility"], "medium", spiky)
    monkeypatch.setitem(RECOMMENDATION_TEXT["legibility"], "good", spiky)

    # mojibake-ish text scores low legibility -> the spiky line appears
    rows = [(0, "?? ## ~~ mojibake ^^ || \\\\"), (1, "clean text here")]
    df = _run_oracle(rows)
    for (i, t), (_, r) in zip(rows, df.iterrows()):
        *_, recs = _expected(t)
        assert r.recommendations == recs, (i, r.recommendations)
    assert any(f"Legibility: {spiky}" in r for r in df.recommendations), \
        df.recommendations.tolist()
