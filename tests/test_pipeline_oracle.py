"""The north-rule invariant: per-turn equality between the Spark pipeline
and the pure-Python oracle, under stable (conv_id, turn_idx) ordering.

FIXTURES.md §4 tests 1, 2, 4: per-turn byte equality (text + span offsets
+ float-exact quality scores), determinism across parallelism levels, and
mega-conversation (skew) completion.
"""

from __future__ import annotations

from documentai_spark.core.entities import completeness_score, extract_entities
from documentai_spark.core.extract import extract_turn
from documentai_spark.core.quality import recommendations_for, score_turn
from documentai_spark.plans.pipeline import extraction_pipeline
from documentai_spark.sources.transcripts import gen_rows


def _oracle_record(text: str):
    kind, extracted, spans = extract_turn(text)
    q = score_turn(text or "", extracted,
                   completeness_score(extract_entities(extracted)))
    return kind, extracted, [tuple(s) for s in spans], q


def test_per_turn_equality(spark, transcripts_path):
    df = spark.read.parquet(transcripts_path)
    out = extraction_pipeline(df, salt_buckets=8).collect()

    # stable ordering invariant (W1)
    keys = [(r.conv_id, r.turn_idx) for r in out]
    assert keys == sorted(keys), "output not in (conv_id, turn_idx) order"

    expected_n = sum(1 for _ in gen_rows(42, 60, mega_every=50,
                                         mega_turns=300))
    assert len(out) == expected_n  # mega conversation fully present

    rows_by_key = {(r["conv_id"], r["turn_idx"]): r["text"]
                   for r in gen_rows(42, 60, mega_every=50, mega_turns=300)}
    for r in out:
        raw = rows_by_key[(r.conv_id, r.turn_idx)]
        kind, extracted, spans, q = _oracle_record(raw)
        assert r.kind == kind
        assert r.extracted_text == extracted, \
            f"text mismatch at {r.conv_id}/{r.turn_idx}"
        got_spans = [(s.begin, s.end, s.kind, s.text) for s in r.spans]
        assert got_spans == spans, f"spans mismatch at {r.conv_id}/{r.turn_idx}"
        # float-exact: UDF shares the oracle module; SQL confidence is
        # written in the oracle's operation order (functions/verdict.py)
        assert r.q_blank == q.q_blank
        assert r.q_legibility == q.q_legibility
        assert r.q_completeness == q.q_completeness
        assert r.q_skew == q.q_skew
        assert r.q_noise == q.q_noise
        assert r.q_contrast == q.q_contrast
        assert r.q_brightness == q.q_brightness
        assert r.q_edge_crop == q.q_edge_crop
        assert r.q_shadow_glare == q.q_shadow_glare
        assert r.q_resolution == q.q_resolution
        assert r.confidence == q.confidence
        assert r.verdict == q.verdict
        assert list(r.recommendations) == recommendations_for(
            q.q_blank, q.q_legibility, q.q_completeness, q.q_skew,
            q.q_noise, q.q_contrast, q.q_brightness, q.q_edge_crop,
            q.q_shadow_glare, q.q_resolution)


def test_determinism_across_parallelism(spark, transcripts_path):
    """Same input, different partitioning/salting -> identical output
    (the test_consistency.py:13-45 analog + two-parallelism determinism)."""
    df = spark.read.parquet(transcripts_path)
    a = extraction_pipeline(df.repartition(2), salt_buckets=4).collect()
    b = extraction_pipeline(df.repartition(13), salt_buckets=16).collect()
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra == rb


def test_verdict_distribution(spark, transcripts_path):
    """All verdict classes reachable on the fixture domain; whitespace-only
    turns hit the re-scan hard blocker."""
    df = spark.read.parquet(transcripts_path)
    out = extraction_pipeline(df, ordered_output=False)
    verdicts = {r["verdict"] for r in out.select("verdict").distinct().collect()}
    assert "re-scan" in verdicts
    assert verdicts <= {"direct analysis", "pre-processing",
                        "azure document analysis", "reupload", "re-scan"}
