"""Freeze the flagship pipeline's expected output over the committed
transcripts fixture — the last gate row's oracle.

``transcript_pipeline`` was the single ``no_oracle`` gate row: the
HTML/layout extraction legs (core/html_extract.py, core/layout_extract.py)
have no SQL form, so DuckDB cannot recompute them. Same situation as the
ML classifier — solved the same way (VERDICT r3 #1, the data/ml_frozen
pattern): run the PURE-PYTHON core (the byte-equality oracle the 166-test
suite pins the Spark UDFs against) offline over ``data/transcripts_test``,
commit the result as parquet, and let the gate's oracle be a plain
``SELECT ... FROM read_parquet(expected)``. The driver then hash-checks
the LIVE distributed pipeline — exchange placement, Arrow batching, UDF
wiring, SQL verdict legs and all — against a committed artifact any
skeptic can regenerate with this tool and diff.

Columns frozen: extraction text, canonical span string, all ten q_*
metrics (bit-exact doubles), confidence, verdict, needs_preprocessing,
canonical recommendations string.

Canonical string forms (reproduced on the Spark side with concat_ws over
the arrays): spans join fields with \\x1e and records with \\x1f;
recommendations join lines with \\x1f — separators that cannot appear in
the fixture domain (control chars are stripped by extraction and never
emitted in recommendation text).

Regenerate (only via this tool; the gate LOADS the artifact, never
refits):

    python tools/freeze_pipeline_expected.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "data", "transcripts_test")
OUT = os.path.join(REPO, "data", "pipeline_expected.parquet")

FIELD_SEP = "\x1e"
REC_SEP = "\x1f"


def expected_rows() -> list[dict]:
    from documentai_spark.core.entities import (
        completeness_score, extract_entities,
    )
    from documentai_spark.core.extract import extract_turn
    from documentai_spark.core.quality import (
        recommendations_for, score_turn,
    )

    fixture = pq.read_table(FIXTURE, columns=["conv_id", "turn_idx", "text"])
    rows = sorted(fixture.to_pylist(),
                  key=lambda r: (r["conv_id"], r["turn_idx"]))
    out = []
    for r in rows:
        text = r["text"]
        kind, extracted, spans = extract_turn(text)
        q = score_turn(text or "", extracted,
                       completeness_score(extract_entities(extracted)))
        recs = recommendations_for(
            q.q_blank, q.q_legibility, q.q_completeness, q.q_skew,
            q.q_noise, q.q_contrast, q.q_brightness, q.q_edge_crop,
            q.q_shadow_glare, q.q_resolution)
        spans_cat = REC_SEP.join(
            f"{b}{FIELD_SEP}{e}{FIELD_SEP}{k}{FIELD_SEP}{t}"
            for (b, e, k, t) in (tuple(s) for s in spans))
        out.append({
            "conv_id": r["conv_id"], "turn_idx": r["turn_idx"],
            "kind": kind, "extracted_text": extracted,
            "spans_cat": spans_cat,
            "q_blank": q.q_blank, "q_legibility": q.q_legibility,
            "q_completeness": q.q_completeness, "q_skew": q.q_skew,
            "q_noise": q.q_noise, "q_contrast": q.q_contrast,
            "q_brightness": q.q_brightness, "q_edge_crop": q.q_edge_crop,
            "q_shadow_glare": q.q_shadow_glare,
            "q_resolution": q.q_resolution,
            "confidence": q.confidence, "verdict": q.verdict,
            "needs_preprocessing": q.verdict in (
                "pre-processing", "azure document analysis"),
            "recommendations_cat": REC_SEP.join(recs),
        })
    return out


SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("turn_idx", pa.int32()),
    ("kind", pa.string()), ("extracted_text", pa.string()),
    ("spans_cat", pa.string()),
    ("q_blank", pa.float64()), ("q_legibility", pa.float64()),
    ("q_completeness", pa.float64()), ("q_skew", pa.float64()),
    ("q_noise", pa.float64()), ("q_contrast", pa.float64()),
    ("q_brightness", pa.float64()), ("q_edge_crop", pa.float64()),
    ("q_shadow_glare", pa.float64()), ("q_resolution", pa.float64()),
    ("confidence", pa.float64()), ("verdict", pa.string()),
    ("needs_preprocessing", pa.bool_()),
    ("recommendations_cat", pa.string()),
])


def main() -> None:
    rows = expected_rows()
    for r in rows:  # separator safety: canonical strings must be lossless
        assert FIELD_SEP not in r["extracted_text"] \
            and REC_SEP not in r["extracted_text"], r["conv_id"]
    table = pa.Table.from_pylist(rows, schema=SCHEMA)
    pq.write_table(table, OUT, compression="zstd")
    n_spans = sum(1 for r in rows if r["spans_cat"])
    print(f"froze {len(rows)} rows ({n_spans} with spans) -> {OUT}")


if __name__ == "__main__":
    main()
