"""Entity redaction as pure JVM column expressions.

Spark mirror of ``core.redact`` (the pure-Python spec): a chain of
unconditional ``replace`` calls over the entities map — one per
``REDACT_FIELDS`` entry, in the same fixed order. Absent/empty values
are routed through ``coalesce(nullif(v, ''), chr(0))`` so the needle
becomes a byte that never occurs in text and the replace is an
identity; this keeps the chain branch-free (no ``when``/``otherwise``),
which matters twice at scale: CaseWhen branches disable codegen
subexpression elimination over the accumulated text tree (the r2 ~9x
re-evaluation trap), and an unconditional chain stays inside one
whole-stage-codegen projection.

The DuckDB gate oracle replays the identical nested-``replace`` chain
over RE2-re-derived first-match values (``queries()['redact_entities']``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from documentai_spark.core.redact import REDACT_FIELDS


def redacted_text_col(text: Column, entities: Column,
                      fields: tuple[str, ...] = REDACT_FIELDS) -> Column:
    """text + entities map -> redacted text (see module docstring)."""
    out = text
    for field in fields:
        needle = F.coalesce(
            F.nullif(F.element_at(entities, F.lit(field)), F.lit("")),
            F.lit("\x00"))
        out = F.replace(out, needle, F.lit(f"[{field.upper()}]"))
    return out


def with_redaction(df: DataFrame, *, text_col: str = "text",
                   entities_col: str = "entities",
                   out_col: str = "redacted_text",
                   fields: tuple[str, ...] = REDACT_FIELDS) -> DataFrame:
    """Adds ``redacted_text`` from an existing entities map column (run
    ``operators.extraction.with_entities`` upstream). No shuffle; one
    codegen projection."""
    if out_col in df.columns:
        raise ValueError(f"column {out_col!r} already exists")
    return df.withColumn(out_col,
                         redacted_text_col(F.col(text_col),
                                           F.col(entities_col), fields))
