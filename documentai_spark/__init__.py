"""documentai_spark — a PySpark-native extraction + quality-scoring engine.

A from-scratch rebuild of the computational core of SatwickDev/DocumentAI
(reference studied read-only at /root/reference; see SURVEY.md for the
file:line capability map) re-expressed as idiomatic Spark:

- ``core``       pure-Python, dependency-free semantics ("the oracle"):
                 content-kind detection, HTML boilerplate stripping, layout
                 parsing into ordered spans, quality-score ensembles, entity
                 regex extraction, English-sentence rule validation.
                 Shared verbatim by the pandas UDFs and by pytest so the
                 per-turn text-equality invariant is testable byte-for-byte.
- ``operators``  Spark DataFrame operators (Arrow pandas UDFs, window/agg
                 compositions, sessionization, dedup, similarity search).
- ``sources``    deterministic synthetic transcripts generator + readers.
- ``functions``  column-expression helpers (pure pyspark.sql.functions).
- ``plans``      end-to-end pipeline DAG + per-partition checkpoint/resume.

Design scale: 10^12 turns on a multi-executor cluster. Everything here is
declarative DataFrame API; Python appears only inside Arrow-batched pandas
UDFs (never per-row Python UDFs).
"""

__version__ = "0.1.0"
