"""Rule validation as a Spark operator (J4 + A10).

The reference compiles English rules once, pickles the compiled form, and
validates each document's entity dict (rule_engine_updated/
validation_engine.py:255-369 compile; :457-502 validate; :32-57 cache).
Spark-first: rules compile on the DRIVER and ride the plan as a captured
constant (the broadcast-small-side pattern of SURVEY §2.3 J4); validation
explodes to per-rule rows inside one Arrow batch pass; the A10 aggregate
(passed/failed/overall_valid) is plain groupBy SQL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType, BooleanType, StringType, StructField, StructType,
)

from documentai_spark.core.rules import compile_rules, validate_rule

RULE_RESULT_TYPE = ArrayType(StructType([
    StructField("field", StringType(), False),
    StructField("rule_type", StringType(), False),
    StructField("passed", BooleanType(), False),
]), False)


def make_rule_validator(sentences: list[str]):
    """Compile once on the driver; returns a pandas UDF over entity maps."""
    rules = compile_rules(sentences)

    @pandas_udf(RULE_RESULT_TYPE)
    def validate_udf(entities: pd.Series) -> pd.Series:
        out = []
        for ents in entities:
            ents = ents or {}
            out.append([
                {"field": r["field"], "rule_type": r["type"],
                 "passed": validate_rule(r, ents.get(r["field"]), ents)}
                for r in rules])
        return pd.Series(out)

    return validate_udf


def with_rule_validation(df: DataFrame, sentences: list[str],
                         entities_col: str = "entities") -> DataFrame:
    """Adds rule_results (per-rule structs) + A10 aggregates per row:
    rules_passed, rules_failed, overall_valid
    (validation_engine.py:457-502 semantics)."""
    udf = make_rule_validator(sentences)
    df = df.withColumn("rule_results", udf(F.col(entities_col)))
    passed = F.size(F.filter("rule_results", lambda r: r["passed"]))
    total = F.size("rule_results")
    return (df.withColumn("rules_passed", passed)
              .withColumn("rules_failed", total - passed)
              .withColumn("overall_valid", passed == total))


def rule_failure_summary(df: DataFrame) -> DataFrame:
    """Corpus-level A10 rollup: failure rate per (field, rule_type).

    explode -> groupBy: one shuffle on a tiny key space."""
    ex = df.select(F.explode("rule_results").alias("r"))
    return (ex.groupBy(F.col("r.field").alias("field"),
                       F.col("r.rule_type").alias("rule_type"))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.when(F.col("r.passed"), 1).otherwise(0))
                    .alias("n_passed"))
              .withColumn("pass_rate", F.round(F.col("n_passed")
                                               / F.col("n"), 6)))
