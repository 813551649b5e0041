"""Selective preprocessing: the adaptive-enhancement analog.

The reference preprocesses ONLY pages whose quality verdict requires it
(pre_processing_updated/preprocessing_ops.py:4-46 adaptive_preprocess;
microservices/preprocessing-service/app.py:363-449 selective page loop +
union of processed/untouched pages). Spark-first mapping (SURVEY §2.2 P5,
§2.7 U3, §4 X1):

- the routing predicate is a column (``needs_preprocessing``), so Catalyst
  prunes the untouched branch's UDF entirely;
- processed and untouched rows re-unite with ``unionByName`` and the W1
  ordering restores (conv_id, turn_idx);
- the revert predicate (preprocessing_ops.py:43-44: reject output that got
  *worse*) is preserved: if normalization lowers legibility, keep the
  original text.

Text normalization here is the enhancement analog: whitespace collapse,
control-char strip, de-hyphenation of line-broken words — deterministic,
pure, vectorizable.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BooleanType, StringType, StructField, StructType,
)

from documentai_spark.core.quality import legibility_score

_CONTROL_RE = re.compile(r"[\x00-\x08\x0B-\x1F\x7F]")
# ASCII-pinned to match the RE2 mirror in the preprocess_route oracle
# (RE2 \w is ASCII-only; Python default \w is Unicode)
_HYPHEN_BREAK_RE = re.compile(r"(\w)-\n(\w)", re.A)
_MULTI_WS_RE = re.compile(r"[ \t]{2,}")

PREPROCESS_RESULT_TYPE = StructType([
    StructField("text", StringType(), False),
    StructField("changed", BooleanType(), False),
    StructField("reverted", BooleanType(), False),
])


def normalize_text(t: str) -> tuple[str, bool]:
    """The enhancement kernel (pure; shared with tests)."""
    out = _CONTROL_RE.sub("", t)
    out = _HYPHEN_BREAK_RE.sub(r"\1\2", out)
    out = _MULTI_WS_RE.sub(" ", out)
    return out, out != t


@pandas_udf(PREPROCESS_RESULT_TYPE)
def preprocess_udf(text: pd.Series) -> pd.DataFrame:
    texts, changed, reverted = [], [], []
    for t in text:
        t = t or ""
        out, ch = normalize_text(t)
        rev = False
        if ch and legibility_score(out) < legibility_score(t):
            # revert predicate: enhancement made it worse
            out, ch, rev = t, False, True
        texts.append(out)
        changed.append(ch)
        reverted.append(rev)
    return pd.DataFrame({"text": texts, "changed": changed,
                         "reverted": reverted})


def selective_preprocess(df: DataFrame,
                         predicate_col: str = "needs_preprocessing",
                         text_col: str = "extracted_text") -> DataFrame:
    """Run the enhancement UDF only where the verdict says so (X1).

    Output schema = input schema + (preprocessed_text, was_preprocessed,
    was_reverted); untouched rows pass through with identity values.
    """
    need = df.filter(F.col(predicate_col))
    keep = df.filter(~F.col(predicate_col))
    processed = (need.withColumn("_p", preprocess_udf(F.col(text_col)))
                 .withColumn("preprocessed_text", F.col("_p.text"))
                 .withColumn("was_preprocessed", F.col("_p.changed"))
                 .withColumn("was_reverted", F.col("_p.reverted"))
                 .drop("_p"))
    untouched = (keep.withColumn("preprocessed_text", F.col(text_col))
                 .withColumn("was_preprocessed", F.lit(False))
                 .withColumn("was_reverted", F.lit(False)))
    return processed.unionByName(untouched)
