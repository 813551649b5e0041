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


def _preprocess_batch(text: pd.Series,
                      before_leg=None) -> pd.DataFrame:
    """Enhancement + revert for one Arrow batch, with the legibility
    comparison VECTORIZED (operators.quality_vec is bit-identical to the
    scalar core, so the revert decision is unchanged). ``before_leg``:
    the already-computed q_legibility column when the caller has it (the
    pipeline always does — it equals legibility_score(text) bit-for-bit),
    which saves re-scoring the 'before' side entirely."""
    import numpy as np

    from documentai_spark.operators.quality_vec import legibility_scores

    origs, outs, chs = [], [], []
    for t in text:
        t = t or ""
        out, ch = normalize_text(t)
        origs.append(t)
        outs.append(out)
        chs.append(ch)
    ch_arr = np.asarray(chs)
    rev = np.zeros(len(origs), dtype=bool)
    if ch_arr.any():
        # score only the CHANGED rows (r7 review): a gated batch is
        # mostly '' plus unchanged rows, and the revert decision never
        # consults them — subsetting removes that vectorized work the
        # same way before_leg already removes the 'before' re-score
        idx = np.flatnonzero(ch_arr)
        after = legibility_scores(
            pd.Series([outs[i] for i in idx], dtype=object))
        if before_leg is not None:
            before = before_leg.to_numpy(dtype=float)[idx]
        else:
            before = legibility_scores(
                pd.Series([origs[i] for i in idx], dtype=object))
        rev[idx] = np.asarray(after) < np.asarray(before)
    final = [o if r else n for o, n, r in zip(origs, outs, rev)]
    return pd.DataFrame({"text": final,
                         "changed": list(ch_arr & ~rev),
                         "reverted": list(rev)})


@pandas_udf(PREPROCESS_RESULT_TYPE)
def preprocess_udf(text: pd.Series) -> pd.DataFrame:
    return _preprocess_batch(text)


@pandas_udf(PREPROCESS_RESULT_TYPE)
def preprocess_with_leg_udf(text: pd.Series,
                            before_leg: pd.Series) -> pd.DataFrame:
    return _preprocess_batch(text, before_leg)


def selective_preprocess(df: DataFrame,
                         predicate_col: str = "needs_preprocessing",
                         text_col: str = "extracted_text") -> DataFrame:
    """Run the enhancement UDF only where the verdict says so (X1).

    Output schema = input schema + (preprocessed_text, was_preprocessed,
    was_reverted); untouched rows pass through with identity values.

    Single-pass by design: the routing gate is applied to the UDF's INPUT
    (``when(pred, text).otherwise('')``), not as a ``filter``/``union``
    split. A filter-split re-executes the entire upstream subtree — in the
    pipeline that is the expensive extraction+quality Arrow stage — once
    per branch, because there is no materialization boundary between them
    (VERDICT r3 "What's wrong" #1: preprocess_route 4.9 s → 19.5 s from
    exactly this). The kernel itself is cheap, so running it on '' for
    untouched rows costs ~nothing while the upstream chain evaluates ONCE.
    Gating the input (rather than wrapping outputs in big CaseWhen trees)
    also keeps codegen CSE intact per the documented CaseWhen hazard.
    """
    pred = F.col(predicate_col)
    gated = F.when(pred, F.coalesce(F.col(text_col), F.lit(""))) \
             .otherwise(F.lit(""))
    if "q_legibility" in df.columns and text_col == "extracted_text":
        # reuse the quality stage's legibility for the revert 'before'
        # side (bit-equal to re-scoring; halves the UDF's scoring work).
        # ONLY for the column q_legibility was scored from (r7 review:
        # the quality stage scores legibility over extracted_text, so a
        # caller preprocessing a different text column must not have its
        # revert decision compared against the wrong text's score)
        p = preprocess_with_leg_udf(gated, F.col("q_legibility"))
    else:
        p = preprocess_udf(gated)
    # a NULL text row keeps NULL on BOTH branches (r7 review: the
    # routed branch used to coerce it to '' while the untouched branch
    # passed NULL through — inconsistent for custom predicates)
    return (df.withColumn("_p", p)
            .withColumn("preprocessed_text",
                        F.when(pred & F.col(text_col).isNotNull(),
                               F.col("_p.text"))
                        .otherwise(F.col(text_col)))
            .withColumn("was_preprocessed",
                        pred & F.col("_p.changed"))
            .withColumn("was_reverted",
                        pred & F.col("_p.reverted"))
            .drop("_p"))
