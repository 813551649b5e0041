"""Typed-document extractors as Arrow pandas UDFs.

The reference dispatches per classified document type to a dedicated
extractor class (entity-extraction-service/app.py:547-593 routing;
extractor/purchase_order.py, extractor/performa_invoice.py). Spark-first:
each extractor is one scalar pandas UDF returning a struct of the
reference's exact fields — composable with the classification handoff
join (J6) and no shuffle of its own. ``core.typed_extract`` is the
pure-Python spec both the UDFs and the pytest oracle share.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType, StringType, StructField, StructType,
)

from documentai_spark.core.typed_extract import (
    PI_FIELDS, PO_FIELDS, extract_proforma_invoice, extract_purchase_order,
)

PO_RESULT_TYPE = StructType(
    [StructField(f, StringType(), False) for f in PO_FIELDS])

GOODS_ROW_TYPE = StructType([
    StructField(f, StringType(), False)
    for f in ("description", "hs_code", "quantity", "unit", "unit_price",
              "amount")])

PI_RESULT_TYPE = StructType(
    [StructField(f, StringType(), False) for f in PI_FIELDS]
    + [StructField("goods", ArrayType(GOODS_ROW_TYPE, False), False)])


@pandas_udf(PO_RESULT_TYPE)
def po_udf(text: pd.Series) -> pd.DataFrame:
    rows = [extract_purchase_order(t or "") for t in text]
    return pd.DataFrame({f: [r[f] for r in rows] for f in PO_FIELDS})


@pandas_udf(PI_RESULT_TYPE)
def pi_udf(text: pd.Series) -> pd.DataFrame:
    scalars = []
    goods = []
    for t in text:
        e, g = extract_proforma_invoice(t or "")
        scalars.append(e)
        goods.append(g)
    out = {f: [r[f] for r in scalars] for f in PI_FIELDS}
    out["goods"] = goods
    return pd.DataFrame(out)


def with_po_entities(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds the 12 purchase-order fields as columns (no shuffle). One
    projection for all fields — a withColumn-per-field loop builds a
    nested Project per call that the analyzer re-traverses each time."""
    out = df.withColumn("_po", po_udf(F.col(text_col)))
    return out.select(
        "*", *[F.col(f"_po.{f}").alias(f) for f in PO_FIELDS]).drop("_po")


def with_pi_entities(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds the proforma-invoice fields + goods rows (no shuffle). One
    projection for all fields (see with_po_entities)."""
    out = df.withColumn("_pi", pi_udf(F.col(text_col)))
    return out.select(
        "*",
        *[F.col(f"_pi.{f}").alias(f) for f in PI_FIELDS],
        F.col("_pi.goods").alias("goods")).drop("_pi")
