"""Right-anchored goods-row parsing (SURVEY §2.6 O5).

The reference parses proforma-invoice goods tables by splitting each row
from the RIGHT into 6 fields — ``rsplit(" ", 5)`` — because the
description may itself contain spaces while the trailing 5 fields
(HS code, qty, unit, unit price, amount) are single tokens
(entity_extraction_updated/extractor/performa_invoice.py:44-64).

Spark has no rsplit; the equivalent is split + negative-index
``element_at`` for the 5 right fields and a slice-join for the
description — pure JVM column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GOODS_FIELDS = ("description", "hs_code", "qty", "unit", "unit_price",
                "amount")


def parse_goods_row(line: Column) -> Column:
    """One goods line -> struct(description, hs_code, qty, unit,
    unit_price, amount); nulls when the row has fewer than 6 tokens."""
    toks = F.split(F.trim(line), r"\s+")
    n = F.size(toks)
    desc = F.array_join(F.slice(toks, 1, n - F.lit(5)), " ")
    out = F.struct(
        desc.alias("description"),
        F.element_at(toks, -5).alias("hs_code"),
        F.element_at(toks, -4).alias("qty"),
        F.element_at(toks, -3).alias("unit"),
        F.element_at(toks, -2).alias("unit_price"),
        F.element_at(toks, -1).alias("amount"),
    )
    return F.when(n >= 6, out).otherwise(F.lit(None))
