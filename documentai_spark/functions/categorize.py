"""Flat entity map -> categorized array-of-structs (pure JVM expressions).

Rebuilt from microservices/api-gateway/app.py:60-108
``transform_entities_for_frontend``: a static category->field-list table
per document type; each present field becomes
``{label, value, confidence}`` where label = field.replace('_',' ').title()
and confidence = 0.85 (the reference's hard-coded default, app.py:92);
empty categories are dropped (app.py:104-105); unknown document types fall
back to a single "Extracted Information" category over every present
field (app.py:77-79).

Spark-first: the category table is a compile-time constant folded into the
plan — ``element_at`` probes + ``filter`` over a literal struct array, no
UDF, no shuffle, fully codegen-able.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Category tables over THIS engine's flat entity fields
# (core/entities._PATTERNS), mirroring the reference's
# purchase_order/proforma_invoice tables (app.py:62-76).
CATEGORY_TABLES: dict[str, dict[str, tuple[str, ...]]] = {
    "purchase_order": {
        "Basic Information": ("po_number", "date_numeric"),
        "Amounts": ("currency", "amount", "currency_amount"),
        "Terms": ("incoterm",),
        "Contact": ("email", "phone"),
    },
    "proforma_invoice": {
        "Invoice Details": ("pi_number", "date_alpha"),
        "Amounts": ("currency", "amount", "currency_amount"),
        "Contact": ("email", "phone"),
    },
    "lc_application": {
        "SWIFT Fields": ("swift_tag",),
        "Amounts": ("currency", "amount", "currency_amount"),
        "Dates": ("date_numeric", "date_alpha"),
    },
}

# every known flat field, for the default "Extracted Information" bucket
ALL_FIELDS: tuple[str, ...] = (
    "po_number", "pi_number", "date_numeric", "date_alpha", "currency",
    "amount", "currency_amount", "incoterm", "email", "phone", "swift_tag",
)

DEFAULT_CONFIDENCE = 0.85  # app.py:92 hard-coded default


def _label(field: str) -> str:
    return field.replace("_", " ").title()


def _category_entries(entities: Column, fields: tuple[str, ...]) -> Column:
    """array<struct<label,value,confidence>> of the PRESENT fields, in the
    table's field order (app.py:85-101 iteration order)."""
    entries = F.array(*[
        F.struct(F.lit(_label(f)).alias("label"),
                 F.element_at(entities, f).alias("value"),
                 F.lit(DEFAULT_CONFIDENCE).alias("confidence"))
        for f in fields])
    return F.filter(entries, lambda e: e["value"].isNotNull()
                    & (e["value"] != ""))


def categorized_entities_col(entities: Column,
                             doc_type: str = "default") -> Column:
    """map<category, array<struct<label,value,confidence>>> with empty
    categories dropped (app.py:104-105)."""
    table = CATEGORY_TABLES.get(
        doc_type, {"Extracted Information": ALL_FIELDS})
    keys, vals = [], []
    for cat, fields in table.items():
        keys.append(F.lit(cat))
        vals.append(_category_entries(entities, fields))
    m = F.map_from_arrays(F.array(*keys), F.array(*vals))
    return F.map_filter(m, lambda _, v: F.size(v) > 0)


def with_categorized_entities(df: DataFrame, doc_type: str = "default",
                              entities_col: str = "entities") -> DataFrame:
    return df.withColumn(
        "categorized_entities",
        categorized_entities_col(F.col(entities_col), doc_type))
