"""Right-anchored goods-row parsing (SURVEY §2.6 O5).

The reference parses proforma-invoice goods tables by splitting each row
from the RIGHT into 6 fields — ``rsplit(" ", 5)`` — because the
description may itself contain spaces while the trailing 5 fields
(HS code, quantity, unit, unit price, amount) are single tokens
(entity_extraction_updated/extractor/performa_invoice.py:44-64). The
single-sourced Python form is ``core.typed_extract.parse_goods_line``;
this module is its pure-JVM column equivalent.

Spark has no rsplit, but splitting on the literal single space keeps
every boundary: ``rsplit(" ", 5)`` splits at the last 5 spaces, which is
exactly ``toks[-5:]`` of the single-space split plus
``" ".join(toks[:-5])`` for the description — consecutive spaces become
empty tokens that the join restores verbatim, so the two forms agree
byte-for-byte (pinned against parse_goods_line in
tests/test_rules_preprocess.py, including multi-space rows).

Whitespace caveat: the reference strips fields with Python ``str.strip()``
(all Unicode whitespace); the column form trims the explicit ASCII +
Latin-1 whitespace set below. They agree on every input whose field edges
use those characters — exotic Unicode spaces (U+2000 etc.) at a field
edge would diverge, which the fixture domain (FIXTURES.md) never emits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# str.strip()'s whitespace set restricted to ASCII + Latin-1 (see module
# docstring); \x1c-\x1f are the information separators Python also strips
_STRIP_WS = " \t\n\x0b\f\r\x1c\x1d\x1e\x1f\x85\xa0"


def _stripped(c: Column) -> Column:
    return F.btrim(c, F.lit(_STRIP_WS))


def parse_goods_row(line: Column) -> Column:
    """One goods line -> struct(description, hs_code, quantity, unit,
    unit_price, amount) with the exact parse_goods_line semantics —
    fields stripped, amount comma-free; null when the row has fewer
    than 6 right-anchored fields."""
    toks = F.split(_stripped(line), " ", -1)
    n = F.size(toks)
    desc = F.array_join(F.slice(toks, 1, n - F.lit(5)), " ")
    out = F.struct(
        _stripped(desc).alias("description"),
        _stripped(F.element_at(toks, -5)).alias("hs_code"),
        _stripped(F.element_at(toks, -4)).alias("quantity"),
        _stripped(F.element_at(toks, -3)).alias("unit"),
        _stripped(F.element_at(toks, -2)).alias("unit_price"),
        F.replace(_stripped(F.element_at(toks, -1)),
                  F.lit(","), F.lit("")).alias("amount"),
    )
    return F.when(n >= 6, out).otherwise(F.lit(None))
