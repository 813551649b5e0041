"""English-sentence rule compiler + validator (pure Python).

Rebuilt from rule_engine_updated/validation_engine.py:

- ``parse_english_rule`` (validation_engine.py:255-369): an English
  sentence like "purchase order number must not be empty" compiles to
  ``{field, type, parameters, original_text}`` (validation_engine.py:260-265).
- ``validate_json`` (validation_engine.py:457-502): each rule's field is
  looked up in the entity dict (J4 equi-join) and the typed check runs;
  output is per-rule pass/fail plus aggregate counts
  (A10: sum passed, sum failed, overall_valid = failed == 0).
- value parsing quirks preserved: numbers parsed with comma stripping
  (validation_engine.py:64); currency format ``^([A-Z]{3})\\s*([\\d,.]+)$``
  (validation_engine.py:165); DDMMYY/YYMMDD date validation
  (validation_engine.py:132-158); cross-field date comparison with the
  YYMMDD-first dual parse (validation_engine.py:213-243); unique as a
  deferred non-empty check (:207-210); multiple_choice with uppercased
  'or'-split choices (:245-252, :327-336).

Rules compile once on the driver and broadcast into the Spark stage
(SURVEY §2.3 J4: broadcast rules, explode entities).
"""

from __future__ import annotations

import re
from typing import Any

_CURRENCY_RE = re.compile(r"^([A-Z]{3})\s*([\d,.]+)$")

_RULE_GRAMMAR: list[tuple[re.Pattern, str]] = [
    (re.compile(r"^(?P<field>.+?)\s+must\s+not\s+be\s+empty$", re.I), "not_empty"),
    (re.compile(r"^(?P<field>.+?)\s+must\s+be\s+unique(?:\s+.*)?$", re.I), "unique"),
    (re.compile(r"^(?P<field>.+?)\s+must\s+be\s+a\s+valid\s+date$", re.I), "valid_date"),
    # cross-field date comparison (validation_engine.py:305-317: "after" /
    # "greater than or equal" family -> compare_with + operator); listed
    # BEFORE multiple_choice so "on or after" never parses as choices
    (re.compile(r"^(?P<field>.+?)\s+must\s+be\s+on\s+or\s+after\s+(?P<value>.+)$", re.I), "date_comparison_gte"),
    (re.compile(r"^(?P<field>.+?)\s+must\s+be\s+on\s+or\s+before\s+(?P<value>.+)$", re.I), "date_comparison_lte"),
    (re.compile(r"^(?P<field>.+?)\s+must\s+be\s+after\s+(?P<value>.+)$", re.I), "date_comparison_gt"),
    (re.compile(r"^(?P<field>.+?)\s+must\s+be\s+a\s+number$", re.I), "numeric"),
    # declared single-format date check (validation_engine.py:291-298
    # 'yymmdd'/'ddmmyy' in text -> date_format; NO dual-parse fallback,
    # unlike date_comparison — validate_date_format :133-159)
    (re.compile(r"^(?P<field>.+?)\s+must\s+be\s+a\s+date\s+in\s+"
                r"(?P<value>YYMMDD|DDMMYY)\s+format$", re.I), "date_format"),
    (re.compile(r"^(?P<field>.+?)\s+must\s+be\s+in\s+currency\s+format$", re.I), "currency"),
    # max length, incl. the SWIFT '35x4' chars-per-line form
    # (validation_engine.py:269-288 grammar; :180-193 validator)
    (re.compile(r"^(?P<field>.+?)\s+must\s+be\s+max(?:imum)?\s+"
                r"(?P<a>\d+)\s*[x×]\s*(?P<b>\d+)$", re.I), "max_length_lines"),
    (re.compile(r"^(?P<field>.+?)\s+must\s+be\s+max(?:imum)?\s+"
                r"(?P<value>\d+)(?:\s+char(?:acter)?s?)?$", re.I), "max_length"),
    (re.compile(r"^(?P<field>.+?)\s+must\s+be\s+between\s+"
                r"(?P<a>[\d,.]+)\s+and\s+(?P<b>[\d,.]+)$", re.I), "between"),
    # comparison family (r7 review — all listed BEFORE multiple_choice so
    # 'greater than or equal to 100' never parses as 'or'-split choices).
    # Reference phrase set (validation_engine.py:337-343): 'at least' /
    # 'not less than' map to the >= family, 'at most' / 'not more than'
    # to <= ('at most N' used to compile to max_length — a STRING length
    # check that silently passed 9999 against 'at most 500'). Deliberate
    # deviation, documented: the reference's substring grammar routes
    # every >=/<= phrase through its STRICT >/< validators; the anchored
    # grammar keeps the phrase set but applies the operator the sentence
    # actually states.
    (re.compile(r"^(?P<field>.+?)\s+must\s+be\s+(?:greater\s+than\s+or\s+"
                r"equal\s+to|at\s+least|not\s+less\s+than)\s+"
                r"(?P<value>[\d,.]+)$", re.I), "greater_or_equal"),
    (re.compile(r"^(?P<field>.+?)\s+must\s+be\s+(?:less\s+than\s+or\s+"
                r"equal\s+to|at\s+most|not\s+more\s+than)\s+"
                r"(?P<value>[\d,.]+)$", re.I), "less_or_equal"),
    (re.compile(r"^(?P<field>.+?)\s+must\s+be\s+greater\s+than\s+(?P<value>[\d,.]+)$", re.I), "greater_than"),
    (re.compile(r"^(?P<field>.+?)\s+must\s+be\s+less\s+than\s+(?P<value>[\d,.]+)$", re.I), "less_than"),
    (re.compile(r"^(?P<field>.+?)\s+must\s+equal\s+(?P<value>.+)$", re.I), "equals"),
    (re.compile(r"^(?P<field>.+?)\s+must\s+contain\s+(?P<value>.+)$", re.I), "contains"),
    (re.compile(r"^(?P<field>.+?)\s+must\s+be\s+one\s+of\s+(?P<value>.+)$", re.I), "one_of"),
    # "X should be A or B or C" (validation_engine.py:327-336): choices
    # split on 'or', uppercased; compared case-insensitively
    (re.compile(r"^(?P<field>.+?)\s+(?:should|must)\s+be\s+(?P<value>.+?\s+or\s+.+)$", re.I), "multiple_choice"),
]


def _to_number(v: Any) -> float | None:
    """Comma-stripping numeric parse (validation_engine.py:64) — the
    'must be a number' check's definition (oracle-pinned; a currency
    prefix is NOT 'a number')."""
    try:
        return float(str(v).replace(",", "").replace(" ", ""))
    except (ValueError, TypeError):
        return None


def _to_number_cur(v: Any) -> float | None:
    """Currency-symbol-tolerant numeric parse — the COMPARISON checks'
    definition (validation_engine.py:64/:88 strip $/USD/EUR before
    comparing). r7 review: greater/less_than used the plain parse and
    rejected 'USD 500' outright while 'between' stripped it — the two
    comparison families now share this one parse."""
    try:
        return float(str(v).replace(",", "").replace("$", "")
                     .replace("USD", "").replace("EUR", "").strip())
    except (ValueError, TypeError):
        return None


def _valid_date(v: str) -> bool:
    """Accept dd.mm.yyyy / dd-mm-yyyy / dd/mm/yyyy / DDMMYY / YYMMDD /
    dd-MMM-yyyy (validation_engine.py:132-158 family)."""
    s = str(v).strip()
    m = re.match(r"^(\d{2})[./-](\d{2})[./-](\d{4})$", s)
    if m:
        d, mo = int(m.group(1)), int(m.group(2))
        return 1 <= d <= 31 and 1 <= mo <= 12
    m = re.match(r"^(\d{1,2})-([A-Za-z]{3})-(\d{4})$", s)
    if m:
        return (1 <= int(m.group(1)) <= 31 and m.group(2).lower()[:3] in
                ("jan feb mar apr may jun jul aug sep oct nov dec".split()))
    if re.match(r"^\d{6}$", s):  # DDMMYY or YYMMDD
        d1, m1 = int(s[0:2]), int(s[2:4])
        m2, d2 = int(s[2:4]), int(s[4:6])
        return (1 <= d1 <= 31 and 1 <= m1 <= 12) or (1 <= m2 <= 12 and 1 <= d2 <= 31)
    return False


def _parse_6digit_date(s: str):
    """The reference's dual-parse quirk (validation_engine.py:219-234):
    a 6-digit date is first read as YYMMDD (year = '20' + first two); if
    that is not a real calendar date, re-read as DDMMYY. Anything that is
    not exactly 6 digits raises — the reference's parse_date supports no
    other shape inside date comparisons."""
    from datetime import datetime
    if not re.match(r"^\d{6}$", s):
        raise ValueError(s)
    try:
        return datetime(int("20" + s[0:2]), int(s[2:4]), int(s[4:6]))
    except ValueError:
        return datetime(int("20" + s[4:6]), int(s[2:4]), int(s[0:2]))


def parse_english_rule(sentence: str) -> dict[str, Any] | None:
    """English sentence -> {field, type, parameters, original_text}."""
    s = sentence.strip().rstrip(".")
    for pat, rtype in _RULE_GRAMMAR:
        m = pat.match(s)
        if not m:
            continue
        field = m.group("field").strip().lower().replace(" ", "_")
        params: dict[str, Any] = {}
        if rtype in ("greater_than", "less_than",
                     "greater_or_equal", "less_or_equal"):
            params["value"] = _to_number(m.group("value"))
        elif rtype == "equals":
            params["value"] = m.group("value").strip()
        elif rtype == "contains":
            params["value"] = m.group("value").strip()
        elif rtype == "one_of":
            params["values"] = [x.strip() for x in
                                re.split(r",|\bor\b", m.group("value")) if x.strip()]
        elif rtype in ("date_comparison_gte", "date_comparison_gt",
                       "date_comparison_lte"):
            # compare_with is another FIELD (validation_engine.py:310-316)
            params["compare_with"] = (m.group("value").strip().lower()
                                      .replace(" ", "_"))
            params["operator"] = {"date_comparison_gte": ">=",
                                  "date_comparison_gt": ">",
                                  "date_comparison_lte": "<="}[rtype]
            rtype = "date_comparison"
        elif rtype == "multiple_choice":
            params["choices"] = [c.strip().upper() for c in
                                 re.split(r"\s+or\s+", m.group("value"))
                                 if c.strip()]
        elif rtype == "max_length":
            params["max_length"] = int(m.group("value"))
        elif rtype == "max_length_lines":
            # '35x4' = chars-per-line x lines (validation_engine.py:277-283)
            params["max_chars_per_line"] = int(m.group("a"))
            params["max_lines"] = int(m.group("b"))
            rtype = "max_length"
        elif rtype == "between":
            params["min_val"] = _to_number(m.group("a"))
            params["max_val"] = _to_number(m.group("b"))
        elif rtype == "date_format":
            params["format"] = m.group("value").upper()
        return {"field": field, "type": rtype, "parameters": params,
                "original_text": sentence}
    return None


def compile_rules(sentences: list[str]) -> list[dict[str, Any]]:
    """Compile all parseable sentences (driver-side, then broadcast)."""
    out = []
    for s in sentences:
        r = parse_english_rule(s)
        if r is not None:
            out.append(r)
    return out


def validate_rule(rule: dict[str, Any], value: Any,
                  entities: dict[str, str] | None = None) -> bool:
    """One rule against one entity value (missing value fails all types).
    ``entities`` is consulted only by cross-field rules (date_comparison
    looks up parameters['compare_with'], validation_engine.py:217-219)."""
    rtype = rule["type"]
    if value is None or str(value).strip() == "":
        return False
    v = str(value).strip()
    if rtype == "not_empty":
        return True
    if rtype == "unique":
        # the reference's uniqueness check is a non-empty check with the
        # actual cross-document test deferred ("unique check skipped",
        # validation_engine.py:207-210) — preserved as-is
        return True
    if rtype == "date_comparison":
        other = (entities or {}).get(rule["parameters"]["compare_with"])
        if other is None or str(other).strip() == "":
            return False
        try:
            d1 = _parse_6digit_date(v)
            d2 = _parse_6digit_date(str(other).strip())
        except (ValueError, IndexError):
            return False
        op = rule["parameters"]["operator"]
        return (d1 >= d2 if op == ">=" else
                d1 <= d2 if op == "<=" else d1 > d2)
    if rtype == "multiple_choice":
        return v.upper() in rule["parameters"]["choices"]
    if rtype == "max_length":
        # the reference measures the RAW value, not the stripped one
        # (validation_engine.py:180-193)
        raw = str(value)
        p = rule["parameters"]
        if "max_lines" in p:
            lines = raw.split("\n")
            return (len(lines) <= p["max_lines"]
                    and all(len(ln) <= p["max_chars_per_line"]
                            for ln in lines))
        return len(raw) <= p["max_length"]
    if rtype == "between":
        # currency-symbol-tolerant numeric parse (validation_engine.py:88)
        n = _to_number_cur(v)
        if n is None:
            return False
        p = rule["parameters"]
        return (p["min_val"] is not None and p["max_val"] is not None
                and p["min_val"] <= n <= p["max_val"])
    if rtype == "date_format":
        # single declared interpretation, no fallback
        # (validate_date_format, validation_engine.py:133-159)
        from datetime import datetime
        if not re.match(r"^\d{6}$", v):
            return False
        try:
            if rule["parameters"]["format"] == "DDMMYY":
                datetime(int("20" + v[4:6]), int(v[2:4]), int(v[0:2]))
            else:  # YYMMDD
                datetime(int("20" + v[0:2]), int(v[2:4]), int(v[4:6]))
            return True
        except ValueError:
            return False
    if rtype == "valid_date":
        return _valid_date(v)
    if rtype == "numeric":
        return _to_number(v) is not None
    if rtype == "currency":
        # full reference semantics: shape match AND amount > 0
        # (validate_currency_format, validation_engine.py:161-178)
        m = _CURRENCY_RE.match(v)
        if not m:
            return False
        try:
            return float(m.group(2).replace(",", "")) > 0
        except ValueError:
            return False
    if rtype in ("greater_than", "less_than",
                 "greater_or_equal", "less_or_equal"):
        # currency-tolerant like 'between' (r7 review — the reference
        # strips $/USD/EUR before every numeric comparison)
        n = _to_number_cur(v)
        t = rule["parameters"]["value"]
        if n is None or t is None:
            return False
        return {"greater_than": n > t, "less_than": n < t,
                "greater_or_equal": n >= t,
                "less_or_equal": n <= t}[rtype]
    if rtype == "equals":
        # reference exact_match semantics (validation_engine.py:96-122):
        # case-insensitive, accepts the first word of the expected phrase,
        # and field 40E treats 'UCP' == 'UCP LATEST VERSION'
        expected = str(rule["parameters"]["value"]).upper().strip()
        actual = v.upper()
        if rule["field"].upper() == "40E":
            ne = expected.replace("LATEST VERSION", "").strip()
            na = actual.replace("LATEST VERSION", "").strip()
            if ne == "UCP" and na == "UCP":
                return True
            if (expected in ("UCP LATEST VERSION", "UCP")
                    and actual in ("UCP LATEST VERSION", "UCP")):
                return True
            if ne == "UCP" and na.startswith("UCP"):
                return True
            if na == "UCP" and ne.startswith("UCP"):
                return True
        if actual == expected:
            return True
        return bool(expected.split()) and actual == expected.split()[0]
    if rtype == "contains":
        return rule["parameters"]["value"].upper() in v.upper()
    if rtype == "one_of":
        return v in rule["parameters"]["values"]
    return False


# field-NAME-driven format validation (entity-extraction-service/
# app.py:852-887 validate_field): the field's name selects the check,
# failures carry graded confidences. Patterns verbatim.
_FIELD_CHECKS: tuple[tuple[str, re.Pattern, str, float], ...] = (
    ("date", re.compile(r"^\d{1,2}[-/]\d{1,2}[-/]\d{2,4}$"),
     "Invalid date format", 0.3),
    ("number", re.compile(r"^[A-Z0-9-]+$", re.IGNORECASE),
     "Invalid number format", 0.5),
    ("amount", re.compile(r"^[$₹€£]?\s*[\d,]+\.?\d*$"),
     "Invalid amount format", 0.4),
    ("email", re.compile(r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}$"),
     "Invalid email format", 0.2),
)


def validate_field(field_name: str, value: Any) -> dict[str, Any]:
    """The first name-substring match (date before number before amount
    before email — the reference's elif chain) picks the format check.

    Reference-verbatim quirk, preserved and test-pinned (r7 review): a
    None value stringifies to 'None', which MATCHES the case-insensitive
    number pattern — so an absent entity is graded fully valid on
    number-named fields while date/amount/email fields correctly fail
    it (app.py:852-887 has the identical hole)."""
    out = {"is_valid": True, "message": "Valid", "confidence": 1.0}
    lname = field_name.lower()
    for key, pat, msg, conf in _FIELD_CHECKS:
        if key in lname:
            if not pat.match(str(value)):
                out = {"is_valid": False, "message": msg,
                       "confidence": conf}
            break
    return out


def validate_entities(rules: list[dict[str, Any]],
                      entities: dict[str, str]) -> dict[str, Any]:
    """validate_json analog (validation_engine.py:457-502)."""
    results = []
    for rule in rules:
        ok = validate_rule(rule, entities.get(rule["field"]), entities)
        results.append({"field": rule["field"], "type": rule["type"],
                        "passed": ok, "original_text": rule["original_text"]})
    passed = sum(1 for r in results if r["passed"])
    return {"results": results, "passed": passed,
            "failed": len(results) - passed,
            "overall_valid": passed == len(results)}
