"""DuckDB-SQL mirror of the six quality ensembles + confidence/verdict/
recommendations (core/quality) — generated from the SAME Python constants
so every float literal is the bit-identical double.

Purpose: promote the ``extract_quality`` gate query from rows-only to a
full value-hash check. The oracle replays, in SQL, exactly what the
vectorized UDF computes:

- ASCII class counts as RE2 classes (the core's pinned regex definitions;
  Python's Unicode \\s inside ASCII = [ \\t\\n\\x0b\\f\\r\\x1c-\\x1f],
  spelled out explicitly because RE2's \\s lacks \\x0b and \\x1c-\\x1f);
- the 3+2 consistency-gated ensembles with the reference weight schemes,
  operation-for-operation in core.quality._ensemble3_2's order (IEEE
  doubles are bit-identical when the op order matches);
- weight totals and thresholds embedded via ``repr()`` (round-trips to
  the identical double) and cast ::DOUBLE so DuckDB never switches to
  DECIMAL arithmetic.

Scope note: quality runs on the EXTRACTED text. The oracle can only
mirror the identity extraction (kind = 'plain'); the synthetic documents
fixture is 100% plain/ASCII (verified), and a non-plain row would fail
the kind CASE loudly rather than silently diverge.
"""

from __future__ import annotations

import re as _re

from documentai_spark.core.entities import _PATTERNS, EXPECTED_FIELDS
from documentai_spark.core.quality import (
    BLANK_LOW, BLANK_RECOMMENDATION, BLANK_W, BLANK_W_ALL, BLANK_W_PRIMARY,
    BRIGHTNESS_W, BRIGHTNESS_W_ALL, BRIGHTNESS_W_PRIMARY,
    CONSISTENCY_THRESHOLD, CONTRAST_W, CONTRAST_W_ALL, CONTRAST_W_PRIMARY,
    CRITICAL_CAP, CRITICAL_LOW, EDGE_CROP_W, EDGE_CROP_W_ALL,
    EDGE_CROP_W_PRIMARY, LEGIBILITY_W, LEGIBILITY_W_ALL,
    LEGIBILITY_W_PRIMARY, METRIC_THRESHOLDS, NOISE_W, NOISE_W_ALL,
    NOISE_W_PRIMARY, RECOMMENDATION_TEXT, RESOLUTION_W, RESOLUTION_W_ALL,
    RESOLUTION_W_PRIMARY, RESOLUTION_WIDTHS, REVERSE_METRICS,
    SHADOW_GLARE_W, SHADOW_GLARE_W_ALL, SHADOW_GLARE_W_PRIMARY, SKEW_W,
    SKEW_W_ALL, SKEW_W_PRIMARY, VERDICT_AZURE, VERDICT_DIRECT,
    VERDICT_PREPROCESS, _METRIC_ORDER,
)

# Python-\s inside ASCII (core.quality.RE_WS domain for ASCII rows)
_WS = r" \t\n\x0b\f\r\x1c-\x1f"


def _d(x: float) -> str:
    """A double literal that parses to the bit-identical value.

    Via a STRING cast: DuckDB parses a bare numeric literal as DECIMAL
    first, and the int128->double conversion is lossy past 2^53 — e.g.
    the bare literal 0.9999999999999999 becomes exactly 1.0 (found the
    hard way: the r3 severity-metric weight totals hit it; the r2 totals
    happened to land on even mantissas). The string path uses strtod,
    which rounds correctly."""
    return f"CAST('{x!r}' AS DOUBLE)"


def _q(s: str) -> str:
    """SQL-escape a string for embedding in a single-quoted literal —
    future advice wording with an apostrophe must not break the oracle."""
    return s.replace("'", "''")


def _ensemble(prefix: str, w: tuple, w_primary: float, w_all: float) -> str:
    """SQL columns replaying core.quality._ensemble3_2 for columns
    {prefix}_p1..{prefix}_f2 -> one expression {prefix}_score."""
    p1, p2, p3 = f"{prefix}_p1", f"{prefix}_p2", f"{prefix}_p3"
    f1, f2 = f"{prefix}_f1", f"{prefix}_f2"
    w1, w2, w3, w4, w5 = (_d(x) for x in w)
    mean = f"(({p1} + {p2} + {p3}) / 3.0)"
    var = (f"((({p1} - {mean}) * ({p1} - {mean})"
           f" + ({p2} - {mean}) * ({p2} - {mean})"
           f" + ({p3} - {mean}) * ({p3} - {mean})) / 3.0)")
    consistency = (f"(CASE WHEN {mean} > {_d(1e-12)}"
                   f" THEN 1.0 - (sqrt({var}) / {mean}) ELSE 0.0 END)")
    primary = (f"(({p1} * {w1} + {p2} * {w2} + {p3} * {w3})"
               f" / {_d(w_primary)})")
    full = (f"(({p1} * {w1} + {p2} * {w2} + {p3} * {w3}"
            f" + {f1} * {w4} + {f2} * {w5}) / {_d(w_all)})")
    return (f"(CASE WHEN {consistency} >= {_d(CONSISTENCY_THRESHOLD)}"
            f" THEN {primary} ELSE {full} END)")


def _category(metric: str, value_expr: str) -> str:
    v = (f"(1.0 - {value_expr})" if metric in REVERSE_METRICS
         else value_expr)
    exc, good, med = METRIC_THRESHOLDS[metric]
    return (f"(CASE WHEN {v} >= {_d(exc)} THEN 'excellent'"
            f" WHEN {v} >= {_d(good)} THEN 'good'"
            f" WHEN {v} >= {_d(med)} THEN 'medium'"
            f" ELSE 'low' END)")


def extract_quality_oracle_sql(
        table: str = "documents", id_col: str = "doc_id",
        kind_html_pat: str = "", kind_blocksep: str = "",
        kind_multicol: str = "", only_plain: bool = False,
        span_counts: bool = False) -> str:
    """The full extract_quality mirror (see module docstring).

    ``id_col`` may be a comma-joined composite key ("conv_id, turn_idx");
    ``only_plain=True`` restricts to kind='plain' rows (the identity-
    extraction subset — lets the oracle run on mixed-kind tables like the
    transcripts fixture, where html/layout extraction is Python-only)."""
    # entity presence for completeness: generated from the SAME compiled
    # patterns core.entities uses (r7 review — these were free-standing
    # copies before; an edit to a core pattern or to EXPECTED_FIELDS would
    # have silently diverged the oracle). The core patterns are compiled
    # re.ASCII with whitespace spelled out as [ \t\n\f\r], so the pattern
    # STRINGS are valid RE2 with identical semantics (ASCII \b/\d/\w).
    def _present_term(field: str) -> str:
        pat = _PATTERNS[field]
        flag = ", 'i'" if pat.flags & _re.IGNORECASE else ""
        return f"CAST(regexp_matches(t, '{_q(pat.pattern)}'{flag}) AS INT)"

    present = " + ".join(_present_term(f) for f in EXPECTED_FIELDS)
    ws_chars = ("' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)"
                " || chr(28) || chr(29) || chr(30) || chr(31)")
    kind = (f"CASE WHEN regexp_matches(t, '{kind_html_pat}') THEN 'html' "
            f"WHEN contains(t, chr(10)) AND (regexp_matches(t, "
            f"'{kind_blocksep}') OR regexp_matches(t, '{kind_multicol}')) "
            f"THEN 'layout' ELSE 'plain' END") if kind_html_pat else "'plain'"
    plain_filter = " WHERE kind = 'plain'" if only_plain else ""
    # plain-branch extraction surface (core/extract._extract_plain):
    # extracted == text; spans = non-empty lines
    sc_counts = (", CAST(length(t) AS INT) AS n_extracted_chars, "
                 "CAST(len(list_filter(string_split(t, chr(10)), "
                 f"x -> trim(x, {ws_chars}) <> '')) AS INT) AS n_spans"
                 if span_counts else "")
    sc_pass = (", n_extracted_chars, n_spans" if span_counts else "")

    mcol = {"legibility": "q_legibility", "completeness": "q_completeness",
            "skew": "q_skew", "noise": "q_noise", "contrast": "q_contrast",
            "brightness": "q_brightness", "edge_crop": "q_edge_crop",
            "shadow_glare": "q_shadow_glare", "resolution": "q_resolution"}
    rec_entries = []
    for m in _METRIC_ORDER:
        cat = _category(m, mcol[m])
        label = m.replace("_", " ").capitalize()
        texts = RECOMMENDATION_TEXT[m]
        branches = " ".join(
            f"WHEN {cat} = '{c}' THEN '{_q(f'{label}: {texts[c]}')}'"
            for c in ("good", "medium", "low"))
        rec_entries.append(f"CASE {branches} END")
    recs = (f"CASE WHEN q_blank >= {_d(BLANK_LOW)} "
            f"THEN '{_q(BLANK_RECOMMENDATION)}' "
            f"ELSE COALESCE(array_to_string(list_filter(["
            + ", ".join(rec_entries)
            + "], x -> x IS NOT NULL), ' | '), '') END")

    return f"""
WITH src0 AS (
  -- quality runs on the EXTRACTED text; only the identity (plain) branch
  -- is mirror-able in SQL — an unexpected non-plain row changes `kind`
  -- and fails the compare loudly
  -- COALESCE mirrors core.extract.extract_turn(None) -> '' and the vec
  -- path's fillna('') — a NULL row must score blank=1.0 / re-scan /
  -- confidence 0.0, not NULL-propagate into plausible garbage (r7 review)
  SELECT {id_col}, {kind} AS kind, t FROM (
    SELECT {id_col}, COALESCE(text, '') AS t FROM {table}
  )
), src AS (
  SELECT * FROM src0{plain_filter}
), counts AS (
  SELECT {id_col}, kind, t,
    CAST(length(t) AS DOUBLE) AS n,
    CAST(length(trim(t, {ws_chars})) AS DOUBLE) AS strip_len,
    CAST(len(regexp_extract_all(t, '[{_WS}]')) AS DOUBLE) AS ws,
    CAST(len(regexp_extract_all(t, '[^{_WS}]+')) AS DOUBLE) AS tokens,
    CAST(len(regexp_extract_all(t, '[^{_WS}]{{21,}}')) AS DOUBLE)
        AS long_toks,
    CAST(len(regexp_extract_all(t, '[0-9A-Za-z]')) AS DOUBLE) AS alnum,
    CAST(len(regexp_extract_all(t, '[\\x00-\\x08\\x0b-\\x1f\\x7f]'))
         AS DOUBLE) AS control,
    CAST(len(regexp_extract_all(t, '[aeiouAEIOU]')) AS DOUBLE) AS vowel,
    CAST(len(regexp_extract_all(t, '[A-Za-z]')) AS DOUBLE) AS letter,
    CAST(len(regexp_extract_all(t, '[A-Z]')) AS DOUBLE) AS upper_c,
    CAST(len(regexp_extract_all(t, '[?#~^`|\\\\]')) AS DOUBLE) AS markers,
    CAST(len(regexp_extract_all(t, '(^|[{_WS}])[A-Z]')) AS DOUBLE)
        AS cap_starts,
    CAST(len(list_distinct(regexp_extract_all(trim(t, {ws_chars}),
         '(?s).'))) AS DOUBLE) AS distinct_stripped,
    CAST(len(list_distinct(regexp_extract_all(t, '(?s).'))) AS DOUBLE)
        AS distinct_full,
    [CAST(length(x) AS DOUBLE) for x in string_split(t, chr(10))] AS ll,
    CAST(length(t) - length(ltrim(t, {ws_chars})) AS DOUBLE) AS lead_ws,
    CAST(length(t) - length(rtrim(t, {ws_chars})) AS DOUBLE) AS trail_ws,
    COALESCE(list_sum([CAST(length(x) AS DOUBLE)
        for x in regexp_extract_all(t, '[^{_WS}]{{40,}}')]), 0.0)
        AS shadow_chars,
    COALESCE(list_sum([CAST(length(x) AS DOUBLE)
        for x in regexp_extract_all(t, ' {{8,}}')]), 0.0) AS glare_chars,
    [CAST(length(x) - length(ltrim(x, ' ')) AS DOUBLE)
        for x in string_split(t, chr(10))] AS ind,
    ({present}) AS present{sc_counts}
  FROM src
), lstats AS (
  SELECT *, CAST(len(ll) AS DOUBLE) AS lk, len(ll) AS lki,
         list_sum(ll) / CAST(len(ll) AS DOUBLE) AS lmean,
         list_sum(ind) / CAST(len(ll) AS DOUBLE) AS indm,
         CAST(len(list_filter(ll, x -> x >= 30.0)) AS DOUBLE) AS strong
  FROM counts
), lstats2 AS (
  SELECT *,
    list_sum([(x - lmean) * (x - lmean) for x in ll]) / lk AS lvar,
    list_sum([(x - indm) * (x - indm) for x in ind]) / lk AS indvar,
    CAST(len(list_filter(ind, x -> abs(x - indm) > 2.0)) AS DOUBLE)
        AS indoff,
    CASE WHEN lki >= 2 THEN abs(
        (list_sum(ind[(lki // 2) + 1 : lki])
            / (lk - CAST(lki // 2 AS DOUBLE)))
        - (list_sum(ind[1 : lki // 2]) / CAST(lki // 2 AS DOUBLE)))
      ELSE 0.0 END AS inddrift,
    CASE WHEN lki >= 2 THEN
        COALESCE(list_sum(list_transform(ind[2 : lki],
                                         (x, i) -> abs(x - ind[i]))), 0.0)
        / (lk - 1.0)
      ELSE 0.0 END AS indlag,
    n - ws AS nonws
  FROM lstats
), prim AS (
  SELECT {id_col}, kind, n, strip_len, present{sc_pass},
    -- blank (raw text)
    CASE WHEN n > 0 THEN ws / n ELSE 0.0 END AS bl_p1,
    1.0 - least(1.0, tokens / 5.0) AS bl_p2,
    1.0 - least(1.0, strip_len / 100.0) AS bl_p3,
    1.0 AS bl_f1,
    1.0 - least(1.0, distinct_stripped / 20.0) AS bl_f2,
    -- legibility
    CASE WHEN n > 0 THEN 1.0 - control / n ELSE 0.0 END AS lg_p1,
    CASE WHEN nonws > 0 THEN alnum / nonws ELSE 0.0 END AS lg_p2,
    greatest(0.0, 1.0 - abs((CASE WHEN tokens > 0 THEN nonws / tokens
                             ELSE 0.0 END) - 5.0) / 10.0) AS lg_p3,
    greatest(0.0, 1.0 - abs((CASE WHEN letter > 0 THEN vowel / letter
                             ELSE 0.0 END) - {_d(0.4)}) / {_d(0.4)})
        AS lg_f1,
    CASE WHEN tokens > 0 THEN (tokens - long_toks) / tokens
         ELSE 0.0 END AS lg_f2,
    -- noise
    CASE WHEN nonws > 0 THEN (nonws - alnum) / nonws ELSE 0.0 END AS no_p1,
    CASE WHEN n > 0 THEN control / n ELSE 0.0 END AS no_p2,
    CASE WHEN n > 0 THEN markers / n ELSE 0.0 END AS no_p3,
    CASE WHEN tokens > 0 THEN long_toks / tokens ELSE 0.0 END AS no_f1,
    CASE WHEN n > 0 THEN abs(ws / n - {_d(0.16)}) / {_d(0.84)}
         ELSE 0.0 END AS no_f2,
    -- contrast
    1.0 - least(1.0, CASE WHEN lmean > 0 THEN sqrt(lvar) / lmean
                     ELSE 1.0 END) AS co_p1,
    1.0 - least(1.0, abs(lmean - 60.0) / 60.0) AS co_p2,
    least(1.0, distinct_full / 40.0) AS co_p3,
    CASE WHEN nonws > 0 THEN alnum / nonws ELSE 0.0 END AS co_f1,
    CASE WHEN tokens > 0 THEN (tokens - long_toks) / tokens
         ELSE 0.0 END AS co_f2,
    -- brightness
    greatest(0.0, 1.0 - abs((CASE WHEN letter > 0 THEN upper_c / letter
                             ELSE 0.0 END) - {_d(0.06)}) / {_d(0.94)})
        AS br_p1,
    CASE WHEN nonws > 0 THEN letter / nonws ELSE 0.0 END AS br_p2,
    1.0 - least(1.0, greatest(0.0, (CASE WHEN tokens > 0
                                    THEN cap_starts / tokens ELSE 0.0 END)
                              - {_d(0.15)}) / {_d(0.85)}) AS br_p3,
    greatest(0.0, 1.0 - abs((CASE WHEN letter > 0 THEN vowel / letter
                             ELSE 0.0 END) - {_d(0.4)}) / {_d(0.4)})
        AS br_f1,
    1.0 - (CASE WHEN alnum > 0 THEN (alnum - letter) / alnum
           ELSE 0.0 END) AS br_f2,
    -- skew (indentation-drift ensemble; reverse)
    least(1.0, inddrift / 8.0) AS sk_p1,
    least(1.0, sqrt(indvar) / 4.0) AS sk_p2,
    CASE WHEN lk > 0 THEN indoff / lk ELSE 0.0 END AS sk_p3,
    least(1.0, indlag / 4.0) AS sk_f1,
    least(1.0, indm / 8.0) AS sk_f2,
    -- edge_crop (margin-asymmetry ensemble; reverse)
    CASE WHEN (CASE WHEN n > 0 THEN strip_len / n ELSE 0.0 END) < 0.7
              OR (CASE WHEN n > 0 THEN lead_ws / n ELSE 0.0 END) > 0.05
              OR (CASE WHEN n > 0 THEN trail_ws / n ELSE 0.0 END) > 0.05
         THEN 1.0 - (CASE WHEN n > 0 THEN strip_len / n ELSE 0.0 END)
         ELSE 0.0 END AS ec_p1,
    CASE WHEN (CASE WHEN n > 0 THEN lead_ws / n ELSE 0.0 END) > 0.05
              OR (CASE WHEN n > 0 THEN trail_ws / n ELSE 0.0 END) > 0.05
         THEN 1.0 ELSE 0.0 END AS ec_p2,
    CASE WHEN strong >= 2.0 THEN 0.0 ELSE 1.0 END AS ec_p3,
    least(1.0, abs(lmean / 80.0 - {_d(8.5 / 11.0)}) / 0.5) AS ec_f1,
    CASE WHEN (CASE WHEN n > 0 THEN nonws / n ELSE 0.0 END) < 0.7
         THEN 1.0 ELSE 0.0 END AS ec_f2,
    -- shadow_glare (dense/sparse-run ensemble; reverse)
    least(1.0, (CASE WHEN n > 0 THEN shadow_chars / n ELSE 0.0 END)
               / {_d(0.08)}) AS sg_p1,
    least(1.0, sqrt(lvar) / 40.0) AS sg_p2,
    least(1.0, (CASE WHEN n > 0 THEN glare_chars / n ELSE 0.0 END)
               / {_d(0.06)}) AS sg_p3,
    1.0 - least(1.0, distinct_full / 64.0) AS sg_f1,
    greatest(CASE WHEN n > 0 THEN shadow_chars / n ELSE 0.0 END,
             CASE WHEN n > 0 THEN glare_chars / n ELSE 0.0 END) AS sg_f2,
    -- resolution (line-width-adequacy ensemble)
    least(1.0, lmean / 66.0) AS re_p1,
    least(1.0, {_d(0.6)} + (CASE WHEN n > 0 THEN alnum / n
                            ELSE 0.0 END)) AS re_p2,
    CASE WHEN least({", ".join(f"abs(lmean - {_d(w)})"
                               for w in RESOLUTION_WIDTHS)}) < 8.0
         THEN {_d(0.9)} ELSE {_d(0.7)} END AS re_p3,
    {_d(0.6)} AS re_f1,
    {_d(0.5)} AS re_f2
  FROM lstats2
), scored AS (
  SELECT {id_col}, kind{sc_pass},
    CASE WHEN n = 0 OR strip_len = 0 THEN 1.0
         ELSE {_ensemble('bl', BLANK_W, BLANK_W_PRIMARY, BLANK_W_ALL)}
         END AS q_blank,
    CASE WHEN n = 0 OR strip_len = 0 THEN 0.0
         ELSE {_ensemble('lg', LEGIBILITY_W, LEGIBILITY_W_PRIMARY,
                         LEGIBILITY_W_ALL)} END AS q_legibility,
    CAST(present AS DOUBLE) / {len(EXPECTED_FIELDS)} AS q_completeness,
    CASE WHEN n = 0 OR strip_len = 0 THEN 0.0
         ELSE {_ensemble('no', NOISE_W, NOISE_W_PRIMARY, NOISE_W_ALL)}
         END AS q_noise,
    CASE WHEN n = 0 OR strip_len = 0 THEN 0.0
         ELSE {_ensemble('co', CONTRAST_W, CONTRAST_W_PRIMARY,
                         CONTRAST_W_ALL)} END AS q_contrast,
    CASE WHEN n = 0 OR strip_len = 0 THEN 0.0
         ELSE {_ensemble('br', BRIGHTNESS_W, BRIGHTNESS_W_PRIMARY,
                         BRIGHTNESS_W_ALL)} END AS q_brightness,
    CASE WHEN n = 0 OR strip_len = 0 THEN 0.0
         ELSE {_ensemble('sk', SKEW_W, SKEW_W_PRIMARY, SKEW_W_ALL)}
         END AS q_skew,
    CASE WHEN n = 0 OR strip_len = 0 THEN 1.0
         ELSE {_ensemble('ec', EDGE_CROP_W, EDGE_CROP_W_PRIMARY,
                         EDGE_CROP_W_ALL)} END AS q_edge_crop,
    CASE WHEN n = 0 OR strip_len = 0 THEN 1.0
         ELSE {_ensemble('sg', SHADOW_GLARE_W, SHADOW_GLARE_W_PRIMARY,
                         SHADOW_GLARE_W_ALL)} END AS q_shadow_glare,
    CASE WHEN n = 0 OR strip_len = 0 THEN 0.0
         ELSE {_ensemble('re', RESOLUTION_W, RESOLUTION_W_PRIMARY,
                         RESOLUTION_W_ALL)} END AS q_resolution
  FROM prim
), conf AS (
  -- blank hard block zeroes confidence alongside 're-scan'
  -- (quality_config.py:109-121); critical set = legibility/skew/noise
  -- (the sharpness->completeness analog is deliberately non-critical,
  -- see core/quality.confidence_score)
  SELECT *,
    CASE WHEN q_blank >= {_d(BLANK_LOW)} THEN 0.0
         WHEN q_legibility < {_d(CRITICAL_LOW)}
              OR (1.0 - q_skew) < {_d(CRITICAL_LOW)}
              OR (1.0 - q_noise) < {_d(CRITICAL_LOW)}
         THEN {_d(CRITICAL_CAP)}
         ELSE (q_legibility * 3.0 + q_completeness * 3.0
               + (1.0 - q_skew) * 2.0 + (1.0 - q_noise) * 2.0
               + q_contrast * 1.0 + q_brightness * 1.0) / 12.0
         END AS confidence
  FROM scored
)
SELECT {id_col}, kind{sc_pass}, q_blank, q_legibility, q_completeness,
       q_skew, q_noise, q_contrast, q_brightness, q_edge_crop,
       q_shadow_glare, q_resolution, confidence,
       CASE WHEN q_blank >= {_d(BLANK_LOW)} THEN 're-scan'
            WHEN confidence >= {_d(VERDICT_DIRECT)} THEN 'direct analysis'
            WHEN confidence >= {_d(VERDICT_PREPROCESS)}
                THEN 'pre-processing'
            WHEN confidence >= {_d(VERDICT_AZURE)}
                THEN 'azure document analysis'
            ELSE 'reupload' END AS verdict,
       {recs} AS recommendations
FROM conf ORDER BY {id_col}
"""
