"""Rule-based quality scoring: text analogs of the reference's 10-metric
image-quality ensemble, with the identical ensemble *skeleton*.

Skeleton rebuilt from quality_analysis_updated/metrics/blur_score.py:190-223
(same shape in all 10 metric files):

1. run the primary methods;
2. consistency = 1 - std/mean over primary scores; if consistency < 0.7,
   also run the fallback methods (short-circuit ensembles, SURVEY §4 X2);
3. score = weighted average over executed methods (weights renormalized);
4. fixed method order + fixed operation order so results are bit-identical
   across Arrow batch sizes AND across the scalar oracle / vectorized
   NumPy implementations (SURVEY §7.4 risk #4 — the reference pins method
   order for the same reason, parallel_metrics.py:24-35).

Every character-class count is defined by an explicit ASCII regex (not
str.is* predicates) so the scalar oracle, the pandas-vectorized UDF
(operators/quality_vec.py), and any SQL mirror count identically.

Text-analog metrics (FIXTURES.md §2):

- ``q_blank``        — blank/whitespace ensemble, analog of
  metrics/blank_page_score.py:68-108 (white_pixel_ratio .40,
  text_blob_count .30, mean_std .20; fallbacks: ocr_stub .05 — always 1.0
  exactly like the reference's stub at blank_page_score.py:95-101 — and
  edge_density .05). Reverse-scaled: high = blank.
- ``q_legibility``   — printable/alnum/word-shape ensemble, the text
  analog of the blur/sharpness/contrast family.
- ``q_completeness`` — expected-entity presence
  (entity-extraction-service/app.py:990-999).

Verdict machinery (quality_analysis_updated/quality_config.py):
confidence = weighted mean {legibility:3, completeness:2, blank:1}
(quality_config.py:39-74 weight-scheme analog) with a 0.55 cap when the
critical metric is "low"; verdict thresholds {>=.95 direct analysis,
>=.8 pre-processing, >=.6 azure document analysis, else reupload}
(quality_config.py:86-94); blank "low" => hard "re-scan"
(quality_config.py:109-116).
"""

from __future__ import annotations

import math
import re
from typing import NamedTuple

CONSISTENCY_THRESHOLD = 0.7   # blur_score.py:198-201 gate
CRITICAL_LOW = 0.4            # critical-metric "low" cut
CRITICAL_CAP = 0.55           # quality_config.py:39-74 floor/cap
BLANK_LOW = 0.9               # blank "low quality" category cut

VERDICT_DIRECT = 0.95
VERDICT_PREPROCESS = 0.80
VERDICT_AZURE = 0.60

# ensemble weights (primary x3, fallback x2) — blank_page_score.py:14-32 /
# blur_score.py:21-41 weight-scheme analogs. Totals are computed ONCE here
# and imported by the vectorized implementation so float math is identical.
BLANK_W = (0.40, 0.30, 0.20, 0.05, 0.05)
LEGIBILITY_W = (0.35, 0.35, 0.30, 0.05, 0.05)
BLANK_W_PRIMARY = BLANK_W[0] + BLANK_W[1] + BLANK_W[2]
BLANK_W_ALL = BLANK_W_PRIMARY + BLANK_W[3] + BLANK_W[4]
LEGIBILITY_W_PRIMARY = LEGIBILITY_W[0] + LEGIBILITY_W[1] + LEGIBILITY_W[2]
LEGIBILITY_W_ALL = LEGIBILITY_W_PRIMARY + LEGIBILITY_W[3] + LEGIBILITY_W[4]

# pinned ASCII character classes (regex is the definition, see module doc)
RE_WS = re.compile(r"\s")
RE_NONWS = re.compile(r"\S")
RE_ALNUM = re.compile(r"[0-9A-Za-z]")
RE_CONTROL = re.compile(r"[\x00-\x08\x0B-\x1F\x7F]")
RE_VOWEL = re.compile(r"[aeiouAEIOU]")
RE_LETTER = re.compile(r"[A-Za-z]")
RE_LONG_TOKEN = re.compile(r"\S{21,}")

# metric weights for confidence (quality_config.py:39-74 analog)
CONFIDENCE_WEIGHTS = (("legibility", 3.0), ("completeness", 2.0), ("blank", 1.0))


class QualityScores(NamedTuple):
    q_blank: float
    q_legibility: float
    q_completeness: float
    confidence: float
    verdict: str


def _ensemble3_2(p1: float, p2: float, p3: float,
                 f1: float, f2: float,
                 weights: tuple, w_primary: float, w_all: float) -> float:
    """Consistency-gated 3-primary + 2-fallback weighted mean.

    Operation order is pinned (left-to-right) — the NumPy implementation
    in operators/quality_vec.py repeats these expressions verbatim.
    """
    mean = (p1 + p2 + p3) / 3.0
    if mean > 1e-12:
        var = ((p1 - mean) ** 2 + (p2 - mean) ** 2 + (p3 - mean) ** 2) / 3.0
        consistency = 1.0 - (math.sqrt(var) / mean)
    else:
        consistency = 0.0
    w1, w2, w3, w4, w5 = weights
    primary = (p1 * w1 + p2 * w2 + p3 * w3) / w_primary
    full = (p1 * w1 + p2 * w2 + p3 * w3 + f1 * w4 + f2 * w5) / w_all
    return primary if consistency >= CONSISTENCY_THRESHOLD else full


def blank_score(raw_text: str) -> float:
    """Blank/whitespace ensemble; high = blank. Empty turn -> 1.0."""
    t = raw_text or ""
    n = len(t)
    stripped = t.strip()
    if n == 0 or not stripped:
        return 1.0
    ws = len(RE_WS.findall(t))
    n_tokens = len(t.split())
    ws_ratio = ws / n                                          # .40
    blob = 1.0 - min(1.0, n_tokens / 5.0)                      # .30
    length = 1.0 - min(1.0, len(stripped) / 100.0)             # .20
    ocr_stub = 1.0                                             # .05 (ref stub)
    edge = 1.0 - min(1.0, len(set(stripped)) / 20.0)           # .05
    return _ensemble3_2(ws_ratio, blob, length, ocr_stub, edge,
                        BLANK_W, BLANK_W_PRIMARY, BLANK_W_ALL)


def legibility_score(extracted_text: str) -> float:
    """Printable/alnum/word-shape ensemble (blur/contrast family analog)."""
    t = extracted_text or ""
    n = len(t)
    if n == 0 or not t.strip():
        return 0.0
    n_control = len(RE_CONTROL.findall(t))
    n_nonws = len(RE_NONWS.findall(t))
    n_alnum = len(RE_ALNUM.findall(t))
    n_tokens = len(t.split())
    printable_ratio = 1.0 - n_control / n                      # .35
    alnum_ratio = (n_alnum / n_nonws) if n_nonws else 0.0      # .35
    avg_wl = n_nonws / n_tokens
    word_shape = max(0.0, 1.0 - abs(avg_wl - 5.0) / 10.0)      # .30
    n_vowel = len(RE_VOWEL.findall(t))
    n_letter = len(RE_LETTER.findall(t))
    vowel_ratio = (n_vowel / n_letter) if n_letter else 0.0
    vowel_score = max(0.0, 1.0 - abs(vowel_ratio - 0.4) / 0.4)  # .05
    n_long = len(RE_LONG_TOKEN.findall(t))
    sane = (n_tokens - n_long) / n_tokens                       # .05
    return _ensemble3_2(printable_ratio, alnum_ratio, word_shape,
                        vowel_score, sane,
                        LEGIBILITY_W, LEGIBILITY_W_PRIMARY, LEGIBILITY_W_ALL)


def confidence_score(q_blank: float, q_legibility: float,
                     q_completeness: float) -> float:
    """Weighted mean of normalized metrics with critical cap
    (quality_config.py:39-74). Operation order mirrored in SQL
    (functions/verdict.py) — bit-identical doubles."""
    conf = (q_legibility * 3.0 + q_completeness * 2.0
            + (1.0 - q_blank) * 1.0) / 6.0
    if q_legibility < CRITICAL_LOW:
        conf = min(conf, CRITICAL_CAP)
    return conf


def verdict_for(q_blank: float, confidence: float) -> str:
    """4-way verdict + blank hard blocker (quality_config.py:86-129)."""
    if q_blank >= BLANK_LOW:
        return "re-scan"
    if confidence >= VERDICT_DIRECT:
        return "direct analysis"
    if confidence >= VERDICT_PREPROCESS:
        return "pre-processing"
    if confidence >= VERDICT_AZURE:
        return "azure document analysis"
    return "reupload"


def score_turn(raw_text: str, extracted_text: str,
               q_completeness: float) -> QualityScores:
    """Full per-turn quality record (the A11 partial stage)."""
    qb = blank_score(raw_text or "")
    ql = legibility_score(extracted_text or "")
    conf = confidence_score(qb, ql, q_completeness)
    return QualityScores(qb, ql, q_completeness, conf, verdict_for(qb, conf))
