"""Rule-based quality scoring: text analogs of the reference's 10-metric
image-quality ensemble, with the identical ensemble *skeleton*.

Skeleton rebuilt from quality_analysis_updated/metrics/blur_score.py:190-223
(same shape in all 10 metric files):

1. run the primary methods;
2. consistency = 1 - std/mean over primary scores; if consistency < 0.7,
   also run the fallback methods (short-circuit ensembles, SURVEY §4 X2);
3. score = weighted average over executed methods (weights renormalized);
4. fixed method order so results are reproducible across Arrow batch sizes
   (SURVEY §7.4 risk #4 — dict order pinned as in parallel_metrics.py:24-35).

Text-analog metrics (FIXTURES.md §2):

- ``q_blank``        — blank/whitespace ratio analog of
  metrics/blank_page_score.py:68-108 (white_pixel_ratio .40,
  text_blob_count .30, mean_std .20, ocr_stub .05 — always 1.0 exactly as
  the reference's stub at blank_page_score.py:95-101 — edge_density .05).
  Reverse-scaled: high = blank.
- ``q_legibility``   — printable/alnum/word-shape ensemble, the text analog
  of the blur/sharpness/contrast family.
- ``q_completeness`` — expected-entity presence
  (entity-extraction-service/app.py:990-999).

Verdict machinery (quality_analysis_updated/quality_config.py):

- confidence = weighted mean of normalized metrics, weights
  {legibility: 3, completeness: 2, blank: 1} (the {blur:3, sharp:3, skew:2,
  noise:2, contrast:1, bright:1} analog, quality_config.py:39-74), with a
  0.55 cap when the critical metric (legibility) is "low".
- verdict thresholds {>=.95 "direct analysis", >=.8 "pre-processing",
  >=.6 "azure document analysis", else "reupload"}
  (quality_config.py:86-94, quality_config.yaml:37-41).
- hard blocker: blank "low" (q_blank >= BLANK_LOW) => "re-scan" before the
  confidence calc (quality_config.py:109-116).

Everything is pure Python over one string — shared by the pandas UDF and
pytest.
"""

from __future__ import annotations

import math
from typing import NamedTuple

CONSISTENCY_THRESHOLD = 0.7   # blur_score.py:198-201 gate
CRITICAL_LOW = 0.4            # critical-metric "low" cut
CRITICAL_CAP = 0.55           # quality_config.py:39-74 floor/cap
BLANK_LOW = 0.9               # blank "low quality" category cut

VERDICT_DIRECT = 0.95
VERDICT_PREPROCESS = 0.80
VERDICT_AZURE = 0.60

# metric weights for confidence (quality_config.py:39-74 analog)
CONFIDENCE_WEIGHTS = (("legibility", 3.0), ("completeness", 2.0), ("blank", 1.0))


class QualityScores(NamedTuple):
    q_blank: float
    q_legibility: float
    q_completeness: float
    confidence: float
    verdict: str


def _ensemble(primaries: list[tuple[float, float]],
              fallbacks: list[tuple[float, float]]) -> float:
    """(score, weight) lists -> consistency-gated weighted mean.

    Fixed method order; weights renormalized over executed methods
    (blur_score.py:190-223 skeleton).
    """
    p_scores = [s for s, _ in primaries]
    mean = sum(p_scores) / len(p_scores)
    if mean > 1e-12:
        var = sum((s - mean) ** 2 for s in p_scores) / len(p_scores)
        consistency = 1.0 - (math.sqrt(var) / mean)
    else:
        consistency = 0.0
    methods = list(primaries)
    if consistency < CONSISTENCY_THRESHOLD:
        methods.extend(fallbacks)
    total_w = sum(w for _, w in methods)
    return sum(s * w for s, w in methods) / total_w


def blank_score(raw_text: str) -> float:
    """Blank/whitespace ratio ensemble (blank_page_score.py analog).

    High = blank. An empty turn scores 1.0 on every method.
    """
    n = len(raw_text)
    stripped = raw_text.strip()
    if n == 0 or not stripped:
        return 1.0
    ws = sum(1 for c in raw_text if c.isspace())
    tokens = raw_text.split()
    # primaries (weights mirror blank_page_score.py:14-32)
    ws_ratio = ws / n                                          # .40
    blob = 1.0 - min(1.0, len(tokens) / 5.0)                   # .30
    length = 1.0 - min(1.0, len(stripped) / 100.0)             # .20
    primaries = [(ws_ratio, 0.40), (blob, 0.30), (length, 0.20)]
    # fallbacks: ocr stub always 1.0 (blank_page_score.py:95-101), edge
    distinct = len(set(stripped))
    fallbacks = [(1.0, 0.05), (1.0 - min(1.0, distinct / 20.0), 0.05)]
    return _ensemble(primaries, fallbacks)


def legibility_score(extracted_text: str) -> float:
    """Printable/alnum/word-shape ensemble (blur/contrast family analog)."""
    t = extracted_text
    if not t or not t.strip():
        return 0.0
    n = len(t)
    printable = sum(1 for c in t if c.isprintable() or c in "\n\t")
    non_ws = [c for c in t if not c.isspace()]
    alnum = sum(1 for c in non_ws if c.isalnum())
    words = t.split()
    avg_wl = sum(len(w) for w in words) / len(words)
    # primaries
    printable_ratio = printable / n                             # .35
    alnum_ratio = (alnum / len(non_ws)) if non_ws else 0.0      # .35
    word_shape = max(0.0, 1.0 - abs(avg_wl - 5.0) / 10.0)       # .30
    primaries = [(printable_ratio, 0.35), (alnum_ratio, 0.35), (word_shape, 0.30)]
    # fallbacks: vowel ratio (letters only), token-length sanity
    letters = [c.lower() for c in t if c.isalpha()]
    vowels = sum(1 for c in letters if c in "aeiou")
    vowel_ratio = (vowels / len(letters)) if letters else 0.0
    vowel_score = max(0.0, 1.0 - abs(vowel_ratio - 0.4) / 0.4)
    sane = sum(1 for w in words if 1 <= len(w) <= 20) / len(words)
    fallbacks = [(vowel_score, 0.05), (sane, 0.05)]
    return _ensemble(primaries, fallbacks)


def confidence_score(q_blank: float, q_legibility: float,
                     q_completeness: float) -> float:
    """Weighted mean of normalized metrics with critical cap
    (quality_config.py:39-74)."""
    normalized = {
        "legibility": q_legibility,
        "completeness": q_completeness,
        "blank": 1.0 - q_blank,  # reverse-scaled (universal_analyzer.py:139)
    }
    total_w = sum(w for _, w in CONFIDENCE_WEIGHTS)
    conf = sum(normalized[m] * w for m, w in CONFIDENCE_WEIGHTS) / total_w
    if q_legibility < CRITICAL_LOW:  # critical metric "low"
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
