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
  analog of the blur family (blur_score.py).
- ``q_completeness`` — expected-entity presence
  (entity-extraction-service/app.py:990-999) — the sharpness slot.
- ``q_noise``        — encoding-noise ensemble (symbol/control/mojibake
  densities), analog of noise_level.py; REVERSE metric (high = bad).
- ``q_contrast``     — line-length-variance ensemble, analog of
  contrast_score.py.
- ``q_brightness``   — casing-balance ensemble, analog of
  brightness_score.py (ALL-CAPS = overexposed).

Round-3 additions — the remaining four of the reference's 10 metrics:

- ``q_skew``         — indentation-drift ensemble, analog of
  metrics/skew_angle.py:59-135; REVERSE (high = skewed).
- ``q_edge_crop``    — margin-asymmetry ensemble, analog of
  metrics/edge_crop_score.py:69-136; REVERSE (high = cropped).
- ``q_shadow_glare`` — dense/sparse-run ensemble, analog of
  metrics/shadow_glare_score.py:69-118; REVERSE (high = bad).
- ``q_resolution``   — line-width-adequacy ensemble, analog of
  metrics/resolution.py:102-135.

Verdict machinery (quality_analysis_updated/quality_config.py):
confidence = weighted mean over the reference's FULL scheme
{legibility<-blur:3, completeness<-sharpness:3, skew:2 (reversed),
noise:2 (reversed), contrast:1, brightness:1} / 12
(quality_config.py:45-53); blank is EXCLUDED from confidence like
blank_page_score (quality_config.py:119-121), and edge_crop/
shadow_glare/resolution are reported-only (not in the weights dict).
A low critical metric (legibility, skew, noise) returns the FLAT 0.55
(quality_config.py:57-62). Verdict thresholds {>=.95 direct analysis,
>=.8 pre-processing, >=.6 azure document analysis, else reupload}
(quality_config.py:86-94); blank "low" => hard "re-scan" with
confidence ZEROED (verdict_for_page returns (re-scan, 0.0)) +
the single re-scan recommendation (quality_config.py:109-121);
per-metric recommendations from category tables
(quality_config.py:96-103 + quality_config.yaml:67-127).
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
# blur_score.py:21-41 weight-scheme analogs; noise/contrast/brightness use
# the (0.35,0.30,0.25,0.05,0.05) scheme shared by noise_level.py:31-36,
# contrast_score.py:30-36, brightness_score.py:30-36. Totals are computed
# ONCE here and imported by the vectorized implementation so float math is
# identical.
BLANK_W = (0.40, 0.30, 0.20, 0.05, 0.05)
LEGIBILITY_W = (0.35, 0.35, 0.30, 0.05, 0.05)
NOISE_W = (0.35, 0.30, 0.25, 0.05, 0.05)
CONTRAST_W = (0.35, 0.30, 0.25, 0.05, 0.05)
BRIGHTNESS_W = (0.35, 0.30, 0.25, 0.05, 0.05)
# skew_angle.py:30-36 / resolution.py:30-36 share the same scheme;
# edge_crop_score.py:27-33 and shadow_glare_score.py:27-33 use
# (0.35,0.30,0.20,0.10,0.05)
SKEW_W = (0.35, 0.30, 0.25, 0.05, 0.05)
EDGE_CROP_W = (0.35, 0.30, 0.20, 0.10, 0.05)
SHADOW_GLARE_W = (0.35, 0.30, 0.20, 0.10, 0.05)
RESOLUTION_W = (0.35, 0.30, 0.25, 0.05, 0.05)


def _w_totals(w: tuple) -> tuple[float, float]:
    primary = w[0] + w[1] + w[2]
    return primary, primary + w[3] + w[4]


BLANK_W_PRIMARY, BLANK_W_ALL = _w_totals(BLANK_W)
LEGIBILITY_W_PRIMARY, LEGIBILITY_W_ALL = _w_totals(LEGIBILITY_W)
NOISE_W_PRIMARY, NOISE_W_ALL = _w_totals(NOISE_W)
CONTRAST_W_PRIMARY, CONTRAST_W_ALL = _w_totals(CONTRAST_W)
BRIGHTNESS_W_PRIMARY, BRIGHTNESS_W_ALL = _w_totals(BRIGHTNESS_W)
SKEW_W_PRIMARY, SKEW_W_ALL = _w_totals(SKEW_W)
EDGE_CROP_W_PRIMARY, EDGE_CROP_W_ALL = _w_totals(EDGE_CROP_W)
SHADOW_GLARE_W_PRIMARY, SHADOW_GLARE_W_ALL = _w_totals(SHADOW_GLARE_W)
RESOLUTION_W_PRIMARY, RESOLUTION_W_ALL = _w_totals(RESOLUTION_W)

# pinned ASCII character classes (regex is the definition, see module doc)
RE_WS = re.compile(r"\s")
RE_NONWS = re.compile(r"\S")
RE_ALNUM = re.compile(r"[0-9A-Za-z]")
RE_CONTROL = re.compile(r"[\x00-\x08\x0B-\x1F\x7F]")
RE_VOWEL = re.compile(r"[aeiouAEIOU]")
RE_LETTER = re.compile(r"[A-Za-z]")
RE_LONG_TOKEN = re.compile(r"\S{21,}")
RE_UPPER = re.compile(r"[A-Z]")
# encoding-noise markers: mojibake/replacement-ish glyphs (the text analog
# of sensor noise); � rows are non-ASCII and take the per-row path
RE_NOISE_MARK = re.compile(r"[?#~^`|\\�]")
# token-initial capital (ASCII cap after a token boundary)
RE_CAP_START = re.compile(r"(?<!\S)[A-Z]")
# wall-of-text runs (shadow analog) and wide space runs (glare analog);
# \S kept Unicode like RE_LONG_TOKEN — the byte LUT agrees on ASCII rows
RE_SHADOW_RUN = re.compile(r"\S{40,}")
RE_GLARE_RUN = re.compile(r" {8,}")

# metric weights for confidence — the reference's FULL
# {blur:3, sharpness:3, skew:2, noise:2, contrast:1, brightness:1} scheme
# (quality_config.py:45-53) mapped to the text analogs:
# legibility<-blur 3, completeness<-sharpness 3, skew 2 (reverse),
# noise 2 (reverse), contrast 1, brightness 1 — total 12, matching the
# reference denominator (r2's /10 folding of skew is gone). blank is
# EXCLUDED from confidence like the reference's blank_page_score
# (quality_config.py:119-121) — it acts only as the hard verdict blocker.
# edge_crop / shadow_glare / resolution are reported metrics (categories +
# recommendations) but are NOT in the reference weights dict, so they do
# not enter confidence — same as upstream.
# The three implementations (confidence_score below, functions/verdict's
# Spark expression, functions/quality_sql's conf CTE) spell these weights
# out as literals so the IEEE operation order stays pinned; tests/
# test_core_quality.py::test_confidence_weights_are_the_live_scheme
# rebuilds confidence generically from THIS tuple and asserts bit-equality,
# so an edit here that isn't mirrored in all three fails loudly.
CONFIDENCE_WEIGHTS = (("legibility", 3.0), ("completeness", 3.0),
                      ("skew", 2.0), ("noise", 2.0),
                      ("contrast", 1.0), ("brightness", 1.0))
CONFIDENCE_W_TOTAL = 12.0

# reference reverse_metrics = {noise_level, skew_angle}
# (quality_config.py:54); the two severity-score analogs categorize the
# same way (their 0=clean/1=severe orientation matches noise's)
REVERSE_METRICS = frozenset({"noise", "skew", "edge_crop", "shadow_glare"})


class QualityScores(NamedTuple):
    q_blank: float
    q_legibility: float
    q_completeness: float
    q_skew: float
    q_noise: float
    q_contrast: float
    q_brightness: float
    q_edge_crop: float
    q_shadow_glare: float
    q_resolution: float
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


def noise_score(extracted_text: str) -> float:
    """Encoding-noise ensemble (noise_level.py:16-36 skeleton analog);
    REVERSE metric: high = noisy. Empty/blank -> 0.0 (no noise signal)."""
    t = extracted_text or ""
    n = len(t)
    if n == 0 or not t.strip():
        return 0.0
    ws = len(RE_WS.findall(t))
    nonws = n - ws
    alnum = len(RE_ALNUM.findall(t))
    n_tokens = len(t.split())
    symbol_ratio = ((nonws - alnum) / nonws) if nonws else 0.0    # .35
    control_ratio = len(RE_CONTROL.findall(t)) / n                # .30
    marker_ratio = len(RE_NOISE_MARK.findall(t)) / n              # .25
    long_ratio = (len(RE_LONG_TOKEN.findall(t)) / n_tokens
                  if n_tokens else 0.0)                           # .05
    ws_anomaly = abs(ws / n - 0.16) / 0.84                        # .05
    return _ensemble3_2(symbol_ratio, control_ratio, marker_ratio,
                        long_ratio, ws_anomaly,
                        NOISE_W, NOISE_W_PRIMARY, NOISE_W_ALL)


def contrast_score(extracted_text: str) -> float:
    """Line-length-variance ensemble (contrast_score.py:25-36 skeleton
    analog); high = good structural contrast."""
    t = extracted_text or ""
    n = len(t)
    if n == 0 or not t.strip():
        return 0.0
    lines = t.split("\n")
    k = len(lines)
    lens = [float(len(ln)) for ln in lines]
    mean_l = sum(lens) / k
    var_l = sum((x - mean_l) ** 2 for x in lens) / k
    cv = (math.sqrt(var_l) / mean_l) if mean_l > 0 else 1.0
    p1 = 1.0 - min(1.0, cv)                                       # .35
    p2 = 1.0 - min(1.0, abs(mean_l - 60.0) / 60.0)                # .30
    p3 = min(1.0, len(set(t)) / 40.0)                             # .25
    ws = len(RE_WS.findall(t))
    nonws = n - ws
    alnum = len(RE_ALNUM.findall(t))
    f1 = (alnum / nonws) if nonws else 0.0                        # .05
    n_tokens = len(t.split())
    f2 = ((n_tokens - len(RE_LONG_TOKEN.findall(t))) / n_tokens
          if n_tokens else 0.0)                                   # .05
    return _ensemble3_2(p1, p2, p3, f1, f2,
                        CONTRAST_W, CONTRAST_W_PRIMARY, CONTRAST_W_ALL)


def brightness_score(extracted_text: str) -> float:
    """Casing-balance ensemble (brightness_score.py:25-36 skeleton
    analog); high = good. ALL-CAPS text is the overexposure analog."""
    t = extracted_text or ""
    n = len(t)
    if n == 0 or not t.strip():
        return 0.0
    upper = len(RE_UPPER.findall(t))
    letter = len(RE_LETTER.findall(t))
    alnum = len(RE_ALNUM.findall(t))
    ws = len(RE_WS.findall(t))
    nonws = n - ws
    n_tokens = len(t.split())
    upper_ratio = (upper / letter) if letter else 0.0
    p1 = max(0.0, 1.0 - abs(upper_ratio - 0.06) / 0.94)           # .35
    p2 = (letter / nonws) if nonws else 0.0                       # .30
    cap_ratio = (len(RE_CAP_START.findall(t)) / n_tokens
                 if n_tokens else 0.0)
    p3 = 1.0 - min(1.0, max(0.0, cap_ratio - 0.15) / 0.85)        # .25
    n_vowel = len(RE_VOWEL.findall(t))
    vowel_ratio = (n_vowel / letter) if letter else 0.0
    f1 = max(0.0, 1.0 - abs(vowel_ratio - 0.4) / 0.4)             # .05
    f2 = 1.0 - ((alnum - letter) / alnum if alnum else 0.0)       # .05
    return _ensemble3_2(p1, p2, p3, f1, f2,
                        BRIGHTNESS_W, BRIGHTNESS_W_PRIMARY,
                        BRIGHTNESS_W_ALL)


def skew_score(extracted_text: str) -> float:
    """Indentation-drift ensemble — the text analog of the skew-angle
    3+2 ensemble (skew_angle.py:59-135): per-line leading-space counts
    play the role of the projection profile. REVERSE metric: high =
    skewed. Empty/blank -> 0.0 (no skew signal).

    p1 projection-profile analog: indentation drift between the first and
    second half of the lines; p2 hough analog: indent dispersion (std);
    p3 text-line analog: fraction of lines off the mean indent; f1
    autocorrelation analog: mean lag-1 indent roughness; f2 fourier
    analog: mean indent magnitude."""
    t = extracted_text or ""
    n = len(t)
    if n == 0 or not t.strip():
        return 0.0
    lines = t.split("\n")
    k = len(lines)
    ind = [float(len(ln) - len(ln.lstrip(" "))) for ln in lines]
    imean = sum(ind) / k
    if k >= 2:
        h = k // 2
        m1 = sum(ind[:h]) / h
        m2 = sum(ind[h:]) / (k - h)
        p1 = min(1.0, abs(m2 - m1) / 8.0)
        lag = sum(abs(ind[i] - ind[i - 1]) for i in range(1, k))
        f1 = min(1.0, (lag / (k - 1)) / 4.0)
    else:
        p1 = 0.0
        f1 = 0.0
    ivar = sum((x - imean) ** 2 for x in ind) / k
    p2 = min(1.0, math.sqrt(ivar) / 4.0)
    off = 0.0
    for x in ind:
        if abs(x - imean) > 2.0:
            off += 1.0
    p3 = off / k
    f2 = min(1.0, imean / 8.0)
    return _ensemble3_2(p1, p2, p3, f1, f2,
                        SKEW_W, SKEW_W_PRIMARY, SKEW_W_ALL)


def edge_crop_score(extracted_text: str) -> float:
    """Margin/whitespace-asymmetry ensemble — the text analog of the
    edge/crop 3+2 ensemble (edge_crop_score.py:69-136). REVERSE metric:
    high = cropped. Empty/blank -> 1.0 (the reference returns value 1.0
    for an invalid image, edge_crop_score.py:155).

    p1 contour-bbox analog: content area ratio + margin check (1-area
    when area<0.7 or a margin>0.05, else 0 — edge_crop_score.py:73-87);
    p2 projection-profile analog: binary margin detection (:88-101);
    p3 hough-lines analog: >=2 strong (>=30 char) lines = good (:102-116);
    f1 aspect-ratio analog: mean line width / 80 vs 8.5x11 (:117-125);
    f2 area-ratio analog: non-whitespace share < 0.7 (:126-132)."""
    t = extracted_text or ""
    n = len(t)
    if n == 0 or not t.strip():
        return 1.0
    area_ratio = len(t.strip()) / n
    lead = (n - len(t.lstrip())) / n
    trail = (n - len(t.rstrip())) / n
    bad_margin = lead > 0.05 or trail > 0.05
    p1 = (1.0 - area_ratio) if (area_ratio < 0.7 or bad_margin) else 0.0
    p2 = 1.0 if bad_margin else 0.0
    lines = t.split("\n")
    k = len(lines)
    strong = 0
    lens_sum = 0.0
    for ln in lines:
        ll = len(ln)
        lens_sum += float(ll)
        if ll >= 30:
            strong += 1
    p3 = 0.0 if strong >= 2 else 1.0
    lmean = lens_sum / k
    f1 = min(1.0, abs(lmean / 80.0 - 8.5 / 11.0) / 0.5)
    ws = len(RE_WS.findall(t))
    f2 = 1.0 if ((n - ws) / n) < 0.7 else 0.0
    return _ensemble3_2(p1, p2, p3, f1, f2, EDGE_CROP_W,
                        EDGE_CROP_W_PRIMARY, EDGE_CROP_W_ALL)


def shadow_glare_score(extracted_text: str) -> float:
    """Dense/sparse-run ensemble — the text analog of the shadow/glare
    3+2 ensemble (shadow_glare_score.py:69-118). REVERSE metric: high =
    bad. Empty/blank -> 1.0 (invalid-image convention, :137).

    p1 global-shadow analog: share of chars in wall-of-text runs
    (>=40 non-ws chars) against the 0.08 shadow threshold (:73-79);
    p2 local-brightness-variance analog: line-length ripple /40 (:80-91);
    p3 glare-area analog: share of chars in >=8-space runs against the
    0.06 glare threshold (:92-98); f1 entropy analog: distinct-char
    deficit (:99-106); f2 histogram-tail analog: max of the two raw
    tail fractions (:107-114)."""
    t = extracted_text or ""
    n = len(t)
    if n == 0 or not t.strip():
        return 1.0
    shadow_frac = sum(len(m) for m in RE_SHADOW_RUN.findall(t)) / n
    glare_frac = sum(len(m) for m in RE_GLARE_RUN.findall(t)) / n
    p1 = min(1.0, shadow_frac / 0.08)
    lines = t.split("\n")
    k = len(lines)
    lens = [float(len(ln)) for ln in lines]
    lmean = sum(lens) / k
    lvar = sum((x - lmean) ** 2 for x in lens) / k
    p2 = min(1.0, math.sqrt(lvar) / 40.0)
    p3 = min(1.0, glare_frac / 0.06)
    f1 = 1.0 - min(1.0, len(set(t)) / 64.0)
    f2 = max(shadow_frac, glare_frac)
    return _ensemble3_2(p1, p2, p3, f1, f2, SHADOW_GLARE_W,
                        SHADOW_GLARE_W_PRIMARY, SHADOW_GLARE_W_ALL)


# standard line widths (the text analog of resolution.py:118's standard
# DPI list vs 8.27x11.69in page dims): classic terminal/print widths
RESOLUTION_WIDTHS = (40.0, 66.0, 80.0, 100.0, 132.0)


def resolution_score(extracted_text: str) -> float:
    """Line-width-adequacy ensemble — the text analog of the resolution
    3+2 ensemble (resolution.py:102-135): chars-per-line plays the role
    of pixel dimensions. High = adequate. Empty/blank -> 0.0.

    p1 dimension analog: mean line width vs the 66-char standard page
    line (:107-110); p2 feature-density analog: min(1, 0.6+density) with
    alnum share as density (:111-115); p3 dpi-snap analog: 0.9 when the
    width is within 8 chars of a standard width, else 0.7 (:116-122);
    f1/f2: the reference's constant-confidence metadata (0.6) and
    comparative (0.5) stubs (:123-130)."""
    t = extracted_text or ""
    n = len(t)
    if n == 0 or not t.strip():
        return 0.0
    lines = t.split("\n")
    k = len(lines)
    lens_sum = 0.0
    for ln in lines:
        lens_sum += float(len(ln))
    lmean = lens_sum / k
    p1 = min(1.0, lmean / 66.0)
    alnum = len(RE_ALNUM.findall(t))
    p2 = min(1.0, 0.6 + alnum / n)
    mind = min(abs(lmean - w) for w in RESOLUTION_WIDTHS)
    p3 = 0.9 if mind < 8.0 else 0.7
    return _ensemble3_2(p1, p2, p3, 0.6, 0.5, RESOLUTION_W,
                        RESOLUTION_W_PRIMARY, RESOLUTION_W_ALL)


def confidence_score(q_legibility: float, q_completeness: float,
                     q_skew: float, q_noise: float, q_contrast: float,
                     q_brightness: float) -> float:
    """Weighted mean of normalized metrics, reverse metrics flipped
    (quality_config.py:39-74 calculate_confidence_from_metrics), over the
    reference's FULL 12-point scheme incl. skew. A LOW critical metric
    short-circuits to the flat 0.55 return — the reference RETURNS
    confidence_cats['medium']-0.01 / 0.55 outright (quality_config.py:
    57-62), it does not min() it. Critical set: legibility<-blur,
    skew, noise (quality_config.py:43-46 lists blur/sharpness/skew/noise;
    the sharpness->completeness analog is weight-parity only and is
    deliberately NOT critical here — completeness 'low' on entity-free
    text is a property of the content, not of scan quality, and flattening
    every such turn to 0.55 would erase the verdict distribution the
    reference exhibits on scanned documents). Operation order mirrored in
    SQL (functions/verdict.py, functions/quality_sql.py) — bit-identical
    doubles."""
    if (q_legibility < CRITICAL_LOW or (1.0 - q_skew) < CRITICAL_LOW
            or (1.0 - q_noise) < CRITICAL_LOW):
        return CRITICAL_CAP
    return (q_legibility * 3.0 + q_completeness * 3.0
            + (1.0 - q_skew) * 2.0 + (1.0 - q_noise) * 2.0
            + q_contrast * 1.0 + q_brightness * 1.0) / CONFIDENCE_W_TOTAL


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


# per-metric category thresholds (>= excellent / good / medium, else low)
# — quality_config.yaml:1-66 threshold-table analog; the reverse metric
# (noise) is categorized on its normalized value 1-q_noise, mirroring
# get_metric_category(reverse=True) (quality_config.py:17-27).
METRIC_THRESHOLDS: dict[str, tuple[float, float, float]] = {
    "legibility": (0.95, 0.80, CRITICAL_LOW),
    "completeness": (0.80, 0.60, 0.20),
    "skew": (0.95, 0.80, CRITICAL_LOW),
    "noise": (0.95, 0.80, CRITICAL_LOW),
    "contrast": (0.90, 0.70, 0.40),
    "brightness": (0.90, 0.70, 0.40),
    "edge_crop": (0.95, 0.80, 0.40),
    "shadow_glare": (0.95, 0.80, 0.40),
    "resolution": (0.90, 0.70, 0.40),
}

# per-metric/per-category advice (quality_config.yaml:67-127 analog,
# text-domain wording; 'excellent' gets none — same as the yaml)
RECOMMENDATION_TEXT: dict[str, dict[str, str]] = {
    "legibility": {
        "good": "Text is nearly clean. Light normalization may help.",
        "medium": "Strip control characters and re-tokenize long runs.",
        "low": "Re-extract the source; the text layer is unreadable.",
    },
    "completeness": {
        "good": "Most expected fields present. Check optional fields.",
        "medium": "Several expected fields missing; review extraction rules.",
        "low": "Key fields absent; route to manual entity review.",
    },
    "noise": {
        "good": "Minor symbol noise. Conservative cleanup possible.",
        "medium": "Apply encoding repair and symbol-run filtering.",
        "low": "Heavy mojibake/noise; re-decode from the original bytes.",
    },
    "contrast": {
        "good": "Line structure is nearly regular. Minor reflow possible.",
        "medium": "Reflow lines to even lengths before layout parsing.",
        "low": "Degenerate line structure; re-run layout extraction.",
    },
    "brightness": {
        "good": "Casing is near-balanced. Minor recasing possible.",
        "medium": "Normalize casing before classification.",
        "low": "Casing is degenerate (all-caps/no-caps); apply truecasing.",
    },
    "skew": {
        "good": "Indentation is nearly uniform. Light reflow may help.",
        "medium": "Normalize leading whitespace before layout parsing.",
        "low": "Indentation drifts badly; re-run layout extraction.",
    },
    "edge_crop": {
        "good": "Margins are nearly clean. Light trimming may help.",
        "medium": "Trim leading/trailing whitespace blocks.",
        "low": "Content margins are broken; re-extract the source region.",
    },
    "shadow_glare": {
        "good": "Minor dense or sparse runs. Conservative reflow possible.",
        "medium": "Break up wall-of-text runs and collapse space runs.",
        "low": "Severe dense/sparse regions; re-extract with layout hints.",
    },
    "resolution": {
        "good": "Line width is near standard. Minor rewrap possible.",
        "medium": "Rewrap lines toward a standard width before parsing.",
        "low": "Degenerate line width; re-extract with layout analysis.",
    },
}

# the blank hard-blocker recommendation (quality_config.py:112-115,
# reworded for the text domain)
BLANK_RECOMMENDATION = ("Quality issue detected: blank content. This "
                        "cannot be fixed by pre-processing. Please "
                        "re-extract or re-upload the source.")

# reference weights-dict order (quality_config.py:45-53), then the three
# reported-only metrics in their metrics-module order
_METRIC_ORDER = ("legibility", "completeness", "skew", "noise", "contrast",
                 "brightness", "edge_crop", "shadow_glare", "resolution")


def metric_category(name: str, value: float) -> str:
    """excellent/good/medium/low per the threshold table; reverse metrics
    are categorized on 1-value (quality_config.py:17-27)."""
    v = 1.0 - value if name in REVERSE_METRICS else value
    exc, good, med = METRIC_THRESHOLDS[name]
    if v >= exc:
        return "excellent"
    if v >= good:
        return "good"
    if v >= med:
        return "medium"
    return "low"


def recommendations_for(q_blank: float, q_legibility: float,
                        q_completeness: float, q_skew: float,
                        q_noise: float, q_contrast: float,
                        q_brightness: float, q_edge_crop: float,
                        q_shadow_glare: float,
                        q_resolution: float) -> list[str]:
    """Per-metric advice strings (generate_recommendations,
    quality_config.py:96-103: '{Metric}: {advice}' per non-excellent
    category), with the blank hard blocker short-circuiting to the single
    re-scan line (quality_config.py:109-116)."""
    if q_blank >= BLANK_LOW:
        return [BLANK_RECOMMENDATION]
    vals = {"legibility": q_legibility, "completeness": q_completeness,
            "skew": q_skew, "noise": q_noise, "contrast": q_contrast,
            "brightness": q_brightness, "edge_crop": q_edge_crop,
            "shadow_glare": q_shadow_glare, "resolution": q_resolution}
    recs = []
    for m in _METRIC_ORDER:
        cat = metric_category(m, vals[m])
        text = RECOMMENDATION_TEXT[m].get(cat)
        if text is not None:
            recs.append(f"{m.replace('_', ' ').capitalize()}: {text}")
    return recs


def score_turn(raw_text: str, extracted_text: str,
               q_completeness: float) -> QualityScores:
    """Full per-turn quality record (the A11 partial stage).

    On the blank hard block, confidence is ZEROED alongside the 're-scan'
    verdict — the reference's verdict_for_page returns (re-scan, 0.0)
    (quality_config.py:109-121)."""
    qb = blank_score(raw_text or "")
    ql = legibility_score(extracted_text or "")
    qsk = skew_score(extracted_text or "")
    qn = noise_score(extracted_text or "")
    qc = contrast_score(extracted_text or "")
    qbr = brightness_score(extracted_text or "")
    qec = edge_crop_score(extracted_text or "")
    qsg = shadow_glare_score(extracted_text or "")
    qre = resolution_score(extracted_text or "")
    conf = confidence_score(ql, q_completeness, qsk, qn, qc, qbr)
    verdict = verdict_for(qb, conf)
    if qb >= BLANK_LOW:
        conf = 0.0
    return QualityScores(qb, ql, q_completeness, qsk, qn, qc, qbr,
                         qec, qsg, qre, conf, verdict)
