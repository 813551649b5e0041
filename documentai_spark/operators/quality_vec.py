"""Vectorized (pandas/NumPy) implementation of the quality ensembles.

Same math as ``documentai_spark.core.quality`` — the scalar module is the
*spec*, this module is the Arrow-batch *implementation*; expressions are
copied operator-for-operator so IEEE-double results are bit-identical
(pinned by tests/test_quality_vec.py across the whole fixture domain).

Why both exist: the scalar oracle runs per-char Python (readable, slow);
at 10^12 turns the UDF must run C-speed per batch. pandas ``str.count``
uses the same compiled ``re`` patterns as the oracle, and the ensemble
arithmetic is NumPy elementwise — one pass per method over the batch
(the CIDR'22 vectorized-UDF pattern, PAPERS.md).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from documentai_spark.core.entities import EXPECTED_FIELDS, _PATTERNS
from documentai_spark.core.quality import (
    BLANK_W, BLANK_W_ALL, BLANK_W_PRIMARY, CONSISTENCY_THRESHOLD,
    LEGIBILITY_W, LEGIBILITY_W_ALL, LEGIBILITY_W_PRIMARY, RE_ALNUM,
    RE_CONTROL, RE_LETTER, RE_LONG_TOKEN, RE_NONWS, RE_VOWEL, RE_WS,
)


def _ensemble3_2_np(p1, p2, p3, f1, f2, weights, w_primary, w_all):
    """NumPy mirror of core.quality._ensemble3_2 (same operation order)."""
    mean = (p1 + p2 + p3) / 3.0
    var = ((p1 - mean) ** 2 + (p2 - mean) ** 2 + (p3 - mean) ** 2) / 3.0
    with np.errstate(divide="ignore", invalid="ignore"):
        consistency = np.where(mean > 1e-12, 1.0 - (np.sqrt(var) / mean), 0.0)
    w1, w2, w3, w4, w5 = weights
    primary = (p1 * w1 + p2 * w2 + p3 * w3) / w_primary
    full = (p1 * w1 + p2 * w2 + p3 * w3 + f1 * w4 + f2 * w5) / w_all
    return np.where(consistency >= CONSISTENCY_THRESHOLD, primary, full)


def blank_scores(raw: pd.Series) -> np.ndarray:
    """Vector of core.quality.blank_score over a batch."""
    t = raw.fillna("")
    n = t.str.len().to_numpy(dtype=np.float64)
    stripped = t.str.strip()
    ns = stripped.str.len().to_numpy(dtype=np.float64)
    ws = t.str.count(RE_WS).to_numpy(dtype=np.float64)
    n_tokens = RE_NONWS_RUNS_count(t)
    # len(set(stripped)) has no pandas primitive; C-level set() per row is
    # cheap relative to the regex passes
    distinct = np.fromiter((len(set(s)) for s in stripped),
                           dtype=np.float64, count=len(stripped))
    with np.errstate(divide="ignore", invalid="ignore"):
        ws_ratio = np.where(n > 0, ws / n, 0.0)
    blob = 1.0 - np.minimum(1.0, n_tokens / 5.0)
    length = 1.0 - np.minimum(1.0, ns / 100.0)
    ocr_stub = np.ones_like(n)
    edge = 1.0 - np.minimum(1.0, distinct / 20.0)
    score = _ensemble3_2_np(ws_ratio, blob, length, ocr_stub, edge,
                            BLANK_W, BLANK_W_PRIMARY, BLANK_W_ALL)
    return np.where((n == 0) | (ns == 0), 1.0, score)


_RE_TOKEN_RUN = r"\S+"


def RE_NONWS_RUNS_count(t: pd.Series) -> np.ndarray:
    """len(text.split()) == count of non-whitespace runs."""
    return t.str.count(_RE_TOKEN_RUN).to_numpy(dtype=np.float64)


def legibility_scores(extracted: pd.Series) -> np.ndarray:
    """Vector of core.quality.legibility_score over a batch."""
    t = extracted.fillna("")
    n = t.str.len().to_numpy(dtype=np.float64)
    ns = t.str.strip().str.len().to_numpy(dtype=np.float64)
    n_control = t.str.count(RE_CONTROL).to_numpy(dtype=np.float64)
    n_nonws = t.str.count(RE_NONWS).to_numpy(dtype=np.float64)
    n_alnum = t.str.count(RE_ALNUM).to_numpy(dtype=np.float64)
    n_tokens = RE_NONWS_RUNS_count(t)
    n_vowel = t.str.count(RE_VOWEL).to_numpy(dtype=np.float64)
    n_letter = t.str.count(RE_LETTER).to_numpy(dtype=np.float64)
    n_long = t.str.count(RE_LONG_TOKEN).to_numpy(dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        printable_ratio = np.where(n > 0, 1.0 - n_control / n, 0.0)
        alnum_ratio = np.where(n_nonws > 0, n_alnum / n_nonws, 0.0)
        avg_wl = np.where(n_tokens > 0, n_nonws / n_tokens, 0.0)
        vowel_ratio = np.where(n_letter > 0, n_vowel / n_letter, 0.0)
        sane = np.where(n_tokens > 0, (n_tokens - n_long) / n_tokens, 0.0)
    word_shape = np.maximum(0.0, 1.0 - np.abs(avg_wl - 5.0) / 10.0)
    vowel_score = np.maximum(0.0, 1.0 - np.abs(vowel_ratio - 0.4) / 0.4)
    score = _ensemble3_2_np(printable_ratio, alnum_ratio, word_shape,
                            vowel_score, sane, LEGIBILITY_W,
                            LEGIBILITY_W_PRIMARY, LEGIBILITY_W_ALL)
    return np.where((n == 0) | (ns == 0), 0.0, score)


def completeness_scores(extracted: pd.Series) -> np.ndarray:
    """Vector of core.entities.completeness_from_text over a batch:
    one vectorized contains() pass per expected pattern."""
    import warnings

    t = extracted.fillna("")
    present = np.zeros(len(t), dtype=np.float64)
    with warnings.catch_warnings():
        # the entity patterns have capture groups; contains() only needs
        # the boolean match, so the "match groups" hint is noise here
        warnings.simplefilter("ignore", UserWarning)
        for f in EXPECTED_FIELDS:
            present += t.str.contains(_PATTERNS[f], regex=True) \
                        .to_numpy(dtype=np.float64)
    return present / float(len(EXPECTED_FIELDS))
