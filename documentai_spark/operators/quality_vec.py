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
    BLANK_W, BLANK_W_ALL, BLANK_W_PRIMARY, BRIGHTNESS_W, BRIGHTNESS_W_ALL,
    BRIGHTNESS_W_PRIMARY, CONSISTENCY_THRESHOLD, CONTRAST_W, CONTRAST_W_ALL,
    CONTRAST_W_PRIMARY, LEGIBILITY_W, LEGIBILITY_W_ALL, LEGIBILITY_W_PRIMARY,
    NOISE_W, NOISE_W_ALL, NOISE_W_PRIMARY,
)


# ---------------------------------------------------------------------------
# byte-LUT counting engine
#
# sre char-class scanning runs ~30 MB/s; NumPy boolean-LUT over a packed
# byte buffer runs GB/s. For ASCII rows, byte counts == char counts for
# every pinned class (all classes are ASCII sets), so results stay
# bit-identical to the scalar oracle. Non-ASCII rows (rare by contract)
# take the per-row regex path.
# ---------------------------------------------------------------------------

def _lut(chars: bytes) -> np.ndarray:
    t = np.zeros(256, dtype=bool)
    t[np.frombuffer(chars, dtype=np.uint8)] = True
    return t


# NOTE: Python re's \s is Unicode by default and inside ASCII also matches
# the separator controls \x1c-\x1f (as does str.isspace / str.split) — the
# LUT must agree byte-for-byte with the oracle's regexes.
_WS_B = _lut(b" \t\n\r\x0b\x0c\x1c\x1d\x1e\x1f")
_ALNUM_B = _lut(bytes(range(48, 58)) + bytes(range(65, 91))
                + bytes(range(97, 123)))
_CONTROL_B = _lut(bytes(range(0, 9)) + bytes(range(11, 32)) + b"\x7f")
_VOWEL_B = _lut(b"aeiouAEIOU")
_LETTER_B = _lut(bytes(range(65, 91)) + bytes(range(97, 123)))
_UPPER_B = _lut(bytes(range(65, 91)))
# ASCII subset of core.quality.RE_NOISE_MARK (the � member is non-ASCII,
# so marker-bearing non-ASCII rows take the per-row regex path anyway)
_MARKER_B = _lut(b"?#~^`|\\")
_NL_B = _lut(b"\n")


class _Counts:
    """Per-row ASCII class counts + token-run stats for a batch."""

    __slots__ = ("n", "ws", "alnum", "control", "vowel", "letter",
                 "nonws", "tokens", "long_tokens", "strip_len",
                 "upper", "markers", "cap_starts", "line_mean", "line_var")

    FIELDS = ("ws", "alnum", "control", "vowel", "letter", "tokens",
              "long_tokens", "upper", "markers", "cap_starts",
              "line_mean", "line_var")

    def __init__(self, texts: list[str], reuse=None):
        """``reuse=(other, same_mask)`` copies rows where this batch's text
        IS the other batch's text (identity extraction: plain rows incl.
        the CPU-dominant mega turns) and counts only the rest."""
        k = len(texts)
        self.n = np.fromiter((len(t) for t in texts), np.float64, k)
        for f in self.FIELDS:
            setattr(self, f, np.zeros(k, dtype=np.float64))
        if k == 0:
            self.nonws = self.ws
            self.strip_len = self.ws
            return
        todo = range(k)
        if reuse is not None:
            other, same = reuse
            for f in self.FIELDS:
                getattr(self, f)[same] = getattr(other, f)[same]
            todo = np.nonzero(~same)[0]
        ascii_idx = [i for i in todo if texts[i].isascii()]
        rest = [i for i in todo if not texts[i].isascii()]
        if ascii_idx:
            self._bulk_ascii([texts[i] for i in ascii_idx],
                             np.asarray(ascii_idx))
        if rest:
            self._per_row_regex([texts[i] for i in rest], np.asarray(rest))
        self.nonws = self.n - self.ws
        if reuse is not None:
            self.strip_len = other.strip_len.copy()
            if len(todo):
                self.strip_len[todo] = [len(texts[i].strip()) for i in todo]
        else:
            self.strip_len = np.fromiter(
                (len(t.strip()) for t in texts), np.float64, k)

    def _bulk_ascii(self, texts: list[str], out_idx: np.ndarray) -> None:
        """One packed buffer; '\\n' separators keep token runs row-local.

        Per-class counts = bincount(row_ids[class_mask]): a 256-bool LUT
        gather + boolean compress + small bincount per class. No cumsum,
        no integer arithmetic over the buffer — those generic ufunc loops
        measured ~10 MB/s on this NumPy build, while LUT-gather + compress
        + bincount run near memory bandwidth (~35x faster end-to-end than
        the per-class sre str.count formulation this replaces).
        """
        k = len(texts)
        buf = ("\n".join(texts) + "\n").encode("ascii")
        arr = np.frombuffer(buf, dtype=np.uint8)
        lens = np.fromiter((len(t) for t in texts), np.int64, k)
        # row id per byte position (each row owns its trailing separator)
        row_ids = np.repeat(np.arange(k, dtype=np.int64), lens + 1)

        def count(lut: np.ndarray) -> np.ndarray:
            return np.bincount(row_ids[lut[arr]],
                               minlength=k).astype(np.float64)

        # every row's separator contributes exactly one '\n' to ws
        self.ws[out_idx] = count(_WS_B) - 1.0
        self.alnum[out_idx] = count(_ALNUM_B)
        self.control[out_idx] = count(_CONTROL_B)
        self.vowel[out_idx] = count(_VOWEL_B)
        self.letter[out_idx] = count(_LETTER_B)
        self.upper[out_idx] = count(_UPPER_B)
        self.markers[out_idx] = count(_MARKER_B)
        # line stats: every '\n' (incl. each row's trailing separator)
        # terminates exactly one line, and the terminator's row_id is the
        # line's row — so global segments-between-\n == all rows' lines in
        # order, matching t.split("\n") (k lines = internal \n + 1).
        # Two bincount passes reproduce the scalar's
        # sum(lens)/k then sum((x-mean)^2)/k left-to-right adds exactly.
        nl_pos = np.nonzero(_NL_B[arr])[0]  # LUT gather, not elementwise ==
        line_lens = np.diff(nl_pos, prepend=-1).astype(np.float64) - 1.0
        line_rows = row_ids[nl_pos]
        line_k = np.bincount(line_rows, minlength=k).astype(np.float64)
        line_sum = np.bincount(line_rows, weights=line_lens, minlength=k)
        mean = np.divide(line_sum, line_k,
                         out=np.zeros(k), where=line_k > 0)
        dev2 = (line_lens - mean[line_rows]) ** 2
        var = np.divide(np.bincount(line_rows, weights=dev2, minlength=k),
                        line_k, out=np.zeros(k), where=line_k > 0)
        self.line_mean[out_idx] = mean
        self.line_var[out_idx] = var
        # token runs: starts of maximal non-ws runs (separators are ws, so
        # runs never bridge rows)
        nonws_mask = ~_WS_B[arr]
        run_start = nonws_mask.copy()
        run_start[1:] &= ~nonws_mask[:-1]
        self.tokens[out_idx] = np.bincount(
            row_ids[run_start], minlength=k).astype(np.float64)
        # long-token runs (>= 21 chars) via run start/end index pairing
        run_end = nonws_mask.copy()
        run_end[:-1] &= ~nonws_mask[1:]
        s_idx = np.nonzero(run_start)[0]
        e_idx = np.nonzero(run_end)[0]
        long_s = s_idx[(e_idx - s_idx + 1) >= 21]
        if len(long_s):
            self.long_tokens[out_idx] += np.bincount(
                row_ids[long_s], minlength=k).astype(np.float64)
        # token-initial capitals (RE_CAP_START): first byte of each token
        # run through the uppercase LUT
        cap_s = s_idx[_UPPER_B[arr[s_idx]]]
        self.cap_starts[out_idx] = np.bincount(
            row_ids[cap_s], minlength=k).astype(np.float64)

    def _per_row_regex(self, texts: list[str], out_idx: np.ndarray) -> None:
        """Fallback for non-ASCII rows: the oracle's own regexes."""
        from documentai_spark.core.quality import (
            RE_ALNUM, RE_CAP_START, RE_CONTROL, RE_LETTER, RE_LONG_TOKEN,
            RE_NOISE_MARK, RE_UPPER, RE_VOWEL, RE_WS,
        )
        k = len(texts)
        for attr, pat in (("ws", RE_WS), ("alnum", RE_ALNUM),
                          ("control", RE_CONTROL), ("vowel", RE_VOWEL),
                          ("letter", RE_LETTER),
                          ("long_tokens", RE_LONG_TOKEN),
                          ("upper", RE_UPPER), ("markers", RE_NOISE_MARK),
                          ("cap_starts", RE_CAP_START)):
            getattr(self, attr)[out_idx] = np.fromiter(
                (len(pat.findall(t)) for t in texts), np.float64, k)
        self.tokens[out_idx] = np.fromiter(
            (len(t.split()) for t in texts), np.float64, k)
        # line stats, the scalar way (t.split("\n") incl. empties)
        means = np.zeros(k)
        varis = np.zeros(k)
        for i, t in enumerate(texts):
            lens = [float(len(ln)) for ln in t.split("\n")]
            kl = len(lens)
            m = sum(lens) / kl
            means[i] = m
            varis[i] = sum((x - m) ** 2 for x in lens) / kl
        self.line_mean[out_idx] = means
        self.line_var[out_idx] = varis


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


def blank_scores(raw: pd.Series, counts: _Counts | None = None) -> np.ndarray:
    """Vector of core.quality.blank_score over a batch."""
    texts = raw.fillna("").tolist()
    c = counts if counts is not None else _Counts(texts)
    # len(set(stripped)): only consumed by the fallback branch; C-level
    # set() per row is cheap next to the (now byte-LUT) class counts
    distinct = np.fromiter((len(set(t.strip())) for t in texts),
                           dtype=np.float64, count=len(texts))
    with np.errstate(divide="ignore", invalid="ignore"):
        ws_ratio = np.where(c.n > 0, c.ws / c.n, 0.0)
    blob = 1.0 - np.minimum(1.0, c.tokens / 5.0)
    length = 1.0 - np.minimum(1.0, c.strip_len / 100.0)
    ocr_stub = np.ones_like(c.n)
    edge = 1.0 - np.minimum(1.0, distinct / 20.0)
    score = _ensemble3_2_np(ws_ratio, blob, length, ocr_stub, edge,
                            BLANK_W, BLANK_W_PRIMARY, BLANK_W_ALL)
    return np.where((c.n == 0) | (c.strip_len == 0), 1.0, score)


def legibility_scores(extracted: pd.Series,
                      counts: _Counts | None = None) -> np.ndarray:
    """Vector of core.quality.legibility_score over a batch."""
    c = counts if counts is not None else _Counts(extracted.fillna("").tolist())
    with np.errstate(divide="ignore", invalid="ignore"):
        printable_ratio = np.where(c.n > 0, 1.0 - c.control / c.n, 0.0)
        alnum_ratio = np.where(c.nonws > 0, c.alnum / c.nonws, 0.0)
        avg_wl = np.where(c.tokens > 0, c.nonws / c.tokens, 0.0)
        vowel_ratio = np.where(c.letter > 0, c.vowel / c.letter, 0.0)
        sane = np.where(c.tokens > 0,
                        (c.tokens - c.long_tokens) / c.tokens, 0.0)
    word_shape = np.maximum(0.0, 1.0 - np.abs(avg_wl - 5.0) / 10.0)
    vowel_score = np.maximum(0.0, 1.0 - np.abs(vowel_ratio - 0.4) / 0.4)
    score = _ensemble3_2_np(printable_ratio, alnum_ratio, word_shape,
                            vowel_score, sane, LEGIBILITY_W,
                            LEGIBILITY_W_PRIMARY, LEGIBILITY_W_ALL)
    return np.where((c.n == 0) | (c.strip_len == 0), 0.0, score)


def noise_scores(extracted: pd.Series,
                 counts: _Counts | None = None) -> np.ndarray:
    """Vector of core.quality.noise_score (reverse metric: high = noisy)."""
    c = counts if counts is not None else _Counts(extracted.fillna("").tolist())
    with np.errstate(divide="ignore", invalid="ignore"):
        p1 = np.where(c.nonws > 0, (c.nonws - c.alnum) / c.nonws, 0.0)
        p2 = np.where(c.n > 0, c.control / c.n, 0.0)
        p3 = np.where(c.n > 0, c.markers / c.n, 0.0)
        f1 = np.where(c.tokens > 0, c.long_tokens / c.tokens, 0.0)
        f2 = np.where(c.n > 0, np.abs(c.ws / c.n - 0.16) / 0.84, 0.0)
    score = _ensemble3_2_np(p1, p2, p3, f1, f2,
                            NOISE_W, NOISE_W_PRIMARY, NOISE_W_ALL)
    return np.where((c.n == 0) | (c.strip_len == 0), 0.0, score)


def contrast_scores(extracted: pd.Series,
                    counts: _Counts | None = None) -> np.ndarray:
    """Vector of core.quality.contrast_score (line-length-variance
    ensemble)."""
    texts = extracted.fillna("").tolist()
    c = counts if counts is not None else _Counts(texts)
    distinct = np.fromiter((len(set(t)) for t in texts),
                           dtype=np.float64, count=len(texts))
    with np.errstate(divide="ignore", invalid="ignore"):
        cv = np.where(c.line_mean > 0,
                      np.sqrt(c.line_var) / c.line_mean, 1.0)
        f1 = np.where(c.nonws > 0, c.alnum / c.nonws, 0.0)
        f2 = np.where(c.tokens > 0,
                      (c.tokens - c.long_tokens) / c.tokens, 0.0)
    p1 = 1.0 - np.minimum(1.0, cv)
    p2 = 1.0 - np.minimum(1.0, np.abs(c.line_mean - 60.0) / 60.0)
    p3 = np.minimum(1.0, distinct / 40.0)
    score = _ensemble3_2_np(p1, p2, p3, f1, f2,
                            CONTRAST_W, CONTRAST_W_PRIMARY, CONTRAST_W_ALL)
    return np.where((c.n == 0) | (c.strip_len == 0), 0.0, score)


def brightness_scores(extracted: pd.Series,
                      counts: _Counts | None = None) -> np.ndarray:
    """Vector of core.quality.brightness_score (casing-balance ensemble)."""
    c = counts if counts is not None else _Counts(extracted.fillna("").tolist())
    with np.errstate(divide="ignore", invalid="ignore"):
        upper_ratio = np.where(c.letter > 0, c.upper / c.letter, 0.0)
        p2 = np.where(c.nonws > 0, c.letter / c.nonws, 0.0)
        cap_ratio = np.where(c.tokens > 0, c.cap_starts / c.tokens, 0.0)
        vowel_ratio = np.where(c.letter > 0, c.vowel / c.letter, 0.0)
        f2 = 1.0 - np.where(c.alnum > 0,
                            (c.alnum - c.letter) / c.alnum, 0.0)
    p1 = np.maximum(0.0, 1.0 - np.abs(upper_ratio - 0.06) / 0.94)
    p3 = 1.0 - np.minimum(1.0, np.maximum(0.0, cap_ratio - 0.15) / 0.85)
    f1 = np.maximum(0.0, 1.0 - np.abs(vowel_ratio - 0.4) / 0.4)
    score = _ensemble3_2_np(p1, p2, p3, f1, f2,
                            BRIGHTNESS_W, BRIGHTNESS_W_PRIMARY,
                            BRIGHTNESS_W_ALL)
    return np.where((c.n == 0) | (c.strip_len == 0), 0.0, score)


def completeness_scores(extracted: pd.Series,
                        counts: _Counts | None = None) -> np.ndarray:
    """Vector of core.entities.completeness_from_text over a batch:
    one contains() pass per expected pattern, with SOUND pre-gates that
    skip patterns which cannot match — date_numeric / currency_amount
    literally require a digit (digit count = alnum - letter, already in
    _Counts) and email requires '@' (memchr-fast literal check). The
    gates never change results; they only skip impossible scans (the
    digit-free mega turns would otherwise pay 5 full sre passes each).
    """
    import warnings

    t = extracted.fillna("")
    k = len(t)
    present = np.zeros(k, dtype=np.float64)
    if counts is not None:
        has_digit = (counts.alnum - counts.letter) > 0
    else:
        has_digit = t.str.contains(r"\d", regex=True) \
                     .to_numpy(dtype=bool)
    has_at = t.str.contains("@", regex=False).to_numpy(dtype=bool)
    gates = {"date_numeric": has_digit, "currency_amount": has_digit,
             "email": has_at}
    with warnings.catch_warnings():
        # the entity patterns have capture groups; contains() only needs
        # the boolean match, so the "match groups" hint is noise here
        warnings.simplefilter("ignore", UserWarning)
        for f in EXPECTED_FIELDS:
            gate = gates.get(f)
            if gate is None:
                present += t.str.contains(_PATTERNS[f], regex=True) \
                            .to_numpy(dtype=np.float64)
            elif gate.any():
                sub = t[gate].str.contains(_PATTERNS[f], regex=True) \
                       .to_numpy(dtype=np.float64)
                present[gate] += sub
    return present / float(len(EXPECTED_FIELDS))


def fused_quality(raw: pd.Series, ext_texts: list[str]):
    """All six metrics with count reuse: rows whose extraction is the
    identity (extracted IS raw — plain rows, incl. the CPU-dominant mega
    turns) share one _Counts pass between blank and the extracted-side
    metrics. Returns (blank, legibility, completeness, noise, contrast,
    brightness) arrays."""
    raw_texts = raw.fillna("").tolist()
    c_raw = _Counts(raw_texts)
    same = np.fromiter(
        (a is b for a, b in zip(raw_texts, ext_texts)),
        dtype=bool, count=len(ext_texts))
    ext_series = pd.Series(ext_texts, dtype=object)
    c_ext = _Counts(ext_texts, reuse=(c_raw, same))
    return (blank_scores(raw, counts=c_raw),
            legibility_scores(ext_series, counts=c_ext),
            completeness_scores(ext_series, counts=c_ext),
            noise_scores(ext_series, counts=c_ext),
            contrast_scores(ext_series, counts=c_ext),
            brightness_scores(ext_series, counts=c_ext))
