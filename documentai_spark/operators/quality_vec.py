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
    CONTRAST_W_PRIMARY, EDGE_CROP_W, EDGE_CROP_W_ALL, EDGE_CROP_W_PRIMARY,
    LEGIBILITY_W, LEGIBILITY_W_ALL, LEGIBILITY_W_PRIMARY,
    NOISE_W, NOISE_W_ALL, NOISE_W_PRIMARY, RESOLUTION_W, RESOLUTION_W_ALL,
    RESOLUTION_W_PRIMARY, RESOLUTION_WIDTHS, SHADOW_GLARE_W,
    SHADOW_GLARE_W_ALL, SHADOW_GLARE_W_PRIMARY, SKEW_W, SKEW_W_ALL,
    SKEW_W_PRIMARY,
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
_SPACE_B = _lut(b" ")


class _Counts:
    """Per-row ASCII class counts + token-run stats for a batch."""

    __slots__ = ("n", "ws", "alnum", "control", "vowel", "letter",
                 "nonws", "tokens", "long_tokens", "strip_len",
                 "upper", "markers", "cap_starts", "line_mean", "line_var",
                 "lines", "strong_lines", "shadow_chars", "glare_chars",
                 "ind_mean", "ind_var", "ind_drift", "ind_off", "ind_lag",
                 "lead_ws", "trail_ws")

    FIELDS = ("ws", "alnum", "control", "vowel", "letter", "tokens",
              "long_tokens", "upper", "markers", "cap_starts",
              "line_mean", "line_var", "lines", "strong_lines",
              "shadow_chars", "glare_chars", "ind_mean", "ind_var",
              "ind_drift", "ind_off", "ind_lag")

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
            self.lead_ws = self.ws
            self.trail_ws = self.ws
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
        # strip_len / lead_ws / trail_ws are per-row C-level str ops (the
        # buffer's row separators merge adjacent rows' edge whitespace, so
        # the packed machinery can't see row edges)
        if reuse is not None:
            self.strip_len = other.strip_len.copy()
            self.lead_ws = other.lead_ws.copy()
            self.trail_ws = other.trail_ws.copy()
            if len(todo):
                self.strip_len[todo] = [len(texts[i].strip()) for i in todo]
                self.lead_ws[todo] = [len(texts[i]) - len(texts[i].lstrip())
                                      for i in todo]
                self.trail_ws[todo] = [len(texts[i]) - len(texts[i].rstrip())
                                       for i in todo]
        else:
            self.strip_len = np.fromiter(
                (len(t.strip()) for t in texts), np.float64, k)
            self.lead_ws = np.fromiter(
                (len(t) - len(t.lstrip()) for t in texts), np.float64, k)
            self.trail_ws = np.fromiter(
                (len(t) - len(t.rstrip()) for t in texts), np.float64, k)

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
        line_lens_i = np.diff(nl_pos, prepend=-1) - 1
        line_lens = line_lens_i.astype(np.float64)
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
        # ---- skew / edge_crop / shadow_glare / resolution inputs ----
        self.lines[out_idx] = line_k
        self.strong_lines[out_idx] = np.bincount(
            line_rows[line_lens >= 30.0], minlength=k).astype(np.float64)
        # wall-of-text runs (>= 40 non-ws chars): reuse the token-run
        # start/end index pairing; weighted bincount keeps per-row order
        run_len = (e_idx - s_idx + 1)
        sel40 = run_len >= 40
        self.shadow_chars[out_idx] = np.bincount(
            row_ids[s_idx[sel40]], weights=run_len[sel40].astype(np.float64),
            minlength=k)
        # space runs (0x20 only — never bridge rows or lines, since both
        # separators are '\n'): glare runs + per-line leading indents
        sp_mask = _SPACE_B[arr]
        sp_start = sp_mask.copy()
        sp_start[1:] &= ~sp_mask[:-1]
        sp_end = sp_mask.copy()
        sp_end[:-1] &= ~sp_mask[1:]
        sp_s = np.nonzero(sp_start)[0]
        sp_e = np.nonzero(sp_end)[0]
        sp_len = (sp_e - sp_s + 1).astype(np.float64)
        sel8 = sp_len >= 8.0
        self.glare_chars[out_idx] = np.bincount(
            row_ids[sp_s[sel8]], weights=sp_len[sel8], minlength=k)
        # a line's indent is the space run starting exactly at its first
        # byte (the previous byte is always '\n' or buffer start, so such
        # a run can never begin earlier)
        line_starts = nl_pos - line_lens_i
        if len(sp_s):
            j = np.minimum(np.searchsorted(sp_s, line_starts),
                           len(sp_s) - 1)
            ind = np.where(sp_s[j] == line_starts, sp_len[j], 0.0)
        else:
            ind = np.zeros(len(line_starts))
        ind_sum = np.bincount(line_rows, weights=ind, minlength=k)
        imean = np.divide(ind_sum, line_k, out=np.zeros(k),
                          where=line_k > 0)
        self.ind_mean[out_idx] = imean
        dev2i = (ind - imean[line_rows]) ** 2
        self.ind_var[out_idx] = np.divide(
            np.bincount(line_rows, weights=dev2i, minlength=k), line_k,
            out=np.zeros(k), where=line_k > 0)
        off = np.abs(ind - imean[line_rows]) > 2.0
        self.ind_off[out_idx] = np.bincount(
            line_rows[off], minlength=k).astype(np.float64)
        # first-half vs second-half indent drift (h = k // 2); both half
        # sums are direct compressed bincounts so the per-row addition
        # order matches the scalar sum(ind[:h]) / sum(ind[h:]) exactly
        line_k_i = line_k.astype(np.int64)
        row_first = np.concatenate(([0], np.cumsum(line_k_i)[:-1]))
        idx_in_row = np.arange(len(ind), dtype=np.int64) \
            - row_first[line_rows]
        h = line_k_i // 2
        h_f = h.astype(np.float64)
        first = idx_in_row < h[line_rows]
        s1 = np.bincount(line_rows[first], weights=ind[first], minlength=k)
        s2 = np.bincount(line_rows[~first], weights=ind[~first],
                         minlength=k)
        m1 = np.divide(s1, h_f, out=np.zeros(k), where=h_f > 0)
        m2 = np.divide(s2, line_k - h_f, out=np.zeros(k),
                       where=(line_k - h_f) > 0)
        self.ind_drift[out_idx] = np.where(line_k >= 2.0,
                                           np.abs(m2 - m1), 0.0)
        # lag-1 indent roughness (pairs within the same row only)
        same_row = line_rows[1:] == line_rows[:-1]
        dif = np.abs(ind[1:] - ind[:-1])
        lag_sum = np.bincount(line_rows[1:][same_row],
                              weights=dif[same_row], minlength=k)
        self.ind_lag[out_idx] = np.where(
            line_k >= 2.0,
            np.divide(lag_sum, line_k - 1.0, out=np.zeros(k),
                      where=line_k > 1.0),
            0.0)

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
        from documentai_spark.core.quality import RE_GLARE_RUN, RE_SHADOW_RUN
        # line/indent/run stats, the scalar way (core formulas verbatim)
        cols = {f: np.zeros(k) for f in
                ("line_mean", "line_var", "lines", "strong_lines",
                 "shadow_chars", "glare_chars", "ind_mean", "ind_var",
                 "ind_drift", "ind_off", "ind_lag")}
        for i, t in enumerate(texts):
            lines = t.split("\n")
            kl = len(lines)
            lens = [float(len(ln)) for ln in lines]
            m = sum(lens) / kl
            cols["line_mean"][i] = m
            cols["line_var"][i] = sum((x - m) ** 2 for x in lens) / kl
            cols["lines"][i] = kl
            cols["strong_lines"][i] = sum(1 for x in lens if x >= 30.0)
            cols["shadow_chars"][i] = sum(
                len(mm) for mm in RE_SHADOW_RUN.findall(t))
            cols["glare_chars"][i] = sum(
                len(mm) for mm in RE_GLARE_RUN.findall(t))
            ind = [float(len(ln) - len(ln.lstrip(" "))) for ln in lines]
            im = sum(ind) / kl
            cols["ind_mean"][i] = im
            cols["ind_var"][i] = sum((x - im) ** 2 for x in ind) / kl
            cols["ind_off"][i] = sum(1.0 for x in ind
                                     if abs(x - im) > 2.0)
            if kl >= 2:
                h = kl // 2
                m1 = sum(ind[:h]) / h
                m2 = sum(ind[h:]) / (kl - h)
                cols["ind_drift"][i] = abs(m2 - m1)
                lag = sum(abs(ind[j] - ind[j - 1]) for j in range(1, kl))
                cols["ind_lag"][i] = lag / (kl - 1)
        for f, v in cols.items():
            getattr(self, f)[out_idx] = v


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


def skew_scores(extracted: pd.Series,
                counts: _Counts | None = None) -> np.ndarray:
    """Vector of core.quality.skew_score (indentation-drift ensemble;
    reverse metric: high = skewed)."""
    c = counts if counts is not None else _Counts(extracted.fillna("").tolist())
    with np.errstate(divide="ignore", invalid="ignore"):
        p3 = np.divide(c.ind_off, c.lines, out=np.zeros(len(c.n)),
                       where=c.lines > 0)
    p1 = np.minimum(1.0, c.ind_drift / 8.0)
    p2 = np.minimum(1.0, np.sqrt(c.ind_var) / 4.0)
    f1 = np.minimum(1.0, c.ind_lag / 4.0)
    f2 = np.minimum(1.0, c.ind_mean / 8.0)
    score = _ensemble3_2_np(p1, p2, p3, f1, f2,
                            SKEW_W, SKEW_W_PRIMARY, SKEW_W_ALL)
    return np.where((c.n == 0) | (c.strip_len == 0), 0.0, score)


def edge_crop_scores(extracted: pd.Series,
                     counts: _Counts | None = None) -> np.ndarray:
    """Vector of core.quality.edge_crop_score (margin-asymmetry
    ensemble; reverse metric: high = cropped; empty -> 1.0)."""
    c = counts if counts is not None else _Counts(extracted.fillna("").tolist())
    with np.errstate(divide="ignore", invalid="ignore"):
        area_ratio = np.where(c.n > 0, c.strip_len / c.n, 0.0)
        lead = np.where(c.n > 0, c.lead_ws / c.n, 0.0)
        trail = np.where(c.n > 0, c.trail_ws / c.n, 0.0)
        nonwhite = np.where(c.n > 0, c.nonws / c.n, 0.0)
    bad_margin = (lead > 0.05) | (trail > 0.05)
    p1 = np.where((area_ratio < 0.7) | bad_margin, 1.0 - area_ratio, 0.0)
    p2 = np.where(bad_margin, 1.0, 0.0)
    p3 = np.where(c.strong_lines >= 2.0, 0.0, 1.0)
    f1 = np.minimum(1.0, np.abs(c.line_mean / 80.0 - 8.5 / 11.0) / 0.5)
    f2 = np.where(nonwhite < 0.7, 1.0, 0.0)
    score = _ensemble3_2_np(p1, p2, p3, f1, f2, EDGE_CROP_W,
                            EDGE_CROP_W_PRIMARY, EDGE_CROP_W_ALL)
    return np.where((c.n == 0) | (c.strip_len == 0), 1.0, score)


def shadow_glare_scores(extracted: pd.Series,
                        counts: _Counts | None = None) -> np.ndarray:
    """Vector of core.quality.shadow_glare_score (dense/sparse-run
    ensemble; reverse metric: high = bad; empty -> 1.0)."""
    texts = extracted.fillna("").tolist()
    c = counts if counts is not None else _Counts(texts)
    distinct = np.fromiter((len(set(t)) for t in texts),
                           dtype=np.float64, count=len(texts))
    with np.errstate(divide="ignore", invalid="ignore"):
        shadow_frac = np.where(c.n > 0, c.shadow_chars / c.n, 0.0)
        glare_frac = np.where(c.n > 0, c.glare_chars / c.n, 0.0)
    p1 = np.minimum(1.0, shadow_frac / 0.08)
    p2 = np.minimum(1.0, np.sqrt(c.line_var) / 40.0)
    p3 = np.minimum(1.0, glare_frac / 0.06)
    f1 = 1.0 - np.minimum(1.0, distinct / 64.0)
    f2 = np.maximum(shadow_frac, glare_frac)
    score = _ensemble3_2_np(p1, p2, p3, f1, f2, SHADOW_GLARE_W,
                            SHADOW_GLARE_W_PRIMARY, SHADOW_GLARE_W_ALL)
    return np.where((c.n == 0) | (c.strip_len == 0), 1.0, score)


def resolution_scores(extracted: pd.Series,
                      counts: _Counts | None = None) -> np.ndarray:
    """Vector of core.quality.resolution_score (line-width-adequacy
    ensemble; high = adequate)."""
    c = counts if counts is not None else _Counts(extracted.fillna("").tolist())
    with np.errstate(divide="ignore", invalid="ignore"):
        density = np.where(c.n > 0, c.alnum / c.n, 0.0)
    p1 = np.minimum(1.0, c.line_mean / 66.0)
    p2 = np.minimum(1.0, 0.6 + density)
    mind = np.abs(c.line_mean - RESOLUTION_WIDTHS[0])
    for w in RESOLUTION_WIDTHS[1:]:
        mind = np.minimum(mind, np.abs(c.line_mean - w))
    p3 = np.where(mind < 8.0, 0.9, 0.7)
    ones = np.ones_like(c.n)
    score = _ensemble3_2_np(p1, p2, p3, 0.6 * ones, 0.5 * ones,
                            RESOLUTION_W, RESOLUTION_W_PRIMARY,
                            RESOLUTION_W_ALL)
    return np.where((c.n == 0) | (c.strip_len == 0), 0.0, score)


def completeness_scores(extracted: pd.Series,
                        counts: _Counts | None = None) -> np.ndarray:
    """Vector of core.entities.completeness_from_text over a batch:
    one contains() pass per expected pattern, with SOUND pre-gates that
    skip patterns which cannot match — date_numeric literally requires a
    digit (digit count = alnum - letter, already in _Counts),
    currency_amount requires a digit OR a comma (its ``[\\d,]+`` group can
    be satisfied by commas alone: 'USD ,a' matches with zero digits — r7
    review finding), and email requires '@' (memchr-fast literal checks).
    The gates never change results; they only skip impossible scans (the
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
    has_comma = t.str.contains(",", regex=False).to_numpy(dtype=bool)
    gates = {"date_numeric": has_digit,
             "currency_amount": has_digit | has_comma,
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
    """All ten metrics with count reuse: rows whose extraction is the
    identity (extracted IS raw — plain rows, incl. the CPU-dominant mega
    turns) share one _Counts pass between blank and the extracted-side
    metrics. Returns (blank, legibility, completeness, skew, noise,
    contrast, brightness, edge_crop, shadow_glare, resolution) arrays —
    core.quality.QualityScores field order."""
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
            skew_scores(ext_series, counts=c_ext),
            noise_scores(ext_series, counts=c_ext),
            contrast_scores(ext_series, counts=c_ext),
            brightness_scores(ext_series, counts=c_ext),
            edge_crop_scores(ext_series, counts=c_ext),
            shadow_glare_scores(ext_series, counts=c_ext),
            resolution_scores(ext_series, counts=c_ext))
