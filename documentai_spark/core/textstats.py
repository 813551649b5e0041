"""Text-analysis primitives for training-data pipelines (pure Python).

These are the large-scale-corpus operations layered on top of the
extraction core (per the build brief): token counting, language-ID
heuristics, quality ratios, and document fingerprinting. Each has a
deliberately SQL-expressible definition so the Spark DataFrame version and
the DuckDB oracle can compute the identical value (see
``documentai_spark.functions.text`` for the Spark column expressions and
``__spark_entry__.oracle_sql`` for the SQL mirrors).

Definitions (pinned):

- ``token_count``      — number of whitespace-delimited tokens.
- ``stopword_ratio``   — fraction of tokens (lowercased, alnum-stripped)
                         in the STOPWORDS list.
- ``punct_ratio``      — punctuation chars / total chars.
- ``lang_id``          — 'en' if stopword_ratio >= 0.04 else 'unknown'
                         (n-gram/stopword heuristic family).
- ``fingerprint``      — md5 hex of the whitespace-normalized, lowercased
                         text (document fingerprint for exact dedup).
- ``shingles``         — the w-token shingle set (for MinHash / Jaccard).
"""

from __future__ import annotations

import hashlib
import re

STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this", "are",
)

_PUNCT_RE = re.compile(r"[^\w\s]")
# Pinned whitespace for fingerprint normalization: the Java-regex \s set
# [ \t\n\x0b\f\r] — identical to Python's re.ASCII \s — so the Spark column
# (operators/dedup.normalized_text), this oracle, and the DuckDB SQL
# mirrors (explicit class) collapse the exact same bytes. Python's default
# Unicode \s additionally matches \x1c-\x1f / \x85 / \xa0, which occur in
# the fixture domain (see commit e795ab0) and would diverge.
WS_CLASS = r"[ \t\n\x0b\f\r]"
_NORM_RE = re.compile(WS_CLASS + "+")


def token_count(text: str) -> int:
    return len(text.split()) if text else 0


def stopword_ratio(text: str) -> float:
    toks = text.lower().split() if text else []
    if not toks:
        return 0.0
    sw = set(STOPWORDS)
    return sum(1 for t in toks if t.strip(".,!?;:") in sw) / len(toks)


def punct_ratio(text: str) -> float:
    if not text:
        return 0.0
    return len(_PUNCT_RE.findall(text)) / len(text)


def lang_id(text: str) -> str:
    return "en" if stopword_ratio(text) >= 0.04 else "unknown"


def normalize_for_fingerprint(text: str) -> str:
    return _NORM_RE.sub(" ", (text or "").lower()).strip()


def fingerprint(text: str) -> str:
    return hashlib.md5(normalize_for_fingerprint(text).encode("utf-8")).hexdigest()


def shingles(text: str, w: int = 3) -> set[str]:
    toks = normalize_for_fingerprint(text).split()
    if len(toks) < w:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + w]) for i in range(len(toks) - w + 1)}


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    union = len(a | b)
    return inter / union if union else 0.0
