"""Frozen bigram language-model scoring for corpus curation (pure
Python — the oracle; the Spark operator delegates here).

The CCNet-style curation stage the LLM-pipeline brief calls for:
score every document under a small language model frozen from a
reference corpus and drop the tail whose perplexity says "not like the
training distribution" (Wenzek et al. 2019, CCNet; the same role KenLM
plays there). The model here is a bigram LM with **stupid backoff**
(Brants et al. 2007 — score(w2|w1) = p(w1 w2) if observed else
alpha * p(w2); no normalization, which is exactly what makes it a pure
integer-LUT replay) over the pinned whitespace tokenization.

Everything is integer-quantized so the three evaluation surfaces — this
module, the Arrow UDF in ``operators/curation.with_lm_perplexity``
(which calls THIS function), and the DuckDB gate oracle
(``__spark_entry__._lm_perplexity_oracle_sql``, LUT parquet joins) —
sum the IDENTICAL integers:

- tokens: non-empty ``textstats.WS_CLASS``-split fields of
  ``lower(text)`` (the shingle/ml-tokenizer convention: boundary
  empties dropped; NULL -> no tokens);
- each token maps to the frozen vocab or ``<unk>`` (the vocab is
  closed at freeze time; ``<unk>`` has real trained mass);
- cost of a bigram, in **integer 1e-4 digits** (-log10 p scaled by
  ``SCALE`` and rounded at freeze time, never at query time):
  ``bigram_cost[(w1, w2)]`` when the pair is in the LUT, else
  ``unigram_cost[w2] + BACKOFF_COST`` (alpha = 0.4);
- document score: ``lm_cost`` = sum of bigram costs (exact int),
  ``lm_bigrams`` = max(len(tokens) - 1, 0). The mean
  ``lm_cost / lm_bigrams / SCALE`` is the mean -log10 probability per
  bigram (perplexity = 10**mean); consumers threshold on the integer
  form ``lm_cost > thr_e4 * lm_bigrams`` for an exact comparison.

Model-regime caveat (measured, pinned by
tests/test_streaming.py::test_streaming_curate_lm_threshold_matches_batch):
``<unk>``'s cost is its TRUE trained frequency (closed-vocab MLE), so
with a tiny vocab — where the excluded types carry real mass — an
all-OOV document collapses onto the frequent ``(<unk>, <unk>)`` pair
and can score CHEAPER than in-vocab words in unseen orders. That is
faithful stupid-backoff, not a scoring bug; deployment models should
freeze a vocab large enough that ``<unk>`` is genuinely rare (the
standard CCNet/KenLM regime, where OOV-heavy text scores expensive),
and thresholds are per-model facts to be picked from a scored sample.

Reference parity note: the reference has no LM filter (SURVEY §2 is
complete without this); the op belongs to the build brief's
training-data-pipeline family, next to the Gopher repetition signals
(``rep_signals``) and the stopword/lang heuristics (``doc_lang_quality``).
"""

from __future__ import annotations

import math
import re
from collections import Counter

from documentai_spark.core.textstats import WS_CLASS

UNK = "<unk>"
SCALE = 10_000
# stupid-backoff alpha = 0.4 (Brants et al. 2007), as an integer cost
# addend: -log10(0.4) * SCALE, rounded once here, shared by every engine
BACKOFF_ALPHA = 0.4
BACKOFF_COST = round(-math.log10(BACKOFF_ALPHA) * SCALE)

_SPLIT_RE = re.compile(WS_CLASS + "+")


def tokens(text: str | None) -> list[str]:
    """Non-empty WS_CLASS fields of lower(text); NULL -> []. (The
    shingle/ml-tokenizer convention — boundary empties DROPPED — not
    textstats.token_count's field-count form, which keeps them.)"""
    if not text:
        return []
    return [t for t in _SPLIT_RE.split(text.lower()) if t]


def _cost(p: float) -> int:
    return round(-math.log10(p) * SCALE)


def train_lm(texts, vocab_size: int = 24,
             min_bigram_count: int = 5) -> dict:
    """Freeze-time trainer (tools/freeze_lm_model.py is the only
    caller): top-``vocab_size`` tokens by (count desc, token asc)
    become the vocab, every other token is counted AS ``<unk>``, and
    the bigram LUT keeps pairs seen >= ``min_bigram_count`` times
    (rarer pairs take the backoff path at scoring time — keeping the
    LUT deliberately incomplete is what makes all three scoring paths
    live on real data). Probabilities are unsmoothed MLE over the
    mapped stream — stupid backoff needs no discounting because it
    never normalizes the backoff mass.

    Returns ``{"vocab": [..], "unigram_cost": {w: int},
    "bigram_cost": {"w1 w2": int}, "backoff_cost": int,
    "scale": int, ...}`` — the exact dict :func:`score_doc` takes and
    the freeze tool serializes.
    """
    uni: Counter = Counter()
    streams = []
    for t in texts:
        tk = tokens(t)
        uni.update(tk)
        streams.append(tk)
    vocab = [w for w, _ in sorted(uni.items(),
                                  key=lambda kv: (-kv[1], kv[0]))
             [:vocab_size]]
    vset = set(vocab)
    m_uni: Counter = Counter()
    m_bi: Counter = Counter()
    for tk in streams:
        mk = [w if w in vset else UNK for w in tk]
        m_uni.update(mk)
        for i in range(len(mk) - 1):
            m_bi[(mk[i], mk[i + 1])] += 1
    total = sum(m_uni.values())
    if total == 0:
        raise ValueError("train_lm: empty training corpus")
    unigram_cost = {w: _cost(c / total) for w, c in m_uni.items()}
    if UNK not in unigram_cost:
        # a corpus with zero OOV tokens still needs an <unk> floor for
        # scoring-time OOV: one pseudo-count
        unigram_cost[UNK] = _cost(1 / (total + 1))
    bigram_cost = {
        f"{w1} {w2}": _cost(c / m_uni[w1])
        for (w1, w2), c in m_bi.items() if c >= min_bigram_count
    }
    return {"vocab": vocab, "unigram_cost": unigram_cost,
            "bigram_cost": bigram_cost, "backoff_cost": BACKOFF_COST,
            "scale": SCALE, "vocab_size": vocab_size,
            "min_bigram_count": min_bigram_count}


def score_doc(text: str | None, model: dict) -> tuple[int, int]:
    """(lm_bigrams, lm_cost) for one document — pure integer sums over
    the frozen LUTs; the single scoring implementation every engine
    replays (the Spark operator calls this per row inside an Arrow
    batch; the DuckDB oracle is the same lookups as SQL joins)."""
    vset = model["_vset"] if "_vset" in model else set(model["vocab"])
    uni = model["unigram_cost"]
    bi = model["bigram_cost"]
    back = model["backoff_cost"]
    tk = tokens(text)
    mk = [w if w in vset else UNK for w in tk]
    cost = 0
    for i in range(len(mk) - 1):
        c = bi.get(f"{mk[i]} {mk[i + 1]}")
        cost += c if c is not None else uni[mk[i + 1]] + back
    return max(len(mk) - 1, 0), cost
