"""Multi-technique classification + majority vote (A6/A7, W2 grouping).

Rebuilt from document_classification_updated/documentClassifier.py:

- config semantics (documentClassifier.py:984-1036): categories with
  weighted keyword lists, keywords lowercased + alnum-normalized + sorted
  by length desc at compile time, ``always_separate`` flags,
  ``max_pages_per_pdf`` caps.
- technique 1 "substring": score = sum of len(keyword)*4*weight over
  matched keywords, argmax category (documentClassifier.py:406-421).
- technique 2 "regex count": occurrences x weight
  (documentClassifier.py:476-492).
- technique 3 "token overlap": |keyword-set  word-set| (the NLP variant,
  documentClassifier.py:520-557).
- majority vote: count votes per category, argmax with deterministic
  tie-break, confidence = votes/techniques
  (documentClassifier.py:928-948).
- per-category output grouping: consecutive same-category turns form one
  output group, broken at gaps, category changes, ``max_pages``, or
  ``always_separate`` (documentClassifier.py:1039-1121) — see
  ``group_consecutive``.

All scoring is generated column expressions (keywords are compile-time
constants folded into the plan — the Spark analog of the reference's
precompiled keyword cache, X5/X12); no shuffle until the vote. The ONE
Python stage is the per-row FEATURE pass (``_features_batch`` via
``_make_features_udf``): both normalized text forms (byte-LUT
``bytes.translate``, byte-identical to the ``lower + regexp_replace``
column forms it replaced) plus technique 2's per-category occurrence
counts (Python ``re`` over the same already-lowered string; per-keyword
findalls summed per category — reference parity, r7). Why: this host's
JVM
``regexp_replace`` with a character class degrades to ~6 MB/s aggregate
on 32 cores when matches are dense (measured 99 s for a 620 MB
sf1-shape normalization — 200 us per match; collapsing runs with ``+``
and salting both changed nothing), while the translate pass runs the
same input in 2.8 s, and fusing the counts drops the chain from 24-35 s
to 8 s. Same doctrine as operators/quality_vec: LUT gather at memory
bandwidth beats per-match machinery.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType
from pyspark.sql.window import Window


@dataclass(frozen=True)
class Category:
    name: str
    keywords: tuple[str, ...]       # alnum-normalized (substring scoring)
    patterns: tuple[str, ...] = ()  # \s+-flexible word patterns (regex count)
    # the same patterns with \s spelled as the explicit Java-\s byte class
    # [ \t\n\x0b\f\r] — the Python-re mirror used by the Arrow feature
    # pass (built from the raw keywords, never by string-replacing
    # `patterns`, so escaped literals can't be corrupted)
    patterns_py: tuple[str, ...] = ()
    # per-WORD keyword vocabulary for technique 3 (r7 review): the
    # reference's NLP classifier builds its lookup sets from the
    # INDIVIDUAL words of every keyword (documentClassifier.py:524-527,
    # kw_item['keyword'].lower().split()), so 'purchase order'
    # contributes {'purchase', 'order'} — the old whole-keyword form
    # ('purchaseorder') could never intersect a word token
    words: tuple[str, ...] = ()
    weight: float = 1.0
    always_separate: bool = False
    max_pages: int = 0  # 0 = unlimited


@dataclass(frozen=True)
class ClassifierConfig:
    categories: tuple[Category, ...]
    min_text_len: int = 5  # documentClassifier.py:394 min-length gate

    @staticmethod
    def compile(raw: dict) -> "ClassifierConfig":
        """Normalize + length-sort keywords (documentClassifier.py:1008-1021);
        regex patterns are \\s+-flexible BETWEEN WORDS
        (documentClassifier.py:455 compiles escaped keywords with flexible
        whitespace — word-level, never per-character)."""
        cats = []
        for name, spec in raw.items():
            originals = [k for k in spec["keywords"] if _norm(k)]
            if not originals:
                # a keyword-less category can never score; worse, the
                # old joined-alternation regex form compiled an EMPTY
                # pattern that matched at every position and made the
                # category win technique 2 on every row (r7 review) —
                # refuse the config loudly
                raise ValueError(
                    f"category {name!r} has no usable keywords (every "
                    "entry normalizes to empty)")
            kws = sorted({_norm(k) for k in originals},
                         key=lambda k: (-len(k), k))
            # sorted so technique 2's per-keyword scan order (and any
            # future alternation use) is identical in both engines
            pairs = sorted(
                (r"\s+".join(re.escape(w) for w in k.lower().split()),
                 "[ \t\n\x0b\f\r]+".join(re.escape(w)
                                         for w in k.lower().split()))
                for k in originals)
            pats = tuple(p for p, _ in pairs)
            pats_py = tuple(q for _, q in pairs)
            words = tuple(sorted({_norm(w) for k in originals
                                  for w in k.lower().split()
                                  if _norm(w)}))
            cats.append(Category(name=name, keywords=tuple(kws),
                                 patterns=pats, patterns_py=pats_py,
                                 words=words,
                                 weight=float(spec.get("weight", 1.0)),
                                 always_separate=bool(
                                     spec.get("always_separate", False)),
                                 max_pages=int(spec.get("max_pages", 0))))
        return ClassifierConfig(categories=tuple(cats))


def _norm(s: str) -> str:
    """alnum-normalize + lowercase (documentClassifier.py:404,645,727,806)."""
    return re.sub(r"[^0-9a-z]", "", s.lower())


def _norm_col(c: Column) -> Column:
    return F.regexp_replace(F.lower(c), "[^0-9a-z]", "")


# byte-LUT deletion tables: after str.lower(), every UTF-8 byte outside
# the keep-set is deleted. Multi-byte (non-ASCII) characters consist
# solely of bytes >= 0x80, so deleting those bytes deletes the character
# — exactly what the [^0-9a-z] / [^0-9a-z\s] regex classes do. The \s
# keep-set is Java regex \s == [ \t\n\x0b\f\r], spelled in bytes.
_KEEP_ALNUM = frozenset(range(48, 58)) | frozenset(range(97, 123))
_KEEP_WS = frozenset((9, 10, 11, 12, 13, 32))
_DEL_ALNUM = bytes(b for b in range(256) if b not in _KEEP_ALNUM)
_DEL_SPACE = bytes(b for b in range(256)
                   if b not in (_KEEP_ALNUM | _KEEP_WS))


def _norm_batch(text: pd.Series) -> pd.DataFrame:
    """Both normalized forms in one pass (shared with tests): ``na`` =
    lower + strip non-alnum (technique 1's contains-scoring input),
    ``ns`` = lower + strip all but alnum/whitespace + trim spaces
    (technique 3's token source). Byte-identical to the column forms
    ``regexp_replace(lower(t), '[^0-9a-z]', '')`` and
    ``trim(regexp_replace(lower(t), '[^0-9a-z\\s]', ''))`` — pinned by
    tests/test_classify.py::test_norm_batch_matches_column_forms."""
    na, ns = [], []
    for s in text:
        b = (s or "").lower().encode("utf-8", "surrogatepass")
        na.append(b.translate(None, _DEL_ALNUM).decode("ascii"))
        ns.append(b.translate(None, _DEL_SPACE).decode("ascii").strip(" "))
    return pd.DataFrame({"na": na, "ns": ns})


def _features_batch(text: pd.Series,
                    pats: list[list[str]]) -> pd.DataFrame:
    """One Arrow pass producing every per-row text feature the three
    techniques need: both normalized forms (see _norm_batch) AND the
    per-category occurrence counts for technique 2 (``c0..c{k-1}``).

    Counts are PER-KEYWORD findalls summed per category (r7 review —
    the reference findall's each compiled pattern independently,
    documentClassifier.py:476-480): a joined alternation consumed
    overlapping keywords' spans once, so a category with 'credit' AND
    'letter of credit' undercounted on exactly its strongest evidence.
    Python re mirrors Java regexp_extract_all exactly for these
    escaped-literal \\s+-joined patterns; parity pinned by
    tests/test_classify.py::test_features_counts_match_jvm and the
    classify_vote / classify_grouping DuckDB gate oracles."""
    import re as _re
    comp = [[_re.compile(p) for p in cat_pats] for cat_pats in pats]
    na, ns = [], []
    counts: list[list[int]] = [[] for _ in comp]
    for s in text:
        low = (s or "").lower()
        b = low.encode("utf-8", "surrogatepass")
        na.append(b.translate(None, _DEL_ALNUM).decode("ascii"))
        ns.append(b.translate(None, _DEL_SPACE).decode("ascii").strip(" "))
        for i, cat in enumerate(comp):
            counts[i].append(sum(len(c.findall(low)) for c in cat))
    data: dict = {"na": na, "ns": ns}
    for i in range(len(comp)):
        data[f"c{i}"] = pd.Series(counts[i], dtype="int32")
    return pd.DataFrame(data)


def _make_features_udf(cfg: "ClassifierConfig"):
    """Config-closure pandas UDF over _features_batch (the patterns are
    compile-time constants of the config, like the keyword literals in
    the JVM expressions)."""
    from pyspark.sql.types import IntegerType

    pats = [list(cat.patterns_py) for cat in cfg.categories]
    fields = [StructField("na", StringType(), False),
              StructField("ns", StringType(), False)] + \
             [StructField(f"c{i}", IntegerType(), False)
              for i in range(len(pats))]

    @pandas_udf(StructType(fields))
    def feats(text: pd.Series) -> pd.DataFrame:
        return _features_batch(text, pats)

    return feats


def _argmax_struct(scores: list[tuple[str, Column]], default: str) -> Column:
    """Deterministic argmax over (category, score): greatest score wins,
    ties broken by category-name order; zero scores -> default."""
    structs = [F.struct(s.alias("s"), F.lit(-i).alias("i"),
                        F.lit(name).alias("cat"))
               for i, (name, s) in enumerate(scores)]
    # F.greatest requires >= 2 args — a one-category config (binary
    # detect-vs-unclassified) used to die at plan build (r7 review)
    best = structs[0] if len(structs) == 1 else F.greatest(*structs)
    return F.when(best["s"] > 0, best["cat"]).otherwise(F.lit(default))


def technique_substring(text: Column, cfg: ClassifierConfig,
                        default: str = "unclassified",
                        norm: Column | None = None) -> Column:
    """len(kw)*4*weight substring scoring (documentClassifier.py:406-421).

    ``norm``: the already alnum-normalized text when the caller staged it
    (classify_with_vote always does, via the byte-LUT Arrow stage)."""
    nt = _norm_col(text) if norm is None else norm
    scores = []
    for cat in cfg.categories:
        s = None
        for kw in cat.keywords:
            term = F.when(nt.contains(kw),
                          F.lit(len(kw) * 4 * cat.weight)).otherwise(F.lit(0.0))
            s = term if s is None else s + term
        scores.append((cat.name, s if s is not None else F.lit(0.0)))
    return _argmax_struct(scores, default)


def technique_regex_count(text: Column, cfg: ClassifierConfig,
                          default: str = "unclassified",
                          counts: list[Column] | None = None) -> Column:
    """Occurrence-count x weight scoring (documentClassifier.py:476-492).

    Keywords compile to \\s+-flexible patterns (documentClassifier.py:455).
    ``counts``: per-category occurrence-count columns when the caller
    staged them (classify_with_vote does, via the Arrow feature pass —
    the JVM regexp_extract_all path below is semantics-identical and
    remains for direct technique use). Counts are per-keyword findalls
    SUMMED (r7 review, reference parity — see _features_batch)."""
    if counts is None:
        lt = F.lower(text)
        counts = []
        for cat in cfg.categories:
            c = None
            for pat in cat.patterns:
                term = F.size(F.regexp_extract_all(lt, F.lit(pat),
                                                   F.lit(0)))
                c = term if c is None else c + term
            counts.append(c if c is not None else F.lit(0))
    scores = [(cat.name, cnt.cast("double") * F.lit(cat.weight))
              for cat, cnt in zip(cfg.categories, counts)]
    return _argmax_struct(scores, default)


def technique_token_overlap(text: Column, cfg: ClassifierConfig,
                            default: str = "unclassified",
                            norm: Column | None = None) -> Column:
    """|keyword-set ∩ word-set| scoring (documentClassifier.py:520-557).

    ``norm``: the already space-normalized text when the caller staged
    it (see technique_substring).

    r7 review, two reference-parity fixes (documentClassifier.py:524,
    540): tokens split on the WHITESPACE CLASS (the space-normalized
    text retains tabs/newlines, so a single-space split fused
    'invoice\\ntotal' into one unmatched token on every multi-line
    document), and the intersection runs against each keyword's
    individual WORDS (``cat.words``) — the whole-keyword form
    ('purchaseorder') could never equal a word token, so multi-word
    keywords never voted."""
    words = F.array_distinct(F.split(
        _space_norm(text) if norm is None else norm,
        "[ \t\n\x0b\f\r]+"))
    scores = []
    for cat in cfg.categories:
        kws = F.array(*[F.lit(k) for k in cat.words])
        scores.append((cat.name,
                       F.size(F.array_intersect(words, kws)).cast("double")))
    return _argmax_struct(scores, default)


def _space_norm(c: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(c), r"[^0-9a-z\s]", ""))


def classify_with_vote(df: DataFrame, cfg: ClassifierConfig,
                       text_col: str = "extracted_text",
                       default: str = "unclassified",
                       ml_category_col: str | None = None,
                       jvm_scoring: bool = False) -> DataFrame:
    """Run the 3 rule techniques (+ optionally the ML classifier as the
    4th vote) and take the majority per row.

    Adds: technique_1/2/3[/4], category (vote winner), vote_confidence
    (k/3, or k/4 once ML is wired — documentClassifier.py:946 hardcodes
    the /4 denominator in the 4-technique processor). Rows shorter than
    min_text_len go straight to default (documentClassifier.py:394,1020).

    Vote semantics mirror _determine_final_classification_4_4
    (documentClassifier.py:928-948): count votes per category skipping
    errored (null) techniques; ``max(votes, key=get)`` breaks ties by
    dict-insertion order, i.e. the EARLIEST technique whose category
    reaches the max count wins. A null ml_category (the reference's
    errored-classifier path, :906-913) is skipped in counting but the
    denominator stays 4.

    The vote is row-local (the reference votes per page) — plain
    when-chains over materialized technique columns keep the expression
    tree small (an array transform/filter formulation re-inlined each
    technique tree ~10x after projection collapse: measured 60s -> ~2s at
    sf0.1). The *table-level* vote aggregate lives in
    __spark_entry__.q_majority_vote."""
    t = F.col(text_col)
    # NULL text is gated like empty text (r7 review): a bare length()
    # comparison evaluates to NULL, both when() gates fell through to
    # otherwise(), and an unclassifiable NULL row reported unanimous
    # vote_confidence 1.0 instead of the gated 0.0
    too_short = t.isNull() | (F.length(F.trim(t)) < cfg.min_text_len)
    # Min-length gate on the INPUT, not the outputs: every technique maps
    # empty text to `default` anyway (zero scores), so blanking short rows
    # is semantically identical to wrapping each technique in
    # when(too_short, default) — but the wrapper form puts the whole
    # scoring tree inside a lazy CaseWhen branch, which DISABLES codegen
    # subexpression elimination (the shared alnum-normalize/split
    # subtrees re-evaluate ~9x per row; measured 10.8s -> 2.5s at 5k
    # transcript turns for the 3-technique projection).
    t_eff = F.when(too_short, F.lit("")).otherwise(t)
    if jvm_scoring:
        # pure column-expression path (no Python stage): semantically
        # identical (pinned by test_jvm_scoring_path_identical); the
        # right choice on hosts whose JVM regex runs at normal speed —
        # this sandbox's does not (module docstring)
        t1c = technique_substring(t_eff, cfg, default)
        t2c = technique_regex_count(t_eff, cfg, default)
        t3c = technique_token_overlap(t_eff, cfg, default)
    else:
        # every per-row text feature (both normalized forms +
        # technique-2 occurrence counts) staged through ONE
        # byte-LUT/Python-re Arrow stage (module docstring: JVM
        # regexp_replace degrades ~35x on dense-match inputs on this
        # host, and the regex scans ride the same already-lowered
        # string); gated input, so short rows cost ~nothing
        if "_cnorm" in df.columns:
            raise ValueError("input column _cnorm collides with "
                             "classify_with_vote's internal name")
        df = df.withColumn("_cnorm", _make_features_udf(cfg)(t_eff))
        t1c = technique_substring(t_eff, cfg, default,
                                  norm=F.col("_cnorm.na"))
        t2c = technique_regex_count(
            t_eff, cfg, default,
            counts=[F.col(f"_cnorm.c{i}")
                    for i in range(len(cfg.categories))])
        t3c = technique_token_overlap(t_eff, cfg, default,
                                      norm=F.col("_cnorm.ns"))
    # The vote below references each technique column ~10x (counts, max,
    # winner chain). Safe: CollapseProject only inlines non-cheap
    # projection aliases referenced at most once (SPARK-36718), so each
    # technique tree materializes exactly once per row.
    df = (df.withColumn("technique_1", t1c)
            .withColumn("technique_2", t2c)
            .withColumn("technique_3", t3c)
            .drop("_cnorm"))
    names = ["technique_1", "technique_2", "technique_3"]
    if ml_category_col is not None:
        df = df.withColumn("technique_4", F.col(ml_category_col))
        names.append("technique_4")
    ts = [F.col(n) for n in names]
    # cnt_i = how many non-null techniques agree with technique_i; the
    # techniques are materialized columns, so these are cheap column refs
    def cnt(i: int):
        c = F.lit(0)
        for tj in ts:
            c = c + F.when(tj.isNotNull() & (tj == ts[i]), 1).otherwise(0)
        return c
    cnts = [cnt(i) for i in range(len(ts))]
    max_cnt = F.greatest(*[
        F.when(ts[i].isNotNull(), cnts[i]).otherwise(0)
        for i in range(len(ts))]) if len(ts) > 1 else cnts[0]
    winner = None
    for i in range(len(ts)):  # ascending = insertion-order tie-break
        cond = ts[i].isNotNull() & (cnts[i] == max_cnt)
        winner = (F.when(cond, ts[i]) if winner is None
                  else winner.when(cond, ts[i]))
    winner = winner.otherwise(F.lit(default))  # all techniques null
    denom = float(len(ts))
    return (df.withColumn("category",
                          F.when(too_short, default).otherwise(winner))
              .withColumn("vote_confidence",
                          F.when(too_short, F.lit(0.0)).otherwise(
                              max_cnt.cast("double") / F.lit(denom))))


def group_consecutive(df: DataFrame, cfg: ClassifierConfig,
                      conv_col: str = "conv_id",
                      order_col: str = "turn_idx",
                      category_col: str = "category") -> DataFrame:
    """Per-category output grouping (documentClassifier.py:1039-1121).

    New group when: turn not consecutive (gap), category changes, or the
    category is always_separate; groups longer than max_pages split into
    max_pages-sized chunks. Classic gaps-and-islands (W2): lag + cumsum,
    then an in-island row_number divided by the cap."""
    w = Window.partitionBy(conv_col).orderBy(order_col)
    always_sep = F.col(category_col).isin(
        [c.name for c in cfg.categories if c.always_separate]) \
        if any(c.always_separate for c in cfg.categories) else F.lit(False)
    brk = (F.lag(order_col).over(w).isNull()
           | (F.col(order_col) != F.lag(order_col).over(w) + 1)
           | (F.col(category_col) != F.lag(category_col).over(w))
           | always_sep)
    df = df.withColumn("_brk", brk.cast("int"))
    df = df.withColumn("_island", F.sum("_brk").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    wi = Window.partitionBy(conv_col, "_island").orderBy(order_col)
    caps = {c.name: c.max_pages for c in cfg.categories if c.max_pages}
    cap = F.lit(0)
    for name, mp in caps.items():
        cap = F.when(F.col(category_col) == name, F.lit(mp)).otherwise(cap)
    sub = F.when(cap > 0,
                 F.floor((F.row_number().over(wi) - 1) / cap)).otherwise(0)
    # group_id is conversation-qualified (r7 review): the bare
    # island-counter form repeated ('1-0' in every conversation), so
    # any consumer grouping on group_id alone merged unrelated
    # documents across conversations
    return (df.withColumn("group_id",
                          F.concat_ws("-", F.col(conv_col),
                                      F.col("_island"), sub))
              .drop("_brk", "_island"))
