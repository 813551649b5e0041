"""Deduplication operators for training-data pipelines.

Four tiers, each a standard large-corpus technique expressed Spark-first
(no Python in the hot path — everything below is JVM built-ins /
higher-order functions, so whole-stage codegen applies):

- **exact**      — md5 fingerprint hash-groupBy (one shuffle on a 16-byte
                   key; map-side partial agg).
- **MinHash+LSH**— k-permutation signatures computed *shuffle-free* per row
                   (``array_min`` over ``transform``-hashed shingles), then
                   banded: only the (band_idx, band_hash) explode shuffles,
                   and its fan-out is b rows/doc (b=16), so the candidate
                   join touches a tiny fraction of the corpus — the 100 TB
                   scale path.
- **SimHash**    — 64-bit signature via per-bit weighted majority over
                   token hashes; near-dup = small Hamming distance
                   (bit_count(a XOR b)); candidates via 16-bit chunk bands.
- **n-gram Jaccard** — exact verify step for candidate pairs (also
                   standalone in __spark_entry__.q_ngram_jaccard).

Determinism: all hashes are xxhash64 with fixed per-permutation salts —
signatures are pure functions of the text, independent of partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalized_text(col: Column) -> Column:
    """Whitespace-collapsed lowercase (textstats.normalize_for_fingerprint)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint_col(col: Column) -> Column:
    """Exact-dedup key: md5 of normalized text."""
    return F.md5(normalized_text(col).cast("binary"))


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative per fingerprint group.

    One shuffle; at 100 TB prefer a two-level agg (cluster by fingerprint
    prefix first) only if the key cardinality approaches row count — here
    map-side combine already collapses duplicates early.

    The semi join is NULL-SAFE on the fingerprint (r7 review): a
    NULL-text row has a NULL fingerprint, which groupBy keeps as its own
    group but a plain equi-join can never match — the NULL group's
    min-id representative would silently vanish from the output (data
    loss, not dedup). With eqNullSafe the NULL-fingerprint group keeps
    its min-id row exactly like the window form in
    ``curation.with_curation_flags``.

    NULL ids fail fast (r7 review): the id leg of the semi-join
    condition is null-UNSAFE by design (two NULL-id rows are not the
    same row), so a NULL id would silently delete its row — even a
    unique-text one — instead of deduping anything. The check rides the
    min() agg input; no extra jobs (``functions.ids.checked_non_null``).
    """
    from documentai_spark.functions.ids import checked_non_null

    if "_fp" in df.columns:
        raise ValueError("input column '_fp' collides with exact_dedup "
                         "internals")
    fp = df.withColumn("_fp", fingerprint_col(F.col(text_col)))
    keep = (fp.groupBy("_fp")
              .agg(F.min(checked_non_null(F.col(id_col), "exact_dedup"))
                   .alias("_keep_id"))
              .withColumnRenamed("_fp", "_keep_fp"))
    return (fp.join(keep,
                    F.col("_fp").eqNullSafe(F.col("_keep_fp"))
                    & (F.col(id_col) == F.col("_keep_id")), "left_semi")
              .drop("_fp"))


def exact_rep_rows(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", *,
                   context: str = "near_dedup") -> DataFrame:
    """One representative ``(id, text)`` row per EXACT-duplicate group:
    the min-(long id, string id) member per normalized fingerprint.

    Why this exists (r7 review): identical texts have identical MinHash
    signatures, so an m-copy boilerplate group collides in EVERY band
    and the LSH self-join emits ~bands*m^2/2 candidate rows — a
    quadratic blowup on content that exact dedup collapses to one row
    in one shuffle (at 100 TB a million-copy template is ~10^13 join
    rows). The near-dup chain therefore bands ONLY these
    representatives; exact-duplicate members inherit the verdict
    through ``is_dup`` (with_curation_flags) or by not being cluster
    representatives (near_dedup). One groupBy on the 16-byte
    fingerprint with map-side combine — the same shape as exact_dedup.

    The winner is picked in the LONG domain with the string id as
    tie-break — the SAME ordering the near path's exact-dup window
    uses. ``checked_long`` enforces the long domain, and (r7 review)
    rejects NON-CANONICAL string forms outright: '007' and '7' are
    distinct documents that would share one closure label, so they fail
    fast with an error naming the surrogate fix instead of silently
    conflating. NOTE: the agg is a
    plain plan node and recomputes per consumer; the chain's consumers
    each ran full-corpus shingling before, so this strictly reduces
    per-consumer work — a checkpointed run materializes the final reps
    table instead (plans.checkpoint._near_reps_stage).
    """
    from documentai_spark.functions.ids import checked_long

    lid = checked_long(F.col(id_col), context,
                       df.schema[id_col].dataType)
    row = F.struct(lid.alias("_l"),
                   F.col(id_col).cast("string").alias("_s"),
                   F.col(id_col).alias("_id"),
                   F.col(text_col).alias("_text"))
    return (df.select(fingerprint_col(F.col(text_col)).alias("_erfp"),
                      row.alias("_row"))
              .groupBy("_erfp").agg(F.min("_row").alias("_row"))
              .select(F.col("_row._id").alias(id_col),
                      F.col("_row._text").alias(text_col)))


def shingle_udf(w: int = 3):
    """The Arrow-batched shingler over PRE-NORMALIZED text, shared by
    :func:`with_shingles` (batch) and
    :func:`with_minhash_signature_local` (the streaming signature
    projection) so both paths shingle bit-identically.

    Why a pandas UDF and not the ``transform``/``slice`` column form
    (kept below as ``shingle_col`` for short-text uses): higher-order
    functions are interpreted, and the optimizer's projection/Generate
    collapse re-inlines the tokenization subtree into the lambda and the
    generator — measured on the r3 skew-stress corpus as PER-ELEMENT
    re-evaluation of the full 150 KB normalize+split (minutes per
    20k-token mega doc, O(len^2)). Staging the token array in a child
    projection does not survive the optimizer either. The Arrow boundary
    is a real barrier: normalization stays JVM-side (exactly
    ``normalized_text``, which the DuckDB oracle mirrors), Python only
    splits the pre-normalized string and joins w-token windows — ~ms per
    mega doc, linear, and batch-streamed."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def shingles(norm):  # no hints: module-level `annotations` future +
        out = []         # local pandas import break hint resolution
        for s in norm:
            toks = (s or "").split(" ")
            if len(toks) >= w:
                sh = [" ".join(toks[i:i + w])
                      for i in range(len(toks) - w + 1)]
            else:
                sh = [s or ""]
            # first-occurrence distinct == array_distinct semantics
            out.append(list(dict.fromkeys(sh)))
        return pd.Series(out)

    return shingles


def with_shingles(df: DataFrame, text_col: str, out_col: str = "_sh",
                  id_col: str = "doc_id", w: int = 3) -> DataFrame:
    """(id, distinct w-token shingles) via :func:`shingle_udf` (see its
    docstring for why the shingling crosses an Arrow boundary)."""
    shingles = shingle_udf(w)
    normed = df.select(F.col(id_col),
                       normalized_text(F.col(text_col)).alias("_norm"))
    return normed.select(id_col, shingles(F.col("_norm")).alias(out_col))


def with_minhash_signature_local(df: DataFrame, text_col: str = "text",
                                 num_hashes: int = 64,
                                 out_col: str = "_sig",
                                 w: int = 3) -> DataFrame:
    """MinHash signature as an added column, computed DOC-LOCALLY — no
    aggregation, so it runs on STREAMS (where
    :func:`minhash_signatures`'s explode+groupBy would be a stateful
    streaming aggregation) and keeps every input column.

    Bit-identical to :func:`minhash_signatures` (pinned by
    tests/test_streaming_near_dedup): same pandas-UDF shingler, same
    salted-``xxhash64`` permutations; the min folds over the
    MATERIALIZED shingle array in ONE traversal
    (``aggregate`` + ``zip_with(least)`` over a per-element array of the
    k hashes — measured ~5x faster than k separate
    ``array_min(transform(...))`` passes, and safe from the
    re-inlined-subtree trap ``shingle_col`` documents because the
    shingles sit behind the UDF's Arrow boundary). The per-permutation
    salts are baked with ``F.lit(i)`` inside the comprehension — never a
    lambda default arg (the r4 (element, index) HOF-dispatch trap)."""
    clash = {"_mhl_norm", "_mhl_shs", out_col} & set(df.columns)
    if clash:
        # "keeps every input column" is the contract — withColumn would
        # silently clobber a same-named input and the trailing drop()
        # would delete it (r7 review; the with_curation_flags guard
        # family)
        raise ValueError(
            f"input columns collide with with_minhash_signature_local "
            f"internals/output: {sorted(clash)}")
    shingles = shingle_udf(w)
    staged = (df.withColumn("_mhl_norm", normalized_text(F.col(text_col)))
                .withColumn("_mhl_shs", shingles(F.col("_mhl_norm"))))
    per_shingle = F.transform(
        F.col("_mhl_shs"),
        lambda s: F.array(*[F.xxhash64(F.lit(i), s)
                            for i in range(num_hashes)]))
    sig = F.aggregate(
        per_shingle,
        F.array_repeat(F.lit(9223372036854775807).cast("long"),
                       num_hashes),
        lambda acc, x: F.zip_with(acc, x, lambda p, q: F.least(p, q)))
    return (staged.withColumn(out_col, sig)
                  .drop("_mhl_norm", "_mhl_shs"))


def shingle_col(text: Column, w: int = 3) -> Column:
    """Single-column shingle form — ONLY for short-text rows (tests,
    oracle mirrors): the embedded tokenization re-evaluates per element
    inside the interpreted lambda, which is quadratic in document length.
    Pipelines use ``with_shingles``."""
    toks = F.split(normalized_text(text), " ")
    n = F.size(toks)
    return F.array_distinct(
        F.when(n >= w, F.transform(
            F.sequence(F.lit(0), n - F.lit(w)),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, F.lit(w)))))
         .otherwise(F.array(normalized_text(text))))


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       num_hashes: int = 64) -> DataFrame:
    """(id, _sig array<long>) — k-permutation MinHash signatures.

    r9: delegates to the doc-local fold
    (:func:`with_minhash_signature_local` — one materialized-array
    traversal behind the Arrow shingle boundary, no explode, no
    shuffle), measured 1.8x faster than the explode+groupBy form at
    sf1.0 and bit-identical to it by the standing streaming pin
    (tests/test_streaming_near_dedup.py::test_local_signature_bit_identity,
    which now compares against the retained
    :func:`minhash_signatures_agg` so the two-engine check stays
    non-vacuous)."""
    return (with_minhash_signature_local(
                df.select(F.col(id_col), F.col(text_col)),
                text_col=text_col, num_hashes=num_hashes, out_col="_sig")
            .select(id_col, "_sig"))


def minhash_signatures_agg(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           num_hashes: int = 64) -> DataFrame:
    """(id, _sig array<long>) — the explode+groupBy formulation, kept
    as the independent second engine for the bit-identity pin (and for
    inputs whose per-doc shingle arrays would not fit a row).

    Formulation: explode shingles ONCE, project the k salted xxhash64
    values in a single codegen pass, groupBy(id) with k min() aggregates.
    Map-side partial agg collapses each partition to one row per id
    before the shuffle, so shuffle volume is ~k*8 bytes per (id x
    partition) — independent of shingle count. (A shuffle-free
    higher-order variant [array_min over transform per hash] re-evaluates
    the shingle expression per hash after projection collapse: measured
    ~30x slower.)
    """
    ex = with_shingles(df, text_col, "_shs", id_col) \
        .select(F.col(id_col), F.explode("_shs").alias("_sh"))
    # NOTE: an affine k-permutation trick (h_i = a_i*xxhash64(s) + b_i)
    # would save k-1 hash calls per shingle, but Spark 4 runs ANSI mode by
    # default and long overflow THROWS — salted xxhash64 per permutation
    # is the overflow-free formulation.
    hashed = ex.select(
        id_col, *[F.xxhash64(F.lit(i), F.col("_sh")).alias(f"_h{i}")
                  for i in range(num_hashes)])
    sig = hashed.groupBy(id_col).agg(
        *[F.min(f"_h{i}").alias(f"_h{i}") for i in range(num_hashes)])
    return sig.select(
        id_col,
        F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("_sig"))


def band_structs(sig_col, num_hashes: int, bands: int):
    """``array<struct<band_idx int, band_hash bigint>>`` — the banded
    LSH bucket keys over a signature column. One definition shared by
    the batch candidate join (:func:`minhash_lsh_candidates`) and the
    streaming state op (streaming/near_dedup.py) so both bucket
    bit-identically."""
    if bands < 1 or num_hashes % bands != 0:
        # a remainder silently drops the trailing hashes from banding
        # (shifting the LSH threshold curve away from what the caller
        # configured), and bands > num_hashes makes zero-row bands that
        # fail as an opaque zero-arg xxhash64 analysis error (r7 review)
        raise ValueError(
            f"bands={bands} must be >= 1 and divide num_hashes="
            f"{num_hashes} exactly (rows-per-band = num_hashes // "
            "bands; every hash must participate in exactly one band)")
    r = num_hashes // bands
    return F.array(*[
        F.struct(F.lit(b).alias("band_idx"),
                 F.xxhash64(*[F.element_at(sig_col, b * r + j + 1)
                              for j in range(r)]).alias("band_hash"))
        for b in range(bands)])


def minhash_lsh_candidates(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", num_hashes: int = 64,
                           bands: int = 16,
                           max_bucket: int | None = None) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash.

    rows_per_band = num_hashes // bands; two docs are candidates if any
    band matches exactly. Returns (id_a, id_b, n_bands_matched).
    Shuffles: the signature agg + the band self-join — at corpus scale
    each band bucket is tiny unless docs are true near-dups.

    ``max_bucket`` (r7 review): exact_rep_rows collapses byte-IDENTICAL
    texts, but an m-copy group of NEAR-identical texts (boilerplate
    differing by a serial/timestamp, mutual Jaccard ~0.99) still
    collides in essentially every band and the self-join emits
    ~bands*m^2/2 rows — the quadratic blowup one edit-distance past the
    exact-dup fix. Buckets larger than ``max_bucket`` therefore switch
    from all-pairs to STAR edges (every member paired with the bucket's
    min-id member). For the clustering consumers this is
    connectivity-preserving through the verify+closure whenever members
    actually resemble the hub (the mega-template case that creates
    oversized buckets in the first place); the documented recall
    tradeoff is pairs inside an oversized bucket that are similar to
    each other but NOT to the hub. None = exact all-pairs (the
    oracle-mirrored default).
    """
    sig = minhash_signatures(df, text_col, id_col, num_hashes)
    bands_col = band_structs("_sig", num_hashes, bands)
    # eager localCheckpoint (r9): the self-join (and the max_bucket
    # window) consumes the band rows on BOTH sides, and since the
    # doc-local signature fold there is no exchange below for Spark to
    # reuse — without this the whole shingle+signature subtree executed
    # once per consumer. ~bands rows/doc of (id, int, long); freed by
    # the ContextCleaner when the result is GC'd.
    ex = (sig.select(id_col, F.explode(bands_col).alias("band"))
             .select(id_col, "band.band_idx", "band.band_hash")
             .localCheckpoint(eager=True))
    if max_bucket is not None:
        if max_bucket < 2:
            raise ValueError("max_bucket must be >= 2 (a bucket of two "
                             "is already a single pair)")
        # the window shuffles by the SAME key the self-join needs, so
        # AQE reuses one exchange; the hub (min id) is the star center
        wb = Window.partitionBy("band_idx", "band_hash")
        ex = (ex.withColumn("_bn", F.count(F.lit(1)).over(wb))
                .withColumn("_hub", F.min(id_col).over(wb)))
        big = ex.filter(F.col("_bn") > max_bucket)
        star = (big.filter(F.col(id_col) != F.col("_hub"))
                   .select(F.col("_hub").alias("id_a"),
                           F.col(id_col).alias("id_b"),
                           "band_idx", "band_hash"))
        ex = ex.filter(F.col("_bn") <= max_bucket).drop("_bn", "_hub")
    a = ex.select(F.col(id_col).alias("id_a"), "band_idx", "band_hash")
    b = ex.select(F.col(id_col).alias("id_b"), "band_idx", "band_hash")
    pairs = (a.join(b, ["band_idx", "band_hash"])
              .filter(F.col("id_a") < F.col("id_b"))
              .select("id_a", "id_b", "band_idx", "band_hash"))
    if max_bucket is not None:
        pairs = pairs.unionByName(star)
    return (pairs.groupBy("id_a", "id_b")
                 .agg(F.count(F.lit(1)).alias("n_bands_matched")))


def minhash_dedup_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", num_hashes: int = 64,
                        bands: int = 16,
                        jaccard_threshold: float = 0.8,
                        max_bucket: int | None = None) -> DataFrame:
    """LSH candidates verified by exact shingle Jaccard (J-verify step).

    Verify-join width (the 100 TB decision): candidates are a tiny
    fraction of the corpus, so the shingle table is SEMI-JOIN-FILTERED to
    candidate ids before any wide join — only candidate docs' shingle
    arrays ever shuffle, not the whole corpus's. The candidate set is
    cached (it is consumed three times: two semi filters + the verify
    join); at cluster scale it would be materialized to a table instead.
    ``max_bucket`` passes through to :func:`minhash_lsh_candidates`
    (oversized-band star-join safety valve).
    """
    cand = minhash_lsh_candidates(df, text_col, id_col, num_hashes, bands,
                                  max_bucket=max_bucket)
    # eager localCheckpoint instead of persist(): the candidate set is
    # consumed three times, but a CacheManager persist would outlive the
    # call (no safe point to unpersist a lazily-consumed result) and leak
    # blocks for the session. Checkpointed blocks are released by the
    # ContextCleaner when the returned DataFrame is GC'd.
    cand = cand.localCheckpoint(eager=True)
    cand_ids = (cand.select(F.col("id_a").alias(id_col))
                    .union(cand.select(F.col("id_b").alias(id_col)))
                    .distinct())
    # semi-filter BEFORE the Arrow shingler (r9): the join does not
    # push below a Python eval node, so the old order re-shingled the
    # whole corpus to keep the few candidate docs' arrays
    sh = with_shingles(df.join(cand_ids, id_col, "left_semi"),
                       text_col, "_sh", id_col)
    j = (cand
         .join(sh.select(F.col(id_col).alias("id_a"),
                         F.col("_sh").alias("_sha")), "id_a")
         .join(sh.select(F.col(id_col).alias("id_b"),
                         F.col("_sh").alias("_shb")), "id_b"))
    inter = F.size(F.array_intersect("_sha", "_shb"))
    union = F.size("_sha") + F.size("_shb") - inter
    jac = F.when(union > 0, inter / union).otherwise(F.lit(1.0))
    return (j.withColumn("jaccard", F.round(jac, 6))
             .filter(F.col("jaccard") >= jaccard_threshold)
             .select("id_a", "id_b", "jaccard"))


def embedding_near_dups(df: DataFrame, threshold: float = 0.9,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        m_bits: int = 8, seed: int = 7,
                        dim: int | None = None) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed (the scale path).

    Candidates = same random-hyperplane bucket (near-identical vectors
    collide with probability (1 - theta/pi)^m); exact cosine re-rank
    keeps only pairs >= threshold. All-pairs work is avoided — each
    bucket joins only within itself. Returns (id_a, id_b, cosine).
    """
    from documentai_spark.operators.similarity import (
        _as_double, _hyperplanes, dot_col, lsh_bucket_col, norm_col,
    )
    if dim is None:
        from documentai_spark.operators.similarity import embedding_dim
        dim = embedding_dim(df, vec_col)
    planes = _hyperplanes(dim, m_bits, seed)
    v = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
    # norms projected once per ROW before the self-join (r7 review):
    # inlining norm_col in the per-pair cosine recomputed each vector's
    # norm once per bucket partner
    v = (v.withColumn("_b", lsh_bucket_col(F.col("_v"), planes))
          .withColumn("_n", norm_col(F.col("_v"))))
    a = v.select(F.col(id_col).alias("id_a"), F.col("_v").alias("_va"),
                 F.col("_n").alias("_na"), "_b")
    b = v.select(F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"),
                 F.col("_n").alias("_nb"), "_b")
    # zero-norm guard (r7 review): 0.0/0.0 is NaN and NaN >= threshold
    # is TRUE under Spark's NaN ordering, so one corrupt all-zero
    # embedding would be reported as a near-dup of every bucket-mate
    cos = F.when((F.col("_na") > 0) & (F.col("_nb") > 0),
                 dot_col(F.col("_va"), F.col("_vb"))
                 / (F.col("_na") * F.col("_nb"))).otherwise(F.lit(0.0))
    return (a.join(b, "_b")
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
             .filter(F.col("cosine") >= threshold))


def _md5_fold(tok: Column) -> Column:
    """64-bit token hash as struct(hi32, lo32): integer parse of the md5
    hex digest's first 16 chars (big-endian prefix halves).

    md5 instead of xxhash64 so the DuckDB gate oracle computes the
    IDENTICAL bits — ``('0x' || substr(md5(t), 1, 8))::BIGINT`` — which is
    what promoted simhash_dups from rows-only (xxhash64 has no DuckDB
    equivalent; VERDICT r2 #4). Two 32-bit halves, never one 64-bit
    value: the full unsigned parse would overflow a signed long and ANSI
    mode throws."""
    h = F.md5(tok)
    return F.struct(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring(h, 9, 8), 16, 10).cast("long").alias("lo"))


def _fold_bit(h: Column, j: int) -> Column:
    """Bit j (0 = LSB) of the 64-bit md5 fold."""
    half = h["lo"] if j < 32 else h["hi"]
    return F.shiftright(half, j % 32).bitwiseAND(F.lit(1))


def simhash_col(text: Column, bits: int = 64) -> Column:
    """64-bit SimHash: per-bit majority over md5-fold token hashes.

    bit_j(sig) = 1 iff sum over tokens of sign(bit_j(hash(tok))) > 0.
    Unweighted tokens (weight extension: multiply the when() by a weight
    column). Pure JVM expressions: 64 aggregate passes over the token
    array per row — no shuffle, codegen-able.
    """
    toks = F.split(normalized_text(text), " ")
    hashes = F.transform(toks, lambda t: _md5_fold(t))
    def bit_sum(j: int) -> Column:
        return F.aggregate(
            hashes, F.lit(0),
            lambda acc, h: acc + F.when(
                _fold_bit(h, j) == 1, F.lit(1)).otherwise(F.lit(-1)))
    out = F.lit(0).cast("long")
    for j in range(bits):
        # bit 63 is the two's-complement sign bit: 2**63 overflows a JVM
        # long literal, but adding Long.MIN_VALUE sets the same bit
        contrib = F.lit(-(2 ** 63)) if j == 63 else F.lit(2 ** j).cast("long")
        out = out + F.when(bit_sum(j) > 0, contrib) \
                     .otherwise(F.lit(0).cast("long"))
    return out


def simhash_udf():
    """Arrow-batched SimHash kernel over PRE-NORMALIZED text (exactly
    ``normalized_text``, computed JVM-side so the normalization pass the
    DuckDB oracle mirrors never leaves the JVM).

    Per doc: tokens = norm.split(" ") (identical to the JVM
    ``F.split(norm, " ")`` — verified field-for-field on adversarial
    control-char/unicode inputs), each token md5-hashed and its first 8
    digest bytes taken big-endian — the SAME 64-bit fold as
    ``_md5_fold`` (hi32 = hex chars 1-8, lo32 = 9-16; bit j of the fold
    is bit j of the big-endian 8-byte prefix). Bit j of the signature is
    set iff the +1/-1 majority over tokens is strictly positive, i.e.
    2*count_j > n_tokens. ``np.unpackbits`` column c of the big-endian
    digest rows is fold bit 63-c, so ``packbits`` of the majority row
    reconstructs the signature directly; the int64 two's-complement
    wrap mirrors the expression form's Long.MIN_VALUE bit-63 add.

    Why a pandas UDF (optimization r9, guide §4.2): the explode + 64
    signed-bit-sum aggregate form (kept below as
    :func:`simhash_signatures_expr`, equality pinned by
    tests/test_dedup.py) spent ~22 s of simhash_dups' 25 s at sf1.0 in
    the 64-accumulator hash aggregate + per-token-row bit projections;
    this kernel computes the identical majority doc-locally in one
    Arrow pass — measured ~12x faster end-to-end, and shuffle-free
    (the groupBy exchange disappears).
    """
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def simhash64(norm):  # no hints: annotations future + local imports
        md5 = hashlib.md5
        out = np.empty(len(norm), np.int64)
        for i, s in enumerate(norm):
            toks = (s or "").split(" ")
            digests = b"".join(
                md5(t.encode("utf-8", "surrogatepass")).digest()[:8]
                for t in toks)
            rows = np.frombuffer(digests, np.uint8).reshape(-1, 8)
            cnt = np.unpackbits(rows, axis=1).sum(axis=0, dtype=np.int64)
            major = (cnt * 2 > len(toks))
            v = int.from_bytes(np.packbits(major).tobytes(), "big")
            out[i] = v - (1 << 64) if v >= (1 << 63) else v
        return pd.Series(out)

    return simhash64


def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(id, simhash long): JVM normalization (the oracle-mirrored
    ``normalized_text``) + the :func:`simhash_udf` Arrow kernel — one
    map-side pass, no explode, no shuffle. Bit-identical to
    :func:`simhash_signatures_expr` (pinned by
    tests/test_dedup.py::test_simhash_udf_matches_expr)."""
    simhash64 = simhash_udf()
    # NULL text drops the row, exactly like the expr form (explode of a
    # NULL token array emits no rows); empty text stays (split("") is
    # [""], one md5("") token, in both engines)
    normed = (df.select(F.col(id_col),
                        normalized_text(F.col(text_col)).alias("_norm"))
                .filter(F.col("_norm").isNotNull()))
    return normed.select(id_col, simhash64(F.col("_norm")).alias("simhash"))


def simhash_signatures_expr(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """(id, simhash long) via explode + 64 signed-bit sums + groupBy —
    the pure-JVM expression form, kept as the independent second engine
    pinning :func:`simhash_signatures`'s Arrow kernel (the quality_vec
    two-engine pattern). ~12x slower at sf1.0 (the 64-accumulator
    aggregate); not used in query paths.

    Tokens explode ONCE and hash ONCE; the 64 per-bit +/-1 contributions
    are narrow projections over that single hash column, and map-side
    partial sums collapse before the shuffle. (The row-local
    ``simhash_col`` variant re-evaluates the token-hash transform per bit
    after projection collapse — measured ~10x slower again; kept for
    single-row uses.)
    """
    # split staged into its own projection: Generate re-evaluates an
    # inline generator expression pathologically on huge strings (same
    # mechanism as the shingle case, see with_shingles) — exploding a
    # projected attribute is linear
    toksed = df.select(
        F.col(id_col),
        F.split(normalized_text(F.col(text_col)), " ").alias("_toks"))
    ex = toksed.select(id_col, F.explode("_toks").alias("_tok"))
    ex = ex.select(id_col, _md5_fold(F.col("_tok")).alias("_h"))
    bit_cols = [
        (F.when(_fold_bit(F.col("_h"), j) == 1, 1)
          .otherwise(-1)).alias(f"_b{j}")
        for j in range(64)]
    sums = (ex.select(id_col, *bit_cols)
              .groupBy(id_col)
              .agg(*[F.sum(f"_b{j}").alias(f"_b{j}") for j in range(64)]))
    sig = F.lit(0).cast("long")
    for j in range(64):
        contrib = F.lit(-(2 ** 63)) if j == 63 else F.lit(2 ** j).cast("long")
        sig = sig + F.when(F.col(f"_b{j}") > 0, contrib) \
                     .otherwise(F.lit(0).cast("long"))
    return sums.select(id_col, sig.alias("simhash"))


def simhash_near_dups(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by Hamming distance, candidates via 4x16-bit bands
    (a pair within Hamming<=3 of 64 bits must match at least one of 4
    16-bit chunks exactly — pigeonhole).

    The signature table is eagerly localCheckpoint'ed (r9, the
    minhash_dedup_pairs pattern): the band self-join consumes it on
    BOTH sides, and since the Arrow-kernel rewrite there is no exchange
    below it for Spark to reuse — without the checkpoint the whole
    scan+normalize+md5 kernel executed twice. 16 bytes/doc, freed by
    the ContextCleaner when the result is GC'd."""
    sig = simhash_signatures(df, text_col, id_col) \
        .localCheckpoint(eager=True)
    chunks = F.array(*[
        F.struct(F.lit(c).alias("chunk_idx"),
                 F.shiftright("simhash", c * 16)
                  .bitwiseAND(F.lit(0xFFFF)).alias("chunk_val"))
        for c in range(4)])
    ex = (sig.select(id_col, "simhash", F.explode(chunks).alias("ch"))
             .select(id_col, "simhash", "ch.chunk_idx", "ch.chunk_val"))
    a = ex.select(F.col(id_col).alias("id_a"),
                  F.col("simhash").alias("sig_a"), "chunk_idx", "chunk_val")
    b = ex.select(F.col(id_col).alias("id_b"),
                  F.col("simhash").alias("sig_b"), "chunk_idx", "chunk_val")
    pairs = (a.join(b, ["chunk_idx", "chunk_val"])
              .filter(F.col("id_a") < F.col("id_b"))
              .select("id_a", "id_b", "sig_a", "sig_b").distinct())
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (pairs.withColumn("hamming", ham)
                 .filter(F.col("hamming") <= max_hamming)
                 .select("id_a", "id_b", "hamming"))


def _free_local_checkpoint(df: DataFrame) -> None:
    """Best-effort release of a ``localCheckpoint``'ed DataFrame's
    cached blocks. There is no public API for this (``unpersist()`` on
    the Dataset is a CacheManager no-op for checkpoint blocks; the
    ContextCleaner only frees them at GC), so this walks the analyzed
    ``LogicalRDD`` to the checkpointed RDD — verified to drop the
    storage entry while leaving DataFrames checkpointed FROM it intact.
    Only ever called on a frame whose every consumer is already
    eagerly materialized; if Spark's internals move, the except leaves
    the blocks to the ContextCleaner (the pre-fix behavior)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def cluster_pairs(pairs: DataFrame, nodes: DataFrame, *,
                  a_col: str = "doc_a", b_col: str = "doc_b",
                  id_col: str = "doc_id",
                  max_iter: int = 50,
                  stats: dict | None = None) -> DataFrame:
    """Near-dup PAIRS -> clusters: connected components by iterative
    min-label propagation. Returns ``(id_col, cluster_rep)`` where
    ``cluster_rep`` is the smallest id in the component — the canonical
    representative a dedup pass keeps (``filter(id == cluster_rep)``).
    ``nodes`` supplies the full id universe, so documents in no pair
    come out as their own singleton representative.

    This closes the pair->keep-set gap: MinHash/SimHash/Jaccard emit
    PAIRS, but transitive near-duplicates (A~B, B~C, A!~C) must collapse
    into ONE cluster or the corpus keeps two of the three.

    Shape: each round joins labels to the (symmetrized, distinct) edge
    list, takes the min neighbor label per node, and lowers labels that
    improved — label(v) converges to min(component) in O(diameter)
    rounds, and near-dup components are shallow (stars around a popular
    template; diameter rarely exceeds 3-4). The driver loop with one
    convergence count per round is the legitimate iterative-algorithm
    shape (GraphX connected components does the same barrier); each
    round is two key shuffles, and ``localCheckpoint`` truncates the
    growing lineage so round N's plan does not replay rounds 1..N-1.
    Raises if max_iter rounds pass without convergence (pathological
    chain-shaped graphs; raise max_iter for those).

    Ids must be losslessly long-castable (the label domain); a NULL /
    malformed / truncating id fails fast with a named error during the
    eager edge/label materialization below (``checked_long``,
    VERDICT r6 #4) instead of an opaque mid-chain ANSI cast error.
    """
    from documentai_spark.functions.ids import checked_long

    def _src_dst(a: str, b: str) -> DataFrame:
        return pairs.select(
            checked_long(F.col(a), "cluster_pairs",
                         pairs.schema[a].dataType).alias("src"),
            checked_long(F.col(b), "cluster_pairs",
                         pairs.schema[b].dataType).alias("dst"))

    edges = (_src_dst(a_col, b_col).union(_src_dst(b_col, a_col))
             .distinct()
             .localCheckpoint(eager=True))   # reused every round
    labels = (nodes.select(checked_long(F.col(id_col), "cluster_pairs",
                                        nodes.schema[id_col].dataType)
                           .alias("node"))
              .distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint(eager=True))
    prev_cp = labels  # the round's eagerly-checkpointed label table
    for round_no in range(1, max_iter + 1):
        nbr_min = (edges
                   .join(labels.select(F.col("node").alias("dst"),
                                       F.col("label").alias("dlab")),
                         "dst")
                   .groupBy("src")
                   .agg(F.min("dlab").alias("cand")))
        new = (labels.join(nbr_min,
                           labels["node"] == nbr_min["src"], "left")
               .select("node",
                       F.least(F.col("label"),
                               F.coalesce(F.col("cand"),
                                          F.col("label")))
                       .alias("label"),
                       (F.col("cand") < F.col("label"))
                       .alias("_lowered"))
               .localCheckpoint(eager=True))
        # `new` is eagerly materialized, so the PRIOR round's checkpoint
        # blocks are unreachable from any live plan — free them now or
        # executor storage holds one label-table copy per round, up to
        # max_iter copies on chain-shaped components (ADVICE r5)
        _free_local_checkpoint(prev_cp)
        prev_cp = new
        changed = new.filter(F.col("_lowered")).limit(1).count()
        labels = new.drop("_lowered")
        if changed == 0:
            # the result depends only on the final label table
            _free_local_checkpoint(edges)
            if stats is not None:
                # observability hook (the sf1 export evidence records
                # the round count); rounds ~ component diameter + 1
                stats["rounds"] = round_no
            return labels.select(F.col("node").alias(id_col),
                                 F.col("label").alias("cluster_rep"))
    _free_local_checkpoint(edges)
    raise RuntimeError(
        f"cluster_pairs did not converge in {max_iter} rounds "
        "(component diameter exceeds max_iter — raise it)")


def near_dedup(df: DataFrame, *, text_col: str = "text",
               id_col: str = "doc_id",
               jaccard_threshold: float = 0.8,
               num_hashes: int = 64, bands: int = 16,
               max_iter: int = 50,
               max_bucket: int | None = 4096) -> DataFrame:
    """One-call near-deduplication, the full production chain:
    MinHash-LSH candidates -> exact shingle-Jaccard verify
    (:func:`minhash_dedup_pairs`) -> transitive cluster closure
    (:func:`cluster_pairs`) -> keep each cluster's min-id
    representative. Returns the SURVIVING rows of ``df`` (all columns),
    plus a ``cluster_rep`` column (== the row's own id, by
    construction) so callers can audit cluster sizes from the pair set
    if needed.

    This is the end-to-end shape a 100 TB curation pass runs: every
    stage is banded/semi-filtered (no all-pairs anywhere), and the
    closure makes the keep-decision TRANSITIVE — without it, A~B and
    B~C with A!~C would keep both A and C's near-identical content.

    r7: only EXACT-duplicate representatives are banded
    (:func:`exact_rep_rows`) — identical texts band identically, so an
    m-copy group used to emit ~bands*m^2/2 candidate rows that the
    verify join then had to carry. The survivor set is unchanged: a
    non-representative exact copy could never be its cluster's min-id
    (its group's representative has a smaller (long, string) key), so
    it was always dropped — now it simply never enters the closure.
    Ids must be losslessly long-castable (the closure's label domain;
    ``checked_long`` fails fast otherwise).

    ``max_bucket`` defaults ON here (4096) — this is the production
    surface, and NEAR-identical mega-groups (which exact_rep_rows cannot
    collapse) would otherwise make a band bucket quadratic; see
    :func:`minhash_lsh_candidates` for the star-join semantics and the
    recall tradeoff. Pass None for the exact all-pairs form.
    """
    rep_src = exact_rep_rows(df.select(id_col, text_col),
                             text_col, id_col, context="near_dedup")
    pairs = minhash_dedup_pairs(rep_src, text_col=text_col,
                                id_col=id_col, num_hashes=num_hashes,
                                bands=bands,
                                jaccard_threshold=jaccard_threshold,
                                max_bucket=max_bucket)
    reps = cluster_pairs(pairs, rep_src.select(id_col), a_col="id_a",
                         b_col="id_b", id_col=id_col,
                         max_iter=max_iter)
    keep = reps.filter(F.col(id_col) == F.col("cluster_rep"))
    return df.join(keep, id_col, "inner")
