"""Streaming near-dedup: bit-identical LSH geometry to the batch chain,
first-wins single-link state semantics, exactly-once batch-replay sink,
TTL bucket eviction, and the curation composition."""

from __future__ import annotations

import datetime as _dt
import glob
import os
import random

from pyspark.sql import functions as F

from documentai_spark.streaming.near_dedup import (
    near_curate_finish, recombine_near_verdicts,
    start_near_dedup_to_parquet, streaming_near_dup_verdicts,
)

_DOCS_DDL = "doc_id bigint, text string, ts timestamp"
_T0 = _dt.datetime(2024, 1, 1, 0, 0, 0)

_VOCAB = [f"tok{i}" for i in range(2000)]


def _mins(m):
    return _T0 + _dt.timedelta(minutes=m)


def _doc(seed, k=120):
    return " ".join(random.Random(seed).choices(_VOCAB, k=k))


def _variant(base, n_swap, seed):
    toks = base.split()
    rng = random.Random(seed)
    for _ in range(n_swap):
        toks[rng.randrange(len(toks))] = rng.choice(_VOCAB)
    return " ".join(toks)


def _star_corpus(n_clusters=6, with_ts=False):
    """Clear-margin star clusters: base + two close variants (true
    Jaccard ~0.9, far above the 0.7 test threshold so the 64-hash
    estimator's ~0.06 std cannot flip a decision) + one unrelated doc
    (Jaccard ~0)."""
    rows = []
    for c in range(n_clusters):
        base = _doc(c)
        rows.append((c * 10, base))
        rows.append((c * 10 + 1, _variant(base, 2, c + 100)))
        rows.append((c * 10 + 2, _variant(base, 3, c + 200)))
    rows.append((990, _doc(990)))
    if with_ts:
        return [(i, t, _T0) for i, t in rows]
    return rows


def _append_file(spark, in_dir, rows, ddl="doc_id bigint, text string"):
    spark.createDataFrame(rows, ddl).coalesce(1) \
        .write.mode("append").parquet(in_dir)


def _drain(spark, in_dir, out_dir, ckpt,
           ddl="doc_id bigint, text string", **kw):
    stream = spark.readStream.schema(ddl).parquet(in_dir)
    q = start_near_dedup_to_parquet(
        streaming_near_dup_verdicts(stream, threshold=0.7, **kw),
        out_dir, ckpt)
    q.awaitTermination(300)


def test_local_signature_bit_identity(spark):
    """The doc-local (stream-safe) signature equals the batch
    explode+groupBy signature bit-for-bit — same shingler, same salted
    xxhash64 permutations, so streaming buckets are the batch buckets."""
    from documentai_spark.operators.dedup import (
        minhash_signatures_agg, with_minhash_signature_local,
    )
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text").limit(80))
    batch = {r["doc_id"]: r["_sig"] for r in
             minhash_signatures_agg(docs, num_hashes=32).collect()}
    local = {r["doc_id"]: r["_sig"] for r in
             with_minhash_signature_local(docs, num_hashes=32)
             .select("doc_id", "_sig").collect()}
    assert local == batch


def test_single_drain_matches_batch_near_dedup(spark, tmp_path):
    """One-batch drain on a star corpus: the unflagged survivor set
    equals batch near_dedup's keep set (min-id per cluster — streaming
    processes each bucket in ascending id order), every flagged doc
    points at its cluster's base, and exact re-ingestion semantics are
    first-wins."""
    from documentai_spark.operators.dedup import near_dedup

    rows = _star_corpus()
    in_dir = str(tmp_path / "sm_in")
    out_dir = str(tmp_path / "sm_out")
    _append_file(spark, in_dir, rows)

    _drain(spark, in_dir, out_dir, str(tmp_path / "sm_ck"))
    got = spark.read.parquet(out_dir)
    assert got.count() == len(rows)

    survivors = {r.doc_id for r in
                 got.filter(~F.col("is_near_dup")).collect()}
    batch_keep = {r.doc_id for r in near_dedup(
        spark.createDataFrame(rows, "doc_id long, text string"),
        jaccard_threshold=0.7).collect()}
    assert survivors == batch_keep

    reps = {r.doc_id: r.near_rep for r in
            got.filter(F.col("is_near_dup")).collect()}
    assert reps == {c * 10 + v: c * 10 for c in range(6) for v in (1, 2)}
    # estimates are real similarities, not sentinel values
    ests = [r.near_est for r in got.filter(F.col("is_near_dup")).collect()]
    assert all(0.7 <= e <= 1.0 for e in ests)


def test_cross_batch_state_flags_later_near_dups(spark, tmp_path):
    """Band-bucket state persists across drains: a near-dup landing in a
    later micro-batch is flagged against the earlier batch's stored
    representative, and single-link chaining works across batches (C
    similar to B, B flagged against A -> C flagged via B's rep entry)."""
    in_dir = str(tmp_path / "cb_in")
    out_dir = str(tmp_path / "cb_out")
    ckpt = str(tmp_path / "cb_ck")
    base = _doc(42)

    _append_file(spark, in_dir, [(1, base), (50, _doc(50))])
    _drain(spark, in_dir, out_dir, ckpt)

    drift_b = _variant(base, 2, 7)
    _append_file(spark, in_dir, [(2, drift_b)])
    _drain(spark, in_dir, out_dir, ckpt)

    # C: 2 more swaps on B (close to B; base-similarity lower but still
    # linked through B's rep entries in B's unclaimed buckets)
    _append_file(spark, in_dir, [(3, _variant(drift_b, 2, 8))])
    _drain(spark, in_dir, out_dir, ckpt)

    got = {r.doc_id: (r.is_near_dup, r.near_rep)
           for r in spark.read.parquet(out_dir).collect()}
    assert got[1] == (False, None)
    assert got[50] == (False, None)
    assert got[2] == (True, 1)
    assert got[3][0] is True
    assert got[3][1] in (1, 2)  # direct hit on base or chained via B


def test_batch_replay_is_exactly_once(spark, tmp_path):
    """Crash-between-write-and-commit analog: roll back the newest
    commit-log entry and restart. The replayed micro-batch overwrites
    its own _batch_id partition (dynamic partition overwrite), so the
    final output is row-identical to the pre-rollback output — the
    foreachBatch sink really is exactly-once, not at-least-once.
    MULTI-batch on purpose: only the replayed batch's partition may be
    rewritten — a static-overwrite bug that wiped the earlier batches'
    partitions would fail the row-identity check."""
    rows = _star_corpus(n_clusters=3)
    in_dir = str(tmp_path / "eo_in")
    out_dir = str(tmp_path / "eo_out")
    ckpt = str(tmp_path / "eo_ck")
    # three files, drained one per trigger -> three _batch_id partitions
    per = (len(rows) + 2) // 3
    for i in range(3):
        _append_file(spark, in_dir, rows[i * per:(i + 1) * per])
    stream = (spark.readStream.schema("doc_id bigint, text string")
              .option("maxFilesPerTrigger", 1).parquet(in_dir))
    q = start_near_dedup_to_parquet(
        streaming_near_dup_verdicts(stream, threshold=0.7),
        out_dir, ckpt)
    q.awaitTermination(300)
    n_parts = len(glob.glob(os.path.join(out_dir, "_batch_id=*")))
    assert n_parts >= 2, f"need multiple batches, got {n_parts}"

    def snapshot():
        return sorted(
            (r.doc_id, r.is_near_dup, r.near_rep)
            for r in spark.read.parquet(out_dir).collect())

    before = snapshot()
    assert len(before) == len(rows)

    commits = sorted(glob.glob(os.path.join(ckpt, "commits", "*")))
    real = [p for p in commits if not p.endswith(".tmp")]
    assert real, "no commits written"
    os.remove(real[-1])  # the crash: data landed, commit did not
    # drop the local-FS checksum sidecar too, or Hadoop's rename-back
    # refuses the replayed commit ("destination .crc already exists")
    crc = os.path.join(os.path.dirname(real[-1]),
                       "." + os.path.basename(real[-1]) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)

    _drain(spark, in_dir, out_dir, ckpt)  # restart replays the batch
    assert snapshot() == before


def test_ttl_bucket_eviction_readmits(spark, tmp_path):
    """Bounded-state mode: an in-TTL near-dup is flagged; once the
    watermark passes a bucket's first sighting + ttl the bucket resets
    and near-identical content re-admits unflagged (the windowed-dedup
    tradeoff, same contract as streaming_first_wins_dedup)."""
    in_dir = str(tmp_path / "ttl_in")
    out_dir = str(tmp_path / "ttl_out")
    ckpt = str(tmp_path / "ttl_ck")
    base = _doc(9)
    kw = dict(ddl=_DOCS_DDL, ttl="1 hour", watermark="10 minutes")

    # drain 1: first sighting at t0 (bucket expiry = t0 + 1h)
    _append_file(spark, in_dir, [(1, base, _T0)], _DOCS_DDL)
    _drain(spark, in_dir, out_dir, ckpt, **kw)
    # drain 2: in-TTL variant (wm = t0 - 10m) flagged; unrelated
    # advancer pushes the committed watermark to t0 + 170m
    _append_file(spark, in_dir, [(2, _variant(base, 2, 5), _mins(5)),
                                 (60, _doc(60), _mins(180))], _DOCS_DDL)
    _drain(spark, in_dir, out_dir, ckpt, **kw)
    # drain 3: wm (170m) has passed expiry (60m) — buckets reset, a
    # near-identical doc re-admits unflagged
    _append_file(spark, in_dir, [(3, _variant(base, 2, 6), _mins(180))],
                 _DOCS_DDL)
    _drain(spark, in_dir, out_dir, ckpt, **kw)

    got = {r.doc_id: (r.is_near_dup, r.near_rep)
           for r in spark.read.parquet(out_dir).collect()}
    assert got[1] == (False, None)
    assert got[2] == (True, 1)
    assert got[60] == (False, None)
    assert got[3] == (False, None)  # re-admitted after eviction


def test_near_curate_composition(spark, tmp_path):
    """The curation composition: extraction + quality + verdict + the
    row-local flags run statelessly in the sink, and `keep` folds
    is_near_dup exactly like the batch with_curation_flags(near_dedup=
    True) path."""
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text").limit(60))
    in_dir = str(tmp_path / "nc_in")
    out_dir = str(tmp_path / "nc_out")
    docs.coalesce(1).write.parquet(in_dir)

    stream = spark.readStream.schema("doc_id bigint, text string") \
        .parquet(in_dir)
    q = start_near_dedup_to_parquet(
        streaming_near_dup_verdicts(stream),
        out_dir, str(tmp_path / "nc_ck"),
        finish=near_curate_finish())
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir)
    assert got.count() == 60
    cols = set(got.columns)
    assert {"keep", "is_near_dup", "bad_lang", "bad_len", "low_conf",
            "confidence"} <= cols
    # keep identity: flagged-or-bad rows are excluded, others kept
    bad = got.filter(
        F.col("keep") != ~(F.col("is_dup") | F.col("is_near_dup")
                           | F.col("bad_lang") | F.col("bad_len")
                           | F.col("low_conf")))
    assert bad.count() == 0


def test_same_batch_duplicate_id_not_self_flagged(spark, tmp_path):
    """r7 review repro: two copies of the SAME doc_id in ONE micro-batch
    merge into one output row (the sink's per-doc groupBy) — that row
    must NOT be self-flagged as a near-dup, or first-wins keep logic
    drops the content entirely and a row vanishes. A copy arriving in a
    LATER batch still flags against its own first copy (first-wins,
    matching streaming_first_wins_dedup)."""
    in_dir = str(tmp_path / "sb_in")
    out_dir = str(tmp_path / "sb_out")
    ckpt = str(tmp_path / "sb_ck")
    base = _doc(3)

    _append_file(spark, in_dir, [(7, base), (7, base), (9, _doc(9))])
    _drain(spark, in_dir, out_dir, ckpt)
    got = {r.doc_id: (r.is_near_dup, r.near_rep)
           for r in spark.read.parquet(out_dir).collect()}
    # one row per distinct id, neither flagged
    assert got == {7: (False, None), 9: (False, None)}

    # cross-batch re-ingest of the SAME id: flagged against itself
    _append_file(spark, in_dir, [(7, base)])
    _drain(spark, in_dir, out_dir, ckpt)
    later = {(r.doc_id, r.is_near_dup, r.near_rep)
             for r in spark.read.parquet(out_dir).collect()}
    assert (7, True, 7) in later and (7, False, None) in later

    # and a same-batch NEAR-dup pair of the duplicated id still flags
    # (the mask is per-id, not a blanket same-batch exemption)
    in2 = str(tmp_path / "sb_in2")
    out2 = str(tmp_path / "sb_out2")
    _append_file(spark, in2, [(4, base), (4, base),
                              (5, _variant(base, 2, 44))])
    _drain(spark, in2, out2, str(tmp_path / "sb_ck2"))
    got2 = {r.doc_id: (r.is_near_dup, r.near_rep)
            for r in spark.read.parquet(out2).collect()}
    assert got2 == {4: (False, None), 5: (True, 4)}


def test_reserved_verdict_columns_refused(spark):
    """The sink re-emits payload columns next to is_near_dup/near_rep/
    near_est, and the plan projects _id/_sig/_doc working columns — an
    input stream already carrying one of those names is refused up
    front (batch with_curation_flags house style), not left to die as
    an ambiguous-reference error mid-stream."""
    import pytest

    df = spark.createDataFrame([(1, "t", True)],
                               "doc_id long, text string, "
                               "is_near_dup boolean")
    with pytest.raises(ValueError, match="reserves column names"):
        streaming_near_dup_verdicts(df)


def test_non_long_castable_id_fails_fast(spark, tmp_path):
    """The long-label-domain contract holds on the streaming surface
    too: a non-numeric id raises the named checked_long error instead of
    silently nulling the verdict."""
    import pytest

    in_dir = str(tmp_path / "id_in")
    _append_file(spark, in_dir, [("doc-abc", _doc(1))],
                 "doc_id string, text string")
    stream = spark.readStream.schema("doc_id string, text string") \
        .parquet(in_dir)
    q = start_near_dedup_to_parquet(
        streaming_near_dup_verdicts(stream),
        str(tmp_path / "id_out"), str(tmp_path / "id_ck"))
    with pytest.raises(Exception, match="long-castable|streaming_near_dup"):
        q.awaitTermination(300)
        if q.exception() is not None:
            raise q.exception()


def test_bad_geometry_rejected():
    import pytest
    with pytest.raises(ValueError, match="multiple"):
        streaming_near_dup_verdicts(None, num_hashes=60, bands=16)


def test_invariants_on_random_corpus(spark, tmp_path):
    """Properties that hold regardless of estimator noise, on a corpus
    with NO engineered margins (random overlap levels): every row is
    emitted exactly once; a flagged doc's rep has a SMALLER id (a
    single-batch drain processes each bucket in ascending id order, so
    attribution can only point backwards); estimates are within the
    threshold..1 range; and an independent re-run from scratch produces
    the identical verdict set (pure function of the batch sequence)."""
    rng = random.Random(11)
    pool = _doc(777, k=400).split()
    rows = []
    for i in range(80):
        # random-length random-overlap docs: shared pool + private tail
        k = rng.randrange(30, 120)
        toks = rng.choices(pool, k=k) + \
            [f"p{i}x{j}" for j in range(rng.randrange(0, 30))]
        rng.shuffle(toks)
        rows.append((i, " ".join(toks)))

    def run(tag):
        in_dir = str(tmp_path / f"rw_in_{tag}")
        out_dir = str(tmp_path / f"rw_out_{tag}")
        _append_file(spark, in_dir, rows)
        _drain(spark, in_dir, out_dir, str(tmp_path / f"rw_ck_{tag}"))
        return sorted(
            (r.doc_id, r.is_near_dup, r.near_rep, r.near_est)
            for r in spark.read.parquet(out_dir).collect())

    got = run("a")
    assert [g[0] for g in got] == list(range(80))
    for doc_id, flagged, rep, est in got:
        if flagged:
            assert rep < doc_id
            assert 0.7 <= est <= 1.0
        else:
            assert rep is None and est is None
    assert run("b") == got


def test_batch_id_input_column_refused(spark):
    """'_batch_id' is the sink's partition column: an input stream
    already carrying it (e.g. a prior run's flagged output re-ingested
    without dropping it) would be silently clobbered and consumed as
    the partition key — the entry guard must name it reserved
    (r7 review: the reserved set omitted exactly the column its own
    error message's scenario carries)."""
    import pytest

    df = spark.createDataFrame([(1, "t", 0)],
                               "doc_id long, text string, "
                               "_batch_id long")
    with pytest.raises(ValueError, match="reserves column names"):
        streaming_near_dup_verdicts(df)


def test_fresh_checkpoint_over_stale_output_refused(spark, tmp_path):
    """Reusing an out_path under a FRESH checkpoint restarts batch ids
    at 0 and dynamic overwrite would only replace a prefix of the old
    partitions — two runs' docs silently mixed. Refused up front; the
    same out_path with the ORIGINAL checkpoint stays legal (that is the
    exactly-once replay path)."""
    import shutil

    import pytest

    rows = _star_corpus()
    in_dir = str(tmp_path / "fr_in")
    out_dir = str(tmp_path / "fr_out")
    ck = str(tmp_path / "fr_ck")
    _append_file(spark, in_dir, rows)
    _drain(spark, in_dir, out_dir, ck)
    n1 = spark.read.parquet(out_dir).count()

    # same checkpoint: legal, adds nothing (exactly-once)
    _drain(spark, in_dir, out_dir, ck)
    assert spark.read.parquet(out_dir).count() == n1

    # fresh checkpoint over the populated output: refused
    shutil.rmtree(ck)
    with pytest.raises(ValueError, match="checkpoint .* is fresh"):
        _drain(spark, in_dir, out_dir, ck)


def _true_jaccard(a: str, b: str, w: int = 3) -> float:
    """Pure-python replica of the batch verify on pre-normalized
    token-soup text (w-token shingles, distinct, intersection over
    union) — exact for the _VOCAB corpora, which normalization leaves
    unchanged."""
    def sh(t):
        toks = t.split(" ")
        return set(" ".join(toks[i:i + w]) for i in range(len(toks) - w + 1)) \
            if len(toks) >= w else {t}
    sa, sb = sh(a), sh(b)
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def _find_estimator_false_flag(spark, threshold=0.7):
    """Search for a pair whose TRUE Jaccard is below the threshold but
    whose 64-hash MinHash estimate is at-or-above it AND shares at
    least one band bucket — the borderline false-flag the streaming
    estimator produces and exact_verify must demote. Deterministic:
    fixed seeds, first hit wins."""
    from documentai_spark.operators.dedup import (
        with_minhash_signature_local,
    )

    cands = []
    for seed in range(80):
        base = _doc(seed, k=120)
        for n_swap in (7, 8, 9, 10, 11, 12):
            v = _variant(base, n_swap, seed * 100 + n_swap)
            tj = _true_jaccard(base, v)
            if 0.58 <= tj <= 0.695:
                cands.append((seed, n_swap, base, v, tj))
    rows = []
    for i, (seed, n_swap, base, v, tj) in enumerate(cands):
        rows.append((i * 2, base))
        rows.append((i * 2 + 1, v))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["doc_id"]: list(r["_sig"]) for r in
            with_minhash_signature_local(df, "text", 64)
            .select("doc_id", "_sig").collect()}
    for i, (seed, n_swap, base, v, tj) in enumerate(cands):
        sa, sb = sigs[i * 2], sigs[i * 2 + 1]
        eq = [x == y for x, y in zip(sa, sb)]
        est = sum(eq) / 64.0
        band_hit = any(all(eq[b * 4:(b + 1) * 4]) for b in range(16))
        if est >= threshold and band_hit and tj < threshold:
            return base, v, tj, est
    raise AssertionError("no estimator false-flag pair found in the "
                         "search space — widen the seed range")


def test_exact_verify_demotes_estimator_false_flags(spark, tmp_path):
    """exact_verify=True recomputes the TRUE shingle Jaccard for every
    flag in the sink's batch domain: an estimator false-flag (true J
    below threshold, estimate at/above it) is demoted to unflagged,
    while a genuine near-dup stays flagged — surviving flags are
    batch-true."""
    base, fp_variant, tj, est = _find_estimator_false_flag(spark)
    assert tj < 0.7 <= est
    true_dup = _variant(base, 2, 9999)       # true J ~0.9: stays
    rows = [(1, base), (2, fp_variant), (3, true_dup)]
    in_dir = str(tmp_path / "ev_in")
    _append_file(spark, in_dir, rows)

    # control: without exact_verify the estimator false-flag sticks
    out_a = str(tmp_path / "ev_out_a")
    _drain(spark, in_dir, out_a, str(tmp_path / "ev_ck_a"))
    got_a = {r.doc_id: r.is_near_dup
             for r in spark.read.parquet(out_a).collect()}
    assert got_a[2] is True, "setup: estimator must flag the pair"
    assert got_a[3] is True

    # exact_verify: the false flag demotes, the true dup stays
    stream = (spark.readStream.schema("doc_id bigint, text string")
              .parquet(in_dir))
    out_b = str(tmp_path / "ev_out_b")
    q = start_near_dedup_to_parquet(
        streaming_near_dup_verdicts(stream, threshold=0.7),
        out_b, str(tmp_path / "ev_ck_b"),
        exact_verify=True, threshold=0.7)
    q.awaitTermination(300)
    got_b = {r.doc_id: (r.is_near_dup, r.near_rep)
             for r in spark.read.parquet(out_b).collect()}
    assert got_b[1] == (False, None)
    assert got_b[2] == (False, None), "false flag must be demoted"
    assert got_b[3] == (True, 1), "true near-dup must stay flagged"


def test_exact_verify_cross_batch_rep_lookup(spark, tmp_path):
    """exact_verify fetches the representative's text from the already
    written output when the rep landed in an EARLIER micro-batch."""
    base = _doc(77)
    in_dir = str(tmp_path / "ev2_in")
    out = str(tmp_path / "ev2_out")
    ck = str(tmp_path / "ev2_ck")

    def drain():
        stream = (spark.readStream.schema("doc_id bigint, text string")
                  .parquet(in_dir))
        q = start_near_dedup_to_parquet(
            streaming_near_dup_verdicts(stream, threshold=0.7),
            out, ck, exact_verify=True, threshold=0.7)
        q.awaitTermination(300)

    _append_file(spark, in_dir, [(1, base), (50, _doc(50))])
    drain()
    _append_file(spark, in_dir, [(2, _variant(base, 2, 5))])
    drain()
    got = {r.doc_id: (r.is_near_dup, r.near_rep)
           for r in spark.read.parquet(out).collect()}
    assert got[1] == (False, None)
    assert got[2] == (True, 1), \
        "true near-dup must survive exact re-verify across batches"


def test_borderline_agreement_outside_two_sigma(spark, tmp_path):
    """VERDICT r7 #2: the streaming estimator's verdicts must agree
    with batch near_dedup for every pair whose true Jaccard sits
    OUTSIDE the estimator's ~2-sigma band around the threshold
    (|J - 0.7| > 0.1 here), and with exact_verify the flag set must
    additionally contain NO below-threshold pair at ANY margin (false
    flags demote exhaustively). Deterministic corpus: measured true J,
    fixed seeds, the salted-xxhash64 MinHash is seed-stable."""
    from documentai_spark.operators.dedup import near_dedup

    clear_below, clear_above = [], []
    seed = 5000
    while (len(clear_below) < 12 or len(clear_above) < 12) \
            and seed < 5600:
        base = _doc(seed, k=140)
        for n_swap, sink in ((2, clear_above), (18, clear_below)):
            if len(sink) >= 12:
                continue
            v = _variant(base, n_swap, seed * 7 + n_swap)
            tj = _true_jaccard(base, v)
            if sink is clear_above and tj >= 0.82:
                sink.append((base, v, tj))
                break
            if sink is clear_below and tj <= 0.58:
                sink.append((base, v, tj))
                break
        seed += 1
    assert len(clear_below) == 12 and len(clear_above) == 12

    pairs = clear_above + clear_below
    rows = []
    tj_of = {}
    for i, (b, v, tj) in enumerate(pairs):
        rows.append((i * 2, b))
        rows.append((i * 2 + 1, v))
        tj_of[i * 2 + 1] = tj
    in_dir = str(tmp_path / "ba_in")
    # bases then variants: verdicts cross the state store
    _append_file(spark, in_dir, [r for r in rows if r[0] % 2 == 0])
    _append_file(spark, in_dir, [r for r in rows if r[0] % 2 == 1])
    all_docs = spark.read.parquet(in_dir)

    kept = {r.doc_id for r in near_dedup(
        all_docs, jaccard_threshold=0.7).collect()}
    batch_flag = {i for i in tj_of if i not in kept}

    stream = (spark.readStream.schema("doc_id bigint, text string")
              .option("maxFilesPerTrigger", 1).parquet(in_dir))
    out = str(tmp_path / "ba_out")
    q = start_near_dedup_to_parquet(
        streaming_near_dup_verdicts(stream, threshold=0.7),
        out, str(tmp_path / "ba_ck"), exact_verify=True, threshold=0.7)
    q.awaitTermination(300)
    ev_flag = {r.doc_id for r in spark.read.parquet(out)
               .filter(F.col("is_near_dup")).collect()}

    # clear margins (|J - thr| > 2 sigma): full agreement with batch
    assert ev_flag == batch_flag
    # and the exact_verify invariant at ANY margin: no false flags
    assert all(tj_of[i] >= 0.7 for i in ev_flag)


def test_first_batch_crash_replay_not_refused(spark, tmp_path):
    """First-batch-crash analog (r7 ADVICE): the stream dies after
    batch 0's data write but before commits/0 lands. The checkpoint's
    commits dir is then EMPTY while _batch_id=0 exists in the output —
    a commits-based freshness check misclassified this as a fresh
    query over stale output and refused the legitimate exactly-once
    replay. Freshness now derives from the offsets dir (any offsets
    file means batch ids resume, not restart): the restart must be
    accepted and reproduce the single-run output exactly."""
    rows = _star_corpus(n_clusters=3)
    in_dir = str(tmp_path / "fb_in")
    out_dir = str(tmp_path / "fb_out")
    ck = str(tmp_path / "fb_ck")
    _append_file(spark, in_dir, rows)
    _drain(spark, in_dir, out_dir, ck)

    def snapshot():
        return sorted((r.doc_id, r.is_near_dup, r.near_rep)
                      for r in spark.read.parquet(out_dir).collect())

    before = snapshot()
    assert len(before) == len(rows)

    # the crash: remove EVERY commit entry (batch 0's data landed, its
    # commit never did) — offsets/0 stays, which is what a real
    # first-batch crash leaves behind
    for p in glob.glob(os.path.join(ck, "commits", "*")):
        os.remove(p)
    crc_dir = os.path.join(ck, "commits")
    for p in glob.glob(os.path.join(crc_dir, ".*.crc")):
        if os.path.exists(p):
            os.remove(p)
    assert glob.glob(os.path.join(ck, "offsets", "*")), \
        "test setup: offsets dir must be non-empty"

    _drain(spark, in_dir, out_dir, ck)  # must NOT raise; replays batch 0
    assert snapshot() == before
