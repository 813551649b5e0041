"""Per-partition checkpoint/resume driver loop with lineage metrics.

``north_rule``: "resumable from checkpoint with per-partition lineage +
metrics". The reference's analog is the per-step ``processing_history``
lineage list (api-gateway/app.py:325-331,514-520,624-631); at table scale
this becomes a driver loop over stable input partitions:

- the input is split into ``n_buckets`` deterministic partitions
  ``bucket = pmod(hash(conv_id), n_buckets)`` (the parquet stand-in for an
  Iceberg ``bucket(N, conv_id)`` partition spec — whole conversations never
  straddle a bucket, so per-conversation ordering stays partition-local);
- each bucket is processed independently and written with
  ``mode("overwrite")`` into its own ``bucket=K`` directory (the parquet
  stand-in for Iceberg ``overwritePartitions`` — re-running a bucket
  replaces it wholly, never appends, so resume is idempotent;
  SURVEY §7.4 risk #5);
- a manifest JSON file per bucket records lineage
  ``{partition, status, rows_in, rows_out, bytes_out, failures, started,
  finished, wall_sec}`` and is committed atomically (tmp + rename) AFTER
  the data write succeeds;
- resume = skip buckets whose manifest says ``done``; a bucket killed
  mid-write has no manifest and is re-run from scratch.

On a real cluster each bucket is a full multi-executor Spark job over one
Iceberg partition; the loop adds no serialization beyond job boundaries
(inside a bucket all parallelism is Spark's). Buckets also bound failure
blast radius at 100 TB: one lost job loses 1/N of the work.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from documentai_spark.plans.pipeline import extraction_pipeline

MANIFEST_DIR = "_checkpoints"


def _manifest_path(out_path: str, bucket: int) -> str:
    return os.path.join(out_path, MANIFEST_DIR, f"bucket-{bucket:05d}.json")


def read_manifest(out_path: str) -> dict[int, dict]:
    """All committed bucket manifests (driver-side). A truncated or
    corrupt manifest (crash between rename and data-block flush on a
    non-fsync filesystem, pre-r7 files) reads as NOT done — the bucket
    is idempotently re-runnable by design, so the recovery for a bad
    manifest is simply to redo that bucket, never to brick resume."""
    d = os.path.join(out_path, MANIFEST_DIR)
    out: dict[int, dict] = {}
    if not os.path.isdir(d):
        return out
    for fn in os.listdir(d):
        if fn.startswith("bucket-") and fn.endswith(".json"):
            try:
                with open(os.path.join(d, fn)) as f:
                    rec = json.load(f)
            except (json.JSONDecodeError, OSError):
                continue
            # valid JSON that is not a bucket record (hand-edited or
            # foreign tool) must ALSO read as not-done, not KeyError —
            # per the contract above, never brick resume on a bad file
            if not isinstance(rec, dict) or \
                    not isinstance(rec.get("partition"), int):
                continue
            out[rec["partition"]] = rec
    return out


def _atomic_write_json(path: str, rec: dict) -> None:
    """Atomic commit: tmp + fsync + rename (a crash never leaves a half
    manifest) — the ONE commit protocol shared by bucket and stage
    manifests, so protocol changes (fsync, versioning) cannot diverge.
    The fsync matters: os.replace orders the RENAME but not the data
    blocks, so without it a power loss could commit a zero-length
    manifest over a completed bucket (r7 review)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _commit_manifest(out_path: str, rec: dict) -> None:
    _atomic_write_json(_manifest_path(out_path, rec["partition"]), rec)


def _stage_manifest_path(out_path: str, name: str) -> str:
    return os.path.join(out_path, MANIFEST_DIR, f"stage-{name}.json")


def read_stage_manifest(out_path: str, name: str) -> dict | None:
    """A named (non-bucket) stage's committed manifest, or None. Corrupt
    manifests read as None (stage pending) — see read_manifest."""
    path = _stage_manifest_path(out_path, name)
    if not os.path.isfile(path):
        return None
    try:
        with open(path) as f:
            rec = json.load(f)
    except (json.JSONDecodeError, OSError):
        return None
    # a non-dict manifest (valid JSON, wrong shape) reads as pending too
    return rec if isinstance(rec, dict) else None


def _commit_stage_manifest(out_path: str, name: str, rec: dict) -> None:
    """Stage commit under the shared atomic protocol; committed only
    AFTER the stage's data write succeeded, so a kill mid-stage leaves
    no manifest and the stage re-runs from scratch."""
    _atomic_write_json(_stage_manifest_path(out_path, name), rec)


def _clear_stage_manifest(out_path: str, name: str) -> None:
    """Invalidate a stage BEFORE re-executing it (r7 review): without
    this, a recompute (``resume=False``, or a config-changed re-run)
    that crashes mid-write leaves the PRIOR run's ``done`` manifest
    standing over a half-overwritten data directory, and a later
    ``--resume`` would skip the stage and serve the corruption. The
    kill-mid-stage invariant ('no manifest -> stage re-runs') must hold
    for re-executions, not just fresh output directories."""
    try:
        os.remove(_stage_manifest_path(out_path, name))
    except FileNotFoundError:
        pass


def lineage_table(spark: SparkSession, out_path: str):
    """The `_lineage` table view: committed manifests as a DataFrame
    (the Iceberg commit-metadata analog; SURVEY §1.1 lineage record).
    Covers BOTH loop shapes: the curation loop's kept/near_dup lineage
    columns are included (null for extraction manifests) — r7 review
    found the hardcoded extraction schema silently dropped them."""
    schema = ("partition int, status string, rows_in long, rows_out long, "
              "kept long, near_dup long, near_dedup boolean, "
              "bytes_out long, failures int, started double, "
              "finished double, wall_sec double")
    fields = [s.split()[0] for s in schema.split(", ")]
    recs = [{k: rec.get(k) for k in fields}
            for rec in read_manifest(out_path).values()]
    return spark.createDataFrame(recs, schema)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total


def run_checkpointed(spark: SparkSession, in_path: str, out_path: str, *,
                     n_buckets: int = 16, salt_buckets: int = 16,
                     include_entities: bool = False,
                     max_buckets: int | None = None,
                     log=print) -> dict:
    """Process bucket-by-bucket with resume. Returns aggregate stats.

    ``max_buckets`` processes at most that many pending buckets then
    returns (the kill-and-resume test hook).

    Per-bucket job sizing: each bucket is ~1/n_buckets of the input, so
    its pipeline gets shuffle_partitions/n_buckets partitions (floor 4) —
    a bucket job should not pay the full-table task count. Lineage counts
    ride the single write job via Observations (no re-read, no extra
    count jobs).

    Scan note (r7 review): the ``pmod(hash(conv_id), n)`` predicate is a
    cheap JVM hash over one short column, but it cannot push to plain
    parquet, so the loop reads the input n_buckets times. On the real
    deployment the input is an Iceberg table with a ``bucket(N,
    conv_id)`` partition spec and the SAME predicate prunes to one
    partition per job — the stand-in inefficiency is parquet-only. The
    curation loop's key, by contrast, needs a full regex normalization
    per evaluation, so it stages the input through
    :func:`_bucketize_stage` even here; staging conv_id-bucketed
    transcripts too would double the storage write for a predicate
    that costs ~nothing to re-evaluate.
    """
    from pyspark.sql.observation import Observation

    sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    bucket_partitions = max(4, sp // n_buckets)
    src = spark.read.parquet(in_path)
    if "_bucket" in src.columns:
        raise ValueError(
            "input already has a '_bucket' column — the checkpoint loop "
            "derives its own bucket key under that name and would "
            "silently clobber and drop the input's; rename it upstream")
    src = src.withColumn("_bucket",
                         F.pmod(F.hash("conv_id"), F.lit(n_buckets)))
    done = read_manifest(out_path)
    # committed buckets are only resumable under the SAME bucketing and
    # output schema (r7 review: resuming an --entities run over a plain
    # one would silently serve half the conversations without entity
    # columns; a different n_buckets would double-write rows). A manifest
    # with NO recorded config (pre-guard rounds) must read as a MISMATCH,
    # not default to the current config — defaulting passed exactly the
    # legacy outputs the guard exists to protect (r7 review #2).
    config = {"n_buckets": n_buckets,
              "include_entities": include_entities}
    stale = [b for b, rec in done.items()
             if rec.get("config") != config]
    if stale:
        raise ValueError(
            f"output {out_path!r} holds buckets committed with a "
            f"different configuration (e.g. bucket {stale[0]}: "
            f"{done[stale[0]].get('config')} vs {config}); resuming "
            "would mix schemas or bucketing — use a fresh output "
            "directory or matching arguments")
    stats = {"rows_in": 0, "rows_out": 0, "bytes_out": 0, "failures": 0,
             "buckets_done": 0, "buckets_skipped": 0}
    processed = 0
    for bucket in range(n_buckets):
        prior = done.get(bucket)
        if prior and prior.get("status") == "done":
            stats["buckets_skipped"] += 1
            stats["rows_in"] += prior["rows_in"]
            stats["rows_out"] += prior["rows_out"]
            stats["bytes_out"] += prior.get("bytes_out", 0)
            continue
        if max_buckets is not None and processed >= max_buckets:
            continue
        started = time.time()
        obs_in = Observation(f"in_{bucket}")
        obs_out = Observation(f"out_{bucket}")
        part = src.filter(F.col("_bucket") == bucket).drop("_bucket")
        out = extraction_pipeline(part, salt_partitions=bucket_partitions,
                                  salt_buckets=salt_buckets,
                                  include_entities=include_entities,
                                  input_observation=obs_in)
        # BOTH lineage counts ride the single write job: rows_in is
        # observed just above the pipeline's exchange (the range-sampling
        # job re-executes only the subplan below it — no double count and
        # no extra per-bucket scan; VERDICT r2 'What's wrong' #2),
        # rows_out above the final projection.
        out = out.observe(obs_out, F.count(F.lit(1)).alias("n"))
        bucket_dir = os.path.join(out_path, f"bucket={bucket}")
        out.write.mode("overwrite").parquet(bucket_dir)
        rows_out = obs_out.get["n"]
        rows_in = obs_in.get["n"]
        rec = {
            "partition": bucket, "status": "done",
            "rows_in": rows_in, "rows_out": rows_out,
            "bytes_out": _dir_bytes(bucket_dir),
            "failures": 0, "config": config,
            "started": started, "finished": time.time(),
            "wall_sec": round(time.time() - started, 3),
        }
        _commit_manifest(out_path, rec)
        processed += 1
        stats["buckets_done"] += 1
        stats["rows_in"] += rows_in
        stats["rows_out"] += rows_out
        stats["bytes_out"] += rec["bytes_out"]
        log(f"[checkpoint] bucket {bucket}/{n_buckets}: "
            f"{rows_out} rows, {rec['wall_sec']}s")
    # a max_buckets-limited run must be distinguishable from a complete
    # one — its aggregate counts cover only the processed+skipped subset
    # (r7 review; run_prepare_stages already marks partial runs)
    pending = n_buckets - stats["buckets_done"] - stats["buckets_skipped"]
    if pending > 0:
        stats["buckets_pending"] = pending
        stats["incomplete"] = True
    return stats


def zero_nulls(metrics) -> dict:
    """Observation metrics with SQL-NULL sums coalesced to 0: SUM over
    zero observed rows is None, and the accounting arithmetic
    (``rows - surviving`` etc.) would raise TypeError on an empty input
    or an all-dropped filter AFTER the writes already succeeded."""
    return {k: (0 if v is None else v) for k, v in dict(metrics).items()}


def _effective_curation_config(curate_kw: dict) -> dict:
    """``curate_kw`` with with_curation_flags' scalar defaults baked in,
    sorted — so the manifests' 'same configuration' test compares
    SEMANTICS, not spelling (r7 review: the raw-kwargs form refused a
    resume that spelled a default explicitly in one run and omitted it
    in the other, while the reps stage's baked form accepted it; one
    rule for both now, derived from the signature so a new threshold
    parameter is covered automatically)."""
    import inspect

    from documentai_spark.operators.curation import with_curation_flags

    defaults = {
        k: p.default
        for k, p in inspect.signature(with_curation_flags)
                           .parameters.items()
        if p.default is not inspect.Parameter.empty
        and isinstance(p.default, (bool, int, float, str, type(None)))}
    # runtime objects / separately-recorded mode flags, not thresholds
    for k in ("near_reps", "near_stats", "near_dedup"):
        defaults.pop(k, None)
    eff = dict(defaults)
    eff.update({k: v for k, v in curate_kw.items() if k in defaults})
    return dict(sorted(eff.items()))


NEAR_REPS_DIR = "_near_reps"
NEAR_REPS_STAGE = "near-reps"

STAGED_DIR = "_staged"
BUCKETIZE_STAGE = "bucketize"


def _bucketize_stage(spark: SparkSession, in_path: str, out_path: str, *,
                     n_buckets: int, text_col: str = "text",
                     log=print) -> tuple[str | None, int]:
    """Stage 0 of the curation resume protocol (r7 review): the bucket
    key is ``pmod(hash(md5(normalized text)), n_buckets)`` — a DERIVED
    column whose normalization runs through JVM regexp_replace, the
    documented ~6 MB/s quirk path on this host. Filtering the raw input
    per bucket therefore re-scans AND re-normalizes the full corpus
    n_buckets times (the predicate cannot push to parquet). Instead the
    input is written ONCE partitioned by the bucket key (the parquet
    analog of writing the corpus into an Iceberg ``bucket(N,
    fingerprint)`` spec); per-bucket reads then prune by directory, so
    the whole loop pays one normalization pass + one staging write
    instead of n_buckets full scans. Committed under the shared stage
    manifest protocol; resume skips straight to the staged table.

    Returns ``(staged_path, staged_rows)``; ``staged_path`` is None for
    an EMPTY input (a partitioned write of nothing leaves no readable
    parquet — the caller falls back to filtering the, empty, input)."""
    from pyspark.sql.observation import Observation

    from documentai_spark.operators.curation import fingerprint_col

    staged = os.path.join(out_path, STAGED_DIR)
    config = {"n_buckets": n_buckets, "text_col": text_col}
    prior = read_stage_manifest(out_path, BUCKETIZE_STAGE)
    if prior and prior.get("status") == "done":
        if prior.get("config") != config:
            raise ValueError(
                f"bucketize stage in {out_path!r} was committed with "
                f"different parameters ({prior.get('config')} vs "
                f"{config}); resuming would mis-route rows across "
                "buckets — use a fresh output directory or matching "
                "arguments")
        rows = prior["rows_out"]
        log(f"[curate-checkpoint] bucketize stage: skipped "
            f"({rows} rows staged)")
        return (staged if rows else None), rows
    _clear_stage_manifest(out_path, BUCKETIZE_STAGE)
    started = time.time()
    src = spark.read.parquet(in_path)
    if "bucket" in src.columns:
        raise ValueError(
            "input already has a 'bucket' column — the staged curation "
            "loop derives its own partition key under that name and "
            "would silently clobber and then drop the input's; rename "
            "it upstream")
    src = src.withColumn(
        "bucket", F.pmod(F.hash(fingerprint_col(F.col(text_col))),
                         F.lit(n_buckets)))
    obs = Observation("bucketize")
    (src.observe(obs, F.count(F.lit(1)).alias("n"))
        .write.mode("overwrite").partitionBy("bucket").parquet(staged))
    rows = int(obs.get["n"] or 0)
    rec = {
        "stage": BUCKETIZE_STAGE, "status": "done",
        "rows_out": rows, "bytes_out": _dir_bytes(staged),
        "config": config,
        "started": started, "finished": time.time(),
        "wall_sec": round(time.time() - started, 3),
    }
    _commit_stage_manifest(out_path, BUCKETIZE_STAGE, rec)
    log(f"[curate-checkpoint] bucketize stage: {rows} rows, "
        f"{rec['wall_sec']}s")
    return (staged if rows else None), rows


def _near_reps_stage(spark: SparkSession, in_path: str, out_path: str,
                     *, log=print, **curate_kw):
    """Stage 0 of the near-dedup resume protocol (VERDICT r6 #2): the
    cluster closure labels GLOBALLY, so the per-bucket loop cannot
    recompute it bucket-by-bucket — instead LSH pairs + closure run
    ONCE over the whole input and the representatives table is written
    under the same manifest protocol as the buckets (data write first,
    atomic tmp+rename manifest after; a kill mid-stage leaves no
    manifest and the stage re-runs from scratch). Resume skips straight
    to reading the written reps. Returns the reps DataFrame."""
    from pyspark.sql.observation import Observation

    from documentai_spark.operators.dedup import (
        cluster_pairs, exact_rep_rows, minhash_dedup_pairs,
    )

    reps_dir = os.path.join(out_path, NEAR_REPS_DIR)
    eff = _effective_curation_config(curate_kw)
    id_col = eff["id_col"]
    text_col = eff["text_col"]
    # the reps are only valid for the LSH parameters that built them —
    # record them and refuse a resume under different ones (r7 review:
    # silently reusing 0.7-threshold reps on a 0.9-threshold resume
    # would flag every remaining bucket with the wrong clusters); the
    # values come from the shared effective config so this guard and
    # the bucket-manifest guard agree on what "same" means
    config = {k: eff[k] for k in ("id_col", "text_col", "num_hashes",
                                  "bands", "jaccard_threshold",
                                  "max_iter", "max_bucket")}
    prior = read_stage_manifest(out_path, NEAR_REPS_STAGE)
    if prior and prior.get("status") == "done":
        if prior.get("config") != config:
            raise ValueError(
                f"near-reps stage in {out_path!r} was committed with "
                f"different parameters ({prior.get('config')} vs "
                f"{config}); resuming would reuse representatives from "
                "the wrong clustering — use a fresh output directory "
                "or matching parameters")
        log(f"[curate-checkpoint] reps stage: skipped "
            f"({prior['rows_out']} reps committed)")
        return spark.read.parquet(reps_dir)
    _clear_stage_manifest(out_path, NEAR_REPS_STAGE)
    started = time.time()
    src = spark.read.parquet(in_path)
    # band only exact-dup representatives (r7 review, the same collapse
    # as with_curation_flags' inline chain — the resumed flags stay
    # byte-equal): members inherit through the per-bucket is_dup window
    # and the coalesce in the reps join (absent rep row -> not near-dup)
    rep_src = exact_rep_rows(src.select(id_col, text_col), text_col,
                             id_col, context="near_reps_stage")
    pairs = minhash_dedup_pairs(
        rep_src, text_col=text_col, id_col=id_col,
        num_hashes=eff["num_hashes"],
        bands=eff["bands"],
        jaccard_threshold=eff["jaccard_threshold"],
        max_bucket=eff["max_bucket"])
    reps = cluster_pairs(pairs, rep_src.select(id_col), a_col="id_a",
                         b_col="id_b", id_col=id_col,
                         max_iter=eff["max_iter"])
    obs = Observation("near_reps")
    (reps.observe(obs, F.count(F.lit(1)).alias("n"))
         .write.mode("overwrite").parquet(reps_dir))
    rec = {
        "stage": NEAR_REPS_STAGE, "status": "done",
        "rows_out": obs.get["n"], "bytes_out": _dir_bytes(reps_dir),
        "config": config,
        "started": started, "finished": time.time(),
        "wall_sec": round(time.time() - started, 3),
    }
    _commit_stage_manifest(out_path, NEAR_REPS_STAGE, rec)
    log(f"[curate-checkpoint] reps stage: {rec['rows_out']} reps, "
        f"{rec['wall_sec']}s")
    return spark.read.parquet(reps_dir)


def run_checkpointed_curation(spark: SparkSession, in_path: str,
                              out_path: str, *, n_buckets: int = 16,
                              near_dedup: bool = False,
                              max_buckets: int | None = None,
                              log=print, **curate_kw) -> dict:
    """Checkpointed corpus curation over a documents table.

    Buckets are keyed by the normalized FINGERPRINT hash — not doc_id —
    so every exact-duplicate group co-buckets, which makes the
    per-bucket min-over-fingerprint dedup globally exact while each
    bucket stays an independent, idempotently-resumable job under the
    same manifest protocol as the extraction loop (Iceberg stand-in:
    a bucket(N, fingerprint) derived-column partition spec). The
    manifest additionally records ``kept``; both counts ride the write
    job via Observations.

    ``near_dedup=True`` (r7): two-phase. Phase 0 computes LSH pairs +
    the global cluster closure ONCE and commits the representatives
    table under its own stage manifest (:func:`_near_reps_stage`);
    the per-bucket loop then JOINS the written reps
    (``with_curation_flags(near_reps=...)``) — every bucket sees the
    same global labels, so the keep set byte-equals a single
    non-resumed ``near_dedup=True`` run while both phases stay
    idempotently resumable. Flag mode is recorded per bucket; resuming
    an output directory with the OTHER mode raises (the schemas
    differ — use a fresh output dir).
    """
    from pyspark.sql.observation import Observation

    from documentai_spark.operators.curation import curate_documents

    done = read_manifest(out_path)
    mismatched = [b for b, rec in done.items()
                  if bool(rec.get("near_dedup", False)) != near_dedup]
    if mismatched:
        raise ValueError(
            f"output {out_path!r} holds buckets committed with "
            f"near_dedup={not near_dedup} (e.g. bucket {mismatched[0]}); "
            "resuming with a different flag mode would mix schemas — "
            "use a fresh output directory")
    # beyond the flag mode, committed keep decisions are only resumable
    # under the SAME thresholds (r7 review: a resumed run with a
    # different min_tokens would mix keep semantics across buckets).
    # Defaults are baked in (_effective_curation_config) so explicit-vs-
    # omitted spellings of the same thresholds resume; a manifest with
    # NO config (pre-guard rounds) reads as a mismatch, never as a pass.
    config = {"n_buckets": n_buckets, "near_dedup": near_dedup,
              "curate": _effective_curation_config(curate_kw)}
    stale = [b for b, rec in done.items()
             if rec.get("config") != config]
    if stale:
        raise ValueError(
            f"output {out_path!r} holds buckets committed with a "
            f"different configuration (e.g. bucket {stale[0]}: "
            f"{done[stale[0]].get('config')} vs {config}); resuming "
            "would mix keep semantics — use a fresh output directory "
            "or matching arguments")
    # the bucketize stage's own config guard covers n_buckets/text_col
    # (a committed staging table with a different bucket count would
    # mis-route every row); committed bucket manifests predating a
    # staging change are caught there too since both record n_buckets
    reps = None
    if near_dedup:
        reps = _near_reps_stage(spark, in_path, out_path, log=log,
                                **curate_kw)
    text_col = curate_kw.get("text_col", "text")
    staged, staged_rows = _bucketize_stage(
        spark, in_path, out_path, n_buckets=n_buckets,
        text_col=text_col, log=log)
    if staged is not None:
        src = spark.read.parquet(staged)
    else:
        # empty input: nothing staged; per-bucket filters over the
        # (empty) raw input preserve the pre-staging output shape
        src = spark.read.parquet(in_path).withColumn(
            "bucket", F.lit(0))
    stats = {"rows_in": 0, "rows_out": 0, "kept": 0, "near_dup": 0,
             "bytes_out": 0, "failures": 0, "buckets_done": 0,
             "buckets_skipped": 0}
    processed = 0
    for bucket in range(n_buckets):
        prior = done.get(bucket)
        if prior and prior.get("status") == "done":
            stats["buckets_skipped"] += 1
            stats["rows_in"] += prior["rows_in"]
            stats["rows_out"] += prior["rows_out"]
            stats["kept"] += prior.get("kept", 0)
            stats["near_dup"] += prior.get("near_dup", 0)
            stats["bytes_out"] += prior.get("bytes_out", 0)
            continue
        if max_buckets is not None and processed >= max_buckets:
            continue
        started = time.time()
        # partition-column filter -> directory pruning: each bucket job
        # reads ONLY its staged directory (no full-table re-scan, no
        # re-normalization; the r7 repartition that round-tripped the
        # whole text payload before the first wide stage is gone too —
        # the narrow stages run at scan parallelism and the wide stages
        # use spark.sql.shuffle.partitions regardless)
        part = src.filter(F.col("bucket") == bucket).drop("bucket")
        obs = Observation(f"cur_{bucket}")
        out = curate_documents(part, near_reps=reps, **curate_kw)
        metrics = [F.count(F.lit(1)).alias("n"),
                   F.sum(F.col("keep").cast("long")).alias("kept")]
        if near_dedup:
            metrics.append(F.sum(F.col("is_near_dup").cast("long"))
                           .alias("near_dup"))
        out = out.observe(obs, *metrics)
        bucket_dir = os.path.join(out_path, f"bucket={bucket}")
        out.write.mode("overwrite").parquet(bucket_dir)
        acc = zero_nulls(obs.get)
        n = acc["n"]
        kept = acc["kept"]
        near = acc.get("near_dup", 0)
        rec = {
            "partition": bucket, "status": "done",
            "rows_in": n, "rows_out": n, "kept": kept,
            "near_dedup": near_dedup, "config": config,
            "bytes_out": _dir_bytes(bucket_dir), "failures": 0,
            "started": started, "finished": time.time(),
            "wall_sec": round(time.time() - started, 3),
        }
        if near_dedup:
            rec["near_dup"] = near
        _commit_manifest(out_path, rec)
        processed += 1
        stats["buckets_done"] += 1
        stats["rows_in"] += n
        stats["rows_out"] += n
        stats["kept"] += kept
        stats["near_dup"] += near
        stats["bytes_out"] += rec["bytes_out"]
        log(f"[curate-checkpoint] bucket {bucket}/{n_buckets}: "
            f"{n} rows ({kept} kept), {rec['wall_sec']}s")
    if not near_dedup:
        del stats["near_dup"]
    pending = n_buckets - stats["buckets_done"] - stats["buckets_skipped"]
    if pending > 0:
        stats["buckets_pending"] = pending
        stats["incomplete"] = True
    return stats


PREPARE_CORPUS_STAGE = "prepare-corpus"
PREPARE_ASSIGN_STAGE = "prepare-assignment"


def _benchmark_identity(benchmark) -> dict | None:
    """Cheap content identity for the --benchmark eval set, recorded in
    the prepare-stage config (r7 ADVICE: `benchmark is not None` let a
    resume with a DIFFERENT eval parquet silently skip the corpus stage
    and serve decontamination computed against the old set). Row count
    plus an order-insensitive xxhash64 fold over every column — one
    tiny agg over an eval-sized table, the same identity whether the
    caller re-reads the same path or hands an equivalent frame.
    """
    if benchmark is None:
        return None
    from pyspark.sql import functions as F
    row = benchmark.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) accumulator: a plain long sum of xxhash64 values
        # overflows under ANSI mode after a handful of rows
        F.sum(F.xxhash64(*[F.col(c).cast("string")
                           for c in benchmark.columns])
              .cast("decimal(38,0)")).alias("h"),
    ).first()
    return {"rows": int(row["n"]),
            "fingerprint": None if row["h"] is None else str(row["h"]),
            "columns": list(benchmark.columns)}


def run_prepare_stages(spark: SparkSession, in_path: str, out_path: str,
                       *, benchmark=None, near_dedup: bool = False,
                       split_weights: dict[str, float] | None = None,
                       mixture_rates: dict[str, float] | None = None,
                       budget: int = 2048, pack_shards: int = 16,
                       seed: int = 42, resume: bool = False,
                       max_stages: int | None = None,
                       max_assign_splits: int | None = None,
                       lm_model: dict | None = None,
                       lm_threshold: float | None = None,
                       log=print) -> dict:
    """The --prepare job body as manifest-committed stages (r7): the
    export a 100 TB pipeline actually runs is hours long, and a crash
    between the corpus and assignment writes used to redo everything.
    Both stages now commit under the checkpoint manifest protocol
    (data write first, atomic tmp+rename manifest after — a kill
    mid-stage leaves no manifest and the stage re-runs via its
    idempotent overwrite):

    - ``prepare-corpus``: flag stack [+ near-dedup + decontamination +
      mixture] -> split -> partitioned corpus write; the manifest
      stores BOTH Observation accountings (flags + corpus) so a resumed
      run reprints the full report without recomputing anything.
    - ``prepare-assignment``: pack from the written corpus (auto-sized
      shards) -> partitioned assignment write; manifest stores the
      packing accounting and per-split sequence counts.

    ``resume=True`` skips committed stages; with ``near_dedup`` the
    global pairs+closure additionally stages through
    :func:`_near_reps_stage` (so a crash mid-export resumes past the
    LSH chain too). ``resume=False`` ignores existing manifests and
    recomputes both stages (manifests are rewritten). The stage
    manifests record the job CONFIG (splits/mixture/budget/seed/
    near-dedup/benchmark identity/lm-threshold); resuming with a
    different config
    raises instead of silently mixing exports. Resume assumes the
    input (and benchmark) tables are unchanged — the same contract as
    every resume mode here.

    ``max_stages`` limits how many of the two NAMED stages execute
    this call (the kill-analog test hook; minimum 1 — the first
    pending stage always executes); a partial run returns
    ``incomplete: True``. ``max_assign_splits`` (r8) is the
    finer-grained kill hook inside the assignment stage: at most that
    many PENDING splits pack this call (completed splits still skip),
    so the kill-mid-packing resume path is testable. Returns the
    accounting line ``job.py --prepare`` prints.
    """

    from pyspark.sql.observation import Observation

    from documentai_spark.operators.packing import auto_shards
    from documentai_spark.plans.prepare import (
        pack_corpus, prepare_training_data,
    )

    if max_stages is not None and max_stages < 1:
        raise ValueError("max_stages must be >= 1: it bounds the two "
                         "named stages and the first pending stage "
                         "always executes")

    weights = split_weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    # pack_shards is part of the config even though only the assignment
    # stage consumes it (r7 review): resuming with a different
    # --pack-shards would otherwise silently skip the assignment stage
    # and report a shard count the served parquet was never packed with
    if (lm_model is None) != (lm_threshold is None):
        raise ValueError("lm_model and lm_threshold go together")
    # lm_threshold is config like everything else: a resume with a
    # different (or newly absent/present) LM filter refuses instead of
    # serving a corpus curated under other rules. The MODEL identity is
    # the committed data/lm_frozen artifact (frozen, test-pinned fresh),
    # so the threshold is the only free parameter to record.
    config = {"splits": weights, "mixture": mixture_rates,
              "budget": budget, "seed": seed, "near_dedup": near_dedup,
              "benchmark": _benchmark_identity(benchmark),
              "pack_shards": pack_shards,
              "lm_threshold": lm_threshold}

    def _check_config(rec: dict, stage: str) -> None:
        rec_config = rec.get("config")
        if isinstance(rec_config, dict):
            # pre-r8 manifests predate the lm_threshold key; absent
            # means the stage was committed with no LM filter, which is
            # exactly lm_threshold=None — keep those exports resumable
            # instead of refusing with an unsatisfiable error
            rec_config = dict(rec_config)
            rec_config.setdefault("lm_threshold", None)
        if rec_config != config:
            raise ValueError(
                f"stage {stage!r} in {out_path!r} was committed with a "
                f"different configuration ({rec_config} vs "
                f"{config}); resuming would mix exports — use a fresh "
                "output directory or matching arguments")

    corpus_path = os.path.join(out_path, "corpus")
    assign_path = os.path.join(out_path, "assignment")
    reasons = ["dup", "bad_lang", "bad_len", "low_conf"]
    if near_dedup:
        reasons.insert(1, "near_dup")
    if lm_threshold is not None:
        reasons.append("high_perplexity")
    if benchmark is not None:
        reasons.append("contaminated")
    flag_col = {"dup": "is_dup", "near_dup": "is_near_dup"}

    t0 = time.time()
    executed = 0
    skipped: list[str] = []

    # ---- stage 1: corpus ----
    prior = read_stage_manifest(out_path, PREPARE_CORPUS_STAGE) \
        if resume else None
    if prior and prior.get("status") == "done":
        _check_config(prior, PREPARE_CORPUS_STAGE)
        acc, acc_c = prior["acc"], prior["acc_c"]
        skipped.append("corpus")
        log(f"[prepare] corpus stage: skipped "
            f"({acc_c['rows']} rows committed)")
    else:
        # invalidate BOTH manifests before re-executing the corpus
        # stage (r7 review): a crash mid-recompute must not leave a
        # prior run's 'done' corpus manifest over half-overwritten
        # data, and any corpus re-execution makes a prior assignment
        # (packed from the OLD corpus) stale too — including every
        # per-split pack manifest (r8: split-granular commits)
        _clear_stage_manifest(out_path, PREPARE_CORPUS_STAGE)
        _clear_stage_manifest(out_path, PREPARE_ASSIGN_STAGE)
        for _s in weights:
            _clear_stage_manifest(out_path,
                                  f"{PREPARE_ASSIGN_STAGE}-{_s}")
        near_reps = None
        if not (near_dedup and resume):
            # a corpus recompute on any path that does NOT stage through
            # _near_reps_stage (resume=False runs the closure inline;
            # near_dedup=False never runs it) must also invalidate a
            # prior run's reps manifest — its config records only LSH
            # parameters, nothing input-derived, so a later --resume
            # would otherwise silently join representatives built from
            # the OLD input (r7 review)
            _clear_stage_manifest(out_path, NEAR_REPS_STAGE)
        if near_dedup and resume:
            # the closure is the longest sub-stage — under resume it
            # commits separately so a crash after it never re-runs the
            # LSH chain (max_stages counts only the two named stages;
            # a real kill between reps and corpus resumes past reps
            # via its own manifest)
            near_reps = _near_reps_stage(spark, in_path, out_path,
                                         log=log)
        obs_flags = Observation("prepare_flags")

        def observe_flags(df):
            surviving = F.col("keep")
            if benchmark is not None:
                surviving = surviving & ~F.col("contaminated")
            metrics = [
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.col("keep").cast("int")).alias("kept"),
                F.sum(surviving.cast("int")).alias("surviving"),
            ] + [F.sum(F.col(flag_col.get(r, r)).cast("int")).alias(r)
                 for r in reasons]
            if mixture_rates:
                # per-source composition BEFORE thinning: indicator
                # sums over the known rate keys ride the same
                # Observation — no extra pass, no output re-read
                metrics += [
                    F.sum((surviving & (F.col("source") == s))
                          .cast("int")).alias(f"src_before_{s}")
                    for s in mixture_rates]
            return df.observe(obs_flags, *metrics)

        started = time.time()
        prep = prepare_training_data(
            spark.read.parquet(in_path), benchmark=benchmark,
            near_dedup=near_dedup and near_reps is None,
            near_reps=near_reps, split_weights=weights,
            mixture_rates=mixture_rates, budget=budget,
            n_shards=pack_shards, seed=seed, observer=observe_flags,
            lm_model=lm_model, lm_threshold=lm_threshold)
        obs_corpus = Observation("prepare_corpus")
        corpus_metrics = [F.count(F.lit(1)).alias("rows")] + [
            F.sum((F.col("split") == s).cast("int")).alias(f"split_{s}")
            for s in weights]
        if mixture_rates:
            corpus_metrics += [
                F.sum((F.col("source") == s).cast("int"))
                 .alias(f"src_after_{s}")
                for s in mixture_rates]
        (prep.corpus.observe(obs_corpus, *corpus_metrics)
             .write.mode("overwrite").partitionBy("split")
             .parquet(corpus_path))
        acc = zero_nulls(obs_flags.get)
        acc_c = zero_nulls(obs_corpus.get)
        _commit_stage_manifest(out_path, PREPARE_CORPUS_STAGE, {
            "stage": PREPARE_CORPUS_STAGE, "status": "done",
            "acc": acc, "acc_c": acc_c, "config": config,
            "bytes_out": _dir_bytes(corpus_path),
            "started": started, "finished": time.time(),
            "wall_sec": round(time.time() - started, 3)})
        executed += 1
        log(f"[prepare] corpus stage: {acc_c['rows']} rows, "
            f"{round(time.time() - started, 1)}s")

    n_shards = auto_shards(pack_shards, acc_c["rows"])

    def _line(acc_p: dict, seqs: dict, incomplete: bool = False) -> dict:
        line = {
            "rows": acc["rows"], "kept": acc["kept"],
            "dropped": acc["rows"] - acc["surviving"],
            "by_reason": {k: acc[k] for k in reasons},
            "mixture_dropped": acc["surviving"] - acc_c["rows"],
            "splits": {s: acc_c[f"split_{s}"] for s in weights},
            "packed_docs": acc_p["rows"], "oversize": acc_p["oversize"],
            "sequences": seqs, "budget": budget,
            "pack_shards": n_shards,
            "sec": round(time.time() - t0, 2),
            "stages_skipped": skipped,
            "corpus": corpus_path, "assignment": assign_path}
        if mixture_rates:
            # {source: [surviving_before_thinning, in_corpus_after]};
            # '*' aggregates sources outside the rate map (kept at
            # default_rate=1.0, so before == after there)
            by_src = {s: [acc[f"src_before_{s}"],
                          acc_c[f"src_after_{s}"]]
                      for s in mixture_rates}
            by_src["*"] = [
                acc["surviving"] - sum(v[0] for v in by_src.values()),
                acc_c["rows"] - sum(v[1] for v in by_src.values())]
            line["mixture_by_source"] = by_src
        if incomplete:
            line["incomplete"] = True
        return line

    # ---- stage 2: assignment (split-granular since r8) ----
    # VERDICT r7 #5: corpus and assignment each committed ONCE, so at
    # 100 TB a kill during packing re-ran the ENTIRE assignment even
    # though the corpus stage was safe. Packing is deterministic per
    # (split, shard) — it depends only on (doc_id, n_tokens, budget,
    # n_shards), never on co-packed groups — so each split now packs
    # and commits under its own manifest (prepare-assignment-<split>);
    # a resume skips completed splits and the per-split outputs are
    # byte-identical to the single-pass pack. The aggregate
    # PREPARE_ASSIGN_STAGE manifest still commits last (the fast
    # full-replay path and the _line() accounting source).
    prior = read_stage_manifest(out_path, PREPARE_ASSIGN_STAGE) \
        if resume else None
    if prior and prior.get("status") == "done":
        _check_config(prior, PREPARE_ASSIGN_STAGE)
        skipped.append("assignment")
        log("[prepare] assignment stage: skipped")
        return _line(prior["acc_p"], prior["seqs"])
    if max_stages is not None and executed >= max_stages:
        return _line({"rows": 0, "oversize": 0}, {}, incomplete=True)
    _clear_stage_manifest(out_path, PREPARE_ASSIGN_STAGE)
    started = time.time()
    acc_p = {"rows": 0, "oversize": 0}
    seqs: dict = {}
    split_names = sorted(weights)
    if not resume:
        # a non-resumed recompute must not inherit any prior run's
        # per-split packs (same invalidation rule as the corpus stage)
        for s in split_names:
            _clear_stage_manifest(out_path,
                                  f"{PREPARE_ASSIGN_STAGE}-{s}")
        shutil.rmtree(assign_path, ignore_errors=True)
    packed_now = 0
    for s in split_names:
        stage_s = f"{PREPARE_ASSIGN_STAGE}-{s}"
        pm = read_stage_manifest(out_path, stage_s) if resume else None
        if pm and pm.get("status") == "done":
            _check_config(pm, stage_s)
            acc_p["rows"] += pm["acc_p"]["rows"]
            acc_p["oversize"] += pm["acc_p"]["oversize"]
            if pm["n_sequences"]:
                seqs[s] = pm["n_sequences"]
            log(f"[prepare] assignment split {s!r}: skipped "
                f"({pm['acc_p']['rows']} docs committed)")
            continue
        if max_assign_splits is not None \
                and packed_now >= max_assign_splits:
            # kill-analog hook: some splits committed, the rest (and
            # the aggregate manifest) pending — a resume finishes them
            return _line(acc_p, seqs, incomplete=True)
        _clear_stage_manifest(out_path, stage_s)
        s_started = time.time()
        split_rows = acc_c.get(f"split_{s}", 0)
        split_dir = os.path.join(assign_path, f"split={s}")
        if split_rows == 0:
            # a write of nothing leaves no parquet files, so the seqs
            # re-read would die with UNABLE_TO_INFER_SCHEMA — record
            # the empty split instead
            n_seq = 0
            p_acc = {"rows": 0, "oversize": 0}
            shutil.rmtree(split_dir, ignore_errors=True)
        else:
            obs_pack = Observation(f"prepare_pack_{s}")
            assign_s = pack_corpus(
                spark.read.parquet(corpus_path)
                     .filter(F.col("split") == s),
                budget=budget, n_shards=n_shards, est_rows=split_rows)
            # write into the hive split=<s> leaf directly (the same
            # layout partitionBy produced); overwrite replaces only
            # this split's data on a mid-split resume
            (assign_s.observe(
                    obs_pack, F.count(F.lit(1)).alias("rows"),
                    F.sum(F.col("oversize").cast("int"))
                     .alias("oversize"))
                .drop("split")
                .write.mode("overwrite").parquet(split_dir))
            p_acc = zero_nulls(obs_pack.get)
            n_seq = (spark.read.parquet(split_dir)
                     .select("shard", "bin").distinct().count())
        _commit_stage_manifest(out_path, stage_s, {
            "stage": stage_s, "status": "done", "acc_p": p_acc,
            "n_sequences": n_seq, "config": config,
            "started": s_started, "finished": time.time(),
            "wall_sec": round(time.time() - s_started, 3)})
        acc_p["rows"] += p_acc["rows"]
        acc_p["oversize"] += p_acc["oversize"]
        if n_seq:
            seqs[s] = n_seq
        packed_now += 1
        log(f"[prepare] assignment split {s!r}: {p_acc['rows']} docs "
            f"packed, {round(time.time() - s_started, 1)}s")
    _commit_stage_manifest(out_path, PREPARE_ASSIGN_STAGE, {
        "stage": PREPARE_ASSIGN_STAGE, "status": "done",
        "acc_p": acc_p, "seqs": seqs, "config": config,
        "started": started, "finished": time.time(),
        "wall_sec": round(time.time() - started, 3)})
    log(f"[prepare] assignment stage: {acc_p['rows']} docs packed, "
        f"{round(time.time() - started, 1)}s")
    return _line(acc_p, seqs)
