"""Per-partition lineage + checkpoint/resume protocol (SURVEY §7.1 step 6).

Semantic ancestor: the reference's in-memory task-status dict
(``core/app.py:22``, states pending/processing/done/error at
``app.py:38-83``) — which is lost on restart (the code itself notes
"в продакшене лучше Redis", app.py:21).  Here it becomes a durable
checkpoint table:

    (run_id, snapshot_id, partition_id, row_count, output_md5, committed_at)

- ``partition_id = pmod(xxhash64(url), P)`` — deterministic, so any
  re-run over the same snapshot assigns identical rows to identical
  partitions.
- A partition is *committed* once its output parquet AND its lineage
  row are written.  Resume = anti-join committed partition ids for the
  same ``snapshot_id`` (broadcast — the committed set is tiny).
- ``output_md5`` = md5 of the partition's extracted texts concatenated
  in url order; the whole-table md5 of a resumed run must equal a
  from-scratch run (asserted in tests).

Iceberg snapshots are emulated (no jars in the sandbox, SURVEY §7.5):
``snapshot_id`` is a content fingerprint of the input file listing.  On
a real cluster, swap in the table's current Iceberg snapshot id.
"""

from __future__ import annotations

import os
import zlib

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .pipeline import extract_pages

SEP = "\x01"


def _is_vanished_file_error(exc: Exception) -> bool:
    """True when *exc* is Spark reporting a scanned file that vanished
    mid-read — the signature of a rival's dynamic overwrite replacing
    pid files under our lazy listing.  Matches the structured
    error-class field first (PySpark 4 ``getCondition`` / older
    ``getErrorClass`` on AnalysisException/SparkException — stable
    across versions, unlike message text) and falls back to the
    message substrings for exception shapes that carry no error class
    (e.g. a Py4J-wrapped executor SparkException).  The residual
    window this can't close (rival commits between our read and our
    append) is closed in production by the documented Iceberg swap
    (module docstring): atomic snapshot commits instead of
    append-parquet."""
    classes = set()
    for getter in ("getCondition", "getErrorClass"):
        fn = getattr(exc, getter, None)
        if callable(fn):
            try:
                got = fn()
            except Exception:
                got = None
            if got:
                classes.add(str(got))
    if any(c.startswith("FAILED_READ_FILE") for c in classes):
        return True
    msg = str(exc)
    return "FAILED_READ_FILE" in msg or "FILE_NOT_EXIST" in msg


def snapshot_id_of(input_path: str) -> int:
    """Emulated Iceberg snapshot id: crc32 fingerprint of the sorted
    (relative file name, size) listing of the input dataset."""
    entries = []
    if os.path.isdir(input_path):
        for root, _dirs, files in os.walk(input_path):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    entries.append(
                        f"{os.path.relpath(p, input_path)}:{os.path.getsize(p)}"
                    )
    else:
        entries.append(f"{os.path.basename(input_path)}:{os.path.getsize(input_path)}")
    return zlib.crc32("|".join(sorted(entries)).encode("utf-8"))


def snapshot_output_dir(output_path: str, snapshot_id: int) -> str:
    """Output namespace for one input snapshot (snapshot isolation)."""
    return os.path.join(output_path, f"snapshot={snapshot_id}")


def with_partition_id(pages: DataFrame, num_partitions: int) -> DataFrame:
    return pages.withColumn(
        "pid", F.pmod(F.xxhash64("url"), F.lit(num_partitions)).cast("int")
    )


def partition_lineage(extracted: DataFrame) -> DataFrame:
    """Per-partition lineage aggregate over extracted output carrying
    ``pid``: row count + md5 of texts concatenated in url order."""
    return extracted.groupBy("pid").agg(
        F.count("*").alias("row_count"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
            "error_count"
        ),
        F.md5(
            F.concat_ws(
                SEP,
                F.transform(
                    F.array_sort(F.collect_list(F.struct("url", "text"))),
                    lambda x: F.coalesce(x["text"], F.lit("\x00<null>")),
                ),
            )
        ).alias("output_md5"),
    )


def committed_partitions(
    spark: SparkSession, checkpoint_path: str, snapshot_id: int
) -> DataFrame | None:
    """Distinct committed pids for this snapshot, or None if no
    checkpoint exists yet."""
    try:
        ck = spark.read.parquet(checkpoint_path)
    except Exception:
        return None
    return (
        ck.filter(F.col("snapshot_id") == snapshot_id)
        .select("pid")
        .distinct()
    )


def canonical_lineage(
    spark: SparkSession, checkpoint_path: str, snapshot_id: int
) -> DataFrame:
    """One lineage row per pid for a snapshot: the FIRST committer wins
    (committed_at asc, run_id asc tie-break — a total order, so every
    reader resolves the same winner).  Duplicate rows can exist only
    after a commit race (see ``run_extraction``'s contended-commit
    check); consumers of the checkpoint table read through this view."""
    ck = spark.read.parquet(checkpoint_path).filter(
        F.col("snapshot_id") == snapshot_id
    )
    w = Window.partitionBy("pid").orderBy(
        F.col("committed_at").asc(), F.col("run_id").asc()
    )
    return (
        ck.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def run_extraction(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    run_id: str,
    *,
    num_partitions: int = 64,
    salt_threshold: int = 64 * 1024,
    limit_partitions: int | None = None,
    fail_before_commit: bool = False,
    race_hook=None,
) -> dict:
    """One (resumable) extraction run.

    Reads the pages table, skips partitions already committed for the
    current input snapshot, extracts the rest, writes output parquet
    (partitioned by pid) and appends lineage rows.  ``limit_partitions``
    processes only the first K uncommitted pids — used by tests to
    simulate a mid-run kill; ``fail_before_commit`` raises after the
    data write but before the lineage commit (crash injection).

    Crash safety: output uses DYNAMIC partition overwrite — a pid's
    files are atomically replaced, never appended.  If a run dies
    between data write and lineage commit, the orphaned pid directories
    are simply rewritten (identical content — extraction is
    deterministic per snapshot) by the resume, which trusts only the
    lineage table.  A partition is committed iff its lineage row exists.

    Snapshot isolation: output lands under ``{output_path}/snapshot=N``
    so a re-run over a CHANGED input (new snapshot id) can never
    overwrite a previous snapshot's committed data — each snapshot's
    lineage rows always describe files that still exist.

    Contended commits (two drivers racing the same snapshot): parquet
    append is not transactional, so conflicts are detected at two
    points.  (a) Mid-commit: a rival's dynamic overwrite replaces pid
    files while this run's lazy lineage aggregate still holds the old
    listing — the resulting read failure is confirmed against the
    checkpoint (rival rows present?) and surfaced as a loud
    commit-race error with NO lineage rows appended.  (b) Post-append:
    the run re-reads the checkpoint through ``canonical_lineage``
    (first committer wins — committed_at asc, run_id asc, a total
    order) and raises LOUDLY if any of its partitions resolved to
    another run (its rows stay, shadowed).  Output is exactly-once
    either way: extraction is deterministic per snapshot and the
    dynamic partition overwrite makes both racers write byte-identical
    pid directories.  A commit that appends and checks entirely inside
    the other's append in flight can still slip both checks — the real
    deployment swaps this adapter for Iceberg's atomic snapshot swap,
    which closes that window; ``race_hook`` (test-only) runs in the
    conflict window between the committed-set read and the lineage
    append.

    Returns {snapshot_id, partitions_processed, rows}.
    """
    snap = snapshot_id_of(input_path)
    snap_dir = snapshot_output_dir(output_path, snap)
    pages = with_partition_id(spark.read.parquet(input_path), num_partitions)

    done = committed_partitions(spark, checkpoint_path, snap)
    if done is not None:
        pages = pages.join(F.broadcast(done), "pid", "left_anti")
    if limit_partitions is not None:
        keep = (
            pages.select("pid").distinct().orderBy("pid").limit(limit_partitions)
        )
        pages = pages.join(F.broadcast(keep), "pid", "inner")

    extracted = extract_pages(
        pages,
        salt_threshold=salt_threshold,
        num_partitions=num_partitions,
        carry_cols=("warc_ts", "pid"),
    )

    # Cluster the NARROW extracted output by pid before the partitioned
    # write (shuffle-late: text is ~10× smaller than html, and without
    # this clustering partitionBy would fan out tasks × pids files).
    # Dynamic partition overwrite keeps re-writes of a pid idempotent
    # (crash between data write and lineage commit → resume rewrites
    # the orphaned pid, no duplicates).  Write output first, then
    # commit lineage from the written data — a partition is committed
    # only if its rows are durably on disk.
    extracted = extracted.repartition(num_partitions, F.col("pid"))
    (
        extracted.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("pid")
        .parquet(snap_dir)
    )

    if fail_before_commit:
        raise RuntimeError("injected crash before lineage commit")

    try:
        written = spark.read.parquet(snap_dir)
    except Exception as exc:
        # only the empty-write case is benign: zero uncommitted rows →
        # the partitioned write produced no files.  Any other read-back
        # failure (corrupt footer, fs error) must fail the run, not
        # silently commit nothing.
        msg = str(exc)
        if "UNABLE_TO_INFER_SCHEMA" in msg or "PATH_NOT_FOUND" in msg:
            written = spark.createDataFrame([], extracted.schema)
        else:
            raise
    prev = committed_partitions(spark, checkpoint_path, snap)
    fresh = written
    if prev is not None:
        fresh = written.join(F.broadcast(prev), "pid", "left_anti")
    # expected_partitions = distinct pids present in THIS snapshot's
    # input (not num_partitions: sparse inputs can leave pids empty) —
    # lets job status distinguish done from partially-committed
    expected = with_partition_id(
        spark.read.parquet(input_path), num_partitions
    ).select("pid").distinct().count()

    lineage = (
        partition_lineage(fresh)
        .withColumn("run_id", F.lit(run_id))
        # pinned long: a crc32 may or may not fit int32, and mixed
        # int32/int64 parquet files in one checkpoint dir break reads
        .withColumn("snapshot_id", F.lit(snap).cast("long"))
        .withColumn("expected_partitions", F.lit(expected).cast("int"))
        .withColumn("committed_at", F.current_timestamp())
    )
    if race_hook is not None:
        race_hook()  # test-only: a rival driver commits right here
    try:
        lineage.write.mode("append").parquet(checkpoint_path)
    except Exception as exc:
        # a rival's dynamic overwrite replaces pid files while OUR
        # lazy lineage aggregate still holds the old listing — the
        # read fails loudly.  Confirm a rival actually committed and
        # surface it as the commit-race error (output is unaffected:
        # the rival wrote identical bytes); any other read failure
        # propagates untouched.
        if _is_vanished_file_error(exc):
            try:
                rivals = (
                    spark.read.parquet(checkpoint_path)
                    .filter(
                        (F.col("snapshot_id") == snap)
                        & (F.col("run_id") != run_id)
                    )
                    .count()
                )
            except Exception:
                rivals = 0
            if rivals:
                raise RuntimeError(
                    f"lineage commit race lost: a rival run overwrote "
                    f"snapshot {snap} partitions while this run was "
                    "committing (concurrent dynamic overwrite detected "
                    "mid-read) — output is unaffected (idempotent "
                    "identical writes); none of this run's lineage rows "
                    "were appended. Re-read job status before retrying."
                ) from exc
        raise

    # contended-commit check: did any of OUR pids resolve to a rival?
    lost = (
        canonical_lineage(spark, checkpoint_path, snap)
        .filter(F.col("run_id") != run_id)
        .join(
            spark.read.parquet(checkpoint_path)
            .filter(
                (F.col("snapshot_id") == snap)
                & (F.col("run_id") == run_id)
            )
            .select("pid")
            .distinct(),
            "pid",
        )
        .count()
    )
    if lost:
        raise RuntimeError(
            f"lineage commit race lost: {lost} partition(s) of snapshot "
            f"{snap} were committed concurrently by another run — output "
            "is unaffected (idempotent identical writes); this run's "
            "lineage rows are shadowed by canonical_lineage. Re-read "
            "job status before retrying."
        )

    stats = (
        spark.read.parquet(checkpoint_path)
        .filter((F.col("snapshot_id") == snap) & (F.col("run_id") == run_id))
        .agg(
            F.countDistinct("pid").alias("parts"),
            F.sum("row_count").alias("rows"),
        )
        .collect()[0]
    )
    return {
        "snapshot_id": snap,
        "partitions_processed": stats["parts"],
        "rows": stats["rows"] or 0,
    }


def global_md5(
    spark: SparkSession, output_path: str, snapshot_id: int | None = None
) -> str:
    """md5 over ALL extracted texts in url order (test-scale helper;
    at 100 TB you compare per-partition md5 sets instead).  Pass
    ``snapshot_id`` to scope to one snapshot's namespace when the
    output dir holds several."""
    if snapshot_id is not None:
        output_path = snapshot_output_dir(output_path, snapshot_id)
    df = spark.read.parquet(output_path)
    row = df.agg(
        F.md5(
            F.concat_ws(
                SEP,
                F.transform(
                    F.array_sort(F.collect_list(F.struct("url", "text"))),
                    lambda x: F.coalesce(x["text"], F.lit("\x00<null>")),
                ),
            )
        ).alias("h")
    ).collect()[0]
    return row["h"]
