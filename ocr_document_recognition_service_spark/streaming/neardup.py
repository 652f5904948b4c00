"""Streaming near-dedup at ingest: MinHash-LSH against an accumulating
signature store.

The batch near-dup operators (dd2/dd3/…) assume the corpus is at rest;
a 100 TB pipeline that ingests continuously needs the same decision at
arrival time: *is this document a near-duplicate of anything already
seen?*  Structured-Streaming mapping:

    readStream(docs dir) → foreachBatch:
        band-sign the batch (dedup.band_signatures — the exact batch
        signature family, so streaming and batch decisions agree)
        → drop docs colliding with the seen-history signature store
        → within-batch: drop every doc greater than its bucket's
          minimum doc id (one linear groupBy — NO pairwise self-join,
          so a mega-bucket of M boilerplate pages costs O(M), not
          O(M²))
        → append kept docs + the WHOLE batch's signatures (both
          idempotent batch_id-partition overwrites)

The drop rule is exactly "∃ an earlier-seen document sharing a band"
(earlier = prior batch, or smaller doc id within the batch), evaluated
against ALL seen signatures — kept and dropped alike.  Storing dropped
documents' signatures is what makes the decision independent of
micro-batch boundaries: in an a~b, b~c chain where b is dropped, c
still collides with b's stored bands whether or not a/b/c share a
batch.  With ids arriving in id order this equals the batch
keep-min-per-pair policy (pinned by test).

Scale shape: per micro-batch = one signature agg over the batch + one
equi-join against the store on (band, band_sig) — high-cardinality
key, no skew funnel; no state is held in the streaming engine itself.

Store growth is bounded by COMPACTION (``compact_bands`` — wire it in
with ``incremental_neardup(compact_every=N)``): the per-batch delta
partitions up to batch B fold into one DISTINCT (band, band_sig)
snapshot partitioned by (thru, band), so the per-trigger history read
is snapshot + only the delta partitions after it (partition-pruned on
batch_id) — bounded by distinct signatures seen, not raw corpus size.
Decisions are identical by construction: the history set is the same
set of signatures either way, and the snapshot never includes the
in-flight batch, so replay idempotence (history excludes the current
batch_id's own partition) is preserved.  ``vacuum_bands`` deletes the
folded delta partitions + superseded snapshots afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import dedup
from .incremental import write_batch_idempotent

DOCS_SCHEMA = "doc_id long, text string"
BANDS_SCHEMA = "doc_id long, band int, band_sig string, batch_id long"


def _path_exists(spark: SparkSession, path: str) -> bool:
    """Explicit filesystem existence check (Hadoop FS — works for any
    scheme Spark can read), instead of matching error-message strings
    that differ across Spark versions."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def _existing_bands(spark: SparkSession, path: str) -> DataFrame:
    """Read the signature store's delta tier; ONLY a missing path
    (first batch) falls back to empty — any other read failure must
    surface, because silently treating a broken store as empty would
    admit near-dups of everything previously seen."""
    if not _path_exists(spark, path):
        return spark.createDataFrame([], BANDS_SCHEMA)
    # explicit schema: right after a vacuum the delta dir can hold zero
    # data files (everything folded into the snapshot) — inference
    # would fail; the schema is ours to declare anyway
    return spark.read.schema(BANDS_SCHEMA).parquet(path)


def _compact_path(bands_path: str) -> str:
    return bands_path.rstrip("/") + "_compact"


def _read_compact(
    spark: SparkSession, bands_path: str
) -> tuple[DataFrame | None, int]:
    """Newest compaction snapshot as distinct (band, band_sig) rows,
    plus the batch id it covers through; (None, -1) when no snapshot
    exists.  The max-version probe is a tiny driver-side aggregate over
    the snapshot's partition column (loop-condition class, not hot
    path)."""
    cpath = _compact_path(bands_path)
    if not _path_exists(spark, cpath):
        return None, -1
    # explicit schema: a snapshot folded from zero-signature batches
    # has a partition dir but no data files — inference would wedge
    # every subsequent batch (same failure class as the delta tier)
    snap = spark.read.schema("band int, band_sig string, thru long").parquet(
        cpath
    )
    mx = snap.agg(F.max("thru")).collect()[0][0]
    if mx is None:
        return None, -1
    return (
        snap.filter(F.col("thru") == mx).select("band", "band_sig"),
        int(mx),
    )


def history_bands(
    spark: SparkSession, bands_path: str, exclude_batch_id: int
) -> DataFrame:
    """The seen-signature history as (band, band_sig): newest compacted
    snapshot (already distinct) + delta partitions AFTER it (pruned on
    the batch_id partition column), minus the in-flight batch's own
    partition (replay idempotence)."""
    compact, thru = _read_compact(spark, bands_path)
    delta = (
        _existing_bands(spark, bands_path)
        .filter(
            (F.col("batch_id") > thru)
            & (F.col("batch_id") != exclude_batch_id)
        )
        .select("band", "band_sig")
    )
    return delta if compact is None else compact.unionByName(delta)


def compact_bands(
    spark: SparkSession, bands_path: str, upto_batch: int
) -> int:
    """Fold delta partitions with batch_id ≤ *upto_batch* plus the
    previous snapshot into one DISTINCT (band, band_sig) snapshot at
    ``<bands_path>_compact`` partitioned by (thru, band).

    - Row count ≤ distinct signatures seen — per-doc multiplicity and
      the doc_id/batch_id columns are gone, which is exactly the store
      term that grew with the raw corpus.
    - Idempotent: re-running for the same *upto_batch* dynamically
      overwrites its own ``thru`` partition.
    - Decision-preserving: callers must pass an *upto_batch* strictly
      BEFORE any batch that could still replay (``incremental_neardup``
      uses batch_id − 1), so a replayed batch's own signatures are
      never hidden inside a snapshot it cannot exclude.
    - The snapshot is eagerly materialized (localCheckpoint) before the
      write because it reads the previous snapshot from the same root
      it overwrites.

    Returns the EFFECTIVE coverage (max of the existing and new thru) —
    the value ``vacuum_bands`` may safely prune against.
    """
    compact, thru = _read_compact(spark, bands_path)
    if upto_batch <= thru:
        return thru  # already covered — idempotent no-op
    delta = (
        _existing_bands(spark, bands_path)
        .filter(
            (F.col("batch_id") > thru) & (F.col("batch_id") <= upto_batch)
        )
        .select("band", "band_sig")
    )
    merged = delta if compact is None else compact.unionByName(delta)
    snap = merged.distinct().localCheckpoint(eager=True)
    (
        snap.withColumn("thru", F.lit(upto_batch).cast("long"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("thru", "band")
        .parquet(_compact_path(bands_path))
    )
    return upto_batch


def vacuum_bands(
    spark: SparkSession, bands_path: str, thru: int | None = None
) -> None:
    """Delete store files superseded by the newest snapshot: delta
    partitions with batch_id ≤ thru and older snapshot versions.  Pure
    cleanup — ``history_bands`` already ignores both — so decisions are
    unchanged; run it after ``compact_bands`` to bound the file listing
    as well as the read.  (At cluster scale this is a catalog/manifest
    delete — Iceberg expire-snapshots — same semantics.)

    *thru* skips re-deriving the snapshot coverage when the caller just
    got it from ``compact_bands`` (one snapshot scan + collect saved on
    the micro-batch hot path); it must be the snapshot's OWN coverage —
    pruning past it would delete signatures not yet folded."""
    if thru is None:
        _, thru = _read_compact(spark, bands_path)
    if thru < 0:
        return
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()

    def _rm_children(root: str, prefix: str, keep) -> None:
        rpath = jvm.org.apache.hadoop.fs.Path(root)
        fs = rpath.getFileSystem(conf)
        if not fs.exists(rpath):
            return
        for st in fs.listStatus(rpath):
            name = st.getPath().getName()
            if not name.startswith(prefix):
                continue
            try:
                val = int(name.split("=", 1)[1])
            except (IndexError, ValueError):
                continue
            if not keep(val):
                fs.delete(st.getPath(), True)

    _rm_children(bands_path, "batch_id=", lambda b: b > thru)
    _rm_children(_compact_path(bands_path), "thru=", lambda v: v >= thru)


def process_neardup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    output_path: str,
    bands_path: str,
    shingle: str = "w3",
) -> None:
    """One micro-batch of the streaming near-dedup (exposed for direct
    replay testing; ``incremental_neardup`` wires it to foreachBatch).

    Idempotent under retry: history excludes this batch_id's own
    (about-to-be-overwritten) signatures, and both sinks dynamically
    overwrite only their own batch_id partition.
    """
    # checkpoint: the signature frame feeds the history join, the
    # bucket-min drop, AND the store write — without it the minhash
    # agg re-executes per consumer (shared-subtree re-evaluation)
    bands_new = dedup.band_signatures(
        batch_df, shingle=shingle
    ).localCheckpoint(eager=True)
    prior = history_bands(spark, bands_path, exclude_batch_id=batch_id)
    hist_hit = (
        bands_new.join(prior, ["band", "band_sig"])
        .select("doc_id")
        .distinct()
    )
    bucket_min = bands_new.groupBy("band", "band_sig").agg(
        F.min("doc_id").alias("_mn")
    )
    wb_drop = (
        bands_new.join(bucket_min, ["band", "band_sig"])
        .filter(F.col("doc_id") > F.col("_mn"))
        .select("doc_id")
        .distinct()
    )
    dropped = (
        hist_hit.unionByName(wb_drop).distinct().localCheckpoint(eager=True)
    )
    kept = batch_df.join(dropped, "doc_id", "left_anti").withColumn(
        "batch_id", F.lit(batch_id)
    )
    write_batch_idempotent(kept, output_path)
    # the WHOLE batch's signatures enter the store (kept and dropped):
    # that is what makes transitive chains batch-boundary-independent
    write_batch_idempotent(
        bands_new.withColumn("batch_id", F.lit(batch_id)), bands_path
    )


def incremental_neardup(
    spark: SparkSession,
    input_dir: str,
    output_path: str,
    bands_path: str,
    stream_checkpoint: str,
    *,
    shingle: str = "w3",
    compact_every: int | None = None,
) -> None:
    """Drain all currently-available doc files, keeping only documents
    that are not near-duplicates of anything seen before them.

    *compact_every* = fold the signature store every N batches (and
    vacuum the folded files): compaction covers through batch_id − 1 —
    never the batch that just ran, which is the only one foreachBatch
    can replay — so retry semantics are untouched."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        process_neardup_batch(
            spark, batch_df, batch_id, output_path, bands_path, shingle
        )
        if (
            compact_every
            and batch_id > 0
            and batch_id % compact_every == 0
        ):
            eff = compact_bands(spark, bands_path, upto_batch=batch_id - 1)
            vacuum_bands(spark, bands_path, thru=eff)

    (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", stream_checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
