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
Known trade, documented: the store is re-read per trigger, so total
ingest cost grows with store size — at very long horizons compact the
store (distinct band/band_sig) or move it behind a bucketed table /
bloom index; the decision logic is unchanged by the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.utils import AnalysisException

from ..operators import dedup
from .incremental import write_batch_idempotent

DOCS_SCHEMA = "doc_id long, text string"
BANDS_SCHEMA = "doc_id long, band int, band_sig string, batch_id long"


def _existing_bands(spark: SparkSession, path: str) -> DataFrame:
    """Read the signature store; ONLY a missing path (first batch)
    falls back to empty — any other read failure must surface, because
    silently treating a broken store as empty would admit near-dups of
    everything previously seen."""
    try:
        return spark.read.parquet(path)
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc):
            return spark.createDataFrame([], BANDS_SCHEMA)
        raise


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
    prior = (
        _existing_bands(spark, bands_path)
        .filter(F.col("batch_id") != batch_id)
        .select("band", "band_sig")
    )
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
) -> None:
    """Drain all currently-available doc files, keeping only documents
    that are not near-duplicates of anything seen before them."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        process_neardup_batch(
            spark, batch_df, batch_id, output_path, bands_path, shingle
        )

    (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", stream_checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
