"""Streaming near-dedup at ingest: MinHash-LSH against an accumulating
signature store.

The batch near-dup operators (dd2/dd3/…) assume the corpus is at rest;
a 100 TB pipeline that ingests continuously needs the same decision at
arrival time: *is this document a near-duplicate of anything already
accepted?*  Structured-Streaming mapping:

    readStream(docs dir) → foreachBatch:
        band-sign the batch (dedup.band_signatures — the exact batch
        signature family, so streaming and batch decisions agree)
        → drop docs colliding with the KEPT-history signature store
        → within-batch: drop the larger doc of each candidate pair
          (the curate keep-min policy)
        → append kept docs + their signatures (both idempotent
          batch_id-partition overwrites)

Policy is FIRST-WINS across batches (an earlier accepted document
beats any later near-duplicate — the only causal option at ingest) and
keep-min-id within a batch.  Only KEPT documents' signatures enter the
store, so history checks are against canonical representatives and the
store grows with the deduplicated corpus, not the raw stream.

Scale shape: per micro-batch work = one signature agg over the batch +
one equi-join against the store on (band, band_sig) — the store side
is parquet partitioned by batch_id and the join key is
high-cardinality; no state is held in the streaming engine itself, so
state size is never a watermark problem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import dedup
from .incremental import write_batch_idempotent

DOCS_SCHEMA = "doc_id long, text string"


def _existing(spark: SparkSession, path: str, schema: str) -> DataFrame:
    try:
        return spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame([], schema)


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
    that are not near-duplicates of anything kept before them."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        bands_new = dedup.band_signatures(batch_df, shingle=shingle)
        seen = _existing(
            spark,
            bands_path,
            "doc_id long, band int, band_sig string, batch_id long",
        )
        # replay safety: a retried batch must not collide with its own
        # previous (about-to-be-overwritten) signatures
        prior = seen.filter(F.col("batch_id") != batch_id).select(
            "band", "band_sig"
        )
        hist_hit = (
            bands_new.join(prior, ["band", "band_sig"])
            .select("doc_id")
            .distinct()
        )
        survivors = bands_new.join(hist_hit, "doc_id", "left_anti")
        # within-batch near-dups among history survivors: keep-min-id
        wb_drop = (
            survivors.alias("a")
            .join(
                survivors.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_sig") == F.col("b.band_sig"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("b.doc_id").alias("doc_id"))
            .distinct()
        )
        dropped = hist_hit.unionByName(wb_drop).distinct()
        kept = batch_df.join(dropped, "doc_id", "left_anti").withColumn(
            "batch_id", F.lit(batch_id)
        )
        write_batch_idempotent(kept, output_path)
        kept_bands = (
            bands_new.join(dropped, "doc_id", "left_anti")
            .withColumn("batch_id", F.lit(batch_id))
        )
        write_batch_idempotent(kept_bands, bands_path)

    (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", stream_checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
