"""Job-tracking API over the lineage table (SURVEY §2.1 S11, §3.2).

The reference exposes an async task queue: ``POST /process`` mints a
uuid and seeds ``tasks[id] = {status: pending,…}``, a worker flips it
to done/error, clients poll ``GET /status/{id}`` / ``GET /result/{id}``
(``core/app.py:86-194``) — all in process memory, lost on restart
(the code itself suggests Redis, app.py:21).

Here the same surface is three functions over durable tables: submit =
run the extraction (its lineage rows ARE the status store), status =
read the checkpoint table, result = read the output namespace.  This
survives restarts by construction and scales with the table."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import lineage


def submit(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    run_id: str | None = None,
    **kwargs,
) -> str:
    """Run (or resume) an extraction job; returns its run id."""
    run_id = run_id or f"job-{uuid.uuid4().hex[:12]}"
    lineage.run_extraction(
        spark, input_path, output_path, checkpoint_path, run_id, **kwargs
    )
    return run_id


def status(spark: SparkSession, checkpoint_path: str, run_id: str) -> dict:
    """Poll a job: done/error/unknown + per-partition progress counters
    (the analog of GET /status/{id}, app.py:125-163)."""
    try:
        ck = spark.read.parquet(checkpoint_path)
    except Exception:
        return {"run_id": run_id, "state": "unknown", "partitions": 0}
    mine = ck.filter(F.col("run_id") == run_id)
    row = mine.agg(
        F.countDistinct("pid").alias("parts"),
        F.sum("row_count").alias("rows"),
        F.sum("error_count").alias("errors"),
        F.max("snapshot_id").alias("snapshot_id"),
    ).collect()[0]
    if row["parts"] == 0:
        return {"run_id": run_id, "state": "unknown", "partitions": 0}
    return {
        "run_id": run_id,
        "state": "error" if (row["errors"] or 0) > 0 else "done",
        "partitions": row["parts"],
        "rows": row["rows"],
        "errors": row["errors"] or 0,
        "snapshot_id": row["snapshot_id"],
    }


def result(
    spark: SparkSession,
    output_path: str,
    checkpoint_path: str,
    run_id: str,
) -> DataFrame:
    """Fetch a job's extracted rows (GET /result/{id} analog): the
    partitions this run committed, from its snapshot's namespace."""
    ck = spark.read.parquet(checkpoint_path).filter(
        F.col("run_id") == run_id
    )
    snap = ck.select("snapshot_id").first()
    if snap is None:
        raise ValueError(f"unknown run_id: {run_id}")
    pids = ck.select("pid").distinct()
    out = spark.read.parquet(
        lineage.snapshot_output_dir(output_path, snap["snapshot_id"])
    )
    return out.join(F.broadcast(pids), "pid", "inner")
