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


def _latest_snapshot(mine: DataFrame) -> int | None:
    """The snapshot a run most recently committed under (a run_id may
    be resumed after the input changed; committed_at is the only
    ordering key — snapshot ids are content fingerprints, not
    monotonic)."""
    row = mine.orderBy(F.col("committed_at").desc()).select(
        "snapshot_id"
    ).first()
    return None if row is None else row["snapshot_id"]


def status(spark: SparkSession, checkpoint_path: str, run_id: str) -> dict:
    """Poll a job (GET /status/{id} analog, app.py:125-163).

    States: ``done`` — every input partition of the run's (latest)
    snapshot is committed (by this or any resuming run); ``partial`` —
    some are not (crashed/in-flight); ``unknown`` — no lineage rows.
    Per-document extraction errors are DATA (``error_rows``), not a job
    state: an engine whose contract is "error rows, not crashes" must
    not mislabel a completed run over messy input as failed."""
    try:
        ck = spark.read.parquet(checkpoint_path)
    except Exception:
        return {"run_id": run_id, "state": "unknown", "partitions": 0}
    mine = ck.filter(F.col("run_id") == run_id)
    snap = _latest_snapshot(mine)
    if snap is None:
        return {"run_id": run_id, "state": "unknown", "partitions": 0}
    # read through the canonical view: after a detected commit race the
    # raw table can hold a loser's shadowed duplicate rows, and raw
    # sums would double-count rows/error_rows (review finding)
    from .lineage import canonical_lineage

    snap_rows = canonical_lineage(spark, checkpoint_path, snap)
    agg = snap_rows.agg(
        F.countDistinct("pid").alias("committed"),
        F.max("expected_partitions").alias("expected"),
        F.sum("row_count").alias("rows"),
        F.sum("error_count").alias("error_rows"),
    ).collect()[0]
    done = agg["expected"] is not None and agg["committed"] >= agg["expected"]
    return {
        "run_id": run_id,
        "state": "done" if done else "partial",
        "snapshot_id": snap,
        "partitions": agg["committed"],
        "expected_partitions": agg["expected"],
        "rows": agg["rows"],
        "error_rows": agg["error_rows"] or 0,
    }


def result(
    spark: SparkSession,
    output_path: str,
    checkpoint_path: str,
    run_id: str,
) -> DataFrame:
    """Fetch a job's extracted rows (GET /result/{id} analog): all
    committed partitions of the run's latest snapshot.  Raises
    ``ValueError`` for an unknown run id or missing checkpoint (the
    404 analog — one exception type for every not-found case)."""
    try:
        ck = spark.read.parquet(checkpoint_path)
        snap = _latest_snapshot(ck.filter(F.col("run_id") == run_id))
    except ValueError:
        raise
    except Exception as exc:
        raise ValueError(f"unknown run_id: {run_id} ({exc})") from None
    if snap is None:
        raise ValueError(f"unknown run_id: {run_id}")
    # committed pids of the SNAPSHOT, not just this run's rows — a
    # resumed job's result is the union of every contributing run
    pids = ck.filter(F.col("snapshot_id") == snap).select("pid").distinct()
    out = spark.read.parquet(lineage.snapshot_output_dir(output_path, snap))
    return out.join(F.broadcast(pids), "pid", "inner")
