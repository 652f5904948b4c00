"""Structured Streaming windowed/stateful operators.

The reference is batch (SURVEY §2.10), so these are the forward-looking
stream equivalents of its aggregation surface:

- ``windowed_event_counts``: event-time tumbling window + watermark —
  the streaming form of the batch hourly rollup (ev1), late data
  bounded by the watermark.
- ``stateful_user_counts``: ``applyInPandasWithState`` — the custom
  stateful-operator pattern (running per-user totals with a GroupState
  carrying (count, sum) across micro-batches).

Both are exercised with ``trigger(availableNow=True)`` drains in tests
and compared against their batch twins.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window counts per event_type.

    Works on both a streaming and a batch DataFrame (same plan); in
    streaming, the watermark bounds state and admits late rows up to
    the configured delay.
    """
    # watermarks require TIMESTAMP (tz-aware); parquet often yields NTZ
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_dedup(
    pages: DataFrame,
    key: str = "url",
    ts_col: str = "warc_ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival per *key*,
    dropping re-crawls that land within the watermark horizon —
    ``dropDuplicatesWithinWatermark`` bounds the key-state the way an
    unbounded ``dropDuplicates`` cannot (the 100 TB requirement: state
    proportional to the watermark window, not the corpus).  Works on a
    batch frame too (plain dropDuplicates) for the equality tests."""
    src = pages.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if src.isStreaming:
        return src.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            [key]
        )
    return src.dropDuplicates([key])


_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)
_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_user(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def stateful_user_counts(events: DataFrame) -> DataFrame:
    """Running per-user (count, sum) via applyInPandasWithState.

    Emits the updated running totals for every user seen in each
    micro-batch; state persists across batches via the stream
    checkpoint — the streaming analog of a groupBy running aggregate.
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
