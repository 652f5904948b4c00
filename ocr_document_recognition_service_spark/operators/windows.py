"""Window/ordering operators (SURVEY §2.7 W1–W6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def reading_order_rank(
    df: DataFrame, part: str, order_cols: list[str]
) -> DataFrame:
    """W1: row_number per partition in a deterministic order."""
    w = Window.partitionBy(part).orderBy(*[F.col(c).asc() for c in order_cols])
    return df.withColumn("rank", F.row_number().over(w).cast("long"))


def chunk_ids(
    docs: DataFrame,
    length_col: str = "n_chars",
    order_col: str = "doc_id",
    max_chars: int = 4000,
) -> DataFrame:
    """W2 size-capped chunking, SQL variant: chunk id from the running
    length BEFORE each row (the deterministic window re-expression of
    the reference's stateful carry loop, wiki_parser_to_pdf.py:89-105;
    also the template for salt-splitting oversized blobs)."""
    w = (
        Window.orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(length_col).over(w) - F.col(length_col)
    return docs.select(
        F.col(order_col),
        F.col(length_col),
        F.floor(cum / max_chars).cast("int").alias("chunk_id"),
    )


def balanced_sample(
    df: DataFrame, group_col: str, order_col: str, n_per_group: int
) -> DataFrame:
    """W4 balanced per-source sample (the reference's 50k-per-source
    train set, datasets/README.md 'v2_50k')."""
    w = Window.partitionBy(group_col).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_per_group)
        .drop("rn")
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the previous event exceeds *gap_seconds*; session_id = running
    count of session starts (classic lag + cumulative-sum plan)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    prev = F.lag(ts_col).over(w)
    is_start = F.when(
        prev.isNull()
        | (
            F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)
            > gap_seconds
        ),
        1,
    ).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("session_id", F.sum(is_start).over(wc))
