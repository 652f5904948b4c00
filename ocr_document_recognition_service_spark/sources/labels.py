"""YOLO-format detection-label source + parser (SURVEY §2.1 S5).

The reference parses ``text x_center y_center width height`` lines
into corner boxes, absolute and relative, with numpy arithmetic
(core/utils/read_detection.py:10-100), and its eval loader pairs image
files with same-stem ``.txt`` label files, skipping broken lines with
logging (core/pipelines/loaders/eval_loader.py:21-73).

Spark-first re-expression: labels are rows, the parse is pure column
expressions (split + casts + arithmetic — whole-stage codegen, no
UDF), file pairing is ``input_file_name()``-derived stems, and
"skip broken with logging" becomes a null-tolerant filter whose reject
count is observable (count the dropped rows instead of reading logs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_label_dir(spark: SparkSession, path: str) -> DataFrame:
    """(image_id, line) rows from a directory of YOLO ``.txt`` files —
    image_id = file stem, exactly the reference's image↔label pairing
    key (eval_loader.py:30-41)."""
    raw = spark.read.text(f"{path}/*.txt").withColumn(
        "_file", F.input_file_name()
    )
    # input_file_name() returns a URI — percent-decode so stems with
    # spaces/special chars still match the image-side pairing key.
    # url_decode is form-decoding ('+' → space), but a URI path keeps
    # literal '+' as-is, so protect it ('+' → '%2B') before decoding —
    # a label file named 'img+1.txt' must pair under stem 'img+1'
    raw_stem = F.regexp_extract(F.col("_file"), r"([^/]+)\.txt$", 1)
    stem = F.url_decode(F.replace(raw_stem, F.lit("+"), F.lit("%2B")))
    return raw.select(
        stem.alias("image_id"), F.col("value").alias("line")
    ).filter(F.length(F.trim("line")) > 0)


def parse_yolo_lines(
    labels: DataFrame,
    img_w: float,
    img_h: float,
    line_col: str = "line",
    round_dp: int = 4,
) -> DataFrame:
    """Parse YOLO lines → class + corner boxes, absolute AND relative.

    A line is ``cls x_center y_center width height`` (whitespace
    separated, coordinates normalized to [0, 1]).  Output columns:
    ``cls`` plus relative corners ``rx1 ry1 rx2 ry2`` and absolute
    corners ``x1 y1 x2 y2`` (scaled by *img_w*/*img_h*), all rounded
    *round_dp* — the read_detection.py:42-78 arithmetic as codegen
    expressions.  Malformed lines (wrong field count or non-numeric
    fields) are dropped, the reference's skip-with-log policy; callers
    can diff counts against the input to observe the reject rate.
    """
    toks = F.split(F.trim(F.col(line_col)), r"\s+")
    parsed = labels.withColumn("_t", toks).filter(F.size("_t") == 5)
    cls = F.element_at("_t", 1)
    nums = [
        F.element_at("_t", i + 2).try_cast("double").alias(f"_n{i}")
        for i in range(4)
    ]
    parsed = parsed.select("*", *nums).filter(
        F.col("_n0").isNotNull()
        & F.col("_n1").isNotNull()
        & F.col("_n2").isNotNull()
        & F.col("_n3").isNotNull()
    )
    cx, cy, w, h = (F.col(f"_n{i}") for i in range(4))
    rx1, ry1 = cx - w / 2, cy - h / 2
    rx2, ry2 = cx + w / 2, cy + h / 2

    def r(c):
        return F.round(c, round_dp)

    keep = [c for c in labels.columns if c != line_col]
    return parsed.select(
        *keep,
        cls.alias("cls"),
        r(rx1).alias("rx1"),
        r(ry1).alias("ry1"),
        r(rx2).alias("rx2"),
        r(ry2).alias("ry2"),
        r(rx1 * img_w).alias("x1"),
        r(ry1 * img_h).alias("y1"),
        r(rx2 * img_w).alias("x2"),
        r(ry2 * img_h).alias("y2"),
    )
