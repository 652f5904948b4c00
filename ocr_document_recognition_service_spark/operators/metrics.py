"""Quality-metric aggregates (SURVEY §2.6 A3–A7).

The reference accumulates WRR/CRR in a Python object over a greedy
IoU match loop (``core/utils/metrics.py:107-153``) and CER/WER as
streaming counters (``cer_metric.py:12-18``, ``wer_metric.py:11-17``).
Here each is a single declarative aggregate — partial aggregation
(map-side combine) and codegen for free; ``F.levenshtein`` replaces
``editdistance``/``fuzz.ratio``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def wrr(pairs: DataFrame, pred: str = "pred_text", gt: str = "gt_text") -> F.Column:
    """Word recognition rate: exact lowercased match share (A3,
    metrics.py:117-125,138-141)."""
    return F.round(
        F.avg(
            F.when(F.lower(F.col(pred)) == F.lower(F.col(gt)), 1.0).otherwise(0.0)
        ),
        6,
    )


def crr(
    pairs: DataFrame,
    pred: str = "pred_text",
    gt: str = "gt_text",
    lev: F.Column | None = None,
) -> F.Column:
    """Char recognition rate: similarity-weighted char share (A4,
    metrics.py:126,143-153); fuzz.ratio → 1 − lev/max(len).  *lev*
    optionally injects a pre-staged edit-distance column (see
    ``eval_report``)."""
    if lev is None:
        lev = F.levenshtein(F.col(pred), F.col(gt))
    sim = 1 - lev / F.greatest(
        F.length(F.col(pred)), F.length(F.col(gt)), F.lit(1)
    )
    return F.round(
        F.sum(sim * F.length(F.col(gt))) / F.sum(F.length(F.col(gt))), 6
    )


def cer(
    pairs: DataFrame,
    pred: str = "pred_text",
    gt: str = "gt_text",
    lev: F.Column | None = None,
) -> F.Column:
    """Character error rate (A5, cer_metric.py:12-18)."""
    if lev is None:
        lev = F.levenshtein(F.col(pred), F.col(gt))
    return F.round(
        F.sum(lev) / F.sum(F.length(F.col(gt))),
        6,
    )


def wer(pairs: DataFrame, pred: str = "pred_text", gt: str = "gt_text") -> F.Column:
    """Word-level error indicator mean (A6, wer_metric.py:11-17)."""
    return F.round(
        F.avg(
            F.when(F.trim(F.col(pred)) != F.trim(F.col(gt)), 1.0).otherwise(0.0)
        ),
        6,
    )


def eval_report(
    pairs: DataFrame, lev_bound: F.Column | None = None
) -> DataFrame:
    """All metrics in one aggregate + harmonic mean (A7, crnn.py:221).

    *lev_bound* (r8, guide §1.2 "per-task work"): an optional per-row
    UPPER BOUND on levenshtein(pred, gt), supplied by a caller that
    knows how the pair was constructed.  When given, the distance is
    staged once as ``levenshtein(pred, gt, bound)`` — Spark's
    thresholded form runs a banded O(len·bound) DP instead of the full
    O(len²) table, and with bound ≥ the true distance it returns the
    EXACT distance (the -1 early-exit can never trigger), so CRR/CER
    are unchanged.  Staging also guarantees one distance computation
    feeds both aggregates.  Measured on a3 at sf1.0: the levenshtein
    scan drops 2.10 s → 1.38 s (mean ~300-char docs, bound ≈ 25).
    """
    if lev_bound is not None:
        pairs = pairs.withColumn(
            "_lev",
            F.call_function(
                "levenshtein",
                F.col("pred_text"),
                F.col("gt_text"),
                lev_bound,
            ),
        )
        lev = F.col("_lev")
    else:
        lev = None
    agg = pairs.agg(
        wrr(pairs).alias("wrr"),
        crr(pairs, lev=lev).alias("crr"),
        cer(pairs, lev=lev).alias("cer"),
        wer(pairs).alias("wer"),
    )
    return agg.withColumn(
        "harmonic_cer_wer",
        F.round(
            2 * F.col("cer") * F.col("wer")
            / (F.col("cer") + F.col("wer") + F.lit(1e-8)),
            6,
        ),
    )


def match_report(
    iou_df: DataFrame,
    thresholds: list[float],
    key: str = "l_orderkey",
    score: str = "iou",
    tiebreak: str = "l_linenumber",
) -> DataFrame:
    """A9-lite detection precision/recall at IoU thresholds.

    Re-expresses the reference's greedy per-GT match loop
    (core/utils/metrics.py:128-145; threshold 0.6 from
    core/config/evaluate.yaml:5-6) as the A2 best-match window: one GT
    object per *key*, its best-scoring candidate row wins, a match
    requires score strictly ABOVE the threshold (reference
    ``max_iou > self.iou_threshold``).  recall = matched / n_gt,
    precision = matched / n_pred (all candidate rows).
    """
    best = best_match_per_key(iou_df, key, score, tiebreak).select(key, score)
    spark = iou_df.sparkSession
    thr = spark.createDataFrame(
        [(float(t),) for t in thresholds], "iou_threshold double"
    )
    tot = iou_df.agg(F.count("*").cast("long").alias("n_pred"))
    matched = F.sum(
        F.when(F.col(score) > F.col("iou_threshold"), 1).otherwise(0)
    ).cast("long")
    return (
        best.crossJoin(F.broadcast(thr))
        .crossJoin(F.broadcast(tot))
        .groupBy("iou_threshold")
        .agg(
            F.count("*").cast("long").alias("n_gt"),
            F.max("n_pred").alias("n_pred"),
            matched.alias("matched"),
        )
        .select(
            "iou_threshold",
            "n_gt",
            "n_pred",
            "matched",
            F.round(F.col("matched") / F.col("n_pred"), 6).alias("prec"),
            F.round(F.col("matched") / F.col("n_gt"), 6).alias("recall"),
        )
    )


def ap_report(
    preds: DataFrame,
    thresholds: list[float],
    key: str,
    conf: str,
    score: str = "iou",
    tiebreak: str = "l_linenumber",
    conf_band: float | None = None,
) -> DataFrame:
    """A9 completion: full PR-curve average precision (AP) per IoU
    threshold — the rank-sweep the reference delegates to ultralytics
    DetMetrics (core/utils/metrics.py:26-66), as pure windows.

    Semantics (exact, continuous AP — no 101-point interpolation):
    rank all predictions by confidence desc; a prediction is TP iff it
    is the highest-confidence candidate for its GT *key* (greedy match,
    metrics.py:128-145) AND its *score* is strictly above the
    threshold; AP = Σ_{TP ranks i} precision@i / n_gt.

    Scale shape: a plain ``Window.orderBy(conf)`` funnels every
    prediction through ONE task.  Here rank and running-TP decompose
    over confidence bands ``_g = floor(conf / conf_band)`` (monotone in
    the global desc order): per-(threshold, band) local windows run in
    parallel, then tiny per-band (count, tp) exclusive prefixes are
    broadcast back — the ``chunk_ids`` two-pass prefix-sum pattern.
    Band ties cannot split across groups (equal conf ⇒ equal band).

    *conf_band* defaults to (max−min)/256 measured from the data,
    folded INTO the plan as a broadcast 1-row aggregate (the ta8 ``_n``
    pattern) — no driver collect, so ``ap_report`` composes lazily and
    costs one fewer synchronous job.  A fixed default would silently
    collapse to ONE band (and the single-task funnel) for confidences
    on a scale it wasn't tuned for, e.g. detector scores in [0, 1].
    The double casts keep the arithmetic type-safe for DecimalType
    confidence columns.
    """
    spark = preds.sparkSession
    thr = spark.createDataFrame(
        [(float(t),) for t in thresholds], "iou_threshold double"
    )
    best_w = Window.partitionBy(key).orderBy(
        F.col(conf).desc(), F.col(tiebreak).asc()
    )
    base = preds.withColumn(
        "_best", (F.row_number().over(best_w) == 1).cast("int")
    )
    if conf_band is None:
        band_df = preds.agg(
            F.greatest(
                (
                    F.max(F.col(conf).cast("double"))
                    - F.min(F.col(conf).cast("double"))
                )
                / F.lit(256.0),
                F.lit(1e-9),
            ).alias("_band")
        )
        base = base.crossJoin(F.broadcast(band_df))
        band = F.col("_band")
    else:
        band = F.lit(float(conf_band))
    x = (
        base.crossJoin(F.broadcast(thr))
        .withColumn(
            "_tp",
            (
                (F.col("_best") == 1)
                & (F.col(score) > F.col("iou_threshold"))
            ).cast("int"),
        )
        .withColumn("_g", F.floor(F.col(conf).cast("double") / band))
        .drop("_band")
    )
    order = [F.col(conf).desc(), F.col(key).asc(), F.col(tiebreak).asc()]
    wr = Window.partitionBy("iou_threshold", "_g").orderBy(*order)
    wsum = wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = x.withColumn("_rn", F.row_number().over(wr)).withColumn(
        "_ctp", F.sum("_tp").over(wsum)
    )
    wo = (
        Window.partitionBy("iou_threshold")
        .orderBy(F.col("_g").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        x.groupBy("iou_threshold", "_g")
        .agg(F.count("*").alias("_c"), F.sum("_tp").alias("_t"))
        .withColumn("_offn", F.coalesce(F.sum("_c").over(wo), F.lit(0)))
        .withColumn("_offtp", F.coalesce(F.sum("_t").over(wo), F.lit(0)))
        .select("iou_threshold", "_g", "_offn", "_offtp")
    )
    i = (F.col("_rn") + F.col("_offn")).cast("double")
    cum_tp = (F.col("_ctp") + F.col("_offtp")).cast("double")
    term = F.when(F.col("_tp") == 1, cum_tp / i)
    return (
        local.join(F.broadcast(offs), ["iou_threshold", "_g"])
        .groupBy("iou_threshold")
        .agg(
            F.countDistinct(key).cast("long").alias("n_gt"),
            F.count("*").cast("long").alias("n_pred"),
            F.sum("_tp").cast("long").alias("n_tp"),
            F.round(
                F.coalesce(F.sum(term), F.lit(0.0)) / F.countDistinct(key),
                6,
            ).alias("ap"),
        )
    )


def best_match_per_key(
    df: DataFrame, key: str, score: str, tiebreak: str
) -> DataFrame:
    """Best match per key: the row with max *score*, ties broken by
    min *tiebreak* (A2 greedy argmax).

    r8 form (guide §2.3 "aggregate before you shuffle"): ONE
    ``max(struct(score, −tiebreak, row))`` hash aggregate — partial
    map-side aggregation collapses each partition to one candidate per
    key before the exchange, where the old row_number window shuffled
    and sorted EVERY row (measured on a2 at sf1.0: 1.78 s → 1.32 s).
    Same output rows: struct ordering compares (score desc via max,
    then −tiebreak i.e. tiebreak asc); on a full (score, tiebreak) tie
    the trailing row struct decides deterministically, where the
    window form's row_number pick was partition-order-dependent — a
    strict improvement, and our callers' tiebreaks are unique per key.
    *tiebreak* must be numeric (negatable).  Project *df* down to the
    columns you need first: every column rides inside the struct
    through the aggregation (the window form was equally wide after
    column pruning)."""
    rest = [c for c in df.columns if c != key]
    packed = df.groupBy(key).agg(
        F.max(
            F.struct(
                F.col(score).alias("_sc"),
                (-F.col(tiebreak)).alias("_ntb"),
                F.struct(*[F.col(c) for c in rest]).alias("_row"),
            )
        ).alias("_best")
    )
    return packed.select(
        *[
            F.col(key) if c == key else F.col(f"_best._row.{c}").alias(c)
            for c in df.columns
        ]
    )
