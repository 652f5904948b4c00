"""Config-driven stage registry (SURVEY §2.11).

The reference composes its pipeline from a Hydra config of
``_target_`` entries (core/config/core/core.yaml — each YAML node
names a class to instantiate and its params).  The Spark analog: a
named-stage dict where every stage is ``(DataFrame, **params) ->
DataFrame``, and a pipeline is a plain JSON/YAML-serializable list of
``{"stage": <name>, <param>: <value>, ...}`` dicts run left to right.

Stages only *declare* plans — running a config list builds one lazy
DataFrame DAG, so Catalyst still sees (and optimizes across) the whole
composition; the registry adds zero execution overhead.

``curate.curate()`` runs its extract→quality→dedup→sample front half
through this registry via ``curate_config()`` — the default pipeline
IS a config list, and tests compose custom orders from the same dict.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, functions as F

from . import dedup, text_analysis, windows

STAGES: dict[str, Callable[..., DataFrame]] = {}


def stage(name: str):
    def deco(fn: Callable[..., DataFrame]):
        STAGES[name] = fn
        return fn

    return deco


def run_pipeline(df: DataFrame, config: list[dict[str, Any]]) -> DataFrame:
    """Apply a config list of named stages to *df* in order.

    Each item: ``{"stage": <registered name>, **params}``.  Unknown
    names raise with the available registry (fail loud, like Hydra's
    unknown ``_target_``).
    """
    for item in config:
        item = dict(item)
        name = item.pop("stage")
        if name not in STAGES:
            raise KeyError(
                f"unknown stage {name!r}; registered: {sorted(STAGES)}"
            )
        df = STAGES[name](df, **item)
    return df


@stage("drop_errors")
def drop_errors(df: DataFrame) -> DataFrame:
    """Extraction output → clean doc frame: drop error/empty rows
    (lineage counts them; they are not food), key by xxhash64(url)."""
    return (
        df.filter(F.col("error").isNull() & (F.length("text") > 0))
        .select("url", "lang", "text")
        .withColumn("doc_id", F.xxhash64("url"))
    )


@stage("quality_gate")
def quality_gate(
    df: DataFrame, min_tokens: int = 20, min_score: float = 0.3
) -> DataFrame:
    """Token-count + quality-score filter (D3-family features,
    JVM-side expressions only)."""
    q = text_analysis.quality_score(df)
    return (
        df.join(q, "doc_id")
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("quality_score") >= min_score)
        )
        .select("doc_id", "url", "lang", "text", "n_tokens", "quality_score")
    )


@stage("exact_dedup")
def exact_dedup(df: DataFrame) -> DataFrame:
    """Keep the smallest url per normalized-text fingerprint — the
    same oracled fingerprint family as ta3."""
    fps = text_analysis.fingerprints(df).select("doc_id", "fingerprint")
    keep_urls = (
        df.join(fps, "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("url").alias("url"))
        .select("url")
    )
    return df.join(keep_urls, "url")


@stage("neardup_lsh")
def neardup_lsh(df: DataFrame) -> DataFrame:
    """MinHash-LSH near-dup removal: drop the lexicographically larger
    url of every candidate pair (deterministic keep policy)."""
    pairs = dedup.lsh_candidate_pairs(
        df.select(F.col("url").alias("doc_id"), "text"), shingle="w3"
    )
    drop = pairs.select(F.greatest("doc_a", "doc_b").alias("url")).distinct()
    return df.join(drop, "url", "left_anti")


@stage("balanced_sample")
def balanced_sample_stage(
    df: DataFrame,
    group_col: str = "lang",
    order_col: str = "url",
    n_per_group: int = 10_000,
) -> DataFrame:
    return windows.balanced_sample(df, group_col, order_col, n_per_group)


@stage("redact")
def redact_stage(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII/noise redaction applied in-place to the text column — the
    SAME expression ta6 pins by md5 (text_analysis.redacted_col)."""
    return df.withColumn(text_col, text_analysis.redacted_col(text_col))


@stage("decontaminate")
def decontaminate(
    df: DataFrame,
    probe_parquet: str,
    n: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination as a pipeline stage: DROP every doc
    sharing any word *n*-gram with the probe corpus at *probe_parquet*
    (a doc_id/text parquet — the eval suite), via an anti-join on
    ``text_analysis.contaminated_ids`` (the flagged-ids core, WITHOUT
    contamination_flags' zero-fill left join — which would evaluate
    this frame's possibly-UDF-bearing subtree a third time).
    Config-serializable by path, so the curation config can name its
    benchmark set the way the reference's Hydra config names its
    datasets."""
    spark = df.sparkSession
    probes = spark.read.parquet(probe_parquet).select("doc_id", text_col)
    flagged = text_analysis.contaminated_ids(
        df, probes, n=n, text_col=text_col
    )
    return df.join(flagged, "doc_id", "left_anti")


@stage("lang_filter")
def lang_filter(df: DataFrame, langs: list[str] | None = None) -> DataFrame:
    """Keep only the named languages (branch routing; with a
    lang-partitioned source this prunes at scan).  ``None`` = no-op;
    an explicit empty list means "keep nothing" and is honored."""
    if langs is None:
        return df
    return df.filter(F.col("lang").isin(list(langs)))


def curate_config(
    min_tokens: int = 20,
    min_score: float = 0.3,
    n_per_lang: int = 10_000,
) -> list[dict[str, Any]]:
    """The default curation front half as a config list — what
    ``curate.curate()`` executes."""
    return [
        {"stage": "drop_errors"},
        {
            "stage": "quality_gate",
            "min_tokens": min_tokens,
            "min_score": min_score,
        },
        {"stage": "exact_dedup"},
        {"stage": "neardup_lsh"},
        {
            "stage": "balanced_sample",
            "group_col": "lang",
            "order_col": "url",
            "n_per_group": n_per_lang,
        },
    ]


@stage("project_curated")
def project_curated(
    df: DataFrame,
    cols: tuple[str, ...] = ("url", "lang", "text", "n_tokens", "quality_score"),
) -> DataFrame:
    """Final curated-column projection (the narrow frame the tail
    stages and any sink consume)."""
    return df.select(*cols)


@stage("train_val_split")
def train_val_split_stage(
    df: DataFrame,
    part: str | int = "train",
    weights: tuple[float, ...] = (0.8, 0.2),
    seed: int = 42,
) -> DataFrame:
    """Seeded train/val split as a registry stage (W3).  *part* picks
    which split this pipeline yields ('train'/'val' or an index);
    randomSplit is deterministic in (input, weights, seed), so separate
    pipelines for 'train' and 'val' partition the input exactly."""
    idx = {"train": 0, "val": 1}.get(part, part)
    if not isinstance(idx, int):
        raise KeyError(f"unknown split part {part!r}")
    return df.randomSplit(list(weights), seed=seed)[idx]


@stage("lang_stats")
def lang_stats(df: DataFrame) -> DataFrame:
    """Per-language corpus report (n_docs, total_tokens, avg_quality) —
    the curation run's summary tail."""
    return df.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("quality_score"), 4).alias("avg_quality"),
    )


def full_curate_config(
    min_tokens: int = 20,
    min_score: float = 0.3,
    n_per_lang: int = 10_000,
    split_weights: tuple[float, float] = (0.8, 0.2),
    seed: int = 42,
) -> dict[str, list[dict[str, Any]]]:
    """The WHOLE curation pipeline — front half, projection, split and
    stats — as config lists, one per output frame (the complete Hydra
    ``_target_`` analog: core/config/core/core.yaml composes the
    reference's pipeline the same way).  ``curate.curate()`` executes
    exactly these; callers can rewire any of it in data."""
    front = curate_config(
        min_tokens=min_tokens, min_score=min_score, n_per_lang=n_per_lang
    ) + [{"stage": "project_curated"}]
    split = {
        "stage": "train_val_split",
        "weights": list(split_weights),
        "seed": seed,
    }
    return {
        "curated": front,
        "train": [dict(split, part="train")],
        "val": [dict(split, part="val")],
        "stats": [{"stage": "lang_stats"}],
    }
