"""Curation pipeline: composition invariants."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocr_document_recognition_service_spark import gen_pages
from ocr_document_recognition_service_spark.operators.curate import curate
from ocr_document_recognition_service_spark.pipeline import (
    PAGES_SCHEMA,
    extract_pages,
)

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def curated(spark):
    rows = list(gen_pages.gen_rows(250))
    # append an exact duplicate page under a later url (dedup bait)
    dup = dict(rows[3])
    dup["url"] = "https://zz-dup.example.org/doc/copy"
    rows.append(dup)
    pages = spark.createDataFrame(pd.DataFrame(rows), schema=PAGES_SCHEMA)
    extracted = extract_pages(pages, salt_threshold=16 * 1024, num_partitions=8)
    return rows, curate(extracted, min_tokens=10, min_score=0.2, n_per_lang=500)


def test_monotonic_reduction_and_gates(curated, spark):
    rows, out = curated
    c = out["curated"]
    n = c.count()
    assert 0 < n <= len(rows)
    # gates hold on every surviving row
    bad = c.filter(
        (F.col("n_tokens") < 10) | (F.col("quality_score") < 0.2)
    ).count()
    assert bad == 0


def test_exact_duplicate_removed(curated):
    rows, out = curated
    urls = {r["url"] for r in out["curated"].collect()}
    # the duplicate url sorts after the original → dropped; original kept
    assert "https://zz-dup.example.org/doc/copy" not in urls
    assert rows[3]["url"] in urls or rows[3]["lang"] is None


def test_split_disjoint_exhaustive(curated):
    _, out = curated
    n = out["curated"].count()
    tr, va = out["train"].count(), out["val"].count()
    assert tr + va == n
    overlap = out["train"].select("url").intersect(
        out["val"].select("url")
    ).count()
    assert overlap == 0


def test_stats_shape_and_determinism(curated, spark):
    rows, out = curated
    stats = {r["lang"]: r for r in out["stats"].collect()}
    assert set(stats) <= {"en", "ru", "kk"}
    total = sum(r["n_docs"] for r in stats.values())
    assert total == out["curated"].count()

    # a genuinely fresh curate() invocation over freshly-built input
    # must yield the identical curated set (determinism contract)
    pages = spark.createDataFrame(pd.DataFrame(rows), schema=PAGES_SCHEMA)
    extracted = extract_pages(pages, salt_threshold=16 * 1024, num_partitions=8)
    out2 = curate(extracted, min_tokens=10, min_score=0.2, n_per_lang=500)
    first = {r["url"] for r in out["curated"].collect()}
    second = {r["url"] for r in out2["curated"].collect()}
    out2["curated"].unpersist()
    assert first == second
