"""Shared fixtures: one local SparkSession per test session, corpora."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from ocr_document_recognition_service_spark import gen_pages  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    from ocr_document_recognition_service_spark.session import build_session

    spark = build_session(app_name="tests", cores=4, shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def corpus_rows():
    """The standard 400-row deterministic corpus."""
    return list(gen_pages.gen_rows(400))


@pytest.fixture(scope="session")
def pages_parquet(tmp_path_factory):
    path = tmp_path_factory.mktemp("pages") / "pages.parquet"
    gen_pages.write_pages_parquet(str(path), 400)
    return str(path)


SF_DIR = "/root/testdata/sf0.01"
