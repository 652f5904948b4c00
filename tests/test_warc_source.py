"""WARC source: write → distributed read → extract, byte-identical."""

import pytest

from ocr_document_recognition_service_spark import extract_one, gen_pages
from ocr_document_recognition_service_spark.pipeline import extract_pages
from ocr_document_recognition_service_spark.sources import warc

pytestmark = pytest.mark.spark


def test_warc_roundtrip_and_extraction(spark, tmp_path, corpus_rows):
    rows = corpus_rows[:120]
    mid = len(rows) // 2
    for i, chunk in enumerate((rows[:mid], rows[mid:])):
        warc.write_warc(
            str(tmp_path / f"part{i}.warc"),
            [(r["url"], r["warc_ts"], r["html"]) for r in chunk],
        )

    pages = warc.read_warc(spark, str(tmp_path / "*.warc"))
    got = {r["url"]: r for r in pages.collect()}
    assert len(got) == 120
    sample = rows[3]
    assert bytes(got[sample["url"]]["html"]) == sample["html"]
    assert got[sample["url"]]["warc_ts"] == sample["warc_ts"].replace(
        microsecond=0
    )
    # lang inferred from host prefix == generator's actual lang
    for r in rows:
        assert got[r["url"]]["lang"] == r["url"].split("//")[1][:2]

    out = {
        r["url"]: r["text"]
        for r in extract_pages(pages, num_partitions=4).collect()
    }
    # byte-identity vs the oracle, with lang inferred from the host
    for r in rows:
        lang = r["url"].split("//")[1][:2]
        assert out[r["url"]] == extract_one.extract_document(
            r["html"], lang
        ).text, r["url"]


def test_gzipped_warc_supported(spark, tmp_path, corpus_rows):
    import gzip

    rows = corpus_rows[:30]
    raw_path = tmp_path / "plain.warc"
    warc.write_warc(
        str(raw_path), [(r["url"], r["warc_ts"], r["html"]) for r in rows]
    )
    gz_path = tmp_path / "cc.warc.gz"
    gz_path.write_bytes(gzip.compress(raw_path.read_bytes()))
    raw_path.unlink()  # only the .gz remains, as Common Crawl ships it

    pages = warc.read_warc(spark, str(tmp_path / "*.warc.gz"))
    got = {r["url"]: bytes(r["html"]) for r in pages.collect()}
    assert len(got) == 30
    for r in rows:
        assert got[r["url"]] == r["html"]


def test_parse_skips_non_response_records(tmp_path):
    p = tmp_path / "mixed.warc"
    body = b"HTTP/1.1 200 OK\r\n\r\nhello"
    raw = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ninfo\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://en.example.org/x\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
        + body + b"\r\n\r\n"
    )
    p.write_bytes(raw)
    recs = list(warc.parse_warc_bytes(p.read_bytes()))
    assert len(recs) == 1
    url, ts, payload = recs[0]
    assert url == "https://en.example.org/x" and payload == b"hello"
    assert ts is not None and ts.year == 2024
