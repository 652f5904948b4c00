"""WARC source: ingest Common-Crawl-style WARC files into the pages
table shape (url, warc_ts, html, text, lang).

The engine's canonical input is an Iceberg/parquet pages table, but the
raw upstream format for web corpora is WARC.  This adapter reads WARC
files distributively: ``binaryFile`` scan (one file per task — WARC
files are the natural parallel unit, typically ~1 GB each in Common
Crawl) → Arrow-batched record parser → pages rows.  A deterministic
writer exists for tests/fixtures.

Only ``WARC-Type: response`` records with an HTTP payload become rows;
everything else (warcinfo, request, metadata) is skipped — the standard
extraction-pipeline behavior.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import re
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..charsets import LANGS
from ..pipeline import PAGES_SCHEMA

_CRLF = b"\r\n"
_WARC_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"
_HOST_LANG_RE = re.compile(r"^https?://([a-z]{2})\.")


def write_warc(
    path: str, records: Iterable[tuple[str, dt.datetime, bytes]]
) -> None:
    """Serialize (url, ts, payload) records as a WARC/1.0 file with
    HTTP response envelopes (deterministic record ids)."""
    with open(path, "wb") as f:
        for url, ts, payload in records:
            http = (
                b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html\r\n"
                b"Content-Length: " + str(len(payload)).encode() + _CRLF
                + _CRLF
                + payload
            )
            rid = hashlib.md5(url.encode()).hexdigest()
            headers = [
                b"WARC/1.0",
                b"WARC-Type: response",
                b"WARC-Target-URI: " + url.encode(),
                b"WARC-Date: " + ts.strftime(_WARC_DATE_FMT).encode(),
                b"WARC-Record-ID: <urn:md5:" + rid.encode() + b">",
                b"Content-Type: application/http; msgtype=response",
                b"Content-Length: " + str(len(http)).encode(),
            ]
            f.write(_CRLF.join(headers) + _CRLF + _CRLF + http + _CRLF + _CRLF)


def parse_warc_bytes(
    blob: bytes,
) -> Iterator[tuple[str, dt.datetime | None, bytes]]:
    """Yield (url, ts, payload bytes) for each response record.

    Accepts gzipped input transparently — Common Crawl ships
    ``*.warc.gz`` with per-record gzip members; ``gzip.decompress``
    concatenates multi-member streams."""
    if blob[:2] == b"\x1f\x8b":
        import gzip

        blob = gzip.decompress(blob)
    pos = 0
    n = len(blob)
    while pos < n:
        start = blob.find(b"WARC/", pos)
        if start == -1:
            break
        head_end = blob.find(_CRLF + _CRLF, start)
        if head_end == -1:
            break
        headers: dict[str, str] = {}
        for line in blob[start:head_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("ascii", "replace")
            )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        body_start = head_end + 4
        body = blob[body_start : body_start + length]
        pos = body_start + length
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts: dt.datetime | None = None
        if "warc-date" in headers:
            try:
                ts = dt.datetime.strptime(headers["warc-date"], _WARC_DATE_FMT)
            except ValueError:
                ts = None
        # strip the HTTP envelope
        http_split = body.find(_CRLF + _CRLF)
        payload = body[http_split + 4 :] if http_split != -1 else body
        if url:
            yield url, ts, payload


def read_warc(
    spark: SparkSession,
    path_glob: str,
    infer_lang_from_host: bool = True,
) -> DataFrame:
    """Distributed WARC → pages DataFrame.

    One task per WARC file (binaryFile scan); records parsed inside an
    Arrow batch.  ``lang`` is inferred from a two-letter host prefix
    (our corpus convention) when requested, else left null for the
    pipeline's language-vote branch.
    """
    from ..pydeps import ensure_py_deps

    ensure_py_deps(spark)
    files = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_document_recognition_service_spark.sources.warc import (
            _HOST_LANG_RE,
            parse_warc_bytes,
        )

        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                for url, ts, payload in parse_warc_bytes(bytes(blob)):
                    lang = None
                    if infer_lang_from_host:
                        m = _HOST_LANG_RE.match(url)
                        if m and m.group(1) in LANGS:
                            lang = m.group(1)
                    rows.append((url, ts, payload, None, lang))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return files.mapInPandas(parse, schema=PAGES_SCHEMA)
