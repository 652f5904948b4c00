"""CSV/JSON adapters (S8/S9), W3 split, HTML report sink (S10)."""

import pytest
from pyspark.sql import functions as F

from ocr_document_recognition_service_spark import lineage, report
from ocr_document_recognition_service_spark.sources import tables

pytestmark = pytest.mark.spark


def test_csv_roundtrip(spark, tmp_path):
    df = spark.range(50).select(
        F.col("id"), F.concat(F.lit("name-"), F.col("id")).alias("name")
    )
    path = str(tmp_path / "csv_out")
    tables.write_csv(df, path)
    back = tables.read_csv(spark, path)
    assert back.count() == 50
    assert sorted(back.columns) == ["id", "name"]
    assert back.filter(F.col("name") == "name-7").count() == 1


def test_json_source(spark, tmp_path):
    p = tmp_path / "rows.json"
    p.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    df = tables.read_json(spark, str(p))
    assert df.count() == 2
    assert {r["b"] for r in df.collect()} == {"x", "y"}


def test_random_split_w3(spark):
    # W3 train/val split (ocr_datamodule.py:90-96): seeded, disjoint,
    # exhaustive
    df = spark.range(1000)
    a, b = df.randomSplit([0.8, 0.2], seed=42)
    na, nb = a.count(), b.count()
    assert na + nb == 1000
    assert 700 < na < 900
    a2, b2 = df.randomSplit([0.8, 0.2], seed=42)
    assert a2.count() == na  # deterministic under the same seed


def test_html_report_sink(spark, pages_parquet, tmp_path):
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    lineage.run_extraction(
        spark, pages_parquet, out, ck, "run-r", num_partitions=4
    )
    html_path = tmp_path / "report.html"
    report.write_run_report(
        spark, ck, str(html_path),
        bench_json='{"queries": {"q1": 1.5}}',
    )
    text = html_path.read_text()
    assert "<table>" in text and "run-r" in text and "q1" in text
    assert "Totals" in text


def test_layout_overlay_svg_and_report():
    """BBoxVisualizer analog: every parsed block becomes a polygon with
    its reading-order rank; multi-page report renders one SVG per page."""
    from ocr_document_recognition_service_spark import pdf_extract, report

    pages = [
        [(40.0, 40.0, "first block"), (300.0, 40.0, "second block")],
        [(40.0, 40.0, "page two")],
    ]
    payload = pdf_extract.build_pdf_pages(pages, compress=True)
    svg = report.layout_overlay_svg(payload, page_idx=0)
    assert svg.count("<polygon") == 2
    assert "#0" in svg and "#1" in svg
    assert "first block" in svg and "second block" in svg
    html_page = report.layout_report_html(payload)
    assert html_page.count("<svg") == 2 and "page two" in html_page
    # out-of-range page and non-PDF degrade gracefully
    assert "<polygon" not in report.layout_overlay_svg(payload, page_idx=9)
    assert "<svg" in report.layout_overlay_svg(b"<html></html>")


def test_yolo_label_dir_parse_and_skip_policy(spark, tmp_path):
    """S5: read a directory of YOLO .txt label files, pair by file
    stem, parse to corner boxes; malformed lines are dropped (the
    reference's skip-with-log policy) and the reject count is
    observable as the row-count difference."""
    from ocr_document_recognition_service_spark.sources.labels import (
        parse_yolo_lines,
        read_label_dir,
    )

    d = tmp_path / "labels"
    d.mkdir()
    (d / "img_001.txt").write_text(
        "word 0.5 0.5 0.2 0.1\ntitle 0.1 0.2 0.05 0.04\n"
    )
    (d / "img_002.txt").write_text(
        "word 0.25 0.75 0.5 0.5\n"
        "broken 0.1 0.2\n"          # wrong field count -> dropped
        "bad x y z w\n"             # non-numeric -> dropped
        "\n"                        # blank -> dropped at read
    )
    (d / "page 3.txt").write_text("word 0.5 0.5 0.2 0.1\n")  # space in stem
    (d / "img+1.txt").write_text("word 0.5 0.5 0.2 0.1\n")   # literal '+'
    lines = read_label_dir(spark, str(d))
    assert lines.count() == 7  # blanks already gone
    # input_file_name() URIs are percent-decoded back to the real stem;
    # a literal '+' is a URI path char, NOT a form-encoded space
    stems = {r["image_id"] for r in lines.collect()}
    assert "page 3" in stems and "img+1" in stems
    boxes = parse_yolo_lines(lines, img_w=100.0, img_h=200.0)
    rows = {
        (r["image_id"], r["cls"]): r for r in boxes.collect()
    }
    assert len(rows) == 5  # 2 malformed lines dropped
    r = rows[("img_001", "word")]
    assert (r["rx1"], r["ry1"], r["rx2"], r["ry2"]) == (0.4, 0.45, 0.6, 0.55)
    assert (r["x1"], r["y1"], r["x2"], r["y2"]) == (40.0, 90.0, 60.0, 110.0)
    r2 = rows[("img_002", "word")]
    assert (r2["x1"], r2["y1"], r2["x2"], r2["y2"]) == (0.0, 100.0, 50.0, 200.0)
