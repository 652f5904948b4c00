"""Kill-and-resume lineage tests (SURVEY §5.2 item 5, FIXTURES §4)."""

import pytest

from ocr_document_recognition_service_spark import lineage

pytestmark = pytest.mark.spark

P = 8


def test_snapshot_id_stable_and_content_sensitive(pages_parquet, tmp_path):
    a = lineage.snapshot_id_of(pages_parquet)
    assert a == lineage.snapshot_id_of(pages_parquet)
    other = tmp_path / "other.parquet"
    other.write_bytes(b"x" * 10)
    assert lineage.snapshot_id_of(str(other)) != a


def test_kill_and_resume_processes_only_remainder(spark, pages_parquet, tmp_path):
    out_full = str(tmp_path / "out_full")
    ck_full = str(tmp_path / "ck_full")
    r = lineage.run_extraction(
        spark, pages_parquet, out_full, ck_full, "run-full",
        num_partitions=P, salt_threshold=16 * 1024,
    )
    assert r["partitions_processed"] == P
    assert r["rows"] == 400
    full_md5 = lineage.global_md5(spark, out_full)

    # simulated kill: first run commits only 3 of 8 partitions
    out = str(tmp_path / "out_resume")
    ck = str(tmp_path / "ck_resume")
    r1 = lineage.run_extraction(
        spark, pages_parquet, out, ck, "run-a",
        num_partitions=P, salt_threshold=16 * 1024, limit_partitions=3,
    )
    assert r1["partitions_processed"] == 3

    # resume: must process exactly the remaining 5
    r2 = lineage.run_extraction(
        spark, pages_parquet, out, ck, "run-b",
        num_partitions=P, salt_threshold=16 * 1024,
    )
    assert r2["partitions_processed"] == P - 3
    assert r1["rows"] + r2["rows"] == 400

    # byte-level equivalence with the from-scratch run
    assert lineage.global_md5(spark, out) == full_md5

    # per-partition md5s agree between the two histories
    ckdf = spark.read.parquet(ck).select("pid", "output_md5")
    fulldf = spark.read.parquet(ck_full).select("pid", "output_md5")
    assert sorted(map(tuple, ckdf.collect())) == sorted(map(tuple, fulldf.collect()))

    # idempotence: a third run over a fully-committed snapshot is a no-op
    r3 = lineage.run_extraction(
        spark, pages_parquet, out, ck, "run-c",
        num_partitions=P, salt_threshold=16 * 1024,
    )
    assert r3["partitions_processed"] == 0
    assert lineage.global_md5(spark, out) == full_md5


def test_snapshot_isolation_same_output_dir(spark, pages_parquet, tmp_path):
    """A new input snapshot writing to the SAME output dir must not
    destroy the previous snapshot's committed data (review finding:
    dynamic overwrite would have silently replaced it)."""
    from ocr_document_recognition_service_spark import gen_pages

    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    rA = lineage.run_extraction(
        spark, pages_parquet, out, ck, "run-A", num_partitions=P
    )
    md5_A = lineage.global_md5(spark, out, snapshot_id=rA["snapshot_id"])

    src_b = str(tmp_path / "pagesB.parquet")
    gen_pages.write_pages_parquet(src_b, 150, seed=7)
    rB = lineage.run_extraction(
        spark, src_b, out, ck, "run-B", num_partitions=P
    )
    assert rB["snapshot_id"] != rA["snapshot_id"]
    assert rB["rows"] == 150

    # snapshot A's data is intact and its lineage still true
    assert lineage.global_md5(spark, out, snapshot_id=rA["snapshot_id"]) == md5_A
    # resume of snapshot A remains a no-op (all partitions committed)
    rA2 = lineage.run_extraction(
        spark, pages_parquet, out, ck, "run-A2", num_partitions=P
    )
    assert rA2["partitions_processed"] == 0


def test_crash_between_write_and_commit_no_duplicates(
    spark, pages_parquet, tmp_path
):
    """Crash injection: data written but lineage never committed →
    resume rewrites the orphaned partitions; no duplicate rows, final
    output byte-equal to a clean run."""
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    r1 = lineage.run_extraction(
        spark, pages_parquet, out, ck, "run-a",
        num_partitions=P, salt_threshold=16 * 1024, limit_partitions=2,
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        lineage.run_extraction(
            spark, pages_parquet, out, ck, "run-crash",
            num_partitions=P, salt_threshold=16 * 1024,
            fail_before_commit=True,
        )
    # orphaned pid dirs exist on disk but are NOT committed
    assert spark.read.parquet(out).count() == 400  # data all present
    # resume trusts lineage only: reprocesses the 6 uncommitted pids
    r2 = lineage.run_extraction(
        spark, pages_parquet, out, ck, "run-b",
        num_partitions=P, salt_threshold=16 * 1024,
    )
    assert r2["partitions_processed"] == P - 2
    assert r1["rows"] + r2["rows"] == 400
    df = spark.read.parquet(out)
    assert df.count() == 400
    assert df.select("url").distinct().count() == 400  # no duplicates
