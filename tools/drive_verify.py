"""End-to-end drive of the extraction pipeline + lineage (verify aid)."""

import os
import sys
import tempfile
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_document_recognition_service_spark import gen_pages, lineage  # noqa: E402
from ocr_document_recognition_service_spark.session import build_session  # noqa: E402


def main() -> int:
    d = tempfile.mkdtemp()
    src = os.path.join(d, "pages.parquet")
    gen_pages.write_pages_parquet(src, 250)
    spark = build_session(app_name="verify-drive", cores=4, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        out, ck = os.path.join(d, "out"), os.path.join(d, "ck")
        r1 = lineage.run_extraction(
            spark, src, out, ck, "runA", num_partitions=6, limit_partitions=2
        )
        print("RUN1 (killed at 2/6):", r1)
        r2 = lineage.run_extraction(spark, src, out, ck, "runB", num_partitions=6)
        print("RUN2 (resume):", r2)
        print(
            "TOTAL ROWS:",
            spark.read.parquet(out).count(),
            "GLOBAL MD5:",
            lineage.global_md5(spark, out),
        )
        spark.read.parquet(out).select("url", "lang", "n_blocks", "error").orderBy(
            "url"
        ).show(4, truncate=False)

        r3 = lineage.run_extraction(spark, src, out, ck, "runC", num_partitions=6)
        print("PROBE noop rerun -> parts:", r3["partitions_processed"])

        src2 = os.path.join(d, "pages2.parquet")
        gen_pages.write_pages_parquet(src2, 251)
        r4 = lineage.run_extraction(
            spark, src2, os.path.join(d, "out2"), ck, "runD", num_partitions=6
        )
        print(
            "PROBE new snapshot -> parts:",
            r4["partitions_processed"],
            "rows:",
            r4["rows"],
            "snap differs:",
            r4["snapshot_id"] != r1["snapshot_id"],
        )
        spark.read.parquet(ck).select(
            "run_id", "snapshot_id", "pid", "row_count", "error_count", "output_md5"
        ).orderBy("run_id", "pid").show(5, truncate=False)
        return 0
    except Exception:
        traceback.print_exc(file=sys.stdout)
        return 1
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
