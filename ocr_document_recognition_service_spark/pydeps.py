"""Ship this package to Spark Python workers (``--py-files`` analog).

On a real cluster the job runs ``spark-submit --py-files pkg.zip``
(north rule); in-process, ``ensure_py_deps(spark)`` zips the package
once and registers it with ``SparkContext.addPyFile`` so executor-side
pandas UDFs can import the extraction kernel regardless of the
driver's cwd/sys.path.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_FLAG = "_ocr_doc_spark_pydeps_added"


def package_zip_path() -> str:
    """Build (once per process) a zip of this package in a temp dir."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    out = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{os.getpid()}.zip"
    )
    if not os.path.exists(out):
        with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for f in sorted(files):
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            pkg_name, os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, rel)
    return out


def ensure_py_deps(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _FLAG, False):
        return
    sc.addPyFile(package_zip_path())
    setattr(sc, _FLAG, True)
