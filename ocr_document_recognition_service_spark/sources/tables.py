"""Parquet table loading for the driver testdata + pages tables.

The table format sits behind this adapter (SURVEY §7.5): in the sandbox
it is plain parquet plus the lineage module's emulated snapshot ids; on
a cluster, swap ``spark.read.parquet`` for
``spark.read.format("iceberg").load`` — call sites don't change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TPCH_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(name)
