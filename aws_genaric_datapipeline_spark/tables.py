"""Access to the driver-generated test tables (TESTDATA.md).

``load`` returns plain DataFrames; nothing is cached or collected here so
Catalyst sees the parquet scan directly (column pruning + predicate pushdown
reach the footer; verify with .explain → PushedFilters/ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    """Load one or more test tables as DataFrames."""
    return tuple(spark.read.parquet(table_path(sf_dir, n)) for n in names)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (for spark.sql queries)."""
    for name in TABLES:
        spark.read.parquet(table_path(sf_dir, name)).createOrReplaceTempView(name)
