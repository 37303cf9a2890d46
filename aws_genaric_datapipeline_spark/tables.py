"""Access to the driver-generated test tables (TESTDATA.md).

``load`` returns plain DataFrames; nothing is cached or collected here so
Catalyst sees the parquet scan directly (column pruning + predicate pushdown
reach the footer; verify with .explain → PushedFilters/ReadSchema).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
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


def compile_sf_dir(sf_dir: str) -> str:
    """The warm-up/compile scale for a timing run against ``sf_dir``: the
    sibling sf0.001 directory when it exists (so whole-stage codegen and
    Arrow workers warm on ~1k rows), else ``sf_dir`` itself.  Shared by
    bench.py and scripts/full_sweep.py so the convention changes in one
    place."""
    from pathlib import Path

    sibling = Path(sf_dir.rstrip("/")).parent / "sf0.001"
    return str(sibling) if sibling.is_dir() else sf_dir


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = table_path(sf_dir, name)
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS) which Spark's reader rejects
        # (PARQUET_TYPE_ILLEGAL).  Read nanos as long, then floor-divide to
        # microseconds — the same truncation DuckDB applies converting
        # TIMESTAMP_NS → TIMESTAMP, so oracle comparisons agree.  Integer
        # `div`, not `/`: ns-epoch ≈ 1.7e18 overflows double precision.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            # Naive parquet TIMESTAMP(MICROS): Spark reads TIMESTAMP_NTZ while
            # DuckDB treats the same bytes as epoch-UTC.  Session tz is pinned
            # to UTC, so NTZ→LTZ cast preserves the stored value exactly and
            # restores the TIMESTAMP type the whole query surface was built on
            # (unix_micros, double casts, window ranges all require LTZ).
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    """Load one or more test tables as DataFrames."""
    return tuple(_read(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (for spark.sql queries)."""
    for name in TABLES:
        _read(spark, sf_dir, name).createOrReplaceTempView(name)
