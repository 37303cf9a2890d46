"""Driver queries exercising the Pandas-UDF surface with oracle checks
(the UDF logic is deterministic arithmetic, so DuckDB can replicate it)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_genaric_datapipeline_spark.functions import (
    discounted_price_pandas_udf,
    zscore_per_group,
)
from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.tables import load


@query(
    "udf_scalar_pandas",
    oracle="""
        SELECT l_returnflag,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS disc_revenue
        FROM lineitem
        WHERE l_orderkey <= 5000
        GROUP BY l_returnflag
    """,
    tags=("udf",),
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf (Arrow-vectorized) in an aggregation pipeline —
    numerically identical to the built-in expression the oracle uses."""
    (lineitem,) = load(spark, sf_dir, "lineitem")
    return (
        lineitem.where(F.col("l_orderkey") <= 5000)
        .withColumn(
            "disc_price",
            discounted_price_pandas_udf(F.col("l_extendedprice"), F.col("l_discount")),
        )
        .groupBy("l_returnflag")
        .agg(F.round(F.sum("disc_price"), 2).alias("disc_revenue"))
    )


@query(
    "udf_grouped_zscore",
    oracle="""
        SELECT event_id, event_type,
               round((value - avg(value) OVER (PARTITION BY event_type))
                     / stddev_samp(value) OVER (PARTITION BY event_type), 4) AS zscore
        FROM events
        WHERE user_id <= 50
    """,
    tags=("udf", "grouped-map"),
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas z-score per event type; oracle replicates
    with window aggregates (pandas ddof=1 ≡ stddev_samp)."""
    (events,) = load(spark, sf_dir, "events")
    scored = zscore_per_group(
        events.where(F.col("user_id") <= 50), "event_type", "value", keep_cols=("event_id",)
    )
    return scored.select("event_id", "event_type", F.round("zscore", 4).alias("zscore"))
