"""Custom function surface: Pandas UDFs and grouped-map transforms."""

from aws_genaric_datapipeline_spark.functions.udfs import (
    discounted_price_pandas_udf,
    group_size_udaf,
    trimmed_mean_cents_udaf,
    zscore_per_group,
)

__all__ = [
    "discounted_price_pandas_udf",
    "group_size_udaf",
    "trimmed_mean_cents_udaf",
    "zscore_per_group",
]
