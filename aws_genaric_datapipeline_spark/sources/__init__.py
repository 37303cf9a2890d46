"""Source readers (parquet/csv/json/orc/jdbc) with schema enforcement."""

from aws_genaric_datapipeline_spark.sources.readers import read_source, validate_schema

__all__ = ["read_source", "validate_schema"]
