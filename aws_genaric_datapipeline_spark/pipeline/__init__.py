"""Raw→prepared batch pipeline with an event-sourced state log.

Replaces the reference's DynamoDB state table + Lambda trigger chain with
Spark-native pieces: an append-only parquet state log (latest-wins reads),
idempotent ingest/promote jobs, and an optional Structured-Streaming
promoter (streaming.promote).
"""

from aws_genaric_datapipeline_spark.pipeline.state import StateStore, States
from aws_genaric_datapipeline_spark.pipeline.jobs import Pipeline

__all__ = ["StateStore", "States", "Pipeline"]
