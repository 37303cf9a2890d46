"""Structured Streaming surface.

- ``windows``  — event-time windowed aggregations (tumbling/sliding/session)
  with watermarks; identical expressions work in batch and streaming, which
  is how the driver oracle-checks them.
- ``promote``  — streaming promoter over the pipeline state log: the
  Spark-native replacement for the reference's DynamoDB-Stream→Lambda→Glue
  trigger chain (aws_genaric_datapipeline_stack.py:29,80-83;
  lambda/invoke_prepared.py:20-30).
"""

from aws_genaric_datapipeline_spark.streaming.windows import (
    session_windows,
    sliding_counts,
    stream_events,
    streaming_dedup,
    tumbling_counts,
)
from aws_genaric_datapipeline_spark.streaming.promote import run_streaming_promoter

__all__ = [
    "stream_events",
    "tumbling_counts",
    "sliding_counts",
    "session_windows",
    "streaming_dedup",
    "run_streaming_promoter",
]
