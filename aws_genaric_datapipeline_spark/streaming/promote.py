"""Event-driven promotion: a Structured Streaming job over the state log.

The reference chained DynamoDB Streams → Lambda (batch_size=1, filtered to
INSERT events) → Glue job start (aws_genaric_datapipeline_stack.py:29,80-83;
lambda/invoke_prepared.py:20-30).  Here the state log *is* the stream: new
RAW_COMPLETED rows appear as new parquet files, a file-source stream picks
them up, and ``foreachBatch`` promotes each batch.  Exactly-once comes from
the combination of checkpointed source offsets and promote idempotence
(dynamic partition overwrite + latest-wins state) — a retried micro-batch
re-promotes harmlessly.

``trigger(availableNow=True)`` drains everything pending then stops — the
batch-drain mode used by tests and cron-style deployments; drop it for a
continuously running promoter.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_genaric_datapipeline_spark.pipeline.jobs import Pipeline
from aws_genaric_datapipeline_spark.pipeline.state import STATE_SCHEMA, States


def run_streaming_promoter(
    pipeline: Pipeline,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Stream RAW_COMPLETED transitions into promote_batch calls.

    available_now=True drains pending batches and returns the promoted batch
    ids (list[str]).  available_now=False starts a continuous promoter and
    returns the live ``StreamingQuery`` so callers can await/monitor/stop it.
    """
    spark = pipeline.spark
    promoted: list[str] = []

    transitions = (
        spark.readStream.schema(STATE_SCHEMA)
        .parquet(pipeline.cfg.state_path)
        .where(
            (F.col("job_src") == pipeline.cfg.job_src)
            & (F.col("state") == States.RAW_COMPLETED)
        )
        .select("batch_id")
    )

    def handle(batch_df: DataFrame, _epoch_id: int) -> None:
        # control rows only (one per ingested batch) — collect is bounded
        ids = [r["batch_id"] for r in batch_df.distinct().collect()]
        # guard against replays racing a completed promote: re-check current
        # state so only still-pending batches run
        pending = {d["batch_id"] for d in pipeline.state.pending(pipeline.cfg.job_src)}
        for batch_id in sorted(set(ids) & pending):
            pipeline.promote_batch(batch_id)
            promoted.append(batch_id)

    writer = (
        transitions.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
        return promoted
    return writer.start()
