"""Ingest and promote jobs — the engine's data plane.

Reference parity map (SURVEY.md §3):
- ``Pipeline.ingest``  ≙ glue src/raw_layer_job.py main loop (:49-57): source
  scan → stamp ETL_PART_KEY → write raw → state row.  Differences by design:
  one action instead of two (observe() replaces the uncached count() double
  scan, raw_layer_job.py:158,164-167), UTC batch ids (not EST,
  raw_layer_job.py:89), partitioned writes (write.partitionBy) instead of
  path-embedded batch folders (raw_layer_job.py:160).
- ``Pipeline.promote`` ≙ glue src/prepared_layer_job.py (:44-55): pending
  batches from state → read raw batch → transform hook → write prepared →
  state transition.  Differences: the transition actually happens (the
  reference's updateDynamoDB crashes on undefined variables and would have
  re-marked RAW anyway — prepared_layer_job.py:176-208), prepared output is
  partitioned by batch too (the reference collided all batches into one
  folder, prepared_layer_job.py:121-127), and re-promoting is a no-op
  (idempotence via latest-wins state + dynamic partition overwrite).
"""

from __future__ import annotations

import datetime as dt
import logging
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation, SparkSession

log = logging.getLogger(__name__)

from aws_genaric_datapipeline_spark.config import PipelineConfig
from aws_genaric_datapipeline_spark.pipeline.state import States, StateStore
from aws_genaric_datapipeline_spark.sources.readers import read_source
from aws_genaric_datapipeline_spark.pipeline.quality import (
    QualityError,
    build_rules,
    check_quality,
)

PART_KEY = "ETL_PART_KEY"  # engine-added batch partition column (reference raw_layer_job.py:53)

TransformFn = Callable[[DataFrame], DataFrame]


def make_batch_id(now: dt.datetime | None = None) -> str:
    """UTC batch key, microsecond resolution — format mirrors the reference
    (yyyymmddHHMMSSffffff, raw_layer_job.py:92) but in UTC (EST pinning was a
    DST correctness bug)."""
    now = now or dt.datetime.now(dt.timezone.utc)
    return now.strftime("%Y%m%d%H%M%S%f")


class Pipeline:
    """One configured pipeline with ``ingest()`` and ``promote()``.

    Transform hook: the reference promised a transformation step but shipped
    a pass-through (prepared_layer_job.py:110); here it's an injectable
    ``DataFrame -> DataFrame`` (default identity).
    """

    def __init__(
        self,
        spark: SparkSession,
        cfg: PipelineConfig,
        transform: TransformFn | None = None,
        job_name: str = "engine",
    ):
        self.spark = spark
        self.cfg = cfg
        self.transform = transform or (lambda df: df)
        self.job_name = job_name
        self.state = StateStore(spark, cfg.state_path)
        # Batch ids must read back as strings even on a session that didn't
        # go through our factory (e.g. the driver harness's vanilla session).
        spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")

    # ---------------------------------------------------------------- ingest
    def ingest(self, source_df: DataFrame | None = None, batch_id: str | None = None) -> str:
        """Run one ingestion batch; returns the batch id.

        One Spark action: the write.  Row count comes from ``observe()``
        metrics on the same pass (no second source scan).
        """
        batch_id = batch_id or make_batch_id()
        df = source_df if source_df is not None else read_source(self.spark, self.cfg)
        rules = build_rules(self.cfg)
        obs = Observation(f"ingest-{batch_id}")
        metrics = [F.count(F.lit(1)).alias("rows")] + [
            F.sum(F.when(~F.coalesce(r.predicate, F.lit(False)), 1).otherwise(0))
            .alias(f"{r.name}_violations")
            for r in rules
        ]
        stamped = df.withColumn(PART_KEY, F.lit(batch_id)).observe(obs, *metrics)
        try:
            stamped.write.mode("append").partitionBy(PART_KEY).parquet(self.cfg.raw_path)
        except Exception:
            # The write failed before commit: Spark's committer leaves no
            # visible files, and no RAW_COMPLETED row is written, so the
            # batch simply never existed.  Record FAILED for observability
            # and re-raise (the reference swallowed errors into
            # print+sys.exit, raw_layer_job.py:58-60, leaving no trace).
            log.exception("ingest failed: job_src=%s batch_id=%s", self.cfg.job_src, batch_id)
            self.state.append(
                batch_id=batch_id,
                job_src=self.cfg.job_src,
                state=States.FAILED,
                raw_path=self.cfg.raw_path,
                job_name=self.job_name,
            )
            raise
        raw_count = obs.get["rows"]
        if rules:
            try:
                check_quality(obs.get, self.cfg.quality_budget)
            except QualityError:
                # Data is in raw (the write committed) but quarantined:
                # QUALITY_FAILED batches are never promoted.
                log.exception(
                    "quality gate failed: job_src=%s batch_id=%s",
                    self.cfg.job_src, batch_id,
                )
                self.state.append(
                    batch_id=batch_id,
                    job_src=self.cfg.job_src,
                    state=States.QUALITY_FAILED,
                    raw_path=self.cfg.raw_path,
                    raw_count=raw_count,
                    job_name=self.job_name,
                )
                raise
        log.info(
            "ingest complete: job_src=%s batch_id=%s rows=%s",
            self.cfg.job_src, batch_id, raw_count,
        )
        self.state.append(
            batch_id=batch_id,
            job_src=self.cfg.job_src,
            state=States.RAW_COMPLETED,
            raw_path=self.cfg.raw_path,
            raw_count=raw_count,
            job_name=self.job_name,
        )
        return batch_id

    # --------------------------------------------------------------- promote
    def promote_batch(self, batch_id: str) -> int:
        """Promote one raw batch to the prepared layer; returns row count.

        Reads through the table root with a partition filter (real partition
        pruning — Catalyst PartitionFilters — rather than the reference's
        hand-built exact path, prepared_layer_job.py:94).  Dynamic partition
        overwrite makes re-promoting a batch idempotent instead of appending
        duplicate files (reference bug 2).
        """
        # mergeSchema: batches can gain columns over the table's lifetime
        # (schema evolution); the read must surface THIS batch's full schema
        # even when Spark's default footer sampling picks one file arbitrarily.
        # Scope the read to the batch's own partition directory (basePath
        # keeps PART_KEY as a column): merging then unions only THIS batch's
        # footers, so (a) a type conflict between two UNRELATED batches can't
        # fail this batch's promotion, and (b) re-promoting an old batch
        # after the table gained columns reproduces its ORIGINAL schema
        # instead of null-filling later batches' columns into its output —
        # the idempotent re-promote contract.  The residual .where is a
        # constant partition filter (free) guarding glob chars in batch_id.
        raw = (
            self.spark.read.option("mergeSchema", "true")
            .option("basePath", self.cfg.raw_path)
            .parquet(f"{self.cfg.raw_path}/{PART_KEY}={batch_id}")
            .where(F.col(PART_KEY) == batch_id)
        )
        obs = Observation(f"promote-{batch_id}")
        try:
            prepared = self.transform(raw).observe(obs, F.count(F.lit(1)).alias("rows"))
            (
                prepared.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(PART_KEY)
                .parquet(self.cfg.prepared_path)
            )
        except Exception:
            # Batch stays RAW_COMPLETED (current() ignores the FAILED marker
            # only if a later transition supersedes it) — mark FAILED so
            # operators see it; a fixed re-run transitions it forward.
            log.exception("promote failed: job_src=%s batch_id=%s", self.cfg.job_src, batch_id)
            self.state.append(
                batch_id=batch_id,
                job_src=self.cfg.job_src,
                state=States.FAILED,
                prepared_path=self.cfg.prepared_path,
                job_name=self.job_name,
            )
            raise
        prepared_count = obs.get["rows"]
        log.info(
            "promote complete: job_src=%s batch_id=%s rows=%s",
            self.cfg.job_src, batch_id, prepared_count,
        )
        self.state.append(
            batch_id=batch_id,
            job_src=self.cfg.job_src,
            state=States.PREPARED_COMPLETED,
            prepared_path=self.cfg.prepared_path,
            prepared_count=prepared_count,
            job_name=self.job_name,
        )
        return prepared_count

    def promote(self) -> list[str]:
        """Promote every batch whose current state is RAW_COMPLETED.

        The per-batch loop is over control rows (a handful), not data; each
        iteration is one distributed read→transform→write.  Returns promoted
        batch ids; an empty list means nothing was pending (idempotent)."""
        done = []
        for item in self.state.pending(self.cfg.job_src):
            self.promote_batch(item["batch_id"])
            done.append(item["batch_id"])
        return done

    # ---------------------------------------------------------------- access
    def raw(self) -> DataFrame:
        """Whole raw table, schema-evolution-aware: columns added by later
        batches appear (null for older rows), numeric widenings (int→bigint
        across batches) reconcile to the widest type, and genuinely
        incompatible drift raises SchemaMismatchError naming the column —
        instead of mergeSchema's opaque merge failure or silently depending
        on which file Spark samples (sources/readers.py read_evolved).  At
        100 TB, per-batch footer probing is the control-plane cost of
        evolution — register the table in the catalog (catalog.py) with a
        declared schema to skip it on hot paths."""
        from aws_genaric_datapipeline_spark.sources.readers import read_evolved

        return read_evolved(self.spark, self.cfg.raw_path, PART_KEY)

    def prepared(self) -> DataFrame:
        from aws_genaric_datapipeline_spark.sources.readers import read_evolved

        return read_evolved(self.spark, self.cfg.prepared_path, PART_KEY)


# Template registry: the engine analog of the reference's template dispatch
# on config['template'] (app.py:23-25).  New templates register here.
TEMPLATES: dict[str, type[Pipeline]] = {"cds_view": Pipeline}


def build_pipeline(
    spark: SparkSession,
    cfg: PipelineConfig,
    transform: TransformFn | None = None,
) -> Pipeline:
    try:
        cls = TEMPLATES[cfg.template]
    except KeyError:
        raise ValueError(f"unknown pipeline template: {cfg.template!r}") from None
    return cls(spark, cfg, transform=transform)
