"""Append-only batch state log (replaces the reference's DynamoDB table).

Design (FIXTURES.md §A2, fixing reference bugs by construction):

- The reference's state update crashes on undefined variables and re-writes
  ``RAW COMPLETED`` even on the prepared path (prepared_layer_job.py:176-208
  — SURVEY.md §0 bug 1), so batches were reprocessed forever.  Here a state
  *transition* is an appended row; the current state of a batch is the
  row with the latest ``updated_at`` (window latest-wins read).  Appends are
  atomic at file granularity (parquet committer), so a crashed job leaves at
  worst a batch stuck in its previous state — re-running is always safe.
- Typed columns (counts are longs, times are timestamps) — the reference
  stored everything as strings (raw_layer_job.py:194-205).
- The log is tiny (one row per batch transition), so latest-wins windowing
  costs nothing; compact periodically if ever needed.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession, Window


class States:
    RAW_COMPLETED = "RAW_COMPLETED"
    PREPARED_COMPLETED = "PREPARED_COMPLETED"
    FAILED = "FAILED"
    # batch landed in raw but violated its quality rules: quarantined —
    # promote() only picks RAW_COMPLETED, so it never reaches prepared
    QUALITY_FAILED = "QUALITY_FAILED"


STATE_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.StringType(), False),
        T.StructField("job_src", T.StringType(), False),
        T.StructField("state", T.StringType(), False),
        T.StructField("raw_path", T.StringType(), True),
        T.StructField("raw_count", T.LongType(), True),
        T.StructField("prepared_path", T.StringType(), True),
        T.StructField("prepared_count", T.LongType(), True),
        T.StructField("job_name", T.StringType(), True),
        T.StructField("updated_at", T.TimestampType(), False),
        T.StructField("seq", T.LongType(), False),  # monotone per append; tiebreak
    ]
)


class StateStore:
    """State log at a directory path; append rows, read latest-per-batch."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # ------------------------------------------------------------------ write
    def append(
        self,
        batch_id: str,
        job_src: str,
        state: str,
        raw_path: str | None = None,
        raw_count: int | None = None,
        prepared_path: str | None = None,
        prepared_count: int | None = None,
        job_name: str | None = None,
    ) -> None:
        """Append one transition row.  ``seq`` disambiguates same-microsecond
        appends (monotone from the previous max)."""
        now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        try:
            prev_max = self._read_log().agg(F.max("seq")).collect()[0][0] or 0
        except Exception:
            prev_max = 0
        row = [
            (
                batch_id,
                job_src,
                state,
                raw_path,
                raw_count,
                prepared_path,
                prepared_count,
                job_name,
                now,
                prev_max + 1,
            )
        ]
        self.spark.createDataFrame(row, STATE_SCHEMA).coalesce(1).write.mode("append").parquet(
            self.path
        )

    # ------------------------------------------------------------------- read
    def _read_log(self) -> DataFrame:
        # First run: the log directory doesn't exist yet.  Returning an
        # empty typed frame (instead of letting the read throw) keeps the
        # caller's control flow exception-free and the logs clean — Spark
        # logs the full PATH_NOT_FOUND stack at WARN before the exception
        # even reaches Python.
        import os

        if "://" not in self.path and not os.path.exists(self.path):
            return self.spark.createDataFrame([], STATE_SCHEMA)
        return self.spark.read.schema(STATE_SCHEMA).parquet(self.path)

    def log(self) -> DataFrame:
        """The full transition history (for audit queries)."""
        return self._read_log()

    def current(self) -> DataFrame:
        """Latest state per (job_src, batch_id) — the latest-wins window read
        the reference needed but never had (its filter re-matched processed
        batches forever, prepared_layer_job.py:48-50).

        Metadata fields carry forward across transitions (last non-null
        wins), so a PREPARED_COMPLETED row still shows the batch's
        raw_path/raw_count from its RAW_COMPLETED row.
        """
        fill_cols = ["raw_path", "raw_count", "prepared_path", "prepared_count", "job_name"]
        w_fill = (
            Window.partitionBy("job_src", "batch_id")
            .orderBy("updated_at", "seq")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = self._read_log().select(
            "batch_id",
            "job_src",
            "state",
            *[F.last(F.col(c), ignorenulls=True).over(w_fill).alias(c) for c in fill_cols],
            "updated_at",
            "seq",
        )
        w_pick = Window.partitionBy("job_src", "batch_id").orderBy(
            F.desc("updated_at"), F.desc("seq")
        )
        return (
            filled.withColumn("_rn", F.row_number().over(w_pick))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    def pending(self, job_src: str) -> list[dict]:
        """Batches whose *current* state is RAW_COMPLETED (ready to promote).

        Collecting is correct here: rows are per-batch control metadata (a
        handful), never data.
        """
        rows = (
            self.current()
            .where((F.col("job_src") == job_src) & (F.col("state") == States.RAW_COMPLETED))
            .collect()
        )
        return [r.asDict() for r in rows]

    def exists(self) -> bool:
        try:
            self._read_log().limit(1).collect()
            return True
        except Exception:
            return False
