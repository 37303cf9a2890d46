"""Bucketed (pre-shuffled) tables for co-located joins and aggregations.

At 100 TB the dominant cost of a fact-fact join is shuffling both sides on
the join key for every query.  Bucketing pays that shuffle ONCE at write
time: `bucketBy(n, key)` hash-partitions files on disk, and every later
join/aggregation on the bucket key reads co-located buckets with NO
exchange (Spark plans a sort-merge join over matching bucket ids; with
`sortBy` the per-bucket sort is pre-done too).

Both sides must use the same bucket count (or an integer multiple with
`spark.sql.bucketing.coalesceBucketsInJoin.enabled`) and the catalog must
own the table (`saveAsTable` — bucket metadata lives in the metastore, not
the parquet footers; plain `.parquet(path)` writes cannot carry it).

Reference parity: the reference re-shuffles nothing because it never joins
(glue src/ has no joins at all); this module is forward-looking engine
surface for the SURVEY.md §2b join rows at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def recover_orphan_location(spark: SparkSession, table: str, mode: str) -> None:
    """Remove a previous session's orphaned managed-table directory before
    an overwrite ``saveAsTable`` (see write_bucketed's docstring: ephemeral
    in-memory metastores lose the catalog entry at session death while the
    warehouse directory survives, turning overwrite into
    LOCATION_ALREADY_EXISTS).  No-op unless mode is overwrite and the
    catalog has no entry for ``table``."""
    if mode == "overwrite" and not spark.catalog.tableExists(table):
        import shutil
        from pathlib import Path

        wh = spark.conf.get("spark.sql.warehouse.dir", "")
        root = Path(wh.removeprefix("file:"))
        # Managed-table layout: default-db tables live at warehouse/<table>,
        # every other database at warehouse/<db>.db/<table>.  Resolving a
        # qualified name to the bare basename would no-op for non-default
        # databases AND could rmtree an unrelated same-named default-db
        # table directory — so the <db>.db segment is honored explicitly.
        parts = table.lower().split(".")
        db = parts[-2] if len(parts) >= 2 else "default"  # drops any catalog prefix
        if db == "default":
            loc = root / parts[-1]
        else:
            loc = root / f"{db}.db" / parts[-1]
        if root.is_dir() and loc.exists():
            shutil.rmtree(loc, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) catalog table.

    Choose ``num_buckets`` so one bucket of the LARGEST co-bucketed table
    fits an executor's memory (the whole bucket is one task's input when
    bucketed joins kick in); powers of two keep future bucket coalescing
    exact.

    Orphan-location recovery (overwrite mode): with an ephemeral metastore
    (in-memory Derby — tests, the driver harness), a previous SESSION's
    managed-table directory survives under the warehouse while its catalog
    entry died with the session; the next ``saveAsTable`` then throws
    LOCATION_ALREADY_EXISTS even in overwrite mode.  Overwrite means the
    caller wants a fresh table, so the stale managed location is removed
    first.  Persistent-metastore deployments never orphan locations and
    skip this path (the catalog entry exists, overwrite handles it).
    """
    spark = df.sparkSession
    recover_orphan_location(spark, table, mode)
    # File-count discipline (guide §6): bucketBy writes one file per
    # (task × bucket-with-rows) pair, so a build whose last stage has P
    # partitions emits up to P·num_buckets tiny files — listing/planning
    # cost on every later read and open() overhead per query.  Aligning
    # the write's partitioning with the bucket spec first collapses that
    # to files_per_bucket files per bucket: repartition(k·n, cols) and
    # bucket id pmod(murmur3(cols), n) agree because n divides k·n, so
    # every task holds exactly one bucket's rows.  k parameterizes file
    # size at scale (SPARK_GRAFT_BUCKET_FILES; at 100 TB pick k so one
    # file lands in the 128 MB-1 GB band); the local default k=1 gives
    # num_buckets files per table.
    import os

    k = max(1, int(os.environ.get("SPARK_GRAFT_BUCKET_FILES", "1")))
    df = df.repartition(k * num_buckets, *bucket_cols)
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on (a prefix of) their bucket
    key.  When both sides share bucket spec, the physical plan contains no
    Exchange — verify with plans.audit.count_exchanges (asserted in
    tests/test_plans.py::TestBucketedJoin)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
