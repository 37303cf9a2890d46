"""Sink writers (SURVEY.md §2b sinks row).

The reference wrote snappy parquet only (raw_layer_job.py:164-167).  The
engine exposes parquet/csv/json/orc with consistent partitioning and modes;
parquet+snappy stays the default for anything at scale (columnar, splittable,
predicate-pushdown-able — csv/json are for interchange only, and their
writers say so)."""

from __future__ import annotations

from pyspark.sql import DataFrame

# "avro" is accepted IF the spark-avro module is on the classpath: Avro has
# been an EXTERNAL Spark module since 2.4 (org.apache.spark:spark-avro), and
# this sandbox's pyspark distribution does not bundle it (only avro core
# jars), so the format raises AnalysisException("Failed to find data source:
# avro") here.  The writer/reader plumbing below treats it like any other
# row-based interchange format; tests/test_cli_and_sinks.py gates the
# round-trip on the module's presence.
FORMATS = ("parquet", "orc", "csv", "json", "xml", "avro")


def write_table(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "append",
    partition_by: tuple[str, ...] = (),
    options: dict[str, str] | None = None,
) -> None:
    """Write a DataFrame to a path-based sink.

    - partition_by columns become directory partitions (partition pruning
      for every downstream reader);
    - dynamic partition overwrite is enabled for mode='overwrite' so
      re-writing a batch replaces only its partitions (idempotent re-runs,
      same guarantee Pipeline.promote relies on);
    - csv writes a header by default (interchange friendliness);
    - xml (Spark 4 native) defaults rowTag='row' to mirror the reader.
    """
    if format not in FORMATS:
        raise ValueError(f"unknown sink format {format!r}; one of {FORMATS}")
    opts = dict(options or {})
    if format == "csv":
        opts.setdefault("header", "true")
    if format == "xml":
        opts.setdefault("rowTag", "row")
    writer = df.write.format(format).mode(mode).options(**opts)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if mode == "overwrite":
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.save(path)
