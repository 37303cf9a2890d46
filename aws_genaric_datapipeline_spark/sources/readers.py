"""Config-driven source readers.

Fixes the reference's scalability and safety gaps by design:

- **Partitioned JDBC reads.** The reference read the whole MySQL view
  through one connection/task (raw_layer_job.py:122-130 — no
  partitionColumn).  Here, configs with a ``partition_column`` read with
  partitionColumn/lowerBound/upperBound/numPartitions; bounds are fetched
  with one min/max pushdown query, so a 100 TB table fans out across
  executors.
- **No credential literals.** user/password resolve from env var names in
  config (reference hardcoded them, raw_layer_job.py:117-119).
- **Declared-schema enforcement.** The reference inferred schemas and never
  reconciled them with the config-declared schema (SURVEY.md §1.2); here
  ``validate_schema`` checks names + castability and applies explicit casts.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_genaric_datapipeline_spark.config import PipelineConfig, SourceSpec


class SchemaMismatchError(ValueError):
    pass


def validate_schema(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Reconcile inferred vs declared schema: every declared column must
    exist and be castable; result has exactly the declared columns, cast to
    the declared types.  Extra inferred columns are dropped (projection
    pushdown then prunes them at the scan)."""
    declared = cfg.declared_struct()
    if declared is None:
        return df
    # Case-insensitive membership: JDBC sources fold identifier case per
    # database (Derby/Oracle uppercase, Postgres lowercase); Spark resolves
    # column references case-insensitively, and the alias pins the declared
    # casing on the way out.
    have = {c.lower() for c in df.columns}
    missing = [f.name for f in declared.fields if f.name.lower() not in have]
    if missing:
        raise SchemaMismatchError(
            f"pipeline {cfg.job_src}: declared columns missing from source: {missing}"
        )
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in declared.fields]
    )


def _jdbc_reader(spark: SparkSession, src: SourceSpec, dbtable: str | None = None):
    user = os.environ.get(src.user_env, "") if src.user_env else ""
    password = os.environ.get(src.password_env, "") if src.password_env else ""
    # Subquery-in-dbtable keeps view resolution DB-side, same mechanism the
    # reference used (raw_layer_job.py:128-130) — predicates/pruning still
    # push through it.
    if dbtable is None:
        dbtable = f"(SELECT * FROM {src.view}) AS v" if src.view else src.options.get("dbtable", "")
    reader = (
        spark.read.format("jdbc")
        .option("url", src.url or "")
        .option("dbtable", dbtable)
        .option("user", user)
        .option("password", password)
    )
    if src.driver:
        reader = reader.option("driver", src.driver)
    for k, v in src.options.items():
        reader = reader.option(k, v)
    if dbtable:
        reader = reader.option("dbtable", dbtable)
    return reader


def _jdbc_bounds(spark: SparkSession, src: SourceSpec) -> tuple:
    """Fetch (min, max) of the partition column with a DB-side aggregate.

    V1 ``format("jdbc")`` does not push aggregates, so ``.load().agg(...)``
    would stream the whole table through one connection.  Issuing the
    min/max as a dbtable subquery makes the database compute it — one
    two-column row crosses the wire.
    """
    inner = f"(SELECT * FROM {src.view}) AS v" if src.view else src.options.get("dbtable", "")
    col = src.partition_column
    bounds_tbl = f"(SELECT MIN({col}) AS lo, MAX({col}) AS hi FROM {inner}) AS b"
    # positional access: databases fold the lo/hi alias case differently
    row = _jdbc_reader(spark, src, dbtable=bounds_tbl).load().collect()[0]
    return row[0], row[1]


def read_source(spark: SparkSession, cfg: PipelineConfig) -> DataFrame:
    """Read the configured source as a DataFrame (schema-validated)."""
    src = cfg.source
    if src.kind == "jdbc":
        reader = _jdbc_reader(spark, src)
        if src.partition_column:
            # one DB-side min/max round-trip for bounds, then a partitioned scan
            lo, hi = _jdbc_bounds(spark, src)
            if lo is not None and hi is not None and lo != hi:
                reader = (
                    reader.option("partitionColumn", src.partition_column)
                    .option("lowerBound", str(lo))
                    .option("upperBound", str(hi))
                    .option("numPartitions", str(src.num_partitions))
                )
        df = reader.load()
    elif src.kind in ("parquet", "orc", "text", "binaryFile", "avro"):
        # avro: requires the external spark-avro module (not bundled in
        # this sandbox's pyspark — see sources/writers.py FORMATS note);
        # when present it behaves like the other self-describing formats.
        # text → one `value:string` row per line (wholetext option for
        # doc-per-file); binaryFile → (path, modificationTime, length,
        # content) — the raw-media ingestion path feeding
        # operators/multimodal.py (each file is one row; non-splittable,
        # so parallelism = file count — fine for media corpora of many
        # small-to-medium objects).
        df = spark.read.format(src.kind).options(**src.options).load(src.path)
    elif src.kind in ("csv", "json", "xml"):
        declared = cfg.declared_struct()
        opts = dict(src.options)
        if src.kind == "csv":
            opts.setdefault("header", "true")  # match write_table's default
        if src.kind == "xml":
            # Spark 4 native XML (spark-xml folded into core): one row per
            # rowTag element, attributes as `_attr` columns.
            opts.setdefault("rowTag", "row")
        reader = spark.read.format(src.kind).options(**opts)
        # Schema-on-read from the declared schema: no inference job at scale.
        df = (reader.schema(declared) if declared is not None else reader).load(src.path)
    else:
        raise ValueError(f"unknown source kind: {src.kind}")
    return validate_schema(df, cfg)


# -------------------------------------------------- schema-evolution reads
# Sanctioned widenings for cross-batch type drift, the standard parquet
# evolution set: within the integral chain, within the float chain, and
# integral→double (SQL type-precedence promotion).  Everything else —
# string vs int, struct shape changes, decimal drift — is a REAL
# incompatibility and must fail loudly, not null-fill.
_INT_CHAIN = ["tinyint", "smallint", "int", "bigint"]
_FLT_CHAIN = ["float", "double"]


def _widen(a: str, b: str) -> str | None:
    """Widest common type of two simpleString type names, else None."""
    if a == b:
        return a
    if a in _INT_CHAIN and b in _INT_CHAIN:
        return max(a, b, key=_INT_CHAIN.index)
    if a in _FLT_CHAIN and b in _FLT_CHAIN:
        return max(a, b, key=_FLT_CHAIN.index)
    if (a in _INT_CHAIN and b in _FLT_CHAIN) or (a in _FLT_CHAIN and b in _INT_CHAIN):
        return "double"
    return None


def read_evolved(spark: SparkSession, path: str, part_key: str) -> DataFrame:
    """Whole-table read across schema-evolved batch partitions.

    Spark's ``mergeSchema`` unions footers but REFUSES type conflicts —
    a table whose later batches widened a column (int→bigint, the most
    common parquet evolution) becomes unreadable as a whole.  This read
    reconciles per-partition schemas explicitly:

    - added columns: union (null for batches that predate them) — same
      semantics mergeSchema gives;
    - widened types (_widen): every batch CAST to the widest observed
      type, so int and bigint batches coexist losslessly;
    - anything else: SchemaMismatchError naming the column and both
      types — the silent gap SURVEY §1.2 calls out (the reference
      inferred per-run and never reconciled).

    Cost shape: one footer-only schema probe per batch PARTITION (control-
    plane count, not data), then one read per partition unioned by name —
    each branch is still a full distributed parquet scan with pruning
    intact, and Catalyst collapses the union into parallel file groups.
    Falls back to a plain mergeSchema read when the layout has no
    ``part_key=`` directories (nothing to reconcile).  Partition discovery
    here is filesystem-path based (local/NFS layouts — this repo's
    deployment); an object-store table (s3://...) takes the fallback
    branch — route those through a catalog-registered table whose
    partitions the metastore enumerates, the same reconciliation applied
    per metastore partition.
    """
    from pathlib import Path as _P

    parts = sorted(p for p in _P(path).glob(f"{part_key}=*") if p.is_dir())
    if not parts:
        return spark.read.option("mergeSchema", "true").parquet(path)
    branches = []
    target: dict[str, str] = {}
    for p in parts:
        df = spark.read.option("basePath", path).parquet(str(p))
        branches.append(df)
        for f in df.schema.fields:
            t = f.dataType.simpleString()
            if f.name not in target:
                target[f.name] = t
                continue
            w = _widen(target[f.name], t)
            if w is None:
                raise SchemaMismatchError(
                    f"column {f.name!r}: incompatible types across batches "
                    f"under {path}: {target[f.name]} vs {t} "
                    f"(batch {p.name}); only additive columns and numeric "
                    f"widenings are reconcilable"
                )
            target[f.name] = w
    out = None
    for df in branches:
        casted = df.select(
            *[
                F.col(c).cast(target[c]).alias(c)
                for c in df.columns
            ]
        )
        out = casted if out is None else out.unionByName(
            casted, allowMissingColumns=True
        )
    return out
