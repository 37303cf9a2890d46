"""Catalog registration — the engine analog of the reference's Glue Catalog
external table (templates/cds_view_template.py:26-55).

``register_prepared_table`` creates an external parquet table over the
prepared layer in the session catalog (spark-warehouse/Derby locally, Hive
metastore in prod — same SQL either way); ``register_temp_view`` is the
lightweight variant for tests/notebooks.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from aws_genaric_datapipeline_spark.config import PipelineConfig


def _ddl_columns(cfg: PipelineConfig) -> str:
    cols = [f"`{c.name}` {c.type}" + (f" COMMENT '{c.comment}'" if c.comment else "") for c in cfg.schema]
    cols.append("`ETL_PART_KEY` string")
    return ", ".join(cols)


def register_prepared_table(spark: SparkSession, cfg: PipelineConfig, database: str = "default") -> str:
    """CREATE TABLE IF NOT EXISTS ... USING parquet LOCATION prepared_path,
    partitioned by the batch key (reference declared EXTERNAL_TABLE with
    ParquetHiveSerDe, cds_view_template.py:42-54)."""
    fq = f"{database}.`{cfg.table_name}`"
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {fq} ({_ddl_columns(cfg)}) "
        f"USING parquet PARTITIONED BY (ETL_PART_KEY) LOCATION '{cfg.prepared_path}'"
    )
    # pick up partitions written outside the catalog (external-table repair)
    spark.sql(f"MSCK REPAIR TABLE {fq}")
    return fq


def register_temp_view(spark: SparkSession, cfg: PipelineConfig) -> str:
    spark.read.parquet(cfg.prepared_path).createOrReplaceTempView(cfg.table_name)
    return cfg.table_name
