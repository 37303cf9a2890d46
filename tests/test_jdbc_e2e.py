"""Live JDBC end-to-end: embedded Derby (the JDBC database shipped in
Spark's own jars for the Hive metastore) stands in for the reference's
MySQL "CDS view" source (/root/reference/glue src/raw_layer_job.py:122-130).

Covers what the unit-optioned tests could not: a real connection, the
DB-side min/max bounds subquery (sources/readers.py:_jdbc_bounds), the
partitioned scan fan-out, and the full ingest -> promote lifecycle off a
JDBC source.
"""

from __future__ import annotations

import pytest

from aws_genaric_datapipeline_spark.config import ColumnSpec, PipelineConfig, SourceSpec
from aws_genaric_datapipeline_spark.pipeline import Pipeline, States
from aws_genaric_datapipeline_spark.sources.readers import _jdbc_bounds, read_source

N_ROWS = 1000


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    """Create an embedded Derby database with a seeded source table.

    DDL/DML go through plain JDBC (py4j DriverManager) with UNQUOTED
    identifiers — matching how a DBA-made MySQL "CDS view" looks to the
    reference: case-insensitive column names the engine must reconcile
    with its lowercase declared schema."""
    db_dir = tmp_path_factory.mktemp("derby") / "srcdb"
    url = f"jdbc:derby:{db_dir};create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        st.execute("CREATE TABLE cds_view_src (id BIGINT, name VARCHAR(50), amount DOUBLE)")
        for lo in range(0, N_ROWS, 200):
            values = ",".join(
                f"({i}, 'name_{i}', {float(i) * 1.5})" for i in range(lo, lo + 200)
            )
            st.execute(f"INSERT INTO cds_view_src VALUES {values}")
        st.close()
    finally:
        conn.close()
    return url


def _jdbc_cfg(tmp_path, url, partition_column=None, num_partitions=4):
    return PipelineConfig(
        template="cds_view",
        project="test",
        subject="jdbc",
        job_src="jdbc_src",
        source=SourceSpec(
            kind="jdbc",
            view="cds_view_src",
            url=url,
            driver="org.apache.derby.jdbc.EmbeddedDriver",
            partition_column=partition_column,
            num_partitions=num_partitions,
        ),
        raw_path=str(tmp_path / "raw"),
        prepared_path=str(tmp_path / "prepared"),
        state_path=str(tmp_path / "state"),
        table_name="jdbc_table",
        schema=(
            ColumnSpec("id", "bigint", ""),
            ColumnSpec("name", "string", ""),
            ColumnSpec("amount", "double", ""),
        ),
    )


class TestJdbcRoundTrip:
    def test_unpartitioned_read(self, spark, tmp_path, derby_url):
        cfg = _jdbc_cfg(tmp_path, derby_url)
        df = read_source(spark, cfg)
        assert df.count() == N_ROWS
        assert [f.name for f in df.schema.fields] == ["id", "name", "amount"]

    def test_bounds_fetched_db_side(self, spark, tmp_path, derby_url):
        cfg = _jdbc_cfg(tmp_path, derby_url, partition_column="id")
        lo, hi = _jdbc_bounds(spark, cfg.source)
        assert (lo, hi) == (0, N_ROWS - 1)

    def test_partitioned_read_fans_out_and_is_complete(self, spark, tmp_path, derby_url):
        cfg = _jdbc_cfg(tmp_path, derby_url, partition_column="id", num_partitions=4)
        df = read_source(spark, cfg)
        # the scan must actually be split: one RDD partition per bound range
        assert df.rdd.getNumPartitions() == 4
        # no rows lost or duplicated across the partition bounds
        assert df.count() == N_ROWS
        assert df.select("id").distinct().count() == N_ROWS

    def test_ingest_promote_from_jdbc(self, spark, tmp_path, derby_url):
        """The reference's full lifecycle (JDBC scan -> raw parquet + state
        row -> promote -> prepared parquet + transition) against a live
        database."""
        cfg = _jdbc_cfg(tmp_path, derby_url, partition_column="id")
        p = Pipeline(spark, cfg)
        batch_id = p.ingest()
        raw = p.raw()
        assert raw.where(raw["ETL_PART_KEY"] == batch_id).count() == N_ROWS

        promoted = p.promote()
        assert promoted == [batch_id]
        prepared = p.prepared()
        assert prepared.where(prepared["ETL_PART_KEY"] == batch_id).count() == N_ROWS

        states = {
            r["batch_id"]: r["state"]
            for r in p.state.current().where(f"job_src = '{cfg.job_src}'").collect()
        }
        assert states[batch_id] == States.PREPARED_COMPLETED
        assert p.state.pending(cfg.job_src) == [], "no batch may stay pending"
