"""CLI surface, sink writers, source readers (csv/json), and the custom
stateful streaming operator."""

from __future__ import annotations

import datetime as dt
import json

import pyspark.sql.functions as F
import pytest

from aws_genaric_datapipeline_spark.cli import main as cli_main
from aws_genaric_datapipeline_spark.config import ColumnSpec, PipelineConfig, SourceSpec
from aws_genaric_datapipeline_spark.sources.readers import read_source
from aws_genaric_datapipeline_spark.sources.writers import write_table
from aws_genaric_datapipeline_spark.streaming.stateful import running_user_totals
from aws_genaric_datapipeline_spark.streaming.windows import EVENTS_SCHEMA, stream_events


class TestSinks:
    @pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json", "xml"])
    def test_round_trip(self, spark, tmp_path, fmt):
        df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
        path = str(tmp_path / fmt)
        write_table(df, path, format=fmt)
        if fmt == "csv":
            back = (
                spark.read.format(fmt).option("header", "true")
                .option("inferSchema", "true").load(path)
            )
        elif fmt == "xml":
            back = spark.read.format(fmt).option("rowTag", "row").load(path)
        else:
            back = spark.read.format(fmt).load(path)
        assert sorted((r["id"], r["v"]) for r in back.collect()) == [(1, "a"), (2, "b")]

    def test_partitioned_overwrite_is_per_partition(self, spark, tmp_path):
        path = str(tmp_path / "t")
        df1 = spark.createDataFrame([(1, "p1"), (2, "p2")], ["id", "part"])
        write_table(df1, path, partition_by=("part",))
        # overwrite only p1's partition
        df2 = spark.createDataFrame([(9, "p1")], ["id", "part"])
        write_table(df2, path, mode="overwrite", partition_by=("part",))
        rows = sorted((r["id"], r["part"]) for r in spark.read.parquet(path).collect())
        assert rows == [(2, "p2"), (9, "p1")]

    def test_unknown_format_rejected(self, spark):
        df = spark.createDataFrame([(1,)], ["id"])
        with pytest.raises(ValueError, match="unknown sink format"):
            write_table(df, "/tmp/x", format="sequencefile")

    def test_avro_round_trip_when_module_present(self, spark, tmp_path):
        """Avro is an EXTERNAL Spark module (spark-avro) not bundled in
        this sandbox's pyspark; the format is wired through the writer/
        reader plumbing and this round-trip runs wherever the module IS
        on the classpath (env-gated, like transformWithState/protobuf)."""
        from py4j.protocol import Py4JJavaError
        from pyspark.errors.exceptions.captured import AnalysisException

        df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
        path = str(tmp_path / "avro")
        try:
            write_table(df, path, format="avro")
        except (AnalysisException, Py4JJavaError) as exc:
            assert "Failed to find data source: avro" in str(exc)
            pytest.skip("spark-avro module not on the classpath (external jar)")
        back = spark.read.format("avro").load(path)
        assert sorted((r["id"], r["v"]) for r in back.collect()) == [
            (1, "a"),
            (2, "b"),
        ]


class TestSourceReaders:
    def _cfg(self, tmp_path, kind, path):
        return PipelineConfig(
            template="cds_view", project="t", subject="s", job_src="j",
            source=SourceSpec(kind=kind, path=path),
            raw_path=str(tmp_path / "raw"),
            prepared_path=str(tmp_path / "prep"),
            state_path=str(tmp_path / "state"),
            table_name="t",
            schema=(ColumnSpec("id", "bigint"), ColumnSpec("v", "string")),
        )

    @pytest.mark.parametrize("fmt", ["csv", "json", "xml"])
    def test_schema_on_read_no_inference(self, spark, tmp_path, fmt):
        """csv/json/xml sources read with the DECLARED schema — no
        inference job (an extra full scan at scale) and types land as
        declared.  xml is Spark 4's native reader (rowTag='row' mirrors
        the writer default)."""
        src = str(tmp_path / f"src_{fmt}")
        df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
        write_table(df, src, format=fmt)
        cfg = self._cfg(tmp_path, fmt, src)
        out = read_source(spark, cfg)
        assert dict(out.dtypes) == {"id": "bigint", "v": "string"}
        assert out.count() == 2

    def test_text_source_line_and_wholetext(self, spark, tmp_path):
        """text source: one row per line by default; wholetext=true gives
        one row per file (document-per-file corpora)."""
        d = tmp_path / "txt"; d.mkdir()
        (d / "a.txt").write_text("line one\nline two\n")
        (d / "b.txt").write_text("solo\n")
        cfg = self._cfg(tmp_path, "text", str(d))
        cfg = cfg.__class__(**{**cfg.__dict__, "schema": ()})
        out = read_source(spark, cfg)
        assert out.columns == ["value"]
        assert out.count() == 3
        cfg2 = cfg.__class__(**{**cfg.__dict__, "source": SourceSpec(
            kind="text", path=str(d), options={"wholetext": "true"})})
        assert read_source(spark, cfg2).count() == 2

    def test_binary_file_source_reads_bytes(self, spark, tmp_path):
        """binaryFile source: one row per file with payload bytes + typed
        metadata — the raw-media ingestion path for multimodal columns."""
        d = tmp_path / "bin"; d.mkdir()
        (d / "x.bin").write_bytes(b"\x00\x01payload")
        (d / "y.bin").write_bytes(b"zz")
        cfg = self._cfg(tmp_path, "binaryFile", str(d))
        cfg = cfg.__class__(**{**cfg.__dict__, "schema": ()})
        out = read_source(spark, cfg)
        assert {"path", "modificationTime", "length", "content"} <= set(out.columns)
        rows = {r["path"].rsplit("/", 1)[-1]: bytes(r["content"]) for r in out.collect()}
        assert rows == {"x.bin": b"\x00\x01payload", "y.bin": b"zz"}


class TestCli:
    def test_list_ingest_promote(self, spark, tmp_path, capsys):
        srcdir = str(tmp_path / "srcdata")
        spark.createDataFrame([("x", "y", "z")] * 5, ["a", "b", "c"]).write.parquet(srcdir)
        pdir = tmp_path / "pipelines" / "tableA"
        pdir.mkdir(parents=True)
        (pdir / "config.json").write_text(json.dumps({
            "job_src": "tableA",
            "source": {"kind": "parquet", "path": srcdir},
            "raw_path": str(tmp_path / "raw"),
            "prepared_path": str(tmp_path / "prepared"),
            "state_path": str(tmp_path / "state"),
            "schema": [{"name": "a", "type": "string"}, {"name": "b", "type": "string"},
                       {"name": "c", "type": "string"}],
        }))
        pipelines = str(tmp_path / "pipelines")

        cli_main(["list", "--pipelines", pipelines])
        assert json.loads(capsys.readouterr().out)["job_src"] == "tableA"

        cli_main(["ingest", "--pipelines", pipelines, "--job-src", "tableA"])
        batch = json.loads(capsys.readouterr().out)["ingested"]
        assert len(batch) == 20

        cli_main(["promote", "--pipelines", pipelines, "--job-src", "tableA"])
        assert json.loads(capsys.readouterr().out)["promoted"] == [batch]

        assert spark.read.parquet(str(tmp_path / "prepared")).count() == 5

    def test_unknown_job_src_exits(self, tmp_path):
        (tmp_path / "pipelines").mkdir()
        with pytest.raises(SystemExit, match="unknown job_src"):
            cli_main(["ingest", "--pipelines", str(tmp_path / "pipelines"), "--job-src", "nope"])


class TestStatefulStreaming:
    def test_running_totals_accumulate_across_drains(self, spark, tmp_path):
        src = str(tmp_path / "events")
        ckpt = str(tmp_path / "ckpt")

        def ev(eid, user, value):
            return (eid, dt.datetime(2024, 1, 1, 10, 0, eid % 60), user, "click", value, "{}")

        def drain(_sink):
            # foreachBatch (checkpoint-recoverable, unlike the memory sink)
            emitted = []

            def collect(batch_df, _eid):
                emitted.extend(batch_df.collect())

            q = (
                running_user_totals(stream_events(spark, src))
                .writeStream.foreachBatch(collect)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return {r["user_id"]: (r["event_count"], r["value_sum"]) for r in emitted}

        spark.createDataFrame([ev(1, 1, 2.0), ev(2, 1, 3.0), ev(3, 2, 5.0)], EVENTS_SCHEMA)\
            .coalesce(1).write.mode("append").parquet(src)
        got = drain("totals_1")
        assert got == {1: (2, 5.0), 2: (1, 5.0)}

        # second drain: state survives via checkpoint, totals accumulate
        spark.createDataFrame([ev(4, 1, 10.0)], EVENTS_SCHEMA)\
            .coalesce(1).write.mode("append").parquet(src)
        got = drain("totals_2")
        assert got[1] == (3, 15.0)  # 2 prior + 1 new event; 5.0 + 10.0


class TestLayout:
    def test_range_sorted_layout_has_tight_file_stats(self, spark, tmp_path):
        """Range-partitioned + sorted write: per-file min/max bands on the
        sort column must not overlap, so row-group stats can prune scans."""
        from aws_genaric_datapipeline_spark.operators.layout import (
            write_range_sorted,
        )
        import pyarrow.parquet as pq
        from pathlib import Path

        df = spark.range(10_000).selectExpr(
            "id", "cast(id % 97 as double) as noise"
        )
        out = str(tmp_path / "sorted")
        write_range_sorted(df, out, ["id"], num_files=4)

        bands = []
        for f in Path(out).glob("*.parquet"):
            md = pq.ParquetFile(str(f)).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(0)
                assert col.path_in_schema == "id"
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            bands.append((min(mins), max(maxs)))
        bands.sort()
        assert len(bands) == 4
        for (lo1, hi1), (lo2, hi2) in zip(bands, bands[1:]):
            assert hi1 < lo2, f"file bands overlap: {(lo1, hi1)} vs {(lo2, hi2)}"

    def test_compact_parquet_reduces_files_preserves_rows(self, spark, tmp_path):
        from aws_genaric_datapipeline_spark.operators.layout import compact_parquet
        from pathlib import Path

        out = str(tmp_path / "small_files")
        spark.range(5_000).repartition(40).write.parquet(out)
        assert len(list(Path(out).glob("*.parquet"))) == 40
        before = sorted(r["id"] for r in spark.read.parquet(out).collect())

        n_files = compact_parquet(spark, out, target_rows=2_500)
        assert n_files == 2
        assert len(list(Path(out).glob("*.parquet"))) == 2
        after = sorted(r["id"] for r in spark.read.parquet(out).collect())
        assert after == before


class TestPythonDataSource:
    """Spark 4 Python Data Source API: the reference's 'CDS view' source
    re-expressed as a partition-parallel, filter-pushdown Python source
    (sources/pyds.py)."""

    def test_parallel_read_and_determinism(self, spark):
        from aws_genaric_datapipeline_spark.sources.pyds import register

        register(spark)
        df = (
            spark.read.format("cds_view")
            .option("view", "tableA")
            .option("rows", "100")
            .option("partitions", "5")
            .load()
        )
        assert df.count() == 100
        # one task per declared InputPartition
        n_parts = df.select(
            F.spark_partition_id().alias("p")
        ).distinct().count()
        assert n_parts == 5
        # deterministic content: row 1 hash-derived amount
        row = df.where("row_id = 1").collect()[0]
        assert row["view_key"] == "tableA:1"
        assert row["amount"] == ((1 * 2654435761) % 4294967296) % 10000 / 100.0

    def test_shard_filter_pushed_into_source(self, spark):
        from aws_genaric_datapipeline_spark.sources.pyds import register

        register(spark)
        df = (
            spark.read.format("cds_view")
            .option("rows", "100")
            .option("partitions", "5")
            .load()
        )
        pruned = df.where("shard = 2")
        rows = pruned.collect()
        assert len(rows) == 20 and all(r["shard"] == 2 for r in rows)
        # the equality filter is absorbed by pushFilters → only the matching
        # InputPartition is planned
        assert (
            pruned.select(F.spark_partition_id().alias("p")).distinct().count() == 1
        )
        # residual (non-equality) filters still evaluated by Spark post-scan
        mixed = df.where("shard = 2 AND amount > 50.0")
        assert all(r["amount"] > 50.0 and r["shard"] == 2 for r in mixed.collect())


class TestZOrder:
    def test_zorder_tightens_both_columns(self, spark, tmp_path):
        """Z-order clustering vs single-column sort: the single-column sort
        leaves the second column's per-file bands at ~full range (no
        pruning possible); Z-order keeps BOTH columns' bands well under
        half the range."""
        from aws_genaric_datapipeline_spark.operators.layout import (
            write_range_sorted,
            write_zordered,
        )
        import pyarrow.parquet as pq
        from pathlib import Path

        df = spark.range(20_000).selectExpr(
            "id as x", "cast(hash(id) % 20000 as bigint) + 20000 as y"
        )

        def avg_band(path, colname):
            widths = []
            for f in Path(path).glob("*.parquet"):
                md = pq.ParquetFile(str(f)).metadata
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    for c in range(md.row_group(rg).num_columns):
                        col = md.row_group(rg).column(c)
                        if col.path_in_schema == colname:
                            mins.append(col.statistics.min)
                            maxs.append(col.statistics.max)
                widths.append(max(maxs) - min(mins))
            return sum(widths) / len(widths)

        zp, sp = str(tmp_path / "z"), str(tmp_path / "s")
        write_zordered(df, zp, "x", "y", num_files=16, bits=10)
        write_range_sorted(df, sp, ["x"], num_files=16)

        x_range, y_range = 20_000, 40_000
        # single-column sort: x tight, y unclustered (≈ full range)
        assert avg_band(sp, "x") < 0.15 * x_range
        assert avg_band(sp, "y") > 0.8 * y_range
        # z-order: both columns meaningfully clustered
        assert avg_band(zp, "x") < 0.5 * x_range
        assert avg_band(zp, "y") < 0.5 * y_range
        # and the data survives intact
        assert spark.read.parquet(zp).count() == 20_000


class TestPythonStreamingSource:
    def test_offset_tracked_stream_drains_exactly_once(self, spark, tmp_path):
        """The cds_view streaming reader advances its checkpointed offset one
        micro-batch per run: repeated availableNow runs drain the view with
        no duplicates and no gaps, then go quiet at max_rows."""
        from aws_genaric_datapipeline_spark.sources.pyds import register

        register(spark)
        stream = (
            spark.readStream.format("cds_view")
            .option("view", "t")
            .option("rows_per_batch", "25")
            .option("max_rows", "60")
            .load()
        )
        seen: list[int] = []

        def run_once():
            got = []
            q = (
                stream.writeStream.foreachBatch(
                    lambda df, eid: got.extend(r["row_id"] for r in df.collect())
                )
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return got

        for _ in range(4):  # 25 + 25 + 10 + 0
            seen.extend(run_once())
        assert sorted(seen) == list(range(60)), "exactly-once drain of the view"
        assert run_once() == [], "offset stays at max_rows"
