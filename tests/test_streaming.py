"""Structured Streaming tests: availableNow drains match batch results,
watermarks drop late data across restarts, streaming dedup, and the
state-log streaming promoter (the reference's event chain, rebuilt)."""

from __future__ import annotations

import datetime as dt
import time

import pyspark.sql.functions as F
import pytest

from aws_genaric_datapipeline_spark.config import ColumnSpec, PipelineConfig, SourceSpec
from aws_genaric_datapipeline_spark.pipeline import Pipeline
from aws_genaric_datapipeline_spark.streaming.promote import run_streaming_promoter
from aws_genaric_datapipeline_spark.streaming.windows import (
    EVENTS_SCHEMA,
    stream_events,
    streaming_dedup,
    tumbling_counts,
)


def _event(eid, minute, user=1, etype="click", value=1.0, second=0):
    return (
        eid,
        dt.datetime(2024, 1, 1, 10, minute, second),
        user,
        etype,
        value,
        "{}",
    )


def _write_events(spark, path, rows, mode="append"):
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(mode).parquet(path)


def _drain(stream_df, sink_table, checkpoint):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("complete" if stream_df.isStreaming else "append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


class TestWindowedStreaming:
    def test_tumbling_stream_matches_batch(self, spark, tmp_path):
        src = str(tmp_path / "events")
        rows = [_event(i, minute=i % 30, etype="click" if i % 2 else "view") for i in range(60)]
        _write_events(spark, src, rows)

        batch_result = tumbling_counts(spark.read.parquet(src))
        expected = {
            (r["window_start"], r["event_type"]): (r["event_count"], r["value_sum"])
            for r in batch_result.collect()
        }

        stream = stream_events(spark, src)
        assert stream.isStreaming
        _drain(tumbling_counts(stream), "tumbling_sink", str(tmp_path / "ckpt"))
        got = {
            (r["window_start"], r["event_type"]): (r["event_count"], r["value_sum"])
            for r in spark.sql("SELECT * FROM tumbling_sink").collect()
        }
        assert got == expected

    def test_watermark_drops_late_rows_across_restarts(self, spark, tmp_path):
        """Two availableNow runs over one checkpoint: run 1 advances the
        watermark to 11:50; run 2's 10:00 event is > 10 min late → dropped
        from the append-mode aggregation; its 11:58 event survives."""
        src = str(tmp_path / "events")
        ckpt = str(tmp_path / "ckpt")
        sink_dir = str(tmp_path / "sink")
        _write_events(spark, src, [_event(1, minute=0), _event(2, minute=5)])
        # push event-time high so the watermark (max_ts - 10m) passes the
        # early windows
        rows2 = [(100, dt.datetime(2024, 1, 1, 12, 0), 1, "click", 1.0, "{}")]
        _write_events(spark, src, rows2)

        def run_once():
            q = (
                tumbling_counts(stream_events(spark, src, max_files_per_trigger=1))
                .writeStream.format("parquet")
                .option("path", sink_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run_once()
        # late arrivals: one inside the watermark horizon, one far behind it
        late = [
            (200, dt.datetime(2024, 1, 1, 10, 1), 1, "click", 1.0, "{}"),   # very late
            (201, dt.datetime(2024, 1, 1, 11, 58), 1, "click", 1.0, "{}"),  # fresh
        ]
        _write_events(spark, src, late)
        run_once()
        # drain residual windows by pushing the watermark forward once more
        _write_events(spark, src, [(300, dt.datetime(2024, 1, 1, 13, 0), 1, "click", 1.0, "{}")])
        run_once()

        out = spark.read.parquet(sink_dir)
        by_window = {
            (r["window_start"], r["event_type"]): r["event_count"] for r in out.collect()
        }
        # the 10:00-10:05 window closed in run 1 with exactly 1 event; the
        # late event_id=200 must NOT have re-opened or re-emitted it
        w_1000 = (dt.datetime(2024, 1, 1, 10, 0), "click")
        assert by_window.get(w_1000) == 1
        # the fresh 11:55-12:00 window contains the surviving late event
        w_1155 = (dt.datetime(2024, 1, 1, 11, 55), "click")
        assert by_window.get(w_1155) == 1

    def test_streaming_dedup(self, spark, tmp_path):
        src = str(tmp_path / "events")
        rows = [_event(1, minute=0), _event(1, minute=0), _event(2, minute=1)]
        _write_events(spark, src, rows)
        q = (
            streaming_dedup(stream_events(spark, src))
            .writeStream.format("memory")
            .queryName("dedup_sink")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        ids = sorted(r["event_id"] for r in spark.sql("SELECT * FROM dedup_sink").collect())
        assert ids == [1, 2]


class TestStreamingPromoter:
    @pytest.fixture
    def cfg(self, tmp_path):
        return PipelineConfig(
            template="cds_view", project="t", subject="s", job_src="tableA",
            source=SourceSpec(kind="parquet", path=str(tmp_path / "srcdir")),
            raw_path=str(tmp_path / "raw"),
            prepared_path=str(tmp_path / "prepared"),
            state_path=str(tmp_path / "state"),
            table_name="table_a",
            schema=(ColumnSpec("a", "string"), ColumnSpec("b", "string"), ColumnSpec("c", "string")),
        )

    def test_promoter_drains_pending_then_is_incremental(self, spark, cfg, tmp_path):
        p = Pipeline(spark, cfg)
        df = spark.createDataFrame([("x", "y", "z")] * 10, ["a", "b", "c"])
        b1 = p.ingest(df, batch_id="20260101000000000001")
        b2 = p.ingest(df, batch_id="20260101000000000002")
        ckpt = str(tmp_path / "promoter_ckpt")

        promoted = run_streaming_promoter(p, ckpt)
        assert sorted(promoted) == [b1, b2]
        cur = {r["batch_id"]: r["state"] for r in p.state.current().collect()}
        assert set(cur.values()) == {"PREPARED_COMPLETED"}
        assert p.prepared().count() == 20

        # second drain: checkpoint advances past processed files → no-op
        # (the PREPARED_COMPLETED rows it now sees are filtered out anyway)
        assert run_streaming_promoter(p, ckpt) == []

        # a new ingest is picked up incrementally
        b3 = p.ingest(df, batch_id="20260101000000000003")
        assert run_streaming_promoter(p, ckpt) == [b3]
        assert p.prepared().count() == 30


class TestStreamStaticJoin:
    def test_stream_static_enrich_matches_batch(self, spark, tmp_path):
        """Stream-static broadcast enrich over availableNow equals the batch
        join, including stream rows with no dimension match (left join)."""
        from aws_genaric_datapipeline_spark.streaming.windows import enrich_with_dim

        src = str(tmp_path / "events")
        rows = [_event(i, minute=i % 10, user=i % 5) for i in range(40)]
        _write_events(spark, src, rows)
        dim = spark.createDataFrame(
            [(0, "bronze"), (1, "silver"), (2, "gold")], ["user_id", "tier"]
        )

        batch = enrich_with_dim(spark.read.parquet(src), dim)
        expected = sorted(
            (r["event_id"], r["tier"]) for r in batch.select("event_id", "tier").collect()
        )
        assert any(t is None for _, t in expected), "left join must keep unmatched users"

        stream = stream_events(spark, src)
        enriched = enrich_with_dim(stream, dim).select("event_id", "tier")
        q = (
            enriched.writeStream.format("memory")
            .queryName("enrich_sink")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(
            (r["event_id"], r["tier"])
            for r in spark.sql("SELECT * FROM enrich_sink").collect()
        )
        assert got == expected


class TestStreamStreamJoin:
    def test_interval_join_matches_batch(self, spark, tmp_path):
        """Stream-stream interval join (views x clicks within 1 hour) over
        availableNow produces exactly the batch join's pairs."""
        from aws_genaric_datapipeline_spark.streaming.windows import (
            join_click_after_view,
        )

        src = str(tmp_path / "events")
        rows = [
            _event(i, minute=(i * 7) % 60, user=i % 3, etype="view" if i % 2 else "click")
            for i in range(60)
        ]
        _write_events(spark, src, rows)
        batch = spark.read.parquet(src)
        b_views = batch.where(F.col("event_type") == "view")
        b_clicks = batch.where(F.col("event_type") == "click")
        expected = sorted(
            (r["view_id"], r["click_id"])
            for r in join_click_after_view(b_views, b_clicks).collect()
        )
        assert expected, "fixture must produce at least one join pair"

        stream = stream_events(spark, src)
        joined = join_click_after_view(
            stream.where(F.col("event_type") == "view"),
            stream.where(F.col("event_type") == "click"),
        )
        q = (
            joined.writeStream.format("memory")
            .queryName("ss_join_sink")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(
            (r["view_id"], r["click_id"])
            for r in spark.sql("SELECT * FROM ss_join_sink").collect()
        )
        assert got == expected


class TestStreamStreamOuterJoin:
    def test_left_outer_emits_unmatched_views_after_watermark(self, spark, tmp_path):
        """Stream-stream LEFT OUTER interval join: never-clicked views must
        surface as null-padded rows — but only once the watermark proves no
        partner can still arrive.  A far-future sentinel view advances the
        watermark past all real data so the drain is deterministic; the
        sentinel itself (whose own state cannot expire) is excluded from
        the comparison on both sides."""
        from aws_genaric_datapipeline_spark.streaming.windows import (
            join_click_after_view,
        )

        src = str(tmp_path / "events")
        rows = [
            _event(i, minute=(i * 7) % 50, user=i % 3, etype="view" if i % 2 else "click")
            for i in range(40)
        ]
        # One far-future sentinel PER SIDE: the global watermark is the MIN
        # across all watermarked inputs (multipleWatermarkPolicy=min), so a
        # view-only sentinel would leave the click side's watermark behind
        # all real data and no null row could ever be proven final.
        # Distinct users 7/8 so the sentinels never pair with anything.
        sentinels = [
            (9999, dt.datetime(2024, 1, 2, 10, 0, 0), 7, "view", 1.0, "{}"),
            (9998, dt.datetime(2024, 1, 2, 10, 0, 0), 8, "click", 1.0, "{}"),
        ]
        _write_events(spark, src, rows + sentinels)

        batch = spark.read.parquet(src)
        expected = sorted(
            (r["view_id"], r["click_id"])
            for r in join_click_after_view(
                batch.where(F.col("event_type") == "view"),
                batch.where(F.col("event_type") == "click"),
                how="left_outer",
            ).collect()
            if r["view_id"] != 9999
        )
        assert any(c is None for _, c in expected), "fixture needs unmatched views"
        assert any(c is not None for _, c in expected), "fixture needs matched views"

        stream = stream_events(spark, src)
        joined = join_click_after_view(
            stream.where(F.col("event_type") == "view"),
            stream.where(F.col("event_type") == "click"),
            how="left_outer",
        )
        q = (
            joined.writeStream.format("memory")
            .queryName("ss_outer_sink")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_outer"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(
            (r["view_id"], r["click_id"])
            for r in spark.sql("SELECT * FROM ss_outer_sink").collect()
            if r["view_id"] != 9999
        )
        assert got == expected


def _has_protobuf() -> bool:
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class TestTransformWithState:
    @pytest.mark.skipif(
        not _has_protobuf(),
        reason="transformWithStateInPandas needs protobuf for its driver-side "
        "state-server channel; not installed in this container (operator code "
        "is exercised on clusters where pyspark[connect] deps are present)",
    )
    def test_high_water_marks_converge_to_batch_max(self, spark, tmp_path):
        """transformWithStateInPandas high-water tracker: fed one file per
        micro-batch, emissions per user are strictly increasing and the last
        one equals the batch-computed global max."""
        from aws_genaric_datapipeline_spark.streaming.stateful import (
            high_water_marks,
        )

        src = str(tmp_path / "events")
        # three files → three micro-batches with maxFilesPerTrigger=1
        for part in range(3):
            rows = [
                _event(part * 100 + i, minute=i % 60, user=i % 3, value=float((i * 7 + part * 11) % 50))
                for i in range(30)
            ]
            _write_events(spark, src, rows)

        batch_max = {
            r["user_id"]: r["mx"]
            for r in spark.read.parquet(src)
            .groupBy("user_id")
            .agg(F.max("value").alias("mx"))
            .collect()
        }

        stream = stream_events(spark, src, max_files_per_trigger=1)
        q = (
            high_water_marks(stream)
            .writeStream.format("memory")
            .queryName("hw_sink")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.sql("SELECT * FROM hw_sink").collect()
        per_user: dict = {}
        for r in got:
            per_user.setdefault(r["user_id"], []).append(r["high_water"])
        assert set(per_user) == set(batch_max)
        for uid, marks in per_user.items():
            assert marks == sorted(marks) and len(set(marks)) == len(marks)
            assert marks[-1] == batch_max[uid]


class TestStreamingDedup:
    def test_debounce_dedup_stream_matches_batch(self, spark, tmp_path):
        """dropDuplicatesWithinWatermark over availableNow produces exactly
        the batch distinct key set, with in-watermark duplicates dropped."""
        from aws_genaric_datapipeline_spark.streaming.windows import debounce_dedup

        src = str(tmp_path / "events")
        # 3 users x 2 types across minutes, every event written TWICE
        # (at-least-once upstream), plus a same-minute triple
        rows = []
        eid = 0
        for i in range(30):
            for _dup in range(2):
                rows.append(
                    _event(eid, minute=(i * 3) % 60, user=i % 3,
                           etype="view" if i % 2 else "click")
                )
                eid += 1
        _write_events(spark, src, rows)

        batch = spark.read.parquet(src)
        expected = sorted(
            (r["user_id"], r["event_type"], r["minute"])
            for r in debounce_dedup(batch).collect()
        )
        assert expected and len(expected) < len(rows), "dedup must drop rows"

        stream = stream_events(spark, src)
        q = (
            debounce_dedup(stream)
            .writeStream.format("memory")
            .queryName("dedup_sink")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(
            (r["user_id"], r["event_type"], r["minute"])
            for r in spark.sql("SELECT * FROM dedup_sink").collect()
        )
        assert got == expected


class TestStreamingCms:
    def test_stream_grid_accumulates_across_microbatches(self, spark, tmp_path):
        """cms_sketch is a plain explode+groupBy, so it runs unchanged as a
        streaming stateful aggregation: with maxFilesPerTrigger=1 forcing
        one micro-batch per file, the complete-mode grid after draining
        must equal the batch grid over the union — the mergeability
        contract (cell-wise addition) exercised by the real streaming
        state store, not a hand-rolled union."""
        from aws_genaric_datapipeline_spark.operators.sketches import cms_sketch

        src = str(tmp_path / "keys")
        a = spark.createDataFrame([("x",)] * 4 + [("y",)] * 2, "k string")
        b = spark.createDataFrame([("x",)] * 1 + [("z",)] * 3, "k string")
        a.coalesce(1).write.mode("append").parquet(src)
        b.coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema("k string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            cms_sketch(stream, "k")
            .writeStream.format("memory")
            .queryName("cms_grid")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt_cms"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert q.lastProgress is not None
        got = {tuple(r) for r in spark.sql("SELECT * FROM cms_grid").collect()}
        want = {
            tuple(r) for r in cms_sketch(a.unionByName(b), "k").collect()
        }
        assert got == want and got


class TestStreamingIncrementalComponents:
    def test_edge_stream_folds_into_component_state(self, spark, tmp_path):
        """Streaming graph maintenance: edge batches arrive one micro-batch
        per file; foreachBatch folds each into the standing (node,
        component) state with incremental_components.  After draining, the
        state must equal one-shot connected_components over ALL edges —
        the maintenance identity under the real streaming runtime, with
        batches crafted so a later batch MERGES two components created by
        earlier ones (the case order-sensitive maintenance gets wrong)."""
        from aws_genaric_datapipeline_spark.operators.graph import (
            connected_components,
            incremental_components,
        )

        src = str(tmp_path / "edges")
        state_path = str(tmp_path / "cc_state")
        b1 = spark.createDataFrame([(1, 2), (10, 11)], "src long, dst long")
        b2 = spark.createDataFrame([(2, 3), (20, 21)], "src long, dst long")
        b3 = spark.createDataFrame([(3, 10)], "src long, dst long")  # merges 1* and 10*
        for b in (b1, b2, b3):
            b.coalesce(1).write.mode("append").parquet(src)

        spark.createDataFrame([], "node long, component long").write.mode(
            "overwrite"
        ).parquet(state_path)

        def fold(batch_df, batch_id):
            state = batch_df.sparkSession.read.parquet(state_path)
            updated = incremental_components(state, batch_df).localCheckpoint(
                eager=True
            )
            updated.write.mode("overwrite").parquet(state_path)

        stream = (
            spark.readStream.schema("src long, dst long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(fold)
            .option("checkpointLocation", str(tmp_path / "ckpt_cc"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r["node"], r["component"])
            for r in spark.read.parquet(state_path).collect()
        }
        want = {
            (r["node"], r["component"])
            for r in connected_components(
                b1.unionByName(b2).unionByName(b3)
            ).collect()
        }
        assert got == want and got
        # the merge case really happened: 10/11 relabeled under min id 1
        assert (11, 1) in got and (20, 20) in got


class TestStreamingBloomScreen:
    def test_stream_screen_matches_batch(self, spark, tmp_path):
        """Bloom decontamination as a streaming ingest gate: documents
        arrive as a file stream, the persisted position index enters as a
        STATIC broadcast side (stream-static joins are stateless), and the
        per-doc flag aggregation runs in complete mode — the drained
        result must equal the batch screen over the same corpus."""
        import pyspark.sql.functions as F

        from aws_genaric_datapipeline_spark.operators import dedup as D

        bench = spark.createDataFrame(
            [(100, "the quick brown fox jumps over everything")],
            "doc_id long, text string",
        )
        docs = spark.createDataFrame(
            [
                (1, "quick brown fox seen running elsewhere today"),
                (2, "utterly unrelated content with no overlap"),
                (3, "the quick brown fox jumps over everything verbatim"),
            ],
            "doc_id long, text string",
        )
        spark.sql("DROP TABLE IF EXISTS bloom_stream_idx")
        D.bloom_build_index(bench, "bloom_stream_idx")

        src = str(tmp_path / "docs")
        docs.coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            D.bloom_screen_indexed(spark, stream, "bloom_stream_idx")
            .writeStream.format("memory")
            .queryName("bloom_screen")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt_bloom"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            tuple(r) for r in spark.sql("SELECT * FROM bloom_screen").collect()
        }
        want = {
            tuple(r)
            for r in D.bloom_screen_indexed(
                spark, docs, "bloom_stream_idx"
            ).collect()
        }
        assert got == want and got
        assert {r[0] for r in got} == {1, 3}
        spark.sql("DROP TABLE IF EXISTS bloom_stream_idx")


class TestStreamingClassifierScore:
    def test_streamed_scores_equal_batch(self, spark, tmp_path):
        """Model-in-the-loop INGEST gate: score a document stream with a
        FROZEN trained model via foreachBatch.  Weights are integer
        fixed-point, so the drained streaming scores equal the batch
        scores bit-for-bit — training offline, scoring at ingest."""
        import pyspark.sql.functions as F

        from aws_genaric_datapipeline_spark.operators import classifier as C
        from aws_genaric_datapipeline_spark.tables import load

        (documents,) = load(spark, "/root/testdata/sf0.001", "documents")
        docs = documents.select("doc_id", "text", "n_chars").limit(100)
        feat = C.centered_token_features(docs, num_buckets=8)
        labels = docs.select(
            F.col("doc_id").alias("did"),
            F.when(F.col("n_chars") >= 300, 1).otherwise(0).cast("bigint").alias("y"),
        )
        model = C.train_logreg(spark, feat, labels, num_buckets=8, iters=3)
        # batch ground truth over the same frozen model
        want = {
            (r["did"], r["margin_fp"], r["score_fp"], r["pred"])
            for r in C.score_documents(spark, feat, model).collect()
        }

        stats = C.centering_stats(docs, num_buckets=8)
        src = tmp_path / "docs_src"
        docs.write.parquet(str(src))
        stream = spark.readStream.schema(docs.schema).parquet(str(src))
        got: set = set()

        def _score(batch_df, _bid):
            # FROZEN centering stats from training — scores are batch-
            # split invariant (TestFrozenCentering), so any micro-batch
            # decomposition of the stream yields the same values.
            bf = C.centered_token_features(batch_df, num_buckets=8, stats=stats)
            for r in C.score_documents(spark, bf, model).collect():
                got.add((r["did"], r["margin_fp"], r["score_fp"], r["pred"]))

        q = (
            stream.writeStream.foreachBatch(_score)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert got == want


class TestStreamingCdf:
    """Change-data-feed as a streaming source (streaming/cdf.py): tail a
    TxnTable's commit log, apply per-version table_changes diffs into a
    downstream TxnTable exactly once — streamed feed ≡ batch
    table_changes per version, replay-safe across restarts and even
    checkpoint loss."""

    def _mk(self, spark, tmp_path):
        from aws_genaric_datapipeline_spark.pipeline.txn import TxnTable

        src = TxnTable(spark, str(tmp_path / "src"))
        dst = TxnTable(spark, str(tmp_path / "dst"))
        return src, dst

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "k bigint, v string")

    @staticmethod
    def _feed(dst):
        return {
            (r["k"], r["change_type"], r["old_v"], r["new_v"], r["_cdf_version"])
            for r in dst.read().collect()
        }

    @staticmethod
    def _batch_feed(src, lo, hi):
        from aws_genaric_datapipeline_spark.pipeline.txn import table_changes

        out = set()
        for v in range(lo + 1, hi + 1):
            for r in table_changes(src, v - 1, v, ["k"]).collect():
                out.add((r["k"], r["change_type"], r["old_v"], r["new_v"], v))
        return out

    def test_streamed_feed_matches_batch_table_changes(self, spark, tmp_path):
        from aws_genaric_datapipeline_spark.streaming.cdf import (
            stream_table_changes,
        )

        src, dst = self._mk(spark, tmp_path)
        src.append(self._df(spark, [(1, "a"), (2, "b")]))          # v1 inserts
        src.merge_upsert(self._df(spark, [(2, "B"), (3, "c")]), keys=["k"])  # v2
        src.overwrite(self._df(spark, [(3, "c"), (4, "d")]))       # v3 deletes+insert
        q = stream_table_changes(
            spark, src, dst, ["k"], str(tmp_path / "ckpt"), sink_id="t"
        )
        q.awaitTermination(120)
        assert self._feed(dst) == self._batch_feed(src, 0, 3)
        # the file source actually PARSES the multi-line commit JSONs (one
        # record per file; refs.json filtered) — not all-null dead rows
        parsed = (
            spark.read.schema("version bigint, op string")
            .option("multiLine", "true")
            .json(str(src.path / src.LOG_DIR))
            .where("version is not null")
        )
        assert {(r["version"], r["op"]) for r in parsed.collect()} == {
            (1, "append"),
            (2, "merge"),
            (3, "overwrite"),
        }
        # the bootstrap version arrived as pure inserts
        v1 = {t for t in self._feed(dst) if t[4] == 1}
        assert v1 == {(1, "insert", None, "a", 1), (2, "insert", None, "b", 1)}

    def test_incremental_restart_applies_only_new_versions(self, spark, tmp_path):
        from aws_genaric_datapipeline_spark.streaming.cdf import (
            stream_table_changes,
        )

        src, dst = self._mk(spark, tmp_path)
        ckpt = str(tmp_path / "ckpt")
        src.append(self._df(spark, [(1, "a")]))
        stream_table_changes(spark, src, dst, ["k"], ckpt, sink_id="t").awaitTermination(120)
        n_after_first = len(dst._commits())
        # new upstream commits, then restart on the SAME checkpoint
        src.append(self._df(spark, [(2, "b")]))
        src.merge_upsert(self._df(spark, [(1, "A")]), keys=["k"])
        stream_table_changes(spark, src, dst, ["k"], ckpt, sink_id="t").awaitTermination(120)
        assert self._feed(dst) == self._batch_feed(src, 0, 3)
        # exactly one dst commit per upstream version, never reapplied
        assert len(dst._commits()) == n_after_first + 2

    def test_checkpoint_loss_does_not_duplicate(self, spark, tmp_path):
        """Even restarting from a FRESH checkpoint (total replay of the
        commit-log file source) re-applies nothing: the per-version
        app_txn_id makes every diff append idempotent."""
        from aws_genaric_datapipeline_spark.streaming.cdf import (
            stream_table_changes,
        )

        src, dst = self._mk(spark, tmp_path)
        src.append(self._df(spark, [(1, "a"), (2, "b")]))
        src.overwrite(self._df(spark, [(2, "B")]))
        stream_table_changes(
            spark, src, dst, ["k"], str(tmp_path / "ckpt1"), sink_id="t"
        ).awaitTermination(120)
        first = self._feed(dst)
        n_commits = len(dst._commits())
        stream_table_changes(
            spark, src, dst, ["k"], str(tmp_path / "ckpt2"), sink_id="t"
        ).awaitTermination(120)
        assert self._feed(dst) == first == self._batch_feed(src, 0, 2)
        assert len(dst._commits()) == n_commits

    def test_handler_replay_and_compaction_are_safe(self, spark, tmp_path):
        """Direct foreachBatch re-delivery (Structured Streaming's
        at-least-once contract) is a no-op, and a compaction commit
        produces an EMPTY diff version rather than phantom changes."""
        from aws_genaric_datapipeline_spark.pipeline.txn import compact
        from aws_genaric_datapipeline_spark.streaming.cdf import (
            cdf_applied_high_water,
            cdf_foreach_batch,
        )

        src, dst = self._mk(spark, tmp_path)
        src.append(self._df(spark, [(1, "a")]))
        src.append(self._df(spark, [(2, "b")]))
        compact(src)  # v3: content unchanged
        handler = cdf_foreach_batch(src, dst, ["k"], sink_id="t")
        handler(None, 0)
        feed = self._feed(dst)
        handler(None, 1)  # redelivery: nothing new upstream
        assert self._feed(dst) == feed
        assert cdf_applied_high_water(dst, "t") == 3
        assert {t for t in feed if t[4] == 3} == set()  # empty compaction diff
        assert {t[4] for t in feed} == {1, 2}


class TestStreamingCdfReplica:
    """stream_apply_changes (APPLY CHANGES INTO): the replica table tracks
    the upstream's latest snapshot through inserts, updates, deletes, and
    pure-delete versions — exactly-once across restarts and handler
    redelivery."""

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "k bigint, v string")

    @staticmethod
    def _rows(t):
        return {(r["k"], r["v"]) for r in t.read().collect()}

    def test_replica_tracks_snapshot_through_all_change_types(self, spark, tmp_path):
        from aws_genaric_datapipeline_spark.pipeline.txn import TxnTable
        from aws_genaric_datapipeline_spark.streaming.cdf import (
            stream_apply_changes,
        )

        src = TxnTable(spark, str(tmp_path / "src"))
        rep = TxnTable(spark, str(tmp_path / "rep"))
        src.append(self._df(spark, [(1, "a"), (2, "b"), (3, "c")]))
        src.merge_upsert(self._df(spark, [(2, "B"), (4, "d")]), keys=["k"])
        src.overwrite(self._df(spark, [(2, "B"), (4, "d")]))  # deletes 1,3
        src.delete_keys(spark.createDataFrame([(4,)], "k bigint"), ["k"])
        q = stream_apply_changes(
            spark, src, rep, ["k"], str(tmp_path / "ckpt"), sink_id="r"
        )
        assert q.awaitTermination(120)
        assert self._rows(rep) == self._rows(src) == {(2, "B")}

    def test_incremental_restart_and_redelivery(self, spark, tmp_path):
        from aws_genaric_datapipeline_spark.pipeline.txn import TxnTable
        from aws_genaric_datapipeline_spark.streaming.cdf import (
            cdf_applied_high_water,
            cdf_replica_foreach_batch,
            stream_apply_changes,
        )

        src = TxnTable(spark, str(tmp_path / "src"))
        rep = TxnTable(spark, str(tmp_path / "rep"))
        ckpt = str(tmp_path / "ckpt")
        src.append(self._df(spark, [(1, "a"), (2, "b")]))
        stream_apply_changes(
            spark, src, rep, ["k"], ckpt, sink_id="r"
        ).awaitTermination(120)
        assert self._rows(rep) == {(1, "a"), (2, "b")}
        n_commits = len(rep._commits())
        # upstream moves on: an update and a pure-delete version
        src.merge_upsert(self._df(spark, [(1, "A")]), keys=["k"])
        src.delete_keys(spark.createDataFrame([(2,)], "k bigint"), ["k"])
        stream_apply_changes(
            spark, src, rep, ["k"], ckpt, sink_id="r"
        ).awaitTermination(120)
        assert self._rows(rep) == self._rows(src) == {(1, "A")}
        assert cdf_applied_high_water(rep, "r") == 3
        # direct handler redelivery: a no-op, no phantom commits
        n_now = len(rep._commits())
        cdf_replica_foreach_batch(src, rep, ["k"], sink_id="r")(None, 99)
        assert len(rep._commits()) == n_now
        assert self._rows(rep) == {(1, "A")}
        assert n_now > n_commits  # versions 2..3 did land exactly once


class TestCdfBackpressure:
    """Bounded work per trigger on the CDF consumers: max_versions_per_batch
    caps how many upstream versions one micro-batch applies, and
    maxFilesPerTrigger splits a commit-log backlog into several triggers —
    a replica catching up after a long outage does bounded work per
    trigger and still converges to the upstream snapshot."""

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "k bigint, v string")

    @staticmethod
    def _rows(t):
        return {(r["k"], r["v"]) for r in t.read().collect()}

    def test_20_version_backlog_drains_over_multiple_triggers(self, spark, tmp_path):
        """20-version upstream backlog, cap 5 versions/trigger and 5 commit
        files/trigger: availableNow drains it over >= 4 triggers with the
        replica content identical to the upstream snapshot."""
        from aws_genaric_datapipeline_spark.pipeline.txn import TxnTable
        from aws_genaric_datapipeline_spark.streaming.cdf import (
            cdf_applied_high_water,
            stream_apply_changes,
        )

        src = TxnTable(spark, str(tmp_path / "src"))
        rep = TxnTable(spark, str(tmp_path / "rep"))
        for i in range(1, 21):  # v1..v20: upserts with one delete mixed in
            if i == 10:
                src.delete_keys(spark.createDataFrame([(1,)], "k bigint"), ["k"])
            else:
                src.merge_upsert(self._df(spark, [(i % 4, f"v{i}")]), keys=["k"])
        assert src.latest_version() == 20
        q = stream_apply_changes(
            spark,
            src,
            rep,
            ["k"],
            str(tmp_path / "ckpt"),
            sink_id="bp",
            max_versions_per_batch=5,
            max_files_per_trigger=5,
        )
        assert q.awaitTermination(600)
        assert len(q.recentProgress) >= 4  # the backlog split into triggers
        assert cdf_applied_high_water(rep, "bp") == 20
        assert self._rows(rep) == self._rows(src)

    def test_oversized_file_cap_clamps_to_version_cap(self, spark, tmp_path):
        """Regression (round-12 review): an EXPLICIT file cap larger than
        the version cap used to strand the backlog — availableNow listed
        every commit file in one trigger, the capped handler applied only
        the first chunk, and the drained stream stopped stale.  The file
        cap now clamps down to the version cap, so the backlog drains."""
        from aws_genaric_datapipeline_spark.pipeline.txn import TxnTable
        from aws_genaric_datapipeline_spark.streaming.cdf import (
            cdf_applied_high_water,
            stream_apply_changes,
        )

        src = TxnTable(spark, str(tmp_path / "src"))
        rep = TxnTable(spark, str(tmp_path / "rep"))
        for i in range(1, 13):  # v1..v12
            src.merge_upsert(self._df(spark, [(i % 3, f"v{i}")]), keys=["k"])
        q = stream_apply_changes(
            spark,
            src,
            rep,
            ["k"],
            str(tmp_path / "ckpt"),
            sink_id="clamp",
            max_versions_per_batch=4,
            max_files_per_trigger=50,  # oversized — must clamp to 4
        )
        assert q.awaitTermination(600)
        assert cdf_applied_high_water(rep, "clamp") == 12
        assert self._rows(rep) == self._rows(src)

    def test_capped_handler_does_bounded_work_per_call(self, spark, tmp_path):
        """Direct handler calls: each applies exactly the cap, the
        high-water mark advances cap-at-a-time, and the closure cache is
        consistent with the log-derived mark."""
        from aws_genaric_datapipeline_spark.pipeline.txn import TxnTable
        from aws_genaric_datapipeline_spark.streaming.cdf import (
            cdf_applied_high_water,
            cdf_foreach_batch,
        )

        src = TxnTable(spark, str(tmp_path / "src"))
        dst = TxnTable(spark, str(tmp_path / "dst"))
        for i in range(1, 9):
            src.append(self._df(spark, [(i, f"v{i}")]))
        handler = cdf_foreach_batch(src, dst, ["k"], sink_id="t",
                                    max_versions_per_batch=3)
        for expect in (3, 6, 8, 8):  # 8 versions at cap 3: 3,3,2,0
            handler(None, 0)
            assert cdf_applied_high_water(dst, "t") == expect
        # feed content identical to the uncapped form
        assert {
            (r["k"], r["new_v"], r["_cdf_version"]) for r in dst.read().collect()
        } == {(i, f"v{i}", i) for i in range(1, 9)}

    def test_high_water_scan_stops_at_newest_marker(self, spark, tmp_path):
        """cdf_applied_high_water scans newest-first: a trailing -del
        commit (no marker suffix) is skipped and the marker below found;
        an unrelated sink_id yields 0."""
        from aws_genaric_datapipeline_spark.pipeline.txn import TxnTable
        from aws_genaric_datapipeline_spark.streaming.cdf import (
            cdf_applied_high_water,
        )

        rep = TxnTable(spark, str(tmp_path / "rep"))
        rep.append(self._df(spark, [(1, "a")]), app_txn_id="r-v7")
        rep.delete_keys(
            spark.createDataFrame([(1,)], "k bigint"), ["k"],
            app_txn_id="r-v8-del",
        )
        assert cdf_applied_high_water(rep, "r") == 7
        assert cdf_applied_high_water(rep, "other") == 0


class TestCdfReplicaSchemaEvolution:
    """Upstream rename_column/drop_column commits replay onto the replica
    (round-12 review finding: without propagation, the first post-rename
    upsert wedged the replica's MERGE on a missing column forever)."""

    def _df(self, spark, rows, schema="k bigint, v string"):
        return spark.createDataFrame(rows, schema)

    def test_rename_mid_stream_then_upsert(self, spark, tmp_path):
        from aws_genaric_datapipeline_spark.pipeline.txn import TxnTable
        from aws_genaric_datapipeline_spark.streaming.cdf import (
            cdf_applied_high_water,
            stream_apply_changes,
        )

        src = TxnTable(spark, str(tmp_path / "src"))
        rep = TxnTable(spark, str(tmp_path / "rep"))
        ckpt = str(tmp_path / "ckpt")
        src.append(self._df(spark, [(1, "a"), (2, "b")]))     # v1
        stream_apply_changes(spark, src, rep, ["k"], ckpt, sink_id="r").awaitTermination(120)
        src.rename_column("v", "val")                          # v2
        src.merge_upsert(                                      # v3
            self._df(spark, [(2, "B")], "k bigint, val string"), keys=["k"]
        )
        src.drop_column("val")                                 # v4
        src.append(self._df(spark, [(3,)], "k bigint"))        # v5
        stream_apply_changes(spark, src, rep, ["k"], ckpt, sink_id="r").awaitTermination(120)
        assert cdf_applied_high_water(rep, "r") == 5
        assert sorted(rep.read().columns) == sorted(src.read().columns)
        assert {tuple(r) for r in rep.read().select("k").collect()} == {
            (1,), (2,), (3,),
        }
        # re-running the whole stream from a FRESH checkpoint replays the
        # schema ops idempotently (old name gone, new name present)
        stream_apply_changes(
            spark, src, rep, ["k"], str(tmp_path / "ckpt2"), sink_id="r"
        ).awaitTermination(120)
        assert sorted(rep.read().columns) == sorted(src.read().columns)


class TestStreamingIvfMaintenance:
    def test_stream_fed_index_equals_one_shot_build(self, spark, tmp_path):
        """Structured-streaming maintenance of the txn-backed IVF index:
        seed with a trained build, then drain embedding micro-batches
        through ivf_txn_maintainer (foreachBatch + exactly-once commit).
        The stream-fed index must equal the one-shot assignment of the
        UNION corpus under the same centroids (assignment is a pure
        function of vector × centroids), queries through the pruned txn
        read must match the plain partitioned-parquet index, and a
        replayed micro-batch must re-commit as a no-op."""
        import math

        from aws_genaric_datapipeline_spark.operators.similarity import (
            _assign_cells,
            _unit_vectors_np,
            ivf_query_index,
            ivf_query_txn,
            ivf_txn_maintainer,
            ivf_txn_seed,
        )

        def vec(i, axis):
            # four clean clusters on the unit axes, small deterministic wobble
            base = [0.0] * 4
            base[axis] = 1.0
            base[(axis + 1) % 4] = 0.05 * math.sin(i)
            return [float(x) for x in base]

        seed_rows = [(i, vec(i, i % 4)) for i in range(24)]
        b1_rows = [(100 + i, vec(100 + i, i % 4)) for i in range(8)]
        b2_rows = [(200 + i, vec(200 + i, i % 4)) for i in range(8)]
        schema = "vec_id long, embedding array<float>"
        seed = spark.createDataFrame(seed_rows, schema)
        b1 = spark.createDataFrame(b1_rows, schema)
        b2 = spark.createDataFrame(b2_rows, schema)

        index_path = str(tmp_path / "ivf_txn")
        table = ivf_txn_seed(
            spark, seed, index_path, num_cells=4, iters=2
        )
        v_seed = table.latest_version()

        src = str(tmp_path / "embed_stream")
        b1.coalesce(1).write.mode("append").parquet(src)
        b2.coalesce(1).write.mode("append").parquet(src)
        handler = ivf_txn_maintainer(table, index_path, num_files=4)
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(handler)
            .option("checkpointLocation", str(tmp_path / "ckpt_ivf"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert table.latest_version() == v_seed + 2  # one commit per batch

        # maintenance identity: content == one-shot assignment of the
        # union under the SAME centroids
        union = seed.unionByName(b1).unionByName(b2)
        centroids = spark.read.parquet(f"{index_path}/centroids")
        want = {
            (r["vid"], r["cell_id"])
            for r in _assign_cells(
                _unit_vectors_np(union, "vec_id", "embedding"),
                centroids,
                nprobe=1,
            ).collect()
        }
        got = {
            (r["vid"], r["cell_id"]) for r in table.read().collect()
        }
        assert got == want and len(got) == 40

        # crash replay: re-delivering an already-committed micro-batch
        # must be a version no-op (exactly-once under the txn log)
        handler(b2, 1)
        assert table.latest_version() == v_seed + 2

        # query parity vs the plain partitioned-parquet layout built
        # from the same centroids over the same union corpus
        plain = str(tmp_path / "ivf_plain")
        spark.read.parquet(f"{index_path}/centroids").write.parquet(
            f"{plain}/centroids"
        )
        _assign_cells(
            _unit_vectors_np(union, "vec_id", "embedding"), centroids, nprobe=1
        ).select("vid", "uvec", "cell_id").write.partitionBy("cell_id").parquet(
            f"{plain}/cells"
        )
        queries = spark.createDataFrame(
            [(900, vec(900, 0)), (901, vec(901, 2))], schema
        )
        got_q = {
            tuple(r)
            for r in ivf_query_txn(
                spark, table, index_path, queries, k=3, nprobe=2
            ).collect()
        }
        want_q = {
            tuple(r)
            for r in ivf_query_index(
                spark, plain, queries, k=3, nprobe=2
            ).collect()
        }
        assert got_q == want_q and got_q

        # the stats prune really skips files: one probed cell's query
        # must open fewer cell files than the table holds
        one_cell = spark.createDataFrame([(902, vec(902, 1))], schema)
        probed = _assign_cells(
            _unit_vectors_np(one_cell, "vec_id", "embedding"),
            centroids,
            nprobe=1,
        )
        wanted = {r["cell_id"] for r in probed.collect()}
        stats = table.file_stats()
        files = table.live_files()
        chosen = [
            f
            for f in files
            if stats.get(f, {}).get("cell_id") is None
            or any(
                stats[f]["cell_id"][0] <= w <= stats[f]["cell_id"][1]
                for w in wanted
            )
        ]
        assert len(chosen) < len(files)


class TestStreamingBm25Maintenance:
    def test_stream_fed_index_matches_one_shot_build(self, spark, tmp_path):
        """The txn-backed inverted index, fed by a document stream
        through bm25_txn_maintainer, must answer BM25 queries exactly
        like a one-shot build over the union corpus (tf/df/dl/avgdl are
        content functions of the corpus); a replayed micro-batch is a
        no-op on both tables, and term-bucket file stats prune the
        postings scan."""
        from aws_genaric_datapipeline_spark.operators.retrieval import (
            bm25_query_txn,
            bm25_txn_maintainer,
            bm25_txn_seed,
            build_inverted_index,
            query_inverted_index,
        )

        seed = spark.createDataFrame(
            [
                (1, "spark merges vectors with spark"),
                (2, "unrelated prose about nothing"),
                (3, "vector search and spark pipelines"),
            ],
            "doc_id long, text string",
        )
        b1 = spark.createDataFrame(
            [(10, "spark spark spark everywhere"), (11, "merge conflicts")],
            "doc_id long, text string",
        )
        b2 = spark.createDataFrame(
            [(20, "vectors merge under spark")],
            "doc_id long, text string",
        )
        idx = str(tmp_path / "bm25_txn")
        pt, dt = bm25_txn_seed(spark, seed, idx, num_buckets=8)
        v_p, v_d = pt.latest_version(), dt.latest_version()

        src = str(tmp_path / "doc_stream")
        b1.coalesce(1).write.mode("append").parquet(src)
        b2.coalesce(1).write.mode("append").parquet(src)
        handler = bm25_txn_maintainer(pt, dt, num_buckets=8)
        q = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(handler)
            .option("checkpointLocation", str(tmp_path / "ckpt_bm25"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert pt.latest_version() == v_p + 2
        assert dt.latest_version() == v_d + 2

        # crash replay: both tables no-op on a re-delivered batch
        handler(b2, 1)
        assert pt.latest_version() == v_p + 2 and dt.latest_version() == v_d + 2

        # query parity vs the one-shot plain index over the union corpus
        union = seed.unionByName(b1).unionByName(b2)
        plain = str(tmp_path / "bm25_plain")
        build_inverted_index(union, plain, num_buckets=8)
        terms = ("spark", "vector", "merge")
        got = [
            tuple(r)
            for r in bm25_query_txn(
                spark, pt, dt, terms, k=10, num_buckets=8
            ).collect()
        ]
        want = [
            tuple(r)
            for r in query_inverted_index(
                spark, plain, terms, k=10, num_buckets=8
            ).collect()
        ]
        assert got == want and got

        # the bucket stats really prune: a single-term query must open
        # fewer postings files than the table holds
        import pyspark.sql.functions as F

        one = (
            spark.createDataFrame([("spark",)], "term string")
            .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(8)))
            .collect()[0]["bucket"]
        )
        stats = pt.file_stats()
        files = pt.live_files()
        chosen = [
            f
            for f in files
            if stats.get(f, {}).get("bucket") is None
            or stats[f]["bucket"][0] <= one <= stats[f]["bucket"][1]
        ]
        assert len(chosen) < len(files)


class TestBm25TxnEmptyPrune:
    def test_all_files_pruned_returns_empty_not_crash(self, spark, tmp_path):
        """Query terms whose hash buckets fall outside every live
        postings file's committed band must return an EMPTY top-k frame
        (the plain-index behavior), not crash on a zero-path parquet
        scan — the read goes through TxnTable.read_files, which handles
        the empty-chosen case."""
        import pyspark.sql.functions as F

        from aws_genaric_datapipeline_spark.operators.retrieval import (
            bm25_query_txn,
            bm25_txn_seed,
        )

        seed = spark.createDataFrame(
            [(1, "alpha alpha alpha")], "doc_id long, text string"
        )
        pt, dt = bm25_txn_seed(spark, seed, str(tmp_path / "bm25"), num_buckets=64)
        b0 = (
            spark.createDataFrame([("alpha",)], "term string")
            .select(F.pmod(F.xxhash64("term"), F.lit(64)).alias("b"))
            .collect()[0]["b"]
        )
        # find a term hashing to a different bucket than the only file's
        other = next(
            w
            for w in ("zeta", "omega", "kappa", "sigma", "theta")
            if spark.createDataFrame([(w,)], "term string")
            .select(F.pmod(F.xxhash64("term"), F.lit(64)).alias("b"))
            .collect()[0]["b"]
            != b0
        )
        out = bm25_query_txn(spark, pt, dt, (other,), k=5, num_buckets=64)
        assert out.count() == 0
        assert set(out.columns) == {"doc_id", "bm25"}
