"""Erasure-cascade contracts (operators/dedup.py erasers): for every
persisted index family, erase(build(corpus), victims) must equal
build(corpus \\ victims) — row-for-row on the tables AND query-for-query
on the screening results."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from aws_genaric_datapipeline_spark.operators import dedup as D
from aws_genaric_datapipeline_spark.tables import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    (d,) = load(spark, SF, "documents")
    return d


def _rows(spark, table):
    def cell(v):
        return tuple(v) if isinstance(v, list) else v

    return {tuple(cell(v) for v in r) for r in spark.table(table).collect()}


class TestMinhashErasure:
    def test_erased_equals_rebuilt(self, spark, documents):
        victims = documents.where(F.col("doc_id") % 10 == 1)
        survivors = documents.where(F.col("doc_id") % 10 != 1)
        D.minhash_build_index(documents, "er_mh_bands_a", "er_mh_toks_a")
        D.erase_from_minhash_index(
            spark,
            "er_mh_bands_a",
            "er_mh_toks_a",
            victims.select(F.col("doc_id").alias("did")),
        )
        D.minhash_build_index(survivors, "er_mh_bands_b", "er_mh_toks_b")
        assert _rows(spark, "er_mh_bands_a") == _rows(spark, "er_mh_bands_b")
        assert _rows(spark, "er_mh_toks_a") == _rows(spark, "er_mh_toks_b")

    def test_screening_equivalence(self, spark, documents):
        """Query results against the erased index == against a rebuilt
        one, for an arbitrary probe batch."""
        probe = documents.where(F.col("doc_id") % 7 == 0)

        def q(bands, toks):
            return {
                tuple(r)
                for r in D.minhash_query_index(
                    spark, probe, bands, toks, threshold=0.8
                ).collect()
            }

        assert q("er_mh_bands_a", "er_mh_toks_a") == q(
            "er_mh_bands_b", "er_mh_toks_b"
        )


class TestSimhashErasure:
    def test_erased_equals_rebuilt(self, spark, documents):
        victims = documents.where(F.col("doc_id") % 10 == 2)
        survivors = documents.where(F.col("doc_id") % 10 != 2)
        D.simhash_build_index(documents, "er_sh_chunks_a", "er_sh_sigs_a")
        D.erase_from_simhash_index(
            spark,
            "er_sh_chunks_a",
            "er_sh_sigs_a",
            victims.select(F.col("doc_id").alias("did")),
        )
        D.simhash_build_index(survivors, "er_sh_chunks_b", "er_sh_sigs_b")
        assert _rows(spark, "er_sh_chunks_a") == _rows(spark, "er_sh_chunks_b")
        assert _rows(spark, "er_sh_sigs_a") == _rows(spark, "er_sh_sigs_b")


class TestFingerprintErasure:
    def test_shared_fingerprint_survives_partial_erasure(self, spark):
        """fp is shared across a duplicate family: erasing ONE copy must
        keep the fp indexed; erasing the whole family removes it."""
        docs = spark.createDataFrame(
            [(1, "same text"), (2, "same text"), (3, "only mine")],
            "doc_id long, text string",
        )
        D.write_fingerprint_index(docs, "er_fp_idx")
        # erase doc 1 only: family {1,2} still has survivor 2
        D.erase_from_fingerprint_index(
            spark,
            "er_fp_idx",
            victims_df=docs.where(F.col("doc_id") == 1),
            survivors_df=docs.where(F.col("doc_id") != 1),
        )
        assert spark.table("er_fp_idx").count() == 2
        # now erase docs 2 and 3: nothing survives but nothing else does either
        D.erase_from_fingerprint_index(
            spark,
            "er_fp_idx",
            victims_df=docs.where(F.col("doc_id") != 1),
            survivors_df=docs.where(F.lit(False)),
        )
        assert spark.table("er_fp_idx").count() == 0

    def test_equals_rebuild_on_real_corpus(self, spark, documents):
        victims = documents.where(F.col("doc_id") % 10 == 4)
        survivors = documents.where(F.col("doc_id") % 10 != 4)
        D.write_fingerprint_index(documents, "er_fp_a")
        D.erase_from_fingerprint_index(
            spark, "er_fp_a", victims_df=victims, survivors_df=survivors
        )
        D.write_fingerprint_index(survivors, "er_fp_b")
        assert _rows(spark, "er_fp_a") == _rows(spark, "er_fp_b")


class TestBloomErasure:
    def test_rebuild_unblocks_erased_content(self, spark):
        """After erasure-by-rebuild, content only the victims contained
        screens clean; surviving benchmark content still blocks."""
        bench = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta"),
                (2, "one two three four five six"),
            ],
            "doc_id long, text string",
        )
        D.bloom_build_index(bench, "er_bloom_idx")
        D.erase_from_bloom_index(
            bench.where(F.col("doc_id") == 2), "er_bloom_idx"
        )
        probes = spark.createDataFrame(
            [
                (10, "alpha beta gamma delta epsilon zeta"),  # erased content
                (11, "one two three four five six"),  # surviving content
            ],
            "doc_id long, text string",
        )
        flagged = {
            r["doc_id"]
            for r in D.bloom_screen_indexed(spark, probes, "er_bloom_idx")
            .where(F.col("n_flagged") > 0)
            .collect()
        }
        assert 11 in flagged and 10 not in flagged


class TestLshIndexErasure:
    def test_erased_equals_rebuilt_with_frozen_planes(self, spark):
        from aws_genaric_datapipeline_spark.operators import similarity as S
        from aws_genaric_datapipeline_spark.tables import load

        (emb,) = load(spark, SF, "embeddings")
        victims = emb.where(F.col("vec_id") % 9 == 2)
        survivors = emb.where(F.col("vec_id") % 9 != 2)
        planes = S.lsh_build_index(emb, "er_lsh_bk_a", "er_lsh_v_a")
        S.erase_from_lsh_index(
            spark, "er_lsh_bk_a", "er_lsh_v_a",
            victims.select(F.col("vec_id").alias("vid")),
        )
        S.lsh_build_index(
            survivors, "er_lsh_bk_b", "er_lsh_v_b", num_planes=planes
        )
        assert _rows(spark, "er_lsh_bk_a") == _rows(spark, "er_lsh_bk_b")
        assert _rows(spark, "er_lsh_v_a") == _rows(spark, "er_lsh_v_b")


class TestIvfIndexErasure:
    def test_partition_pruned_erase_and_ghost_cell_removal(self, spark, tmp_path):
        import numpy as np

        from aws_genaric_datapipeline_spark.operators import similarity as S

        # tiny corpus engineered so one cell is ENTIRELY victims
        rng = np.random.RandomState(0)
        rows = [(i, rng.randn(8).tolist()) for i in range(40)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        path = str(tmp_path / "ivf")
        S.ivf_build_index(df, path, num_cells=4)
        cells = spark.read.parquet(f"{path}/cells")
        # victims: everything in the first cell plus two vectors elsewhere
        first_cell = cells.select("cell_id").distinct().orderBy("cell_id").first()[0]
        vic_ids = {r["vid"] for r in cells.where(F.col("cell_id") == first_cell).collect()}
        other = [r["vid"] for r in cells.where(F.col("cell_id") != first_cell).limit(2).collect()]
        vic_ids |= set(other)
        victims = spark.createDataFrame([(v,) for v in sorted(vic_ids)], "vid long")
        before = {(r["vid"], r["cell_id"]) for r in cells.collect()}
        S.erase_from_ivf_index(spark, path, victims)
        after = {
            (r["vid"], r["cell_id"])
            for r in spark.read.parquet(f"{path}/cells").collect()
        }
        assert after == {p for p in before if p[0] not in vic_ids}
        # the all-victim cell's partition directory is gone, not a ghost
        import os

        assert not os.path.exists(f"{path}/cells/cell_id={first_cell}")

    def test_query_never_returns_victims(self, spark, tmp_path):
        from aws_genaric_datapipeline_spark.operators import similarity as S
        from aws_genaric_datapipeline_spark.tables import load

        (emb,) = load(spark, SF, "embeddings")
        path = str(tmp_path / "ivf2")
        S.ivf_build_index(emb, path, num_cells=8)
        vic = [r["vec_id"] for r in emb.select("vec_id").limit(40).collect() if r["vec_id"] % 2 == 0]
        queries = emb.where(F.col("vec_id").isin([1, 3, 5]))
        S.erase_from_ivf_index(
            spark, path, spark.createDataFrame([(v,) for v in vic], "vid long")
        )
        got = S.ivf_query_index(spark, path, queries, k=5, nprobe=8)
        neighbors = {r["neighbor_id"] for r in got.collect()}
        assert neighbors.isdisjoint(set(vic))


class TestCountingBloom:
    def test_erase_equals_rebuild_table_exact(self, spark, documents):
        """Counts are sums over (doc, gram, hash) contributions, so
        erase(build(A ∪ B), B) == build(A) row-for-row — the deletable
        index the plain position-set Bloom cannot be."""
        part_a = documents.where(F.col("doc_id") % 4 != 0)
        part_b = documents.where(F.col("doc_id") % 4 == 0)
        D.counting_bloom_build_index(documents, "er_cbloom_a")
        D.counting_bloom_erase(spark, "er_cbloom_a", part_b)
        D.counting_bloom_build_index(part_a, "er_cbloom_b")
        assert _rows(spark, "er_cbloom_a") == _rows(spark, "er_cbloom_b")

    def test_screen_matches_plain_bloom(self, spark, documents):
        """Same set bits as the position-set index => identical screening
        verdicts on an arbitrary probe batch."""
        D.counting_bloom_build_index(documents, "er_cbloom_c")
        D.bloom_build_index(documents, "er_bloom_c")
        probe = documents.where(F.col("doc_id") % 6 == 0)
        a = {
            tuple(r)
            for r in D.counting_bloom_screen(spark, probe, "er_cbloom_c").collect()
        }
        b = {
            tuple(r)
            for r in D.bloom_screen_indexed(spark, probe, "er_bloom_c").collect()
        }
        assert a == b

    def test_shared_gram_survives_partial_erase(self, spark):
        """Two docs share grams: erasing one decrements but must not
        clear the shared positions."""
        bench = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "alpha beta gamma epsilon")],
            "doc_id long, text string",
        )
        D.counting_bloom_build_index(bench, "er_cbloom_d")
        D.counting_bloom_erase(
            spark, "er_cbloom_d", bench.where(F.col("doc_id") == 2)
        )
        probe = spark.createDataFrame(
            [(10, "alpha beta gamma delta")], "doc_id long, text string"
        )
        flagged = (
            D.counting_bloom_screen(spark, probe, "er_cbloom_d")
            .where(F.col("n_flagged") > 0)
            .count()
        )
        assert flagged == 1
