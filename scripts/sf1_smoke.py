#!/usr/bin/env python
"""sf1 scaling smoke (round-9 VERDICT item 8): empirically verify the
~linear candidate-scaling claims in SCALING.md for the dedup/ANN headline
family by running it at sf0.1 and at a synthetic 10x corpus, and printing
the per-query time ratios.

The driver ships data only up to sf0.1, so sf1 is SYNTHESIZED from it:

- documents: 10 replicas; replica k rotates each document's token order
  by k positions and remaps doc_id.  Token multisets (vocab, tf, doc
  length) are preserved — the corpus SHAPE scales by 10x — while shingle
  sets differ across replicas, so the near-duplicate cluster structure
  replicates per-copy instead of collapsing into 10x-deep clusters
  (which would measure an adversarial dup-blowup, not scaling).
- embeddings: 10 replicas; replica k adds a small deterministic offset
  to one coordinate, keeping near-neighbor structure mostly within-copy.
- the TPC-H-ish tables are passed through unchanged (the smoke's queries
  read only documents/embeddings).

Pass criterion (printed per query): time(sf1x10) / time(sf0.1) well
below the quadratic frontier (100x); the SCALING.md claim is ~linear,
so ratios are expected in the low tens at worst on a 32-core box that
is not fully utilized at sf0.1.

Usage: python scripts/sf1_smoke.py   (writes the synthetic corpus to
/tmp/sf1_synth_<appid>, prints one JSON line per scale and the ratios.)
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from aws_genaric_datapipeline_spark.queries import QUERIES  # noqa: E402
from aws_genaric_datapipeline_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
FAMILY = [
    "dedup_minhash_lsh",
    "sim_ivf_topk",
    "dedup_incremental_minhash",
    "dedup_incremental_simhash",
    "dedup_incremental_semantic",
    # round-10 additions: the hybrid exact tf-idf tier (dense matmul at
    # this vocab) and the cluster-atomic split (jaccard edges + CC)
    "sim_tfidf_cosine_pairs",
    "sample_split_leakage_safe",
    # round-11 additions (VERDICT item 5): the graph family (hash-min CC
    # over shingle near-dup edges, star-alternation CC, LSH-edge label
    # propagation), the trained classifier (GD loop over sparse hashed
    # features), and the new ExactSubstr span-removal pass
    "graph_incremental_components",
    "graph_components_star",
    "graph_label_propagation",
    "text_quality_classifier",
    "text_span_removal",
]
REPLICAS = 10


def build_synth(spark, out: Path) -> None:
    out.mkdir(parents=True, exist_ok=True)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n_docs = docs.count()
    copies = []
    for k in range(REPLICAS):
        rot = docs.select(
            (F.col("doc_id") + F.lit(k * n_docs * 10)).alias("doc_id"),
            F.when(F.lit(k) == 0, F.col("text"))
            .otherwise(
                F.array_join(
                    F.expr(
                        f"concat(slice(split(trim(text), '\\\\s+'), {k} + 1, "
                        f"1000000), slice(split(trim(text), '\\\\s+'), 1, {k}))"
                    ),
                    " ",
                )
            )
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        copies.append(rot)
    allc = copies[0]
    for c in copies[1:]:
        allc = allc.unionByName(c)
    allc.write.mode("overwrite").parquet(str(out / "documents.parquet"))

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    n_emb = emb.count()
    ecopies = []
    for k in range(REPLICAS):
        ecopies.append(
            emb.select(
                (F.col("vec_id") + F.lit(k * n_emb * 10)).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: x
                    + F.when(i == 0, F.lit(k) * F.lit(0.0173)).otherwise(
                        F.lit(0.0)
                    ),
                )
                .cast("array<float>")
                .alias("embedding"),
                *[c for c in emb.columns if c not in ("vec_id", "embedding")],
            )
        )
    alle = ecopies[0]
    for c in ecopies[1:]:
        alle = alle.unionByName(c)
    alle.write.mode("overwrite").parquet(str(out / "embeddings.parquet"))

    for t in (
        "region nation customer supplier part orders lineitem events".split()
    ):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(str(out / f"{t}.parquet"))


def sweep(spark, sf_dir: str) -> dict[str, float]:
    times: dict[str, float] = {}
    for name in FAMILY:
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        times[name] = round(time.perf_counter() - t0, 2)
        spark.catalog.clearCache()
    return times


def main() -> None:
    spark = get_spark(app_name="sf1-smoke", master="local[32]")
    out = Path(f"/tmp/sf1_synth_{spark.sparkContext.applicationId}")
    try:
        build_synth(spark, out)
        # compile/warm pass at sf0.001
        for name in FAMILY:
            QUERIES[name].fn(spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        spark.catalog.clearCache()
        base = sweep(spark, SRC)
        big = sweep(spark, str(out))
        ratios = {n: round(big[n] / base[n], 2) for n in FAMILY}
        print(json.dumps({"sf0.1": base, "sf1x10": big, "ratio": ratios}))
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
