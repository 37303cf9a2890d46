"""PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference ETL framework
(kaleshkk/aws-genaric-datapipeline) as an idiomatic Spark engine:

- ``session``   — tuned SparkSession builder (AQE, UTC, snappy parquet).
- ``config``    — config-driven pipeline model (mirrors pipelines/*/config.json).
- ``pipeline``  — raw→prepared batch lifecycle with an append-only state log
  (fixes the reference's broken state transition by design,
  see reference glue src/prepared_layer_job.py:176-208).
- ``sources``   — partitioned readers (parquet/csv/json/orc/jdbc).
- ``operators`` — analytics operator library: joins (incl. as-of/range),
  dedup (exact/minhash/simhash/jaccard), similarity search, text analysis,
  multimodal column plumbing.
- ``queries``   — the driver-verified query catalog (queries + DuckDB oracles).
- ``streaming`` — Structured Streaming surface (windows, watermarks, promote).

Everything is DataFrame-first: declare logical plans, let Catalyst pick the
physical strategy; Python UDFs only where built-ins can't express semantics.
"""

__version__ = "0.1.0"
