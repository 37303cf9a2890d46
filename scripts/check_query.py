"""One-off local mirror of the driver oracle gate for a subset of queries.

Usage: python scripts/check_query.py name1 [name2 ...] [--sf DIR]
Runs the Spark query and its DuckDB oracle side by side and prints
match/mismatch — same normalization as tests/test_queries_oracle.py.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.001"
argv = sys.argv[1:]
if "--sf" in argv:
    i = argv.index("--sf")
    SF = argv[i + 1]
    del argv[i : i + 2]
names = argv

from pyspark.sql import SparkSession  # noqa: E402

from aws_genaric_datapipeline_spark.queries import QUERIES  # noqa: E402
from aws_genaric_datapipeline_spark.tables import TABLES, table_path  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .appName("check_query")
    .getOrCreate()
)
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF, t)}'")


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.6g}" if v == v and abs(v) < 1e15 else repr(v)
        return str(v)

    return sorted(tuple(norm_cell(row[i]) for i in order) for row in rows)


fail = 0
for name in names:
    spec = QUERIES[name]
    sdf = spec.fn(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if not spec.oracle:
        print(f"{name}: NO ORACLE — spark rows={len(srows)}")
        continue
    rel = con.sql(spec.oracle)
    drows, dcols = rel.fetchall(), rel.columns
    ok_cols = sorted(scols) == sorted(dcols)
    ok_rows = len(srows) == len(drows)
    ns, nd = _normalize(srows, scols), _normalize(drows, dcols)
    diff = [(a, b) for a, b in zip(ns, nd) if a != b]
    ok = ok_cols and ok_rows and not diff
    fail += 0 if ok else 1
    print(f"{name}: {'OK' if ok else 'FAIL'} rows={len(srows)}/{len(drows)} cols_ok={ok_cols}")
    if not ok_cols:
        print("  spark cols:", sorted(scols), "\n  duck cols:", sorted(dcols))
    if diff:
        print("  first diff:", diff[0])

sys.exit(1 if fail else 0)
