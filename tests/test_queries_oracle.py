"""Local mirror of the driver's oracle gate.

For every registered query with an oracle, run the Spark DataFrame AND the
DuckDB SQL on the same parquet tables (sf0.001 for speed), then compare
row-count, column names, and order-insensitive values.  Catches name/type/
value drift before the driver's sf0.01 run does.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from aws_genaric_datapipeline_spark.queries import QUERIES
from aws_genaric_datapipeline_spark.tables import TABLES, table_path

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF, t)}'")
    yield con
    con.close()


def _normalize(rows, columns):
    """Sort columns by name, stringify values with float rounding."""
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


ORACLE_QUERIES = sorted(name for name, spec in QUERIES.items() if spec.oracle)
ROWS_ONLY_QUERIES = sorted(name for name, spec in QUERIES.items() if not spec.oracle)

# Two-tier suite (round-13 VERDICT item 9): the full registry re-verify
# dominates suite wall time, so every 6th query (sorted — a stable ~50-query
# cross-family sample) stays unmarked while the rest carry `full_oracle`.
# Edit loop:   pytest tests/ -m "not full_oracle"   (~sample + all unit/plan)
# CI/judging:  pytest tests/                        (unchanged — full tier)
_FAST_SAMPLE = set(ORACLE_QUERIES[::6])
_ORACLE_PARAMS = [
    name
    if name in _FAST_SAMPLE
    else pytest.param(name, marks=pytest.mark.full_oracle)
    for name in ORACLE_QUERIES
]


@pytest.mark.parametrize("name", _ORACLE_PARAMS)
def test_query_matches_oracle(spark, duck, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, SF)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    rel = duck.sql(spec.oracle)
    duck_cols = rel.columns
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    # types must agree too (int widths, decimal precision, timestamp flavor)
    stypes = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    dtypes = {
        c: {"integer": "int", "varchar": "string"}.get(str(t).lower(), str(t).lower())
        for c, t in zip(rel.columns, rel.types)
    }
    type_diffs = {c: (stypes[c], dtypes[c]) for c in stypes if stypes[c] != dtypes.get(c, stypes[c])}
    assert not type_diffs, f"{name}: column types differ: {type_diffs}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns, nd = _normalize(spark_rows, spark_cols), _normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} row(s) differ; first: {mismatches[0]}"


def test_every_query_has_an_oracle():
    """Full-coverage invariant: the registry carries NO oracle-less entries.

    Round 6 closed the last rows-only queries; this pins that state — a new
    query landing without a DuckDB oracle fails here instead of silently
    degrading to the driver's weaker rows-only check."""
    assert ROWS_ONLY_QUERIES == [], (
        f"queries registered without an oracle: {ROWS_ONLY_QUERIES}"
    )
