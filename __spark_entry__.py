"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``aws_genaric_datapipeline_spark/``; this module is
a thin adapter over the query registry
(aws_genaric_datapipeline_spark/queries/registry.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from aws_genaric_datapipeline_spark.queries import QUERIES  # noqa: E402
from aws_genaric_datapipeline_spark.tables import SMOKE_SF_DIR  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return QUERIES["q1_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def _verification_priority() -> dict[str, tuple[bool, int, int]]:
    """(last_was_ok, times_checked, last_round_checked) per query.

    Sourced from CORRECTNESS_r*.json.  The driver verifies queries in dict
    order up to a per-round cap, so ``queries()`` yields entries whose most
    recent driver row was an err/mismatch FIRST (so fixes get re-checked the
    very next round), then least-recently-verified entries.  This rotates
    driver coverage across rounds until every registered query has a green row.
    """
    import json
    import re

    here = Path(__file__).resolve().parent
    seen: dict[str, tuple[bool, int, int]] = {}
    for path in sorted(here.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.name)
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            # "no_oracle" counts as green only while the query is still
            # registered oracle-less; once an oracle is added the stale
            # rows-only record should be re-verified first.
            has_oracle_now = name in QUERIES and QUERIES[name].oracle is not None
            ok_errs = (None,) if has_oracle_now else (None, "no_oracle")
            ok = isinstance(row, dict) and (
                row.get("err") in ok_errs
                and row.get("rows_match", True) is not False
                and row.get("schema_match", True) is not False
                and row.get("hash_match", True) is not False
            )
            _, count, _ = seen.get(name, (True, 0, 0))
            seen[name] = (ok, count + 1, rnd)
    return seen


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered: latest-row-was-err first, then least-recently-verified
    (see _verification_priority).
    """
    seen = _verification_priority()
    names = sorted(QUERIES, key=lambda n: (*seen.get(n, (True, 0, 0)), n))
    return {name: QUERIES[name].fn for name in names}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
