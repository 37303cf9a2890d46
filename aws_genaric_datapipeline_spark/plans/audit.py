"""Inspect physical plans for the properties that matter at scale.

Usage: per-operator plan reviews (tests/test_plans.py) assert that

- filters reach the parquet scan (``PushedFilters``) — a filter evaluated
  only post-scan reads 100 TB to discard most of it;
- column pruning reaches the scan (``ReadSchema`` shows only needed cols);
- dimension joins broadcast (``BroadcastHashJoin``) instead of shuffling
  the fact side;
- batch reads prune partitions (``PartitionFilters``);
- shuffle counts match the expected plan shape (every Exchange is a full
  network pass over the data).

These read ``explain("formatted")`` output, which is stable enough across
Spark 3.5/4.x for substring checks.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)  # type: ignore[attr-defined]


def has_pushed_filters(df: DataFrame, *needles: str) -> bool:
    """True if the scan shows pushed filters mentioning every needle."""
    plan = explain_str(df)
    for m in re.finditer(r"PushedFilters: \[(?P<f>[^\]]*)\]", plan):
        if all(n in m.group("f") for n in needles):
            return True
    return False


def has_partition_filters(df: DataFrame, *needles: str) -> bool:
    plan = explain_str(df)
    for m in re.finditer(r"PartitionFilters: \[(?P<f>[^\]]*)\]", plan):
        if all(n in m.group("f") for n in needles):
            return True
    return False


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in the first scan's ReadSchema (pruning check)."""
    plan = explain_str(df)
    m = re.search(r"ReadSchema: struct<(?P<cols>[^>]*)>", plan)
    if not m:
        return []
    return [c.split(":")[0].strip() for c in m.group("cols").split(",") if c.strip()]


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators in the physical plan (pre-AQE shape).

    Counts operator detail headers ("(5) Exchange") so each node is counted
    once — the formatted output repeats operators in tree + detail sections.
    """
    return len(re.findall(r"^\(\d+\) Exchange", explain_str(df), re.MULTILINE))
