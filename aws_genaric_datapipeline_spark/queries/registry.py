"""Query registry: name → (spark callable, DuckDB oracle SQL).

Every operator claimed in SURVEY.md §2 registers here; the driver harness
(__spark_entry__.py) exposes the registry via queries()/oracle_sql().

Contract (driver compare): the driver sorts columns by NAME then hashes
values, so the Spark DataFrame and the oracle SQL must produce identical
column names and (post-rounding) identical values.  Convention used
throughout the catalog:
- alias every computed column on both sides;
- round floating aggregates: money-scale → 2 decimals, ratio/avg-scale → 4;
- deterministic output (no sampling, no wall-clock).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query implementation with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco
