"""Single-pass data-quality gates via ``observe()``.

The reference has no data validation at all — bad batches land in the
prepared layer silently (the transformation hook at
prepared_layer_job.py:110 is a pass-through and nothing checks row
contents).  This module attaches declarative quality rules to a DataFrame
as ``observe()`` metrics: every rule is evaluated during the SAME action
that writes the data (zero extra scans — the fix that also killed the
reference's count-then-write double scan), and the batch can be failed or
quarantined afterwards based on the collected metrics.

Scale: observe() metrics are accumulator-style aggregates merged task-side;
cost is a few counters per task regardless of data size.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Observation


@dataclass(frozen=True)
class Rule:
    """A named predicate that every row should satisfy."""

    name: str
    predicate: Column  # boolean column; True = row passes

    @staticmethod
    def not_null(col: str) -> "Rule":
        return Rule(f"{col}_not_null", F.col(col).isNotNull())

    @staticmethod
    def in_range(col: str, lo, hi) -> "Rule":
        return Rule(f"{col}_in_range", F.col(col).between(lo, hi))

    @staticmethod
    def matches(col: str, pattern: str) -> "Rule":
        return Rule(f"{col}_matches", F.col(col).rlike(pattern))


class QualityError(ValueError):
    """Raised when a batch violates quality rules."""


def with_quality_metrics(
    df: DataFrame, rules: list[Rule]
) -> tuple[DataFrame, Observation]:
    """Attach violation counters for every rule (plus total rows) to ``df``.

    Returns (df, observation); run ONE action on the returned df, then read
    ``observation.get`` — a dict like {"rows": n, "<rule>_violations": k}.
    """
    obs = Observation()
    metrics = [F.count(F.lit(1)).alias("rows")]
    for r in rules:
        metrics.append(
            F.sum(F.when(~F.coalesce(r.predicate, F.lit(False)), 1).otherwise(0))
            .alias(f"{r.name}_violations")
        )
    return df.observe(obs, *metrics), obs


def check_quality(metrics: dict, max_violation_ratio: float = 0.0) -> None:
    """Raise QualityError if any rule's violation ratio exceeds the budget."""
    rows = max(int(metrics.get("rows", 0)), 1)
    failures = {
        k: v
        for k, v in metrics.items()
        if k.endswith("_violations") and v / rows > max_violation_ratio
    }
    if failures:
        raise QualityError(f"quality gate failed ({rows} rows): {failures}")


def build_rules(cfg) -> list[Rule]:
    """Build Rule predicates from a PipelineConfig's declarative specs."""
    out: list[Rule] = []
    for q in getattr(cfg, "quality", ()):
        if q.rule == "not_null":
            out.append(Rule.not_null(q.column))
        elif q.rule == "in_range":
            out.append(Rule.in_range(q.column, q.lo, q.hi))
        elif q.rule == "matches":
            out.append(Rule.matches(q.column, q.pattern))
        else:
            raise ValueError(f"unknown quality rule: {q.rule!r}")
    return out


def quarantine_split(
    df: DataFrame, rules: list["Rule"]
) -> tuple[DataFrame, DataFrame]:
    """Split a batch into (good, quarantined) by the rule set — the row-
    level complement of the observe() metrics: metrics tell you a batch
    is 2% bad, the split ROUTES those rows to a quarantine sink with the
    failed rule names attached, so the good 98% still lands on time and
    the bad rows are triageable (the Deequ/DLT "expectations with
    quarantine" pattern).

    ``failed_rules`` is a comma-joined sorted rule-name string — stable,
    portable, and groupable for triage dashboards.  NULL predicate
    results count as failures (a rule that cannot evaluate did not
    pass).

    Scale: one pass, row-parallel — the rule array evaluates inside
    whole-stage codegen; no shuffle is introduced by the split itself
    (each sink's write then partitions independently)."""
    bad = [r.name for r in rules if "," in r.name]
    if bad:
        # failed_rules is comma-joined; a comma inside a rule name would make
        # the tag ambiguous for downstream triage parsing.
        raise ValueError(f"rule names must not contain ',': {bad}")
    checks = F.array(
        *[
            F.when(
                ~F.coalesce(r.predicate, F.lit(False)), F.lit(r.name)
            ).otherwise(F.lit(None))
            for r in rules
        ]
    )
    tagged = df.withColumn(
        "failed_rules",
        F.array_join(F.array_sort(F.filter(checks, lambda x: x.isNotNull())), ","),
    )
    good = tagged.where(F.col("failed_rules") == "").drop("failed_rules")
    quarantined = tagged.where(F.col("failed_rules") != "")
    return good, quarantined
