"""Physical-plan auditing utilities (no custom Catalyst rules — SURVEY.md §4
concluded none are needed; this package *verifies* that Catalyst produces
the plans the 100 TB posture requires)."""

from aws_genaric_datapipeline_spark.plans.audit import (
    explain_str,
    has_broadcast_hash_join,
    has_partition_filters,
    has_pushed_filters,
    scan_read_schema,
    shuffle_count,
)

__all__ = [
    "explain_str",
    "has_pushed_filters",
    "has_partition_filters",
    "has_broadcast_hash_join",
    "scan_read_schema",
    "shuffle_count",
]
