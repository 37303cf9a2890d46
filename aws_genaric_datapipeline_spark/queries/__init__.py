"""Driver-verified query catalog.

Importing this package populates the registry with every implemented query.
"""

from aws_genaric_datapipeline_spark.queries.registry import QUERIES, QuerySpec, query

# Import modules for their registration side effects.
from aws_genaric_datapipeline_spark.queries import (  # noqa: E402,F401
    behavioral,
    corpus_curation,
    diagnostics,
    events_analytics,
    modern_sql,
    north_star,
    record_linkage,
    relational_aggs,
    relational_extra,
    relational_joins,
    relational_stats,
    relational_windows,
    retail_analytics,
    sampling_merge,
    scalar_functions,
    setops,
    streaming_windows,
    tpch,
    training_prep,
    tpch_extra,
    tpch_final,
    tpch_partsupp,
    udf_surface,
)

__all__ = ["QUERIES", "QuerySpec", "query"]
