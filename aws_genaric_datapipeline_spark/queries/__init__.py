"""Driver-verified query catalog.

Importing this package populates the registry with every implemented query.
"""

from aws_genaric_datapipeline_spark.queries.registry import QUERIES, QuerySpec, query

# Import modules for their registration side effects.
from aws_genaric_datapipeline_spark.queries import tpch  # noqa: E402,F401

__all__ = ["QUERIES", "QuerySpec", "query"]
