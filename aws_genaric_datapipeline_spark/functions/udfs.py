"""User-defined function surface (SURVEY.md §2b UDF/UDAF/UDTF row).

Ground rules encoded here (the 100 TB posture):

- Row-at-a-time Python UDFs are banned in the hot path — everything below
  is Arrow-batched (``pandas_udf`` / ``applyInPandas``), 10-100× faster.
- A UDF must never wrap logic a built-in expression can do; the scalar
  example below exists to demonstrate the surface and its docstring says
  exactly that.  UDTF-style row generation is explode over arrays
  (queries/relational_extra.func_explode_tokens); custom aggregation is
  grouped-map ``applyInPandas``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import pandas_udf


def _discounted_price(extendedprice: pd.Series, discount: pd.Series) -> pd.Series:
    return extendedprice * (1.0 - discount)


def discounted_price_pandas_udf(extendedprice: Column, discount: Column) -> Column:
    """Vectorized scalar Pandas UDF: price * (1 - discount) over Arrow
    batches.

    Demonstration of the scalar UDF surface ONLY — this exact expression
    should be (and in every real query here IS) a built-in column
    expression, which stays in whole-stage codegen and is strictly faster.
    Reach for a scalar pandas_udf when the per-value logic genuinely needs
    Python (a tokenizer, a third-party scoring lib).

    (Wrapped lazily: pandas_udf return-type parsing needs an active
    SparkSession, so the decorator can't run at module import.)
    """
    return pandas_udf(_discounted_price, "double")(extendedprice, discount)


def zscore_per_group(
    df: DataFrame, group_col: str, value_col: str, keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Grouped-map applyInPandas: z-score of ``value_col`` within each group.

    Each group arrives as one pandas DataFrame (Arrow transfer), so this is
    the pattern for per-group logic that needs full-group context in Python
    (model scoring, per-entity normalization).  Groups must fit in executor
    memory — for heavy-hitter keys, pre-split with salting or switch to a
    window expression.  ddof=1 (sample std) to match SQL stddev_samp.
    """
    out_cols = [group_col, *keep_cols, value_col, "zscore"]
    schema_parts = [f"`{c}` {dict(df.dtypes)[c]}" for c in (group_col, *keep_cols, value_col)]
    schema = ", ".join(schema_parts + ["zscore double"])

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=1)
        mean = pdf[value_col].mean()
        pdf = pdf[[group_col, *keep_cols, value_col]].copy()
        pdf["zscore"] = (pdf[value_col] - mean) / std if std and std > 0 else 0.0
        return pdf[out_cols]

    return df.groupBy(group_col).applyInPandas(normalize, schema=schema)
