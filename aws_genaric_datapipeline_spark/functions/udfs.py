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


def _trimmed_mean_cents(cents: pd.Series) -> int:
    s = cents.sort_values().to_numpy()
    k = len(s) // 10
    kept = s[k : len(s) - k]
    total, n = int(kept.sum()), len(kept)
    # int64 sum is exact.  The division must TRUNCATE TOWARD ZERO, not
    # floor: DuckDB's `//` truncates ((-7) // 2 = -3) while Python/numpy
    # floor ((-7) // 2 = -4) — they differ whenever the trimmed sum is
    # negative and not an exact multiple of the kept count (refund-heavy
    # groups).  Trunc-div keeps the oracle replay bit-for-bit.
    return -((-total) // n) if total < 0 else total // n


def _group_size(cents: pd.Series) -> int:
    return int(len(cents))


def group_size_udaf(cents: Column) -> Column:
    """GROUPED_AGG pandas count — exists because Spark disallows mixing a
    group-aggregate pandas UDF with non-pandas aggregates in one agg()
    (INVALID_PANDAS_UDF_PLACEMENT); pairing two pandas UDAFs is legal."""
    return pandas_udf(_group_size, "bigint")(cents)


def trimmed_mean_cents_udaf(cents: Column) -> Column:
    """GROUPED_AGG pandas UDF (Series -> scalar): 10%-trimmed mean over
    integer cents — the one UDF species scalar/grouped-map/UDTF don't
    cover.  Each group's values arrive as ONE pandas Series via Arrow;
    Spark runs the partial/final split for plain aggs, but a grouped-agg
    UDF needs the WHOLE group on one executor — same memory contract as
    applyInPandas (salt or pre-aggregate heavy-hitter keys at scale).

    Arithmetic is exact: inputs are bigint cents, the sum is an int64,
    and the final floor division matches DuckDB ``//`` — so a relational
    oracle (window rank + conditional sum) reproduces it bit-for-bit.

    (Wrapped lazily: pandas_udf return-type parsing needs an active
    SparkSession.)"""
    return pandas_udf(_trimmed_mean_cents, "bigint")(cents)


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
