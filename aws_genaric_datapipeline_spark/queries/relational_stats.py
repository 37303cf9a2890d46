"""Statistical aggregate surface: correlation/covariance, linear-regression
aggregates, distribution moments (population skewness/kurtosis), exact
median, deterministic mode, bitwise aggregates, ordered string aggregation,
and width_bucket histograms.

Reference parity: the reference computes no statistics at all (its only
aggregate is count(), glue src/raw_layer_job.py:158); this module fills the
SURVEY.md §2b aggregation rows that go beyond sum/avg.  Every aggregate here
is a single-shuffle hash aggregation with map-side partials — the same
scale shape as q1.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.tables import load


@query(
    "stats_corr_covar",
    oracle="""
        SELECT l_returnflag,
               round(corr(l_extendedprice, l_quantity), 4)       AS price_qty_corr,
               round(covar_pop(l_extendedprice, l_quantity), 2)  AS covar_p,
               round(covar_samp(l_extendedprice, l_quantity), 2) AS covar_s,
               round(stddev_pop(l_quantity), 4)                  AS qty_stddev_p
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def stats_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation and covariance per return flag — one pass, one shuffle;
    Catalyst computes the co-moments as partial aggregates (Welford-style
    merge), so the shuffle carries O(groups) state, not rows."""
    (lineitem,) = load(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("price_qty_corr"),
        F.round(F.covar_pop("l_extendedprice", "l_quantity"), 2).alias("covar_p"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias("covar_s"),
        F.round(F.stddev_pop("l_quantity"), 4).alias("qty_stddev_p"),
    )


@query(
    "stats_regression",
    oracle="""
        SELECT l_linestatus,
               round(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
               round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
               round(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
               CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs
        FROM lineitem
        GROUP BY l_linestatus
    """,
    tags=("agg", "stats"),
)
def stats_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS regression aggregates (price ~ quantity) per line status —
    the SQL-standard regr_* family, identical partial-merge scale shape
    to corr/covar."""
    (lineitem,) = load(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_linestatus").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").cast("bigint").alias("n_pairs"),
    )


@query(
    "stats_moments",
    oracle="""
        WITH mu AS (
            SELECT o_orderstatus, avg(o_totalprice) AS m, count(*) AS n
            FROM orders GROUP BY 1
        )
        SELECT o.o_orderstatus,
               round((sum(pow(o_totalprice - m, 3)) / any_value(n))
                     / pow(sum(pow(o_totalprice - m, 2)) / any_value(n), 1.5), 4) AS price_skew,
               round((sum(pow(o_totalprice - m, 4)) / any_value(n))
                     / pow(sum(pow(o_totalprice - m, 2)) / any_value(n), 2) - 3, 4) AS price_kurt
        FROM orders o JOIN mu USING (o_orderstatus)
        GROUP BY 1
    """,
    tags=("agg", "stats"),
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis of order value per status.
    Spark's skewness/kurtosis are the population (biased) estimators; the
    oracle states the same two-pass centered-moment formula explicitly
    (DuckDB's built-ins are the sample-corrected variants — different
    definition, not a bug)."""
    (orders,) = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.skewness("o_totalprice"), 4).alias("price_skew"),
        F.round(F.kurtosis("o_totalprice"), 4).alias("price_kurt"),
    )


@query(
    "agg_mode_median",
    oracle="""
        WITH counts AS (
            SELECT o_orderstatus, o_orderpriority, count(*) AS n
            FROM orders GROUP BY 1, 2
        ),
        best AS (
            SELECT o_orderstatus, o_orderpriority,
                   row_number() OVER (PARTITION BY o_orderstatus
                                      ORDER BY n DESC, o_orderpriority) AS rn
            FROM counts
        ),
        med AS (
            SELECT o_orderstatus, round(median(o_totalprice), 2) AS median_price
            FROM orders GROUP BY 1
        )
        SELECT b.o_orderstatus, b.o_orderpriority AS mode_priority, m.median_price
        FROM best b JOIN med m USING (o_orderstatus)
        WHERE b.rn = 1
    """,
    tags=("agg", "stats"),
)
def agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode (most frequent priority, ties broken by value —
    the built-in `mode` is tie-nondeterministic across engines, so the
    count+row_number form is the portable contract) plus exact median.

    Scale: the mode side aggregates to |status×priority| rows before the
    window; the median is Spark's exact `median` (full sort within group —
    swap for percentile_approx at 100 TB if ±ε is acceptable).
    """
    (orders,) = load(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("n"), F.asc("o_orderpriority"))
    modes = (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("mode_priority"))
    )
    medians = orders.groupBy("o_orderstatus").agg(
        F.round(F.median("o_totalprice"), 2).alias("median_price")
    )
    return modes.join(medians, "o_orderstatus")


@query(
    "agg_bitwise",
    oracle="""
        SELECT event_type,
               bit_and(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS k_and,
               bit_or(CAST(json_extract_string(props, '$.k') AS INTEGER))  AS k_or,
               bit_xor(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS k_xor
        FROM events
        GROUP BY event_type
    """,
    tags=("agg", "bitwise"),
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates over a JSON-extracted int — flag-mask
    folding, a one-pass commutative aggregate (perfect partial-merge)."""
    (events,) = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return events.groupBy("event_type").agg(
        F.bit_and(k).alias("k_and"),
        F.bit_or(k).alias("k_or"),
        F.bit_xor(k).alias("k_xor"),
    )


@query(
    "agg_string_sorted",
    oracle="""
        SELECT s_nationkey,
               string_agg(s_name, ',' ORDER BY s_name) AS names_csv,
               count(*) AS n_suppliers
        FROM supplier
        GROUP BY s_nationkey
    """,
    tags=("agg", "string"),
)
def agg_string_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: concat_ws over a sorted collect_list —
    the deterministic form of listagg/string_agg (the built-ins leave
    within-group order to chance in a distributed engine).

    Scale: collect_list materializes the group in memory — valid only for
    dimension-sized groups; for fact-sized groups, write rows and let the
    consumer stream them instead of building giant strings.
    """
    (supplier,) = load(spark, sf_dir, "supplier")
    return supplier.groupBy("s_nationkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("s_name"))).alias("names_csv"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )


@query(
    "stats_price_histogram",
    oracle="""
        SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                         WHEN o_totalprice >= 500000 THEN 11
                         ELSE floor(o_totalprice / 50000) + 1 END AS BIGINT) AS bucket,
               count(*) AS n_orders,
               round(min(o_totalprice), 2) AS lo,
               round(max(o_totalprice), 2) AS hi
        FROM orders
        GROUP BY 1
    """,
    tags=("agg", "histogram"),
)
def stats_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order value via width_bucket (10 buckets over
    [0, 500k); 0/11 are underflow/overflow).  The oracle spells out the
    same bucket arithmetic (DuckDB has no width_bucket).  Scale: the shuffle
    carries 12 groups — histogram construction is scan-bound."""
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(500000.0), F.lit(10))
            .cast("bigint")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@query(
    "agg_hll_mergeable",
    oracle="""
        SELECT o_orderstatus,
               count(DISTINCT o_custkey) AS exact_customers,
               true AS within_5pct
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("agg", "sketch"),
)
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: per-(status, priority) partial HLL
    sketches union-merged up to per-status estimates — the two-level rollup
    that lets 100 TB distinct counts pre-aggregate per partition/day and
    re-aggregate without rescanning raw data (exact distinct cannot).

    Sketch encoding is engine-specific, so the driver-compared output
    carries the guarantee: the exact per-status distinct plus a boolean
    asserting the union-merged estimate stays within 5% of it.  The
    merge-equals-direct property is additionally asserted in
    tests/test_operators.py::TestApproxAgg.
    """
    (orders,) = load(spark, sf_dir, "orders")
    partials = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sketch")
    )
    merged = partials.groupBy("o_orderstatus").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("_approx")
    )
    exact = orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_customers")
    )
    return merged.join(exact, "o_orderstatus").select(
        "o_orderstatus",
        "exact_customers",
        (
            F.abs(F.col("_approx") - F.col("exact_customers"))
            <= F.lit(0.05) * F.col("exact_customers")
        ).alias("within_5pct"),
    )


@query(
    "stats_mad_outliers",
    oracle="""
        WITH med AS (
            SELECT event_type, median(value) AS med
            FROM events GROUP BY event_type
        ),
        dev AS (
            SELECT e.event_type, e.value, m.med,
                   abs(e.value - m.med) AS adev
            FROM events e JOIN med m USING (event_type)
        ),
        mad AS (
            SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type
        )
        SELECT d.event_type,
               round(any_value(d.med), 4) AS median_value,
               round(any_value(m.mad), 4) AS mad,
               count(*) FILTER (d.adev > 3 * m.mad) AS n_outliers,
               count(*) AS n_rows
        FROM dev d JOIN mad m USING (event_type)
        GROUP BY d.event_type
    """,
    tags=("stats", "events"),
)
def stats_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census per event type: median absolute deviation
    (MAD) with the 3·MAD rule — the robust counterpart of the z-score
    anomaly query (events_anomaly_zscore), immune to the outliers it is
    hunting.  Two exact medians (value, then |value − median|) and one
    conditional count; comparisons run on UNROUNDED doubles in both
    engines (outputs rounded for display only), so the census is exact.

    Scale: two grouped exact medians = two sorts within event_type groups;
    at 100 TB swap `median` for `approx_percentile(·, 0.5)` — the operator
    contract (flag |x − med| > 3·MAD) is unchanged.
    """
    (events,) = load(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = events.join(med, "event_type").select(
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.any_value("med"), 4).alias("median_value"),
            F.round(F.any_value("mad"), 4).alias("mad"),
            F.count_if(F.col("adev") > 3 * F.col("mad")).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "stats_ks_drift",
    oracle="""
        WITH vb AS (
            SELECT event_type,
                   CAST(round(value * 10000) AS BIGINT) AS v,
                   ts < TIMESTAMP '2024-01-16 00:00:00' AS is_ref
            FROM events
        ),
        tot AS (
            SELECT event_type,
                   count(*) FILTER (is_ref) AS n_ref,
                   count(*) FILTER (NOT is_ref) AS n_cur
            FROM vb GROUP BY event_type
        ),
        pts AS (
            SELECT event_type, v,
                   count(*) FILTER (is_ref) AS c_ref,
                   count(*) FILTER (NOT is_ref) AS c_cur
            FROM vb GROUP BY event_type, v
        ),
        cum AS (
            SELECT event_type, v,
                   sum(c_ref) OVER (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS r,
                   sum(c_cur) OVER (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS q
            FROM pts
        ),
        scored AS (
            SELECT c.event_type, c.v, t.n_ref, t.n_cur,
                   abs(c.r * t.n_cur - c.q * t.n_ref) AS num
            FROM cum c JOIN tot t USING (event_type)
        )
        SELECT event_type,
               round(CAST(num AS DOUBLE) / (n_ref * n_cur), 4) AS ks,
               v AS at_value_bp,
               CAST(n_ref AS BIGINT) AS n_ref,
               CAST(n_cur AS BIGINT) AS n_cur
        FROM (
            SELECT *, row_number() OVER (PARTITION BY event_type
                ORDER BY num DESC, v) AS rn
            FROM scored
        ) WHERE rn = 1
    """,
    tags=("stats", "drift", "events"),
)
def stats_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic per event type (reference
    half vs current half of the time range): D = max |CDF_ref − CDF_cur|,
    located EXACTLY — the running CDF comparison is the INTEGER
    |r·n_cur − q·n_ref| (no float CDFs, so the arg-max and its location
    are bit-deterministic; ties break at the smallest value), and only
    the final reported D divides once.  Complements PSI: KS is binning-
    free and localizes WHERE the distributions diverge (at_value_bp).

    Scale: distinct-value granularity — one grouped count, one
    within-type ordered cumulative window, one arg-max.  The window sorts
    per type over distinct values (bounded by value cardinality, not row
    count); at extreme cardinality, pre-quantize values coarser."""
    (events,) = load(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    vb = events.select(
        "event_type",
        F.round(F.col("value") * 10000).cast("bigint").alias("v"),
        (F.col("ts") < cut).alias("is_ref"),
    )
    tot = vb.groupBy("event_type").agg(
        F.count_if("is_ref").alias("n_ref"),
        F.count_if(~F.col("is_ref")).alias("n_cur"),
    )
    pts = vb.groupBy("event_type", "v").agg(
        F.count_if("is_ref").alias("c_ref"),
        F.count_if(~F.col("is_ref")).alias("c_cur"),
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = pts.select(
        "event_type",
        "v",
        F.sum("c_ref").over(wc).alias("r"),
        F.sum("c_cur").over(wc).alias("q"),
    )
    scored = cum.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "v",
        "n_ref",
        "n_cur",
        F.abs(F.col("r") * F.col("n_cur") - F.col("q") * F.col("n_ref")).alias(
            "num"
        ),
    )
    wr = Window.partitionBy("event_type").orderBy(F.desc("num"), F.asc("v"))
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.round(
                F.col("num").cast("double") / (F.col("n_ref") * F.col("n_cur")),
                4,
            ).alias("ks"),
            F.col("v").alias("at_value_bp"),
            "n_ref",
            "n_cur",
        )
    )


@query(
    "stats_chi2_categorical_drift",
    oracle="""
        WITH halves AS (
            SELECT event_type,
                   ts < TIMESTAMP '2024-01-16 00:00:00' AS is_ref
            FROM events
        ),
        cnt AS (
            SELECT event_type,
                   count(*) FILTER (is_ref) AS c_ref,
                   count(*) FILTER (NOT is_ref) AS c_cur
            FROM halves GROUP BY event_type
        ),
        tot AS (
            SELECT CAST(sum(c_ref) AS BIGINT) AS n_ref,
                   CAST(sum(c_cur) AS BIGINT) AS n_cur
            FROM cnt
        ),
        terms AS (
            SELECT c.event_type,
                   -- chi2 homogeneity term: sum over both samples of
                   -- (observed - expected)^2 / expected with expected
                   -- from the pooled distribution; exact rationals until
                   -- the final division
                   CAST(c.c_ref AS DOUBLE) AS oc_ref,
                   CAST(c.c_cur AS DOUBLE) AS oc_cur,
                   CAST((c.c_ref + c.c_cur) * t.n_ref AS DOUBLE)
                       / (t.n_ref + t.n_cur) AS e_ref,
                   CAST((c.c_ref + c.c_cur) * t.n_cur AS DOUBLE)
                       / (t.n_ref + t.n_cur) AS e_cur
            FROM cnt c CROSS JOIN tot t
        )
        SELECT count(*) AS n_categories,
               round(list_aggregate(list_transform(
                   list_sort(list(struct_pack(k := event_type,
                       t := (oc_ref - e_ref) * (oc_ref - e_ref) / e_ref
                          + (oc_cur - e_cur) * (oc_cur - e_cur) / e_cur))),
                   s -> s.t), 'sum'), 4) AS chi2
        FROM terms
    """,
    tags=("stats", "drift", "events"),
)
def stats_chi2_categorical_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared homogeneity test of the event-type MIX between the
    reference and current halves — the categorical member of the drift
    trilogy (PSI: binned numeric; KS: binning-free numeric; χ²:
    categorical).  Expected counts come from the pooled distribution;
    terms stay exact rationals until one division each and fold in
    category order (sorted-struct aggregate) so the float sum is
    order-identical cross-engine.

    Scale: one grouped count over the category column — |categories|
    rows — then a driver-sized roll-up."""
    (events,) = load(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    cnt = events.groupBy("event_type").agg(
        F.count_if(F.col("ts") < cut).alias("c_ref"),
        F.count_if(F.col("ts") >= cut).alias("c_cur"),
    )
    tot = cnt.agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    t = cnt.crossJoin(F.broadcast(tot))
    e_ref = ((F.col("c_ref") + F.col("c_cur")) * F.col("n_ref")).cast(
        "double"
    ) / (F.col("n_ref") + F.col("n_cur"))
    e_cur = ((F.col("c_ref") + F.col("c_cur")) * F.col("n_cur")).cast(
        "double"
    ) / (F.col("n_ref") + F.col("n_cur"))
    oc_ref = F.col("c_ref").cast("double")
    oc_cur = F.col("c_cur").cast("double")
    term = (oc_ref - e_ref) * (oc_ref - e_ref) / e_ref + (
        oc_cur - e_cur
    ) * (oc_cur - e_cur) / e_cur
    return t.select("event_type", term.alias("t")).agg(
        F.count(F.lit(1)).alias("n_categories"),
        F.round(
            F.aggregate(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.col("event_type").alias("k"),
                                F.col("t").alias("t"),
                            )
                        )
                    ),
                    lambda s: s.getField("t"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("chi2"),
    )


@query(
    "stats_pmi_event_pairs",
    oracle="""
        WITH u AS (
            SELECT DISTINCT user_id, date_trunc('hour', ts) AS hb, event_type
            FROM events
        ),
        tot AS (SELECT count(DISTINCT (user_id, hb)) AS n_units FROM u),
        per AS (SELECT event_type, count(*) AS n_t FROM u GROUP BY 1),
        pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   count(*) AS n_ab
            FROM u a JOIN u b
              ON a.user_id = b.user_id AND a.hb = b.hb
             AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT type_a, type_b,
               CAST(n_ab AS BIGINT) AS n_ab,
               CAST(pa.n_t AS BIGINT) AS n_a,
               CAST(pb.n_t AS BIGINT) AS n_b,
               round(ln(n_ab * CAST(n_units AS DOUBLE)
                        / (pa.n_t * CAST(pb.n_t AS DOUBLE))), 4) AS pmi
        FROM pairs
        JOIN per pa ON pa.event_type = pairs.type_a
        JOIN per pb ON pb.event_type = pairs.type_b
        CROSS JOIN tot
    """,
    tags=("stats", "events"),
)
def stats_pmi_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between event types co-occurring in
    the same (user, hour) unit — the association-mining readout behind
    "which behaviors actually go together vs chance" (and the same PMI
    used for collocation mining in NLP pipelines).  The log's argument
    is a ratio of exact integer counts, so the score is deterministic to
    the rounded digit in both engines.

    Scale: presence sets dedup to one row per (unit, type) BEFORE the
    pair join, and the self-join keys on the unit — |types|²-bounded
    output, unit-cardinality-bounded shuffle."""
    (events,) = load(spark, sf_dir, "events")
    u = events.select(
        "user_id",
        F.date_trunc("hour", "ts").alias("hb"),
        "event_type",
    ).distinct()
    tot = u.agg(F.countDistinct("user_id", "hb").alias("n_units"))
    per = u.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    a = u.select("user_id", "hb", F.col("event_type").alias("type_a"))
    b = u.select("user_id", "hb", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, ["user_id", "hb"])
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    pa = per.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("n_a"))
    pb = per.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("n_b"))
    return (
        pairs.join(F.broadcast(pa), "type_a")
        .join(F.broadcast(pb), "type_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(
                F.log(
                    F.col("n_ab")
                    * F.col("n_units").cast("double")
                    / (F.col("n_a") * F.col("n_b").cast("double"))
                ),
                4,
            ).alias("pmi"),
        )
    )


@query(
    "stats_theilsen_trend",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   date_diff('day', DATE '1970-01-01',
                             CAST(date_trunc('day', ts) AS DATE)) AS d,
                   count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        slopes AS (
            SELECT a.event_type,
                   (b.n - a.n) / CAST(b.d - a.d AS DOUBLE) AS s
            FROM daily a
            JOIN daily b ON a.event_type = b.event_type AND a.d < b.d
        ),
        ts_slope AS (
            SELECT event_type, median(s) AS slope FROM slopes GROUP BY 1
        )
        SELECT d.event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               round(any_value(t.slope), 6) AS slope_per_day,
               round(median(d.n - t.slope * d.d), 4) AS intercept
        FROM daily d JOIN ts_slope t ON d.event_type = t.event_type
        GROUP BY d.event_type
    """,
    tags=("stats", "robust"),
)
def stats_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of daily event volume per type: the MEDIAN
    of all pairwise slopes (breakdown point 29%, vs 0% for the OLS line
    stats_regression fits — one bad ingest day cannot bend this trend),
    with the standard median-residual intercept.

    Slopes are exact IEEE quotients of integer differences and the
    median picks (or averages two of) them deterministically, so both
    engines agree bit-for-bit before the output rounding — no summation-
    order sensitivity, unlike OLS's Σxy accumulations.

    Scale: the raw stream collapses to (type, day) grain first; the
    pairwise join is O(days²) per type on that tiny grain (66k pairs for
    a year — nothing), NEVER on raw events.  For decade-scale spans, the
    repeated-median or k-random-pairs estimator bounds it linearly."""
    (events,) = load(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.datediff(
            F.to_date(F.date_trunc("day", "ts")), F.lit("1970-01-01").cast("date")
        ).alias("d"),
    ).agg(F.count(F.lit(1)).alias("n"))
    a = daily.select(
        "event_type", F.col("d").alias("d_a"), F.col("n").alias("n_a")
    )
    b = daily.select(
        F.col("event_type").alias("et_b"),
        F.col("d").alias("d_b"),
        F.col("n").alias("n_b"),
    )
    slopes = (
        a.join(b, (F.col("event_type") == F.col("et_b")) & (F.col("d_a") < F.col("d_b")))
        .select(
            "event_type",
            ((F.col("n_b") - F.col("n_a")) / (F.col("d_b") - F.col("d_a")).cast("double")).alias("s"),
        )
        .groupBy("event_type")
        .agg(F.median("s").alias("slope"))
    )
    return (
        daily.join(F.broadcast(slopes), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.any_value("slope"), 6).alias("slope_per_day"),
            F.round(F.median(F.col("n") - F.col("slope") * F.col("d")), 4).alias("intercept"),
        )
    )


@query(
    "agg_weighted_median",
    oracle="""
        WITH base AS (
            SELECT l_returnflag,
                   l_extendedprice AS price,
                   CAST(l_quantity AS BIGINT) AS w
            FROM lineitem
        ),
        cum AS (
            SELECT l_returnflag, price, w,
                   sum(w) OVER (PARTITION BY l_returnflag ORDER BY price
                                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cw,
                   sum(w) OVER (PARTITION BY l_returnflag) AS tw
            FROM base
        )
        SELECT l_returnflag,
               CAST(any_value(tw) AS BIGINT) AS total_weight,
               round(min(price), 2) AS weighted_median_price
        FROM cum
        WHERE 2 * cw >= tw
        GROUP BY l_returnflag
    """,
    tags=("agg", "stats", "robust"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact LOWER weighted median (smallest v with cumulative weight
    ≥ half the total): the volume-weighted "typical price" — a plain
    median treats a 1-unit and a 50-unit line item alike; this one
    answers what price the MEDIAN UNIT shipped at.

    The lower-median rule needs no interpolation, so the selection is
    pure integer comparison on exact bigint cumulative weights (RANGE
    frame ties accumulate together — duplicate prices cannot make the
    answer order-dependent), deterministic across engines.

    Scale: one shuffle on the group key; the cumulative window sorts
    within group — for 100 TB single-group medians, switch to the
    two-pass histogram narrowing of agg_quantile_histogram (same
    output contract)."""
    (lineitem,) = load(spark, sf_dir, "lineitem")
    base = lineitem.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("price")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("l_returnflag")
    cum = base.select(
        "l_returnflag",
        "price",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wt).alias("tw"),
    )
    return (
        cum.where(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.any_value("tw").cast("bigint").alias("total_weight"),
            F.round(F.min("price"), 2).alias("weighted_median_price"),
        )
    )

# Poisson(1) CDF thresholds scaled to 2^20 (floored) — the multiplicity
# lattice of the Poisson bootstrap, computed offline and inlined in BOTH
# engines so no exp()/factorial runs at query time.  The 2^20 base makes
# u's final modulus a power of two — zero modulo bias.
_POIS_TH = (385749, 771499, 964373, 1028665, 1044738, 1047952, 1048488, 1048565, 1048574, 1048575)
_BOOT_B = 32

# Three-round multiply-xor mixer over (id, replica) — MurmurHash-style
# finalization kept inside signed-64 range (pre-masking to 2^30 before
# each multiply).  Statistical check (Python, n=150k, B=32): per-replica
# n_eff mean 149909, stdev 360 vs the ideal Poisson sqrt(n)=387 — the
# one-round Knuth scramble alone collapsed the variance to 0.13x (a
# low-discrepancy sequence, not a hash) and carried mod-1e6 bias.
_MIX_SQL_SPARK = (
    "(((x % 1073741824) * 3266489917) % 4294967296)"
    .replace("x", "(y ^ (y div 8192))")
    .replace("y", "((((z ^ (z div 65536)) % 1073741824) * 2246822519) % 4294967296)")
    .replace("z", "(((id * {B} + r + 1) * 2654435761) % 4294967296)")
)
_MIX_SPARK = f"(({_MIX_SQL_SPARK} ^ ({_MIX_SQL_SPARK} div 65536)) % 1048576)"
_MIX_SQL_DUCK = (
    "(((x % 1073741824) * 3266489917) % 4294967296)"
    .replace("x", "xor(y, y // 8192)")
    .replace("y", "(((xor(z, z // 65536) % 1073741824) * 2246822519) % 4294967296)")
    .replace("z", "(((o.id * {B} + r.r + 1) * 2654435761) % 4294967296)")
)
_MIX_DUCK = f"(xor({_MIX_SQL_DUCK}, {_MIX_SQL_DUCK} // 65536) % 1048576)"


def _pois_case_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t} THEN {m}" for m, t in enumerate(_POIS_TH)
    )
    return f"CASE {branches} ELSE {len(_POIS_TH)} END"


@query(
    "stats_poisson_bootstrap_ci",
    oracle=f"""
        WITH o AS (
            SELECT o_orderkey AS id,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ),
        rep AS (
            SELECT r.r, o.id, o.cents,
                   {_MIX_DUCK.replace("{" + "B}", str(_BOOT_B))} AS u
            FROM o, UNNEST(range(0, {_BOOT_B})) AS r(r)
        ),
        m AS (
            SELECT r, id, cents, {_pois_case_sql("u")} AS mult FROM rep
        ),
        per AS (
            SELECT CAST(r AS BIGINT) AS replica,
                   CAST(sum(mult) AS BIGINT) AS n_eff,
                   CAST(floor(sum(mult * cents)
                        / CAST(sum(mult) AS DOUBLE)) AS BIGINT) AS mean_cents
            FROM m GROUP BY r
        ),
        ranked AS (
            SELECT *,
                   row_number() OVER (ORDER BY mean_cents, replica) AS rn_lo,
                   row_number() OVER (ORDER BY mean_cents DESC, replica DESC)
                       AS rn_hi
            FROM per
        )
        SELECT replica, n_eff, mean_cents,
               (SELECT mean_cents FROM ranked WHERE rn_lo = 2) AS ci_lo_cents,
               (SELECT mean_cents FROM ranked WHERE rn_hi = 2) AS ci_hi_cents
        FROM per
    """,
    tags=("stats", "sampling"),
)
def stats_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON BOOTSTRAP confidence interval for the mean order price
    (Chamandy et al. 2012, "Estimating Uncertainty for Massive Data
    Streams" — the bootstrap that actually runs distributed): instead of
    resampling n rows WITH replacement (a sequential operation), each
    row enters replica r with multiplicity ~ Poisson(1), which needs
    only a per-(row, replica) decision — embarrassingly parallel, one
    pass, no RNG state: the multiplicity comes from a deterministic
    three-round multiply-xor mix of (row id, replica) — integer-SQL in
    both engines, statistically vetted (see _MIX_SQL_SPARK notes) —
    quantized against Poisson(1) CDF thresholds inlined as integer
    literals over a power-of-two base (no modulo bias).

    Returns one row per replica (replica, n_eff, mean_cents) plus the
    ~94% interval [2nd smallest, 2nd largest] of the 32 replica means —
    exact integer order statistics, no percentile interpolation.

    Scale: the corpus is scanned ONCE, exploded ×B (B = 32 constant);
    per-replica partial aggregation is map-side combined; the CI is an
    order statistic over B rows (constant, driver-free via a tiny
    window)."""
    (orders,) = load(spark, sf_dir, "orders")
    o = orders.select(
        F.col("o_orderkey").alias("id"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    rep = o.select(
        "id",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("r"),
    )
    u = F.expr(_MIX_SPARK.replace("{B}", str(_BOOT_B)))
    mult = F.lit(len(_POIS_TH))
    for m in range(len(_POIS_TH) - 1, -1, -1):
        mult = F.when(u < _POIS_TH[m], F.lit(m)).otherwise(mult)
    per = (
        rep.withColumn("mult", mult)
        .groupBy("r")
        .agg(
            F.sum("mult").cast("bigint").alias("n_eff"),
            F.floor(
                F.sum(F.col("mult") * F.col("cents"))
                / F.sum("mult").cast("double")
            )
            .cast("bigint")
            .alias("mean_cents"),
        )
        .select(F.col("r").cast("bigint").alias("replica"), "n_eff", "mean_cents")
    )
    lo = Window.orderBy("mean_cents", "replica")
    hi = Window.orderBy(F.desc("mean_cents"), F.desc("replica"))
    ranked = per.withColumn("rn_lo", F.row_number().over(lo)).withColumn(
        "rn_hi", F.row_number().over(hi)
    )
    bounds = ranked.agg(
        F.max(F.when(F.col("rn_lo") == 2, F.col("mean_cents"))).alias(
            "ci_lo_cents"
        ),
        F.max(F.when(F.col("rn_hi") == 2, F.col("mean_cents"))).alias(
            "ci_hi_cents"
        ),
    )
    return per.crossJoin(F.broadcast(bounds))
