"""Scalar function coverage (SURVEY.md §2b: string/date/math/array/JSON/case).

All JVM-side built-ins — no Python UDFs anywhere in this module, so every
expression stays inside whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.tables import load


@query(
    "func_strings",
    oracle="""
        SELECT p_partkey,
               concat(p_brand, '-', p_type)         AS brand_type,
               substring(p_name, 1, 8)              AS name_prefix,
               upper(p_brand)                       AS brand_upper,
               CAST(length(p_name) AS BIGINT)       AS name_len,
               lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
               split_part(p_type, ' ', 1)           AS type_first_word,
               replace(p_brand, 'Brand#', 'B')      AS brand_short,
               CAST(contains(p_name, 'ol') AS INT)  AS has_ol
        FROM part
        WHERE p_partkey <= 500
    """,
    tags=("functions", "string"),
)
def func_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String battery: concat/substring/upper/length/lpad/split/replace/contains."""
    (part,) = load(spark, sf_dir, "part")
    return part.where(F.col("p_partkey") <= 500).select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit("-"), F.col("p_type")).alias("brand_type"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_first_word"),
        F.regexp_replace("p_brand", "Brand#", "B").alias("brand_short"),
        F.col("p_name").contains("ol").cast("int").alias("has_ol"),
    )


@query(
    "func_regexp",
    oracle="""
        SELECT p_partkey,
               regexp_extract(p_brand, '#(\\d+)', 1)             AS brand_num,
               CAST(regexp_matches(p_type, '^(ECONOMY|SMALL)') AS INT) AS is_cheap_class,
               regexp_replace(p_name, '[aeiou]', '', 'g')        AS name_novowels
        FROM part
        WHERE p_partkey <= 500
    """,
    tags=("functions", "regexp"),
)
def func_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp battery: extract with group, rlike match, global replace."""
    (part,) = load(spark, sf_dir, "part")
    return part.where(F.col("p_partkey") <= 500).select(
        "p_partkey",
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.col("p_type").rlike("^(ECONOMY|SMALL)").cast("int").alias("is_cheap_class"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowels"),
    )


@query(
    "func_dates",
    oracle="""
        SELECT CAST(year(o_orderdate) AS INT)    AS yr,
               CAST(quarter(o_orderdate) AS INT) AS qtr,
               count(*) AS order_count,
               min(CAST(date_trunc('month', o_orderdate) AS DATE)) AS first_month,
               max(CAST(o_orderdate + INTERVAL 30 DAY AS DATE))    AS max_due_date,
               round(avg(datediff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00')), 4) AS avg_age_days
        FROM orders
        GROUP BY 1, 2
    """,
    tags=("functions", "date"),
)
def func_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date battery: year/quarter extraction, date_trunc, interval add, datediff."""
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
        )
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.min(F.date_trunc("month", F.col("o_orderdate")).cast("date")).alias("first_month"),
            F.max(F.date_add(F.col("o_orderdate").cast("date"), 30)).alias("max_due_date"),
            F.round(
                F.avg(F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))), 4
            ).alias("avg_age_days"),
        )
    )


@query(
    "func_timestamps",
    oracle="""
        SELECT CAST(hour(ts) AS INT) AS hr,
               count(*) AS event_count,
               round(avg(CAST(minute(ts) AS DOUBLE)), 4) AS avg_minute,
               min(CAST(date_trunc('day', ts) AS DATE))  AS first_day,
               max(CAST(epoch(date_trunc('second', ts)) AS BIGINT)) AS max_epoch
        FROM events
        GROUP BY 1
    """,
    tags=("functions", "timestamp"),
)
def func_timestamps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp battery: hour/minute extraction, truncation, epoch seconds."""
    (events,) = load(spark, sf_dir, "events")
    return events.groupBy(F.hour("ts").alias("hr")).agg(
        F.count(F.lit(1)).alias("event_count"),
        F.round(F.avg(F.minute("ts").cast("double")), 4).alias("avg_minute"),
        F.min(F.date_trunc("day", F.col("ts")).cast("date")).alias("first_day"),
        F.max(F.unix_timestamp(F.date_trunc("second", F.col("ts")))).alias("max_epoch"),
    )


@query(
    "func_math",
    oracle="""
        SELECT p_partkey,
               round(p_retailprice, 1)             AS price_r1,
               abs(p_size - 25)                    AS size_dist,
               CAST(p_size * p_size AS BIGINT)     AS size_sq,
               round(ln(p_retailprice), 4)         AS price_ln,
               round(sqrt(CAST(p_size AS DOUBLE)), 4) AS size_sqrt,
               CAST(least(p_size, 25) AS BIGINT)    AS size_capped,
               CAST(greatest(p_size, 10) AS BIGINT) AS size_floored,
               p_size % 5                          AS size_mod,
               CAST(ceil(p_retailprice) AS BIGINT)  AS price_ceil,
               CAST(floor(p_retailprice) AS BIGINT) AS price_floor
        FROM part
        WHERE p_partkey <= 500
    """,
    tags=("functions", "math"),
)
def func_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery: round/abs/pow/ln/sqrt/least/greatest/mod/ceil/floor."""
    (part,) = load(spark, sf_dir, "part")
    return part.where(F.col("p_partkey") <= 500).select(
        "p_partkey",
        F.round(F.col("p_retailprice"), 1).alias("price_r1"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        (F.col("p_size") * F.col("p_size")).cast("bigint").alias("size_sq"),
        F.round(F.log(F.col("p_retailprice")), 4).alias("price_ln"),
        F.round(F.sqrt(F.col("p_size").cast("double")), 4).alias("size_sqrt"),
        F.least(F.col("p_size"), F.lit(25)).cast("bigint").alias("size_capped"),
        F.greatest(F.col("p_size"), F.lit(10)).cast("bigint").alias("size_floored"),
        (F.col("p_size") % 5).alias("size_mod"),
        F.ceil(F.col("p_retailprice")).alias("price_ceil"),
        F.floor(F.col("p_retailprice")).alias("price_floor"),
    )


@query(
    "func_arrays",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS BIGINT)                               AS dim,
               round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), 4) AS sq_norm,
               round(CAST(embedding[1] AS DOUBLE), 4)                       AS first_val,
               round(list_sum(CAST(embedding AS DOUBLE[])) / len(embedding), 4) AS mean_val,
               CAST(list_contains(list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(x > 0.9 AS INT)), 1) AS INT) AS has_big
        FROM embeddings
        WHERE vec_id <= 200
    """,
    tags=("functions", "array"),
)
def func_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array battery over embeddings: size, higher-order aggregate/transform,
    element access, containment — all JVM-side (F.aggregate/F.transform), the
    pattern the similarity operators build on."""
    (embeddings,) = load(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return embeddings.where(F.col("vec_id") <= 200).select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x), 4
        ).alias("sq_norm"),
        F.round(F.col("embedding").getItem(0).cast("double"), 4).alias("first_val"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x) / F.size("embedding"), 4
        ).alias("mean_val"),
        F.array_contains(
            F.transform(dbl, lambda x: (x > 0.9).cast("int")), 1
        ).cast("int").alias("has_big"),
    )


@query(
    "func_json",
    oracle="""
        SELECT event_type,
               count(*) AS event_count,
               round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
               max(CAST(json_extract_string(props, '$.k') AS INTEGER))           AS max_k
        FROM events
        GROUP BY event_type
    """,
    tags=("functions", "json"),
)
def func_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props payload column (get_json_object)."""
    (events,) = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("event_count"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "func_date_parse_roundtrip",
    oracle="""
        SELECT fmt AS date_str,
               CAST(strptime(fmt, '%Y-%m-%d') AS DATE) AS parsed_date,
               count(*) AS cnt
        FROM (SELECT strftime(o_orderdate, '%Y-%m-%d') AS fmt FROM orders)
        GROUP BY fmt
        HAVING count(*) >= 20
    """,
    tags=("functions", "date"),
)
def func_date_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String↔date round trip: date_format to render, to_date to parse back
    (the csv/json ingestion path for date columns)."""
    (orders,) = load(spark, sf_dir, "orders")
    fmt = F.date_format("o_orderdate", "yyyy-MM-dd")
    return (
        orders.select(fmt.alias("date_str"))
        .groupBy("date_str")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 20)
        .select(
            "date_str",
            F.to_date("date_str", "yyyy-MM-dd").alias("parsed_date"),
            "cnt",
        )
    )


@query(
    "func_conditional",
    oracle="""
        SELECT CASE
                 WHEN o_totalprice >= 300000 THEN 'large'
                 WHEN o_totalprice >= 100000 THEN 'medium'
                 ELSE 'small'
               END AS size_class,
               coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
               count(*) AS cnt,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY 1, 2
    """,
    tags=("functions", "conditional"),
)
def func_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / nullif / coalesce battery."""
    (orders,) = load(spark, sf_dir, "orders")
    size_class = (
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
    )
    status_norm = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING"))
    return orders.groupBy(
        size_class.alias("size_class"), status_norm.alias("status_norm")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "filter_predicates",
    oracle="""
        SELECT p_brand, count(*) AS cnt
        FROM part
        WHERE p_name LIKE '%ol%'
          AND p_size BETWEEN 10 AND 40
          AND p_brand IN ('Brand#12', 'Brand#14', 'Brand#15', 'Brand#2', 'Brand#23')
          AND p_type NOT LIKE 'PROMO%'
        GROUP BY p_brand
    """,
    tags=("filter",),
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate battery: LIKE, BETWEEN, IN, NOT LIKE — all pushdown-eligible."""
    (part,) = load(spark, sf_dir, "part")
    return (
        part.where(
            F.col("p_name").like("%ol%")
            & F.col("p_size").between(10, 40)
            & F.col("p_brand").isin("Brand#12", "Brand#14", "Brand#15", "Brand#2", "Brand#23")
            & ~F.col("p_type").like("PROMO%")
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "projection_cast",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderkey AS VARCHAR)     AS key_str,
               CAST(o_custkey AS INT)          AS cust_int,
               CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
               CAST(o_orderdate AS DATE)       AS order_date
        FROM orders
        WHERE o_orderkey <= 1000
    """,
    tags=("projection", "cast"),
)
def projection_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + explicit casts (bigint→string, bigint→int, double→bigint
    via floor — Spark ANSI cast truncates where DuckDB rounds, so the floor
    is explicit — timestamp→date)."""
    (orders,) = load(spark, sf_dir, "orders")
    return orders.where(F.col("o_orderkey") <= 1000).select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_custkey").cast("int").alias("cust_int"),
        F.floor(F.col("o_totalprice")).alias("price_floor"),
        F.col("o_orderdate").cast("date").alias("order_date"),
    )


@query(
    "func_edit_distance",
    oracle="""
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               levenshtein(substr(a.text, 1, 30), substr(b.text, 1, 30)) AS edit30
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    """,
    tags=("functions", "text"),
)
def func_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit distance between consecutive documents' 30-char
    prefixes — the string-similarity function surface (title-dedup shape).
    Bounded prefixes matter: levenshtein is O(len^2) per pair, so cap the
    comparison width before joining, not after.
    """
    (documents,) = load(spark, sf_dir, "documents")
    a = documents.select(F.col("doc_id").alias("id_a"), F.col("text").alias("t_a"))
    b = documents.select(F.col("doc_id").alias("id_b"), F.col("text").alias("t_b"))
    return (
        a.join(b, b["id_b"] == a["id_a"] + 1)
        .select(
            "id_a",
            "id_b",
            F.levenshtein(F.substring("t_a", 1, 30), F.substring("t_b", 1, 30))
            .cast("bigint")
            .alias("edit30"),
        )
    )


@query(
    "func_variant_json",
    oracle="""
        SELECT CAST(json_extract(props, '$.k') AS INTEGER) // 10 AS k_decile,
               count(*) AS n,
               CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum
        FROM events
        GROUP BY 1
    """,
    tags=("functions", "json", "variant"),
)
def func_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType path: parse_json once into a Variant column,
    then typed variant_get extraction — the modern semi-structured surface
    (binary-encoded, ~an order of magnitude faster to re-extract than
    repeated get_json_object string parsing, and type-safe).
    """
    from aws_genaric_datapipeline_spark.tables import load as _load

    (events,) = _load(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        events.select(k.alias("k"))
        .groupBy(F.floor(F.col("k") / 10).cast("int").alias("k_decile"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").cast("bigint").alias("k_sum"))
    )


@query(
    "func_try_arithmetic",
    oracle="""
        WITH per AS (
            SELECT user_id, event_type, value,
                   CAST(json_extract(props, '$.k') AS BIGINT) AS k
            FROM events
        ),
        agg AS (
            SELECT user_id,
                   CAST(count(*) FILTER (event_type = 'view')  AS BIGINT) AS views,
                   CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS clicks,
                   round(SUM(value / NULLIF(k, 0)), 4) AS risky_ratio_sum
            FROM per GROUP BY user_id
        )
        SELECT user_id, views, clicks,
               round(clicks / NULLIF(views, 0), 4) AS click_rate,
               risky_ratio_sum
        FROM agg
    """,
    tags=("functions", "ansi"),
)
def func_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic with the try_* family — Spark 4 runs ANSI mode
    by DEFAULT, so a plain value/0 THROWS mid-job instead of returning
    null (the silent pre-4 behavior): production aggregations over dirty
    denominators must reach for try_divide, which yields NULL exactly
    where legacy mode yielded null but without disabling overflow
    protection everywhere else.  Two real shapes: a row-level ratio
    against a sometimes-zero JSON field (NULLs skip the SUM, matching
    SQL aggregate semantics) and an aggregate-level conversion rate for
    users with zero views.  The oracle replays NULL-on-zero with
    NULLIF denominators — the portable spelling of the same semantics.
    All JVM expressions, whole-stage codegen intact."""
    (events,) = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    per = events.select(
        "user_id",
        "event_type",
        "value",
        F.try_divide(F.col("value"), k).alias("vk"),
    )
    agg = per.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("views"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
        F.round(F.sum("vk"), 4).alias("risky_ratio_sum"),
    )
    return agg.select(
        "user_id",
        "views",
        "clicks",
        F.round(F.try_divide(F.col("clicks"), F.col("views")), 4).alias("click_rate"),
        "risky_ratio_sum",
    )


@query(
    "func_url_parse",
    oracle="""
        WITH u AS (
            SELECT doc_id,
                   'https://' || source || '.example.com/doc/' || doc_id
                       || '?lang=' || lang AS url
            FROM documents
        )
        SELECT doc_id,
               regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
               regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1) AS path,
               regexp_extract(url, 'lang=([^&#]*)', 1) AS lang_param
        FROM u
    """,
    tags=("functions", "string"),
)
def func_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with the parse_url built-in — the source-
    attribution / host-level-dedup key extraction every web-scraped
    corpus runs (host grouping for per-domain rate stats, path for
    near-dup URL canonicalization, query params for tracking-noise
    stripping).  The URL is constructed deterministically from table
    columns so the oracle replays HOST/PATH/QUERY(lang) with anchored
    regexes — the portable spelling of the same decomposition.  JVM
    expression, codegen intact; at scale this is a map-only projection."""
    (documents,) = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return documents.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@query(
    "func_collation_group",
    oracle="""
        WITH mixed AS (
            SELECT c_custkey,
                   CASE WHEN c_custkey % 3 = 0 THEN lower(c_mktsegment)
                        WHEN c_custkey % 3 = 1 THEN c_mktsegment
                        ELSE upper(substr(c_mktsegment, 1, 1))
                             || lower(substr(c_mktsegment, 2, 100)) END AS seg
            FROM customer
        )
        SELECT min(seg) AS segment,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(count(DISTINCT seg) AS BIGINT) AS n_case_variants
        FROM mixed
        GROUP BY lower(seg)
    """,
    tags=("functions", "strings", "collation", "spark4"),
)
def func_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 string COLLATIONS: group a mixed-case segment column under
    the UTF8_LCASE collation — case-insensitive equality expressed as a
    COLUMN TYPE property instead of scattering lower() through every
    comparison (the collation survives joins, aggs, and set ops on the
    column).  The fixture derives three case variants per segment from
    the key; grouping by the collated column must collapse them.  The
    deterministic representative is min(original) (the group key itself
    is whichever variant Spark surfaces — never emit it); the oracle
    replays with lower()-keyed grouping, equivalent on this data.

    Scale: collation comparisons run inside codegen like any string
    equality (ICU key derivation per comparison); the aggregate is an
    ordinary partial+final hash agg on the collated key."""
    (customer,) = load(spark, sf_dir, "customer")
    seg = (
        F.when(F.col("c_custkey") % 3 == 0, F.lower("c_mktsegment"))
        .when(F.col("c_custkey") % 3 == 1, F.col("c_mktsegment"))
        .otherwise(F.initcap(F.lower("c_mktsegment")))
    )
    mixed = customer.select(seg.alias("seg"))
    return (
        mixed.groupBy(F.expr("collate(seg, 'UTF8_LCASE')").alias("k"))
        .agg(
            F.min("seg").alias("segment"),
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.countDistinct("seg").cast("bigint").alias("n_case_variants"),
        )
        .drop("k")
    )
