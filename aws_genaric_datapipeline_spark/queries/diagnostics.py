"""Data-diagnostics queries: the profiling a pipeline runs BEFORE choosing
a physical strategy at scale — key-skew reports drive the salting /
AQE-skew-join decisions in operators/skew.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.tables import load


@query(
    "diag_key_skew",
    oracle="""
        WITH counts AS (
            SELECT user_id, count(*) AS cnt
            FROM events GROUP BY user_id
        ),
        stats AS (
            SELECT count(*) AS n_keys, sum(cnt) AS n_rows, max(cnt) AS max_cnt
            FROM counts
        )
        SELECT user_id, cnt,
               round(cnt / CAST(n_rows AS DOUBLE), 4) AS share,
               round(cnt * n_keys / CAST(n_rows AS DOUBLE), 4) AS skew_factor
        FROM (SELECT *, row_number() OVER (ORDER BY cnt DESC, user_id) AS rn
              FROM counts) c
        CROSS JOIN stats
        WHERE rn <= 10
    """,
    tags=("diagnostics", "skew"),
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew report: the 10 heaviest `user_id` keys with their
    row share and skew factor (key count ÷ mean key count).  A skew factor
    ≫ 1 on a join key is the trigger for salting (operators/skew.py) or
    AQE skew-join handling; running this profile first is how the choice
    is made from data, not guesswork.

    Scale: one groupBy shuffle on the key, a 1-row global stats frame
    broadcast via crossJoin, and a driver-side top-10 (TakeOrdered) — no
    full sort."""
    (events,) = load(spark, sf_dir, "events")
    counts = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
    )
    top = (
        counts.withColumn(
            "rn", F.row_number().over(Window.orderBy(F.desc("cnt"), "user_id"))
        )
        .where(F.col("rn") <= 10)
        .drop("rn")
    )
    return top.crossJoin(F.broadcast(stats)).select(
        "user_id",
        "cnt",
        F.round(F.col("cnt") / F.col("n_rows").cast("double"), 4).alias("share"),
        F.round(
            F.col("cnt") * F.col("n_keys") / F.col("n_rows").cast("double"), 4
        ).alias("skew_factor"),
    )


_PROFILE_COLS = ("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_shipdate")


@query(
    "diag_table_profile",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS column_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_value,
               CAST(max({c}) AS VARCHAR) AS max_value
        FROM lineitem
        """
        for c in _PROFILE_COLS
    ),
    tags=("diagnostics",),
)
def diag_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profiling — the stats pass a pipeline runs
    after ingest to drive planning (broadcast thresholds, skew checks,
    partition sizing) and data-quality review: per column, row/null/
    distinct counts and min/max (stringified for a uniform long-format
    row).  TWO distributed aggregates: the multi-distinct runs ALONE
    (Catalyst's Expand rewrite replicates every carried column into each
    distinct projection, so fusing min/max/count into the same aggregate
    measured ~4× slower than two passes at sf0.1), and the plain
    min/max/null pass is a single partial+final reduce; their 1-row
    results cross-join and explode into the long format — no per-column
    scans, no driver loops."""
    (lineitem,) = load(spark, sf_dir, "lineitem")
    distincts = lineitem.agg(
        *[F.countDistinct(c).cast("bigint").alias(f"nd_{c}") for c in _PROFILE_COLS]
    )
    plains = lineitem.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        *[(F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"nn_{c}") for c in _PROFILE_COLS],
        *[F.min(c).cast("string").alias(f"mn_{c}") for c in _PROFILE_COLS],
        *[F.max(c).cast("string").alias(f"mx_{c}") for c in _PROFILE_COLS],
    )
    wide = distincts.crossJoin(plains)
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("n_rows"),
            F.col(f"nn_{c}").alias("n_nulls"),
            F.col(f"nd_{c}").alias("n_distinct"),
            F.col(f"mn_{c}").alias("min_value"),
            F.col(f"mx_{c}").alias("max_value"),
        )
        for c in _PROFILE_COLS
    ]
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


@query(
    "privacy_k_anonymity",
    oracle="""
        WITH cls AS (
            SELECT c_nationkey, c_mktsegment, count(*) AS class_size
            FROM customer GROUP BY 1, 2
        )
        SELECT count(*) AS n_classes,
               min(class_size) AS k_anonymity,
               count(*) FILTER (class_size < 5) AS classes_below_5,
               CAST(coalesce(sum(class_size) FILTER (class_size < 5), 0)
                    AS BIGINT) AS rows_at_risk,
               round(coalesce(sum(class_size) FILTER (class_size < 5), 0)
                     / CAST(sum(class_size) AS DOUBLE), 4) AS risk_fraction
        FROM cls
    """,
    tags=("privacy", "diagnostics"),
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier pair (nation, market
    segment): the dataset's k is the smallest equivalence-class size;
    rows in classes below k=5 are re-identification risks that a release
    pipeline must suppress or generalize (Sweeney 2002 — the standard
    pre-release privacy gate alongside PII redaction).

    Scale: one grouped count over the quasi-identifier (class-cardinality-
    bounded output) and one scalar roll-up — the audit never shuffles
    anything wider than the QI columns."""
    (customer,) = load(spark, sf_dir, "customer")
    cls = customer.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("class_size")
    )
    small = F.col("class_size") < 5
    return cls.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("class_size").alias("k_anonymity"),
        F.count_if(small).alias("classes_below_5"),
        F.coalesce(
            F.sum(F.when(small, F.col("class_size"))), F.lit(0).cast("bigint")
        ).alias("rows_at_risk"),
        F.round(
            F.coalesce(
                F.sum(F.when(small, F.col("class_size"))),
                F.lit(0).cast("bigint"),
            )
            / F.sum("class_size").cast("double"),
            4,
        ).alias("risk_fraction"),
    )


@query(
    "privacy_l_diversity",
    oracle="""
        WITH cls AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(floor(c_acctbal / 1000) AS BIGINT) AS sens,
                   count(*) AS n
            FROM customer GROUP BY 1, 2, 3
        ),
        per AS (
            SELECT c_nationkey, c_mktsegment,
                   count(*) AS l_distinct,
                   sum(n) AS class_size,
                   max(n) AS max_freq
            FROM cls GROUP BY 1, 2
        )
        SELECT CAST(count(*) AS BIGINT) AS n_classes,
               CAST(min(l_distinct) AS BIGINT) AS l_diversity,
               CAST(count(*) FILTER (l_distinct < 3) AS BIGINT)
                   AS classes_below_3,
               CAST(coalesce(sum(class_size) FILTER (l_distinct < 3), 0)
                    AS BIGINT) AS rows_at_risk,
               CAST(max(CAST(floor(max_freq * 10000.0 / class_size)
                    AS BIGINT)) AS BIGINT) AS worst_disclosure_bp
        FROM per
    """,
    tags=("privacy", "diagnostics"),
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala 2007), the step beyond
    k-anonymity: a class can be large (k-safe) yet still leak if every
    member shares the SAME sensitive value.  Sensitive attribute here =
    account-balance band (floor(acctbal/1000)); ``l_diversity`` is the
    minimum distinct sensitive values in any quasi-identifier class,
    and ``worst_disclosure_bp`` the highest within-class modal
    frequency in basis points (integer-exact: values < 2^53, so the
    float divide + floor is bit-identical across engines).

    Scale: two grouped counts, both keyed no wider than QI + band —
    same shuffle posture as privacy_k_anonymity."""
    (customer,) = load(spark, sf_dir, "customer")
    cls = customer.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("sens"),
    ).agg(F.count(F.lit(1)).alias("n"))
    per = cls.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("l_distinct"),
        F.sum("n").alias("class_size"),
        F.max("n").alias("max_freq"),
    )
    low = F.col("l_distinct") < 3
    return per.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("l_distinct").alias("l_diversity"),
        F.count_if(low).alias("classes_below_3"),
        F.coalesce(
            F.sum(F.when(low, F.col("class_size"))), F.lit(0).cast("bigint")
        ).alias("rows_at_risk"),
        F.max(
            F.floor(F.col("max_freq") * 10000.0 / F.col("class_size")).cast(
                "bigint"
            )
        ).alias("worst_disclosure_bp"),
    )


@query(
    "privacy_t_closeness",
    oracle="""
        WITH cls AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(floor(c_acctbal / 1000) AS BIGINT) AS sens,
                   count(*) AS c
            FROM customer GROUP BY 1, 2, 3
        ),
        classes AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(sum(c) AS BIGINT) AS class_size
            FROM cls GROUP BY 1, 2
        ),
        bands AS (SELECT sens, CAST(sum(c) AS BIGINT) AS g FROM cls GROUP BY 1),
        tot AS (
            SELECT CAST(sum(g) AS BIGINT) AS N,
                   CAST(count(*) AS BIGINT) AS m
            FROM bands
        ),
        grid AS (
            SELECT cl.c_nationkey, cl.c_mktsegment, cl.class_size,
                   b.sens, b.g, coalesce(x.c, 0) AS c
            FROM classes cl CROSS JOIN bands b
            LEFT JOIN cls x ON x.c_nationkey = cl.c_nationkey
                           AND x.c_mktsegment = cl.c_mktsegment
                           AND x.sens = b.sens
        ),
        cum AS (
            SELECT c_nationkey, c_mktsegment, class_size,
                   sum(CAST(c AS BIGINT) * (SELECT N FROM tot)
                       - g * class_size)
                       OVER (PARTITION BY c_nationkey, c_mktsegment
                             ORDER BY sens
                             ROWS UNBOUNDED PRECEDING) AS d
            FROM grid
        ),
        emd AS (
            SELECT c_nationkey, c_mktsegment, class_size,
                   CAST(floor(1e6 * (CAST(sum(abs(d)) AS DOUBLE)
                        / (CAST((SELECT N FROM tot) AS DOUBLE) * class_size
                           * greatest((SELECT m FROM tot) - 1, 1))))
                       AS BIGINT) AS emd_e6
            FROM cum GROUP BY 1, 2, 3
        )
        SELECT CAST(count(*) AS BIGINT) AS n_classes,
               CAST(max(emd_e6) AS BIGINT) AS worst_emd_e6,
               CAST(count(*) FILTER (emd_e6 > 200000) AS BIGINT)
                   AS classes_above_02,
               CAST(coalesce(sum(class_size) FILTER (emd_e6 > 200000), 0)
                    AS BIGINT) AS rows_at_risk
        FROM emd
    """,
    tags=("privacy", "diagnostics"),
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    rung of the release-privacy ladder after k-anonymity and l-diversity:
    a class can be large AND diverse yet still leak when its sensitive
    DISTRIBUTION deviates from the table-wide one.  Per quasi-identifier
    class, the ordered-attribute Earth Mover's Distance between the
    class's account-balance-band distribution and the global one:
    EMD = Σ_i |Σ_{j≤i} (p_j − q_j)| / (m − 1), computed on the
    cross-multiplied INTEGER lattice c_j·N − g_j·n (exact — no per-cell
    float fractions) with one final quantized division to emd_e6; t is
    the worst class EMD, with counts/rows above the t = 0.2 release
    threshold.

    Scale: one grouped count keyed (QI, band), a class×band grid bounded
    by |classes|·m (broadcast band histogram), one partitioned running
    sum — nothing shuffles wider than the QI columns."""
    from pyspark.sql import Window

    (customer,) = load(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("sens")
    cls = customer.groupBy("c_nationkey", "c_mktsegment", band).agg(
        F.count(F.lit(1)).alias("c")
    )
    classes = cls.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("c").alias("class_size")
    )
    bands = cls.groupBy("sens").agg(F.sum("c").alias("g"))
    tot = bands.agg(
        F.sum("g").alias("N"), F.count(F.lit(1)).cast("bigint").alias("m")
    )
    grid = (
        classes.crossJoin(F.broadcast(bands))
        .join(cls, ["c_nationkey", "c_mktsegment", "sens"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    w = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("sens")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.withColumn(
        "d", F.sum(F.col("c") * F.col("N") - F.col("g") * F.col("class_size")).over(w)
    )
    emd = cum.groupBy("c_nationkey", "c_mktsegment", "class_size").agg(
        F.floor(
            F.lit(1e6)
            * (
                F.sum(F.abs("d")).cast("double")
                / (
                    F.first("N").cast("double")
                    * F.first("class_size")
                    * F.greatest(F.first("m") - 1, F.lit(1))
                )
            )
        )
        .cast("bigint")
        .alias("emd_e6"),
    )
    risky = F.col("emd_e6") > 200000
    return emd.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.max("emd_e6").alias("worst_emd_e6"),
        F.count_if(risky).alias("classes_above_02"),
        F.coalesce(
            F.sum(F.when(risky, F.col("class_size"))), F.lit(0).cast("bigint")
        ).alias("rows_at_risk"),
    )


@query(
    "dq_dynamic_rules",
    oracle="""
        WITH rules(rule_id, col_name, op, lo, hi) AS (VALUES
            (1, 'o_totalprice',   'range',    1000.0, 450000.0),
            (2, 'o_totalprice',   'not_null', NULL::DOUBLE, NULL::DOUBLE),
            (3, 'o_custkey',      'range',    1.0, 100.0),
            (4, 'o_orderkey',     'not_null', NULL::DOUBLE, NULL::DOUBLE)
        ),
        melted AS (
            SELECT 'o_totalprice' AS col_name,
                   CAST(o_totalprice AS DOUBLE) AS v FROM orders
            UNION ALL
            SELECT 'o_custkey', CAST(o_custkey AS DOUBLE) FROM orders
            UNION ALL
            SELECT 'o_orderkey', CAST(o_orderkey AS DOUBLE) FROM orders
        )
        SELECT r.rule_id, r.col_name, r.op,
               count(*) AS n_checked,
               count(*) FILTER (
                   CASE r.op
                        WHEN 'not_null' THEN m.v IS NULL
                        WHEN 'range' THEN m.v IS NOT NULL
                             AND (m.v < r.lo OR m.v > r.hi)
                   END) AS n_violations
        FROM melted m JOIN rules r USING (col_name)
        GROUP BY r.rule_id, r.col_name, r.op
    """,
    tags=("diagnostics", "quality"),
)
def dq_dynamic_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rules-as-DATA quality engine: the check catalog is a DataFrame
    (rule_id, column, op, bounds) — the config-driven shape of the
    reference pipeline, where adding a check is a config row, not a code
    change.  Checked columns melt to (col, value) long form once; the
    rule table broadcasts into the melt; each op family (not_null, range)
    is one CASE arm evaluated data-driven.

    Scale: ONE pass over the fact table produces the melt (|cols| rows
    per input row, column-pruned to the checked columns), the rule join
    is broadcast, and the output is |rules| rows — the per-rule counts
    ride the same aggregation (observe-style), so N rules never mean N
    scans."""
    (orders,) = load(spark, sf_dir, "orders")
    rules = spark.createDataFrame(
        [
            (1, "o_totalprice", "range", 1000.0, 450000.0),
            (2, "o_totalprice", "not_null", None, None),
            (3, "o_custkey", "range", 1.0, 100.0),
            (4, "o_orderkey", "not_null", None, None),
        ],
        "rule_id int, col_name string, op string, lo double, hi double",
    )
    cols = ["o_totalprice", "o_custkey", "o_orderkey"]
    melted = orders.select(
        F.expr(
            "stack({n}, {args}) AS (col_name, v)".format(
                n=len(cols),
                args=", ".join(
                    f"'{c}', CAST({c} AS DOUBLE)" for c in cols
                ),
            )
        )
    )
    violation = (
        F.when(F.col("op") == "not_null", F.col("v").isNull())
        .when(
            F.col("op") == "range",
            F.col("v").isNotNull()
            & ((F.col("v") < F.col("lo")) | (F.col("v") > F.col("hi"))),
        )
    )
    return (
        melted.join(F.broadcast(rules), "col_name")
        .groupBy("rule_id", "col_name", "op")
        .agg(
            F.count(F.lit(1)).alias("n_checked"),
            F.count_if(violation).alias("n_violations"),
        )
    )


@query(
    "privacy_pseudonymize_join",
    oracle="""
        WITH c AS (
            SELECT md5('cust:' || CAST(c_custkey AS VARCHAR)) AS cust_sid,
                   c_mktsegment
            FROM customer
        ),
        o AS (
            SELECT md5('cust:' || CAST(o_custkey AS VARCHAR)) AS cust_sid,
                   o_totalprice
            FROM orders
        )
        SELECT c.c_mktsegment AS mktsegment,
               count(DISTINCT c.cust_sid) AS n_customers,
               count(o.cust_sid) AS n_orders,
               round(sum(o.o_totalprice), 2) AS total_price
        FROM c LEFT JOIN o ON o.cust_sid = c.cust_sid
        GROUP BY c.c_mktsegment
    """,
    tags=("privacy", "diagnostics"),
)
def privacy_pseudonymize_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudonymization with preserved referential
    integrity: the natural key is replaced by a salted-md5 surrogate in
    BOTH tables ('cust:' domain prefix prevents cross-domain join
    collisions, e.g. a customer id colliding with an order id), and the
    segment-level analytics still reconcile through the surrogate join —
    the release-pipeline pattern where analysts never see raw keys but
    aggregates stay exact.  At production scale the salt is a secret from
    a vault, not a literal; the plumbing (keyed hash, domain separation,
    surrogate joins) is what this verifies."""
    (customer, orders) = load(spark, sf_dir, "customer", "orders")

    def sid(col):
        return F.md5(F.concat(F.lit("cust:"), col.cast("string")))

    c = customer.select(
        sid(F.col("c_custkey")).alias("cust_sid"), "c_mktsegment"
    )
    o = orders.select(
        sid(F.col("o_custkey")).alias("cust_sid"), "o_totalprice"
    )
    return (
        c.join(o, "cust_sid", "left")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count_distinct("cust_sid").alias("n_customers"),
            F.count("o_totalprice").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@query(
    "dq_benford_first_digit",
    oracle="""
        WITH cents AS (
            SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x
            FROM orders WHERE o_totalprice > 0
        ),
        digits AS (
            SELECT CAST(substr(CAST(x AS VARCHAR), 1, 1) AS INT) AS d
            FROM cents
        ),
        obs AS (SELECT d, count(*) AS observed FROM digits GROUP BY d),
        tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM obs)
        SELECT CAST(g.d AS INT) AS first_digit,
               CAST(coalesce(o.observed, 0) AS BIGINT) AS observed,
               round(t.n * log10(1.0 + (1.0::DOUBLE) / CAST(g.d AS INT)), 2) AS expected,
               round(coalesce(o.observed, 0)
                     / CAST(t.n AS DOUBLE)
                     - log10(1.0 + (1.0::DOUBLE) / CAST(g.d AS INT)), 4) AS deviation
        FROM (SELECT unnest(range(1, 10)) AS d) g
        LEFT JOIN obs o ON o.d = g.d
        CROSS JOIN tot t
    """,
    tags=("diagnostics", "quality"),
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: observed leading-digit counts
    vs the log10(1 + 1/d) expectation — the classic synthetic-data /
    fraud / unit-mixup tripwire (organically-grown monetary amounts
    follow Benford; uniform generators and fabricated figures do not).
    The leading digit is extracted from the EXACT integer cents rendered
    as a string (bigint → text is identical across engines; float
    formatting is not), so the digit histogram is bit-deterministic.

    Scale: one narrow map + a 9-bucket aggregation — nothing wider than
    a digit ever shuffles."""
    (orders,) = load(spark, sf_dir, "orders")
    digits = orders.where(F.col("o_totalprice") > 0).select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("d")
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).alias("observed"))
    tot = obs.agg(F.sum("observed").alias("n"))
    grid = spark.range(1, 10).select(F.col("id").cast("int").alias("first_digit"))
    p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("first_digit"))
    return (
        grid.join(obs, grid["first_digit"] == obs["d"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "first_digit",
            F.coalesce("observed", F.lit(0)).cast("bigint").alias("observed"),
            F.round(F.col("n") * p, 2).alias("expected"),
            F.round(
                F.coalesce("observed", F.lit(0)) / F.col("n").cast("double")
                - p,
                4,
            ).alias("deviation"),
        )
    )


@query(
    "diag_join_cardinality_cms",
    oracle="""
        WITH ska AS (
            SELECT row_j, pos, count(*) AS c FROM (
                SELECT 0 AS row_j,
                       ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 256 AS pos
                FROM events
                UNION ALL
                SELECT 1, ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 9, 8))::BIGINT % 256
                FROM events
            ) GROUP BY row_j, pos
        ),
        skb AS (
            SELECT row_j, pos, count(*) AS c FROM (
                SELECT 0 AS row_j,
                       ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT % 256 AS pos
                FROM orders
                UNION ALL
                SELECT 1, ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 9, 8))::BIGINT % 256
                FROM orders
            ) GROUP BY row_j, pos
        ),
        dots AS (
            SELECT a.row_j, sum(a.c * b.c) AS dot
            FROM ska a JOIN skb b ON a.row_j = b.row_j AND a.pos = b.pos
            GROUP BY a.row_j
        ),
        est AS (SELECT min(dot) AS cms_join_estimate FROM dots),
        ex AS (
            SELECT count(*) AS exact_join_rows
            FROM events e JOIN orders o ON e.user_id = o.o_custkey
        )
        SELECT CAST(exact_join_rows AS BIGINT) AS exact_join_rows,
               CAST(cms_join_estimate AS BIGINT) AS cms_join_estimate,
               CAST(cms_join_estimate - exact_join_rows AS BIGINT) AS overcount,
               cms_join_estimate >= exact_join_rows AS never_undercounts
        FROM ex, est
    """,
    tags=("diagnostics", "sketch"),
)
def diag_join_cardinality_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join cardinality estimation from count-min inner products
    (Cormode/Muthukrishnan §4.3): |events ⋈ orders on user=cust| is
    upper-bounded by each CMS row's counter dot-product, and the min
    over rows is the planner-grade estimate — computed from two
    constant-size grids WITHOUT running the join.  The exact join count
    rides along so the oracle verifies both the grids (rebuilt cell by
    cell from md5 windows) and the never-undercounts contract."""
    from aws_genaric_datapipeline_spark.operators.sketches import (
        cms_inner_product,
        cms_sketch,
    )

    events, orders = load(spark, sf_dir, "events", "orders")
    ska = cms_sketch(events, "user_id", depth=2, width=256)
    skb = cms_sketch(orders, "o_custkey", depth=2, width=256)
    est = cms_inner_product(ska, skb)
    exact = (
        events.select("user_id")
        .join(orders.select("o_custkey"), F.col("user_id") == F.col("o_custkey"))
        .agg(F.count(F.lit(1)).alias("exact_join_rows"))
    )
    return exact.crossJoin(F.broadcast(est)).select(
        F.col("exact_join_rows").cast("bigint"),
        F.col("cms_join_estimate").cast("bigint"),
        (F.col("cms_join_estimate") - F.col("exact_join_rows"))
        .cast("bigint")
        .alias("overcount"),
        (F.col("cms_join_estimate") >= F.col("exact_join_rows")).alias(
            "never_undercounts"
        ),
    )


@query(
    "layout_range_partition_bounds",
    oracle="""
        WITH s AS (
            SELECT o_totalprice AS k, o_orderkey AS id
            FROM orders
            WHERE ((o_orderkey * 2654435761) % 4294967296) % 10000 < 500
        ),
        r AS (
            SELECT k, row_number() OVER (ORDER BY k, id) AS rn,
                   count(*) OVER () AS c
            FROM s
        ),
        b AS (
            SELECT k AS bound FROM r
            WHERE rn IN (SELECT CAST(ceil(i * c / 8.0) AS BIGINT)
                         FROM range(1, 8) AS t(i), (SELECT DISTINCT c FROM r))
        ),
        assigned AS (
            SELECT (SELECT count(*) FROM b WHERE o.o_totalprice > b.bound)
                       AS range_id,
                   o.o_totalprice AS k
            FROM orders o
        )
        SELECT CAST(range_id AS BIGINT) AS range_id,
               CAST(count(*) AS BIGINT) AS n_rows,
               min(k) AS min_key,
               max(k) AS max_key
        FROM assigned
        GROUP BY range_id
    """,
    tags=("diagnostics", "layout"),
)
def layout_range_partition_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible range-partition planning (operators/layout.py
    range_partition_bounds): bounds = discrete quantiles of a
    content-hash sample of orders keyed on o_totalprice, then a one-scan
    assignment of every row via a broadcast bounds array, reported as
    per-range counts + key spans.  Deterministic where
    repartitionByRange's RNG sampling is not — the property that makes a
    100 TB layout job idempotent across retries (and lets the oracle
    replay bound selection value-for-value: discrete quantiles are data
    values, never interpolated floats)."""
    from aws_genaric_datapipeline_spark.operators.layout import (
        range_partition_bounds,
    )

    (orders,) = load(spark, sf_dir, "orders")
    return range_partition_bounds(
        orders, "o_totalprice", "o_orderkey", num_ranges=8, sample_bp=500
    )


@query(
    "privacy_erasure_cascade",
    oracle="""
        WITH victims AS (
            SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_before,
               CAST(count(*) FILTER (user_id NOT IN (SELECT user_id FROM victims))
                    AS BIGINT) AS n_after,
               CAST(count(*) FILTER (user_id IN (SELECT user_id FROM victims))
                    AS BIGINT) AS n_erased
        FROM events
        GROUP BY event_type
    """,
    tags=("privacy", "report"),
)
def privacy_erasure_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure audit: for a deletion request set (user_id % 97 =
    0 stands in for the GDPR queue), the per-event-type row counts
    before, after, and erased — the verification report a deletion job
    must emit BEFORE the anti-join rewrite is committed, proving the
    cascade touches exactly the requested subjects and nothing else
    (n_before = n_after + n_erased per type, which the oracle enforces
    value-for-value).

    Scale: the victim set broadcasts (deletion queues are small); the
    audit is one scan with conditional aggregation — same cost as the
    count the deletion job already owes its compliance log."""
    (events,) = load(spark, sf_dir, "events")
    victims = (
        events.where(F.col("user_id") % 97 == 0).select("user_id").distinct()
    )
    marked = events.join(
        F.broadcast(victims.withColumn("erase", F.lit(True))), "user_id", "left"
    )
    return marked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_before"),
        F.count_if(F.col("erase").isNull()).alias("n_after"),
        F.count_if(F.col("erase").isNotNull()).alias("n_erased"),
    )


def _zorder_oracle_sql(bits: int = 10) -> str:
    """Bit-interleave replay: DuckDB's BIGINT shift/mask operators match
    Spark's exactly on non-negative inputs, so the Morton value is
    integer-identical."""
    terms = " + ".join(
        f"(((ca >> {i}) & 1) << {2 * i}) + (((cd >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    )
    return f"""
        WITH base AS (
            SELECT o_orderkey,
                   CAST(o_custkey % 1024 AS BIGINT) AS ca,
                   CAST(date_diff('day', DATE '1992-01-01',
                                  CAST(o_orderdate AS DATE)) % 1024 AS BIGINT) AS cd
            FROM orders
        )
        SELECT o_orderkey, ca, cd, CAST({terms} AS BIGINT) AS zval
        FROM base WHERE o_orderkey % 50 = 0
    """


@query(
    "layout_zorder_values",
    oracle=_zorder_oracle_sql(),
    tags=("layout", "diagnostics"),
)
def layout_zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering values, driver-checked: interleave the
    low 10 bits of (customer, order-day) per order — the multi-dimensional
    layout key write_zordered sorts files by so per-file min/max bands
    stay narrow on BOTH columns and the txn table's data-skipping stats
    (pipeline/txn.py read_pruned) prune on either predicate.  The oracle
    replays the bit interleave exactly (pure BIGINT shift/mask in both
    engines); the file-band-tightening and two-column pruning effects are
    asserted in tests (test_cli_and_sinks.py::test_zorder_tightens_both_
    columns, test_txn.py::TestZorderSkipping)."""
    from aws_genaric_datapipeline_spark.operators.layout import zorder_value

    (orders,) = load(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        (F.col("o_custkey") % 1024).cast("bigint").alias("ca"),
        (F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")) % 1024)
        .cast("bigint")
        .alias("cd"),
    )
    return base.select(
        "o_orderkey",
        "ca",
        "cd",
        zorder_value(F.col("ca"), F.col("cd"), bits=10).alias("zval"),
    ).where(F.col("o_orderkey") % 50 == 0)


@query(
    "privacy_dp_noisy_counts",
    oracle="""
        WITH c AS (
            SELECT event_type, count(*) AS n FROM events GROUP BY event_type
        ),
        u AS (
            SELECT event_type, n,
                   ((('0x' || substr(md5('dpnoise-v1|' || event_type), 1, 8))
                        ::BIGINT % 16777216) + 0.5) / 16777216.0 - 0.5 AS uu
            FROM c
        )
        SELECT event_type,
               CAST(1.0 AS DOUBLE) AS epsilon,
               round(n + (-1.0) * sign(uu) * ln(1 - 2 * abs(uu)), 4)
                   AS noisy_count
        FROM u
    """,
    tags=("privacy", "diagnostics"),
)
def privacy_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private release of per-type event counts: the
    Laplace mechanism with sensitivity 1 (event-level neighboring — one
    added/removed event changes one count by 1) and ε = 1.0 per released
    count: noise ~ Laplace(1/ε) via inverse-CDF of a uniform draw.

    The uniform is SEEDED from an md5 window of the release key — a
    reproducible-noise mode: the pipeline's output is bit-stable across
    reruns and engines (which is what lets the DuckDB oracle replay it,
    and what a regression-tested release pipeline needs).  Deployment
    note, stated honestly: seeded noise gives the calibration and
    accounting of DP but NOT its guarantee against an adversary who
    knows the seed recipe; a production release swaps the seeded uniform
    for fresh randomness (one line) and keeps everything else — the
    mechanism, sensitivity bound, and per-release ε accounting are the
    auditable parts.  User-level DP would additionally bound per-user
    contribution (events per user) before counting.

    Scale: one grouped count (map-side combinable) and a scalar noise
    expression per group — nothing here grows with row count."""
    (events,) = load(spark, sf_dir, "events")
    eps = 1.0
    u = (
        (
            F.conv(F.substring(F.md5(F.concat(F.lit("dpnoise-v1|"), F.col("event_type"))), 1, 8), 16, 10).cast("bigint")
            % F.lit(16777216)
            + 0.5
        )
        / 16777216.0
        - 0.5
    )
    return (
        events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            F.lit(eps).alias("epsilon"),
            F.round(
                F.col("n")
                + (-1.0 / eps) * F.signum(u) * F.log(1 - 2 * F.abs(u)),
                4,
            ).alias("noisy_count"),
        )
    )


@query(
    "layout_dynamic_partition_pruning",
    oracle="""
        WITH dim AS (
            SELECT event_type,
                   row_number() OVER (ORDER BY count(*) DESC, event_type) AS rn
            FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               count(*) AS n_events,
               CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
                   AS value_cents
        FROM events e
        JOIN dim d ON e.event_type = d.event_type AND d.rn <= 2
        GROUP BY e.event_type
    """,
    tags=("layout", "scale", "pruning"),
)
def layout_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning end-to-end: the fact side is WRITTEN
    partitioned on the join key (the ingest-side layout contract), the
    dimension side carries a data-dependent filter (top-2 event types by
    volume — not constant-foldable, so static pruning cannot apply), and
    Catalyst injects a dynamicpruning subquery into the fact scan: only
    the surviving partitions' files are ever opened
    (tests/test_plans.py gates the injected filter).

    This is the partition-layout twin of join_bloom_semi_reduction: the
    bloom prunes ROWS pre-shuffle when the fact is unpartitioned; DPP
    prunes whole DIRECTORIES pre-scan when the layout matches the join
    key — at 100 TB the difference between reading 2/5 of the corpus
    and reading none of the losing partitions' bytes at all.

    The oracle replays the same top-2 selection relationally; the Spark
    side must produce it through the actual partitioned write + pruned
    scan."""
    import shutil
    import tempfile
    from pathlib import Path

    (events,) = load(spark, sf_dir, "events")
    # Path is derived from the Spark application id: unique per session, so
    # two concurrent runs on one host never rmtree/read each other's files
    # (a fixed shared path raced).  Same-session re-invocation still reuses
    # and resets its own directory, which only invalidates its own earlier
    # lazy DataFrame — the pre-existing contract.
    root = (
        Path(tempfile.gettempdir())
        / f"aws_gdp_dpp_demo_{spark.sparkContext.applicationId}"
    )
    shutil.rmtree(root, ignore_errors=True)
    events.select("event_type", "value").write.partitionBy("event_type").parquet(
        str(root / "fact")
    )
    from pyspark.sql import Window

    dim = (
        events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "event_type",
            F.row_number()
            .over(Window.orderBy(F.desc("c"), F.asc("event_type")))
            .alias("rn"),
        )
    )
    dim.write.parquet(str(root / "dim"))
    fact = spark.read.parquet(str(root / "fact"))
    dimr = spark.read.parquet(str(root / "dim")).where(F.col("rn") <= 2)
    return (
        fact.join(dimr, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
        )
    )


@query(
    "dq_quarantine_split",
    oracle="""
        WITH corrupted AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 97 = 0 THEN -o_totalprice
                        ELSE o_totalprice END AS price,
                   CASE WHEN o_orderkey % 89 = 0 THEN NULL
                        ELSE o_orderstatus END AS status
            FROM orders
        ),
        tagged AS (
            SELECT o_orderkey,
                   array_to_string(list_sort(list_filter([
                       CASE WHEN NOT coalesce(price > 0, FALSE)
                            THEN 'price_positive' END,
                       CASE WHEN NOT coalesce(status IN ('O','F','P'), FALSE)
                            THEN 'status_known' END
                   ], x -> x IS NOT NULL)), ',') AS failed_rules
            FROM corrupted
        )
        SELECT failed_rules,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(o_orderkey) AS BIGINT) AS min_key,
               CAST(max(o_orderkey) AS BIGINT) AS max_key
        FROM tagged WHERE failed_rules <> ''
        GROUP BY failed_rules
    """,
    tags=("dq", "pipeline"),
)
def dq_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations-with-quarantine (Deequ/DLT pattern): rows failing any
    declared rule are ROUTED, not dropped — with the sorted failed-rule
    list attached for triage — while the clean rows proceed (the batch
    is late for no one).  Deterministic corruption (negated prices on
    o_orderkey % 97, nulled statuses on % 89 — including keys hitting
    BOTH rules at % 8633) is injected identically in both engines, so
    the oracle checks routing AND reason-tagging.

    Output is the triage summary per failed-rule combination; the split
    operator itself (pipeline/quality.py quarantine_split) is exercised
    end-to-end with both sinks in TestQuarantineSplit.

    Scale: rule evaluation is one codegen'd row-parallel pass; the only
    aggregation is over the (small) reason-combination space."""
    from aws_genaric_datapipeline_spark.pipeline.quality import (
        Rule,
        quarantine_split,
    )

    (orders,) = load(spark, sf_dir, "orders")
    corrupted = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 97 == 0, -F.col("o_totalprice"))
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
        F.when(F.col("o_orderkey") % 89 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
    )
    rules = [
        Rule("price_positive", F.col("price") > 0),
        Rule("status_known", F.col("status").isin("O", "F", "P")),
    ]
    good, quarantined = quarantine_split(corrupted, rules)
    return (
        quarantined.groupBy("failed_rules")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("o_orderkey").cast("bigint").alias("min_key"),
            F.max("o_orderkey").cast("bigint").alias("max_key"),
        )
    )


@query(
    "dq_referential_integrity",
    oracle="""
        SELECT 'lineitem.l_orderkey -> orders' AS relation,
               CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child,
               CAST((SELECT count(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM orders o
                                       WHERE o.o_orderkey = l.l_orderkey))
                    AS BIGINT) AS n_orphans
        UNION ALL
        SELECT 'orders.o_custkey -> customer',
               (SELECT count(*) FROM orders),
               (SELECT count(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'orders.o_custkey -> customer[c_custkey <= 100]',
               (SELECT count(*) FROM orders),
               (SELECT count(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey
                                    AND c.c_custkey <= 100))
    """,
    tags=("dq", "diagnostics"),
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphaned-foreign-key counts per
    declared relation via anti joins — the cross-TABLE data-quality gate
    (dq_dynamic_rules audits values within a table; this audits the
    relationships a star schema promises).  The third relation audits
    against a truncated parent slice, exercising the nonzero-orphan
    path on clean fixtures.

    Scale: each relation is one anti join keyed on the FK — semi-join
    shuffle of key columns only; parent sides broadcast when they fit.
    A zero row here is the audit's success statement, not a triviality:
    at 100 TB this is the gate that catches a partially-loaded parent
    table before downstream joins silently drop children."""
    (orders, lineitem, customer) = load(
        spark, sf_dir, "orders", "lineitem", "customer"
    )

    def audit(relation: str, child: DataFrame, ckey: str, parent: DataFrame, pkey: str) -> DataFrame:
        orphans = child.join(
            parent.select(pkey), child[ckey] == parent[pkey], "left_anti"
        )
        return child.agg(
            F.lit(relation).alias("relation"),
            F.count(F.lit(1)).cast("bigint").alias("n_child"),
        ).crossJoin(
            orphans.agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
        )

    return (
        audit("lineitem.l_orderkey -> orders", lineitem, "l_orderkey", orders, "o_orderkey")
        .unionByName(
            audit("orders.o_custkey -> customer", orders, "o_custkey", customer, "c_custkey")
        )
        .unionByName(
            audit(
                "orders.o_custkey -> customer[c_custkey <= 100]",
                orders,
                "o_custkey",
                customer.where(F.col("c_custkey") <= 100),
                "c_custkey",
            )
        )
    )

