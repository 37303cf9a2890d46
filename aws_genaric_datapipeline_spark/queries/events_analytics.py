"""Event-stream analytics beyond windowing: ordered funnels and cohort
retention — the standard product-analytics shapes a training-data/telemetry
pipeline computes at scale.

Reference parity: the reference's only event processing is one-record-at-a-
time dispatch (lambda/invoke_prepared.py:20-30); these queries are the
batch-analytics counterpart over the driver's `events` table (sessionization
lives in streaming_windows.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.tables import load


@query(
    "events_funnel",
    oracle="""
        WITH f AS (
            SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
            FROM events GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, min(e.ts) AS t_click
            FROM events e JOIN f ON f.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.ts > f.t_view
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, min(e.ts) AS t_purchase
            FROM events e JOIN c ON c.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.t_click
            GROUP BY e.user_id
        )
        SELECT (SELECT count(t_view) FROM f)  AS n_view,
               (SELECT count(*) FROM c)       AS n_click_after_view,
               (SELECT count(*) FROM p)       AS n_purchase_after_click
    """,
    tags=("events", "funnel"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-step funnel (view → click → purchase): each step counts
    users whose first step-N event strictly follows their first step-(N-1)
    event.

    Scale: three aggregations all keyed by user_id — the join inputs arrive
    hash-partitioned on the same key, so AQE reuses the partitioning instead
    of re-shuffling; per-user state is a single timestamp per step (no
    event-list materialization, unlike collect_list-based funnel impls).
    """
    (events,) = load(spark, sf_dir, "events")
    first_view = (
        events.groupBy("user_id")
        .agg(F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"))
        .where(F.col("t_view").isNotNull())
    )
    first_click = (
        events.where(F.col("event_type") == "click")
        .join(first_view, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    first_purchase = (
        events.where(F.col("event_type") == "purchase")
        .join(first_click, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        first_view.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(first_click.agg(F.count(F.lit(1)).alias("n_click_after_view")))
        .crossJoin(first_purchase.agg(F.count(F.lit(1)).alias("n_purchase_after_click")))
    )


@query(
    "events_cohort_retention",
    oracle="""
        WITH first_seen AS (
            SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
            FROM events GROUP BY user_id
        ),
        active AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
        )
        SELECT CAST(f.cohort_week AS DATE) AS cohort_week,
               CAST(date_diff('day', f.cohort_week, a.wk) / 7 AS INT) AS week_offset,
               count(*) AS active_users
        FROM active a JOIN first_seen f ON a.user_id = f.user_id
        GROUP BY 1, 2
    """,
    tags=("events", "cohort"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users bucketed by first-active week,
    counted per (cohort, weeks-since-cohort) cell.

    Scale: both sides reduce to one row per (user, week) before the join, so
    the join input is bounded by users×weeks, not raw events; cohort
    assignment is a min-aggregate (partial-merge friendly).  `active` is
    deduped, so count(*) == count(DISTINCT user) without a distinct shuffle.
    """
    (events,) = load(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    first_seen = events.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    active = events.select("user_id", wk.alias("wk")).distinct()
    return (
        active.join(first_seen, "user_id")
        .groupBy(
            F.col("cohort_week").cast("date").alias("cohort_week"),
            F.floor(F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@query(
    "events_resample_locf",
    oracle="""
        WITH bounds AS (
            SELECT date_trunc('hour', min(ts)) AS mn,
                   date_trunc('hour', max(ts)) AS mx
            FROM events
        ),
        grid AS (
            SELECT et.event_type, g.hr
            FROM (SELECT DISTINCT event_type FROM events) et,
                 (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
                  FROM bounds) g
        ),
        agg AS (
            SELECT event_type, date_trunc('hour', ts) AS hr,
                   round(avg(value), 4) AS avg_val
            FROM events GROUP BY 1, 2
        )
        SELECT g.event_type, g.hr,
               a.avg_val IS NOT NULL AS observed,
               round(last_value(a.avg_val IGNORE NULLS)
                     OVER (PARTITION BY g.event_type ORDER BY g.hr), 4) AS locf_val
        FROM grid g
        LEFT JOIN agg a ON a.event_type = g.event_type AND a.hr = g.hr
    """,
    tags=("events", "timeseries"),
)
def events_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with gap filling (the hypertable-rollup shape):
    aggregate to an hourly grid per event type, densify missing hours from
    a generated time spine, and interpolate gaps by carrying the last
    observation forward (LOCF; hours before the first observation stay
    NULL).

    Scale: the spine is |types| x |hours| — generated, never shuffled from
    the fact side; the hourly aggregate is the only fact-sized shuffle.
    The LOCF window partitions by type over the whole series; at years-long
    ranges, re-key to (type, coarser bucket) and propagate boundary values
    in a second tiny pass instead of one giant ordered partition.
    """
    (events,) = load(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("mn"),
        F.date_trunc("hour", F.max("ts")).alias("mx"),
    )
    grid = (
        events.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("mn"), F.col("mx"), F.expr("interval 1 hour"))).alias("hr"),
        )
    )
    hourly = events.groupBy("event_type", hour.alias("hr")).agg(
        F.round(F.avg("value"), 4).alias("avg_val")
    )
    w = Window.partitionBy("event_type").orderBy("hr")
    return grid.join(hourly, ["event_type", "hr"], "left").select(
        "event_type",
        "hr",
        F.col("avg_val").isNotNull().alias("observed"),
        F.round(F.last("avg_val", ignorenulls=True).over(w), 4).alias("locf_val"),
    )


@query(
    "events_resample_interpolate",
    oracle="""
        WITH bounds AS (
            SELECT date_trunc('hour', min(ts)) AS mn,
                   date_trunc('hour', max(ts)) AS mx
            FROM events
        ),
        grid AS (
            SELECT et.event_type, g.hr
            FROM (SELECT DISTINCT event_type FROM events) et,
                 (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
                  FROM bounds) g
        ),
        agg AS (
            SELECT event_type, date_trunc('hour', ts) AS hr,
                   round(avg(value), 4) AS avg_val
            FROM events GROUP BY 1, 2
        ),
        j AS (
            SELECT g.event_type, g.hr, a.avg_val,
                   last_value(a.avg_val IGNORE NULLS) OVER wp AS pv,
                   last_value(CASE WHEN a.avg_val IS NOT NULL THEN g.hr END
                              IGNORE NULLS) OVER wp AS ph,
                   first_value(a.avg_val IGNORE NULLS) OVER wf AS nv,
                   first_value(CASE WHEN a.avg_val IS NOT NULL THEN g.hr END
                               IGNORE NULLS) OVER wf AS nh
            FROM grid g
            LEFT JOIN agg a ON a.event_type = g.event_type AND a.hr = g.hr
            WINDOW wp AS (PARTITION BY g.event_type ORDER BY g.hr
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wf AS (PARTITION BY g.event_type ORDER BY g.hr
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT event_type, hr,
               avg_val IS NOT NULL AS observed,
               -- EXACT integer basis points: time-weighted blend
               -- (pv·(dT−dt) + nv·dt)/dT truncated toward zero, all
               -- BIGINT.  A float formulation lands on .00005 rounding
               -- boundaries SYSTEMATICALLY here (hour ratios are small
               -- rationals × 2-decimal inputs), so the contract is
               -- integer like quality_score_bp, immune by construction.
               CASE WHEN avg_val IS NOT NULL
                        THEN CAST(round(avg_val * 10000) AS BIGINT)
                    WHEN pv IS NOT NULL AND nv IS NOT NULL
                        THEN CAST((num - num % den) / den AS BIGINT)
               END AS interp_val_bp
        FROM (
            SELECT *,
                   CAST(round(pv * 10000) AS BIGINT)
                       * CAST(epoch(nh) - epoch(hr) AS BIGINT)
                   + CAST(round(nv * 10000) AS BIGINT)
                       * CAST(epoch(hr) - epoch(ph) AS BIGINT) AS num,
                   CAST(epoch(nh) - epoch(ph) AS BIGINT) AS den
            FROM j
        )
    """,
    tags=("events", "timeseries"),
)
def events_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with LINEAR interpolation: gaps take the
    time-weighted blend of the surrounding observations; edges outside
    the first/last observation stay NULL (no extrapolation — the honest
    default for downstream models), observed hours pass through exactly.
    Complements events_resample_locf with the second standard gap-fill.

    The blend is EXACT integer arithmetic in basis points —
    (pv·(dT−dt) + nv·dt)/dT truncated, all bigint — because the float
    form lands on .00005 rounding boundaries systematically (hour ratios
    are small rationals × 2-decimal inputs): 7 one-ulp flips at sf0.001
    before the integer contract, zero after.

    Scale: identical shape to LOCF — generated spine, one fact-sized
    hourly aggregate, and two frame-bounded window passes over the
    |types|×|hours| grid (never the fact table)."""
    (events,) = load(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("mn"),
        F.date_trunc("hour", F.max("ts")).alias("mx"),
    )
    grid = (
        events.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("mn"), F.col("mx"), F.expr("interval 1 hour"))
            ).alias("hr"),
        )
    )
    hourly = events.groupBy("event_type", hour.alias("hr")).agg(
        F.round(F.avg("value"), 4).alias("avg_val")
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hr = F.when(F.col("avg_val").isNotNull(), F.col("hr"))
    j = (
        grid.join(hourly, ["event_type", "hr"], "left")
        .withColumn("pv", F.last("avg_val", ignorenulls=True).over(wp))
        .withColumn("ph", F.last(obs_hr, ignorenulls=True).over(wp))
        .withColumn("nv", F.first("avg_val", ignorenulls=True).over(wf))
        .withColumn("nh", F.first(obs_hr, ignorenulls=True).over(wf))
    )
    def bp(c):  # 4-decimal double → exact integer basis points
        return F.round(c * 10000).cast("bigint")

    def secs(c):
        return F.unix_timestamp(c).cast("bigint")

    num = bp(F.col("pv")) * (secs("nh") - secs("hr")) + bp(F.col("nv")) * (
        secs("hr") - secs("ph")
    )
    den = secs("nh") - secs("ph")
    # exact truncated division, the portable (a - a % b)/b idiom
    interp_bp = (
        F.when(F.col("avg_val").isNotNull(), bp(F.col("avg_val")))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            ((num - num % den) / den).cast("bigint"),
        )
    )
    return j.select(
        "event_type",
        "hr",
        F.col("avg_val").isNotNull().alias("observed"),
        interp_bp.alias("interp_val_bp"),
    )


@query(
    "events_heavy_hitter_types",
    oracle="""
        SELECT event_type, count(*) AS exact_count
        FROM events
        GROUP BY event_type
        HAVING count(*) > (SELECT count(*) FROM events) / 8.0
    """,
    tags=("events", "heavy-hitters"),
)
def events_heavy_hitter_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters over the event stream via the two-pass Misra-Gries
    operator (partition-local k-counter sketches -> exact verification of
    the bounded candidate set).  Because the verify pass is exact and the
    sketch has no false negatives above N/(k+1), the result equals the
    exact HAVING oracle — an approximate algorithm with a checkable exact
    answer.  At 100 TB the first pass reads each partition once with O(k)
    memory; only candidate keys (<= k x partitions) reach the second pass.
    """
    from aws_genaric_datapipeline_spark.operators.skew import heavy_hitters

    (events,) = load(spark, sf_dir, "events")
    return heavy_hitters(
        events.select(F.col("event_type").cast("string").alias("event_type")),
        "event_type",
        k=7,
    )


@query(
    "events_anomaly_zscore",
    oracle="""
        WITH scored AS (
            SELECT event_id, user_id, value,
                   avg(value) OVER w AS mu,
                   stddev(value) OVER w AS sd,
                   count(value) OVER w AS n_prev
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
        )
        SELECT event_id, user_id, round((value - mu) / sd, 4) AS zscore
        FROM scored
        WHERE n_prev >= 10 AND sd > 0
          AND abs((value - mu) / sd) >= 2
    """,
    tags=("events", "window", "anomaly"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-style anomaly flags in batch: per-user rolling z-score
    against the trailing 20 events (|z| >= 2, warm-up of 10).  The window
    excludes the current row, so an outlier can't suppress its own flag.

    Scale: one shuffle on user_id; the frame is row-bounded so state per
    key is O(20) — the same shape runs incrementally as a stateful
    streaming operator (streaming/stateful.py)."""
    (events,) = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    scored = events.select(
        "event_id",
        "user_id",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev("value").over(w).alias("sd"),
        F.count("value").over(w).alias("n_prev"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        scored.where((F.col("n_prev") >= 10) & (F.col("sd") > 0) & (F.abs(z) >= 2))
        .select("event_id", "user_id", F.round(z, 4).alias("zscore"))
    )


@query(
    "events_winsorize_by_type",
    oracle="""
        WITH pct AS (
            SELECT event_type,
                   quantile_cont(value, 0.05) AS p05,
                   quantile_cont(value, 0.95) AS p95
            FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               count(*) FILTER (WHERE value < p05) AS n_clipped_low,
               count(*) FILTER (WHERE value > p95) AS n_clipped_high,
               round(avg(least(greatest(value, p05), p95)), 4) AS mean_winsorized
        FROM events e JOIN pct ON e.event_type = pct.event_type
        GROUP BY e.event_type
    """,
    tags=("events", "agg", "curation"),
)
def events_winsorize_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust normalization: winsorize `value` at the per-type
    5th/95th percentiles (the clip-don't-drop counterpart to quality
    filtering) and report clip counts + winsorized mean per type.

    Scale: the percentile frame is |event_type| rows, broadcast back onto
    the fact table — one agg shuffle, one broadcast join, one final agg; at
    100 TB swap the exact percentile for approx_percentile with no shape
    change."""
    (events,) = load(spark, sf_dir, "events")
    pct = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    cv = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    return (
        events.join(F.broadcast(pct), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.when(F.col("value") < F.col("p05"), 1)).alias("n_clipped_low"),
            F.count(F.when(F.col("value") > F.col("p95"), 1)).alias("n_clipped_high"),
            F.round(F.avg(cv), 4).alias("mean_winsorized"),
        )
    )


@query(
    "events_impute_missing",
    oracle="""
        WITH m AS (
            SELECT event_type,
                   CASE WHEN value < 5 THEN NULL ELSE value END AS v
            FROM events
        ),
        mu AS (SELECT event_type, avg(v) AS mu FROM m GROUP BY event_type)
        SELECT m.event_type,
               count(*) FILTER (WHERE v IS NULL) AS n_missing,
               round(avg(coalesce(v, mu)), 4) AS mean_imputed
        FROM m JOIN mu ON m.event_type = mu.event_type
        GROUP BY m.event_type
    """,
    tags=("events", "agg", "repair"),
)
def events_impute_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-mean imputation (data repair): values below the validity floor
    (< 5) are treated as missing and filled with the per-type mean of the
    valid values; reports missing counts and the post-imputation mean.

    Scale: the imputation table is |event_type| rows broadcast back onto
    the fact — same one-agg-one-broadcast shape as winsorization."""
    (events,) = load(spark, sf_dir, "events")
    v = F.when(F.col("value") < 5, F.lit(None)).otherwise(F.col("value"))
    m = events.select("event_type", v.alias("v"))
    mu = m.groupBy("event_type").agg(F.avg("v").alias("mu"))
    return (
        m.join(F.broadcast(mu), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.when(F.col("v").isNull(), 1)).alias("n_missing"),
            F.round(F.avg(F.coalesce(F.col("v"), F.col("mu"))), 4).alias("mean_imputed"),
        )
    )


@query(
    "events_sessionize_stats",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_id, epoch(ts) AS es,
                   lag(epoch(ts)) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev_es
            FROM events
        ),
        marked AS (
            SELECT user_id, event_id, es,
                   CASE WHEN prev_es IS NULL OR es - prev_es > 21600
                        THEN 1 ELSE 0 END AS is_new
            FROM ordered
        ),
        sess AS (
            SELECT user_id, es,
                   sum(is_new) OVER (PARTITION BY user_id
                                     ORDER BY es, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked
        ),
        per_session AS (
            SELECT user_id, sid, count(*) AS n_events,
                   max(es) - min(es) AS dur_s
            FROM sess GROUP BY user_id, sid
        )
        SELECT user_id,
               count(*) AS n_sessions,
               round(avg(n_events), 4) AS avg_session_events,
               round(avg(dur_s), 2) AS avg_session_duration_s
        FROM per_session GROUP BY user_id
    """,
    tags=("events", "window", "sessionize"),
)
def events_sessionize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (6-hour inactivity gap) via the lag-gap-cumsum
    pattern, rolled up to per-user session statistics — the batch
    counterpart of the native session_window streaming query, over
    epoch-seconds so the arithmetic is identical across engines.

    Scale: one shuffle on user_id serves the two windows AND the session
    aggregate (same partition key throughout); no per-session state beyond
    the running counter."""
    (events,) = load(spark, sf_dir, "events")
    es = F.col("ts").cast("double")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("es", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    marked = events.select(
        "user_id", "event_id", es.alias("es"), F.lag(es).over(w).alias("prev_es")
    ).withColumn(
        "is_new",
        F.when(
            F.col("prev_es").isNull() | (F.col("es") - F.col("prev_es") > 21600), 1
        ).otherwise(0),
    )
    sess = marked.withColumn("sid", F.sum("is_new").over(run))
    per_session = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("es") - F.min("es")).alias("dur_s"),
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("n_events"), 4).alias("avg_session_events"),
        F.round(F.avg("dur_s"), 2).alias("avg_session_duration_s"),
    )


@query(
    "events_cms_type_counts",
    oracle="""
        WITH ev AS (
            SELECT CAST(user_id AS VARCHAR) || ':' || event_type AS k
            FROM events
        ),
        sk AS (
            SELECT row_j, pos, count(*) AS c FROM (
                SELECT 0 AS row_j,
                       ('0x' || substr(md5(k), 1, 8))::BIGINT % 256 AS pos
                FROM ev
                UNION ALL
                SELECT 1, ('0x' || substr(md5(k), 9, 8))::BIGINT % 256 FROM ev
            ) GROUP BY row_j, pos
        ),
        keys AS (
            SELECT user_id, event_type, count(*) AS exact_count
            FROM events WHERE user_id % 10 = 0
            GROUP BY user_id, event_type
        )
        SELECT user_id, event_type,
               least(
                   coalesce((SELECT c FROM sk WHERE row_j = 0 AND pos =
                       ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':'
                        || event_type), 1, 8))::BIGINT % 256),
                       CAST(0 AS BIGINT)),
                   coalesce((SELECT c FROM sk WHERE row_j = 1 AND pos =
                       ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':'
                        || event_type), 9, 8))::BIGINT % 256),
                       CAST(0 AS BIGINT))
               ) AS est_count,
               exact_count,
               least(
                   coalesce((SELECT c FROM sk WHERE row_j = 0 AND pos =
                       ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':'
                        || event_type), 1, 8))::BIGINT % 256),
                       CAST(0 AS BIGINT)),
                   coalesce((SELECT c FROM sk WHERE row_j = 1 AND pos =
                       ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':'
                        || event_type), 9, 8))::BIGINT % 256),
                       CAST(0 AS BIGINT))
               ) - exact_count AS overcount
        FROM keys
    """,
    tags=("north-star", "events", "sketch"),
)
def events_cms_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point estimates (depth 2 × width 256, md5-window
    hashes) for per-(user, event_type) activity counts, checked against
    exact counts for a sampled key set — est ≥ exact always, and the
    oracle rebuilds the identical grid so every collision's overcount is
    value-checked, not tolerance-checked.  The sketch build shuffles at
    most depth×width rows regardless of corpus size or key skew (map-side
    partial aggregation collapses each partition to the grid), which is
    the mergeable-telemetry shape: per-batch grids add cell-wise."""
    from aws_genaric_datapipeline_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )

    (events,) = load(spark, sf_dir, "events")
    key = F.concat_ws(":", F.col("user_id"), F.col("event_type"))
    sketch = cms_sketch(events, key, depth=2, width=256)
    keys = (
        events.where(F.col("user_id") % 10 == 0)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    est = cms_estimate(sketch, keys, key, depth=2, width=256)
    return est.select(
        "user_id",
        "event_type",
        "est_count",
        "exact_count",
        (F.col("est_count") - F.col("exact_count")).alias("overcount"),
    )


@query(
    "report_psi_value_drift",
    oracle="""
        WITH vb AS (
            SELECT event_type,
                   CAST(round(value * 10000) AS BIGINT) AS v,
                   ts < TIMESTAMP '2024-01-16 00:00:00' AS is_ref
            FROM events
        ),
        stats AS (
            SELECT event_type, min(v) AS mn, max(v) AS mx,
                   count(*) FILTER (is_ref) AS n_ref,
                   count(*) FILTER (NOT is_ref) AS n_cur
            FROM vb WHERE is_ref GROUP BY event_type
        ),
        st2 AS (
            SELECT s.event_type, s.mn, s.mx,
                   (SELECT count(*) FROM vb
                    WHERE vb.event_type = s.event_type AND vb.is_ref) AS n_ref,
                   (SELECT count(*) FROM vb
                    WHERE vb.event_type = s.event_type AND NOT vb.is_ref)
                       AS n_cur
            FROM stats s
        ),
        binned AS (
            SELECT vb.event_type, vb.is_ref,
                   least(9, greatest(0, CAST(
                       ((vb.v - st2.mn) * 10
                        - ((vb.v - st2.mn) * 10) % (st2.mx - st2.mn + 1))
                       / (st2.mx - st2.mn + 1) AS BIGINT))) AS bin
            FROM vb JOIN st2 USING (event_type)
        ),
        grid AS (
            SELECT st2.event_type, st2.n_ref, st2.n_cur, g.bin
            FROM st2, UNNEST(range(0, 10)) AS g(bin)
        ),
        cnt AS (
            SELECT grid.event_type, grid.bin, grid.n_ref, grid.n_cur,
                   coalesce(sum(CASE WHEN b.is_ref THEN 1 END), 0) AS c_ref,
                   coalesce(sum(CASE WHEN NOT b.is_ref THEN 1 END), 0)
                       AS c_cur
            FROM grid
            LEFT JOIN binned b
              ON b.event_type = grid.event_type AND b.bin = grid.bin
            GROUP BY grid.event_type, grid.bin, grid.n_ref, grid.n_cur
        ),
        terms AS (
            SELECT event_type, bin,
                   ((c_ref + 1) / CAST(n_ref + 10 AS DOUBLE)
                    - (c_cur + 1) / CAST(n_cur + 10 AS DOUBLE))
                   * ln(((c_ref + 1) / CAST(n_ref + 10 AS DOUBLE))
                        / ((c_cur + 1) / CAST(n_cur + 10 AS DOUBLE))) AS t,
                   n_ref, n_cur
            FROM cnt
        )
        SELECT event_type,
               round(list_aggregate(list_transform(
                   list_sort(list(struct_pack(b := bin, t := t))),
                   s -> s.t), 'sum'), 4) AS psi,
               CAST(any_value(n_ref) AS BIGINT) AS n_ref,
               CAST(any_value(n_cur) AS BIGINT) AS n_cur
        FROM terms GROUP BY event_type
    """,
    tags=("events", "drift", "reporting"),
)
def report_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of the `value` distribution per event
    type: first half of the range (reference period) vs second half
    (current), 10 fixed-width bins over the reference span, Laplace-
    smoothed (+1/+10) so empty bins contribute finitely — PSI > 0.2 is
    the conventional retraining tripwire.

    Determinism: bin assignment is EXACT integer arithmetic on value
    basis points (the portable (a − a%b)/b truncation — float binning
    flips boundary values across engines), and the 10 per-bin terms fold
    in bin order on both sides (sorted-struct aggregate), so the float
    sum is order-identical like char_entropy."""
    (events,) = load(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    vb = events.select(
        "event_type",
        F.round(F.col("value") * 10000).cast("bigint").alias("v"),
        (F.col("ts") < cut).alias("is_ref"),
    )
    stats = (
        vb.groupBy("event_type")
        .agg(
            F.min(F.when(F.col("is_ref"), F.col("v"))).alias("mn"),
            F.max(F.when(F.col("is_ref"), F.col("v"))).alias("mx"),
            F.count_if("is_ref").alias("n_ref"),
            F.count_if(~F.col("is_ref")).alias("n_cur"),
        )
    )
    span = F.col("mx") - F.col("mn") + 1
    num = (F.col("v") - F.col("mn")) * 10
    bin_ = F.least(
        F.lit(9),
        F.greatest(F.lit(0), ((num - num % span) / span).cast("bigint")),
    )
    binned = vb.join(F.broadcast(stats), "event_type").select(
        "event_type", "is_ref", bin_.alias("bin")
    )
    grid = stats.select(
        "event_type",
        "n_ref",
        "n_cur",
        F.explode(F.sequence(F.lit(0), F.lit(9))).alias("bin"),
    )
    bcnt = binned.groupBy("event_type", "bin").agg(
        F.count_if("is_ref").alias("c_ref"),
        F.count_if(~F.col("is_ref")).alias("c_cur"),
    )
    cnt = grid.join(bcnt, ["event_type", "bin"], "left").select(
        "event_type",
        "bin",
        "n_ref",
        "n_cur",
        F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
        F.coalesce("c_cur", F.lit(0)).alias("c_cur"),
    )
    p = (F.col("c_ref") + 1) / (F.col("n_ref") + 10).cast("double")
    q = (F.col("c_cur") + 1) / (F.col("n_cur") + 10).cast("double")
    terms = cnt.select(
        "event_type",
        "bin",
        "n_ref",
        "n_cur",
        ((p - q) * F.log(p / q)).alias("t"),
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.round(
                F.aggregate(
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct(F.col("bin").alias("b"), F.col("t").alias("t")))
                        ),
                        lambda s: s.getField("t"),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                4,
            ).alias("psi"),
            F.any_value("n_ref").alias("n_ref"),
            F.any_value("n_cur").alias("n_cur"),
        )
    )


@query(
    "events_gap_report",
    oracle="""
        WITH seq AS (
            SELECT user_id, ts, event_id,
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_ts
            FROM events
        ),
        gaps AS (
            SELECT user_id,
                   epoch_us(ts) - epoch_us(prev_ts) AS gap_us
            FROM seq WHERE prev_ts IS NOT NULL
        )
        SELECT user_id,
               count(*) AS n_intervals,
               count(*) FILTER (gap_us > 21600000000) AS n_gaps_over_6h,
               max(gap_us) AS max_gap_us,
               CAST((sum(gap_us) - sum(gap_us) % count(*)) / count(*)
                    AS BIGINT) AS mean_gap_us_floor
        FROM gaps GROUP BY user_id
        HAVING count(*) FILTER (gap_us > 21600000000) > 0
    """,
    tags=("events", "timeseries", "diagnostics"),
)
def events_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heartbeat-gap detection: per user, intervals between consecutive
    events exceeding 6 h (silence windows — sensor dropout, churn risk,
    pipeline stalls), with interval counts and the largest/mean gap
    (mean floored in exact integer arithmetic).  Only users with at
    least one 6 h gap are reported.  Gaps are exact integer MICROSECONDS
    (epoch_us/unix_micros) — second-granularity epoch() rounds
    sub-second timestamps differently across engines.

    Scale: one (user, ts) window pass — the same single-sort shape as
    sessionization — and a per-user aggregate; gaps are integer seconds,
    no float boundaries anywhere."""
    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        events.select(
            "user_id",
            (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            ).alias("gap_us"),
        )
        .where(F.col("gap_us").isNotNull())
    )
    n = F.count(F.lit(1))
    s = F.sum("gap_us")
    return (
        gaps.groupBy("user_id")
        .agg(
            n.alias("n_intervals"),
            F.count_if(F.col("gap_us") > 21600000000).alias("n_gaps_over_6h"),
            F.max("gap_us").alias("max_gap_us"),
            ((s - s % n) / n).cast("bigint").alias("mean_gap_us_floor"),
        )
        .where(F.col("n_gaps_over_6h") > 0)
    )


@query(
    "events_dow_seasonal_residuals",
    oracle="""
        WITH base AS (
            SELECT event_id, event_type, value,
                   dayofweek(ts) + 1 AS dow,
                   avg(value) OVER (
                       PARTITION BY event_type, dayofweek(ts)
                   ) AS baseline
            FROM events
        ),
        scored AS (
            SELECT event_id, event_type, dow,
                   round(value, 2) AS value,
                   round(baseline, 4) AS baseline,
                   round(value - baseline, 4) AS residual,
                   row_number() OVER (
                       ORDER BY round(abs(value - baseline), 4) DESC, event_id
                   ) AS rn
            FROM base
        )
        SELECT event_id, event_type, CAST(dow AS INT) AS dow,
               value, baseline, residual
        FROM scored WHERE rn <= 10
    """,
    tags=("events", "analytics"),
)
def events_dow_seasonal_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly scoring: each event's value is compared
    to the mean for its (event_type, day-of-week) cell — the simplest
    seasonal decomposition — and the 10 largest absolute residuals
    surface as anomalies that a global z-score would mask behind weekday
    structure.  The baseline is a partition-wide window average (no
    second scan); ranking is on the ROUNDED residual with an id
    tiebreak, so the top-10 cut is deterministic in both engines."""
    (events,) = load(spark, sf_dir, "events")
    wb = Window.partitionBy("event_type", F.dayofweek("ts"))
    base = events.select(
        "event_id",
        "event_type",
        "value",
        F.dayofweek("ts").cast("int").alias("dow"),
        F.avg("value").over(wb).alias("baseline"),
    )
    wr = Window.orderBy(
        F.desc(F.round(F.abs(F.col("value") - F.col("baseline")), 4)),
        F.asc("event_id"),
    )
    return (
        base.select(
            "event_id",
            "event_type",
            "dow",
            F.round("value", 2).alias("value"),
            F.round("baseline", 4).alias("baseline"),
            F.round(F.col("value") - F.col("baseline"), 4).alias("residual"),
            F.row_number().over(wr).alias("rn"),
        )
        .where(F.col("rn") <= 10)
        .drop("rn")
    )


@query(
    "events_late_arrival_profile",
    oracle="""
        WITH b AS (
            SELECT *, event_id // 1000 AS bkt FROM events
        ),
        bmax AS (
            SELECT bkt, max(ts) AS mx FROM b GROUP BY bkt
        ),
        runmax AS (
            SELECT bkt,
                   max(mx) OVER (ORDER BY bkt
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prev_mx
            FROM bmax
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_total,
               CAST(count(*) FILTER (prev_mx IS NOT NULL
                     AND ts + INTERVAL 10 MINUTE < prev_mx) AS BIGINT)
                   AS n_late_10m
        FROM b JOIN runmax USING (bkt)
        GROUP BY event_type
    """,
    tags=("events", "streaming", "report"),
)
def events_late_arrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data profile for watermark sizing: per event type, how many
    events arrive more than 10 minutes behind the maximum event time
    already seen (arrival order = ingest id, bucketed at 1000 ids) — the
    empirical answer to "what watermark delay would this stream need",
    measured BEFORE committing a streaming job to a delay that silently
    drops the tail.

    Scale: a global running max is inherently sequential, so it is
    computed two-level — per-bucket maxima first (ordinary aggregation),
    then the running max over the TINY bucket frame, broadcast back.
    Lateness is bucket-granular by construction (an event is compared
    against strictly earlier buckets), which is the deterministic,
    engine-replayable contract."""
    from pyspark.sql import Window

    (events,) = load(spark, sf_dir, "events")
    b = events.withColumn("bkt", F.expr("event_id div 1000"))
    bmax = b.groupBy("bkt").agg(F.max("ts").alias("mx"))
    w = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    runmax = bmax.select("bkt", F.max("mx").over(w).alias("prev_mx"))
    late = F.col("prev_mx").isNotNull() & (
        F.col("ts") + F.expr("INTERVAL 10 MINUTES") < F.col("prev_mx")
    )
    return (
        b.join(F.broadcast(runmax), "bkt")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count_if(late).alias("n_late_10m"),
        )
    )


@query(
    "events_sequence_pattern",
    oracle="""
        WITH e AS (
            SELECT user_id, ts, event_id, epoch(ts) AS es,
                   lag(epoch(ts)) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev_es,
                   CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                        WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                        WHEN 'error' THEN 'e' ELSE 'x' END AS ch
            FROM events
        ),
        marked AS (
            SELECT *, CASE WHEN prev_es IS NULL OR es - prev_es > 21600
                           THEN 1 ELSE 0 END AS is_new
            FROM e
        ),
        sess AS (
            SELECT user_id, ts, event_id, ch,
                   sum(is_new) OVER (PARTITION BY user_id
                                     ORDER BY es, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
            FROM marked
        ),
        s AS (
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   string_agg(ch, '' ORDER BY ts, event_id) AS seq
            FROM sess GROUP BY user_id, session_id
        )
        SELECT user_id, session_id,
               CAST(length(seq) AS BIGINT) AS seq_len,
               md5(seq) AS seq_md5,
               CAST(len(regexp_extract_all(seq, 'vc')) AS BIGINT) AS n_view_click,
               CAST(CASE WHEN regexp_matches(seq, 's.*v.*c.*p')
                    THEN 1 ELSE 0 END AS BIGINT) AS funnel_complete,
               CAST(len(regexp_extract_all(seq, 'e+')) AS BIGINT) AS n_error_bursts,
               CAST(coalesce(list_max(list_transform(
                        regexp_extract_all(seq, 'e+'), x -> length(x))), 0)
                    AS BIGINT) AS max_error_run
        FROM s
    """,
    tags=("events", "behavioral", "sequence"),
)
def events_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-class row-pattern matching, Spark-first
    (operators/sequences.py): encode each user SESSION's time-ordered
    events as a char string (lag-gap-cumsum sessionization, 6-h gap —
    same cut as events_sessionize_stats — then one groupBy), and
    evaluate regex row patterns over it — immediate view→click
    adjacencies, the full signup→…→purchase subsequence, and
    error-burst shape (count + max run).  The per-session sequence md5
    pins the ENCODING (session cuts, order, tie-breaks, alphabet) and
    the pattern counts pin the regex semantics — Java regex and RE2
    agree on this syntax class, so the whole feature set is
    value-replayed.

    Scale: one user-keyed shuffle serves the session windows and the
    string agg; string length is bounded by SESSION size, so whale
    users with unbounded event counts produce many bounded strings —
    never one unbounded row (this is also how MATCH_RECOGNIZE
    partitions)."""
    from aws_genaric_datapipeline_spark.operators import sequences as Q

    (events,) = load(spark, sf_dir, "events")
    seqs = Q.encode_session_sequences(events)
    return seqs.select(
        F.col("key").alias("user_id"),
        "session_id",
        *Q.pattern_features(F.col("seq")),
    )


@query(
    "events_ewma_daily",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                   count(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT a.event_type, a.day,
               CAST(a.n AS BIGINT) AS n_events,
               round(sum(b.n * pow(0.7, date_diff('day', b.day, a.day)))
                     / sum(pow(0.7, date_diff('day', b.day, a.day))), 4) AS ewma
        FROM daily a
        JOIN daily b
          ON a.event_type = b.event_type
         AND date_diff('day', b.day, a.day) BETWEEN 0 AND 29
        GROUP BY a.event_type, a.day, a.n
    """,
    tags=("events", "timeseries"),
)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily event volume per
    type (α = 0.3), the standard trend-smoothing signal for volume
    monitoring.  The recursive definition ewma_t = α·x_t + (1-α)·ewma_{t-1}
    is a sequential dependency — hostile to distributed evaluation — so it
    is re-expressed as the CLOSED FORM over a truncated 30-lag window:
    weights (1-α)^Δ renormalized over the days present.  Truncation error
    is bounded by (1-α)^30 ≈ 2e-5 of the weight mass — below the 4-decimal
    output rounding — and the closed form is order-independent, which is
    what lets both engines (and any partitioning) agree exactly.

    Scale: the raw stream first collapses to (type, day) grain — the ONLY
    pass over the 100 TB — then the band self-join runs on types × days
    rows (KBs), partitioned by the equi key event_type with a ±30-day
    band predicate; cost is 30 rows per anchor, not days²."""
    (events,) = load(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    a = daily.select(
        "event_type", F.col("day").alias("day_a"), F.col("n").alias("n_a")
    )
    b = daily.select(
        F.col("event_type").alias("et_b"),
        F.col("day").alias("day_b"),
        F.col("n").alias("n_b"),
    )
    diff = F.datediff(F.col("day_a"), F.col("day_b"))
    w = F.pow(F.lit(0.7), diff.cast("double"))
    return (
        a.join(
            b,
            (F.col("event_type") == F.col("et_b")) & diff.between(0, 29),
        )
        .groupBy("event_type", "day_a", "n_a")
        .agg(F.round(F.sum(F.col("n_b") * w) / F.sum(w), 4).alias("ewma"))
        .select(
            "event_type",
            F.col("day_a").alias("day"),
            F.col("n_a").cast("bigint").alias("n_events"),
            "ewma",
        )
    )


@query(
    "events_cohort_ltv",
    oracle="""
        WITH firstw AS (
            SELECT user_id,
                   CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
            FROM events GROUP BY user_id
        ),
        rev AS (
            SELECT e.user_id, f.cohort_week,
                   CAST(date_diff('week', f.cohort_week,
                                  CAST(date_trunc('week', e.ts) AS DATE))
                        AS BIGINT) AS age_weeks,
                   CAST(round(e.value * 100) AS BIGINT) AS cents
            FROM events e JOIN firstw f ON f.user_id = e.user_id
            WHERE e.event_type = 'purchase'
        ),
        weekly AS (
            SELECT cohort_week, age_weeks,
                   CAST(sum(cents) AS BIGINT) AS week_cents
            FROM rev WHERE age_weeks BETWEEN 0 AND 12
            GROUP BY cohort_week, age_weeks
        ),
        sizes AS (
            SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users
            FROM firstw GROUP BY cohort_week
        )
        SELECT w.cohort_week, w.age_weeks, s.cohort_users,
               CAST(sum(w.week_cents) OVER (
                   PARTITION BY w.cohort_week ORDER BY w.age_weeks
               ) AS BIGINT) AS cum_revenue_cents,
               CAST(sum(w.week_cents) OVER (
                   PARTITION BY w.cohort_week ORDER BY w.age_weeks
               ) // s.cohort_users AS BIGINT) AS ltv_cents_per_user
        FROM weekly w JOIN sizes s ON s.cohort_week = w.cohort_week
    """,
    tags=("events", "analytics", "cohort"),
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users cohorted by first-seen week,
    purchase revenue accumulated over cohort age (weeks 0-12), reported
    as cumulative cents and exact integer LTV-per-user — the readout
    behind payback-period and retention-economics decisions
    (events_cohort_retention counts WHO returns; this prices WHAT they
    return with).  All money stays in bigint cents with integral
    division, so the curve is bit-deterministic.

    Scale: one user_id shuffle for cohorting, one (cohort, age) grid
    aggregation, and a window over the tiny grid — raw events never
    enter the window."""
    (events,) = load(spark, sf_dir, "events")
    from pyspark.sql import Window

    firstw = events.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    rev = (
        events.where(F.col("event_type") == "purchase")
        .join(firstw, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(
                    F.to_date(F.date_trunc("week", "ts")), F.col("cohort_week")
                )
                / 7
            )
            .cast("bigint")
            .alias("age_weeks"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .where(F.col("age_weeks").between(0, 12))
    )
    weekly = rev.groupBy("cohort_week", "age_weeks").agg(
        F.sum("cents").cast("bigint").alias("week_cents")
    )
    sizes = firstw.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_users")
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        weekly.join(F.broadcast(sizes), "cohort_week")
        .withColumn("cum_revenue_cents", F.sum("week_cents").over(w).cast("bigint"))
        .select(
            "cohort_week",
            "age_weeks",
            "cohort_users",
            "cum_revenue_cents",
            F.expr("cum_revenue_cents div cohort_users")
            .cast("bigint")
            .alias("ltv_cents_per_user"),
        )
    )


@query(
    "events_daily_percentile_bands",
    oracle="""
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n,
               round(quantile_cont(value, 0.1), 4) AS p10,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.9), 4) AS p90
        FROM events
        GROUP BY 1, 2
    """,
    tags=("events", "stats", "timeseries"),
)
def events_daily_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily p10/p50/p90 value bands per event type — the percentile
    ribbon behind latency/value dashboards, where means hide the tails.
    Spark's exact `percentile` interpolates identically to DuckDB's
    quantile_cont (same contract agg_percentile pins), so the bands are
    oracle-checked to 4 decimals.

    Scale: one (type, day) grouped aggregate; exact percentiles sort
    within group — swap for the mergeable histogram sketch
    (agg_quantile_histogram) when groups stop fitting a task."""
    (events,) = load(spark, sf_dir, "events")
    return events.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.percentile("value", F.lit(0.1)), 4).alias("p10"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
    )


@query(
    "events_funnel_step_timing",
    oracle="""
        WITH v AS (
            SELECT user_id, min(ts) AS t_view FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, min(e.ts) AS t_click
            FROM events e JOIN v ON v.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.ts > v.t_view
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, min(e.ts) AS t_purchase
            FROM events e JOIN c ON c.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.t_click
            GROUP BY e.user_id
        )
        SELECT 'view->click' AS step,
               CAST(count(*) AS BIGINT) AS n_users,
               median(epoch_us(c.t_click) - epoch_us(v.t_view)) / 1e6
                   AS median_gap_s
        FROM c JOIN v USING (user_id)
        UNION ALL
        SELECT 'click->purchase', CAST(count(*) AS BIGINT),
               median(epoch_us(p.t_purchase) - epoch_us(c.t_click)) / 1e6
        FROM p JOIN c USING (user_id)
    """,
    tags=("events", "funnel", "timeseries"),
)
def events_funnel_step_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel VELOCITY: exact median elapsed time between ordered funnel
    steps (first view → first subsequent click → first subsequent
    purchase per user) — events_funnel counts who survives each step;
    this measures how long the survivors take, the number behind
    time-to-convert SLAs and remarketing windows.  Gaps are exact
    integer microseconds before the median (sub-second timestamps round
    differently at second granularity across engines — the
    events_gap_report lesson), divided to seconds only at the output.

    Scale: three user-keyed min-aggregations + medians over one row per
    converting user."""
    (events,) = load(spark, sf_dir, "events")
    v = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        events.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id", "t_view")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .join(c.select("user_id", "t_click"), "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id", "t_click")
        .agg(F.min("ts").alias("t_purchase"))
    )
    vc = c.agg(
        F.lit("view->click").alias("step"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        (
            F.median(F.unix_micros("t_click") - F.unix_micros("t_view")) / 1e6
        ).alias("median_gap_s"),
    )
    cp = p.agg(
        F.lit("click->purchase").alias("step"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        (
            F.median(F.unix_micros("t_purchase") - F.unix_micros("t_click")) / 1e6
        ).alias("median_gap_s"),
    )
    return vc.unionByName(cp)


@query(
    "events_cusum_changepoint",
    oracle="""
        WITH RECURSIVE daily AS MATERIALIZED (
            SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS x,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY CAST(date_trunc('day', ts)
                                                    AS DATE)) AS idx
            FROM events GROUP BY 1, 2
        ),
        base AS MATERIALIZED (
            SELECT event_type, CAST(sum(x) AS BIGINT) AS M
            FROM daily WHERE idx <= 7
            GROUP BY 1 HAVING count(*) = 7
        ),
        seq AS MATERIALIZED (
            SELECT d.event_type, d.idx, d.day, d.x, b.M
            FROM daily d JOIN base b USING (event_type)
            WHERE d.idx > 7
        ),
        fin AS (
            SELECT d.event_type, max(d.idx) AS tmax
            FROM daily d JOIN base b USING (event_type)
            GROUP BY 1
        ),
        walk(event_type, idx, s, fa, na, mx) AS (
            SELECT event_type, CAST(7 AS BIGINT), CAST(0 AS BIGINT),
                   CAST(NULL AS DATE), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
            FROM base
            UNION ALL
            SELECT w.event_type, w.idx + 1,
                   greatest(0, w.s + (14 * q.x - 3 * q.M)),
                   CASE WHEN w.fa IS NULL
                             AND greatest(0, w.s + (14 * q.x - 3 * q.M))
                                 > 8 * q.M
                        THEN q.day ELSE w.fa END,
                   w.na + CASE WHEN greatest(0, w.s + (14 * q.x - 3 * q.M))
                                   > 8 * q.M
                               THEN 1 ELSE 0 END,
                   greatest(w.mx, greatest(0, w.s + (14 * q.x - 3 * q.M)))
            FROM walk w
            JOIN seq q ON q.event_type = w.event_type AND q.idx = w.idx + 1
        ),
        nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
               FROM daily GROUP BY 1)
        SELECT w.event_type,
               nd.n_days,
               CAST(floor(1000 * (b.M / 7.0)) AS BIGINT)
                   AS baseline_mean_milli,
               w.fa AS first_alarm_day,
               w.na AS n_alarm_days,
               w.mx AS max_cusum_scaled
        FROM walk w
        JOIN fin f ON f.event_type = w.event_type AND w.idx = f.tmax
        JOIN base b ON b.event_type = w.event_type
        JOIN nd ON nd.event_type = w.event_type
    """,
    tags=("events", "timeseries", "anomaly"),
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point detection per event type (Page 1954)
    — the classic sequential volume-shift detector, completing the
    anomaly family next to the rolling z-score (point outliers), EWMA
    (trend), seasonal residuals, and KS/PSI drift (distribution): the
    first 7 observed days fix an integer baseline M = Σx, then
    S_t = max(0, S_{t-1} + (x_t − μ − k)) runs over the remaining days
    with slack k = μ/2 and alarm threshold h = 4μ, entirely on the
    2W-scaled INTEGER lattice (14·x_t − 3M vs 8M) so the fold, the
    first-alarm day, and the max statistic are bit-exact cross-engine.

    The recursion is a genuine sequential fold (max(0,·) has no closed
    form, unlike EWMA's) — it runs as one JVM ``aggregate`` over each
    type's day-ordered array: the raw stream collapses to (type, day)
    grain in ONE pass (the only scan of the 100 TB), and the fold walks
    ≤days elements per type, driver-free; the oracle replays it as a
    recursive index walk.

    Returns (event_type, n_days, baseline_mean_milli, first_alarm_day,
    n_alarm_days, max_cusum_scaled) for types with ≥7 observed days."""
    daily = (
        load(spark, sf_dir, "events")[0]
        .groupBy(
            "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    idx = F.row_number().over(
        Window.partitionBy("event_type").orderBy("day")
    )
    d = daily.withColumn("idx", idx)
    base = (
        d.where(F.col("idx") <= 7)
        .groupBy("event_type")
        .agg(F.sum("x").alias("M"), F.count(F.lit(1)).alias("w7"))
        .where(F.col("w7") == 7)
        .drop("w7")
    )
    nd = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    seq = (
        d.where(F.col("idx") > 7)
        .groupBy("event_type")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("idx", "day", "x"))
            ).alias("arr")
        )
    )
    init = F.struct(
        F.lit(0).cast("bigint").alias("s"),
        F.lit(None).cast("date").alias("fa"),
        F.lit(0).cast("bigint").alias("na"),
        F.lit(0).cast("bigint").alias("mx"),
    )

    def step(acc, e):
        s2 = F.greatest(
            F.lit(0).cast("bigint"),
            acc["s"] + (F.lit(14) * e["x"] - F.lit(3) * F.col("M")),
        )
        alarm = s2 > F.lit(8) * F.col("M")
        return F.struct(
            s2.alias("s"),
            F.when(acc["fa"].isNull() & alarm, e["day"])
            .otherwise(acc["fa"])
            .alias("fa"),
            (acc["na"] + alarm.cast("bigint")).alias("na"),
            F.greatest(acc["mx"], s2).alias("mx"),
        )

    folded = (
        base.join(seq, "event_type", "left")
        .withColumn(
            "r",
            F.aggregate(
                F.coalesce(
                    F.col("arr"),
                    F.array().cast(
                        "array<struct<idx:int,day:date,x:bigint>>"
                    ),
                ),
                init,
                step,
            ),
        )
        .join(nd, "event_type")
    )
    return folded.select(
        "event_type",
        "n_days",
        F.floor(F.lit(1000) * (F.col("M") / F.lit(7.0)))
        .cast("bigint")
        .alias("baseline_mean_milli"),
        F.col("r.fa").alias("first_alarm_day"),
        F.col("r.na").alias("n_alarm_days"),
        F.col("r.mx").alias("max_cusum_scaled"),
    )
