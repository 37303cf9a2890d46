"""Behavioral / ML-evaluation queries over the event stream: temporal
holdout splitting, marketing-touch attribution, and Markov transition
structure.

These close the loop between the engine's event analytics (sessionize,
funnel, cohort retention) and its training-prep surface: the temporal
holdout is the leakage-safe recommender/eval split (leave-LAST-out per
user — a random split would leak future behavior into training), and
attribution/transitions are the standard product-analytics readouts.

All three are one shuffle on ``user_id`` + window functions + a
cardinality-bounded final aggregate — nothing wider than (user, event)
ever moves, so the shape survives a 1000-executor scale-up unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.tables import load


@query(
    "sample_temporal_holdout",
    oracle="""
        WITH ranked AS (
            SELECT event_type,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        SELECT CASE WHEN rn = 1 THEN 'test' ELSE 'train' END AS split,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events
        FROM ranked
        GROUP BY 1, 2
    """,
    tags=("sampling", "events", "trainprep"),
)
def sample_temporal_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-last-out temporal holdout: each user's chronologically LAST
    event (ties broken by event_id) becomes the test set, everything
    earlier is train — the leakage-safe split for sequential/recommender
    evaluation, where a random split would train on the future.  One
    window over the user partition; the split label never moves data a
    second time."""
    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    ranked = events.select(
        "event_type", F.row_number().over(w).alias("rn")
    )
    return ranked.groupBy(
        F.when(F.col("rn") == 1, "test").otherwise("train").alias("split"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n_events"))


@query(
    "events_attribution_touch",
    oracle="""
        WITH conv AS (
            SELECT user_id, ts AS cts, event_id AS cid
            FROM (
                SELECT user_id, ts, event_id,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS rn
                FROM events WHERE event_type = 'purchase'
            ) WHERE rn = 1
        ),
        touches AS (
            SELECT e.user_id, e.event_type, e.ts, e.event_id
            FROM events e JOIN conv c ON e.user_id = c.user_id
            WHERE e.ts < c.cts OR (e.ts = c.cts AND e.event_id < c.cid)
        ),
        ranked AS (
            SELECT user_id, event_type,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rf,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ) AS rl
            FROM touches
        ),
        f AS (
            SELECT event_type, count(*) AS first_touch
            FROM ranked WHERE rf = 1 GROUP BY 1
        ),
        l AS (
            SELECT event_type, count(*) AS last_touch
            FROM ranked WHERE rl = 1 GROUP BY 1
        )
        SELECT coalesce(f.event_type, l.event_type) AS channel,
               CAST(coalesce(first_touch, 0) AS BIGINT) AS first_touch,
               CAST(coalesce(last_touch, 0) AS BIGINT) AS last_touch
        FROM f FULL OUTER JOIN l ON f.event_type = l.event_type
    """,
    tags=("events", "analytics"),
)
def events_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch vs last-touch conversion attribution: for each user's
    FIRST purchase, credit the earliest and the latest event strictly
    before it (users whose first event is the purchase itself carry no
    touches and drop out).  The two credit models bracket the standard
    attribution spectrum; both come from one ranked pass over the
    pre-conversion touches."""
    (events,) = load(spark, sf_dir, "events")
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id")
    conv = (
        events.where(F.col("event_type") == "purchase")
        .select(
            "user_id", "ts", "event_id", F.row_number().over(wc).alias("rn")
        )
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("cts"),
            F.col("event_id").alias("cid"),
        )
    )
    touches = events.join(conv, "user_id").where(
        (F.col("ts") < F.col("cts"))
        | ((F.col("ts") == F.col("cts")) & (F.col("event_id") < F.col("cid")))
    )
    wf = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wl = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    ranked = touches.select(
        "user_id",
        "event_type",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wl).alias("rl"),
    )
    first = (
        ranked.where(F.col("rf") == 1)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("first_touch"))
    )
    last = (
        ranked.where(F.col("rl") == 1)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("last_touch"))
    )
    return (
        first.join(last, "event_type", "full_outer")
        .select(
            F.col("event_type").alias("channel"),
            F.coalesce("first_touch", F.lit(0)).cast("bigint").alias(
                "first_touch"
            ),
            F.coalesce("last_touch", F.lit(0)).cast("bigint").alias(
                "last_touch"
            ),
        )
    )


@query(
    "events_markov_transitions",
    oracle="""
        WITH seq AS (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS to_type
            FROM events
        ),
        t AS (
            SELECT from_type, to_type, count(*) AS n
            FROM seq WHERE to_type IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
               round(n / CAST(sum(n) OVER (PARTITION BY from_type)
                              AS DOUBLE), 4) AS prob
        FROM t
    """,
    tags=("events", "analytics"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for each
    consecutive event pair within a user's timeline, the transition
    count and row-normalized probability — the structure behind "what
    happens after an error" product questions and sequence-model priors.
    One lead() window and a |types|²-bounded aggregate."""
    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    t = (
        seq.where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wn = Window.partitionBy("from_type")
    return t.select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") / F.sum("n").over(wn).cast("double"), 4).alias(
            "prob"
        ),
    )
