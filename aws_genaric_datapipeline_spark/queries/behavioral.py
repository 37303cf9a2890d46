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


_MRK_ROUNDS = 5


def _mrk_round_sql(k: int) -> str:
    prev = f"v{k - 1}"
    return f"""
        v{k} AS (
            SELECT st.scen, st.state,
                   st.pconv + coalesce(sum(t.p * prev.val), 0) AS val
            FROM sts st
            LEFT JOIN strans t
              ON t.scen = st.scen AND t.src = st.state
             AND t.dst NOT IN ('CONV', 'NULL')
            LEFT JOIN {prev} prev
              ON prev.scen = t.scen AND prev.state = t.dst
            GROUP BY st.scen, st.state, st.pconv
        )"""


_MRK_BASE_CTES = """
        ev AS (
            SELECT user_id, event_type,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events
        ),
        firstp AS (
            SELECT user_id, min(rn) AS prn FROM ev
            WHERE event_type = 'purchase' GROUP BY user_id
        ),
        kept AS (
            SELECT e.* FROM ev e LEFT JOIN firstp f ON e.user_id = f.user_id
            WHERE f.prn IS NULL OR e.rn <= f.prn
        ),
        pairs AS (
            SELECT user_id, event_type AS src,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY rn) AS nxt
            FROM kept
        ),
        edges AS (
            SELECT 'START' AS src,
                   CASE WHEN event_type = 'purchase' THEN 'CONV'
                        ELSE event_type END AS dst
            FROM kept WHERE rn = 1
            UNION ALL
            SELECT src,
                   CASE WHEN nxt = 'purchase' THEN 'CONV'
                        WHEN nxt IS NULL THEN 'NULL'
                        ELSE nxt END AS dst
            FROM pairs WHERE src <> 'purchase'
        ),
        trans AS (
            SELECT src, dst,
                   count(*) / CAST(sum(count(*)) OVER (PARTITION BY src)
                                   AS DOUBLE) AS p
            FROM edges GROUP BY src, dst
        ),
        chans AS (
            SELECT DISTINCT src AS c FROM trans WHERE src <> 'START'
        ),
        scens AS (
            SELECT 'none' AS scen, NULL AS removed
            UNION ALL SELECT c, c FROM chans
        ),
        strans AS (
            SELECT s.scen, t.src,
                   CASE WHEN t.dst = s.removed THEN 'NULL' ELSE t.dst END AS dst,
                   sum(t.p) AS p
            FROM scens s JOIN trans t
              ON s.removed IS NULL OR t.src <> s.removed
            GROUP BY 1, 2, 3
        ),
        sts AS (
            SELECT scen, src AS state,
                   coalesce(sum(CASE WHEN dst = 'CONV' THEN p END), 0) AS pconv
            FROM strans GROUP BY scen, src
        ),
        v0 AS (SELECT scen, state, pconv AS val FROM sts)"""


@query(
    "events_attribution_removal",
    oracle=f"""
        WITH {_MRK_BASE_CTES},
        {",".join(_mrk_round_sql(k) for k in range(1, _MRK_ROUNDS + 1))}
        SELECT c.c AS channel,
               round(full_p.val, 4) AS p_conv_full,
               round(rem.val, 4) AS p_conv_removed,
               round(1 - rem.val / full_p.val, 4) AS removal_effect
        FROM chans c
        JOIN v{_MRK_ROUNDS} full_p
          ON full_p.scen = 'none' AND full_p.state = 'START'
        JOIN v{_MRK_ROUNDS} rem ON rem.scen = c.c AND rem.state = 'START'
    """,
    tags=("events", "attribution", "markov"),
)
def events_attribution_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution (Anderl et al. 2014): model user
    journeys as a first-order chain START → channels → CONV/NULL
    (journeys truncate at the first purchase), then credit each channel
    by how much conversion probability DISAPPEARS when it is removed
    (its inbound edges re-routed to NULL) — the data-driven alternative
    to last-touch heuristics (events_attribution_touch).

    Absorption probability is evaluated as P(conversion within
    {_MRK_ROUNDS} hops) — a FIXED-horizon unrolled iteration, not a
    matrix solve, so the DuckDB oracle replays it exactly (same pattern
    as the PageRank/LPA fixed-round oracles).

    Scale: the only data-sized pass is journey → edge extraction (one
    user_id shuffle + windows).  The chain lives on |channels|²·
    |scenarios| rows (dozens); the {_MRK_ROUNDS}-round evaluation joins
    frames of that size — driver-free, broadcast-class."""
    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = events.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    firstp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    kept = ev.join(F.broadcast(firstp), "user_id", "left").where(
        F.col("prn").isNull() | (F.col("rn") <= F.col("prn"))
    )
    wk = Window.partitionBy("user_id").orderBy("rn")
    pairs = kept.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(wk).alias("nxt"),
        "rn",
    )
    start_edges = kept.where(F.col("rn") == 1).select(
        F.lit("START").alias("src"),
        F.when(F.col("event_type") == "purchase", "CONV")
        .otherwise(F.col("event_type"))
        .alias("dst"),
    )
    step_edges = pairs.where(F.col("src") != "purchase").select(
        "src",
        F.when(F.col("nxt") == "purchase", "CONV")
        .when(F.col("nxt").isNull(), "NULL")
        .otherwise(F.col("nxt"))
        .alias("dst"),
    )
    edges = start_edges.unionByName(step_edges)
    ws = Window.partitionBy("src")
    trans = (
        edges.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "src", "dst", (F.col("n") / F.sum("n").over(ws).cast("double")).alias("p")
        )
    )
    chans = trans.where(F.col("src") != "START").select(
        F.col("src").alias("c")
    ).distinct()
    scens = chans.select(
        F.col("c").alias("scen"), F.col("c").alias("removed")
    ).unionByName(
        chans.sparkSession.createDataFrame(
            [("none", None)], "scen string, removed string"
        )
    )
    strans = (
        F.broadcast(scens)
        .join(trans, F.col("removed").isNull() | (F.col("src") != F.col("removed")))
        .select(
            "scen",
            "src",
            F.when(F.col("dst") == F.col("removed"), "NULL")
            .otherwise(F.col("dst"))
            .alias("dst"),
            "p",
        )
        .groupBy("scen", "src", "dst")
        .agg(F.sum("p").alias("p"))
        .localCheckpoint(eager=True)  # tiny; cuts the re-derivation below
    )
    sts = strans.groupBy("scen", F.col("src").alias("state")).agg(
        F.coalesce(
            F.sum(F.when(F.col("dst") == "CONV", F.col("p"))), F.lit(0.0)
        ).alias("pconv")
    ).localCheckpoint(eager=True)
    inner = strans.where(~F.col("dst").isin("CONV", "NULL")).select(
        F.col("scen").alias("t_scen"),
        F.col("src").alias("t_src"),
        F.col("dst").alias("t_dst"),
        F.col("p").alias("t_p"),
    )
    v = sts.select("scen", "state", F.col("pconv").alias("val"))
    for _ in range(_MRK_ROUNDS):
        v = (
            sts.join(
                inner,
                (F.col("t_scen") == F.col("scen")) & (F.col("t_src") == F.col("state")),
                "left",
            )
            .join(
                v.select(
                    F.col("scen").alias("v_scen"),
                    F.col("state").alias("v_state"),
                    F.col("val").alias("v_val"),
                ),
                (F.col("v_scen") == F.col("t_scen"))
                & (F.col("v_state") == F.col("t_dst")),
                "left",
            )
            .groupBy("scen", "state", "pconv")
            .agg(
                (
                    F.first("pconv")
                    + F.coalesce(F.sum(F.col("t_p") * F.col("v_val")), F.lit(0.0))
                ).alias("val")
            )
            .select("scen", "state", "val")
        )
    full_p = v.where((F.col("scen") == "none") & (F.col("state") == "START")).select(
        F.col("val").alias("pf")
    )
    rem = v.where(F.col("state") == "START").where(F.col("scen") != "none").select(
        F.col("scen").alias("channel"), F.col("val").alias("pr")
    )
    return rem.crossJoin(F.broadcast(full_p)).select(
        "channel",
        F.round("pf", 4).alias("p_conv_full"),
        F.round("pr", 4).alias("p_conv_removed"),
        F.round(1 - F.col("pr") / F.col("pf"), 4).alias("removal_effect"),
    )


@query(
    "events_markov_next_accuracy",
    oracle="""
        WITH seq AS (
            SELECT event_type AS cur,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS nxt
            FROM events
        ),
        t AS (
            SELECT cur, nxt, count(*) AS n FROM seq
            WHERE nxt IS NOT NULL GROUP BY 1, 2
        ),
        pred AS (
            SELECT cur, nxt AS predicted FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY cur ORDER BY n DESC, nxt) AS rn
                FROM t
            ) WHERE rn = 1
        )
        SELECT t.cur AS event_type, p.predicted,
               CAST(sum(t.n) AS BIGINT) AS n_transitions,
               CAST(sum(CASE WHEN t.nxt = p.predicted THEN t.n ELSE 0 END)
                    AS BIGINT) AS n_correct,
               round(sum(CASE WHEN t.nxt = p.predicted THEN t.n ELSE 0 END)
                     / CAST(sum(t.n) AS DOUBLE), 4) AS top1_accuracy
        FROM t JOIN pred p ON p.cur = t.cur
        GROUP BY t.cur, p.predicted
    """,
    tags=("events", "markov", "ml-eval"),
)
def events_markov_next_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event prediction baseline and its in-sample top-1 accuracy:
    the majority-successor predictor derived from the first-order
    transition matrix (events_markov_transitions), evaluated against the
    very transitions that trained it — the sanity floor every sequence
    model must beat, and the deterministic-tie-break argmax pattern
    (count desc, label) that keeps model selection reproducible across
    engines.

    Scale: one user_id-keyed window pass over the stream, then
    everything runs on the |types|² transition grid."""
    (events,) = load(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    t = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    pw = Window.partitionBy("cur").orderBy(F.desc("n"), F.asc("nxt"))
    pred = (
        t.withColumn("rn", F.row_number().over(pw))
        .where(F.col("rn") == 1)
        .select("cur", F.col("nxt").alias("predicted"))
    )
    return (
        t.join(F.broadcast(pred), "cur")
        .groupBy(F.col("cur").alias("event_type"), "predicted")
        .agg(
            F.sum("n").cast("bigint").alias("n_transitions"),
            F.sum(F.when(F.col("nxt") == F.col("predicted"), F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("n_correct"),
            F.round(
                F.sum(
                    F.when(F.col("nxt") == F.col("predicted"), F.col("n")).otherwise(0)
                )
                / F.sum("n").cast("double"),
                4,
            ).alias("top1_accuracy"),
        )
    )


@query(
    "events_ab_test_report",
    oracle="""
        WITH assign AS (
            SELECT user_id, user_id % 2 AS grp,
                   CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                 THEN CAST(round(value * 100) AS BIGINT)
                                 ELSE 0 END) >= 50000
                        THEN 1 ELSE 0 END AS converted
            FROM events GROUP BY user_id
        ),
        g AS (
            SELECT grp, count(*) AS n, sum(converted) AS conv
            FROM assign GROUP BY grp
        ),
        wide AS (
            SELECT
                (SELECT n FROM g WHERE grp = 0) AS n_a,
                (SELECT conv FROM g WHERE grp = 0) AS conv_a,
                (SELECT n FROM g WHERE grp = 1) AS n_b,
                (SELECT conv FROM g WHERE grp = 1) AS conv_b
        )
        SELECT CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
               round(conv_a / CAST(n_a AS DOUBLE), 4) AS rate_a,
               CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
               round(conv_b / CAST(n_b AS DOUBLE), 4) AS rate_b,
               round(conv_b / CAST(n_b AS DOUBLE)
                     - conv_a / CAST(n_a AS DOUBLE), 4) AS uplift,
               round(
                   (conv_b / CAST(n_b AS DOUBLE) - conv_a / CAST(n_a AS DOUBLE))
                   / sqrt(
                       ((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                       * (1 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                       * (1.0 / n_a + 1.0 / n_b)
                   ), 4) AS z_stat
        FROM wide
    """,
    tags=("events", "experimentation"),
)
def events_ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion experiment readout: user-level conversion (total
    purchase value >= 500, in exact integer cents so the flag cannot
    flip on a float summation boundary) split by a deterministic
    assignment (user_id parity stands in for the experiment bucket
    column), with rates, uplift, and the pooled two-proportion
    z-statistic — the standard A/B decision surface.  Conversion is a
    USER-level fold, not event counts — the classic clustered-
    randomization mistake this query's shape avoids.

    Scale: one groupBy(user) fold to conversion flags, one 2-row group
    count, scalar arithmetic — nothing wider than user_id shuffles."""
    (events,) = load(spark, sf_dir, "events")
    assign = events.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("bigint"),
                ).otherwise(0)
            )
            >= 50000,
            1,
        )
        .otherwise(0)
        .alias("converted")
    ).select((F.col("user_id") % 2).alias("grp"), "converted")
    g = assign.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    wide = (
        g.groupBy()
        .pivot("grp", [0, 1])
        .agg(F.first("n").alias("n"), F.first("conv").alias("conv"))
        .select(
            F.col("0_n").alias("n_a"),
            F.col("0_conv").alias("conv_a"),
            F.col("1_n").alias("n_b"),
            F.col("1_conv").alias("conv_b"),
        )
    )
    ra = F.col("conv_a") / F.col("n_a").cast("double")
    rb = F.col("conv_b") / F.col("n_b").cast("double")
    pooled = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    return wide.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("conv_a").cast("bigint").alias("conv_a"),
        F.round(ra, 4).alias("rate_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("conv_b").cast("bigint").alias("conv_b"),
        F.round(rb, 4).alias("rate_b"),
        F.round(rb - ra, 4).alias("uplift"),
        F.round(
            (rb - ra)
            / F.sqrt(
                pooled
                * (1 - pooled)
                * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
            ),
            4,
        ).alias("z_stat"),
    )
