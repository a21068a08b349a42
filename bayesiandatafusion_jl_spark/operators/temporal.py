"""Temporal joins & sessionization (SURVEY §2 C7, C8, J9).

Not in the reference (batch-only ML library); required by the north-star
events analytics. All formulations are pure window/join compositions — no
UDFs, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.registry import register


@register(
    "q_join_range",
    oracle="""
    SELECT a.user_id AS user_id, COUNT(*) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 10 MINUTE
    WHERE a.event_type = 'view' AND b.event_type = 'purchase'
    GROUP BY a.user_id
    """,
    tags=("C7",),
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 — range (theta) join: view→purchase pairs within 10 minutes.

    Equality on user_id makes this an equi-join with a range residual, so
    Catalyst runs sort-merge on user_id and post-filters the time band — it
    never degenerates to a cartesian product. At 100 TB the additional
    defense is bucketing both sides by time bucket and joining on
    (user_id, bucket±1), which bounds each task's pair candidates.
    """
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").alias("a")
    b = ev.filter(F.col("event_type") == "purchase").alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 10 MINUTE")),
        )
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "q_join_asof",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
             MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS last_click_ts
      FROM events
      WHERE event_type IN ('click', 'purchase')
    )
    SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, last_click_ts
    FROM flagged
    WHERE event_type = 'purchase'
    """,
    tags=("C8",),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 — as-of join: latest prior click before each purchase, per user.

    Spark has no native as-of join; the scalable formulation is a union +
    running ``MAX(CASE WHEN ...)`` window — one shuffle on user_id, no
    self-join, no per-row probe. (A merge-join as-of would need a range
    partitioner; the window form gets the same single-shuffle plan for
    free.)
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = ev.withColumn(
        "last_click_ts",
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w),
    )
    return flagged.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "last_click_ts",
    )


_SESSION_ORACLE = """
    WITH gaps AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sessions
    GROUP BY user_id, session_id
    """


@register("q_stream_session", oracle=_SESSION_ORACLE, tags=("J9",))
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 — gap-based sessionization (30-min inactivity), batch form.

    lag → new-session flag → running sum = session id (E3+E5 composition).
    The streaming twin is ``F.session_window`` (streaming/windows.py); this
    batch form is the oracle-checkable semantics reference.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (F.col("ts") - F.col("prev_ts") > F.expr("INTERVAL 30 MINUTE")),
            1,
        ).otherwise(0),
    )
    sessions = gaps.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )



def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap: str | None = None,
) -> DataFrame:
    """Per-user ORDERED funnel timestamps: one row per user who reached
    step 1, with ``t1..tn`` = the earliest time step i happened STRICTLY
    AFTER the user's step i-1 time (null once the chain breaks). The
    strict-order semantics product analytics means by "funnel": a
    purchase logged before the signup does not convert the signup.

    Shape: step 1 is one hash aggregate over the step-1 slice; each later
    step joins the (|users-in-funnel|)-row frame against that step's
    filtered slice and re-aggregates — every frame after the first scan
    is USER-grain, so per-step cost is a join keyed on user_id between
    one shrinking frame and one selective slice, never an all-events
    window sort. len(steps) is small and fixed (3–6 in practice); at
    100 TB each slice join is AQE-broadcastable whenever the funnel
    population fits, and all steps reuse the same user_id partitioning.

    ``max_gap`` (e.g. ``"30 minutes"``) bounds each transition: step i
    must land within that interval AFTER step i-1 or the chain breaks —
    the conversion-window semantics real funnels are defined with (a
    purchase six months after the signup email is not that campaign's
    conversion).
    """
    u, ty, ts = user_col, type_col, ts_col
    per_user = (
        events.filter(F.col(ty) == steps[0])
        .groupBy(u)
        .agg(F.min(ts).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        sl = events.filter(F.col(ty) == step).select(u, ts)
        qualifies = F.col(ts) > F.col(f"t{i - 1}")
        if max_gap is not None:
            qualifies = qualifies & (
                F.col(ts) <= F.col(f"t{i - 1}") + F.expr(f"INTERVAL {max_gap}")
            )
        per_user = (
            per_user.join(sl, u, "left")
            .groupBy(u)
            .agg(
                *[F.max(f"t{j}").alias(f"t{j}") for j in range(1, i)],
                F.min(F.when(qualifies, F.col(ts))).alias(f"t{i}"),
            )
        )
    return per_user


@register(
    "q_events_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT s1.user_id, MIN(CASE WHEN e.ts > s1.t1 THEN e.ts END) AS t2
      FROM s1 LEFT JOIN events e
        ON e.user_id = s1.user_id AND e.event_type = 'view'
      GROUP BY s1.user_id
    ),
    s3 AS (
      SELECT s2.user_id, MIN(CASE WHEN e.ts > s2.t2 THEN e.ts END) AS t3
      FROM s2 LEFT JOIN events e
        ON e.user_id = s2.user_id AND e.event_type = 'purchase'
      GROUP BY s2.user_id
    ),
    c AS (
      SELECT COUNT(s1.t1) AS n1, COUNT(s2.t2) AS n2, COUNT(s3.t3) AS n3
      FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)
    )
    SELECT 1 AS step, 'signup' AS event_type, n1 AS users,
           ROUND(CAST(n1 AS DOUBLE) / n1, 4) AS conv FROM c
    UNION ALL
    SELECT 2, 'view', n2, ROUND(CAST(n2 AS DOUBLE) / n1, 4) FROM c
    UNION ALL
    SELECT 3, 'purchase', n3, ROUND(CAST(n3 AS DOUBLE) / n1, 4) FROM c
    """,
    tags=("E3", "J9", "funnel"),
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup → view → purchase: users reaching
    each step (in strict time order within a user) and the conversion
    rate vs step 1. The per-user frame comes from ``funnel_steps``; the
    readout is one user-grain aggregate unpivoted with ``stack``."""
    steps = ["signup", "view", "purchase"]
    ev = load_table(spark, sf_dir, "events")
    per_user = funnel_steps(ev, steps)
    counts = per_user.agg(
        *[F.count(f"t{i}").alias(f"n{i}") for i in range(1, len(steps) + 1)]
    )
    stack_args = []
    for i, s in enumerate(steps, start=1):
        stack_args += [F.lit(i), F.lit(s), F.col(f"n{i}")]
    return (
        counts.select(
            F.stack(F.lit(len(steps)), *stack_args).alias(
                "step", "event_type", "users"
            ),
            F.col("n1").alias("__n1"),
        )
        .withColumn(
            "conv", F.round(F.col("users").cast("double") / F.col("__n1"), 4)
        )
        .drop("__n1")
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    grain: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by the period of their
    FIRST event (the cohort), then counted in every later period they
    were active — the third leg of the events-analytics triad
    (sessionize → funnel → retention).

    Shape: one (user, period) distinct aggregate over events (the only
    data-scaled motion, map-side combinable), one user-grain min to form
    cohorts, one shrinking join + count. Cohort sizes rejoin by
    broadcast — everything after the first aggregate is user- or
    cohort-grain.

    Returns (cohort, period_n, users, cohort_size, retention):
    ``period_n`` = whole ``grain`` periods since the cohort period
    (0 = the cohort period itself, retention 1.0 by construction).
    """
    u, ts = user_col, ts_col
    active = (
        events.select(u, F.date_trunc(grain, F.col(ts)).alias("__p"))
        .distinct()
    )
    cohorts = active.groupBy(u).agg(F.min("__p").alias("cohort"))
    step_days = {"week": 7, "day": 1}.get(grain)
    if step_days is None:
        raise ValueError(f"grain must be 'week' or 'day', got {grain!r}")
    joined = active.join(cohorts, u).select(
        u,
        "cohort",
        (
            F.datediff(F.col("__p"), F.col("cohort")) / F.lit(step_days)
        ).cast("int").alias("period_n"),
    )
    counts = joined.groupBy("cohort", "period_n").agg(
        F.count_distinct(F.col(u)).alias("users")
    )
    sizes = cohorts.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return counts.join(F.broadcast(sizes), "cohort").select(
        "cohort",
        "period_n",
        "users",
        "cohort_size",
        F.round(
            F.col("users").cast("double") / F.col("cohort_size"), 4
        ).alias("retention"),
    )


@register(
    "q_events_retention",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS p FROM events
    ),
    cohorts AS (
      SELECT user_id, MIN(p) AS cohort FROM active GROUP BY user_id
    ),
    joined AS (
      SELECT a.user_id, c.cohort,
             CAST(datediff('day', c.cohort, a.p) / 7 AS INT) AS period_n
      FROM active a JOIN cohorts c USING (user_id)
    ),
    counts AS (
      SELECT cohort, period_n, COUNT(DISTINCT user_id) AS users
      FROM joined GROUP BY cohort, period_n
    ),
    sizes AS (
      SELECT cohort, COUNT(*) AS cohort_size FROM cohorts GROUP BY cohort
    )
    SELECT co.cohort AS cohort, co.period_n AS period_n,
           co.users AS users, s.cohort_size AS cohort_size,
           ROUND(CAST(co.users AS DOUBLE) / s.cohort_size, 4) AS retention
    FROM counts co JOIN sizes s USING (cohort)
    """,
    tags=("J9", "retention", "events"),
    demoted=True,
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over events (see ``cohort_retention``),
    hash-exact vs the oracle's window-free CTE formulation."""
    return cohort_retention(load_table(spark, sf_dir, "events"))


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    session_gap_s: int | None = None,
) -> DataFrame:
    """(from_type, to_type, n, p): the first-order Markov transition
    matrix of per-user event sequences — the "what happens next"
    readout behind next-action prediction, funnel design, and anomaly
    baselines (a session whose transitions are improbable under this
    matrix is an outlier).

    Each user's events are ordered by ``order_cols`` (the trailing
    unique key makes the order — and therefore the matrix — fully
    deterministic under timestamp ties); consecutive pairs are counted
    and normalized per source state: p = n(from→to) / Σ_to n(from→to).

    Scale shape: ONE window partitioned by user (user-grain shuffle, no
    global sort — each user's sequence sorts independently inside its
    partition), one shrinking aggregation onto the |types|² matrix, and
    the marginal as a window SUM over that matrix — the whole plan reads
    the events once (a separate marginals aggregate would duplicate the
    window subtree: measured 6 exchanges/2 scans vs this form's 4/1). p
    is a single division of exact counts, bit-identical cross-engine.

    ``session_gap_s`` (optional): pairs whose FROM→TO gap exceeds this
    many seconds are dropped — "what happens next within a session"
    instead of across days of idleness. The same lead window provides
    the next timestamp, so the plan shape is unchanged (one scan).
    """
    w = W.partitionBy(user_col).orderBy(*[F.col(c) for c in order_cols])
    pairs = (
        events.select(user_col, type_col, *order_cols)
        .withColumn("to_type", F.lead(type_col).over(w))
        .filter(F.col("to_type").isNotNull())
    )
    if session_gap_s is not None:
        ts_col = order_cols[0]
        gap = F.lead(F.col(ts_col)).over(w).cast("long") - F.col(
            ts_col
        ).cast("long")
        pairs = (
            events.select(user_col, type_col, *order_cols)
            .withColumn("to_type", F.lead(type_col).over(w))
            .withColumn("__gap_s", gap)
            .filter(
                F.col("to_type").isNotNull()
                & (F.col("__gap_s") <= session_gap_s)
            )
        )
    counts = pairs.groupBy(
        F.col(type_col).alias("from_type"), "to_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    n_from = F.sum("n").over(W.partitionBy("from_type"))
    return (
        counts.select(
            "from_type",
            "to_type",
            F.col("n").cast("bigint").alias("n"),
            (F.col("n").cast("double") / n_from).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


@register(
    "q_events_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS to_type
      FROM events
    ),
    c AS (
      SELECT event_type AS from_type, to_type, COUNT(*) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY event_type, to_type
    ),
    t AS (SELECT from_type, SUM(n) AS n_from FROM c GROUP BY from_type)
    SELECT c.from_type AS from_type, c.to_type AS to_type,
           CAST(c.n AS BIGINT) AS n,
           CAST(c.n AS DOUBLE) / t.n_from AS p
    FROM c JOIN t USING (from_type)
    ORDER BY from_type, to_type
    """,
    tags=("J9", "markov", "events"),
    demoted=True,
)
def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix over the events table
    (see ``event_transitions``) — hash-exact vs the window CTE oracle."""
    return event_transitions(load_table(spark, sf_dir, "events"))


def transition_anomaly(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """(user_id, n_transitions, mean_nll): per-user anomaly score under
    the corpus's own first-order transition matrix — mean −ln p over the
    user's consecutive (from → to) pairs. A user whose behavior follows
    the crowd scores near the corpus entropy; a scripted or broken
    client (improbable transition chains) scores high. The
    self-trained-model discipline of ``unigram_nll``, applied to
    behavior instead of text.

    Plan: the SAME one-window pair stream feeds both the |types|² matrix
    and the per-user scoring — the pair stream is checkpointed, so the
    events are read once; the matrix joins back as a broadcast. Each
    −ln p is float32-collapsed (libm ulp absorption) and decimal-summed
    per user (order-independent), the exprs.py parity discipline.
    """
    from bayesiandatafusion_jl_spark.functions.exprs import DEC
    from bayesiandatafusion_jl_spark.session import checkpoint_df

    w = W.partitionBy(user_col).orderBy(*[F.col(c) for c in order_cols])
    pairs = checkpoint_df(
        events.select(user_col, type_col, *order_cols)
        .withColumn("to_type", F.lead(type_col).over(w))
        .filter(F.col("to_type").isNotNull())
        .select(
            F.col(user_col).alias("user_id"),
            F.col(type_col).alias("from_type"),
            "to_type",
        )
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    matrix = counts.select(
        "from_type",
        "to_type",
        (
            F.col("n").cast("double")
            / F.sum("n").over(W.partitionBy("from_type"))
        ).alias("p"),
    )
    nll = (-F.log("p")).cast("float").cast("double")
    return (
        pairs.join(F.broadcast(matrix), ["from_type", "to_type"])
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
            (
                F.sum(nll.cast(DEC)).cast("double") / F.count(F.lit(1))
            ).alias("mean_nll"),
        )
    )


@register(
    "q_events_anomaly",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS to_type
      FROM events
    ),
    pairs AS (SELECT * FROM seq WHERE to_type IS NOT NULL),
    c AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM pairs GROUP BY from_type, to_type
    ),
    m AS (
      SELECT from_type, to_type,
             CAST(n AS DOUBLE)
               / SUM(n) OVER (PARTITION BY from_type) AS p
      FROM c
    )
    SELECT pr.user_id AS user_id,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           CAST(SUM(CAST(CAST(CAST(-LN(m.p) AS REAL) AS DOUBLE)
                 AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS mean_nll
    FROM pairs pr
    JOIN m ON m.from_type = pr.from_type AND m.to_type = pr.to_type
    GROUP BY pr.user_id
    """,
    tags=("J9", "markov", "anomaly", "events"),
    demoted=True,
)
def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral anomaly score under the corpus's own
    transition matrix (see ``transition_anomaly``) — hash-exact vs the
    window-CTE oracle."""
    return transition_anomaly(load_table(spark, sf_dir, "events"))
