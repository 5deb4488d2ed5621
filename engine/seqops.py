"""Ordered-event sequence analytics — funnels, activity streaks, transition
matrices, CUSUM drift detection, seasonal-naive backtests.

These are the event-sequence operators a transcript/timeseries store serves
next to its tier algebra (product-analytics funnels, gaps-and-islands
streaks, Markov-style transition counts, SPC change detection). Everything
is expressed Spark-first — window functions, partial+final aggregates,
equi-joins — and registered under the DuckDB hash gate with the same
portability discipline as engine/queries.py (integer cents, unique ORDER BY
keys, explicit ROWS frames).

The CUSUM operator is the interesting one: the textbook recurrence
``s_t = max(0, s_{t-1} + d_t)`` looks inherently sequential (per-row
Python), but it has a closed prefix form

    s_t = cs_t - min(0, min_{j<=t} cs_j)      with cs = running sum of d

(proof by induction: max(0, cs_t - m_{t-1}) = cs_t - min(cs_t, m_{t-1}) and
m_{t-1} <= 0, so the running min absorbs the reset). That turns a stateful
scan into two stacked window aggregates — whole-stage-codegen JVM
execution, one exchange, exact integer state — and makes it DuckDB-
expressible, so the hash gate pins the semantics (tests/test_seqops.py
additionally asserts the identity against the literal recurrence).

Scale notes (100 TB):
- every operator below is one shuffle keyed on user_id (window partition or
  groupBy key) plus bounded per-user state; no driver collects, no
  cartesian products;
- the funnel is three partial+final aggregates chained by per-user
  equi-joins — step tables shrink monotonically, and at 10^9 users they
  shuffle-hash-join on the same key without re-partitioning;
- seasonal-naive backtesting joins the HOURLY aggregate to itself on an
  integer hour index (hr vs hr-168) — the join runs on tier-sized data,
  never raw events.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .queries import _t, cents, register

_US = 1_000_000


def _events_us(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("us"),
        F.col("ts"),
    )


# ---------------------------------------------------------------------------
# Ordered funnel (view -> click -> purchase)
# ---------------------------------------------------------------------------


@register(
    "funnel_conversion_steps",
    """
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    t1 AS (
      SELECT user_id, MIN(us) AS t1 FROM e
      WHERE event_type = 'view' GROUP BY user_id),
    t2 AS (
      SELECT e.user_id, MIN(us) AS t2 FROM e JOIN t1 USING (user_id)
      WHERE event_type = 'click' AND us > t1 GROUP BY e.user_id),
    t3 AS (
      SELECT e.user_id, MIN(us) AS t3 FROM e JOIN t2 USING (user_id)
      WHERE event_type = 'purchase' AND us > t2 GROUP BY e.user_id)
    SELECT '1_view' AS step, COUNT(*) AS users FROM t1
    UNION ALL SELECT '2_click', COUNT(*) FROM t2
    UNION ALL SELECT '3_purchase', COUNT(*) FROM t3
    ORDER BY step
    """,
)
def funnel_conversion_steps(spark, sf_dir):
    """Ordered three-step funnel: a user converts step k only with an event
    strictly after their step-(k-1) timestamp. Each step is a partial+final
    MIN aggregate; steps chain by per-user equi-join, so the table shrinks
    at every stage and nothing ever leaves the user_id partitioning."""
    e = _events_us(spark, sf_dir)
    t1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    t2 = (
        e.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    t3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )

    def step(df, label):
        return df.agg(F.count("*").alias("users")).select(
            F.lit(label).alias("step"), "users"
        )

    return (
        step(t1, "1_view")
        .unionAll(step(t2, "2_click"))
        .unionAll(step(t3, "3_purchase"))
        .orderBy("step")
    )


# ---------------------------------------------------------------------------
# Activity streaks (gaps-and-islands over active days)
# ---------------------------------------------------------------------------


@register(
    "activity_streaks_user",
    """
    WITH d AS (
      SELECT DISTINCT user_id,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dayno
      FROM events),
    r AS (
      SELECT user_id, dayno,
             dayno - ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY dayno) AS grp
      FROM d),
    i AS (
      SELECT user_id, grp, COUNT(*) AS len FROM r GROUP BY user_id, grp)
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           COUNT(*) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS longest_streak
    FROM i GROUP BY user_id ORDER BY user_id
    """,
)
def activity_streaks_user(spark, sf_dir):
    """Gaps-and-islands: longest run of consecutive active DAYS per user.
    The classic dayno - row_number() island key — one exchange on user_id
    (distinct, window, and both aggregates all reuse it)."""
    e = _t(spark, sf_dir, "events")
    d = e.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("dayno"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("dayno")
    r = d.withColumn("grp", F.col("dayno") - F.row_number().over(w))
    i = r.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    return (
        i.groupBy("user_id")
        .agg(
            F.sum("len").alias("n_active_days"),
            F.count("*").alias("n_streaks"),
            F.max("len").alias("longest_streak"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Transition matrix (event-type bigrams)
# ---------------------------------------------------------------------------


@register(
    "event_transitions_topk",
    """
    WITH p AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events)
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM p WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    ORDER BY n DESC, prev_type, next_type
    LIMIT 20
    """,
)
def event_transitions_topk(spark, sf_dir):
    """Markov transition counts over each user's event sequence: lag() the
    event type on the unique (ts, event_id) order, count bigrams, top-20
    with a full deterministic tiebreak. The limit compiles to
    TakeOrderedAndProject — per-partition top-k, no global sort."""
    e = _events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    p = e.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNotNull()
    )
    return (
        p.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "prev_type", "next_type")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# CUSUM drift detection (closed prefix form — see module docstring)
# ---------------------------------------------------------------------------

CUSUM_TARGET_C = 5_000  # 50.00 in cents: the in-control mean
CUSUM_SLACK_C = 1_000  # 10.00 allowance per observation
CUSUM_THRESH_C = 50_000  # 500.00 alert threshold


@register(
    "cusum_alerts_user",
    f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CAST(ROUND(value * 100) AS BIGINT)
               - {CUSUM_TARGET_C} - {CUSUM_SLACK_C} AS d
      FROM events),
    c AS (
      SELECT user_id, us, event_id,
             CAST(SUM(d) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs
      FROM e),
    s AS (
      SELECT user_id,
             cs - CAST(MIN(LEAST(cs, 0)) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cusum
      FROM c)
    SELECT user_id,
           CAST(SUM(CASE WHEN cusum > {CUSUM_THRESH_C} THEN 1 ELSE 0 END)
             AS BIGINT) AS n_alerts,
           CAST(MAX(cusum) AS BIGINT) AS max_cusum
    FROM s GROUP BY user_id ORDER BY user_id
    """,
)
def cusum_alerts_user(spark, sf_dir):
    """One-sided CUSUM (upper) per user via the reset-free prefix identity
    s_t = cs_t - min(0, running_min(cs)) — two stacked window aggregates
    over the SAME (user_id, us, event_id) ordering (one exchange + one
    sort), exact integer cents throughout, no stateful Python scan."""
    e = _events_us(spark, sf_dir).select(
        "user_id",
        "us",
        "event_id",
        (cents(F.col("value")) - CUSUM_TARGET_C - CUSUM_SLACK_C).alias("d"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = e.withColumn("cs", F.sum("d").over(w))
    s = c.withColumn(
        "cusum", F.col("cs") - F.min(F.least(F.col("cs"), F.lit(0))).over(w)
    )
    return (
        s.groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("cusum") > CUSUM_THRESH_C, 1).otherwise(0)
            ).alias("n_alerts"),
            F.max("cusum").alias("max_cusum"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Seasonal-naive backtest (forecast value_t = value_{t-168h})
# ---------------------------------------------------------------------------

_WEEK_HOURS = 168


@register(
    "seasonal_naive_backtest_hourly",
    f"""
    WITH h AS (
      SELECT user_id,
             CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS hr,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS vc
      FROM events GROUP BY 1, 2)
    SELECT cur.user_id,
           COUNT(*) AS n_hours,
           CAST(SUM(ABS(cur.vc - prev.vc)) AS BIGINT) AS total_abs_err_c,
           CAST(MAX(ABS(cur.vc - prev.vc)) AS BIGINT) AS max_abs_err_c
    FROM h cur JOIN h prev
      ON cur.user_id = prev.user_id AND cur.hr = prev.hr + {_WEEK_HOURS}
    GROUP BY cur.user_id ORDER BY cur.user_id
    """,
)
def seasonal_naive_backtest_hourly(spark, sf_dir):
    """Backtest of the seasonal-naive forecaster (this hour's total = the
    same hour last week): exact integer MAE components per user. The self-
    join runs on the HOURLY aggregate keyed by an integer hour index — at
    100 TB that is tier-sized data (and the tier pipeline's hourly table
    can substitute directly), never raw events."""
    e = _events_us(spark, sf_dir)
    h = e.groupBy(
        "user_id", (F.floor(F.col("us") / (3600 * _US))).cast("long").alias("hr")
    ).agg(F.sum(cents(F.col("value"))).alias("vc"))
    cur, prev = h.alias("cur"), h.alias("prev")
    j = cur.join(
        prev,
        (F.col("cur.user_id") == F.col("prev.user_id"))
        & (F.col("cur.hr") == F.col("prev.hr") + _WEEK_HOURS),
    )
    err = F.abs(F.col("cur.vc") - F.col("prev.vc"))
    return (
        j.groupBy(F.col("cur.user_id").alias("user_id"))
        .agg(
            F.count("*").alias("n_hours"),
            F.sum(err).alias("total_abs_err_c"),
            F.max(err).alias("max_abs_err_c"),
        )
        .orderBy("user_id")
    )


def pattern_match(
    events,
    key_col: str,
    order_cols: list[str],
    sym_col,
    patterns: dict[str, str],
):
    """M78 sequence-pattern matching (MATCH_RECOGNIZE-lite): encode each
    key's ordered events as a symbol string and count regex matches per
    pattern — the product-analytics "view+ click+ purchase" / "error right
    after purchase" questions that SQL MATCH_RECOGNIZE answers on
    commercial engines.

    Spark-first shape: ONE groupBy(key) gathers the ordered symbol string
    via array_sort(collect_list(struct(order..., sym))) → transform →
    array_join (all JVM-side, struct sort is lexicographic on the order
    columns so the sequence is deterministic given a unique order key),
    then every pattern is a regexp_count column over that string — no
    Python, no window, one exchange. Matches count NON-OVERLAPPING
    occurrences left-to-right (both Java regex and RE2 advance past each
    match, so the count is engine-portable for backreference-free
    patterns).

    Scale contract: per-key state is the conversation's own event string —
    bounded by conversation length, the same contract as the codec chunk
    gather. For unbounded keys, sessionize first (engine/streaming.py
    session windows) and match within sessions.
    """
    seq = events.groupBy(key_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(*order_cols, F.col(sym_col).alias("sym"))
                    )
                ),
                lambda s: s["sym"],
            ),
            "",
        ).alias("seq"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return seq.select(
        key_col,
        "n_events",
        *[
            F.regexp_count(F.col("seq"), F.lit(p)).cast("long").alias(name)
            for name, p in patterns.items()
        ],
    )


@register(
    "pattern_match_sequences",
    """
    WITH seq AS (
      SELECT user_id,
             string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS s,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1)
    SELECT user_id, n_events,
           CAST(len(regexp_extract_all(s, 'vc+p')) AS BIGINT) AS funnel_hits,
           CAST(len(regexp_extract_all(s, 'ep')) AS BIGINT) AS recovery_hits,
           CAST(len(regexp_extract_all(s, 'e{2,}')) AS BIGINT)
             AS frustration_hits
    FROM seq ORDER BY user_id
    """,
)
def pattern_match_sequences(spark, sf_dir):
    """M78 MATCH_RECOGNIZE-lite over the events fixture: per user, the
    ordered event-type initials form a symbol string; three behavioural
    patterns are counted as non-overlapping regex matches — strict funnels
    (view, clicks, purchase), error→purchase recoveries, and ≥2-error
    frustration runs. The oracle rebuilds the identical string with an
    ordered string_agg and RE2's regexp_extract_all; the match COUNTS
    themselves sit under the full-hash gate."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.substring("event_type", 1, 1).alias("sym")
    )
    return pattern_match(
        e,
        "user_id",
        ["ts", "event_id"],
        "sym",
        {
            "funnel_hits": "vc+p",
            "recovery_hits": "ep",
            "frustration_hits": "e{2,}",
        },
    ).orderBy("user_id")
