"""Second batch of driver-verified operators: sliding windows (C3), batch
session islands (C4), interval joins (F8), map functions (I5), HLL
sketches (D4)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .queries import _t, register


@register(
    "sliding_window_rate",
    """
    WITH b AS (
      SELECT date_trunc('hour', MIN(ts)) - INTERVAL 45 MINUTE AS lo,
             MAX(ts) AS hi
      FROM events),
    w AS (SELECT unnest(generate_series(lo, hi, INTERVAL 15 MINUTE)) AS ws FROM b)
    SELECT CAST(w.ws AS TIMESTAMP) AS window_start, COUNT(e.event_id) AS n_events
    FROM w JOIN events e
      ON e.ts >= w.ws AND e.ts < w.ws + INTERVAL 1 HOUR
    GROUP BY w.ws
    """,
)
def sliding_window_rate(spark, sf_dir):
    """C3: overlapping 1h windows sliding every 15min (epoch-aligned, each
    event lands in 4 windows); smoothed event-rate series."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "n_events",
        )
    )


@register(
    "session_islands",
    """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events),
    s AS (
      SELECT user_id, ts, event_id,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM g)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) AS TIMESTAMP) AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, session_id
    """,
)
def session_islands(spark, sf_dir):
    """C4 (batch): gaps-and-islands session detection — the batch equivalent
    of session_window(ts, '30 minutes') (streaming variant in
    engine/streaming.py)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    new_s = F.when(
        F.lag("ts").over(w).isNull()
        | (
            us - F.lag(us).over(w) > 30 * 60 * 1_000_000
        ),
        1,
    ).otherwise(0)
    s = e.withColumn("new_s", new_s).withColumn(
        "session_id",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )


@register(
    "session_islands_salted",
    """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events),
    s AS (
      SELECT user_id, ts, event_id,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM g)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) AS TIMESTAMP) AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, session_id
    """,
)
def session_islands_salted_q(spark, sf_dir):
    """C4/F6 under the hash gate: the skew-safe time-sliced sessionizer
    (engine/skew.py:session_islands_salted) replayed against the SAME
    event-level oracle as `session_islands` — the salted two-pass
    decomposition must be exactly invisible in the result."""
    from .skew import session_islands_salted

    e = _t(spark, sf_dir, "events")
    return session_islands_salted(
        e, key="user_id", ts_col="ts", order_cols=("event_id",),
        gap_minutes=30, slice_interval="6 hours",
    )


@register(
    "interval_overlap_orders",
    """
    SELECT a.o_custkey, a.o_orderkey AS order_a, b.o_orderkey AS order_b
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
     AND a.o_orderdate < b.o_orderdate + INTERVAL 30 DAY
     AND b.o_orderdate < a.o_orderdate + INTERVAL 30 DAY
    """,
)
def interval_overlap_orders(spark, sf_dir):
    """F8: interval-overlap self join — each order's 30-day active window
    vs the same customer's other orders (equi key bounds the quadratic)."""
    o = _t(spark, sf_dir, "orders")
    a, b = o.alias("a"), o.alias("b")
    day30 = F.expr("INTERVAL 30 DAYS")
    return a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
        & (F.col("a.o_orderdate") < F.col("b.o_orderdate") + day30)
        & (F.col("b.o_orderdate") < F.col("a.o_orderdate") + day30),
    ).select(
        F.col("a.o_custkey").alias("o_custkey"),
        F.col("a.o_orderkey").alias("order_a"),
        F.col("b.o_orderkey").alias("order_b"),
    )


@register(
    "map_props_stats",
    """
    SELECT user_id, event_type, COUNT(*) AS cnt
    FROM events GROUP BY user_id, event_type
    """,
)
def map_props_stats(spark, sf_dir):
    """I5: map functions — per-user counts gathered into a
    map<event_type,count> via map_from_entries, then re-exploded (the oracle
    sees the flat rows; the map round-trip is the Spark-side exercise)."""
    e = _t(spark, sf_dir, "events")
    per = e.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    mapped = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("m")
    )
    return mapped.select(
        "user_id", F.explode("m").alias("event_type", "cnt")
    )


@register("hll_sketch_distinct")  # rows-only: sketch estimates are approximate
def hll_sketch_distinct(spark, sf_dir):
    """D4 (mergeable path): HLL sketches per day, unioned to a monthly
    distinct estimate — the composable distinct for tier re-rollups, where
    exact countDistinct cannot compose."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact"),
    )
    return daily.groupBy(F.date_trunc("month", "day").alias("month")).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.sum("exact").alias("sum_daily_exact"),
    )


@register(
    "asof_generic_clicks",
    """
    SELECT event_id, user_id, last_click_ts
    FROM (
      SELECT event_id, user_id, event_type,
             last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, pref
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
      FROM (SELECT event_id, user_id, event_type, ts,
                   CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS pref
            FROM events))
    WHERE event_type = 'purchase'
    """,
)
def asof_generic_clicks(spark, sf_dir):
    """F3 via the GENERAL asof_join operator (engine/joins.py): purchases
    as-of-joined (backward, strict <) with the same user's clicks — the
    two-table form of asof_last_click_before_purchase, hash-verified
    against the windowed oracle. Single exchange, no range join."""
    from .joins import asof_join

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    return asof_join(
        purchases,
        clicks,
        by=["user_id"],
        left_on="ts",
        right_on="click_ts",
        value_cols=["click_ts"],
        direction="backward",
        allow_exact_matches=False,
    ).select(
        "event_id", "user_id", F.col("click_ts").alias("last_click_ts")
    )


@register(
    "asof_salted_clicks",
    """
    SELECT event_id, user_id, last_click_ts
    FROM (
      SELECT event_id, user_id, event_type,
             last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, pref
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
      FROM (SELECT event_id, user_id, event_type, ts,
                   CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS pref
            FROM events))
    WHERE event_type = 'purchase'
    """,
)
def asof_salted_clicks(spark, sf_dir):
    """F3 skew-safe: the SAME semantics as asof_generic_clicks through
    `asof_join_salted` (engine/joins.py) — within-slice window partitioned
    by (user, 1-day slice) plus the slice-level boundary carry — so the
    time-sliced two-pass operator itself sits under the driver's full hash
    gate, not only the salted==unsalted pytest."""
    from .joins import asof_join_salted

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    return asof_join_salted(
        purchases,
        clicks,
        by=["user_id"],
        left_on="ts",
        right_on="click_ts",
        value_cols=["click_ts"],
        direction="backward",
        allow_exact_matches=False,
        slice="1 day",
    ).select(
        "event_id", "user_id", F.col("click_ts").alias("last_click_ts")
    )


@register(
    "clicks_in_purchase_window",
    """
    WITH p AS (
      SELECT event_id, user_id, ts AS w_start, ts + INTERVAL 2 HOUR AS w_end
      FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, CAST(COUNT(*) AS BIGINT) AS n_clicks
    FROM p JOIN c ON c.user_id = p.user_id
                 AND c.ts >= p.w_start AND c.ts < p.w_end
    GROUP BY p.event_id, p.user_id
    """,
)
def clicks_in_purchase_window(spark, sf_dir):
    """F8 via the GENERAL point_interval_join operator (engine/joins.py):
    clicks inside each purchase's 2-hour follow window. The interval side
    explodes into 1-hour buckets and the join is pure equi on
    (user_id, bucket) — the plan that survives when no key bounds the
    candidate set."""
    from .joins import point_interval_join

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("w_end"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    j = point_interval_join(
        clicks, purchases, "click_ts", "w_start", "w_end",
        by=["user_id"], bucket="1 hour",
    )
    return j.groupBy("event_id", "user_id").agg(
        F.count("*").cast("long").alias("n_clicks")
    )


@register(
    "purchase_window_overlaps",
    """
    WITH p AS (
      SELECT event_id, user_id, ts AS w_start, ts + INTERVAL 2 HOUR AS w_end
      FROM events WHERE event_type = 'purchase')
    SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b
    FROM p a JOIN p b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND a.w_start < b.w_end AND b.w_start < a.w_end
    """,
)
def purchase_window_overlaps(spark, sf_dir):
    """F8 via the GENERAL interval_overlap_join operator: pairs of the
    same user's purchases whose 2-hour windows overlap. Both sides
    bucket-explode and meet on an equi key; the first-overlap-bucket rule
    keeps each pair exactly once (the oracle is the plain theta join)."""
    from .joins import interval_overlap_join

    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("w_end"),
    )
    a = p.alias("a")
    b = (
        p.withColumnRenamed("event_id", "event_b")
        .withColumnRenamed("w_start", "b_start")
        .withColumnRenamed("w_end", "b_end")
    )
    j = interval_overlap_join(
        a, b, "w_start", "w_end", "b_start", "b_end",
        by=["user_id"], bucket="2 hours",
    )
    return j.filter(F.col("event_id") < F.col("event_b")).select(
        "user_id",
        F.col("event_id").alias("event_a"),
        F.col("event_b").alias("event_b"),
    )


@register(
    "hot_users_topk",
    """
    WITH per AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY 1),
    tot AS (SELECT SUM(n_events) AS total FROM per)
    SELECT p.user_id, p.n_events,
           p.n_events / CAST(t.total AS DOUBLE) AS share
    FROM per p CROSS JOIN tot t
    ORDER BY p.n_events DESC, p.user_id
    LIMIT 20
    """,
)
def hot_users_topk(spark, sf_dir):
    """E3 under the driver's hash gate: skew diagnostics via the engine's
    `hot_conversations` operator (engine/skew.py) on the events fixture —
    top-k keys by row count with their share of the table, the total
    derived from the per-key aggregate (one partial+final combine + one
    broadcast row), never a second scan."""
    from .skew import hot_conversations

    e = _t(spark, sf_dir, "events").select(F.col("user_id").alias("conv_id"))
    out = hot_conversations(e.withColumn("turn_idx", F.lit(0)), top_k=20)
    return out.select(
        F.col("conv_id").alias("user_id"),
        F.col("n_turns").alias("n_events"),
        "share",
    )


@register(
    "range_frame_trailing_hour",
    """
    SELECT user_id,
           CAST(ts AS TIMESTAMP) AS ts,
           event_id,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(event_id) OVER w AS BIGINT) AS id_sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def range_frame_trailing_hour(spark, sf_dir):
    """E6, RANGE case under the hash gate: trailing-1-hour RANGE frame keyed
    on event time (not row position) — ties share a frame, so the result is
    order-deterministic even for simultaneous events; integer aggregates
    keep the comparison exact."""
    e = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "user_id",
        "ts",
        "event_id",
        F.count("*").over(w).alias("n_1h"),
        F.sum("event_id").over(w).alias("id_sum_1h"),
    )


@register(
    "cube_order_status",
    """
    SELECT year(o_orderdate) AS order_year,
           o_orderstatus AS status,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY CUBE (year(o_orderdate), o_orderstatus)
    """,
)
def cube_order_status(spark, sf_dir):
    """D5 completion: CUBE (all 2^k grouping sets, not just the rollup
    chain) — year×status counts with both marginals and the grand total in
    one pass; Spark expands to a single Expand + hash aggregate."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube(F.year("o_orderdate").alias("order_year"), F.col("o_orderstatus").alias("status"))
        .agg(
            F.count("*").alias("n_orders"),
            F.count_distinct("o_custkey").alias("n_customers"),
        )
    )


@register(
    "asof_forward_clicks",
    """
    SELECT event_id, user_id, next_click_ts
    FROM (
      SELECT event_id, user_id, event_type,
             first_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, pref
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_click_ts
      FROM (SELECT event_id, user_id, event_type, ts,
                   CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS pref
            FROM events))
    WHERE event_type = 'purchase'
    """,
)
def asof_forward_clicks(spark, sf_dir):
    """F3, FORWARD direction under the hash gate: each purchase joined to
    the same user's next click at-or-after it (allow_exact_matches=True —
    a click at the purchase's own timestamp matches, which the oracle
    encodes by sorting clicks after purchases within a tie). Completes the
    driver-verified as-of matrix: backward strict (asof_generic_clicks),
    backward salted (asof_salted_clicks), forward inclusive (here)."""
    from .joins import asof_join

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("next_click_ts")
    )
    return asof_join(
        purchases,
        clicks,
        by=["user_id"],
        left_on="ts",
        right_on="next_click_ts",
        value_cols=["next_click_ts"],
        direction="forward",
        allow_exact_matches=True,
    ).select("event_id", "user_id", "next_click_ts")


@register(
    "dq_orders_suite",
    """
    SELECT
      (SELECT COUNT(*) FROM orders) AS rows_scanned,
      (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
        AS null_o_custkey,
      (SELECT COUNT(*) FROM orders
        WHERE o_totalprice IS NOT NULL
          AND o_totalprice NOT BETWEEN 0 AND 200000) AS range_o_totalprice,
      (SELECT COUNT(*) FROM orders
        WHERE o_orderstatus IS NOT NULL
          AND o_orderstatus NOT IN ('O', 'F')) AS set_o_orderstatus,
      (SELECT COUNT(*) FROM orders
        WHERE o_orderpriority IS NOT NULL
          AND NOT regexp_matches(o_orderpriority, '^[1-3]-'))
        AS regex_o_orderpriority,
      (SELECT COUNT(*) FILTER (WHERE o_orderkey IS NOT NULL)
              - COUNT(DISTINCT o_orderkey) FROM orders) AS unique_o_orderkey,
      (SELECT COUNT(*) FROM orders o
        WHERE o.o_custkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey
                            AND c.c_custkey < 1000)) AS ref_o_custkey
    """,
)
def dq_orders_suite(spark, sf_dir):
    """Data-quality expectations (engine/expectations.py) under the hash
    gate: a 7-check suite over `orders` — completeness (not_null),
    validity (in_range / in_set / regex, null-skipping), exact key
    uniqueness, and broadcast referential integrity against `customer` —
    compiled into one shared row-level scan + one distinct-count + one
    anti-join probe. The oracle recomputes every count independently in
    SQL; hash equality pins both the violation arithmetic and the
    completeness/validity null split."""
    from .expectations import (
        Suite,
        in_range,
        in_set,
        matches,
        not_null,
        ref_integrity,
        unique,
    )

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    suite = Suite(
        [
            not_null("o_custkey"),
            in_range("o_totalprice", 0, 200_000),
            in_set("o_orderstatus", ["O", "F"]),
            matches("o_orderpriority", "^[1-3]-"),
            unique(["o_orderkey"]),
            ref_integrity(
                "o_custkey",
                customer.filter(F.col("c_custkey") < 1000),
                "c_custkey",
            ),
        ]
    )
    return suite.summary(orders)


@register(
    "merge_upsert_orders",
    """
    WITH t AS (
      SELECT o_orderkey,
             strftime(o_orderdate, '%Y-%m') AS month,
             o_orderstatus, o_totalprice
      FROM orders),
    s AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 194 = 0 THEN '2099-01' ELSE month END
               AS month,
             o_orderstatus,
             o_totalprice + 1000 AS o_totalprice
      FROM t WHERE o_orderkey % 97 = 0
      UNION ALL
      SELECT o_orderkey + 50000000 AS o_orderkey, month,
             'N' AS o_orderstatus, CAST(1.0 AS DOUBLE) AS o_totalprice
      FROM t WHERE o_orderkey % 251 = 0)
    SELECT t.o_orderkey, t.month, t.o_orderstatus, t.o_totalprice
    FROM t WHERE NOT EXISTS (SELECT 1 FROM s WHERE s.o_orderkey = t.o_orderkey)
    UNION ALL
    SELECT o_orderkey, month, o_orderstatus, o_totalprice FROM s
    """,
)
def merge_upsert_orders(spark, sf_dir):
    """MERGE INTO (engine/merge.py) under the hash gate: orders snapshotted
    into a month-partitioned table, then a deterministic CDC batch applied
    — price updates (every 97th key), cross-partition moves (every 194th
    key jumps to month 2099-01, so its OLD partition must rewrite too) and
    brand-new keys (every 251st, offset +50M). The oracle replays the same
    batch as anti-join ∪ source; hash equality pins update, insert, move
    and untouched-row semantics simultaneously."""
    import tempfile

    from .merge import merge_into

    t = (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            "o_orderstatus",
            "o_totalprice",
        )
    )
    path = tempfile.mkdtemp(prefix="merge-orders-") + "/t"
    t.write.partitionBy("month").parquet(path)
    target = spark.read.parquet(path)
    updates = (
        target.filter(F.col("o_orderkey") % 97 == 0)
        .withColumn(
            "month",
            F.when(F.col("o_orderkey") % 194 == 0, F.lit("2099-01")).otherwise(
                F.col("month")
            ),
        )
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000)
    )
    inserts = target.filter(F.col("o_orderkey") % 251 == 0).select(
        (F.col("o_orderkey") + 50_000_000).alias("o_orderkey"),
        "month",
        F.lit("N").alias("o_orderstatus"),
        F.lit(1.0).alias("o_totalprice"),
    )
    source = updates.unionByName(inserts).localCheckpoint()
    merge_into(
        spark, path, source, on=["o_orderkey"], partition_cols=["month"]
    )
    return spark.read.parquet(path).select(
        "o_orderkey", "month", "o_orderstatus", "o_totalprice"
    )


@register(
    "time_bucket_90min_volume",
    """
    SELECT CAST(time_bucket(INTERVAL '90 minutes', ts,
                            TIMESTAMP '2024-01-01 00:30:00') AS TIMESTAMP)
             AS bucket_start,
           COUNT(*) AS n_events,
           CAST(SUM(value) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def time_bucket_90min_volume(spark, sf_dir):
    """C1 generalized: arbitrary fixed-width tumbling buckets with an
    explicit ORIGIN (engine/bucket.py:time_bucket) — 90-minute windows
    phase-shifted to hh:30, the TimescaleDB/DuckDB time_bucket(width, ts,
    origin) semantics date_trunc cannot express. Integer-micros floor
    keeps the boundary exact (including for instants BEFORE the origin);
    the oracle is DuckDB's native time_bucket with the same origin."""
    from .bucket import time_bucket

    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            time_bucket("ts", 90 * 60, origin="2024-01-01 00:30:00")
            .alias("bucket_start")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").cast("double").alias("total_value"),
        )
    )


@register(
    "events_local_day_volume",
    """
    SELECT CAST(date_trunc('day',
                  timezone('America/New_York', timezone('UTC', ts)))
                AS TIMESTAMP) AS local_day,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
    """,
)
def events_local_day_volume(spark, sf_dir):
    """C1/C2 in a LOCAL calendar (engine/bucket.py:time_bucket_tz): daily
    event volume where a 'day' is an America/New_York wall-clock day —
    23/24/25 UTC hours across DST — the reporting grain dashboards
    actually want. Both engines convert the stored UTC instant to the
    zone's wall clock via tzdata and truncate there; hash equality pins
    identical DST handling."""
    from .bucket import time_bucket_tz

    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            time_bucket_tz("ts", "America/New_York").alias("local_day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
