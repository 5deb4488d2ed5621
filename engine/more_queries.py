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
