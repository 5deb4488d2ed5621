"""Timeseries analytics pack — the continuous-aggregate function family a
timeseries engine serves on top of its tiers (TWA, counter deltas, OHLC,
mergeable histograms, LTTB visualization downsampling).

These are the per-series analytics the reference domain's tooling
(hypertable/continuous-aggregate engines) exposes as first-class aggregates;
each is expressed Spark-first (window functions + array HOFs, JVM-side) and
registered under the DuckDB hash gate. Exactness discipline follows
engine/queries.py's portability rules: integer-cents sums, single final IEEE
division, explicit unique ORDER BY keys.

Scale notes (100 TB):
- every query below is one shuffle (window partition or groupBy key =
  (user_id, bucket)) with partial aggregation where applicable;
- the histogram state is MERGEABLE (array-of-longs, element-wise sum), so it
  composes hourly -> monthly exactly like the tier sum/count/min/max algebra
  and could ride TierPipeline's state tables unchanged;
- OHLC composes across tiers by carrying (bucket, open/close) and selecting
  min_by/max_by at the coarser tier — proven against a direct-from-raw
  oracle (ohlc_weekly_composed);
- LTTB is per-series sequential by definition; it runs as one Arrow batch
  per series (applyInPandas), never per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from .queries import _t, cents, register

# ---------------------------------------------------------------------------
# Time-weighted average (LOCF weighting)
# ---------------------------------------------------------------------------


@register(
    "twa_locf_daily",
    """
    WITH o AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(ROUND(value * 100) AS BIGINT) AS v_c,
             epoch_us(ts) AS us,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id, date_trunc('day', ts)
               ORDER BY ts, event_id) AS nxt
      FROM events)
    SELECT user_id, day,
           CAST(SUM(v_c * (nxt - us)) AS DOUBLE)
             / CAST(SUM(nxt - us) AS DOUBLE) / 100.0 AS twa,
           COUNT(*) AS n_obs
    FROM o GROUP BY 1, 2
    HAVING SUM(nxt - us) > 0
    """,
)
def twa_locf_daily(spark, sf_dir):
    """Time-weighted average with LOCF weighting per (user, day): each
    observation's value holds until the next observation in the bucket;
    weight = microseconds held. Irregular sampling makes the plain mean
    wrong (a value sampled 100x in one minute would dominate the day); TWA
    is the standard continuous-aggregate answer. Exactness: integer cents x
    integer microsecond weights sum exactly; one final IEEE division."""
    e = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    base = e.select(
        "user_id",
        F.date_trunc("day", "ts").alias("day"),
        cents(F.col("value")).alias("v_c"),
        us.alias("us"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    obs = base.withColumn("dur", F.lead("us").over(w) - F.col("us"))
    agg = obs.groupBy("user_id", "day").agg(
        F.sum(F.col("v_c") * F.col("dur")).alias("vw"),
        F.sum("dur").alias("wsum"),
        F.count("*").alias("n_obs"),
    )
    # wsum > 0 (not twa IS NOT NULL): an all-simultaneous bucket has
    # wsum = 0 and Spark's 0/0.0 is NaN, not NULL — the filter must match
    # the oracle's HAVING SUM(...) > 0 exactly
    return agg.filter(F.col("wsum") > 0).select(
        "user_id",
        "day",
        (
            F.col("vw").cast("double") / F.col("wsum").cast("double") / F.lit(100.0)
        ).alias("twa"),
        "n_obs",
    )


# ---------------------------------------------------------------------------
# Counter aggregation (reset-aware delta)
# ---------------------------------------------------------------------------


@register(
    "counter_delta_hourly",
    """
    WITH o AS (
      SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
             CAST(ROUND(value * 100) AS BIGINT) AS v_c,
             lag(CAST(ROUND(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id, date_trunc('hour', ts)
               ORDER BY ts, event_id) AS prev
      FROM events)
    SELECT user_id, hour_start,
           CAST(SUM(CASE WHEN prev IS NULL THEN 0
                         WHEN v_c >= prev THEN v_c - prev
                         ELSE v_c END) AS BIGINT) AS delta_c,
           CAST(SUM(CASE WHEN prev IS NOT NULL AND v_c < prev
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
           COUNT(*) AS n_obs
    FROM o GROUP BY 1, 2
    """,
)
def counter_delta_hourly(spark, sf_dir):
    """Monotonic-counter delta per (user, hour) with reset detection: a drop
    means the counter restarted, so the post-reset reading contributes
    whole (the Prometheus increase()/TimescaleDB counter_agg rule). All
    arithmetic on integer cents — exact under any partitioning."""
    e = _t(spark, sf_dir, "events")
    base = e.select(
        "user_id",
        F.date_trunc("hour", "ts").alias("hour_start"),
        cents(F.col("value")).alias("v_c"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("user_id", "hour_start").orderBy("ts", "event_id")
    obs = base.withColumn("prev", F.lag("v_c").over(w))
    step = (
        F.when(F.col("prev").isNull(), F.lit(0))
        .when(F.col("v_c") >= F.col("prev"), F.col("v_c") - F.col("prev"))
        .otherwise(F.col("v_c"))
    )
    reset = F.when(
        F.col("prev").isNotNull() & (F.col("v_c") < F.col("prev")), 1
    ).otherwise(0)
    return obs.groupBy("user_id", "hour_start").agg(
        F.sum(step).cast("long").alias("delta_c"),
        F.sum(reset).cast("long").alias("n_resets"),
        F.count("*").alias("n_obs"),
    )


# ---------------------------------------------------------------------------
# OHLC (open/high/low/close) + cross-tier composition
# ---------------------------------------------------------------------------


def _ohlc(df, bucket_col):
    """OHLC per (user_id, <bucket>) from raw events: open/close by unique
    (ts, event_id) order, high/low plain min/max — no float accumulation."""
    base = df.select(
        "user_id", bucket_col.alias("bucket"), "value", "ts", "event_id"
    )
    wa = Window.partitionBy("user_id", "bucket").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id", "bucket").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        base.withColumn("rn_a", F.row_number().over(wa))
        .withColumn("rn_d", F.row_number().over(wd))
        .groupBy("user_id", "bucket")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close_v"),
            F.count("*").alias("n_obs"),
        )
    )


_OHLC_SQL = """
    WITH o AS (
      SELECT user_id, CAST(date_trunc('{g}', ts) AS TIMESTAMP) AS {out}, value,
             row_number() OVER (PARTITION BY user_id, date_trunc('{g}', ts)
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id, date_trunc('{g}', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events)
    SELECT user_id, {out},
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open_v,
           MAX(value) AS high_v, MIN(value) AS low_v,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close_v,
           COUNT(*) AS n_obs
    FROM o GROUP BY 1, 2
"""


@register("ohlc_daily", _OHLC_SQL.format(g="day", out="day"))
def ohlc_daily(spark, sf_dir):
    """Daily OHLC bars per user — first/last by unique (ts, event_id) order
    plus min/max; the leaf tier of the OHLC algebra."""
    e = _t(spark, sf_dir, "events")
    return _ohlc(e, F.date_trunc("day", "ts")).withColumnRenamed("bucket", "day")


@register("ohlc_weekly_composed", _OHLC_SQL.format(g="week", out="week"))
def ohlc_weekly_composed(spark, sf_dir):
    """OHLC tier composition: weekly bars computed FROM THE DAILY BARS —
    open = open of earliest day (min_by), close = close of latest (max_by),
    high/low = max/min of day highs/lows, n = sum — while the oracle
    computes the week directly from raw events. Hash equality proves the
    OHLC algebra composes across tiers exactly (same re-rollup property the
    sum/count/min/max tier state has, with (bucket, open/close) carriers)."""
    e = _t(spark, sf_dir, "events")
    daily = _ohlc(e, F.date_trunc("day", "ts")).withColumnRenamed("bucket", "day")
    return (
        daily.groupBy("user_id", F.date_trunc("week", "day").alias("week"))
        .agg(
            F.min_by("open_v", "day").alias("open_v"),
            F.max("high_v").alias("high_v"),
            F.min("low_v").alias("low_v"),
            F.max_by("close_v", "day").alias("close_v"),
            F.sum("n_obs").alias("n_obs"),
        )
    )


# ---------------------------------------------------------------------------
# Mergeable histogram state (array-of-longs tier algebra)
# ---------------------------------------------------------------------------

_HIST_K = 8
_HIST_W = 64.0  # events.value spans [0, ~490]; 8 x 64 covers it


@register(
    "hist_tier_monthly",
    f"""
    WITH bins AS (SELECT range AS bin FROM range({_HIST_K})),
    grp AS (
      SELECT DISTINCT user_id, CAST(date_trunc('month', ts) AS TIMESTAMP) AS month
      FROM events),
    counts AS (
      SELECT user_id, CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
             CAST(LEAST(FLOOR(value / {_HIST_W}), {_HIST_K - 1}) AS BIGINT) AS bin,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2, 3)
    SELECT g.user_id, g.month, b.bin,
           CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
    FROM grp g CROSS JOIN bins b
    LEFT JOIN counts c
      ON c.user_id = g.user_id AND c.month = g.month AND c.bin = b.bin
    """,
)
def hist_tier_monthly(spark, sf_dir):
    """Mergeable fixed-bin histogram as tier state: hourly rows hold an
    array<long> of bin counts; the monthly tier merges them with
    zip_with(+) inside F.aggregate — element-wise long addition is
    commutative, so collect_list's nondeterministic order cannot change the
    result. This is the same merge shape as the HLL sketch columns
    (engine/rollup.py sketch_cols) with an exact, explodable state. Oracle
    computes the monthly bins directly from raw."""
    e = _t(spark, sf_dir, "events")
    bin_expr = F.least(
        F.floor(F.col("value") / F.lit(_HIST_W)), F.lit(_HIST_K - 1)
    )
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.array(
            *[
                F.sum(F.when(bin_expr == i, 1).otherwise(0)).cast("long")
                for i in range(_HIST_K)
            ]
        ).alias("hist")
    )
    zero = F.array(*[F.lit(0).cast("long")] * _HIST_K)
    monthly = hourly.groupBy(
        "user_id", F.date_trunc("month", "hour").alias("month")
    ).agg(
        F.aggregate(
            F.collect_list("hist"),
            zero,
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
        ).alias("hist")
    )
    return monthly.select(
        "user_id", "month", F.posexplode("hist")
    ).withColumnsRenamed({"pos": "bin", "col": "cnt"})


# ---------------------------------------------------------------------------
# LTTB visualization downsampling
# ---------------------------------------------------------------------------

LTTB_N_OUT = 24


def lttb(ts_us: np.ndarray, vals: np.ndarray, n_out: int):
    """Largest-Triangle-Three-Buckets downsample of one series (Steinarsson
    2013, public thesis algorithm): keep the endpoints; split the interior
    into n_out-2 buckets; in each bucket keep the point forming the largest
    triangle with the previously kept point and the NEXT bucket's centroid.
    Ties break to the earliest point (np.argmax first-hit) — deterministic
    under the unique (ts, event_id) input order. Returns selected indices."""
    n = len(ts_us)
    if n_out >= n or n_out < 3:
        return np.arange(n)
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)  # bucket bounds
    sel = [0]
    a = 0
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        nlo, nhi = (hi, n) if i == n_out - 3 else (hi, edges[i + 2])
        cx = ts_us[nlo:nhi].mean()
        cy = vals[nlo:nhi].mean()
        ax, ay = ts_us[a], vals[a]
        # vectorized triangle areas for every candidate in the bucket
        area = np.abs(
            (ax - cx) * (vals[lo:hi] - ay) - (ax - ts_us[lo:hi]) * (cy - ay)
        )
        a = lo + int(np.argmax(area))
        sel.append(a)
    sel.append(n - 1)
    return np.asarray(sel, dtype=np.int64)


@register("lttb_downsample")  # rows-only: sequential-per-series, no SQL oracle
def lttb_downsample(spark, sf_dir):
    """Per-user LTTB downsample to LTTB_N_OUT points — the standard
    visualization-grade downsampling operator. Non-SQL-expressible (each
    bucket's pick depends on the previous pick), so the driver records a
    rows-only check; tests/test_ts_analytics.py pins parity against a
    brute-force reference plus endpoint/bucket invariants. Runs as one
    Arrow batch per series (applyInPandas); the per-bucket argmax is
    numpy-vectorized."""
    e = _t(spark, sf_dir, "events")

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], ignore_index=True)
        idx = lttb(
            pdf["ts"].astype("int64").to_numpy().astype(np.float64),
            pdf["value"].to_numpy(),
            LTTB_N_OUT,
        )
        out = pdf.iloc[idx][["user_id", "ts", "event_id", "value"]].copy()
        out["pt_rank"] = np.arange(len(idx), dtype=np.int64)
        return out

    return (
        e.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(
            fill,
            "user_id bigint, ts timestamp_ntz, event_id bigint, "
            "value double, pt_rank bigint",
        )
    )


# ---------------------------------------------------------------------------
# Top-N + "others" rollup (dashboard series-limit operator)
# ---------------------------------------------------------------------------


@register(
    "topn_plus_others_daily",
    """
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS val_c
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT *, row_number() OVER (
               ORDER BY n_events DESC, user_id) AS rk
      FROM (SELECT user_id, SUM(n_events) AS n_events FROM d GROUP BY 1))
    SELECT d.day,
           CASE WHEN r.rk <= 3 THEN CAST(d.user_id AS VARCHAR)
                ELSE 'others' END AS series,
           CAST(SUM(d.n_events) AS BIGINT) AS n_events,
           CAST(SUM(d.val_c) AS BIGINT) AS val_c
    FROM d JOIN r ON d.user_id = r.user_id
    GROUP BY 1, 2
    """,
)
def topn_plus_others_daily(spark, sf_dir):
    """Dashboard series-limit operator: daily series for the global top-3
    users by event count, everything else folded into one 'others' series
    per day. The top-set is a GLOBAL rank (ties broken by user_id) computed
    on an already-aggregated per-user table — a broadcast-sized dimension
    the daily fact rows join against, so the plan is one partial+final agg,
    a k-row broadcast, and one re-agg: no window over the fact table, no
    skew (the 'others' fold is pre-aggregated per (day, user) first)."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(cents(F.col("value"))).alias("val_c"),
    )
    top = (
        d.groupBy("user_id")
        .agg(F.sum("n_events").alias("n"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("n"), F.asc("user_id"))
            ),
        )
        .filter(F.col("rk") <= 3)
        .select("user_id")
    )
    lab = F.when(
        F.col("t_uid").isNotNull(), F.col("user_id").cast("string")
    ).otherwise(F.lit("others"))
    return (
        d.join(
            F.broadcast(top.withColumnRenamed("user_id", "t_uid")),
            d.user_id == F.col("t_uid"),
            "left",
        )
        .groupBy("day", lab.alias("series"))
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("val_c").alias("val_c"),
        )
    )


# ---------------------------------------------------------------------------
# Heartbeat / uptime aggregation
# ---------------------------------------------------------------------------

_HB_S = 300  # heartbeat liveness window: 5 minutes
_HB_US = _HB_S * 1_000_000


@register(
    "heartbeat_uptime_daily",
    f"""
    WITH o AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             epoch_us(ts) AS us,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id, date_trunc('day', ts)
               ORDER BY ts, event_id) AS nxt
      FROM events)
    SELECT user_id, day,
           CAST(SUM(CASE WHEN nxt IS NULL THEN {_HB_US}
                         ELSE LEAST(nxt - us, {_HB_US}) END) AS BIGINT)
             AS uptime_us,
           COUNT(*) AS n_beats
    FROM o GROUP BY 1, 2
    """,
)
def heartbeat_uptime_daily(spark, sf_dir):
    """Heartbeat/liveness aggregation (TimescaleDB heartbeat_agg shape):
    each event keeps the entity 'live' for _HB_S seconds or until the next
    event, whichever is sooner; per-(user, day) uptime is the exact union
    length of those capped intervals (consecutive-event gaps never
    double-count). Integer epoch MICROseconds throughout (DuckDB's epoch()
    is fractional; epoch_us and unix_micros agree exactly)."""
    e = _t(spark, sf_dir, "events")
    base = e.select(
        "user_id",
        F.date_trunc("day", "ts").alias("day"),
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("us"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    live = F.when(
        F.lead("us").over(w).isNull(), F.lit(_HB_US)
    ).otherwise(F.least(F.lead("us").over(w) - F.col("us"), F.lit(_HB_US)))
    return (
        base.withColumn("live_us", live)
        .groupBy("user_id", "day")
        .agg(
            F.sum("live_us").cast("long").alias("uptime_us"),
            F.count("*").alias("n_beats"),
        )
    )


# ---------------------------------------------------------------------------
# Extrapolated rate (PromQL increase()/rate() boundary correction)
# ---------------------------------------------------------------------------


@register(
    "rate_extrapolated_hourly",
    """
    WITH o AS (
      SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
             CAST(ROUND(value * 100) AS BIGINT) AS v_c,
             epoch_us(ts) AS us,
             lag(CAST(ROUND(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id, date_trunc('hour', ts)
               ORDER BY ts, event_id) AS prev
      FROM events),
    a AS (
      SELECT user_id, hour_start,
             CAST(SUM(CASE WHEN prev IS NULL THEN 0
                           WHEN v_c >= prev THEN v_c - prev
                           ELSE v_c END) AS BIGINT) AS delta_c,
             CAST(MAX(us) - MIN(us) AS BIGINT) AS span_us,
             COUNT(*) AS n_obs
      FROM o GROUP BY 1, 2)
    SELECT user_id, hour_start, delta_c, span_us, n_obs,
           CAST(delta_c AS DOUBLE) * 3600000000.0 / CAST(span_us AS DOUBLE)
             AS rate_extrap_c
    FROM a WHERE span_us > 0
    """,
)
def rate_extrapolated_hourly(spark, sf_dir):
    """PromQL-style extrapolated increase: the reset-aware counter delta
    observed over [first, last] sample is scaled to the full bucket width
    (delta * 3600 / observed_span) — the boundary correction rate() applies
    so sparse scrapes don't under-report. Exact integer delta and span; ONE
    multiply + ONE divide on doubles, identical expression shape in the
    oracle, so the IEEE results match bit-for-bit."""
    e = _t(spark, sf_dir, "events")
    base = e.select(
        "user_id",
        F.date_trunc("hour", "ts").alias("hour_start"),
        cents(F.col("value")).alias("v_c"),
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("us"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("user_id", "hour_start").orderBy("ts", "event_id")
    obs = base.withColumn("prev", F.lag("v_c").over(w))
    step = (
        F.when(F.col("prev").isNull(), F.lit(0))
        .when(F.col("v_c") >= F.col("prev"), F.col("v_c") - F.col("prev"))
        .otherwise(F.col("v_c"))
    )
    agg = obs.groupBy("user_id", "hour_start").agg(
        F.sum(step).cast("long").alias("delta_c"),
        (F.max("us") - F.min("us")).cast("long").alias("span_us"),
        F.count("*").alias("n_obs"),
    )
    return agg.filter(F.col("span_us") > 0).withColumn(
        "rate_extrap_c",
        F.col("delta_c").cast("double")
        * F.lit(3600000000.0)
        / F.col("span_us").cast("double"),
    )


# ---------------------------------------------------------------------------
# Percentiles served FROM the mergeable histogram state
# ---------------------------------------------------------------------------


@register(
    "hist_percentile_monthly",
    f"""
    WITH c AS (
      SELECT user_id, CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
             CAST(LEAST(FLOOR(value / {_HIST_W}), {_HIST_K - 1}) AS BIGINT) AS bin,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2, 3),
    w AS (
      SELECT user_id, month, bin, cnt,
             SUM(cnt) OVER (PARTITION BY user_id, month ORDER BY bin) AS cum,
             SUM(cnt) OVER (PARTITION BY user_id, month) AS total
      FROM c)
    SELECT user_id, month,
           CAST(MIN(CASE WHEN cum * 2 >= total THEN bin END) AS BIGINT)
             AS p50_bin,
           CAST(MIN(CASE WHEN cum * 20 >= total * 19 THEN bin END) AS BIGINT)
             AS p95_bin,
           CAST(MAX(total) AS BIGINT) AS n
    FROM w GROUP BY 1, 2
    """,
)
def hist_percentile_monthly(spark, sf_dir):
    """Percentiles served FROM mergeable histogram state (the reason a
    timeseries engine keeps distribution state in its tiers): hourly
    bin-count arrays merge to monthly (same fold as hist_tier_monthly),
    then p50/p95 are the first bins whose cumulative count crosses the
    rank — integer rank arithmetic (cum*2 >= total, cum*20 >= 19*total),
    so the result is exact w.r.t. the binned distribution and the oracle
    (which recomputes the bins from raw) must agree bit-for-bit. One
    tier-bounded explode + window per (user, month) — never a raw re-scan."""
    e = _t(spark, sf_dir, "events")
    bin_expr = F.least(
        F.floor(F.col("value") / F.lit(_HIST_W)), F.lit(_HIST_K - 1)
    )
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.array(
            *[
                F.sum(F.when(bin_expr == i, 1).otherwise(0)).cast("long")
                for i in range(_HIST_K)
            ]
        ).alias("hist")
    )
    zero = F.array(*[F.lit(0).cast("long")] * _HIST_K)
    monthly = hourly.groupBy(
        "user_id", F.date_trunc("month", "hour").alias("month")
    ).agg(
        F.aggregate(
            F.collect_list("hist"),
            zero,
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
        ).alias("hist")
    )
    bins = monthly.select(
        "user_id", "month", F.posexplode("hist")
    ).withColumnsRenamed({"pos": "bin", "col": "cnt"})
    wb = Window.partitionBy("user_id", "month").orderBy("bin")
    wt = Window.partitionBy("user_id", "month")
    w = bins.withColumn("cum", F.sum("cnt").over(wb)).withColumn(
        "total", F.sum("cnt").over(wt)
    )
    return w.groupBy("user_id", "month").agg(
        F.min(
            F.when(F.col("cum") * 2 >= F.col("total"), F.col("bin"))
        ).cast("long").alias("p50_bin"),
        F.min(
            F.when(F.col("cum") * 20 >= F.col("total") * 19, F.col("bin"))
        ).cast("long").alias("p95_bin"),
        F.max("total").cast("long").alias("n"),
    )


# ---------------------------------------------------------------------------
# Robust outlier detection (median absolute deviation)
# ---------------------------------------------------------------------------


@register(
    "outliers_mad_daily",
    """
    WITH o AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(ROUND(value * 100) AS BIGINT) * 2 AS v2
      FROM events),
    m AS (
      SELECT day, quantile_cont(v2, 0.5) AS med2 FROM o GROUP BY 1),
    d AS (
      SELECT o.day, o.v2, ABS(o.v2 - m.med2) AS dev2
      FROM o JOIN m USING (day)),
    s AS (
      SELECT day, quantile_cont(dev2 * 2, 0.5) AS mad4 FROM d GROUP BY 1)
    SELECT d.day,
           COUNT(*) AS n_events,
           CAST(MAX(m.med2) AS BIGINT) AS med2_c,
           CAST(MAX(s.mad4) AS BIGINT) AS mad4_c,
           CAST(SUM(CASE WHEN d.dev2 * 2 > 3 * s.mad4 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM d JOIN m USING (day) JOIN s USING (day)
    GROUP BY 1
    """,
)
def outliers_mad_daily(spark, sf_dir):
    """Robust outlier counting per day: |v - median| > 3 * MAD. Exactness
    trick: all quantities are kept as INTEGER-valued doubles by working on
    2x cents (median of integers interpolates to halves at worst, so 2x
    makes every median integral; MAD gets the same 2x again) — the
    comparison 2*dev2 > 3*mad4 is then exact integer arithmetic in both
    engines and the hash gate holds despite two chained percentiles."""
    e = _t(spark, sf_dir, "events")
    o = e.select(
        F.date_trunc("day", "ts").alias("day"),
        (cents(F.col("value")) * 2).alias("v2"),
    )
    m = o.groupBy("day").agg(F.percentile("v2", F.lit(0.5)).alias("med2"))
    d = o.join(m, "day").withColumn("dev2", F.abs(F.col("v2") - F.col("med2")))
    s = d.groupBy("day").agg(
        F.percentile(F.col("dev2") * 2, F.lit(0.5)).alias("mad4")
    )
    return (
        d.join(s, "day")
        .groupBy("day")
        .agg(
            F.count("*").alias("n_events"),
            F.max("med2").cast("long").alias("med2_c"),
            F.max("mad4").cast("long").alias("mad4_c"),
            F.sum(
                F.when(F.col("dev2") * 2 > 3 * F.col("mad4"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# Exponentially-weighted moving average (per-series sequential smoother)
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.25  # power of two: each step is exact halving/quartering


@register("ewma_user_values")  # rows-only: recursive per-series state
def ewma_user_values(spark, sf_dir):
    """Per-user EWMA (s_t = α·v_t + (1-α)·s_{t-1}, adjust=False) over the
    unique (ts, event_id) order — the classic streaming smoother behind
    alerting baselines. Inherently recursive (each output depends on the
    previous), so not SQL-expressible: the driver records a rows-only
    check and tests/test_ts_analytics pins parity against an explicit
    python recurrence. Runs as one Arrow batch per series (applyInPandas);
    the recurrence itself is pandas' C-level ewm kernel, never a python
    per-row loop."""
    e = _t(spark, sf_dir, "events")

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], ignore_index=True)
        pdf["ewma"] = (
            pdf["value"].ewm(alpha=EWMA_ALPHA, adjust=False).mean()
        )
        return pdf[["user_id", "ts", "event_id", "value", "ewma"]]

    return (
        e.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(
            smooth,
            "user_id bigint, ts timestamp_ntz, event_id bigint, "
            "value double, ewma double",
        )
    )


# ---------------------------------------------------------------------------
# Arbitrary-width time_bucket (the generalized tumbling bucket)
# ---------------------------------------------------------------------------

_BUCKET_S = 900  # 15 minutes


@register(
    "time_bucket_15min",
    f"""
    SELECT user_id,
           CAST(to_timestamp(
             CAST(FLOOR(epoch_us(ts) / ({_BUCKET_S} * 1000000))
                  * {_BUCKET_S} AS BIGINT)) AS TIMESTAMP) AS bucket_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS val_c
    FROM events GROUP BY 1, 2
    """,
)
def time_bucket_15min(spark, sf_dir):
    """Arbitrary-width tumbling bucket (TimescaleDB time_bucket / Spark
    window() semantics, epoch-aligned): floor(epoch/width)*width on integer
    microseconds — the generalization of the engine's calendar tiers to any
    width. Spark's window() function produces the same boundaries; the
    explicit integer arithmetic keeps the oracle expression identical."""
    e = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    bucket = F.timestamp_seconds(
        F.floor(us / F.lit(_BUCKET_S * 1_000_000)) * F.lit(_BUCKET_S)
    ).cast("timestamp_ntz")
    return e.groupBy("user_id", bucket.alias("bucket_start")).agg(
        F.count("*").alias("n_events"),
        F.sum(cents(F.col("value"))).alias("val_c"),
    )


# ---------------------------------------------------------------------------
# Exact bivariate statistics (correlation from integer sums)
# ---------------------------------------------------------------------------


@register(
    "corr_value_length_daily",
    """
    WITH o AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(ROUND(value * 100) AS BIGINT) AS x,
             CAST(length(props) AS BIGINT) AS y
      FROM events),
    s AS (
      SELECT day, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM o GROUP BY 1)
    SELECT day, n, sx, sy, sxx, syy, sxy,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)) AS corr
    FROM s
    WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    """,
)
def corr_value_length_daily(spark, sf_dir):
    """Exact Pearson correlation per day from INTEGER co-moment sums (the
    mergeable-state formulation: n, Σx, Σy, Σx², Σy², Σxy compose across
    partitions/tiers exactly, unlike a streaming corr accumulator whose
    float state is order-dependent). The final expression is the only
    float math and is shaped identically in the oracle, so even the corr
    doubles hash-match. Built-in corr() would NOT gate: its Welford-style
    accumulation order varies with partitioning."""
    e = _t(spark, sf_dir, "events")
    o = e.select(
        F.date_trunc("day", "ts").alias("day"),
        cents(F.col("value")).alias("x"),
        F.length("props").cast("long").alias("y"),
    )
    s = o.groupBy("day").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        s.filter((var_x > 0) & (var_y > 0))
        .withColumn(
            "corr",
            cov_n.cast("double")
            / F.sqrt(var_x.cast("double") * var_y.cast("double")),
        )
    )


# ---------------------------------------------------------------------------
# Retention cohorts (product-analytics matrix)
# ---------------------------------------------------------------------------


@register(
    "retention_cohorts_monthly",
    """
    WITH f AS (
      SELECT o_custkey,
             CAST(MIN(date_trunc('month', o_orderdate)) AS TIMESTAMP) AS cohort
      FROM orders GROUP BY 1),
    a AS (
      SELECT DISTINCT o_custkey,
             CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month
      FROM orders)
    SELECT f.cohort,
           CAST(datediff('month', f.cohort, a.month) AS BIGINT) AS offset_m,
           COUNT(*) AS active_users
    FROM a JOIN f USING (o_custkey)
    GROUP BY 1, 2
    """,
)
def retention_cohorts_monthly(spark, sf_dir):
    """Retention cohort matrix: customers grouped by first-order month, a
    row per (cohort, month offset) counting how many stayed active — the
    standard product-analytics rollup, over the multi-year orders table.
    Plan shape: one distinct-activity agg, one tiny first-activity agg, a
    broadcast-ready customer→cohort join (dimension sized), one final
    count — no fact-table window."""
    e = _t(spark, sf_dir, "orders")
    f = e.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("cohort")
    )
    a = e.select(
        "o_custkey",
        F.date_trunc("month", "o_orderdate").alias("month"),
    ).distinct()
    months_between = (
        (F.year("month") - F.year("cohort")) * 12
        + (F.month("month") - F.month("cohort"))
    )
    return (
        a.join(f, "o_custkey")
        .groupBy("cohort", months_between.cast("long").alias("offset_m"))
        .agg(F.count("*").alias("active_users"))
    )


# ---------------------------------------------------------------------------
# M4 visualization downsampling (pixel-exact anchor points)
# ---------------------------------------------------------------------------


@register(
    "m4_downsample_hourly",
    """
    WITH o AS (
      SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
             ts, value,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_first,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_last,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY value, ts, event_id) AS rn_min,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY value DESC, ts, event_id) AS rn_max
      FROM events)
    SELECT DISTINCT user_id, bucket, ts, value
    FROM o
    WHERE rn_first = 1 OR rn_last = 1 OR rn_min = 1 OR rn_max = 1
    """,
)
def m4_downsample_hourly(spark, sf_dir):
    """M4 downsampling (Jugel et al., VLDB 2014): per (series, pixel bucket)
    keep only the first, last, min-value and max-value POINTS — the 4-tuple
    that renders the same pixels as the full series on a width-of-buckets
    canvas. Unlike OHLC (which keeps values only), M4 keeps the points'
    timestamps, so the output is itself a plottable series: <=4 rows per
    bucket regardless of input density.

    Determinism: every anchor is picked by row_number over a total order
    ((ts, event_id) for first/last, (value, ts, event_id) for extrema), so
    ties resolve identically in Spark and the oracle. DISTINCT collapses a
    point that wins several roles (a bucket's max may also be its last).

    Scale: one shuffle — all four row_numbers share the (user_id, bucket)
    window partitioning, so the plan is a single Exchange followed by
    per-partition sorts; output is bounded by 4 x series x buckets
    (pixel count), independent of raw density. This is the query a
    dashboard layer pushes down instead of scanning raw points."""
    e = _t(spark, sf_dir, "events")
    base = e.select(
        "user_id",
        F.date_trunc("hour", "ts").alias("bucket"),
        "ts",
        "value",
        "event_id",
    )
    p = Window.partitionBy("user_id", "bucket")
    anchors = (
        base.withColumn(
            "rn_first", F.row_number().over(p.orderBy("ts", "event_id"))
        )
        .withColumn(
            "rn_last",
            F.row_number().over(p.orderBy(F.desc("ts"), F.desc("event_id"))),
        )
        .withColumn(
            "rn_min",
            F.row_number().over(p.orderBy("value", "ts", "event_id")),
        )
        .withColumn(
            "rn_max",
            F.row_number().over(p.orderBy(F.desc("value"), "ts", "event_id")),
        )
    )
    keep = (
        (F.col("rn_first") == 1)
        | (F.col("rn_last") == 1)
        | (F.col("rn_min") == 1)
        | (F.col("rn_max") == 1)
    )
    return (
        anchors.filter(keep)
        .select("user_id", "bucket", "ts", "value")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Period-over-period comparison (calendar-aligned WoW delta)
# ---------------------------------------------------------------------------


@register(
    "wow_value_daily",
    """
    WITH d AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v_c,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT cur.user_id, cur.day, cur.v_c AS value_c, cur.n,
           prv.v_c AS prev_value_c,
           CAST(cur.v_c - prv.v_c AS BIGINT) AS wow_delta_c
    FROM d cur
    JOIN d prv
      ON prv.user_id = cur.user_id
     AND prv.day = cur.day - INTERVAL 7 DAY
    """,
)
def wow_value_daily(spark, sf_dir):
    """Week-over-week comparison on the daily rollup: each (user, day)'s
    total against the SAME WEEKDAY one calendar week earlier. Calendar
    alignment is the point — lag(1) over existing days would silently
    compare against whatever day happened to precede a gap, so this is a
    self-equi-join on (user_id, day - 7), the TimescaleDB
    `timescaledb_experimental.time_weight`-adjacent "vs last week"
    dashboard primitive.

    Scale: the join runs on the AGGREGATED daily tier (|users| x |days|
    rows, orders of magnitude under raw), both sides share the same
    groupBy partitioning, and integer-cents sums keep the delta exact."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(cents(F.col("value"))).alias("v_c"),
        F.count("*").alias("n"),
    )
    cur, prv = d.alias("cur"), d.alias("prv")
    return cur.join(
        prv,
        (F.col("cur.user_id") == F.col("prv.user_id"))
        & (F.col("prv.day") == F.col("cur.day") - F.expr("INTERVAL 7 DAY")),
    ).select(
        F.col("cur.user_id").alias("user_id"),
        F.col("cur.day").alias("day"),
        F.col("cur.v_c").alias("value_c"),
        F.col("cur.n").alias("n"),
        F.col("prv.v_c").alias("prev_value_c"),
        (F.col("cur.v_c") - F.col("prv.v_c")).alias("wow_delta_c"),
    )


# ---------------------------------------------------------------------------
# Holt linear smoothing (Brown's double exponential — level + trend)
# ---------------------------------------------------------------------------

HOLT_ALPHA = 0.25  # power of two: exact halving/quartering per step


@register("holt_linear_user_values")  # rows-only: recursive per-series state
def holt_linear_user_values(spark, sf_dir):
    """Brown's double-exponential smoothing per user (level + trend + one-
    step-ahead forecast) over the unique (ts, event_id) order — the
    forecasting baseline one notch above EWMA. With adjust=False and
    s1_0 = s2_0 = x_0:

        s1_t = a*x_t + (1-a)*s1_{t-1};  s2_t = a*s1_t + (1-a)*s2_{t-1}
        level = 2*s1 - s2;  trend = a/(1-a)*(s1 - s2);  forecast = level+trend

    Inherently recursive, so not SQL-expressible (rows-only driver check);
    tests/test_ts_analytics.py pins parity against the literal recurrence.
    Like the EWMA, the recurrence runs as pandas' C-level ewm kernel applied
    twice over one Arrow batch per series — never a python per-row loop."""
    e = _t(spark, sf_dir, "events")

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], ignore_index=True)
        s1 = pdf["value"].ewm(alpha=HOLT_ALPHA, adjust=False).mean()
        s2 = s1.ewm(alpha=HOLT_ALPHA, adjust=False).mean()
        pdf["level"] = 2.0 * s1 - s2
        pdf["trend"] = HOLT_ALPHA / (1.0 - HOLT_ALPHA) * (s1 - s2)
        pdf["forecast_next"] = pdf["level"] + pdf["trend"]
        return pdf[
            ["user_id", "ts", "event_id", "value", "level", "trend",
             "forecast_next"]
        ]

    return (
        e.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(
            smooth,
            "user_id bigint, ts timestamp_ntz, event_id bigint, value double,"
            " level double, trend double, forecast_next double",
        )
    )


# ---------------------------------------------------------------------------
# M95: Holt-Winters additive seasonal (phase-decomposed)
# ---------------------------------------------------------------------------

HW_PERIOD = 24  # seasonal period: hour-of-day


def hw_additive_phase(
    df, key_cols: list[str], bucket_col: str, value_col: str, period: int = HW_PERIOD
):
    """Additive-seasonal Holt smoothing by PHASE DECOMPOSITION: the series is
    split into `period` phase subsequences (same hour-of-day), and each phase
    gets its own independent Holt (Brown's double-exponential) level+trend
    recurrence over its own history. The recombined forecast for a future
    bucket is the forecast of its phase — level, trend, AND seasonal shape
    all adapt, which is the additive-seasonal behaviour the coupled
    Holt-Winters triple recurrence provides.

    Why not the coupled recurrence: HW proper threads one scalar
    (level, trend) state through EVERY step while the seasonal term updates
    each step mod p — inherently sequential scalar state that only runs as a
    per-row Python loop. The phase decomposition replaces it with p
    independent recurrences per series, each of which is pandas' C-level ewm
    kernel over one Arrow batch (partitionBy (series, phase)) — no per-row
    Python anywhere, and MORE parallelism (series × period groups) at 100 TB,
    at the cost of the level reacting only to its own phase's observations.

    Missing buckets are skipped (the recurrence runs over observed
    subsequence steps); pair with the gap-fill operators upstream when
    evenly-spaced semantics are required. Returns the input decorated with
    (phase, level, trend, forecast_next), where forecast_next predicts this
    phase's NEXT occurrence (bucket + period hours)."""
    # phase = hour-of-day for period 24; any divisor of 24 works the same way
    src = df.withColumn("phase", (F.hour(bucket_col) % period).cast("int"))
    a = HOLT_ALPHA

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(bucket_col, ignore_index=True)
        s1 = pdf[value_col].ewm(alpha=a, adjust=False).mean()
        s2 = s1.ewm(alpha=a, adjust=False).mean()
        pdf["level"] = 2.0 * s1 - s2
        pdf["trend"] = a / (1.0 - a) * (s1 - s2)
        pdf["forecast_next"] = pdf["level"] + pdf["trend"]
        return pdf

    # output schema mirrors the input's own key/bucket/value types
    intypes = {f.name: f.dataType.simpleString() for f in src.schema.fields}
    fields = ", ".join(
        [f"{k} {intypes[k]}" for k in key_cols]
        + [f"{bucket_col} {intypes[bucket_col]}", f"{value_col} double",
           "phase int"]
        + ["level double", "trend double", "forecast_next double"]
    )
    return src.groupBy(*key_cols, "phase").applyInPandas(smooth, fields)


@register("holtwinters_additive_hourly")  # rows-only: recursive per-phase state
def holtwinters_additive_hourly(spark, sf_dir):
    """M95: additive-seasonal forecasting baseline over per-user hourly value
    series (period 24 = hour-of-day), via phase-decomposed Holt recurrences —
    see hw_additive_phase. Input hourly points are exact integer-cent sums
    (one final division), so the float recurrence consumes identical inputs
    under any shuffle; the recurrence itself is pytest-pinned against the
    literal per-phase formula (tests/test_ts_analytics_hw.py)."""
    e = _t(spark, sf_dir, "events")
    hourly = (
        e.groupBy("user_id", F.date_trunc("hour", "ts").alias("bucket"))
        .agg((F.sum(cents(F.col("value"))) / 100.0).alias("v"))
    )
    out = hw_additive_phase(hourly, ["user_id"], "bucket", "v")
    return out.select(
        "user_id", "bucket", "phase", "v", "level", "trend", "forecast_next"
    )


def hw_next_period_forecast(
    decorated, key_cols: list[str], bucket_col: str, period: int = HW_PERIOD
):
    """Recombine the per-phase recurrences into the next full period's
    forecast: one row per (series, phase) carrying the LAST state of that
    phase and the bucket it predicts (last occurrence + period). One
    partial+final max-struct aggregate over the decorated frame.

    `period` must match the period the phases were decomposed with
    (ADVICE r5): the recurrence's forecast_next predicts the phase's next
    occurrence — `period` hours after its last one — so labelling it with
    a hardcoded 24h bucket misaligned value and bucket for period != 24."""
    last = decorated.groupBy(*key_cols, "phase").agg(
        F.max(F.struct(bucket_col, "forecast_next")).alias("s")
    )
    return last.select(
        *key_cols,
        "phase",
        (
            F.col(f"s.{bucket_col}") + F.expr(f"INTERVAL {int(period)} HOURS")
        ).alias("forecast_bucket"),
        F.col("s.forecast_next").alias("forecast"),
    )


# ---------------------------------------------------------------------------
# M41: lead-lag detection — lagged cross-correlation from the hourly tier
# ---------------------------------------------------------------------------


def lagged_cross_corr(
    hourly, key_cols: list[str], hidx_col: str, a_col: str, b_col: str,
    lags: list[int],
):
    """Pearson correlation between a(t) and b(t+lag) per candidate lag —
    "does metric a LEAD metric b, and by how many hours?".

    Scale shape: the input is the HOURLY AGGREGATE (tier-sized, |keys|×
    hours rows — never raw turns); each lag is one equi-join of that
    aggregate with itself on (key, hidx+lag), fanned out by exploding the
    small literal lag set on the left side (|lags| copies of tier rows,
    one shuffle). State per lag is 6 exact integers (n, Σa, Σb, Σa², Σb²,
    Σab) so the finalize is ONE float expression with the engine's
    standard IEEE op order; zero-variance lags are excluded by the same
    expression both sides (the tier_corr convention)."""
    left = hourly.select(
        *key_cols,
        F.col(hidx_col).alias("_h"),
        F.col(a_col).cast("long").alias("_a"),
    ).withColumn("lag", F.explode(F.array(*[F.lit(int(x)) for x in lags])))
    right = hourly.select(
        *key_cols,
        F.col(hidx_col).alias("_hr"),
        F.col(b_col).cast("long").alias("_b"),
    )
    j = left.withColumn("_hr", F.col("_h") + F.col("lag")).join(
        right, [*key_cols, "_hr"]
    )
    st = j.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_a").alias("sx"),
        F.sum("_b").alias("sy"),
        F.sum(F.col("_a") * F.col("_a")).alias("sxx"),
        F.sum(F.col("_b") * F.col("_b")).alias("syy"),
        F.sum(F.col("_a") * F.col("_b")).alias("sxy"),
    )
    n, sx, sy = [F.col(c).cast("double") for c in ("n", "sx", "sy")]
    sxx, syy, sxy = [F.col(c).cast("double") for c in ("sxx", "syy", "sxy")]
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    return (
        st.filter((vx > 0) & (vy > 0))
        .select(
            "lag",
            F.col("n").alias("n_pairs"),
            ((n * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy))).alias("corr"),
        )
    )


_LAGCORR_SQL = """
WITH h AS (
  SELECT user_id,
         CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hidx,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(round(value * 100)) AS BIGINT) AS v_cents
  FROM events GROUP BY 1, 2),
j AS (
  SELECT l.lag AS lag, a._l AS _a, b.v_cents AS _b
  FROM (SELECT unnest([0, 1, 2, 3]) AS lag) l
  CROSS JOIN (SELECT user_id, hidx, n_events AS _l FROM h) a
  JOIN h b ON b.user_id = a.user_id AND b.hidx = a.hidx + l.lag),
st AS (
  SELECT lag, COUNT(*) AS n,
         CAST(SUM(_a) AS BIGINT) AS sx, CAST(SUM(_b) AS BIGINT) AS sy,
         CAST(SUM(_a * _a) AS BIGINT) AS sxx,
         CAST(SUM(_b * _b) AS BIGINT) AS syy,
         CAST(SUM(_a * _b) AS BIGINT) AS sxy
  FROM j GROUP BY lag)
SELECT lag, n AS n_pairs,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr
FROM st
WHERE CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
  AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
"""


@register("lagged_corr_activity_value", _LAGCORR_SQL)
def lagged_corr_activity_value(spark, sf_dir):
    """M41 lead-lag detection: does hourly event COUNT lead hourly spend?
    Correlates n_events(t) with value_cents(t+lag) for lag 0..3h over the
    per-(user, hour) aggregate — tier-sized self-join, exact integer
    state, one float finalize (full-hash oracle)."""
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "user_id",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp_ltz")) / 3_600_000_000
        ).alias("hidx"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents(F.col("value"))).alias("v_cents"),
    )
    return lagged_cross_corr(
        hourly, ["user_id"], "hidx", "n_events", "v_cents", [0, 1, 2, 3]
    )


# ---------------------------------------------------------------------------
# M42: cohort retention matrix
# ---------------------------------------------------------------------------


_COHORT_SQL = """
WITH act AS (
  SELECT DISTINCT o_custkey AS cust,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS midx
  FROM orders),
coh AS (SELECT cust, MIN(midx) AS cohort_midx FROM act GROUP BY 1),
j AS (SELECT a.cust, c.cohort_midx, a.midx - c.cohort_midx AS month_offset
      FROM act a JOIN coh c ON a.cust = c.cust),
m AS (SELECT cohort_midx, month_offset, COUNT(*) AS active_custs
      FROM j GROUP BY 1, 2),
s AS (SELECT cohort_midx, COUNT(*) AS cohort_size FROM coh GROUP BY 1)
SELECT CAST(m.cohort_midx // 12 AS BIGINT) AS cohort_year,
       CAST((m.cohort_midx % 12) + 1 AS BIGINT) AS cohort_month,
       m.month_offset, m.active_custs, s.cohort_size,
       CAST(m.active_custs AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
         AS retention_pct
FROM m JOIN s ON m.cohort_midx = s.cohort_midx
"""


@register("cohort_retention_monthly", _COHORT_SQL)
def cohort_retention_monthly(spark, sf_dir):
    """M42 cohort retention matrix: customers grouped by first-active
    month; for each (cohort, months-since) the count and share still
    active. The classic product-analytics rollup a timeseries engine
    serves from its event store.

    Scale shape: activity is collapsed to DISTINCT (customer, month-index)
    first (one shuffle, partial-agg'd), the cohort map is a customer-
    dimension-sized MIN agg reusing that shuffle key, and the only
    fact-sized join is the equi-join back on customer (at 100 TB: bucket
    both sides on customer, or broadcast the cohort map when the user
    dimension fits). The matrix and size tables are (months x offsets) —
    metadata-scale; the size join is broadcast. Month index = y*12+m-1 so
    offsets are exact integer arithmetic, never calendar interval math;
    retention_pct is the single final float division."""
    o = _t(spark, sf_dir, "orders")
    midx = (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).cast(
        "long"
    )
    act = o.select(
        F.col("o_custkey").alias("cust"), midx.alias("midx")
    ).distinct()
    coh = act.groupBy("cust").agg(F.min("midx").alias("cohort_midx"))
    j = act.join(coh, "cust").select(
        "cohort_midx", (F.col("midx") - F.col("cohort_midx")).alias("month_offset")
    )
    m = j.groupBy("cohort_midx", "month_offset").agg(
        F.count(F.lit(1)).alias("active_custs")
    )
    s = coh.groupBy("cohort_midx").agg(F.count(F.lit(1)).alias("cohort_size"))
    return m.join(F.broadcast(s), "cohort_midx").select(
        F.floor(F.col("cohort_midx") / 12).cast("long").alias("cohort_year"),
        (F.col("cohort_midx") % 12 + 1).cast("long").alias("cohort_month"),
        "month_offset",
        "active_custs",
        "cohort_size",
        (
            F.col("active_custs").cast("double")
            / F.col("cohort_size").cast("double")
        ).alias("retention_pct"),
    )


# ---------------------------------------------------------------------------
# M43: autocorrelation function (ACF) of the hourly activity series
# ---------------------------------------------------------------------------


_ACF_SQL = """
WITH h AS (
  SELECT user_id,
         CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hidx,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2),
j AS (
  SELECT l.lag AS lag, a.n_events AS _a, b.n_events AS _b
  FROM (SELECT unnest([1, 2, 3, 6, 12, 24]) AS lag) l
  CROSS JOIN h a
  JOIN h b ON b.user_id = a.user_id AND b.hidx = a.hidx + l.lag),
st AS (
  SELECT lag, COUNT(*) AS n,
         CAST(SUM(_a) AS BIGINT) AS sx, CAST(SUM(_b) AS BIGINT) AS sy,
         CAST(SUM(_a * _a) AS BIGINT) AS sxx,
         CAST(SUM(_b * _b) AS BIGINT) AS syy,
         CAST(SUM(_a * _b) AS BIGINT) AS sxy
  FROM j GROUP BY lag)
SELECT lag, n AS n_pairs,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr
FROM st
WHERE CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
  AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
"""


@register("acf_hourly_activity", _ACF_SQL)
def acf_hourly_activity(spark, sf_dir):
    """M43 autocorrelation function: the series correlated with ITSELF at
    lags 1/2/3/6/12/24h — periodicity detection (a daily-cycle series
    peaks at lag 24). Pure reuse of the M41 lagged-cross-correlation
    kernel with a == b; same tier-sized self-join + exact integer state
    shape, so the ACF inherits the full-hash gate."""
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "user_id",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp_ltz")) / 3_600_000_000
        ).alias("hidx"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return lagged_cross_corr(
        hourly, ["user_id"], "hidx", "n_events", "n_events", [1, 2, 3, 6, 12, 24]
    )


# ---------------------------------------------------------------------------
# M44: robust anomaly detection — median/MAD z-score
# ---------------------------------------------------------------------------


_MAD_SQL = """
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(round(value * 100)) AS BIGINT) AS v_c
  FROM events GROUP BY 1, 2),
med AS (SELECT user_id, quantile_cont(v_c, 0.5) AS med FROM daily GROUP BY 1),
dv AS (SELECT d.user_id, d.day, d.v_c, m.med,
              abs(CAST(d.v_c AS DOUBLE) - m.med) AS dev
       FROM daily d JOIN med m USING (user_id)),
mad AS (SELECT user_id, quantile_cont(dev, 0.5) AS mad FROM dv GROUP BY 1)
SELECT dv.user_id, dv.day, dv.v_c AS value_cents, dv.med, md.mad, dv.dev
FROM dv JOIN mad md USING (user_id)
WHERE md.mad > 0 AND dv.dev > 3 * md.mad
"""


@register("mad_anomaly_daily", _MAD_SQL)
def mad_anomaly_daily(spark, sf_dir):
    """M44 robust anomaly detection: flag (user, day) totals more than
    3 MADs from the user's median. Median/MAD (not mean/stddev) so the
    anomalies themselves cannot drag the threshold — the robust-statistics
    answer to self-masking outliers.

    Exactness: daily totals are integer cents; the interpolated median of
    integers is an exact x.0/x.5 double, deviations are exact halves, MAD
    is an exact quarter — every comparison is bit-deterministic with no
    rounding step. Scale: exact percentile() is a per-user sort-agg
    (fine: group = one user's days, bounded); at 100 TB swap
    percentile_approx's mergeable KLL sketch into the same shape — the
    D6 exact/approx pairing. Two user-keyed aggs + two user-keyed joins
    reuse one shuffle key end-to-end."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(cents(F.col("value"))).alias("v_c"))
    med = daily.groupBy("user_id").agg(
        F.percentile("v_c", F.lit(0.5)).alias("med")
    )
    dv = daily.join(med, "user_id").withColumn(
        "dev", F.abs(F.col("v_c").cast("double") - F.col("med"))
    )
    mad = dv.groupBy("user_id").agg(
        F.percentile("dev", F.lit(0.5)).alias("mad")
    )
    return (
        dv.join(mad, "user_id")
        .filter((F.col("mad") > 0) & (F.col("dev") > 3 * F.col("mad")))
        .select(
            "user_id",
            "day",
            F.col("v_c").alias("value_cents"),
            "med",
            "mad",
            "dev",
        )
    )


# ---------------------------------------------------------------------------
# M65: PAA + rank-SAX symbolic day shapes (symbolic series downsampling)
# ---------------------------------------------------------------------------


def day_shape_sax(hourly, segments: int = 4, value_col: str = "n_turns"):
    """M65: symbolic downsampling of each (series, day) — Piecewise
    Aggregate Approximation into `segments` equal intra-day segments,
    then rank-based SAX symbolization.

    PAA: each UTC day's 24 hourly tier values collapse to `segments`
    integer segment sums (missing hours contribute 0 — a day profile is a
    fixed-length vector, unlike the observed-only regression in
    trend_linear). Symbolization: instead of the classic z-normalize +
    Gaussian breakpoints (float-fragile, needs a global pass), each
    segment's symbol is its RANK among the day's segments with ties
    broken by time position — scale-invariant like z-normalized SAX,
    pure integer comparisons, and always a permutation of 0..segments-1.
    The word (e.g. '0123' = activity rising all day) is the day's shape
    fingerprint: equal words = equal intra-day activity ordering, the
    equi-join key for motif discovery across 10^9 series without any
    pairwise comparison (the same shingle→bucket→verify shape as the
    MinHash dedup path, applied to series instead of text).

    Input is the HOURLY TIER (O(tier) rows, never raw). One shuffle: the
    (conv, day) groupBy; ranks and the word are closed-form column
    expressions over the pivoted segment sums.
    """
    from .rollup import observed_state

    if not 2 <= segments <= 24 or 24 % segments:
        raise ValueError(f"segments must divide 24: {segments}")
    span = 24 // segments
    h = observed_state(hourly)
    seg = (F.hour("bucket_start") / F.lit(span)).cast("int")
    prof = h.groupBy(
        "conv_id",
        F.date_trunc("day", "bucket_start")
        .cast("timestamp_ntz")
        .alias("day"),
    ).agg(
        *[
            F.sum(
                F.when(seg == i, F.col(value_col)).otherwise(F.lit(0))
            ).alias(f"s{i}")
            for i in range(segments)
        ]
    )
    cols = [F.col(f"s{i}") for i in range(segments)]
    ranks = []
    for i in range(segments):
        below = [
            F.when(
                (cols[j] < cols[i])
                | ((cols[j] == cols[i]) & F.lit(j < i)),
                1,
            ).otherwise(0)
            for j in range(segments)
            if j != i
        ]
        r = below[0]
        for b in below[1:]:
            r = r + b
        ranks.append(r.cast("string"))
    return prof.withColumn("word", F.concat(*ranks))


# ---------------------------------------------------------------------------
# Burstiness: Fano factor over the bucket-count series, zeros included
# ---------------------------------------------------------------------------


def burstiness_fano(state, count_col: str = "n_turns"):
    """M81 per-series burstiness from tier state: the Fano factor
    (index of dispersion, var/mean) of the per-bucket event-count series
    over the series' OWN observed span, with missing buckets counted as
    zeros — a conversation firing 600 turns in 2 of its 100 spanned hours
    is bursty; the observed-rows-only variance would miss exactly the
    zeros that make it so.

    Served entirely from tier rows: one partial+final aggregate per series
    collects exact integers (n_obs, Σn, Σn², first/last hour index); the
    span B = last − first + 1 supplies the zero buckets arithmetically —
    no spine join, no densify. Population variance over B buckets is
    (B·Σn² − (Σn)²)/B², so fano = (B·Σn² − (Σn)²)/(B·Σn) and each output
    float is ONE division of exact integers (bit-portable across engines).
    Overflow bound: needs B·Σn² < 2^63 — at 10^12 turns a single series
    would need ~10^9 spanned hours (100k years) to threaten it.

    Returns (conv_id, n_obs, span_buckets, mean_per_bucket, zero_frac,
    fano); fano > 1 over-dispersed (bursty), < 1 regular, Poisson ≈ 1.
    """
    from .rollup import observed_state
    from .sliding import _hour_index

    obs = observed_state(state).select(
        "conv_id",
        _hour_index("bucket_start").alias("hidx"),
        F.col(count_col).cast("long").alias("n"),
    )
    per = obs.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
        F.min("hidx").alias("h0"),
        F.max("hidx").alias("h1"),
    )
    b = (F.col("h1") - F.col("h0") + F.lit(1)).cast("long")
    return per.select(
        "conv_id",
        "n_obs",
        b.alias("span_buckets"),
        (F.col("s1") / b).alias("mean_per_bucket"),
        ((b - F.col("n_obs")) / b).alias("zero_frac"),
        (
            (b * F.col("s2") - F.col("s1") * F.col("s1")) / (b * F.col("s1"))
        ).alias("fano"),
    ).orderBy("conv_id")


@register(
    "burstiness_fano_hourly",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts FROM events),
    hourly AS (
      SELECT conv_id,
             epoch_us(date_trunc('hour', ts)) // 3600000000 AS hidx,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM t0 GROUP BY 1, 2),
    per AS (
      SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_obs,
             CAST(SUM(n) AS BIGINT) AS s1, CAST(SUM(n * n) AS BIGINT) AS s2,
             CAST(MAX(hidx) - MIN(hidx) + 1 AS BIGINT) AS b
      FROM hourly GROUP BY 1)
    SELECT conv_id, n_obs, b AS span_buckets,
           s1 / b AS mean_per_bucket,
           (b - n_obs) / b AS zero_frac,
           (b * s2 - s1 * s1) / (b * s1) AS fano
    FROM per ORDER BY conv_id
    """,
)
def burstiness_fano_hourly(spark, sf_dir):
    """M81 burstiness ranking from the hourly tier: which conversations
    concentrate their activity into spikes (fano >> 1) vs a steady drip
    (fano ≈ 1)? Zeros inside each series' span enter the variance purely
    arithmetically (span × integer moments), so the tier stays the only
    input and the three floats (mean, zero fraction, fano) each hash-match
    the oracle's identical single-division expressions over raw events."""
    from . import io as eio
    from . import rollup as erollup

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0)
    return burstiness_fano(tiers["hourly"])
