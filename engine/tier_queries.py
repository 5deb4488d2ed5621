"""Driver-verified tier-pipeline queries: the engine's headline semantics
(hourly→daily→monthly continuous aggregates, gap-fill LOCF, delta-of-delta
prep) expressed over the driver's `events` fixture so DuckDB can replay them
as plain ANSI SQL (SURVEY.md §2 C/D/E, §5.7).

The Spark side goes through the real engine modules (io.transcripts_from_events,
rollup.build_tiers, rollup.tier_view) — these queries ARE the engine, not a
re-implementation for the oracle's benefit.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import io as eio
from . import rollup as erollup
from .queries import _t, register

# Shared DuckDB CTE chain: events -> T0 -> integer-backed tier state.
# Mirrors engine/rollup.py exactly: all state integer (BIGINT), floats only
# in the final single-division view columns.
_TIER_CTE = """
WITH t0 AS (
  SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
         ts,
         CAST(length(props) AS BIGINT) AS token_count,
         CAST(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS BIGINT) AS is_tool
  FROM events
),
hourly AS (
  SELECT conv_id, date_trunc('hour', ts) AS bucket_start,
         COUNT(*) AS n_turns,
         CAST(SUM(token_count) AS BIGINT) AS token_sum,
         MIN(token_count) AS token_min, MAX(token_count) AS token_max,
         CAST(SUM(is_tool) AS BIGINT) AS tool_sum,
         MIN(is_tool) AS tool_min, MAX(is_tool) AS tool_max,
         CAST(1 AS BIGINT) AS hours_count,
         COUNT(*) AS hturns_min, COUNT(*) AS hturns_max
  FROM t0 GROUP BY 1, 2
),
daily AS (
  SELECT conv_id, date_trunc('day', bucket_start) AS bucket_start,
         CAST(SUM(n_turns) AS BIGINT) AS n_turns,
         CAST(SUM(token_sum) AS BIGINT) AS token_sum,
         MIN(token_min) AS token_min, MAX(token_max) AS token_max,
         CAST(SUM(tool_sum) AS BIGINT) AS tool_sum,
         MIN(tool_min) AS tool_min, MAX(tool_max) AS tool_max,
         CAST(SUM(hours_count) AS BIGINT) AS hours_count,
         MIN(hturns_min) AS hturns_min, MAX(hturns_max) AS hturns_max
  FROM hourly GROUP BY 1, 2
),
monthly AS (
  SELECT conv_id, date_trunc('month', bucket_start) AS bucket_start,
         CAST(SUM(n_turns) AS BIGINT) AS n_turns,
         CAST(SUM(token_sum) AS BIGINT) AS token_sum,
         MIN(token_min) AS token_min, MAX(token_max) AS token_max,
         CAST(SUM(tool_sum) AS BIGINT) AS tool_sum,
         MIN(tool_min) AS tool_min, MAX(tool_max) AS tool_max,
         CAST(SUM(hours_count) AS BIGINT) AS hours_count,
         MIN(hturns_min) AS hturns_min, MAX(hturns_max) AS hturns_max
  FROM daily GROUP BY 1, 2
)
"""

_TIER_VIEW = """
SELECT conv_id,
       CAST(bucket_start AS TIMESTAMP) AS bucket_start,
       '{tier}' AS tier,
       n_turns / 3600.0 AS turn_rate_sum,
       hours_count AS turn_rate_count,
       hturns_min / 3600.0 AS turn_rate_min,
       hturns_max / 3600.0 AS turn_rate_max,
       (n_turns / 3600.0) / hours_count AS turn_rate_mean,
       CAST(token_sum AS DOUBLE) AS token_count_sum,
       n_turns AS token_count_count,
       CAST(token_min AS DOUBLE) AS token_count_min,
       CAST(token_max AS DOUBLE) AS token_count_max,
       token_sum / n_turns AS token_count_mean,
       CAST(tool_sum AS DOUBLE) AS tool_invocations_sum,
       n_turns AS tool_invocations_count,
       CAST(tool_min AS DOUBLE) AS tool_invocations_min,
       CAST(tool_max AS DOUBLE) AS tool_invocations_max,
       tool_sum / n_turns AS tool_invocations_mean,
       CAST(FALSE AS BOOLEAN) AS filled,
       CAST(NULL AS VARCHAR) AS fill_method
FROM {tier}
"""


def _tier_query(tier: str):
    def fn(spark, sf_dir):
        t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
        tiers = erollup.build_tiers(t0)
        return erollup.tier_view(tiers[tier], tier)

    fn.__doc__ = (
        f"D1/D2: {tier} continuous-aggregate tier over events-derived "
        "transcripts — integer-backed state, floats by single division."
    )
    return fn


for _tier in ("hourly", "daily", "monthly"):
    register(f"tier_{_tier}", _TIER_CTE + _TIER_VIEW.format(tier=_tier))(
        _tier_query(_tier)
    )


@register("tier_hourly_evolved", _TIER_CTE + _TIER_VIEW.format(tier="hourly"))
def tier_hourly_evolved(spark, sf_dir):
    """Partition-spec evolution under the oracle gate (VERDICT r3 #7): the
    full storage pipeline writing the EVOLVED hourly spec — hourly_layout=2,
    (bucket_date, conv_bucket) sub-partition dirs, snapshot-versioned —
    must produce the same hourly tier rows as the layout-1 reference the
    oracle models. The spec changes the file layout (conv-scoped reads
    prune within a day), never the results."""
    import tempfile

    from .pipeline import TierPipeline

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    pipe = TierPipeline(
        spark,
        tempfile.mkdtemp(prefix="tier-evolved-"),
        snapshots=True,
        hourly_layout=2,
        fill_tiers=False,
    )
    pipe.run(t0, stages=("hourly",))
    return erollup.tier_view(pipe.read_tier("hourly"), "hourly")


@register(
    "tier_hist_pipeline_monthly",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts,
             CAST(length(props) AS BIGINT) AS token_count
      FROM events
    ),
    grp AS (
      SELECT DISTINCT conv_id,
             CAST(date_trunc('month', ts) AS TIMESTAMP) AS bucket_start
      FROM t0),
    bins AS (SELECT range AS bin FROM range(16)),
    counts AS (
      SELECT conv_id,
             CAST(date_trunc('month', ts) AS TIMESTAMP) AS bucket_start,
             CAST(LEAST(GREATEST(FLOOR(token_count / 1.0), 0), 15) AS BIGINT) AS bin,
             COUNT(*) AS cnt
      FROM t0 GROUP BY 1, 2, 3)
    SELECT g.conv_id, g.bucket_start, b.bin,
           CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
    FROM grp g CROSS JOIN bins b
    LEFT JOIN counts c
      ON c.conv_id = g.conv_id AND c.bucket_start = g.bucket_start
         AND c.bin = b.bin
    """,
)
def tier_hist_pipeline_monthly(spark, sf_dir):
    """Exact mergeable histogram tier state through the REAL pipeline, on
    the SALTED path: TierPipeline(salted=True, hist_cols=...) rolls
    per-(conv, hour) bin-count arrays raw→hourly→daily→monthly (element-wise
    long sums at every hop and across salts), then the monthly arrays
    explode to (conv, month, bin, cnt) rows the oracle recomputes directly
    from raw — composition and salting proven bit-exact in one hash gate."""
    import tempfile

    from .pipeline import TierPipeline

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    pipe = TierPipeline(
        spark,
        tempfile.mkdtemp(prefix="tier-hist-"),
        salted=True,
        hist_cols={"token_count": (0.0, 1.0, 16)},
        fill_tiers=False,
    )
    pipe.run(t0, stages=("hourly", "daily", "monthly"))
    monthly = pipe.read_tier("monthly")
    return monthly.select(
        "conv_id", "bucket_start", F.posexplode("token_count_hist")
    ).withColumnsRenamed({"pos": "bin", "col": "cnt"})


@register(
    "tier_firstlast_pipeline_monthly",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts,
             CAST(length(props) AS BIGINT) AS token_count,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
               AS turn_idx
      FROM events),
    o AS (
      SELECT conv_id,
             CAST(date_trunc('month', ts) AS TIMESTAMP) AS bucket_start,
             token_count,
             row_number() OVER (PARTITION BY conv_id, date_trunc('month', ts)
                                ORDER BY ts, turn_idx) AS rn_a,
             row_number() OVER (PARTITION BY conv_id, date_trunc('month', ts)
                                ORDER BY ts DESC, turn_idx DESC) AS rn_d
      FROM t0)
    SELECT conv_id, bucket_start,
           MAX(CASE WHEN rn_a = 1 THEN token_count END) AS first_tokens,
           MAX(CASE WHEN rn_d = 1 THEN token_count END) AS last_tokens,
           COUNT(*) AS n_turns
    FROM o GROUP BY 1, 2
    """,
)
def tier_firstlast_pipeline_monthly(spark, sf_dir):
    """Exact first/last (open/close) tier state through the REAL pipeline on
    the SALTED path: TierPipeline(salted=True, firstlast_cols=...) carries
    each bucket's earliest/latest token_count with its unique (ts, turn_idx)
    order key, composing raw→hourly→daily→monthly and across salts via
    min_by/max_by on the carried keys (engine/rollup.py
    firstlast_partial_aggs). The oracle recomputes the month's first/last
    directly from raw events — hash equality proves the carrier algebra is
    exact, the same composition OHLC bars use (ts_analytics.py)."""
    import tempfile

    from .pipeline import TierPipeline

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    pipe = TierPipeline(
        spark,
        tempfile.mkdtemp(prefix="tier-fl-"),
        salted=True,
        firstlast_cols=["token_count"],
        fill_tiers=False,
    )
    pipe.run(t0, stages=("hourly", "daily", "monthly"))
    monthly = pipe.read_tier("monthly")
    return monthly.select(
        "conv_id",
        "bucket_start",
        F.col("token_count_first").alias("first_tokens"),
        F.col("token_count_last").alias("last_tokens"),
        "n_turns",
    )


@register(
    "realtime_hourly_serve",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts,
             CAST(length(props) AS BIGINT) AS token_count,
             CAST(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS BIGINT)
               AS is_tool
      FROM events)
    SELECT conv_id,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_start,
           COUNT(*) AS n_turns,
           CAST(SUM(token_count) AS BIGINT) AS token_sum,
           MIN(token_count) AS token_min,
           MAX(token_count) AS token_max,
           CAST(SUM(is_tool) AS BIGINT) AS tool_sum
    FROM t0 GROUP BY 1, 2
    """,
)
def realtime_hourly_serve(spark, sf_dir):
    """Real-time continuous aggregate (engine/rewrite.py
    serve_hourly_realtime): the pipeline materializes hourly tiers ONLY for
    data before the last-day watermark (simulating materializer lag); the
    serve view unions those persisted tier rows with an on-the-fly rollup
    of the raw tail. The oracle recomputes ALL hours straight from raw —
    hash equality proves the seam has no overlap, gap, or double count."""
    import tempfile

    from .pipeline import TierPipeline
    from .rewrite import serve_hourly_realtime

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    wm = t0.agg(
        F.date_trunc("day", F.max("ts")).cast("timestamp_ntz").alias("wm")
    ).first()["wm"]
    pipe = TierPipeline(
        spark, tempfile.mkdtemp(prefix="tier-rt-"), fill_tiers=False
    )
    pipe.run(
        t0.filter(F.col("ts").cast("timestamp_ntz") < F.lit(wm)),
        stages=("hourly",),
    )
    return serve_hourly_realtime(pipe.read_tier("hourly"), t0, wm)


@register(
    "tier_rewrite_range",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts,
             CAST(length(props) AS BIGINT) AS token_count,
             CAST(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS BIGINT) AS is_tool
      FROM events)
    SELECT conv_id, COUNT(*) AS n_turns,
           CAST(SUM(token_count) AS BIGINT) AS token_sum,
           MIN(token_count) AS token_min, MAX(token_count) AS token_max,
           CAST(SUM(is_tool) AS BIGINT) AS tool_sum
    FROM t0
    WHERE ts >= TIMESTAMP '2024-01-03 07:00:00'
      AND ts <  TIMESTAMP '2024-01-28 19:00:00'
    GROUP BY conv_id
    """,
)
def tier_rewrite_range(spark, sf_dir):
    """§4.3 aggregate-rewrite: the engine answers an arbitrary hour-aligned
    time-range aggregation FROM TIER ROWS ONLY (leading hours → whole days →
    whole months → trailing days → trailing hours), while the oracle
    aggregates the raw table — equality proves the rewrite's composition is
    exact. The real win at scale: O(days+months) tier rows per conversation
    instead of O(raw turns), all partition-pruned."""
    from datetime import datetime

    from .rewrite import rewrite_range_agg

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0)
    return rewrite_range_agg(
        tiers, datetime(2024, 1, 3, 7), datetime(2024, 1, 28, 19)
    )


# rows-only: sketch estimates are approximate by design; the error-bound
# and union-associativity guarantees are pytest'd (tests/test_rollup.py)
@register("tier_distinct_tools_monthly")
def tier_distinct_tools_monthly(spark, sf_dir):
    """D4 completed as TIER ALGEBRA (VERDICT r2 item 2): the hourly tier
    state carries mergeable HLL sketch columns (tool + text distincts) that
    `rollup_up` unions hourly→daily→monthly alongside sum/min/max — the
    monthly distinct estimates here never re-read raw data, exactly like
    every other tier aggregate. At 10^12 turns this answers per-month
    distinct-tools/distinct-texts from O(months) tier rows per conversation."""
    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0, sketch_cols=["tool", "text"])
    m = tiers["monthly"]
    return m.select(
        "conv_id",
        F.col("bucket_start").cast("timestamp_ntz").alias("bucket_start"),
        "n_turns",
        F.round(F.hll_sketch_estimate("tool_hll")).cast("long").alias(
            "distinct_tools_est"
        ),
        F.round(F.hll_sketch_estimate("text_hll")).cast("long").alias(
            "distinct_texts_est"
        ),
    )


@register(
    "gapfill_linear_hourly",
    """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    bounds AS (SELECT user_id, MIN(h) AS lo, MAX(h) AS hi FROM hourly GROUP BY 1),
    spine AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM bounds),
    j AS (
      SELECT s.user_id, s.h, hr.n,
             CAST(epoch(s.h) AS BIGINT) / 3600 AS pos
      FROM spine s LEFT JOIN hourly hr ON s.user_id = hr.user_id AND s.h = hr.h),
    w AS (
      SELECT user_id, h, n, pos,
             last_value(n IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN n IS NOT NULL THEN pos END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp,
             first_value(n IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN n IS NOT NULL THEN pos END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nn
      FROM j)
    SELECT user_id, CAST(h AS TIMESTAMP) AS h, n AS n_obs,
           CASE WHEN n IS NOT NULL THEN CAST(n AS DOUBLE)
                WHEN pv IS NULL OR nv IS NULL THEN NULL
                ELSE pv + (nv - pv) * CAST(pos - pp AS DOUBLE) / (nn - pp)
           END AS interp_n,
           CAST(n IS NULL AS BOOLEAN) AS filled
    FROM w
    """,
)
def gapfill_linear_hourly(spark, sf_dir):
    """K3 scale path with ZERO Python: linear interpolation of interior gaps
    as a pure window composition — LOCF of (value, position) forward,
    first-observation of (value, position) backward, then one arithmetic
    expression. Same shuffle profile as LOCF (one exchange on the series
    key); the Arrow grouped-map variant (engine/gapfill.gapfill_linear)
    remains for pandas-exact parity, but at 100 TB this is the plan to run.
    Leading/trailing gaps stay null (limit_area='inside' semantics)."""
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n"))
    bounds = hourly.groupBy("user_id").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("h"),
    )
    j = spine.join(hourly, ["user_id", "h"], "left").withColumn(
        "pos",
        (F.unix_timestamp(F.col("h").cast("timestamp")) / 3600).cast("long"),
    )
    back = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_pos = F.when(F.col("n").isNotNull(), F.col("pos"))
    w = j.select(
        "user_id",
        "h",
        "n",
        "pos",
        F.last("n", ignorenulls=True).over(back).alias("pv"),
        F.last(obs_pos, ignorenulls=True).over(back).alias("pp"),
        F.first("n", ignorenulls=True).over(fwd).alias("nv"),
        F.first(obs_pos, ignorenulls=True).over(fwd).alias("nn"),
    )
    interp = (
        F.when(F.col("n").isNotNull(), F.col("n").cast("double"))
        .when(F.col("pv").isNull() | F.col("nv").isNull(), F.lit(None))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("pos") - F.col("pp")).cast("double")
            / (F.col("nn") - F.col("pp"))
        )
    )
    return w.select(
        "user_id",
        "h",
        F.col("n").alias("n_obs"),
        interp.alias("interp_n"),
        F.col("n").isNull().alias("filled"),
    )


@register(
    "gapfill_locf_hourly",
    """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    bounds AS (SELECT user_id, MIN(h) AS lo, MAX(h) AS hi FROM hourly GROUP BY 1),
    spine AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM bounds),
    j AS (
      SELECT s.user_id, s.h, hr.n
      FROM spine s LEFT JOIN hourly hr ON s.user_id = hr.user_id AND s.h = hr.h)
    SELECT user_id, CAST(h AS TIMESTAMP) AS h, n AS n_obs,
           last_value(n IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_n,
           CAST(n IS NULL AS BOOLEAN) AS filled
    FROM j
    """,
)
def gapfill_locf_hourly(spark, sf_dir):
    """C5+F4+E5 in ONE shuffle: no dense-spine join. lead() gives each
    observed bucket its gap run; a month-chunked nested transform/sequence
    emits the filled rows carrying the LOCF value directly (n is never
    null on observed rows, so the carry IS the row's own n) — no single
    array exceeds ~744 entries regardless of gap length, matching the
    engine path's bound (engine/gapfill.py). Row-identical to the spine ⟕
    observed + last(ignorenulls) formulation the DuckDB oracle runs."""
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy("h")
    base = hourly.withColumn("nxt", F.lead("h").over(w))
    rows = base.select(
        "user_id",
        F.explode(
            F.expr(
                """
                concat(
                  array(named_struct(
                    'h', h, 'n_obs', n, 'locf_n', n, 'filled', false)),
                  CASE WHEN nxt IS NULL OR nxt <= h + interval 1 hour
                       THEN array()
                       ELSE flatten(transform(
                         sequence(
                           CAST(date_trunc('month', h + interval 1 hour)
                             AS TIMESTAMP_NTZ),
                           CAST(date_trunc('month', nxt - interval 1 hour)
                             AS TIMESTAMP_NTZ),
                           interval 1 month),
                         m0 -> transform(
                           sequence(
                             greatest(m0, h + interval 1 hour),
                             least(nxt - interval 1 hour,
                                   m0 + interval 1 month - interval 1 hour),
                             interval 1 hour),
                           g -> named_struct(
                             'h', g, 'n_obs', CAST(NULL AS BIGINT),
                             'locf_n', n, 'filled', true))))
                  END)
                """
            )
        ).alias("r"),
    )
    return rows.select(
        "user_id",
        F.col("r.h").alias("h"),
        F.col("r.n_obs").alias("n_obs"),
        F.col("r.locf_n").alias("locf_n"),
        F.col("r.filled").alias("filled"),
    )


@register(
    "gapfill_locf_salted_hourly",
    """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    bounds AS (SELECT user_id, MIN(h) AS lo, MAX(h) AS hi FROM hourly GROUP BY 1),
    spine AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM bounds),
    j AS (
      SELECT s.user_id, s.h, hr.n
      FROM spine s LEFT JOIN hourly hr ON s.user_id = hr.user_id AND s.h = hr.h)
    SELECT user_id, CAST(h AS TIMESTAMP) AS h, n AS n_obs,
           last_value(n IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_n,
           CAST(n IS NULL AS BOOLEAN) AS filled
    FROM j
    """,
)
def gapfill_locf_salted_hourly(spark, sf_dir):
    """E5 skew-safe under the driver's full hash gate: the engine's
    `gapfill_locf_salted` (dense spine + time-sliced salted as-of carry,
    engine/gapfill.py) replayed against the same windowed-LOCF oracle as
    gapfill_locf_hourly — per-task work bounded by the 7-day slice instead
    of the series length."""
    from .gapfill import gapfill_locf_salted

    e = _t(spark, sf_dir, "events")
    series = e.groupBy(
        F.col("user_id").cast("string").alias("conv_id"),
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("bucket_start"),
    ).agg(F.count("*").cast("double").alias("value")).withColumn(
        "metric", F.lit("n_events")
    )
    out = gapfill_locf_salted(series, slice="7 days")
    return out.select(
        F.col("conv_id").cast("long").alias("user_id"),
        F.col("bucket_start").cast("timestamp_ntz").alias("h"),
        F.when(~F.col("filled"), F.col("value")).cast("long").alias("n_obs"),
        F.col("value").cast("long").alias("locf_n"),
        "filled",
    )


@register(
    "dod_timestamp_deltas",
    """
    WITH d AS (
      SELECT user_id, event_id, ts,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS delta_us
      FROM events)
    SELECT user_id, event_id, CAST(delta_us AS BIGINT) AS delta_us,
           CAST(delta_us - lag(delta_us) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS dod_us
    FROM d
    """,
)
def dod_timestamp_deltas(spark, sf_dir):
    """E1 twice: the delta-of-delta series the K2 codec bitpacks — verified
    relationally here, bit-level codec verified in pytest."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    d = e.select(
        "user_id", "event_id", "ts", (us - F.lag(us).over(w)).alias("delta_us")
    )
    return d.select(
        "user_id",
        "event_id",
        F.col("delta_us").cast("long").alias("delta_us"),
        (F.col("delta_us") - F.lag("delta_us").over(w)).cast("long").alias("dod_us"),
    )


@register(
    "climatology_hour_of_day",
    """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    clim AS (
      SELECT user_id, CAST(hour(h) AS INT) AS hod,
             CAST(SUM(n) AS BIGINT) AS sum_n, COUNT(*) AS cnt
      FROM hourly GROUP BY 1, 2)
    SELECT hr.user_id, CAST(hr.h AS TIMESTAMP) AS h, hr.n AS n_obs,
           CAST(c.sum_n AS DOUBLE) / c.cnt AS clim_mean,
           hr.n - CAST(c.sum_n AS DOUBLE) / c.cnt AS anomaly
    FROM hourly hr
    JOIN clim c ON c.user_id = hr.user_id AND c.hod = CAST(hour(hr.h) AS INT)
    """,
)
def climatology_hour_of_day(spark, sf_dir):
    """The reference domain's headline operation (climatology + anomaly,
    its monthly-normals pattern applied to transcript activity): per-user
    hour-of-day normals from integer sums, then each observed bucket's
    departure from its normal. Exact-integer aggregation state keeps the
    single final division bit-identical across engines; the normals table
    (≤24 rows/user) broadcasts into the anomaly join."""
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n"))
    clim = hourly.groupBy(
        "user_id", F.hour("h").cast("int").alias("hod")
    ).agg(
        F.sum("n").cast("long").alias("sum_n"), F.count("*").alias("cnt")
    )
    mean = F.col("sum_n").cast("double") / F.col("cnt")
    hr = hourly.alias("hr")
    c = F.broadcast(clim.alias("c"))
    return (
        hr.join(
            c,
            (F.col("hr.user_id") == F.col("c.user_id"))
            & (F.hour(F.col("hr.h")).cast("int") == F.col("c.hod")),
        )
        .select(
            F.col("hr.user_id").alias("user_id"),
            F.col("hr.h").alias("h"),
            F.col("hr.n").alias("n_obs"),
            mean.alias("clim_mean"),
            (F.col("hr.n") - mean).alias("anomaly"),
        )
    )


@register(
    "rolling_zscore_hourly",
    """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    w AS (
      SELECT user_id, h, n,
             CAST(SUM(n) OVER win AS BIGINT) AS s,
             CAST(SUM(n * n) OVER win AS BIGINT) AS sq,
             CAST(COUNT(*) OVER win AS BIGINT) AS k
      FROM hourly
      WINDOW win AS (PARTITION BY user_id ORDER BY h
                     ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
    SELECT user_id, CAST(h AS TIMESTAMP) AS h, n AS n_obs, s, sq, k,
           CASE WHEN k > 1
                     AND (CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * s / k)
                         / (k - 1) > 0
                THEN (n - CAST(s AS DOUBLE) / k)
                     / sqrt((CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * s / k)
                            / (k - 1))
           END AS zscore
    FROM w
    """,
)
def rolling_zscore_hourly(spark, sf_dir):
    """Rolling 24-bucket z-score detrending (E4/E6 applied to anomaly
    detection): windowed integer sum/sum-of-squares state, variance and
    score as one shared final float expression so Spark and DuckDB agree
    bit-for-bit. Rows with no spread (var <= 0) or a single-point window
    yield NULL rather than a fabricated score."""
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n"))
    win = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(-23, Window.currentRow)
    )
    w = hourly.select(
        "user_id",
        "h",
        "n",
        F.sum("n").over(win).cast("long").alias("s"),
        F.sum(F.col("n") * F.col("n")).over(win).cast("long").alias("sq"),
        F.count("*").over(win).cast("long").alias("k"),
    )
    var = (
        F.col("sq").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("k")
    ) / (F.col("k") - 1)
    z = F.when(
        (F.col("k") > 1) & (var > 0),
        (F.col("n") - F.col("s").cast("double") / F.col("k")) / F.sqrt(var),
    )
    return w.select(
        "user_id",
        "h",
        F.col("n").alias("n_obs"),
        "s",
        "sq",
        "k",
        z.alias("zscore"),
    )


@register(
    "chunk_roundtrip_hourly",
    """
    SELECT CAST(user_id AS VARCHAR) AS conv_id,
           'hourly' AS tier,
           'n_events' AS metric,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_start,
           CAST(COUNT(*) AS DOUBLE) AS value
    FROM events GROUP BY 1, 2, 3, 4
    """,
)
def chunk_roundtrip_hourly(spark, sf_dir):
    """K1+K2+K5 under the driver's full hash oracle: the hourly series is
    month-chunked, Gorilla/delta-of-delta ENCODED into blobs, CRC-checked,
    then DECODED back — and must hash-match the plain aggregation the
    oracle computes. Any bit the codecs or the Arrow boundary lose shows
    up as a driver mismatch, not just a pytest failure."""
    from .codec.chunks import decode_chunks, make_chunks

    e = _t(spark, sf_dir, "events")
    series = e.groupBy(
        F.col("user_id").cast("string").alias("conv_id"),
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("bucket_start"),
    ).agg(F.count("*").cast("double").alias("value")).withColumn(
        "metric", F.lit("n_events")
    )
    chunks = make_chunks(series, tier="hourly", chunk_unit="month")
    decoded, _bad = decode_chunks(chunks)
    return decoded.select(
        "conv_id",
        "tier",
        "metric",
        F.col("bucket_start").cast("timestamp_ntz").alias("bucket_start"),
        "value",
    )


@register(
    "chunk_range_read_hourly",
    """
    SELECT CAST(user_id AS VARCHAR) AS conv_id,
           'hourly' AS tier,
           'n_events' AS metric,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_start,
           CAST(COUNT(*) AS DOUBLE) AS value
    FROM events
    WHERE date_trunc('hour', ts) >= TIMESTAMP '2024-01-10 00:00:00'
      AND date_trunc('hour', ts) <  TIMESTAMP '2024-01-13 00:00:00'
    GROUP BY 1, 2, 3, 4
    """,
)
def chunk_range_read_hourly(spark, sf_dir):
    """The TSDB range read over T4 blobs (K5 serve path): day-chunked
    Gorilla/DoD blobs are PRUNED by their [chunk_start, chunk_end] span
    before any decode — only chunks overlapping the 3-day query window
    pay the Python boundary — then decoded points are clipped exactly.
    The oracle recomputes the clipped hourly series from raw events, so
    both the pruning predicate (a dropped-but-needed chunk loses rows)
    and the codecs (any lost bit) show up as a driver mismatch."""
    from .codec.chunks import make_chunks, read_chunk_range

    e = _t(spark, sf_dir, "events")
    series = e.groupBy(
        F.col("user_id").cast("string").alias("conv_id"),
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("bucket_start"),
    ).agg(F.count("*").cast("double").alias("value")).withColumn(
        "metric", F.lit("n_events")
    )
    chunks = make_chunks(series, tier="hourly", chunk_unit="day")
    pts, _bad = read_chunk_range(
        chunks, "2024-01-10 00:00:00", "2024-01-13 00:00:00"
    )
    return pts.select(
        "conv_id",
        "tier",
        "metric",
        F.col("bucket_start").cast("timestamp_ntz").alias("bucket_start"),
        "value",
    )


@register(
    "tier_hourly_filled",
    _TIER_CTE
    + """
    , bounds AS (
      SELECT conv_id, date_trunc('day', bucket_start) AS d,
             MIN(bucket_start) AS lo, MAX(bucket_start) AS hi
      FROM hourly GROUP BY 1, 2
    ),
    spine AS (
      SELECT conv_id, d,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_start
      FROM bounds
    )
    SELECT s.conv_id,
           CAST(s.bucket_start AS TIMESTAMP) AS bucket_start,
           last_value(h.n_turns IGNORE NULLS) OVER w AS n_turns,
           last_value(h.token_sum IGNORE NULLS) OVER w AS token_sum,
           last_value(h.token_min IGNORE NULLS) OVER w AS token_min,
           last_value(h.token_max IGNORE NULLS) OVER w AS token_max,
           last_value(h.tool_sum IGNORE NULLS) OVER w AS tool_sum,
           last_value(h.tool_min IGNORE NULLS) OVER w AS tool_min,
           last_value(h.tool_max IGNORE NULLS) OVER w AS tool_max,
           last_value(h.hours_count IGNORE NULLS) OVER w AS hours_count,
           last_value(h.hturns_min IGNORE NULLS) OVER w AS hturns_min,
           last_value(h.hturns_max IGNORE NULLS) OVER w AS hturns_max,
           h.n_turns IS NULL AS filled,
           CASE WHEN h.n_turns IS NULL THEN 'locf' END AS fill_method
    FROM spine s LEFT JOIN hourly h
      ON s.conv_id = h.conv_id AND s.bucket_start = h.bucket_start
    WINDOW w AS (PARTITION BY s.conv_id, s.d ORDER BY s.bucket_start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def tier_hourly_filled(spark, sf_dir):
    """SURVEY §1.2 under the hash gate: the hourly tier WITH its day-local
    LOCF fill rows (engine/rollup.py:densify_hourly_locf) — gap hours
    between a conversation's first and last observed hour of each day carry
    the previous observed integer state forward, flagged
    filled/fill_method so upward rollups exclude them. The oracle rebuilds
    the same spine + IGNORE NULLS carry in SQL; hash equality pins the
    exact fill semantics (day-local, state-carry, flag placement)."""
    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    hourly = erollup.rollup_hourly(t0)
    return erollup.densify_hourly_locf(hourly).drop("tier")


@register(
    "tier_variance_pipeline_monthly",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts,
             CAST(length(props) AS BIGINT) AS token_count
      FROM events)
    SELECT conv_id,
           CAST(date_trunc('month', ts) AS TIMESTAMP) AS bucket_start,
           COUNT(*) AS n_turns,
           CAST(SUM(token_count) AS BIGINT) AS token_sum,
           CAST(SUM(token_count * token_count) AS BIGINT) AS token_sumsq,
           (CAST(SUM(token_count * token_count) AS DOUBLE)
            - CAST(SUM(token_count) AS DOUBLE) * CAST(SUM(token_count) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE))
           / CAST(COUNT(*) AS DOUBLE) AS token_var_pop
    FROM t0 GROUP BY 1, 2
    """,
)
def tier_variance_pipeline_monthly(spark, sf_dir):
    """Exact variance FROM TIER STATE through the REAL pipeline on the
    SALTED path: TierPipeline(salted=True, sumsq_cols=["token_count"])
    carries Σx² as long tier state (engine/rollup.py sumsq_partial_aggs) —
    associative addition makes it compose raw→hourly→daily→monthly and
    across salts bit-exactly, so population variance is served from the
    monthly tier with ONE final float expression (var = (Σx² − (Σx)²/n)/n,
    identical IEEE op order to the oracle's direct-from-raw computation).
    The tier-served variance of a 10^12-turn month reads |convs| monthly
    rows, never raw."""
    import tempfile

    from .pipeline import TierPipeline

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    pipe = TierPipeline(
        spark,
        tempfile.mkdtemp(prefix="tier-var-"),
        salted=True,
        sumsq_cols=["token_count"],
        fill_tiers=False,
    )
    pipe.run(t0, stages=("hourly", "daily", "monthly"))
    monthly = pipe.read_tier("monthly")
    n = F.col("n_turns").cast("double")
    s = F.col("token_sum").cast("double")
    q = F.col("token_count_sumsq").cast("double")
    return monthly.select(
        "conv_id",
        "bucket_start",
        "n_turns",
        "token_sum",
        F.col("token_count_sumsq").alias("token_sumsq"),
        ((q - s * s / n) / n).alias("token_var_pop"),
    )


@register(
    "tier_rewrite_range_variance",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts,
             CAST(length(props) AS BIGINT) AS token_count
      FROM events)
    SELECT conv_id, COUNT(*) AS n_turns,
           CAST(SUM(token_count) AS BIGINT) AS token_sum,
           CAST(SUM(token_count * token_count) AS BIGINT) AS token_sumsq,
           (CAST(SUM(token_count * token_count) AS DOUBLE)
            - CAST(SUM(token_count) AS DOUBLE) * CAST(SUM(token_count) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE))
           / CAST(COUNT(*) AS DOUBLE) AS token_var_pop
    FROM t0
    WHERE ts >= TIMESTAMP '2024-01-03 07:00:00'
      AND ts <  TIMESTAMP '2024-01-28 19:00:00'
    GROUP BY conv_id
    """,
)
def tier_rewrite_range_variance(spark, sf_dir):
    """§4.3 rewrite extended to second moments: EXACT population variance
    of token_count over an arbitrary hour-aligned range, answered from
    tier rows only (leading hours → days → months → trailing days/hours;
    Σx² composes by long addition like Σx), while the oracle computes the
    variance over the RAW rows of the range with the identical final float
    expression — hash equality proves second-moment range rewriting costs
    nothing in exactness. Scan shape: O(tier rows in the decomposition)
    per conversation, never O(raw turns)."""
    from datetime import datetime

    from .rewrite import rewrite_range_variance

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0, sumsq_cols=["token_count"])
    return rewrite_range_variance(
        tiers, datetime(2024, 1, 3, 7), datetime(2024, 1, 28, 19)
    )


@register(
    "tier_corr_pipeline_monthly",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts,
             CAST(length(props) AS BIGINT) AS x,
             CAST(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS BIGINT) AS y
      FROM events),
    s AS (
      SELECT conv_id,
             CAST(date_trunc('month', ts) AS TIMESTAMP) AS bucket_start,
             COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM t0 GROUP BY 1, 2)
    SELECT conv_id, bucket_start, n AS n_turns,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS corr_tokens_tool
    FROM s
    WHERE CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
    """,
)
def tier_corr_pipeline_monthly(spark, sf_dir):
    """Pearson correlation SERVED FROM TIER STATE through the REAL pipeline
    on the SALTED path: TierPipeline(salted=True, sumsq_cols=[x, y],
    sumprod_cols=[(x, y)]) carries n/Σx/Σy/Σx²/Σy²/Σxy as long tier state —
    each composes raw→hourly→daily→monthly and across salts by addition, so
    per-(conv, month) correlation is one final float expression over 6
    monthly longs while the oracle recomputes it from raw with the
    identical IEEE op order. Zero-variance groups are excluded by the same
    expression on both sides. The stats_agg-2D serving shape: a 10^12-turn
    month reads |convs| tier rows, never raw."""
    import tempfile

    from .pipeline import TierPipeline

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    pipe = TierPipeline(
        spark,
        tempfile.mkdtemp(prefix="tier-corr-"),
        salted=True,
        sumsq_cols=["token_count", "is_tool"],
        sumprod_cols=[("token_count", "is_tool")],
        fill_tiers=False,
    )
    pipe.run(t0, stages=("hourly", "daily", "monthly"))
    monthly = pipe.read_tier("monthly")
    n = F.col("n_turns").cast("double")
    sx = F.col("token_sum").cast("double")
    sy = F.col("tool_sum").cast("double")
    sxx = F.col("token_count_sumsq").cast("double")
    syy = F.col("is_tool_sumsq").cast("double")
    sxy = F.col("token_count_x_is_tool_sumprod").cast("double")
    vxn = n * sxx - sx * sx
    vyn = n * syy - sy * sy
    return monthly.filter((vxn > 0) & (vyn > 0)).select(
        "conv_id",
        "bucket_start",
        "n_turns",
        ((n * sxy - sx * sy) / (F.sqrt(vxn) * F.sqrt(vyn))).alias(
            "corr_tokens_tool"
        ),
    )


@register(
    "tier_rewrite_range_realtime",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts,
             CAST(length(props) AS BIGINT) AS token_count,
             CAST(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS BIGINT) AS is_tool
      FROM events)
    SELECT conv_id, COUNT(*) AS n_turns,
           CAST(SUM(token_count) AS BIGINT) AS token_sum,
           MIN(token_count) AS token_min, MAX(token_count) AS token_max,
           CAST(SUM(is_tool) AS BIGINT) AS tool_sum
    FROM t0
    WHERE ts >= TIMESTAMP '2024-01-03 07:00:00'
      AND ts <  TIMESTAMP '2024-01-29 19:00:00'
    GROUP BY conv_id
    """,
)
def tier_rewrite_range_realtime(spark, sf_dir):
    """§4.3 rewrite × real-time serving: the tiers are materialized ONLY
    below a 2024-01-27 watermark (simulating materializer lag), yet the
    served range runs to 01-29 19:00 — tier spans answer everything below
    the watermark, one bounded raw-tail rollup answers the rest. The
    oracle aggregates raw over the WHOLE range; hash equality proves the
    straddling composition is exact (no gap/overlap/double count at the
    watermark seam)."""
    from datetime import datetime

    from .rewrite import rewrite_range_agg_realtime

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    wm = datetime(2024, 1, 27)
    tiers = erollup.build_tiers(
        t0.filter(F.col("ts").cast("timestamp_ntz") < F.lit(wm))
    )
    return rewrite_range_agg_realtime(
        tiers, t0, datetime(2024, 1, 3, 7), datetime(2024, 1, 29, 19), wm
    )


@register(
    "tier_role_freq_monthly",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts, event_type AS role
      FROM events)
    SELECT conv_id,
           CAST(date_trunc('month', ts) AS TIMESTAMP) AS bucket_start,
           role, COUNT(*) AS n
    FROM t0 GROUP BY 1, 2, 3
    """,
)
def tier_role_freq_monthly(spark, sf_dir):
    """M26 categorical frequency TIER STATE: the monthly tier's
    `role_freq` map (exact value→count state composed hourly→daily→monthly
    by key-union addition, engine/rollup.py freq_maps/freq_merge_aggs)
    exploded back into rows — the oracle recomputes the distribution from
    raw, so hash equality proves the map algebra loses nothing across two
    tier compositions. At scale this serves per-category breakdowns and
    exact heavy-hitters from O(tier) rows."""
    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0, freq_cols=["role"])
    m = tiers["monthly"]
    return m.select(
        "conv_id",
        "bucket_start",
        F.explode("role_freq").alias("role", "n"),
    )


@register(
    "tier_role_hh_monthly",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts, event_type AS role
      FROM events),
    c AS (
      SELECT conv_id,
             CAST(date_trunc('month', ts) AS TIMESTAMP) AS bucket_start,
             role, COUNT(*) AS n
      FROM t0 GROUP BY 1, 2, 3)
    SELECT conv_id, bucket_start, role, n,
           CAST(SUM(n) OVER (PARTITION BY conv_id, bucket_start) AS BIGINT)
             AS n_total
    FROM c
    """,
)
def tier_role_hh_monthly(spark, sf_dir):
    """M34 BOUNDED heavy-hitter TIER STATE (Misra–Gries mergeable summary,
    engine/heavyhitters.py): the monthly `role_hh32` summary exploded back
    into rows plus its companion total. With cap ≥ cardinality no MG
    truncation fires at any tier, so the summary must equal the exact
    distribution — the hash gate pins the exact regime while the
    truncating regime's error bounds are pytest'd
    (tests/test_heavyhitters.py). At 100 TB this is the freq_cols variant
    that survives high-cardinality columns: per-bucket state is hard-capped
    at `cap` counters with a (N−S)/(cap+1) undercount bound computable
    from state alone."""
    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0, hh_cols={"role": 32})
    m = tiers["monthly"]
    return m.select(
        "conv_id",
        "bucket_start",
        F.explode("role_hh32").alias("role", "n"),
        F.col("role_hhn32").alias("n_total"),
    )


@register(
    "tier_rewrite_range_topk_roles",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts, event_type AS role
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-03 07:00:00'
        AND ts <  TIMESTAMP '2024-01-28 19:00:00'),
    c AS (
      SELECT conv_id, role AS value, COUNT(*) AS n FROM t0 GROUP BY 1, 2),
    r AS (
      SELECT conv_id, value, n,
             ROW_NUMBER() OVER (
               PARTITION BY conv_id ORDER BY n DESC, value) AS rank
      FROM c)
    SELECT conv_id, rank, value, n FROM r WHERE rank <= 3
    """,
)
def tier_rewrite_range_topk_roles(spark, sf_dir):
    """§4.3 rewrite over M26 frequency state: exact per-conversation top-3
    roles for an arbitrary hour-aligned range, served from span-matched
    tier maps (key-union addition across leading-hours/days/months spans)
    while the oracle counts raw rows in the range — hash equality proves
    exact heavy-hitters need no raw scan."""
    from datetime import datetime

    from .rewrite import rewrite_range_freq

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0, freq_cols=["role"])
    return rewrite_range_freq(
        tiers, datetime(2024, 1, 3, 7), datetime(2024, 1, 28, 19), "role", k=3
    )


@register(
    "tier_rewrite_range_hist",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             CAST(LEAST(FLOOR(length(props) / 16), 11) AS BIGINT) AS bin
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-03 07:00:00'
        AND ts <  TIMESTAMP '2024-01-28 19:00:00'),
    c AS (SELECT conv_id, bin, COUNT(*) AS cnt FROM t0 GROUP BY 1, 2),
    w AS (
      SELECT conv_id, bin, cnt,
             SUM(cnt) OVER (PARTITION BY conv_id ORDER BY bin) AS cum,
             SUM(cnt) OVER (PARTITION BY conv_id) AS total
      FROM c)
    SELECT conv_id,
           CAST(MIN(CASE WHEN cum * 2 >= total THEN bin END) AS BIGINT)
             AS p50_bin,
           CAST(MIN(CASE WHEN cum * 20 >= total * 19 THEN bin END) AS BIGINT)
             AS p95_bin,
           CAST(MAX(total) AS BIGINT) AS n
    FROM w GROUP BY conv_id
    """,
)
def tier_rewrite_range_hist(spark, sf_dir):
    """§4.3 rewrite over M6 histogram state: range percentiles (p50/p95
    bins of token_count, 12 bins × width 16) served from span-matched tier
    bin arrays folded by element-wise addition, while the oracle bins raw
    rows of the range — hash equality proves distribution shape composes
    exactly across leading-hours/days/months spans."""
    from datetime import datetime

    from .rewrite import rewrite_range_hist

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(
        t0, hist_cols={"token_count": (0.0, 16.0, 12)}
    )
    return rewrite_range_hist(
        tiers, datetime(2024, 1, 3, 7), datetime(2024, 1, 28, 19), "token_count"
    )


_FORGET_CTE = _TIER_CTE.replace(
    "FROM events\n)", "FROM events WHERE user_id NOT IN (7, 19)\n)", 1
)
assert _FORGET_CTE.count("WHERE user_id NOT IN") == 1


@register(
    "tier_monthly_after_forget",
    _FORGET_CTE + _TIER_VIEW.format(tier="monthly"),
)
def tier_monthly_after_forget(spark, sf_dir):
    """L7 right-to-be-forgotten (engine/forget.py) under the hash gate: a
    full pipeline run, then `forget_conversations` of two conversations
    with the input re-presented — tombstones change exactly the affected
    days' ingest fingerprints, the ordinary resume machinery re-rolls them
    through every tier, and the monthly view must equal the oracle built
    on the filtered input. Erasure correctness proven as aggregate-level
    hash equality, not just row absence."""
    import tempfile

    from .forget import forget_conversations
    from .pipeline import TierPipeline

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    pipe = TierPipeline(
        spark, tempfile.mkdtemp(prefix="tier-forget-"), fill_tiers=False
    )
    pipe.run(t0)
    forget_conversations(
        pipe, ["conv-00000007", "conv-00000019"], t0=t0
    )
    return erollup.tier_view(pipe.read_tier("monthly"), "monthly")


_CAGG_SQL = """
SELECT CAST(date_trunc('week', bucket_start) AS TIMESTAMP) AS week,
       substr(conv_id, length(conv_id), 1) AS cohort,
       CAST(SUM(n_turns) AS BIGINT) AS turns,
       COUNT(*) AS hours,
       MIN(token_min) AS min_tok,
       MAX(n_turns) AS peak,
       CAST(SUM(n_turns) AS DOUBLE) / CAST(COUNT(n_turns) AS DOUBLE) AS avg_turns,
       CAST(MIN(bucket_start) AS TIMESTAMP) AS first_bucket,
       (MAX({'o': bucket_start, 'v': token_max})).v AS last_max
FROM hourly
GROUP BY 1, 2
"""


@register("cagg_weekly_cohort", _TIER_CTE + _CAGG_SQL)
def cagg_weekly_cohort(spark, sf_dir):
    """User-DEFINED continuous aggregate (engine/cagg.py) under the hash
    gate: a declared (week, cohort) view with every exact algebra kind
    (sum/count/min/max/avg/first/last), built INCREMENTALLY — half the
    conversations ingested and consumed first, then the rest arrive and a
    second refresh consumes only the changelog — must equal the oracle
    computed on the full input in one pass. The first/last kinds carry
    lexicographic (order, value) structs so order-key ties are
    deterministic on both engines."""
    import tempfile

    from .cagg import ContinuousAggregate
    from .pipeline import TierPipeline

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    pipe = TierPipeline(
        spark, tempfile.mkdtemp(prefix="tier-cagg-"),
        snapshots=True, fill_tiers=False,
    )
    pipe.run(
        t0.filter("substr(conv_id, length(conv_id), 1) < '5'"),
        stages=("hourly",),
    )
    cagg = ContinuousAggregate(
        pipe, tempfile.mkdtemp(prefix="cagg-view-"),
        keys={"week": "date_trunc('week', bucket_start)",
              "cohort": "substr(conv_id, length(conv_id), 1)"},
        aggs={
            "turns": ("sum", "n_turns"),
            "hours": ("count",),
            "min_tok": ("min", "token_min"),
            "peak": ("max", "n_turns"),
            "avg_turns": ("avg", "n_turns"),
            "first_bucket": ("first", "bucket_start", "bucket_start"),
            "last_max": ("last", "token_max", "bucket_start"),
        },
    )
    cagg.refresh()
    pipe.run(t0, stages=("hourly",))
    cagg.refresh()
    return cagg.read()


@register(
    "tier_kmv_text_overlap_daily",
    """
    WITH cm AS (
      SELECT DISTINCT
             concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, props
      FROM events),
    s AS (SELECT conv_id, d, CAST(COUNT(*) AS BIGINT) AS n
          FROM cm GROUP BY 1, 2),
    c AS (SELECT a.conv_id, a.d AS da, CAST(COUNT(*) AS BIGINT) AS n_common
          FROM cm a JOIN cm b
            ON a.conv_id = b.conv_id AND a.props = b.props
           AND b.d = a.d + INTERVAL 1 DAY
          GROUP BY 1, 2)
    SELECT sa.conv_id,
           sa.d AS day_a, sb.d AS day_b,
           sa.n AS n_texts_a, sb.n AS n_texts_b,
           COALESCE(c.n_common, 0) AS n_common,
           CAST(COALESCE(c.n_common, 0) AS DOUBLE)
             / CAST(sa.n + sb.n - COALESCE(c.n_common, 0) AS DOUBLE)
             AS jaccard
    FROM s sa
    JOIN s sb ON sa.conv_id = sb.conv_id
             AND sb.d = sa.d + INTERVAL 1 DAY
    LEFT JOIN c ON c.conv_id = sa.conv_id AND c.da = sa.d
    """,
)
def tier_kmv_text_overlap_daily(spark, sf_dir):
    """M45 KMV distinct sketches with SET ALGEBRA (engine/kmv.py): the
    daily tier carries `text_kmv256` — the 256 smallest xxhash64 values
    of the day's distinct texts — merged hourly→daily by
    sorted-union-truncate (exact-deterministic, bit-identical to a direct
    build; the salted leaf and every tier composition produce the same
    array). Day-over-day overlap per conversation is then pure array
    algebra over TWO TIER ROWS: |A|, |B|, |A∩B|, Jaccard — the set
    question HLL union state cannot answer (register-max union only
    estimates |A∪B|). The driver fixture's per-day cardinality sits far
    below k=256, so every sketch is in the EXACT regime and the
    full-hash oracle recomputes the true set overlap from raw (the
    Misra–Gries cap≥cardinality trick). At 10^12 turns the same query
    runs on O(days) tier rows per conversation; saturated sketches
    degrade to the Beyer et al. SIGMOD 2007 estimators (error bounds
    pytest'd in tests/test_kmv.py)."""
    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0, kmv_cols={"text": 256})
    m = tiers["daily"]
    a = m.select(
        "conv_id",
        F.col("bucket_start").alias("day_a"),
        # next-day join key: date_add returns DATE; daily buckets sit at
        # midnight so the NTZ round-trip is lossless
        F.date_add(F.col("bucket_start"), 1)
        .cast("timestamp_ntz")
        .alias("day_b"),
        F.col("text_kmv256").alias("_ska"),
    )
    b = m.select(
        "conv_id",
        F.col("bucket_start").alias("day_b"),
        F.col("text_kmv256").alias("_skb"),
    )
    j = a.join(b, ["conv_id", "day_b"])
    n_a = F.size("_ska").cast("long")
    n_b = F.size("_skb").cast("long")
    n_common = F.size(F.array_intersect("_ska", "_skb")).cast("long")
    return j.select(
        "conv_id",
        "day_a",
        "day_b",
        n_a.alias("n_texts_a"),
        n_b.alias("n_texts_b"),
        n_common.alias("n_common"),
        (
            n_common.cast("double") / (n_a + n_b - n_common).cast("double")
        ).alias("jaccard"),
    )


_CAGG_KMV_SQL = """
SELECT CAST(date_trunc('week', bucket_start) AS TIMESTAMP) AS week,
       substr(conv_id, length(conv_id), 1) AS cohort,
       CAST(COUNT(DISTINCT bucket_start) AS DOUBLE) AS ubuckets,
       CAST(SUM(n_turns) AS BIGINT) AS turns
FROM hourly
GROUP BY 1, 2
"""


@register("cagg_distinct_kmv_weekly", _TIER_CTE + _CAGG_KMV_SQL)
def cagg_distinct_kmv_weekly(spark, sf_dir):
    """distinct_kmv in the continuous-aggregate algebra (engine/cagg.py ×
    engine/kmv.py) under the hash gate: a (week, cohort) view whose
    distinct-bucket count is carried as bottom-k KMV state in the day
    partials (k=512, far above the fixture's per-group cardinality →
    EXACT regime), built INCREMENTALLY across two ingest batches — the
    union-truncate merge across day partials must reproduce the oracle's
    one-pass COUNT(DISTINCT) exactly. This is the mergeable exact-COUNT-
    DISTINCT stand-in the algebra documented as impossible for plain
    counts: KMV makes it exact below k and a bounded estimate beyond."""
    import tempfile

    from .cagg import ContinuousAggregate
    from .pipeline import TierPipeline

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    pipe = TierPipeline(
        spark, tempfile.mkdtemp(prefix="tier-caggkmv-"),
        snapshots=True, fill_tiers=False,
    )
    pipe.run(
        t0.filter("substr(conv_id, length(conv_id), 1) < '5'"),
        stages=("hourly",),
    )
    cagg = ContinuousAggregate(
        pipe, tempfile.mkdtemp(prefix="caggkmv-view-"),
        keys={"week": "date_trunc('week', bucket_start)",
              "cohort": "substr(conv_id, length(conv_id), 1)"},
        aggs={
            "ubuckets": ("distinct_kmv", "bucket_start", 512),
            "turns": ("sum", "n_turns"),
        },
    )
    cagg.refresh()
    pipe.run(t0, stages=("hourly",))
    cagg.refresh()
    return cagg.read()


@register(
    "tier_grain_6h",
    _TIER_CTE
    + """
    SELECT conv_id,
           TIMESTAMP '1970-01-01 00:00:00'
             + (CAST(floor(epoch(bucket_start) / 21600) AS BIGINT) * 21600)
               * INTERVAL 1 SECOND AS bucket_start,
           CAST(SUM(n_turns) AS BIGINT) AS n_turns,
           CAST(SUM(token_sum) AS BIGINT) AS token_sum,
           MIN(token_min) AS token_min, MAX(token_max) AS token_max,
           CAST(SUM(tool_sum) AS BIGINT) AS tool_sum,
           CAST(SUM(token_sum) AS DOUBLE) / CAST(SUM(n_turns) AS DOUBLE)
             AS token_mean
    FROM hourly
    GROUP BY 1, 2
    """,
)
def tier_grain_6h(spark, sf_dir):
    """M46 arbitrary-grain downsample serving (engine/rollup.py
    rollup_grain): 6-hour buckets REGROUPED FROM THE HOURLY TIER with the
    exact composition algebra — the TimescaleDB `time_bucket` regrouping,
    never re-reading raw. Buckets are integer epoch-floor on unix micros
    (origin 1970-01-01 UTC), so the oracle's epoch arithmetic over its
    own hourly CTE reproduces them exactly; whole-day grains
    automatically regroup the ~24x smaller DAILY tier instead (pytest'd
    equal). At 10^12 turns this serves any dashboard zoom level from
    O(tier) rows with one shuffle."""
    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0)
    g = erollup.rollup_grain(tiers, 6)
    return g.select(
        "conv_id",
        "bucket_start",
        "n_turns",
        "token_sum",
        "token_min",
        "token_max",
        "tool_sum",
        (
            F.col("token_sum").cast("double") / F.col("n_turns").cast("double")
        ).alias("token_mean"),
    )


@register(
    "tier_sessions_monthly",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
               AS turn_idx
      FROM events),
    flagged AS (
      SELECT conv_id,
             CAST(date_trunc('month', ts) AS TIMESTAMP) AS m,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM t0
      WINDOW w AS (PARTITION BY conv_id, date_trunc('month', ts)
                   ORDER BY ts, turn_idx))
    SELECT conv_id, m AS bucket_start,
           CAST(SUM(new_sess) AS BIGINT) AS n_sessions
    FROM flagged GROUP BY 1, 2
    """,
)
def tier_sessions_monthly(spark, sf_dir):
    """M47 mergeable SESSIONIZATION tier state (engine/sessionstate.py)
    through the REAL pipeline on the SALTED path: per-hour island counts
    plus boundary timestamps form a time-ordered monoid, so
    `TierPipeline(session_gaps=[30])` composes session counts
    hourly→daily→monthly exactly — the oracle re-runs gaps-and-islands
    (30-min inactivity gap, strictly-greater convention) over raw and
    hash equality proves two tier compositions lose nothing. The
    operator that looks inherently sequential becomes an O(tier-rows)
    fold: at 10^12 turns, monthly session counts come from ≤31 daily
    structs per conversation, never a raw scan."""
    import tempfile

    from .pipeline import TierPipeline

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    pipe = TierPipeline(
        spark, tempfile.mkdtemp(prefix="tier-sess-"),
        salted=True, session_gaps=[30], fill_tiers=False,
    )
    pipe.run(t0, stages=("hourly", "daily", "monthly"))
    m = pipe.read_tier("monthly")
    return m.select(
        "conv_id",
        "bucket_start",
        F.col("sessions_g30")["n"].alias("n_sessions"),
    )


@register(
    "tier_statedur_monthly",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts, event_type AS role,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
               AS turn_idx
      FROM events),
    d AS (
      SELECT conv_id,
             CAST(date_trunc('month', ts) AS TIMESTAMP) AS m, role,
             epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dur
      FROM t0
      WINDOW w AS (PARTITION BY conv_id, date_trunc('month', ts)
                   ORDER BY ts, turn_idx))
    SELECT conv_id, m AS bucket_start, role,
           CAST(SUM(dur) AS BIGINT) AS micros
    FROM d WHERE dur IS NOT NULL GROUP BY 1, 2, 3
    """,
)
def tier_statedur_monthly(spark, sf_dir):
    """M48 duration-in-state tier state (engine/statedur.py — the
    TimescaleDB toolkit state_agg) through the REAL pipeline on the
    SALTED path: each hourly bucket stores a (first_us, last_us,
    last_state, state→micros map) struct where [t_i, t_{i+1}) between
    consecutive turns is attributed to the state at t_i; the merge fold
    adds each BOUNDARY interval to the earlier bucket's last_state, so
    monthly time-in-state composed from hourly structs equals a fresh
    lead()-attribution scan over the month's raw turns — the oracle
    recomputes exactly that and hash equality pins it, exact integer
    micros end to end. At 10^12 turns "how long in tool-use vs chatting
    this month" reads ≤31 daily structs per conversation, never raw."""
    import tempfile

    from .pipeline import TierPipeline

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    pipe = TierPipeline(
        spark, tempfile.mkdtemp(prefix="tier-sd-"),
        salted=True, statedur_cols=["role"], fill_tiers=False,
    )
    pipe.run(t0, stages=("hourly", "daily", "monthly"))
    m = pipe.read_tier("monthly")
    return m.select(
        "conv_id",
        "bucket_start",
        F.explode(F.col("statedur_role")["durs"]).alias("role", "micros"),
    )


@register(
    "tier_twa_monthly",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts, CAST(length(props) AS BIGINT) AS v,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
               AS turn_idx
      FROM events),
    d AS (
      SELECT conv_id,
             CAST(date_trunc('month', ts) AS TIMESTAMP) AS m,
             v, turn_idx, epoch_us(ts) AS u,
             epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dur
      FROM t0 WHERE v IS NOT NULL
      WINDOW w AS (PARTITION BY conv_id, date_trunc('month', ts)
                   ORDER BY ts, turn_idx))
    SELECT conv_id, m AS bucket_start,
           CAST(COALESCE(SUM(v * dur), 0) AS BIGINT) AS area,
           CAST(max(u) - min(u) AS BIGINT) AS span_us,
           CASE WHEN max(u) > min(u)
                THEN CAST(COALESCE(SUM(v * dur), 0) AS DOUBLE)
                     / CAST(max(u) - min(u) AS DOUBLE) END AS twa,
           CAST(last(v ORDER BY u, turn_idx)
                - first(v ORDER BY u, turn_idx) AS BIGINT) AS delta
    FROM d GROUP BY 1, 2
    """,
)
def tier_twa_monthly(spark, sf_dir):
    """M49 time-weighted-average tier state (engine/twa.py — the
    TimescaleDB time_weight('locf') / gauge_agg pair) through the REAL
    pipeline on the SALTED path: each hourly bucket stores (first_us,
    first_val, last_us, last_val, area) where area = Σ v_i·(t_{i+1}−t_i)
    is the LOCF integral; the merge fold adds each BOUNDARY gap weighted
    by the earlier bucket's last value, so the monthly integral composed
    from hourly equals a fresh lead()-attribution scan of raw — exact
    integer value·micros, one float division at serve time (the oracle
    runs the identical IEEE op order). At 10^12 turns the monthly TWA
    reads ≤31 daily structs per conversation, never raw."""
    import tempfile

    from .pipeline import TierPipeline
    from .twa import twa_serve_cols, twa_state_col

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    pipe = TierPipeline(
        spark, tempfile.mkdtemp(prefix="tier-twa-"),
        salted=True, twa_cols=["token_count"], fill_tiers=False,
    )
    pipe.run(t0, stages=("hourly", "daily", "monthly"))
    m = pipe.read_tier("monthly")
    st = F.col(twa_state_col("token_count"))
    serve = twa_serve_cols(st)
    return m.select(
        "conv_id",
        "bucket_start",
        st["area"].alias("area"),
        (st["last_us"] - st["first_us"]).alias("span_us"),
        serve["twa"].alias("twa"),
        serve["delta"].alias("delta"),
    )


from .qsketch import QSK_KEY_SQL, QSK_REP_SQL  # noqa: E402

_QSK_REP_OF_V = QSK_REP_SQL.format(k="(" + QSK_KEY_SQL.format(v="v") + ")")

@register(
    "tier_qsk_percentiles_monthly",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts, CAST(length(props) AS BIGINT) AS v
      FROM events),
    ranked AS (
      SELECT conv_id, CAST(date_trunc('month', ts) AS TIMESTAMP) AS m, v,
             row_number() OVER (PARTITION BY conv_id, date_trunc('month', ts)
                                ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY conv_id, date_trunc('month', ts)) AS n
      FROM t0 WHERE v IS NOT NULL),
    hits AS (
      SELECT conv_id, m, CAST(q AS DOUBLE) AS q, v
      FROM ranked CROSS JOIN (SELECT unnest([0.5, 0.95]) AS q) qs
      WHERE rn = CAST(floor(CAST(q AS DOUBLE) * CAST(n - 1 AS DOUBLE))
                      AS BIGINT) + 1)
    SELECT conv_id, m AS bucket_start, q,
           """ + _QSK_REP_OF_V + """ AS value
    FROM hits
    """,
)
def tier_qsk_percentiles_monthly(spark, sf_dir):
    """M50 integer log-bucket quantile sketch (engine/qsketch.py — the
    DDSketch idea on exact integer bucket math): monthly `{col}_qsk`
    maps composed hourly→daily→monthly by key-union addition serve
    p50/p95 as the bucket representative of the month's true rank-target
    element. The whole answer — an APPROXIMATE quantile with a hard
    ≤1/32 relative-error bound — is a deterministic pure function of the
    raw multiset, so the oracle (which looks up the true rank-target
    value and applies the same key→rep mapping, bit-identical in DuckDB)
    gates it at FULL HASH. At 10^12 turns a monthly p95 reads ≤31
    bounded maps per conversation, never raw."""
    from .qsketch import qsk_percentiles, qsk_state_col

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0, qsk_cols=["token_count"])
    return qsk_percentiles(
        tiers["monthly"],
        ["conv_id", "bucket_start"],
        qsk_state_col("token_count"),
        [0.5, 0.95],
    )


@register(
    "tier_rewrite_range_twa",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts, CAST(length(props) AS BIGINT) AS v,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
               AS turn_idx
      FROM events),
    d AS (
      SELECT conv_id, v, turn_idx, epoch_us(ts) AS u,
             epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dur
      FROM t0
      WHERE v IS NOT NULL
        AND ts >= TIMESTAMP '2024-01-03 07:00:00'
        AND ts <  TIMESTAMP '2024-01-28 19:00:00'
      WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx))
    SELECT conv_id,
           CAST(COALESCE(SUM(v * dur), 0) AS BIGINT) AS area,
           CAST(max(u) - min(u) AS BIGINT) AS span_us,
           CASE WHEN max(u) > min(u)
                THEN CAST(COALESCE(SUM(v * dur), 0) AS DOUBLE)
                     / CAST(max(u) - min(u) AS DOUBLE) END AS twa,
           CAST(last(v ORDER BY u, turn_idx)
                - first(v ORDER BY u, turn_idx) AS BIGINT) AS delta,
           CASE WHEN max(u) > min(u)
                THEN CAST(last(v ORDER BY u, turn_idx)
                          - first(v ORDER BY u, turn_idx) AS DOUBLE)
                     * 1000000.0 / CAST(max(u) - min(u) AS DOUBLE)
           END AS rate_per_s
    FROM d GROUP BY 1
    """,
)
def tier_rewrite_range_twa(spark, sf_dir):
    """§4.3 × M49: the time-weighted average over an arbitrary
    hour-aligned range served from span-matched tier structs (leading
    hours → whole days → trailing hours), folded by the LOCF ordered
    monoid — exact integer area vs the oracle's raw-range lead()
    integral, float twa/rate by the identical single division.
    O(tier rows in range) per conversation, never O(raw)."""
    from datetime import datetime

    from .rewrite import rewrite_range_twa

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0, twa_cols=["token_count"])
    return rewrite_range_twa(
        tiers, datetime(2024, 1, 3, 7), datetime(2024, 1, 28, 19),
        "token_count",
    )


@register(
    "tier_interp_twa_daily",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts, CAST(length(props) AS BIGINT) AS v,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
               AS turn_idx
      FROM events),
    obs AS (
      SELECT conv_id, epoch_us(ts) AS u, v, turn_idx
      FROM t0 WHERE v IS NOT NULL),
    seg AS (
      SELECT conv_id, v, u AS s,
             lead(u) OVER (PARTITION BY conv_id ORDER BY u, turn_idx) AS e
      FROM obs),
    bounds AS (SELECT conv_id, min(u) AS lo, max(u) AS hi FROM obs GROUP BY 1),
    days AS (
      SELECT conv_id, (u // 86400000000) * 86400000000 AS d,
             min(u) AS fu, max(u) AS lu
      FROM obs GROUP BY 1, 2),
    integ AS (
      SELECT days.conv_id, days.d,
             CAST(COALESCE(SUM(seg.v * (LEAST(seg.e, days.d + 86400000000)
                                        - GREATEST(seg.s, days.d))), 0)
                  AS BIGINT) AS integral
      FROM days LEFT JOIN seg
        ON seg.conv_id = days.conv_id
       AND seg.e > days.d AND seg.s < days.d + 86400000000
      GROUP BY 1, 2)
    SELECT i.conv_id, make_timestamp(i.d) AS bucket_start, i.integral,
           CAST((CASE WHEN b.hi >= i.d + 86400000000
                      THEN i.d + 86400000000 ELSE dy.lu END)
                - (CASE WHEN b.lo < i.d THEN i.d ELSE dy.fu END)
                AS BIGINT) AS covered_us,
           CASE WHEN (CASE WHEN b.hi >= i.d + 86400000000
                           THEN i.d + 86400000000 ELSE dy.lu END)
                     - (CASE WHEN b.lo < i.d THEN i.d ELSE dy.fu END) > 0
                THEN CAST(i.integral AS DOUBLE)
                     / CAST((CASE WHEN b.hi >= i.d + 86400000000
                                  THEN i.d + 86400000000 ELSE dy.lu END)
                            - (CASE WHEN b.lo < i.d THEN i.d ELSE dy.fu END)
                            AS DOUBLE)
           END AS itwa
    FROM integ i
    JOIN bounds b ON b.conv_id = i.conv_id
    JOIN days dy ON dy.conv_id = i.conv_id AND dy.d = i.d
    """,
)
def tier_interp_twa_daily(spark, sf_dir):
    """M51 interpolated bucket serving (engine/interp_serve.py — the
    TimescaleDB toolkit interpolated_average): per-day time-weighted
    average covering the FULL day window via cross-bucket boundary carry
    (previous observed bucket's last value over [day, first_obs), own
    last value extended to day end when a later observation exists),
    computed from M49 tier structs with one lag()/lead() over tier rows.
    The oracle recomputes the LOCF step function's clipped
    segment-overlap integral over raw — hash equality proves the
    tier-struct decomposition (carry-in + own area + carry-out) IS the
    clipped integral, exact integer micros, float by one division. At
    10^12 turns an interpolated daily dashboard reads O(days) structs,
    never raw."""
    from .interp_serve import interpolated_twa

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0, twa_cols=["token_count"])
    return interpolated_twa(tiers["daily"], "daily", "token_count")


@register(
    "tier_interp_statedur_hourly",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts, event_type AS role,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
               AS turn_idx
      FROM events),
    seg AS (
      SELECT conv_id, coalesce(role, '<null>') AS st, epoch_us(ts) AS s,
             lead(epoch_us(ts)) OVER (PARTITION BY conv_id
                                      ORDER BY ts, turn_idx) AS e
      FROM t0),
    hrs AS (
      SELECT DISTINCT conv_id,
             (epoch_us(ts) // 3600000000) * 3600000000 AS h
      FROM t0)
    SELECT hrs.conv_id, make_timestamp(hrs.h) AS bucket_start, seg.st AS state,
           CAST(SUM(LEAST(seg.e, hrs.h + 3600000000)
                    - GREATEST(seg.s, hrs.h)) AS BIGINT) AS micros
    FROM hrs JOIN seg
      ON seg.conv_id = hrs.conv_id
     AND seg.s < hrs.h + 3600000000
     AND (seg.e > hrs.h OR (seg.s = seg.e AND seg.s >= hrs.h))
    GROUP BY 1, 2, 3
    """,
)
def tier_interp_statedur_hourly(spark, sf_dir):
    """M51 × M48: per-hour interpolated time-in-state — each hour's durs
    map plus the carry-in interval (previous observed bucket's last_state
    over [hour, first_obs)) and the carry-out (own last_state to hour end
    when a later observation exists). The oracle clips every raw
    lead()-segment against every observed hour window; equality proves
    the tier-struct carry decomposition covers each bucket window exactly
    once (zero-length segments attributed by left edge, the leaf's
    convention). Exact integer micros, O(tier rows) serving."""
    from .interp_serve import interpolated_statedur

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0, statedur_cols=["role"])
    return interpolated_statedur(tiers["hourly"], "hourly", "role")


@register(
    "tier_topn_tokens_monthly",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts, CAST(length(props) AS BIGINT) AS v,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
               AS turn_idx
      FROM events),
    ranked AS (
      SELECT conv_id, CAST(date_trunc('month', ts) AS TIMESTAMP) AS m,
             v, ts, turn_idx,
             row_number() OVER (PARTITION BY conv_id, date_trunc('month', ts)
                                ORDER BY v DESC, ts, turn_idx) AS rn
      FROM t0 WHERE v IS NOT NULL)
    SELECT conv_id, m AS bucket_start, CAST(rn AS BIGINT) AS rank,
           v AS value, ts, CAST(turn_idx AS BIGINT) AS turn_idx
    FROM ranked WHERE rn <= 3
    """,
)
def tier_topn_tokens_monthly(spark, sf_dir):
    """M52 exact top-N value tier state (engine/topn.py — TimescaleDB
    max_n_by) through the REAL pipeline on the SALTED path: each hourly
    bucket keeps its 3 largest token counts WITH their timestamps as a
    totally-ordered struct array; the flatten-sort-truncate merge is
    bit-exact (the union's n extremes are a pure function of each part's
    n extremes — the KMV argument order-reversed), so the monthly
    top-3-with-timestamps equals a fresh ranking of raw, full hash. At
    10^12 turns 'the three longest turns this month and when they
    happened' reads ≤31 daily arrays per conversation, never raw."""
    import tempfile

    from .pipeline import TierPipeline
    from .topn import topn_explode, topn_state_col

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    pipe = TierPipeline(
        spark, tempfile.mkdtemp(prefix="tier-topn-"),
        salted=True, topn_cols={"token_count": 3}, fill_tiers=False,
    )
    pipe.run(t0, stages=("hourly", "daily", "monthly"))
    m = pipe.read_tier("monthly").select(
        "conv_id", "bucket_start", topn_state_col("token_count", 3, "top")
    )
    e = topn_explode(m, topn_state_col("token_count", 3, "top"))
    return e.select(
        "conv_id",
        "bucket_start",
        F.col("rank").cast("long").alias("rank"),
        "value",
        "ts",
        F.col("turn_idx").cast("long").alias("turn_idx"),
    )


@register(
    "cagg_twa_weekly",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts, CAST(length(props) AS BIGINT) AS v,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
               AS turn_idx
      FROM events),
    d AS (
      SELECT conv_id,
             CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
             v, turn_idx, epoch_us(ts) AS u,
             epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dur
      FROM t0 WHERE v IS NOT NULL
      WINDOW w AS (PARTITION BY conv_id, date_trunc('week', ts)
                   ORDER BY ts, turn_idx))
    SELECT week, conv_id,
           CASE WHEN max(u) > min(u)
                THEN CAST(COALESCE(SUM(v * dur), 0) AS DOUBLE)
                     / CAST(max(u) - min(u) AS DOUBLE) END AS twa_tokens,
           CAST(COUNT(*) AS BIGINT) AS turns
    FROM d GROUP BY 1, 2
    """,
)
def cagg_twa_weekly(spark, sf_dir):
    """'twa' in the continuous-aggregate algebra (engine/cagg.py ×
    engine/twa.py) under the hash gate: a (week, conv) view whose day
    partials carry the LOCF-integral monoid struct, built INCREMENTALLY
    across two ingest batches — the ordered fold across day partials must
    reproduce a raw week-span lead() integral exactly (the group key
    includes the series key, keeping grouped spans time-disjoint, which
    is the twa kind's contract)."""
    import tempfile

    from .cagg import ContinuousAggregate
    from .pipeline import TierPipeline

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    pipe = TierPipeline(
        spark, tempfile.mkdtemp(prefix="tier-caggtwa-"),
        snapshots=True, fill_tiers=False, twa_cols=["token_count"],
    )
    pipe.run(
        t0.filter("substr(conv_id, length(conv_id), 1) < '5'"),
        stages=("hourly",),
    )
    cagg = ContinuousAggregate(
        pipe, tempfile.mkdtemp(prefix="caggtwa-view-"),
        keys={"week": "date_trunc('week', bucket_start)",
              "conv_id": "conv_id"},
        aggs={
            "twa_tokens": ("twa", "twa_token_count"),
            "turns": ("sum", "n_turns"),
        },
    )
    cagg.refresh()
    pipe.run(t0, stages=("hourly",))
    cagg.refresh()
    return cagg.read()


@register(
    "cagg_qsk_p90_weekly",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts, CAST(length(props) AS BIGINT) AS v
      FROM events),
    ranked AS (
      SELECT conv_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week, v,
             row_number() OVER (PARTITION BY conv_id, date_trunc('week', ts)
                                ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY conv_id, date_trunc('week', ts)) AS n
      FROM t0 WHERE v IS NOT NULL)
    SELECT week, conv_id,
           """ + _QSK_REP_OF_V + """ AS p90_tokens,
           CAST(n AS BIGINT) AS turns
    FROM ranked
    WHERE rn = CAST(floor(CAST(0.9 AS DOUBLE) * CAST(n - 1 AS DOUBLE))
                    AS BIGINT) + 1
    """,
)
def cagg_qsk_p90_weekly(spark, sf_dir):
    """'percentile_qsk' in the continuous-aggregate algebra (engine/
    cagg.py × engine/qsketch.py) under the hash gate: a (week, conv)
    view whose day partials carry the log-bucket sketch map, key-union-
    added across days and finalized to the p90 bucket representative by
    a pure column fold (no explode/window) — two-batch incremental build
    must equal the oracle's one-pass rank lookup exactly. A mergeable,
    incrementally-maintained percentile materialized view: the thing
    percentile_approx state cannot give you."""
    import tempfile

    from .cagg import ContinuousAggregate
    from .pipeline import TierPipeline

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    pipe = TierPipeline(
        spark, tempfile.mkdtemp(prefix="tier-caggqsk-"),
        snapshots=True, fill_tiers=False, qsk_cols=["token_count"],
    )
    pipe.run(
        t0.filter("substr(conv_id, length(conv_id), 1) < '5'"),
        stages=("hourly",),
    )
    cagg = ContinuousAggregate(
        pipe, tempfile.mkdtemp(prefix="caggqsk-view-"),
        keys={"week": "date_trunc('week', bucket_start)",
              "conv_id": "conv_id"},
        aggs={
            "p90_tokens": ("percentile_qsk", "token_count_qsk", 0.9),
            "turns": ("sum", "n_turns"),
        },
    )
    cagg.refresh()
    pipe.run(t0, stages=("hourly",))
    cagg.refresh()
    return cagg.read()


@register(
    "cagg_hier_monthly_cohort",
    _TIER_CTE + """
    SELECT CAST(date_trunc('month', date_trunc('week', bucket_start))
                AS TIMESTAMP) AS month,
           substr(conv_id, length(conv_id), 1) AS cohort,
           CAST(SUM(n_turns) AS BIGINT) AS turns,
           COUNT(*) AS hours,
           MIN(token_min) AS min_tok,
           MAX(n_turns) AS peak_turns,
           CAST(SUM(n_turns) AS DOUBLE) / CAST(COUNT(n_turns) AS DOUBLE)
             AS avg_turns,
           CAST(MIN(bucket_start) AS TIMESTAMP) AS first_bucket,
           (MAX({'o': bucket_start, 'v': token_max})).v AS closing_max,
           CAST(COUNT(DISTINCT bucket_start) AS DOUBLE) AS ubuckets
    FROM hourly
    GROUP BY 1, 2
    """,
)
def cagg_hier_monthly_cohort(spark, sf_dir):
    """Hierarchical continuous aggregate (engine/cagg.py
    HierarchicalAggregate) under the hash gate: a versioned (week, cohort)
    parent view feeds a (month, cohort) CHILD view that re-merges the
    parent's day-partial STATE — the hourly tier is never re-read — and
    both levels are built INCREMENTALLY across two ingest batches, each
    consuming only its upstream's snapshot changelog. Child-of-parent must
    equal the oracle's one-pass GROUP BY on the full input for every exact
    kind (sum/count/min/max/avg/first/last) AND for distinct_kmv, whose
    bottom-k union-truncate state stays an EXACT distinct count below k
    (k=2048 > the ≤840 hourly buckets a week-aligned month can span)."""
    import tempfile

    from .cagg import ContinuousAggregate
    from .pipeline import TierPipeline

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    pipe = TierPipeline(
        spark, tempfile.mkdtemp(prefix="tier-cagghier-"),
        snapshots=True, fill_tiers=False,
    )
    pipe.run(
        t0.filter("substr(conv_id, length(conv_id), 1) < '5'"),
        stages=("hourly",),
    )
    parent = ContinuousAggregate(
        pipe, tempfile.mkdtemp(prefix="cagg-parent-"),
        keys={"week": "date_trunc('week', bucket_start)",
              "cohort": "substr(conv_id, length(conv_id), 1)"},
        aggs={
            "turns": ("sum", "n_turns"),
            "hours": ("count",),
            "min_tok": ("min", "token_min"),
            "peak": ("max", "n_turns"),
            "avg_turns": ("avg", "n_turns"),
            "first_bucket": ("first", "bucket_start", "bucket_start"),
            "last_max": ("last", "token_max", "bucket_start"),
            "ubuckets": ("distinct_kmv", "bucket_start", 2048),
        },
        versioned=True,
    )
    child = parent.child(
        tempfile.mkdtemp(prefix="cagg-child-"),
        keys={"month": "date_trunc('month', week)", "cohort": "cohort"},
        aggs={
            "turns": "turns",
            "hours": "hours",
            "min_tok": "min_tok",
            "peak_turns": "peak",
            "avg_turns": "avg_turns",
            "first_bucket": "first_bucket",
            "closing_max": "last_max",
            "ubuckets": "ubuckets",
        },
    )
    parent.refresh()
    child.refresh()
    pipe.run(t0, stages=("hourly",))
    parent.refresh()
    child.refresh()
    return child.read()


@register("cagg_realtime_weekly", _TIER_CTE + _CAGG_SQL)
def cagg_realtime_weekly(spark, sf_dir):
    """Real-time continuous-aggregate serving (engine/cagg.py
    read_realtime) under the hash gate: the view refreshes on HALF the
    conversations, then the rest arrive and the query serves WITHOUT a
    second refresh — stored day partials for consumed days union freshly-
    computed partials for the changelog's unconsumed days, merged at read
    time. Must equal the oracle's one-pass GROUP BY on the full input:
    the materialization lag is invisible to readers (TimescaleDB
    real-time aggregates), and nothing is written — the consumed pointer
    stays at the first snapshot."""
    import tempfile

    from .cagg import ContinuousAggregate
    from .pipeline import TierPipeline

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    pipe = TierPipeline(
        spark, tempfile.mkdtemp(prefix="tier-caggrt-"),
        snapshots=True, fill_tiers=False,
    )
    pipe.run(
        t0.filter("substr(conv_id, length(conv_id), 1) < '5'"),
        stages=("hourly",),
    )
    cagg = ContinuousAggregate(
        pipe, tempfile.mkdtemp(prefix="caggrt-view-"),
        keys={"week": "date_trunc('week', bucket_start)",
              "cohort": "substr(conv_id, length(conv_id), 1)"},
        aggs={
            "turns": ("sum", "n_turns"),
            "hours": ("count",),
            "min_tok": ("min", "token_min"),
            "peak": ("max", "n_turns"),
            "avg_turns": ("avg", "n_turns"),
            "first_bucket": ("first", "bucket_start", "bucket_start"),
            "last_max": ("last", "token_max", "bucket_start"),
        },
    )
    cagg.refresh()
    pipe.run(t0, stages=("hourly",))
    return cagg.read_realtime()


@register(
    "cagg_sql_ddl_weekly",
    _TIER_CTE + _CAGG_SQL.replace(
        "FROM hourly",
        "FROM hourly WHERE substr(conv_id, length(conv_id), 1) >= '2'",
    ),
)
def cagg_sql_ddl_weekly(spark, sf_dir):
    """SQL DDL surface for continuous aggregates (engine/caggsql.py)
    under the hash gate: the SAME (week, cohort) view as
    cagg_weekly_cohort but DECLARED as SQL text — CREATE CONTINUOUS
    AGGREGATE ... AS SELECT ... WHERE ... GROUP BY — compiled to the
    mergeable-aggregate spec, built incrementally in two refreshes, and
    served. The WHERE clause becomes the view filter, the grouped items
    become keys, and every aggregate call maps onto the algebra; the
    oracle applies the identical predicate in one pass. Proves the SQL
    front door drives the exact machinery, not a parallel path."""
    import tempfile

    from .caggsql import create_continuous_aggregate
    from .pipeline import TierPipeline

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    pipe = TierPipeline(
        spark, tempfile.mkdtemp(prefix="tier-caggsql-"),
        snapshots=True, fill_tiers=False,
    )
    pipe.run(
        t0.filter("substr(conv_id, length(conv_id), 1) < '5'"),
        stages=("hourly",),
    )
    view = create_continuous_aggregate(
        pipe, tempfile.mkdtemp(prefix="caggsql-view-"),
        """
        CREATE CONTINUOUS AGGREGATE weekly_cohorts AS
        SELECT date_trunc('week', bucket_start) AS week,
               substr(conv_id, length(conv_id), 1) AS cohort,
               sum(n_turns) AS turns,
               count(*) AS hours,
               min(token_min) AS min_tok,
               max(n_turns) AS peak,
               avg(n_turns) AS avg_turns,
               first(bucket_start, bucket_start) AS first_bucket,
               last(token_max, bucket_start) AS last_max
        FROM hourly
        WHERE substr(conv_id, length(conv_id), 1) >= '2'
        GROUP BY week, cohort
        """,
    )
    view.refresh()
    pipe.run(t0, stages=("hourly",))
    view.refresh()
    return view.read()


@register(
    "tier_sliding_24h",
    _TIER_CTE
    + """
    SELECT conv_id,
           CAST(bucket_start AS TIMESTAMP) AS bucket_start,
           CAST(SUM(n_turns) OVER w AS BIGINT) AS w_n_turns,
           CAST(SUM(token_sum) OVER w AS BIGINT) AS w_token_sum,
           CAST(MIN(token_min) OVER w AS BIGINT) AS w_token_min,
           CAST(MAX(token_max) OVER w AS BIGINT) AS w_token_max,
           CAST(SUM(tool_sum) OVER w AS BIGINT) AS w_tool_sum,
           CAST(SUM(token_sum) OVER w AS DOUBLE)
             / CAST(SUM(n_turns) OVER w AS DOUBLE) AS w_token_mean
    FROM hourly
    WINDOW w AS (PARTITION BY conv_id
                 ORDER BY epoch_us(bucket_start) // 3600000000
                 RANGE BETWEEN 23 PRECEDING AND CURRENT ROW)
    """,
)
def tier_sliding_24h(spark, sf_dir):
    """M63 sliding tier-state windows (engine/sliding.py sliding_state):
    the trailing-24h rollup AT EVERY observed hourly bucket, composed
    from hourly tier STATE with a RANGE frame on the integer epoch-hour
    index — TimescaleDB's moving-aggregate-over-a-cagg / PromQL
    sum_over_time(x[24h]). RANGE (not ROWS) is the semantics: missing
    hours contribute nothing instead of stretching the frame across
    gaps, so each output row equals re-aggregating raw over
    (bucket-24h, bucket] — which is exactly what the oracle's identical
    window over its own hourly CTE proves. Integer state merges + one
    final division keep the hash exact. At 10^12 turns: one exchange
    over O(tier) rows, never raw."""
    from .sliding import sliding_state

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0)
    s = sliding_state(tiers["hourly"], 24)
    return s.select(
        "conv_id",
        "bucket_start",
        "w_n_turns",
        "w_token_sum",
        "w_token_min",
        "w_token_max",
        "w_tool_sum",
        (
            F.col("w_token_sum").cast("double")
            / F.col("w_n_turns").cast("double")
        ).alias("w_token_mean"),
    )


@register(
    "tier_trend_predict",
    _TIER_CTE
    + """
    , pts AS (
      SELECT conv_id,
             epoch_us(bucket_start) // 3600000000 - 473352 AS t,
             n_turns AS v
      FROM hourly),
    stats AS (
      SELECT conv_id, COUNT(*) AS n,
             CAST(SUM(t) AS BIGINT) AS st,
             CAST(SUM(v) AS BIGINT) AS sv,
             CAST(SUM(t * v) AS BIGINT) AS stv,
             CAST(SUM(t * t) AS BIGINT) AS stt
      FROM pts GROUP BY 1),
    sl AS (
      SELECT *, CAST(n * stv - st * sv AS DOUBLE)
                  / CAST(n * stt - st * st AS DOUBLE) AS slope
      FROM stats WHERE n >= 2),
    ic AS (
      SELECT *, (CAST(sv AS DOUBLE) - slope * CAST(st AS DOUBLE))
                  / CAST(n AS DOUBLE) AS intercept
      FROM sl)
    SELECT conv_id, n, slope, intercept,
           intercept + slope * 743.0 AS predicted
    FROM ic
    """,
)
def tier_trend_predict(spark, sf_dir):
    """M64 linear trend / predict_linear from the tier (engine/sliding.py
    trend_linear): per-conversation least-squares fit of hourly turn
    counts over January, forecast 24h past the range end — PromQL
    predict_linear served from O(tier) rows. Sufficient statistics
    (n, Σt, Σv, Σtv, Σt²) are EXACT longs (t = hour offset from the
    range start, so products stay small); slope/intercept/forecast are
    each one closed-form float expression over them, written with the
    identical tree in the oracle — an ordinary-least-squares query under
    the full-hash gate. Observed buckets only (absent samples don't
    exist; they are not zeros)."""
    from datetime import datetime

    from .sliding import trend_linear

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0)
    return trend_linear(
        tiers["hourly"],
        datetime(2024, 1, 1),
        datetime(2024, 1, 31),
        horizon_hours=24,
    )


@register(
    "sax_day_shape_motifs",
    _TIER_CTE
    + """
    , prof AS (
      SELECT conv_id,
             CAST(date_trunc('day', bucket_start) AS TIMESTAMP) AS day,
             CAST(SUM(CASE WHEN hour(bucket_start) // 6 = 0
                           THEN n_turns ELSE 0 END) AS BIGINT) AS s0,
             CAST(SUM(CASE WHEN hour(bucket_start) // 6 = 1
                           THEN n_turns ELSE 0 END) AS BIGINT) AS s1,
             CAST(SUM(CASE WHEN hour(bucket_start) // 6 = 2
                           THEN n_turns ELSE 0 END) AS BIGINT) AS s2,
             CAST(SUM(CASE WHEN hour(bucket_start) // 6 = 3
                           THEN n_turns ELSE 0 END) AS BIGINT) AS s3
      FROM hourly GROUP BY 1, 2),
    words AS (
      SELECT conv_id, day, s0 + s1 + s2 + s3 AS day_turns,
             concat(
               CAST((CASE WHEN s1 < s0 THEN 1 ELSE 0 END)
                  + (CASE WHEN s2 < s0 THEN 1 ELSE 0 END)
                  + (CASE WHEN s3 < s0 THEN 1 ELSE 0 END) AS VARCHAR),
               CAST((CASE WHEN s0 < s1 OR s0 = s1 THEN 1 ELSE 0 END)
                  + (CASE WHEN s2 < s1 THEN 1 ELSE 0 END)
                  + (CASE WHEN s3 < s1 THEN 1 ELSE 0 END) AS VARCHAR),
               CAST((CASE WHEN s0 < s2 OR s0 = s2 THEN 1 ELSE 0 END)
                  + (CASE WHEN s1 < s2 OR s1 = s2 THEN 1 ELSE 0 END)
                  + (CASE WHEN s3 < s2 THEN 1 ELSE 0 END) AS VARCHAR),
               CAST((CASE WHEN s0 < s3 OR s0 = s3 THEN 1 ELSE 0 END)
                  + (CASE WHEN s1 < s3 OR s1 = s3 THEN 1 ELSE 0 END)
                  + (CASE WHEN s2 < s3 OR s2 = s3 THEN 1 ELSE 0 END)
                    AS VARCHAR)) AS word
      FROM prof)
    SELECT word, COUNT(*) AS n_days,
           COUNT(DISTINCT conv_id) AS n_convs,
           CAST(SUM(day_turns) AS BIGINT) AS turns
    FROM words GROUP BY 1
    """,
)
def sax_day_shape_motifs(spark, sf_dir):
    """M65 PAA + rank-SAX symbolic day shapes (engine/ts_analytics.py
    day_shape_sax): each (conversation, day) collapses to 4 six-hour PAA
    segment sums over the HOURLY TIER, symbolized by each segment's rank
    within its own day (ties broken by time position — always a
    permutation, scale-invariant like z-normalized SAX but pure integer
    comparisons). The word is the day's shape fingerprint; grouping by
    it is motif discovery — which intra-day activity orderings recur,
    across how many conversations — with NO pairwise comparison, the
    equi-join shape that scales to 10^9 series. The oracle rebuilds the
    ranks as closed-form CASE sums over the same segment pivot."""
    from .ts_analytics import day_shape_sax

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0)
    w = day_shape_sax(tiers["hourly"], segments=4)
    return w.groupBy("word").agg(
        F.count("*").alias("n_days"),
        F.countDistinct("conv_id").alias("n_convs"),
        F.sum(
            F.col("s0") + F.col("s1") + F.col("s2") + F.col("s3")
        ).alias("turns"),
    )


@register(
    "tier_sliding_p95_24h",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts,
             CAST(length(props) AS BIGINT) AS token_count
      FROM events),
    obs AS (
      SELECT DISTINCT conv_id,
             CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_start,
             epoch_us(date_trunc('hour', ts)) // 3600000000 AS hidx
      FROM t0),
    bins AS (SELECT range AS bin FROM range(16)),
    counts AS (
      SELECT conv_id,
             epoch_us(date_trunc('hour', ts)) // 3600000000 AS hidx,
             CAST(LEAST(GREATEST(FLOOR(token_count / 1.0), 0), 15) AS BIGINT)
               AS bin,
             COUNT(*) AS cnt
      FROM t0 GROUP BY 1, 2, 3),
    dense AS (
      SELECT o.conv_id, o.bucket_start, o.hidx, b.bin,
             CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
      FROM obs o CROSS JOIN bins b
      LEFT JOIN counts c
        ON c.conv_id = o.conv_id AND c.hidx = o.hidx AND c.bin = b.bin),
    w AS (
      SELECT conv_id, bucket_start, hidx, bin,
             SUM(cnt) OVER (PARTITION BY conv_id, bin ORDER BY hidx
                            RANGE BETWEEN 23 PRECEDING AND CURRENT ROW)
               AS wcnt
      FROM dense),
    cum AS (
      SELECT conv_id, bucket_start, bin, wcnt,
             SUM(wcnt) OVER (PARTITION BY conv_id, bucket_start
                             ORDER BY bin) AS cum,
             SUM(wcnt) OVER (PARTITION BY conv_id, bucket_start) AS total
      FROM w)
    SELECT conv_id, bucket_start,
           CAST(MAX(total) AS BIGINT) AS w_n,
           CAST(MIN(CASE WHEN cum * 100 >= total * 50 THEN bin END)
                AS BIGINT) AS p50_bin,
           CAST(MIN(CASE WHEN cum * 100 >= total * 95 THEN bin END)
                AS BIGINT) AS p95_bin
    FROM cum GROUP BY 1, 2
    """,
)
def tier_sliding_p95_24h(spark, sf_dir):
    """M83 sliding percentiles from histogram tier state
    (engine/sliding.py sliding_hist_percentile): the trailing-24h
    p50/p95 token-count bins at every observed hourly bucket — the "p95
    over the last day" dashboard series — composed from the mergeable
    hist arrays with the gap-correct RANGE-frame fold and the integer
    rank rule (cum·100 ≥ total·p). The oracle rebuilds the window over a
    densified (hour × bin) grid from raw; every count and bin choice
    sits under the full-hash gate. One exchange over O(tier) rows; raw
    never read."""
    from .sliding import sliding_hist_percentile

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0, hist_cols={"token_count": (0.0, 1.0, 16)})
    return sliding_hist_percentile(
        tiers["hourly"], "token_count_hist", 16, 24
    ).orderBy("conv_id", "bucket_start")


@register(
    "theil_sen_trend_hourly",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts FROM events),
    hourly AS (
      SELECT conv_id,
             epoch_us(date_trunc('hour', ts)) // 3600000000 - 473352 AS t,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM t0
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-15'
      GROUP BY 1, 2),
    nobs AS (SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_obs
             FROM hourly GROUP BY 1),
    pairs AS (
      SELECT a.conv_id, (b.v - a.v) / (b.t - a.t) AS s
      FROM hourly a JOIN hourly b
        ON a.conv_id = b.conv_id AND b.t > a.t),
    sl AS (
      SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             quantile_disc(s, 0.5) AS slope
      FROM pairs GROUP BY 1),
    res AS (
      SELECT h.conv_id, s.slope, s.n_pairs,
             CAST(h.v AS DOUBLE) - s.slope * h.t AS r
      FROM hourly h JOIN sl s USING (conv_id)),
    fin AS (
      SELECT conv_id, ANY_VALUE(slope) AS slope, ANY_VALUE(n_pairs) AS n_pairs,
             quantile_disc(r, 0.5) AS intercept
      FROM res GROUP BY 1)
    SELECT f.conv_id, n.n_obs, f.n_pairs, f.slope, f.intercept,
           f.intercept + f.slope * 336.0 AS predicted
    FROM fin f JOIN nobs n USING (conv_id)
    WHERE n.n_obs >= 2
    ORDER BY f.conv_id
    """,
)
def theil_sen_trend_hourly(spark, sf_dir):
    """M84 Theil-Sen robust trend from the hourly tier over a two-week
    range: slope is the LOWER median of all pairwise slopes (a pure
    order-statistic selection — no interpolation arithmetic — which is
    what lets DuckDB's quantile_disc(0.5) reproduce every float
    bit-for-bit against numpy's partition selection), intercept the
    lower median of residuals, forecast at the range end. The O(hours²)
    pair set is bounded by the RANGE (≤43 observed hours/series here),
    never by corpus size."""
    from datetime import datetime

    from .sliding import theil_sen_trend

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0)
    return theil_sen_trend(
        tiers["hourly"], datetime(2024, 1, 1), datetime(2024, 1, 15)
    ).orderBy("conv_id")


@register(
    "tier_sliding_distinct_24h",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             epoch_us(date_trunc('hour', ts)) // 3600000000 AS hidx,
             CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_start,
             props AS text
      FROM events),
    obs AS (SELECT DISTINCT conv_id, hidx, bucket_start FROM t0)
    SELECT o.conv_id, o.bucket_start,
           FALSE AS saturated,
           CAST(COUNT(DISTINCT v.text) AS BIGINT) AS w_distinct,
           CAST(COUNT(DISTINCT v.text) AS DOUBLE) AS w_distinct_est
    FROM obs o JOIN t0 v
      ON v.conv_id = o.conv_id AND v.hidx BETWEEN o.hidx - 23 AND o.hidx
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def tier_sliding_distinct_24h(spark, sf_dir):
    """M85 sliding distinct from KMV tier state (engine/sliding.py
    sliding_kmv_distinct): trailing-24h distinct texts per conversation
    at every observed hourly bucket. The per-bucket text_kmv256 sketches
    fold over the gap-correct RANGE frame; every window here holds far
    fewer than 256 distinct texts, so the sketch is the full hash set
    and the count is EXACT — the oracle recomputes each window's
    COUNT(DISTINCT) from raw and the full-hash gate pins it (saturated
    stays false, the estimate equals the exact size)."""
    from .sliding import sliding_kmv_distinct

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0, kmv_cols={"text": 256})
    return sliding_kmv_distinct(tiers["hourly"], "text_kmv256", 24).select(
        "conv_id", "bucket_start", "saturated", "w_distinct", "w_distinct_est"
    ).orderBy("conv_id", "bucket_start")


@register(
    "tier_sliding_hh_24h",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             epoch_us(date_trunc('hour', ts)) // 3600000000 AS hidx,
             CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_start,
             event_type AS role
      FROM events),
    obs AS (SELECT DISTINCT conv_id, hidx, bucket_start FROM t0),
    win AS (
      SELECT o.conv_id, o.bucket_start, v.role AS value,
             CAST(COUNT(*) AS BIGINT) AS est
      FROM obs o JOIN t0 v
        ON v.conv_id = o.conv_id AND v.hidx BETWEEN o.hidx - 23 AND o.hidx
      GROUP BY 1, 2, 3)
    SELECT conv_id, bucket_start, value, est,
           CAST(SUM(est) OVER (PARTITION BY conv_id, bucket_start) AS BIGINT)
             AS w_total
    FROM win ORDER BY conv_id, bucket_start, value
    """,
)
def tier_sliding_hh_24h(spark, sf_dir):
    """M86 sliding heavy hitters from Misra-Gries tier state
    (engine/sliding.py sliding_hh): trailing-24h role counts per
    conversation at every observed hourly bucket — the "trending
    categories right now" series. Role cardinality sits far under
    cap=32, so no MG truncation fires anywhere and the folded window
    maps are exact — the oracle recomputes every window's counts from
    raw under the full-hash gate; the truncating regime is pinned by the
    property tests."""
    from .sliding import sliding_hh

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0, hh_cols={"role": 32})
    s = sliding_hh(tiers["hourly"], "role", 32, 24)
    return (
        s.select(
            "conv_id",
            "bucket_start",
            F.explode("w_hh").alias("value", "est"),
            "w_total",
        )
        .orderBy("conv_id", "bucket_start", "value")
    )


@register(
    "tier_sliding_corr_24h",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts, CAST(length(props) AS BIGINT) AS token_count
      FROM events),
    hourly AS (
      SELECT conv_id,
             CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_start,
             epoch_us(date_trunc('hour', ts)) // 3600000000 AS hidx,
             CAST(COUNT(*) AS BIGINT) AS a,
             CAST(SUM(token_count) AS BIGINT) AS b
      FROM t0 GROUP BY 1, 2, 3),
    s AS (
      SELECT conv_id, bucket_start,
             CAST(COUNT(*) OVER w AS BIGINT) AS w_n,
             CAST(SUM(a) OVER w AS BIGINT) AS sa,
             CAST(SUM(b) OVER w AS BIGINT) AS sb,
             CAST(SUM(a * b) OVER w AS BIGINT) AS sab,
             CAST(SUM(a * a) OVER w AS BIGINT) AS saa,
             CAST(SUM(b * b) OVER w AS BIGINT) AS sbb
      FROM hourly
      WINDOW w AS (PARTITION BY conv_id ORDER BY hidx
                   RANGE BETWEEN 23 PRECEDING AND CURRENT ROW))
    SELECT conv_id, bucket_start, w_n,
           CAST(w_n * sab - sa * sb AS DOUBLE)
             / (sqrt(CAST(w_n * saa - sa * sa AS DOUBLE))
                * sqrt(CAST(w_n * sbb - sb * sb AS DOUBLE))) AS corr,
           CAST(w_n * sab - sa * sb AS DOUBLE)
             / CAST(w_n * saa - sa * sa AS DOUBLE) AS beta
    FROM s
    WHERE w_n >= 2 AND w_n * saa - sa * sa > 0 AND w_n * sbb - sb * sb > 0
    ORDER BY conv_id, bucket_start
    """,
)
def tier_sliding_corr_24h(spark, sf_dir):
    """M90 rolling metric correlation (engine/sliding.py sliding_corr):
    trailing-24h Pearson r and regression beta between hourly turn
    volume and token sum per conversation — six integer window sums in
    ONE Window node, zero-variance windows excluded by integer
    predicates, and the two floats' identical expression trees put the
    correlation series itself under the full-hash gate."""
    from .sliding import sliding_corr

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0)
    return sliding_corr(tiers["hourly"], "n_turns", "token_sum", 24).orderBy(
        "conv_id", "bucket_start"
    )
