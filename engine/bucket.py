"""Projection, derivation, masking and time-bucketing over T0 (SURVEY.md §2 B/C).

Reference analogue: the unpack/index step of the climate stack — assigning
each daily layer to its month index before ``stackApply`` — re-expressed as
``date_trunc`` column expressions so Catalyst keeps everything inside
whole-stage codegen (no shuffle is introduced here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

T0_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampNTZType()),
    ]
)

#: tier name -> date_trunc unit + bucket span in seconds (monthly spans vary;
#: None means "derive from calendar", see bucket_span_seconds)
TIER_UNIT = {"hourly": "hour", "daily": "day", "monthly": "month"}
TIER_ORDER = ["hourly", "daily", "monthly"]
FIXED_SPAN_S = {"hourly": 3600, "daily": 86400}


def mask_valid(df: DataFrame) -> DataFrame:
    """Validity mask (B3) — the engine's analogue of ``raster::mask``:
    out-of-domain rows (null key or null event time) are excluded before any
    aggregation, exactly as NA cells outside the study region are."""
    return df.filter(
        F.col("conv_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("turn_idx").isNotNull()
    )


def clip_time_range(df: DataFrame, lo=None, hi=None) -> DataFrame:
    """Time clip (B2) — ``crop()`` analogue; pushes to parquet row groups."""
    if lo is not None:
        df = df.filter(F.col("ts") >= F.lit(lo))
    if hi is not None:
        df = df.filter(F.col("ts") < F.lit(hi))
    return df


def dedup_turns(df: DataFrame) -> DataFrame:
    """Stable-order dedup of replayed turns (E2): keep the earliest ts per
    (conv_id, turn_idx). Equal-ts replays with differing payloads are broken
    by (role, text) so the canonical row is identical under any
    partitioning/run — row_number alone would pick arbitrarily."""
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.col("ts").asc(), F.col("role").asc_nulls_last(), F.col("text").asc_nulls_last()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def with_metrics(df: DataFrame) -> DataFrame:
    """Derive per-turn metric columns (B4): token_count proxy =
    length(text), tool invocation indicator. Idempotent: a pre-derived
    metrics table (ingest-time B4, no raw text) passes through untouched."""
    if "token_count" in df.columns and "is_tool" in df.columns:
        return df
    return df.withColumns(
        {
            "token_count": F.length("text").cast("long"),
            "is_tool": F.col("tool").isNotNull().cast("long"),
        }
    )


def with_bucket(df: DataFrame, tier: str, ts_col: str = "ts") -> DataFrame:
    """Tumbling calendar bucket (C1/C2), UTC. NTZ-cast: the engine's
    canonical bucket type (see rollup.rollup_hourly)."""
    return df.withColumn(
        "bucket_start",
        F.date_trunc(TIER_UNIT[tier], F.col(ts_col)).cast("timestamp_ntz"),
    )


def with_conv_bucket(df: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Iceberg-style hidden partition column bucket(conv_id, B), emulated."""
    return df.withColumn(
        "conv_bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    )


#: TimescaleDB's (and DuckDB's) default time_bucket origin for fixed-width
#: buckets: a Monday, so week-width buckets start on Mondays.
TIME_BUCKET_ORIGIN = "2000-01-03 00:00:00"


def time_bucket(ts_col, width_s: int, origin: str = TIME_BUCKET_ORIGIN):
    """Arbitrary fixed-width tumbling bucket with an explicit ORIGIN — the
    TimescaleDB/DuckDB `time_bucket(width, ts, origin)` C1 generalization
    beyond date_trunc's calendar edges (90-minute ops windows, 4-hour
    shifts, buckets phase-shifted to 00:30). Integer micros math keeps it
    inside whole-stage codegen and makes the floor EXACT for timestamps
    before the origin too: pmod's non-negative remainder is floor
    division, where a double-divide floor would drift at 10^18 micros.
    Returns the NTZ bucket left edge (the engine's canonical bucket
    type)."""
    if width_s <= 0:
        raise ValueError(f"width_s must be positive, got {width_s}")
    w = int(width_s) * 1_000_000
    us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz") if isinstance(ts_col, str)
                       else ts_col.cast("timestamp_ltz"))
    origin_us = F.unix_micros(F.lit(origin).cast("timestamp_ltz"))
    delta = us - origin_us
    floored = delta - F.pmod(delta, F.lit(w))
    return F.timestamp_micros(origin_us + floored).cast("timestamp_ntz")


def time_bucket_tz(ts_col, tz: str, unit: str = "day"):
    """Calendar bucket in a LOCAL timezone: the stored NTZ instant (UTC by
    engine convention) is converted to `tz` wall-clock time and truncated
    there — "daily report in America/New_York" semantics, where a local
    day is 23/24/25 UTC hours across DST transitions. Returns the local
    wall-clock bucket edge as NTZ (group key; convert back for display)."""
    col = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    local = F.convert_timezone(F.lit("UTC"), F.lit(tz), col.cast("timestamp_ntz"))
    return F.date_trunc(unit, local).cast("timestamp_ntz")


def register_time_bucket_sql(spark) -> None:
    """Register `time_bucket` / `time_bucket_tz` as session SQL scalar
    functions (Spark SQL UDF syntax — a pure-SQL body, so calls inline
    into the plan like any expression: no Python boundary, codegen
    intact). Makes the bucketing primitives usable from `eng.sql(...)`
    and inside continuous-aggregate DDL key expressions. Idempotent
    (CREATE OR REPLACE); per-session, like temp views."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION time_bucket(
            ts TIMESTAMP_NTZ, width_s BIGINT,
            origin STRING DEFAULT '2000-01-03 00:00:00')
        RETURNS TIMESTAMP_NTZ
        RETURN cast(timestamp_micros(
            unix_micros(cast(origin AS timestamp_ltz))
            + (unix_micros(cast(ts AS timestamp_ltz))
               - unix_micros(cast(origin AS timestamp_ltz)))
            - pmod(unix_micros(cast(ts AS timestamp_ltz))
                   - unix_micros(cast(origin AS timestamp_ltz)),
                   width_s * 1000000)) AS timestamp_ntz)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION time_bucket_tz(
            ts TIMESTAMP_NTZ, tz STRING, unit STRING DEFAULT 'day')
        RETURNS TIMESTAMP_NTZ
        RETURN cast(date_trunc(unit, convert_timezone('UTC', tz, ts))
                    AS timestamp_ntz)
        """
    )


def bucket_span_seconds(tier: str, bucket_col="bucket_start"):
    """Span of a bucket in seconds as a Column. Calendar months vary
    (28/29/30/31 d) — computed from real month edges, never 86400*30."""
    if tier in FIXED_SPAN_S:
        return F.lit(FIXED_SPAN_S[tier]).cast("long")
    nxt = F.add_months(F.col(bucket_col), 1)
    return (F.unix_timestamp(nxt) - F.unix_timestamp(F.col(bucket_col))).cast("long")
