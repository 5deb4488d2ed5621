"""Skew handling (SURVEY.md F6/E3/L5).

BASELINE.json:6: "skewed hot conversations are salted before windowed
aggregation and shuffle partitioning is keyed on (conv_id bucket, time
bucket)". AQE splits skewed *joins* at runtime but cannot split a skewed
groupBy aggregation — a hot conv_id funnels every row through one reducer.

The fix exploits the tier algebra's composability (engine/rollup.py): the
leaf rollup is salted into S sub-aggregates per (conv_id, bucket) and then
composed with the same integer-exact sum/min/max merge used between tiers —
results are bit-identical to the unsalted path by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bucket import with_metrics


def with_conv_time_keys(
    df: DataFrame, n_conv_buckets: int = 64, ts_col: str = "ts"
) -> DataFrame:
    """L5: the engine's canonical shuffle keys — (conv bucket, time bucket),
    Iceberg hidden-partitioning style."""
    return df.withColumns(
        {
            "conv_bucket": F.pmod(F.xxhash64("conv_id"), F.lit(n_conv_buckets)).cast(
                "int"
            ),
            "bucket_date": F.to_date(ts_col),
        }
    )


def repartition_for_rollup(df: DataFrame, num_partitions: int | None = None):
    """Shuffle once on the canonical keys; downstream groupBys on
    (conv_id, bucket) reuse this layout (AQE elides aligned exchanges)."""
    cols = ["conv_bucket", "bucket_date"]
    return (
        df.repartition(num_partitions, *cols) if num_partitions else df.repartition(*cols)
    )


def hot_conversations(t0: DataFrame, top_k: int = 20) -> DataFrame:
    """E3: skew diagnostics — top-k conv_ids by row count with their share.
    The total is derived from the per-key aggregate (partial+final combine,
    one broadcast row), not a second scan of the input."""
    per_key = t0.groupBy("conv_id").agg(F.count("*").alias("n_turns"))
    total = per_key.agg(F.sum("n_turns").alias("_total"))
    return (
        per_key.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("n_turns") / F.col("_total"))
        .drop("_total")
        .orderBy(F.desc("n_turns"), "conv_id")
        .limit(top_k)
    )


def rollup_hourly_salted(t0: DataFrame, n_salts: int = 16) -> DataFrame:
    """F6: two-phase salted leaf rollup.

    Phase 1 groups by (conv_id, bucket, salt) — the hot key's rows spread
    over n_salts reducers. Phase 2 merges the sub-aggregates per
    (conv_id, bucket) with the tier-composition algebra. Only algebraic
    aggregates (sum/count/min/max) pass through this path — exact distincts
    must bypass it (SURVEY.md §7.3).
    """
    df = with_metrics(t0).withColumn(
        "_salt", F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(n_salts))
    )
    partial = df.groupBy(
        "conv_id",
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("bucket_start"),
        "_salt",
    ).agg(
        F.count("*").alias("n_turns"),
        F.sum("token_count").alias("token_sum"),
        F.min("token_count").alias("token_min"),
        F.max("token_count").alias("token_max"),
        F.sum("is_tool").alias("tool_sum"),
        F.min("is_tool").alias("tool_min"),
        F.max("is_tool").alias("tool_max"),
    )
    merged = partial.groupBy("conv_id", "bucket_start").agg(
        F.sum("n_turns").alias("n_turns"),
        F.sum("token_sum").alias("token_sum"),
        F.min("token_min").alias("token_min"),
        F.max("token_max").alias("token_max"),
        F.sum("tool_sum").alias("tool_sum"),
        F.min("tool_min").alias("tool_min"),
        F.max("tool_max").alias("tool_max"),
    )
    return merged.withColumns(
        {
            "hours_count": F.lit(1).cast("long"),
            "hturns_min": F.col("n_turns"),
            "hturns_max": F.col("n_turns"),
            "tier": F.lit("hourly"),
        }
    )
