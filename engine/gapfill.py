"""Gap-fill stage (SURVEY.md §2 C5/F4/E5/K3): densify per-conversation
hourly series and fill missing buckets.

The reference's analogue is NA-cell handling in masked climate stacks; here a
"gap" is an hourly bucket with no observed turns between a conversation's
first and last active hour. Two fill methods, per BASELINE.json:6:

- LOCF  — last observation carried forward. Pure Spark window
  (`last(ignorenulls) over ROWS UNBOUNDED PRECEDING`), zero Python.
- linear — linear interpolation between the neighbouring observed buckets,
  via a vectorized Arrow `applyInPandas` grouped map (pandas
  `Series.interpolate(method='linear', limit_area='inside')`) — the only
  place Python touches data in this stage, Arrow-batched per conversation
  group, never per-row.

Output is a long-form metric series:
    conv_id, bucket_start, metric, value double, filled bool, fill_method str

Scale notes: the spine is built per conversation from its own [min,max]
bucket range (no global cross join); the expensive step is one shuffle on
conv_id for the window / grouped map, which reuses the rollup's partitioning
key. Spine explosion is bounded: sequence() arrays are one month of hours max
per row after `split_spine_months` chunking.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

HOUR_S = 3600.0

#: metric name -> expression factory over hourly tier state (lazy: building
#: a Column requires an active SparkContext)
METRIC_EXPRS = {
    "turn_rate": lambda: F.col("n_turns") / HOUR_S,
    "token_count_mean": lambda: F.col("token_sum") / F.col("n_turns"),
    "tool_rate": lambda: F.col("tool_sum") / F.col("n_turns"),
}

SERIES_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("bucket_start", T.TimestampNTZType()),
        T.StructField("metric", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("filled", T.BooleanType()),
        T.StructField("fill_method", T.StringType()),
    ]
)


def hourly_series(hourly_state: DataFrame, metrics=None) -> DataFrame:
    """Unpivot hourly tier state into long-form (conv_id, bucket, metric,
    value) series — the codec and gap-fill input shape."""
    metrics = metrics or list(METRIC_EXPRS)
    cols = [
        F.struct(F.lit(m).alias("metric"), METRIC_EXPRS[m]().alias("value"))
        for m in metrics
    ]
    return hourly_state.select(
        "conv_id",
        F.col("bucket_start").cast("timestamp_ntz").alias("bucket_start"),
        F.explode(F.array(*cols)).alias("mv"),
    ).select("conv_id", "bucket_start", F.col("mv.metric"), F.col("mv.value"))


def bucket_spine(observed: DataFrame) -> DataFrame:
    """C5: dense hourly spine per (conv_id, metric) from each series' own
    min..max bucket. Month-chunked sequence/explode keeps array sizes bounded
    at long time ranges."""
    bounds = observed.groupBy("conv_id", "metric").agg(
        F.min("bucket_start").alias("lo"), F.max("bucket_start").alias("hi")
    )
    months = bounds.select(
        "conv_id",
        "metric",
        "lo",
        "hi",
        F.explode(
            F.expr(
                "sequence(CAST(date_trunc('month', lo) AS TIMESTAMP_NTZ),"
                " CAST(date_trunc('month', hi) AS TIMESTAMP_NTZ),"
                " interval 1 month)"
            )
        ).alias("m0"),
    )
    return months.select(
        "conv_id",
        "metric",
        F.explode(
            F.expr(
                "sequence(greatest(m0, lo), least(hi, m0 + interval 1 month - interval 1 hour), interval 1 hour)"
            )
        ).alias("bucket_start"),
    )


def densify(observed: DataFrame) -> DataFrame:
    """F4: spine ⟕ observed — null value rows mark the gaps."""
    spine = bucket_spine(observed)
    return spine.join(observed, ["conv_id", "metric", "bucket_start"], "left")


def gapfill_locf(observed: DataFrame) -> DataFrame:
    """E5: native LOCF — no Python workers, and ONE shuffle total.

    Instead of materializing a dense spine and left-joining (bounds agg +
    join + window = three exchanges), each observed row carries its gap run:
    lead() gives the next observed bucket, last(ignorenulls) the LOCF carry
    value, and a month-chunked nested transform/sequence emits the filled
    rows between them — all from a single exchange+sort on the series key.
    Output is row-identical to the join formulation: the spine spans each
    series' own [min, max] (lead() is null at the tail, so nothing is
    emitted past the last observation), observed-but-null rows count as
    gaps for the carry, and fill_method is stamped only where LOCF actually
    produced a value."""
    w = Window.partitionBy("conv_id", "metric").orderBy("bucket_start")
    carry_w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base = observed.select(
        "conv_id",
        "metric",
        "bucket_start",
        "value",
        F.lead("bucket_start").over(w).alias("nxt"),
        F.last("value", ignorenulls=True).over(carry_w).alias("carry"),
    )
    # per-row output array: the observed bucket itself + its trailing gap
    # run (month-chunked so no single array exceeds ~744 entries)
    rows = base.select(
        "conv_id",
        "metric",
        F.explode(
            F.expr(
                """
                concat(
                  array(named_struct(
                    'bucket_start', bucket_start,
                    'value', coalesce(value, carry),
                    'filled', value IS NULL,
                    'fill_method',
                      CASE WHEN value IS NULL AND carry IS NOT NULL
                           THEN 'locf' END)),
                  CASE WHEN nxt IS NULL
                            OR nxt <= bucket_start + interval 1 hour
                       THEN array()
                       ELSE flatten(transform(
                         sequence(
                           CAST(date_trunc('month',
                                bucket_start + interval 1 hour)
                             AS TIMESTAMP_NTZ),
                           CAST(date_trunc('month', nxt - interval 1 hour)
                             AS TIMESTAMP_NTZ),
                           interval 1 month),
                         m0 -> transform(
                           sequence(
                             greatest(m0, bucket_start + interval 1 hour),
                             least(nxt - interval 1 hour,
                                   m0 + interval 1 month - interval 1 hour),
                             interval 1 hour),
                           h -> named_struct(
                             'bucket_start', h,
                             'value', carry,
                             'filled', true,
                             'fill_method',
                               CASE WHEN carry IS NOT NULL
                                    THEN 'locf' END))))
                  END)
                """
            )
        ).alias("r"),
    )
    return rows.select(
        "conv_id",
        F.col("r.bucket_start").alias("bucket_start"),
        "metric",
        F.col("r.value").alias("value"),
        F.col("r.filled").alias("filled"),
        F.col("r.fill_method").alias("fill_method"),
    )


def gapfill_locf_salted(observed: DataFrame, slice: str = "30 days") -> DataFrame:
    """Skew-safe LOCF: row-identical to `gapfill_locf`, but no task ever
    holds more than one time slice of a series — for Zipf-hot conversations
    whose full hourly series would otherwise funnel through one reducer.

    Shape: dense spine (per-series bounds via algebraic min/max — partial
    aggregation, skew-free) left-joined with observations on the FULL
    (conv_id, metric, bucket_start) key (fine-grained, no hot-key funnel),
    then the carry is an `asof_join_salted` (backward, <=) against the
    non-null observations — per-task work bounded by `slice`, with a
    slice-level boundary-carry window (engine/joins.py). Use when one
    conversation's series is too hot for `gapfill_locf`'s single-pass
    window; otherwise the single-exchange plan wins."""
    from .joins import asof_join_salted

    dense = densify(observed).select("conv_id", "metric", "bucket_start", "value")
    carriers = observed.filter(F.col("value").isNotNull()).select(
        "conv_id",
        "metric",
        F.col("bucket_start").alias("_c_ts"),
        F.col("value").alias("_c_val"),
    )
    carried = asof_join_salted(
        dense,
        carriers,
        by=["conv_id", "metric"],
        left_on="bucket_start",
        right_on="_c_ts",
        value_cols=["_c_val"],
        direction="backward",
        allow_exact_matches=True,
        slice=slice,
    )
    gap = F.col("value").isNull()
    return carried.select(
        "conv_id",
        "bucket_start",
        "metric",
        F.coalesce("value", "_c_val").alias("value"),
        gap.alias("filled"),
        F.when(gap & F.col("_c_val").isNotNull(), F.lit("locf")).alias(
            "fill_method"
        ),
    )


def _interp_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # one (conv_id, metric) series per group, Arrow-batched
    pdf = pdf.sort_values("bucket_start", ignore_index=True)
    obs = pdf["value"]
    filled = obs.isna()
    interp = obs.interpolate(method="linear", limit_area="inside")
    pdf["value"] = interp
    pdf["filled"] = filled
    pdf["fill_method"] = pd.Series(
        pd.NA, index=pdf.index, dtype="object"
    ).mask(filled & interp.notna(), "linear")
    return pdf


def gapfill_linear(observed: DataFrame) -> DataFrame:
    """K3: linear interpolation via Arrow grouped map. Leading/trailing gaps
    stay null (limit_area='inside'), matching pandas semantics exactly —
    the parity oracle IS pandas."""
    dense = densify(observed).select("conv_id", "bucket_start", "metric", "value")
    return (
        dense.groupBy("conv_id", "metric")
        .applyInPandas(_interp_group, SERIES_SCHEMA)
        .select(*[f.name for f in SERIES_SCHEMA.fields])
    )


def gapfill(observed: DataFrame, method: str = "locf") -> DataFrame:
    if method == "locf":
        return gapfill_locf(observed)
    if method == "locf_salted":
        return gapfill_locf_salted(observed)
    if method == "linear":
        return gapfill_linear(observed)
    raise ValueError(f"unknown fill method: {method}")
