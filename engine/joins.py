"""General as-of join (SURVEY.md §2 F3 as a reusable operator).

`asof_join(left, right, ...)` matches each left row with the most recent
right row at-or-before (backward) or the earliest at-or-after (forward)
its timestamp, per key — pandas `merge_asof` / kdb `aj` semantics,
distributed.

Plan shape: the two inputs are UNIONED with a side tag, then ONE window
pass per key (ordered by timestamp, side-tag tie-break) carries the right
side's payload onto left rows via last(ignorenulls). Cost is a single
exchange+sort on the key — never the O(n·m) range join a naive
`left.ts >= right.ts` theta condition would plan, and never a per-key
collect. Equal-timestamp policy: `allow_exact_matches=True` sorts right
rows before left rows at the same timestamp (<= semantics, pandas
default); False sorts them after (<).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_on: str,
    right_on: str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Left as-of-joined with right: all left columns plus each of
    `value_cols` (default: every non-key right column) from the matched
    right row, null when no right row qualifies.

    If several right rows share the same (key, timestamp), which one's
    payload wins is unspecified (partition-order dependent) — pre-aggregate
    the right side to one row per (key, timestamp) when that matters."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in by and c != right_on
        ]
    left_cols = left.columns
    clash = set(value_cols) & set(left_cols)
    if clash:
        raise ValueError(
            f"right value columns collide with left columns: {sorted(clash)}"
        )

    # side tag ordering at EQUAL timestamps decides <= vs < semantics
    # (right-before-left in the scan → the left row sees the equal-ts
    # right value); the same tag order holds for both scan directions
    right_first = allow_exact_matches
    r_tag = 0 if right_first else 1
    l_tag = 1 - r_tag

    r = right.select(
        *by,
        F.col(right_on).alias("_asof_ts"),
        F.lit(r_tag).alias("_asof_side"),
        F.struct(*value_cols).alias("_asof_val"),
        *[F.lit(None).alias(f"_l_{c}") for c in left_cols],
    )
    lf = left.select(
        *[F.col(c) for c in by],
        F.col(left_on).alias("_asof_ts"),
        F.lit(l_tag).alias("_asof_side"),
        F.lit(None)
        .cast(r.schema["_asof_val"].dataType)
        .alias("_asof_val"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
    )
    u = r.unionByName(lf)

    if direction == "backward":
        order = [F.col("_asof_ts").asc(), F.col("_asof_side").asc()]
    else:
        order = [F.col("_asof_ts").desc(), F.col("_asof_side").asc()]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(
        "_asof_match", F.last("_asof_val", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_asof_side") == l_tag).select(
        *[F.col(f"_l_{c}").alias(c) for c in left_cols],
        *[F.col("_asof_match")[c].alias(c) for c in value_cols],
    )
    return out


def point_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_on: str,
    start_on: str,
    end_on: str,
    by: list[str] | None = None,
    bucket: str = "1 hour",
) -> DataFrame:
    """Range join (point-in-interval, start <= p < end) WITHOUT relying on
    a selective equi key: both sides are keyed by fixed-width time bucket
    (intervals explode into every bucket they overlap), the join is a pure
    equi join on (by..., bucket) and the exact range predicate filters the
    handful of same-bucket candidates. This is the manual form of the
    range-join bucketing optimization — the naive theta condition would
    plan a nested-loop join that cannot survive scale.

    `bucket` must be chosen so a typical interval overlaps few buckets
    (the explode factor is interval_span / bucket_width). Inner join:
    points matching no interval are dropped; a point in k intervals
    appears k times."""
    by = list(by or [])
    width_us = _duration_us(bucket)
    p_b = points.withColumn("_rj_b", _bucket_of(point_on, width_us))
    i_b = _explode_interval_buckets(intervals, start_on, end_on, width_us)
    joined = p_b.join(i_b, on=by + ["_rj_b"]).filter(
        (F.col(point_on) >= F.col(start_on))
        & (F.col(point_on) < F.col(end_on))
    )
    return joined.drop("_rj_b")


def _bucket_of(ts_col: str, width_us: int):
    """Fixed-width bucket id of a timestamp column (shared by both range
    joins — the end-exclusive arithmetic must never drift between them)."""
    return F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp_ltz")) / F.lit(width_us)
    )


def _explode_interval_buckets(
    df: DataFrame, start: str, end: str, width_us: int
) -> DataFrame:
    """One row per bucket the [start, end) interval overlaps, as _rj_b.
    Zero-length intervals denote the empty set and are dropped — they
    overlap nothing under either operator's semantics."""
    return df.filter(F.col(end) > F.col(start)).withColumn(
        "_rj_b",
        F.explode(
            F.sequence(
                _bucket_of(start, width_us),
                F.floor(
                    (F.unix_micros(F.col(end).cast("timestamp_ltz")) - F.lit(1))
                    / F.lit(width_us)
                ),
            )
        ),
    )


_DUR_UNITS_US = {
    "second": 1_000_000,
    "seconds": 1_000_000,
    "minute": 60_000_000,
    "minutes": 60_000_000,
    "hour": 3_600_000_000,
    "hours": 3_600_000_000,
    "day": 86_400_000_000,
    "days": 86_400_000_000,
}


def _duration_us(spec: str) -> int:
    n, unit = spec.strip().split()
    return int(n) * _DUR_UNITS_US[unit.lower()]


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    by: list[str] | None = None,
    bucket: str = "1 hour",
) -> DataFrame:
    """Interval-overlap join ([ls,le) overlaps [rs,re)) via the same
    bucket-chunking as point_interval_join: BOTH sides explode into the
    buckets they span, candidates meet on (by..., bucket), and the exact
    overlap predicate (ls < re AND rs < le) filters them. Bucket-pair
    duplicates are prevented by keeping only the candidate whose shared
    bucket is the FIRST bucket of the overlap region (greatest of the two
    start buckets) — each qualifying pair survives exactly once, without
    a post-join distinct. Zero-length intervals denote the empty set and
    match nothing (even where the raw ls < re AND rs < le predicate would
    hold for an enclosing interval)."""
    by = list(by or [])
    width_us = _duration_us(bucket)
    lb = _explode_interval_buckets(left, left_start, left_end, width_us)
    rb = _explode_interval_buckets(right, right_start, right_end, width_us)
    first_overlap_bucket = F.greatest(
        _bucket_of(left_start, width_us), _bucket_of(right_start, width_us)
    )
    return (
        lb.join(rb, on=by + ["_rj_b"])
        .filter(
            (F.col(left_start) < F.col(right_end))
            & (F.col(right_start) < F.col(left_end))
            & (F.col("_rj_b") == first_overlap_bucket)
        )
        .drop("_rj_b")
    )
