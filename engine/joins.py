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


def _asof_value_cols(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    right_on: str,
    value_cols: list[str] | None,
    direction: str,
) -> list[str]:
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in by and c != right_on
        ]
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"right value columns collide with left columns: {sorted(clash)}"
        )
    return value_cols


def _asof_union_carry(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_on: str,
    right_on: str,
    value_cols: list[str],
    direction: str,
    allow_exact_matches: bool,
) -> DataFrame:
    """Shared core of both as-of variants: union-tag the two inputs, one
    window pass per `by` key, and return ONE ROW PER LEFT ROW with its left
    columns (prefixed `_l_`) plus the matched payload struct `_asof_match`
    (null when no right row in this key qualifies)."""
    # side tag ordering at EQUAL timestamps decides <= vs < semantics
    # (right-before-left in the scan → the left row sees the equal-ts
    # right value); the same tag order holds for both scan directions
    right_first = allow_exact_matches
    r_tag = 0 if right_first else 1
    l_tag = 1 - r_tag

    left_cols = left.columns
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
    return carried.filter(F.col("_asof_side") == l_tag).drop(
        "_asof_ts", "_asof_side", "_asof_val"
    )


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
    the right side to one row per (key, timestamp) when that matters.

    Skew note: the window pass funnels each key's FULL series (left+right)
    through one task. Fine for bounded per-key series (tier rows); for
    raw-event joins on Zipf-hot keys use `asof_join_salted`, which bounds
    per-task work by the time-slice width instead."""
    value_cols = _asof_value_cols(left, right, by, right_on, value_cols, direction)
    left_cols = left.columns
    carried = _asof_union_carry(
        left, right, by, left_on, right_on, value_cols,
        direction, allow_exact_matches,
    )
    return carried.select(
        *[F.col(f"_l_{c}").alias(c) for c in left_cols],
        *[F.col("_asof_match")[c].alias(c) for c in value_cols],
    )


def asof_join_salted(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_on: str,
    right_on: str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    slice: str = "1 day",
) -> DataFrame:
    """Skew-safe as-of join: identical results to `asof_join` (given
    non-null timestamps and right rows unique per (key, timestamp)), but no
    task ever sees more than one TIME SLICE of a key's series — the salted
    analogue of the two-phase tier algebra (engine/skew.py), with the salt
    derived from time so carry semantics survive the split.

    Two passes:
      1. within-slice: the union+window pass of `asof_join`, partitioned by
         (by…, slice) — a hot key's rows spread over its slices.
      2. boundary carry: per (key, slice) the right side collapses to its
         boundary payload (latest row for backward / earliest for forward —
         ONE row per slice, via max_by/min_by partial aggregation, itself
         skew-free), and a window over this slice-level table (rows = number
         of slices, never number of events) carries payloads across slice
         boundaries. Left rows missing a within-slice match coalesce to the
         carry entering their slice.

    Exact-timestamp policy never crosses slices (equal timestamps share a
    slice), so pass 1 alone decides <= vs <. `slice` ("6 hours", "1 day",
    …) bounds per-task work: pick it so a hot key's densest slice fits one
    task comfortably."""
    value_cols = _asof_value_cols(left, right, by, right_on, value_cols, direction)
    left_cols = left.columns
    width_us = _duration_us(slice)
    backward = direction == "backward"

    l2 = left.withColumn("_asof_slice", _bucket_of(left_on, width_us))
    r2 = right.withColumn("_asof_slice", _bucket_of(right_on, width_us))

    # pass 1: within-slice match (null where the slice holds no qualifying
    # right row) — partitioned by (by…, _asof_slice)
    within = _asof_union_carry(
        l2, r2, [*by, "_asof_slice"], left_on, right_on, value_cols,
        direction, allow_exact_matches,
    )

    # pass 2: slice-level boundary payloads + cross-slice carry.
    # max_by/min_by aggregate with partial combine, so the hot key's slice
    # summary is itself skew-free; the carry window sees one row per slice.
    pick = F.max_by if backward else F.min_by
    r_sum = r2.groupBy(*by, "_asof_slice").agg(
        pick(F.struct(*value_cols), F.col(right_on)).alias("_slice_val")
    )
    l_slices = l2.select(*by, "_asof_slice").distinct()
    spine = l_slices.join(r_sum, [*by, "_asof_slice"], "full")
    order = F.col("_asof_slice").asc() if backward else F.col("_asof_slice").desc()
    wslice = (
        Window.partitionBy(*by)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = spine.select(
        *by,
        "_asof_slice",
        F.last("_slice_val", ignorenulls=True).over(wslice).alias("_slice_carry"),
    )

    # the within result is already hash-partitioned on (by…, slice); only
    # the slice-level carry table moves in this join
    joined = within.join(carry, [*by, "_asof_slice"], "left")
    match = F.coalesce(F.col("_asof_match"), F.col("_slice_carry"))
    return joined.select(
        *[F.col(f"_l_{c}").alias(c) for c in left_cols if c != "_asof_slice"],
        *[match[c].alias(c) for c in value_cols],
    )


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
