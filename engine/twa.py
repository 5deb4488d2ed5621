"""Time-weighted-average tier state (M49) — the TimescaleDB toolkit
`time_weight('locf')` / `gauge_agg` pair, Spark-first.

State column ``twa_{col}`` per numeric column, a struct per tier bucket:

    first_us   — unix micros of the bucket's first non-null observation
    first_val  — that observation's value (long)
    last_us    — unix micros of the bucket's last non-null observation
    last_val   — that observation's value (long)
    area       — Σ val_i × (t_{i+1} − t_i) over consecutive observations
                 WITHIN the bucket (value·micros, exact long): the
                 LOCF-weighted integral ∫v dt, where each interval is
                 attributed to the value at its left edge (the bucket's
                 final observation contributes nothing until a later
                 bucket closes it — same attribution as engine/statedur.py)

Like sessionization (M47) and duration-in-state (M48) this is a
TIME-ORDERED MONOID over disjoint buckets: merging adjacent spans a ⊕ b

    area     = a.area + a.last_val × (b.first_us − a.last_us) + b.area
    first_*  = a.first_*        last_* = b.last_*

is associative over time-ordered operands, so the monthly time-weighted
average composed from hourly structs equals a fresh lead()-attribution
scan over the month's raw turns — EXACT integer value·micros, with the
single float division (area / span) deferred to serving. At 10^12 turns,
"what was this conversation's average token payload, weighted by how
long each value was current" reads ≤31 daily structs, never raw.

The same struct serves the gauge analytics for free:

    twa    = area / (last_us − first_us)          (NULL on a point span)
    delta  = last_val − first_val                 (gauge delta)
    rate   = delta / span seconds                 (gauge rate per second)

Null values are SKIPPED (a null token count carries no weight; LOCF
extends the previous value across it) — a bucket whose observations are
ALL null carries the EMPTY SENTINEL struct (every field NULL, the
struct itself non-NULL: the engine's empty-container convention, so the
densifier's gap-carry never fires on an observed row), and the merge
fold filters sentinels out before folding, so gaps between observed
buckets are closed by the boundary term exactly as LOCF demands.

Everything is JVM column algebra: one window keyed (conv, hour) at the
leaf — per-task work bounded by a single conversation-hour regardless of
key heat, so the salted leaf joins this state directly, bit-identical to
the unsalted path (the statedur argument) — and tier-bounded
array_sort + F.aggregate folds at merge time. No UDFs.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window, functions as F

_TWA_RE = re.compile(r"^twa_(?P<col>.+)$")


def twa_state_col(col: str) -> str:
    return f"twa_{col}"


def twa_is_state_col(name: str) -> bool:
    return _TWA_RE.match(name) is not None


def _us(col) -> Column:
    # canonical NTZ → micros (session TZ is UTC throughout the engine)
    return F.unix_micros(F.col(col).cast("timestamp_ltz"))


def empty_twa_struct() -> Column:
    """All-fields-NULL sentinel for buckets with no non-null observation.
    Non-NULL as a struct so observed rows never trip the densifier's
    gap-carry; filtered out of the merge fold by first_us IS NULL."""
    n = F.lit(None)
    return F.struct(
        n.cast("long").alias("first_us"),
        n.cast("long").alias("first_val"),
        n.cast("long").alias("last_us"),
        n.cast("long").alias("last_val"),
        n.cast("long").alias("area"),
    )


def twa_leaf_states(
    df: DataFrame, keys: list[str], twa_cols: list[str] | None
):
    """Per-(conv, hour) LOCF-integral leaf: intervals between consecutive
    non-null observations of the SAME bucket, weighted by the value at
    the interval's left edge. Ties on ts are broken by turn_idx — a
    zero-length interval contributes zero area either way, but first/last
    selection must be deterministic under any partitioning."""
    if not twa_cols:
        return None
    out = None
    for c in sorted(set(twa_cols)):
        obs = df.filter(F.col(c).isNotNull()).withColumn(
            "_v", F.col(c).cast("long")
        )
        w = Window.partitionBy(*keys).orderBy("ts", "turn_idx")
        nxt = F.lead(_us("ts")).over(w)
        dur = nxt - _us("ts")  # NULL on the bucket's last observation
        order = F.struct(_us("ts").alias("u"), F.col("turn_idx").alias("i"))
        flagged = obs.withColumns({"_dur": dur, "_ord": order})
        m = flagged.groupBy(*keys).agg(
            F.struct(
                F.min(_us("ts")).alias("first_us"),
                F.min_by("_v", "_ord").alias("first_val"),
                F.max(_us("ts")).alias("last_us"),
                F.max_by("_v", "_ord").alias("last_val"),
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("_dur").isNotNull(),
                            F.col("_v") * F.col("_dur"),
                        )
                    ),
                    F.lit(0).cast("long"),
                ).alias("area"),
            ).alias(twa_state_col(c))
        )
        out = m if out is None else out.join(m, keys, "full")
    return out


def twa_fold_agg(col: str) -> Column:
    """The ordered-monoid fold as an unaliased aggregate expression: sort
    the group's struct list by first_us, fold adjacent spans adding each
    boundary interval's last_val × gap to the running area. Sentinel
    structs (all-null buckets) are filtered out first; an all-sentinel
    group folds back to the sentinel. Shared by the tier merges and the
    continuous-aggregate 'twa' kind."""
    lst = F.array_sort(
        F.filter(F.collect_list(col), lambda s: s["first_us"].isNotNull()),
        lambda l, r: F.when(l["first_us"] < r["first_us"], -1)
        .when(l["first_us"] > r["first_us"], 1)
        .otherwise(0),
    )
    fold = F.aggregate(
        F.slice(lst, 2, F.greatest(F.size(lst) - 1, F.lit(0))),
        F.element_at(lst, 1),
        lambda acc, s: F.struct(
            acc["first_us"].alias("first_us"),
            acc["first_val"].alias("first_val"),
            s["last_us"].alias("last_us"),
            s["last_val"].alias("last_val"),
            (
                acc["area"]
                + acc["last_val"] * (s["first_us"] - acc["last_us"])
                + s["area"]
            ).alias("area"),
        ),
    )
    return F.when(F.size(lst) > 0, fold).otherwise(empty_twa_struct())


def twa_merge_aggs(colnames) -> list[Column]:
    """Merge aggregates for every `twa_{col}` column (see twa_fold_agg)."""
    return [
        twa_fold_agg(c).alias(c) for c in colnames if twa_is_state_col(c)
    ]


def twa_serve_cols(state: Column) -> dict[str, Column]:
    """Serving expressions over one twa struct: the time-weighted average
    (ONE float division over exact integer state), the gauge delta, and
    the per-second gauge rate. A point span (single observation) has no
    width — twa/rate are NULL there, delta is 0."""
    span = state["last_us"] - state["first_us"]
    twa = F.when(
        span > 0, state["area"].cast("double") / span.cast("double")
    )
    delta = state["last_val"] - state["first_val"]
    rate = F.when(
        span > 0,
        delta.cast("double") * F.lit(1_000_000.0) / span.cast("double"),
    )
    return {"twa": twa, "delta": delta, "rate_per_s": rate}
