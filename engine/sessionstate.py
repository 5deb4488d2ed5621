"""Mergeable SESSIONIZATION tier state (M47).

State column ``sessions_g{G}`` (G = gap threshold in minutes), a struct
``(n: long, first_us: long, last_us: long)`` per tier bucket:

    n        — session count ("islands" split at inactivity gaps > G)
               computed WITHIN the bucket
    first_us — unix micros of the bucket's first turn
    last_us  — unix micros of the bucket's last turn

Why this is a tier-algebra member at all: sessionization looks
inherently sequential (C4/gaps-and-islands needs an ordered scan), but
over time-disjoint buckets the triple above is an ORDERED MONOID —
merging two adjacent spans a ⊕ b (a strictly earlier) is

    n        = a.n + b.n − (1 if b.first_us − a.last_us <= G else 0)
    first_us = a.first_us
    last_us  = b.last_us

which is associative over time-ordered operands. So per-hour session
counts composed hourly→daily→monthly equal a fresh gaps-and-islands scan
of the month's raw turns, exactly — the same "compute leaves once,
compose upward" economics as sum/min/max, for an operator TimescaleDB
et al. serve only by re-scanning raw.

Boundary convention matches the engine's sessionizers (C4,
engine/streaming.py session_islands / engine/skew.py
session_islands_salted): a gap STRICTLY GREATER than G starts a new
session; a gap of exactly G keeps the session.

Leaf cost: one window partitioned by (conv_id, hour-trunc(ts)) — the
partition key includes the hour, so per-task work is bounded by a single
conversation-hour no matter how hot the conversation (the same
boundedness argument as the fine-keyed freq/KMV pre-aggregations; no
salt plumbing needed). Merges fold a tier-bounded sorted struct array
(≤24 hourly rows per day, ≤31 daily per month) with F.aggregate —
pure JVM, no UDFs anywhere.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window, functions as F

_SESS_RE = re.compile(r"^sessions_g(?P<g>\d+)$")


def sess_state_col(gap_minutes: int) -> str:
    return f"sessions_g{int(gap_minutes)}"


def sess_is_state_col(name: str) -> bool:
    return _SESS_RE.match(name) is not None


def sess_gap_minutes(name: str) -> int:
    m = _SESS_RE.match(name)
    if not m:
        raise ValueError(f"not a session state column: {name}")
    return int(m.group("g"))


def _us(col) -> Column:
    # canonical NTZ → micros (session TZ is UTC throughout the engine)
    return F.unix_micros(F.col(col).cast("timestamp_ltz"))


def sess_leaf_states(
    df: DataFrame, keys: list[str], session_gaps: list[int] | None
):
    """Per-(conv, hour) leaf state for each gap threshold. `df` must carry
    conv_id / ts and the hour bucket under `keys`' second name. A turn
    starts a new within-bucket island iff it is the bucket's first turn
    or its gap from the previous turn in the SAME bucket exceeds G."""
    if not session_gaps:
        return None
    w = Window.partitionBy(*keys).orderBy("ts", "turn_idx")
    prev = F.lag(_us("ts")).over(w)
    gap_us = _us("ts") - prev
    aggs = []
    cols = {}
    for g in sorted(set(int(g) for g in session_gaps)):
        thr = g * 60_000_000
        cols[f"_new{g}"] = (
            prev.isNull() | (gap_us > F.lit(thr))
        ).cast("long")
        # first_us leads the struct: lexicographic struct comparison (and
        # therefore array_sort in the merge) is then time order
        aggs.append(
            F.struct(
                F.min(_us("ts")).alias("first_us"),
                F.max(_us("ts")).alias("last_us"),
                F.sum(f"_new{g}").alias("n"),
            ).alias(sess_state_col(g))
        )
    return df.withColumns(cols).groupBy(*keys).agg(*aggs)


def sess_merge_aggs(colnames) -> list[Column]:
    """Ordered-monoid fold for existing `sessions_g{G}` columns: sort the
    tier-bounded struct list by first_us (buckets are time-disjoint, so
    lexicographic struct sort IS time order) and fold adjacent spans,
    subtracting one session whenever the boundary gap is within G."""
    out = []
    for c in colnames:
        if not sess_is_state_col(c):
            continue
        thr = sess_gap_minutes(c) * 60_000_000
        lst = F.array_sort(F.collect_list(c))
        fold = F.aggregate(
            F.slice(lst, 2, F.size(lst) - 1),
            F.element_at(lst, 1),
            lambda acc, s: F.struct(
                acc["first_us"].alias("first_us"),
                s["last_us"].alias("last_us"),
                (
                    acc["n"]
                    + s["n"]
                    - F.when(
                        s["first_us"] - acc["last_us"] <= F.lit(thr), 1
                    ).otherwise(0)
                ).alias("n"),
            ),
        )
        # single-element groups: slice(lst, 2, 0) folds nothing — seed
        # passes through, which is exactly a.⊕ identity
        out.append(fold.alias(c))
    return out
