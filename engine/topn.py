"""Exact top-N / bottom-N value tier state (M52) — the TimescaleDB
toolkit `max_n_by` / `min_n_by`, Spark-first.

State column ``{col}_top{n}`` (or ``{col}_bot{n}``): an array of at most
n structs ``(v: long, u: long, i: int)`` — the bucket's n largest
(smallest) non-null values of `col`, each carrying its observation's
unix-micros timestamp and turn_idx. The array is totally ordered by
(v desc|asc, u asc, i asc); (u, i) is unique per turn, so the order has
no ties and the state is a pure function of the bucket's row multiset.

Merge is EXACT-DETERMINISTIC, the KMV argument order-reversed: the n
largest elements of a union are a pure function of each part's n
largest (anything outside a part's top-n is dominated by n larger
elements in that part), so flatten → comparator-sort → truncate
composes per-salt and hourly→daily→monthly BIT-IDENTICALLY to a direct
build over raw. That exactness is what puts "the month's 3 longest
turns, with their timestamps" under the full-hash DuckDB oracle — and
what lets a 100-TB deployment serve per-conversation extremes from ≤31
daily arrays instead of a raw scan.

Leaf cost: one window row_number keyed (conv, hour) — per-task work
bounded by a single conversation-hour regardless of key heat (the
statedur argument; no salt plumbing needed), then a ≤n-row gather per
group that reuses the window's partitioning. Merges fold tier-bounded
arrays with flatten + array_sort(comparator) + slice — pure JVM.

Nulls are skipped; an all-null bucket carries an EMPTY array (never
NULL) so the densifier's gap-carry cannot fire on observed rows.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window, functions as F

_TOPN_RE = re.compile(r"^(?P<base>.+)_(?P<dir>top|bot)(?P<n>\d+)$")


def topn_state_col(col: str, n: int, direction: str = "top") -> str:
    assert direction in ("top", "bot")
    return f"{col}_{direction}{int(n)}"


def topn_is_state_col(name: str) -> bool:
    return _TOPN_RE.match(name) is not None


def _spec(name: str) -> tuple[str, int]:
    m = _TOPN_RE.match(name)
    if not m:
        raise ValueError(f"not a top/bot-n state column: {name}")
    return m.group("dir"), int(m.group("n"))


def empty_topn_array() -> Column:
    return F.array().cast("array<struct<v:long,u:long,i:int>>")


def _cmp(direction: str):
    """Total-order comparator: (v desc|asc, u asc, i asc)."""

    def cmp(l, r):  # noqa: E741
        if direction == "top":
            first = F.when(l["v"] > r["v"], -1).when(l["v"] < r["v"], 1)
        else:
            first = F.when(l["v"] < r["v"], -1).when(l["v"] > r["v"], 1)
        return first.otherwise(
            F.when(l["u"] < r["u"], -1)
            .when(l["u"] > r["u"], 1)
            .when(l["i"] < r["i"], -1)
            .when(l["i"] > r["i"], 1)
            .otherwise(0)
        )

    return cmp


def topn_leaf_states(
    df: DataFrame,
    keys: list[str],
    topn_cols: dict[str, int] | None,
    direction: str = "top",
):
    """Per-(conv, hour) leaf: window row_number prefilter (keeps per-group
    gather at ≤n rows; the groupBy reuses the window's partitioning) then
    a comparator-sorted array. Callers must coalesce the join result with
    empty_topn_array()."""
    if not topn_cols:
        return None
    out = None
    for c, n in sorted(topn_cols.items()):
        v = F.col(c).cast("long")
        order = (
            [v.desc(), F.col("_u").asc(), F.col("turn_idx").asc()]
            if direction == "top"
            else [v.asc(), F.col("_u").asc(), F.col("turn_idx").asc()]
        )
        obs = df.filter(v.isNotNull()).withColumn(
            "_u", F.unix_micros(F.col("ts").cast("timestamp_ltz"))
        )
        w = Window.partitionBy(*keys).orderBy(*order)
        m = (
            obs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= int(n))
            .groupBy(*keys)
            .agg(
                F.slice(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                v.alias("v"),
                                F.col("_u").alias("u"),
                                F.col("turn_idx").alias("i"),
                            )
                        ),
                        _cmp(direction),
                    ),
                    1,
                    int(n),
                ).alias(topn_state_col(c, n, direction))
            )
        )
        out = m if out is None else out.join(m, keys, "full")
    return out


def topn_merge_aggs(colnames) -> list[Column]:
    """Merge aggregates for `{col}_top{n}` / `{col}_bot{n}` arrays:
    flatten the tier-bounded list, comparator-sort, truncate — the n
    extremes of a union are a pure function of each part's n extremes,
    so any grouping composes bit-identically to a direct build."""
    out = []
    for c in colnames:
        if not topn_is_state_col(c):
            continue
        direction, n = _spec(c)
        out.append(
            F.slice(
                F.array_sort(
                    F.flatten(F.collect_list(c)), _cmp(direction)
                ),
                1,
                n,
            ).alias(c)
        )
    return out


def topn_explode(df: DataFrame, state_col: str) -> DataFrame:
    """Serving view: one row per ranked element — (…group cols…, rank,
    value, ts, turn_idx), rank 1 = the extreme."""
    others = [c for c in df.columns if c != state_col]
    e = df.select(*others, F.posexplode(state_col).alias("_p", "_s"))
    return e.select(
        *others,
        (F.col("_p") + 1).alias("rank"),
        F.col("_s")["v"].alias("value"),
        F.timestamp_micros(F.col("_s")["u"])
        .cast("timestamp_ntz")
        .alias("ts"),
        F.col("_s")["i"].alias("turn_idx"),
    )
