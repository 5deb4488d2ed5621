"""K-minimum-values (KMV) distinct sketches as mergeable tier state
with SET ALGEBRA (M45).

State column ``<col>_kmv{k}`` (self-describing cap, like the ``_hh{cap}``
heavy-hitter columns): the k smallest ``xxhash64`` values of the column's
DISTINCT non-null values within the bucket, as a sorted ``array<long>``.

Why a second distinct sketch next to the HLL columns: HLL register-max
union answers *cardinality of a union* and nothing else. A KMV sketch is
a uniform bottom-k sample of the distinct-value hash space, so two
sketches support INTERSECTION / Jaccard / overlap estimates — "how many
tools did this conversation use in BOTH January and February" — which no
amount of HLL unioning can answer.

Algebraic properties the engine leans on:

- **Merge is exact-deterministic, not just estimate-exact.** The k
  smallest distinct hashes of a union are a pure function of the k
  smallest of each part (any union element outside every part's bottom-k
  is dominated by k smaller ones in that part), so sorted-union-truncate
  composes per-salt and hourly→daily→monthly BIT-IDENTICALLY to a direct
  build over raw. Stronger than the HLL columns, whose serialized bytes
  are aggregation-order-dependent (only their estimates are stable).
- **Exact regime.** While a sketch holds fewer than k hashes it IS the
  full distinct hash set: sizes, intersections, and Jaccards are exact
  (modulo 64-bit hash collisions, P ≈ n²/2⁶⁵ — negligible at any
  per-bucket cardinality that fits an array). This is what puts the
  monthly overlap query under the full-hash DuckDB oracle, the same
  trick the Misra–Gries state uses (cap ≥ cardinality ⇒ exact).
- **Estimators** (sample regime, |sketch| == k): with U_(k) the k-th
  smallest hash normalized to (0,1), the classic KMV cardinality
  estimate is (k−1)/U_(k); set-overlap estimates follow Beyer et al.
  (SIGMOD 2007, "On Synopses for Distinct-Value Estimation Under
  Multiset Operations"): take X = the union sketch's k values, then
  ρ = |X ∩ A ∩ B| / k estimates Jaccard and ρ · est(|A∪B|) estimates
  the intersection cardinality.

Everything here is JVM-side column algebra — collect_set / array_sort /
slice / array_distinct / array_intersect — no Python in the hot path.
Per-group state is bounded by k longs; groups are tier-bounded (≤24
hourly rows per day, ≤31 daily per month, ≤n_salts partials per salt
merge), so the collect_list fan-in is always metadata-scale.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

_KMV_RE = re.compile(r"^(?P<base>.+)_kmv(?P<k>\d+)$")

# hash-space constants: xxhash64 is uniform over the signed-long range
_HASH_LO = -(2.0**63)
_HASH_SPAN = 2.0**64


def kmv_state_col(col: str, k: int) -> str:
    return f"{col}_kmv{int(k)}"


def kmv_is_state_col(name: str) -> bool:
    return _KMV_RE.match(name) is not None


def kmv_cap(name: str) -> int:
    m = _KMV_RE.match(name)
    if not m:
        raise ValueError(f"not a KMV state column: {name}")
    return int(m.group("k"))


def kmv_arrays(df, keys: list[str], kmv_cols: dict[str, int] | None):
    """Leaf KMV state: one sorted bottom-k distinct-hash array per spec'd
    column, computed the freq_maps way — a fine-keyed pre-distinct on
    (group, hash) first, THEN the per-group gather. The pre-distinct is a
    two-phase aggregate on a key that splits a hot (conv, hour) across its
    VALUES, so the leaf is inherently salt-proof (no per-salt plumbing
    needed, exactly like the freq/hh states), and the gather's per-group
    fan-in is the bucket's distinct cardinality, never its row count.

    Nulls are skipped (xxhash64(NULL) would hash the seed and count nulls
    as a value), matching the HLL columns' null semantics. Callers must
    coalesce the join result with `empty_kmv_array()` — an all-null bucket
    carries an EMPTY array, not NULL, so the densifier's gap-carry never
    fires on observed rows."""
    if not kmv_cols:
        return None
    out = None
    for c, k in sorted(kmv_cols.items()):
        m = (
            df.filter(F.col(c).isNotNull())
            .select(*keys, F.xxhash64(c).alias("_h"))
            .distinct()
            .groupBy(*keys)
            .agg(
                F.slice(F.array_sort(F.collect_set("_h")), 1, int(k)).alias(
                    kmv_state_col(c, k)
                )
            )
        )
        out = m if out is None else out.join(m, keys, "full")
    return out


def empty_kmv_array() -> Column:
    return F.array().cast("array<long>")


def kmv_merge_aggs(colnames) -> list[Column]:
    """Merge aggregates for existing ``<col>_kmv{k}`` columns:
    sorted-union-truncate, cap recovered from the self-describing name.
    Exact-deterministic (see module docstring) — the merged array is
    bit-identical to a direct build, whichever grouping produced the
    parts."""
    out = []
    for c in colnames:
        if not kmv_is_state_col(c):
            continue
        k = kmv_cap(c)
        out.append(
            F.slice(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list(c)))),
                1,
                k,
            ).alias(c)
        )
    return out


def kmv_union(a: Column, b: Column, k: int) -> Column:
    """Union sketch of two KMV arrays (same k): bottom-k of the merged
    hash sets — exactly the sketch a direct build over both inputs
    produces."""
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, int(k))


def kmv_estimate(sketch: Column, k: int) -> Column:
    """Distinct-count estimate as a double: exact size below saturation,
    (k−1)/U_(k) once the sketch is full."""
    sz = F.size(sketch)
    kth = (F.element_at(sketch, int(k)).cast("double") - F.lit(_HASH_LO)) / F.lit(
        _HASH_SPAN
    )
    return F.when(sz < int(k), sz.cast("double")).otherwise(
        F.lit(float(k - 1)) / kth
    )


def kmv_overlap_cols(a: Column, b: Column, k: int) -> dict[str, Column]:
    """Set-overlap columns for two same-k sketches.

    Returns expressions for:
      n_union_est   — KMV estimate over the union sketch
      jaccard_est   — ρ = |X ∩ A ∩ B| / |X| over the union sketch X
      n_common_est  — ρ · n_union_est
    In the exact regime (|A∪B| < k ⇒ X is the full union hash set) every
    one of these is exact: ρ's numerator is the true intersection size
    and |X| the true union size.
    """
    x = kmv_union(a, b, k)
    n_x = F.size(x)
    matches = F.size(F.array_intersect(F.array_intersect(x, a), b))
    rho = F.when(
        n_x > 0, matches.cast("double") / n_x.cast("double")
    ).otherwise(F.lit(0.0))
    n_union = kmv_estimate(x, k)
    return {
        "n_union_est": n_union,
        "jaccard_est": rho,
        "n_common_est": rho * n_union,
    }
