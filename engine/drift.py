"""Distribution-drift serving from tier state (SURVEY.md §2 M66–M69).

A 10^12-turn corpus drifts: the role mix shifts when a product launch
changes traffic, token-length distributions move when a new model ships,
conversion funnels change under experiments. The monitoring questions —
"did the categorical distribution of X change between range A and range
B?", "which day did the shift happen?", "is variant B converting better
than A?" — are classically answered by scanning raw twice. Here every
distributional comparison is served from the SAME mergeable tier state the
pipeline already maintains (freq maps, histogram bin arrays), so a drift
check over two quarters touches O(tier) rows and never raw.

Exactness discipline (the repo-wide rule): all distances are computed on
EXACT integer cross-products folded by integer addition (associative —
partition-order-proof), with ONE float division at the end, so the
drift queries sit under the driver's full-hash oracle gate:

  TV(A, B)  = Σ_v |n_a·N_b − n_b·N_a|  /  (2·N_a·N_b)
  KS(A, B)  = max_bin |cum_a·N_b − cum_b·N_a|  /  (N_a·N_b)
  Gini      = 1 − Σ_v n_v²  /  N²

The log-based measures (PSI, Jensen–Shannon, Shannon entropy) are
genuinely useful but `ln` is NOT bit-portable across engines (measured:
395/5000 values differ in the last ulp between the JVM and libm), so they
are served as floats for monitoring and pytest-verified against a numpy
reference instead of hash-gated (tests/test_drift.py).

Overflow bound: the integer cross-products need |n·N| < 2^63 — with
per-value counts ≤ N this means N_a·N_b < 2^63, i.e. both ranges under
~3·10^9 rows when compared globally. Beyond that, compare per
conversation / per shard (the per-conv KS here already does), or
pre-divide by a common power of two; the functions document the bound
rather than silently widening to decimal (decimal Σ is exact too but
~4× slower and changes result dtypes under the oracle's canonicalizer).
"""

from __future__ import annotations

from datetime import datetime
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .rewrite import split_range
from .rollup import observed_state


def _span_filter(a: datetime, b: datetime):
    return (F.col("bucket_start") >= F.lit(a)) & (F.col("bucket_start") < F.lit(b))


def range_freq_counts(
    tiers: dict[str, DataFrame], lo: datetime, hi: datetime, col: str
) -> DataFrame:
    """Corpus-level (value, n) distribution of `col` over [lo, hi), composed
    from frequency-map tier state (`TierPipeline(freq_cols=[col])`): the
    greedy calendar spans' maps explode to rows and fold by integer
    addition — exact under any partitioning, partial+final aggregated (no
    single-reducer map fold), O(tiers) rows scanned."""
    spans = split_range(lo, hi)
    if not spans:
        raise ValueError("empty range")
    fq = f"{col}_freq"
    parts = []
    for tier, a, b in spans:
        st = observed_state(tiers[tier])
        if fq not in st.columns:
            raise ValueError(f"{tier} tier has no freq column {fq!r}")
        parts.append(
            st.filter(_span_filter(a, b)).select(
                F.explode(fq).alias("value", "n")
            )
        )
    u = reduce(lambda x, y: x.unionByName(y), parts)
    return u.groupBy("value").agg(F.sum("n").alias("n"))


def freq_drift(
    tiers: dict[str, DataFrame],
    range_a: tuple[datetime, datetime],
    range_b: tuple[datetime, datetime],
    col: str,
) -> DataFrame:
    """M66: categorical distribution drift of `col` between two arbitrary
    hour-aligned ranges, served purely from freq tier state. One row per
    value seen in either range: exact counts (n_a, n_b), the exact shares
    (p_a, p_b — one division each), the value's integer TV numerator
    contribution `tv_num` = |n_a·N_b − n_b·N_a|, and the range-level
    total-variation distance `tv` = Σ tv_num / (2·N_a·N_b) repeated per
    row (computed once from integer state, attached by broadcast).

    TV ∈ [0, 1] is the worst-case probability disagreement between the
    two distributions — the drift alarm threshold quantity. All sums are
    integer (order-proof); floats appear only as final single divisions,
    so this sits under the full-hash oracle gate. The monitoring-flavored
    log measures (PSI / Jensen–Shannon) live in `drift_measures`."""
    ca = range_freq_counts(tiers, *range_a, col).withColumnRenamed("n", "n_a")
    cb = range_freq_counts(tiers, *range_b, col).withColumnRenamed("n", "n_b")
    j = (
        ca.join(cb, "value", "full_outer")
        .select(
            "value",
            F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"),
        )
    )
    totals = j.agg(
        F.sum("n_a").alias("na_tot"), F.sum("n_b").alias("nb_tot")
    )
    # one-row totals: broadcast crossJoin is the repo's established
    # metadata-scale pattern (plan-gate allowlisted)
    jt = j.crossJoin(F.broadcast(totals))
    jt = jt.withColumn(
        "tv_num",
        F.abs(
            F.col("n_a") * F.col("nb_tot") - F.col("n_b") * F.col("na_tot")
        ).cast("long"),
    )
    tv_total = jt.agg(F.sum("tv_num").alias("tv_sum"))
    out = jt.crossJoin(F.broadcast(tv_total))
    return out.select(
        "value",
        "n_a",
        "n_b",
        (F.col("n_a").cast("double") / F.col("na_tot").cast("double")).alias(
            "p_a"
        ),
        (F.col("n_b").cast("double") / F.col("nb_tot").cast("double")).alias(
            "p_b"
        ),
        "tv_num",
        (
            F.col("tv_sum").cast("double")
            / (F.lit(2) * F.col("na_tot") * F.col("nb_tot")).cast("double")
        ).alias("tv"),
    )


def _range_freq_counts_by_conv(
    tiers: dict[str, DataFrame], lo: datetime, hi: datetime, col: str
) -> DataFrame:
    spans = split_range(lo, hi)
    if not spans:
        raise ValueError("empty range")
    fq = f"{col}_freq"
    parts = []
    for tier, a, b in spans:
        st = observed_state(tiers[tier])
        if fq not in st.columns:
            raise ValueError(f"{tier} tier has no freq column {fq!r}")
        parts.append(
            st.filter(_span_filter(a, b)).select(
                "conv_id", F.explode(fq).alias("value", "n")
            )
        )
    u = reduce(lambda x, y: x.unionByName(y), parts)
    return u.groupBy("conv_id", "value").agg(F.sum("n").alias("n"))


def freq_drift_by_conv(
    tiers: dict[str, DataFrame],
    range_a: tuple[datetime, datetime],
    range_b: tuple[datetime, datetime],
    col: str,
    k: int = 10,
) -> DataFrame:
    """M72: drift ATTRIBUTION — which conversations drove the corpus
    shift. Per conversation active in BOTH ranges, the TV distance between
    its own range-A and range-B distributions of `col` (same exact-integer
    machinery as freq_drift, but every total and cross-product is
    conv-local, so the per-conv windows shuffle on conv_id — no global
    funnel and no 2^63 pressure at any corpus size). Ranked by
    `weight` = tv · min(n_a, n_b) (a whale that shifted a little can
    matter more than a minnow that flipped completely; min() keeps
    one-sided volume from dominating), deterministic tiebreak, top-k.
    Output: rank, conv_id, n_a, n_b, tv_num, tv, weight."""
    ca = _range_freq_counts_by_conv(tiers, *range_a, col).withColumnRenamed(
        "n", "n_a"
    )
    cb = _range_freq_counts_by_conv(tiers, *range_b, col).withColumnRenamed(
        "n", "n_b"
    )
    j = ca.join(cb, ["conv_id", "value"], "full_outer").select(
        "conv_id",
        "value",
        F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
        F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"),
    )
    w = Window.partitionBy("conv_id")
    t = j.withColumn("na_tot", F.sum("n_a").over(w)).withColumn(
        "nb_tot", F.sum("n_b").over(w)
    )
    # attribution needs both sides observed; a conv absent from one range
    # is volume churn, not distribution drift
    t = t.filter((F.col("na_tot") > 0) & (F.col("nb_tot") > 0))
    num = F.abs(
        F.col("n_a") * F.col("nb_tot") - F.col("n_b") * F.col("na_tot")
    ).cast("long")
    per_conv = (
        t.withColumn("num", num)
        .groupBy("conv_id")
        .agg(
            F.max("na_tot").cast("long").alias("n_a"),
            F.max("nb_tot").cast("long").alias("n_b"),
            F.sum("num").alias("tv_num"),
        )
        .select(
            "conv_id",
            "n_a",
            "n_b",
            "tv_num",
            (
                F.col("tv_num").cast("double")
                / (F.lit(2) * F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("tv"),
        )
    )
    weight = F.col("tv") * F.least("n_a", "n_b").cast("double")
    # orderBy().limit(k) compiles to TakeOrderedAndProject — the top-k
    # decision distributes (per-partition top-k, driver merge of k-row
    # slices), no single-reducer exchange at any key cardinality
    return (
        per_conv.withColumn("weight", weight)
        .orderBy(F.desc("weight"), "conv_id")
        .limit(k)
        .select("conv_id", "n_a", "n_b", "tv_num", "tv", "weight")
    )


def drift_measures(drift: DataFrame, eps: float = 1e-6) -> DataFrame:
    """Monitoring summary over `freq_drift` rows: PSI (population
    stability index, the industry drift score) and Jensen–Shannon
    divergence (symmetric, bounded by ln 2), with zero-share smoothing at
    `eps`. One row. Float `ln` is not bit-portable across engines, so
    these are pytest-verified against numpy, not oracle-hashed."""
    p = F.greatest(F.col("p_a"), F.lit(eps))
    q = F.greatest(F.col("p_b"), F.lit(eps))
    m = (p + q) / F.lit(2.0)
    return drift.agg(
        F.sum((p - q) * F.log(p / q)).alias("psi"),
        F.sum(
            (p * F.log(p / m) + q * F.log(q / m)) / F.lit(2.0)
        ).alias("jsd"),
        F.max("tv").alias("tv"),
    )


def _range_hist_by_conv(
    tiers: dict[str, DataFrame], lo: datetime, hi: datetime, hcol: str
) -> DataFrame:
    from .rollup import hist_merge_aggs

    spans = split_range(lo, hi)
    if not spans:
        raise ValueError("empty range")
    parts = []
    for tier, a, b in spans:
        st = observed_state(tiers[tier])
        if hcol not in st.columns:
            raise ValueError(f"{tier} tier has no hist column {hcol!r}")
        parts.append(st.filter(_span_filter(a, b)).select("conv_id", hcol))
    u = reduce(lambda x, y: x.unionByName(y), parts)
    return u.groupBy("conv_id").agg(*hist_merge_aggs([hcol]))


def hist_drift_ks(
    tiers: dict[str, DataFrame],
    range_a: tuple[datetime, datetime],
    range_b: tuple[datetime, datetime],
    col: str,
) -> DataFrame:
    """M67: per-conversation two-sample Kolmogorov–Smirnov statistic of a
    numeric column between two ranges, served from histogram tier state
    (`TierPipeline(hist_cols={col: (origin, width, k)})`). For each
    conversation present in BOTH ranges, the two merged k-bin arrays give
    exact binned CDFs; KS = max_bin |cdf_a − cdf_b| computed as an integer
    max of |cum_a·N_b − cum_b·N_a| (cumulative sums over the FIXED-length
    bin spine — arrays always carry all k bins, so the cum at every index
    is well-defined) with one final division. Output: conv_id, n_a, n_b,
    ks_num (integer max), ks (float).

    KS on the binned CDF equals KS of the raw samples whenever the
    distributions are compared at bin resolution — the tier-state
    trade: a hard ≤1-bin-width resolution bound, zero raw scan."""
    h = f"{col}_hist"
    ha = _range_hist_by_conv(tiers, *range_a, h).withColumnRenamed(h, "ha")
    hb = _range_hist_by_conv(tiers, *range_b, h).withColumnRenamed(h, "hb")
    j = ha.join(hb, "conv_id")  # inner: drift needs both sides observed
    e = j.select(
        "conv_id",
        F.posexplode(F.arrays_zip("ha", "hb")).alias("bin", "c"),
    ).select(
        "conv_id",
        "bin",
        F.col("c.ha").alias("a"),
        F.col("c.hb").alias("b"),
    )
    wcum = (
        Window.partitionBy("conv_id")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("conv_id")
    c = (
        e.withColumn("cum_a", F.sum("a").over(wcum))
        .withColumn("cum_b", F.sum("b").over(wcum))
        .withColumn("n_a", F.sum("a").over(wall))
        .withColumn("n_b", F.sum("b").over(wall))
    )
    d = F.abs(
        F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
    ).cast("long")
    return (
        c.withColumn("d", d)
        .groupBy("conv_id")
        .agg(
            F.max("n_a").cast("long").alias("n_a"),
            F.max("n_b").cast("long").alias("n_b"),
            F.max("d").alias("ks_num"),
        )
        .select(
            "conv_id",
            "n_a",
            "n_b",
            "ks_num",
            (
                F.col("ks_num").cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("ks"),
        )
    )


def freq_drift_timeline(
    tiers: dict[str, DataFrame], col: str
) -> DataFrame:
    """M68: WHEN did the distribution shift — day-over-day total-variation
    of `col`'s corpus-level distribution from the DAILY tier's freq maps.
    One row per day with an observed previous day: exact counts fold per
    (day, value), consecutive days align by a value-level full-outer join
    within the day pair (a category appearing or vanishing still
    contributes), integer TV numerator per pair, one division. A drift
    alarm is `tv > threshold` on this frame; the spike localizes the
    change to a day without ever touching raw."""
    fq = f"{col}_freq"
    d = observed_state(tiers["daily"])
    if fq not in d.columns:
        raise ValueError(f"daily tier has no freq column {fq!r}")
    counts = (
        d.select(
            F.col("bucket_start").alias("day"),
            F.explode(fq).alias("value", "n"),
        )
        .groupBy("day", "value")
        .agg(F.sum("n").alias("n"))
    )
    totals = counts.groupBy("day").agg(F.sum("n").alias("n_tot"))
    cur = counts.select("day", "value", F.col("n").alias("n_cur"))
    prev = counts.select(
        (F.col("day") + F.expr("INTERVAL 1 DAY")).alias("day"),
        "value",
        F.col("n").alias("n_prev"),
    )
    pairs = (
        cur.join(prev, ["day", "value"], "full_outer")
        .select(
            "day",
            "value",
            F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
            F.coalesce("n_prev", F.lit(0)).cast("long").alias("n_prev"),
        )
    )
    tc = totals.select("day", F.col("n_tot").alias("nc_tot"))
    tp = totals.select(
        (F.col("day") + F.expr("INTERVAL 1 DAY")).alias("day"),
        F.col("n_tot").alias("np_tot"),
    )
    # inner joins against the totals: a pair row only counts when BOTH
    # days were observed (first day / gap days emit nothing)
    withtot = pairs.join(F.broadcast(tc), "day").join(F.broadcast(tp), "day")
    num = F.abs(
        F.col("n_cur") * F.col("np_tot") - F.col("n_prev") * F.col("nc_tot")
    ).cast("long")
    return (
        withtot.withColumn("num", num)
        .groupBy("day")
        .agg(
            F.max("np_tot").cast("long").alias("n_prev"),
            F.max("nc_tot").cast("long").alias("n_cur"),
            F.sum("num").alias("tv_num"),
        )
        .select(
            "day",
            "n_prev",
            "n_cur",
            "tv_num",
            (
                F.col("tv_num").cast("double")
                / (F.lit(2) * F.col("n_prev") * F.col("n_cur")).cast(
                    "double"
                )
            ).alias("tv"),
        )
    )


def freq_drift_baseline(
    tiers: dict[str, DataFrame], col: str, baseline_days: int = 7
) -> DataFrame:
    """M71: drift alarm against a trailing baseline — each observed day's
    corpus-level distribution of `col` vs the union of its previous
    `baseline_days` observed days, from the DAILY tier's freq maps. This
    is the production monitor shape (a single anomalous day stands out
    against a week, where day-over-day TV would also fire on the healthy
    day AFTER a one-day blip). Baseline counts fold by integer addition
    over an exploded day-offset spine (≤ baseline_days× expansion of the
    tier-sized counts table — never raw); TV is the usual integer
    cross-product with ONE final division, hash-gated. Days with no
    observed baseline day emit nothing. Output: day, n_base (baseline
    total), n_cur, baseline_width (observed days in the window), tv_num,
    tv."""
    fq = f"{col}_freq"
    d = observed_state(tiers["daily"])
    if fq not in d.columns:
        raise ValueError(f"daily tier has no freq column {fq!r}")
    counts = (
        d.select(
            F.col("bucket_start").alias("day"),
            F.explode(fq).alias("value", "n"),
        )
        .groupBy("day", "value")
        .agg(F.sum("n").alias("n"))
    )
    totals = counts.groupBy("day").agg(F.sum("n").alias("n_tot"))
    offsets = F.explode(
        F.sequence(F.lit(1), F.lit(int(baseline_days)))
    ).alias("k")
    base_counts = (
        counts.select(
            F.col("day"), F.col("value"), F.col("n"), offsets
        )
        .select(
            (
                F.col("day")
                + F.make_dt_interval(days=F.col("k"))
            ).alias("day"),
            "value",
            "n",
        )
        .groupBy("day", "value")
        .agg(F.sum("n").alias("n_base"))
    )
    base_totals = (
        totals.select(F.col("day"), F.col("n_tot"), offsets)
        .select(
            (
                F.col("day")
                + F.make_dt_interval(days=F.col("k"))
            ).alias("day"),
            F.col("n_tot").alias("nb"),
        )
        .groupBy("day")
        .agg(
            F.sum("nb").alias("nb_tot"),
            F.count("*").cast("int").alias("baseline_width"),
        )
    )
    cur = counts.select("day", "value", F.col("n").alias("n_cur"))
    pairs = (
        cur.join(base_counts, ["day", "value"], "full_outer")
        .select(
            "day",
            "value",
            F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
            F.coalesce("n_base", F.lit(0)).cast("long").alias("n_base"),
        )
    )
    tc = totals.select("day", F.col("n_tot").alias("nc_tot"))
    # inner joins: only days observed themselves AND with ≥1 baseline day
    withtot = pairs.join(F.broadcast(tc), "day").join(
        F.broadcast(base_totals), "day"
    )
    num = F.abs(
        F.col("n_cur") * F.col("nb_tot") - F.col("n_base") * F.col("nc_tot")
    ).cast("long")
    return (
        withtot.withColumn("num", num)
        .groupBy("day")
        .agg(
            F.max("nb_tot").cast("long").alias("n_base"),
            F.max("nc_tot").cast("long").alias("n_cur"),
            F.max("baseline_width").alias("baseline_width"),
            F.sum("num").alias("tv_num"),
        )
        .select(
            "day",
            "n_base",
            "n_cur",
            "baseline_width",
            "tv_num",
            (
                F.col("tv_num").cast("double")
                / (F.lit(2) * F.col("n_base") * F.col("n_cur")).cast(
                    "double"
                )
            ).alias("tv"),
        )
    )


def freq_concentration(state: DataFrame, col: str) -> DataFrame:
    """M69: per-(conv, bucket) concentration of a categorical column from
    freq tier state — Gini impurity 1 − Σn²/N² (0 = all one category,
    (k−1)/k = uniform over k) plus Shannon entropy in nats. Σn² and N are
    exact-integer HOF folds over the stored map; gini is one division
    (hash-gated), entropy is float `ln` (pytest-gated). The per-bucket
    diversity/mix-shift signal, O(tier) rows."""
    fq = f"{col}_freq"
    if fq not in state.columns:
        raise ValueError(f"state has no freq column {fq!r}")
    vals = F.map_values(fq)
    zero = F.lit(0).cast("long")
    n = F.aggregate(vals, zero, lambda a, x: a + x)
    sumsq = F.aggregate(vals, zero, lambda a, x: a + x * x)
    s = observed_state(state).select(
        "conv_id",
        "bucket_start",
        F.size(vals).alias("n_cats"),
        n.alias("n"),
        sumsq.alias("sumsq"),
    )
    return s.filter(F.col("n") > 0).select(
        "conv_id",
        "bucket_start",
        "n_cats",
        "n",
        (
            F.lit(1.0)
            - F.col("sumsq").cast("double")
            / (F.col("n") * F.col("n")).cast("double")
        ).alias("gini"),
    )


def freq_entropy(state: DataFrame, col: str) -> DataFrame:
    """Shannon entropy (nats) of each bucket's stored distribution —
    monitoring float (ln is engine-specific at the last ulp; verified
    against numpy in tests/test_drift.py, not oracle-hashed)."""
    fq = f"{col}_freq"
    vals = F.map_values(fq)
    zero = F.lit(0).cast("long")
    n = F.aggregate(vals, zero, lambda a, x: a + x).cast("double")
    ent = F.aggregate(
        vals,
        F.lit(0.0),
        lambda a, x: a
        - (x.cast("double") / n) * F.log(x.cast("double") / n),
    )
    return observed_state(state).select(
        "conv_id", "bucket_start", ent.alias("entropy")
    )


def ab_conversion_ztest(
    events: DataFrame,
    convert_on: str = "purchase",
    variants: int = 2,
    min_events: int = 1,
) -> DataFrame:
    """M70: two-proportion z-test over the events fixture — the experiment
    read-out primitive. Unit = user; deterministic variant assignment
    user_id % `variants` (the fixture carries no assignment column; a real
    experiment system supplies one and this becomes a groupBy on it);
    conversion = the user has ≥ `min_events` `convert_on` events (the
    threshold matters: a degenerate 0%/100% pooled rate makes z exactly
    0/0, which ANSI mode correctly refuses). Exposure and conversion
    counts are exact integers; p1, p2, the pooled rate and
    z = (p1 − p2) / sqrt(pp·(1−pp)·(n1+n2)/(n1·n2)) are each single
    IEEE-exact expressions (÷, ×, −, sqrt are all correctly rounded), so
    even the z statistic sits under the full-hash gate. One row out."""
    per_user = events.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(F.col("event_type") == convert_on, F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            >= F.lit(min_events),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("converted")
    )
    per_variant = (
        per_user.withColumn(
            "variant", F.pmod(F.col("user_id"), F.lit(variants)).cast("int")
        )
        .groupBy("variant")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("converted").cast("long").alias("c"),
        )
    )
    one = per_variant.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 0, F.col("c"))).alias("c1"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("variant") == 1, F.col("c"))).alias("c2"),
    )
    p1 = F.col("c1").cast("double") / F.col("n1").cast("double")
    p2 = F.col("c2").cast("double") / F.col("n2").cast("double")
    pp = (F.col("c1") + F.col("c2")).cast("double") / (
        F.col("n1") + F.col("n2")
    ).cast("double")
    inv = (F.col("n1") + F.col("n2")).cast("double") / (
        F.col("n1") * F.col("n2")
    ).cast("double")
    z = (p1 - p2) / F.sqrt(pp * (F.lit(1.0) - pp) * inv)
    return one.select(
        "n1",
        "c1",
        "n2",
        "c2",
        p1.alias("p1"),
        p2.alias("p2"),
        z.alias("z"),
    )


def freq_first_seen(
    daily_state: DataFrame, col: str, baseline_end: datetime
) -> DataFrame:
    """M77 new-category detection: for each value of `col` first observed on
    or after `baseline_end`, the day it first appeared and its count that
    day — the "a new error code / model name / tool id just showed up"
    monitor, served entirely from daily freq-map tier state.

    Shape: explode the daily maps to (day, value, n) rows (tier-sized),
    fold per (day, value) by integer addition, then ONE more partial+final
    aggregate takes min(struct(day, n)) per value — the struct min is
    lexicographic, and (day, value) rows are unique after the fold, so it
    carries the first day AND that day's count in a single pass (no join
    back). Values already present during the baseline window never
    surface, so a steady-state corpus alerts only on genuinely new values.
    At 10^12 turns this scans O(days × category cardinality) tier rows,
    never raw."""
    obs = observed_state(daily_state)
    fq = f"{col}_freq"
    per_day = (
        obs.select(
            F.to_date("bucket_start").alias("day"),
            F.explode(F.col(fq)).alias("value", "n"),
        )
        .groupBy("day", "value")
        .agg(F.sum("n").alias("n"))
    )
    firsts = per_day.groupBy("value").agg(F.min(F.struct("day", "n")).alias("f"))
    return (
        firsts.select(
            "value",
            F.col("f.day").alias("first_seen"),
            F.col("f.n").alias("first_day_n"),
        )
        .filter(F.col("first_seen") >= F.lit(baseline_end).cast("date"))
        .orderBy("first_seen", "value")
    )
