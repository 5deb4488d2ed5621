"""Tier-served alerting & reliability operators (SURVEY.md §2 M73–M75).

The monitoring surface every production TSDB grows on top of its rollups
— threshold alerting, SLO burn rate, and missing-data detection — served
entirely from hourly tier STATE (O(tier) rows, raw is never read), with
exact integer arithmetic so every statistic sits under the driver's
full-hash DuckDB gate.

M73 — hysteresis threshold episodes: the Grafana/Prometheus alert state
machine (enter when v ≥ hi, exit when v ≤ lo, HOLD in between) is a
sequential recurrence, but because the state only changes at crossings it
is expressible as LOCF over crossing marks: ``last(mark ignore nulls)``
over the ordered series. Episodes are then gaps-and-islands over the
alert state, and Prometheus' ``for:`` duration gate is a HAVING on the
episode length. Missing hours do NOT clear an alert — the state persists
until an exit crossing is observed, exactly like a rule engine that only
re-evaluates when a sample arrives.

M74 — SLO multi-window burn rate (the Google SRE workbook alert): bad
and total counters are summed over a short and a long trailing window
(RANGE frames on the integer epoch-hour index — gap-correct, same idiom
as engine/sliding.py), burn = (bad/total)/slo. The FIRED decision is a
pure integer cross-multiplication ``bad·10^6 > total·slo_ppm·mult`` on
both windows — no float enters the predicate — and the reported burn
rates are each one final float division over exact longs.

M75 — data-gap episodes: per-series runs of missing hourly buckets
longer than a threshold (TimescaleDB's show-gaps / heartbeat-loss
detection), one lead() over the observed hour index.

All three shuffle once on the series keys; the island/episode groupBys
reuse the window's hash partitioning (keys are a prefix of the group
key), so each operator is exactly one exchange over tier-sized input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .rollup import observed_state
from .sliding import _hour_index


def hysteresis_alerts(
    hourly: DataFrame,
    hi: int,
    lo: int,
    value_col: str = "token_sum",
    min_len: int = 1,
    keys: tuple[str, ...] = ("conv_id",),
) -> DataFrame:
    """M73: alert episodes of `value_col` over the hourly tier with
    hysteresis — enter at ``v >= hi``, exit at ``v <= lo``, hold between
    the thresholds (no flapping on values inside the band).

    Returns one row per episode lasting at least ``min_len`` observed
    buckets (the Prometheus ``for:`` gate): the series keys plus
    ``alert_start`` / ``alert_end`` (first/last observed bucket in the
    episode), ``n_buckets`` (observed buckets while in alert) and
    ``peak`` (max value seen during the episode). Gap-filled tier rows
    are excluded; a time gap between observed buckets neither clears nor
    splits an episode — the state machine holds until an exit crossing.
    """
    if not hi > lo:
        raise ValueError(f"need hi > lo for hysteresis: hi={hi} lo={lo}")
    if min_len < 1:
        raise ValueError(f"min_len must be >= 1: {min_len}")
    v = F.col(value_col)
    h = observed_state(hourly).withColumn("_hidx", _hour_index())
    w = Window.partitionBy(*keys).orderBy("_hidx")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # crossing marks: 1 = enter, 0 = exit, null = hold (carry previous)
    mark = F.when(v >= F.lit(int(hi)), F.lit(1)).when(
        v <= F.lit(int(lo)), F.lit(0)
    )
    st = h.select(
        *h.columns,
        F.coalesce(F.last(mark, ignorenulls=True).over(wcum), F.lit(0)).alias(
            "_state"
        ),
        F.row_number().over(w).alias("_rn"),
    )
    # islands: rn - running_sum(state) is constant across a consecutive
    # run of state=1 rows (the classic gaps-and-islands key), computed in
    # a second Window over the SAME spec so the sort/exchange are reused
    grp = st.select(
        *st.columns,
        (F.col("_rn") - F.sum("_state").over(wcum)).alias("_grp"),
    )
    return (
        grp.filter(F.col("_state") == 1)
        .groupBy(*keys, "_grp")
        .agg(
            F.min("bucket_start").alias("alert_start"),
            F.max("bucket_start").alias("alert_end"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.max(v).alias("peak"),
        )
        .filter(F.col("n_buckets") >= F.lit(int(min_len)))
        .drop("_grp")
    )


def burn_rate_alerts(
    hourly: DataFrame,
    short_hours: int,
    long_hours: int,
    slo_ppm: int,
    mult: int = 1,
    bad_col: str = "tool_sum",
    total_col: str = "n_turns",
    keys: tuple[str, ...] = ("conv_id",),
) -> DataFrame:
    """M74: multi-window SLO burn rate at every observed hourly bucket.

    ``slo_ppm`` is the error budget as parts-per-million of ``total_col``
    (e.g. 200_000 ppm = "20% of turns may be bad");
    ``mult`` is the burn-rate multiple that pages (Google SRE: 14.4 for
    the fast window). A bucket FIRES when BOTH trailing windows burn
    faster than ``mult``× budget — the short window gives reaction time,
    the long window suppresses blips. The fired predicate is exact
    integer cross-multiplication; burn_short/burn_long are each one float
    division over exact longs (reproducible bit-for-bit by an ANSI
    oracle). Windows are RANGE frames on the epoch-hour index, so missing
    hours contribute nothing.
    """
    if not (0 < short_hours < long_hours):
        raise ValueError(
            f"need 0 < short < long: short={short_hours} long={long_hours}"
        )
    if not (0 < slo_ppm <= 1_000_000):
        raise ValueError(f"slo_ppm out of range: {slo_ppm}")
    h = observed_state(hourly).withColumn("_hidx", _hour_index())
    bad = F.col(bad_col).cast("long")
    tot = F.col(total_col).cast("long")
    base = Window.partitionBy(*keys).orderBy("_hidx")
    ws = base.rangeBetween(-(int(short_hours) - 1), 0)
    wl = base.rangeBetween(-(int(long_hours) - 1), 0)
    out = h.select(
        *[F.col(k) for k in keys],
        F.col("bucket_start"),
        F.sum(bad).over(ws).alias("bad_s"),
        F.sum(tot).over(ws).alias("tot_s"),
        F.sum(bad).over(wl).alias("bad_l"),
        F.sum(tot).over(wl).alias("tot_l"),
    )
    thr = F.lit(int(slo_ppm) * int(mult))
    m = F.lit(1_000_000)
    return out.select(
        *out.columns,
        (
            (F.col("bad_s") * m).cast("double")
            / (F.col("tot_s") * F.lit(int(slo_ppm))).cast("double")
        ).alias("burn_short"),
        (
            (F.col("bad_l") * m).cast("double")
            / (F.col("tot_l") * F.lit(int(slo_ppm))).cast("double")
        ).alias("burn_long"),
        (
            (F.col("bad_s") * m > F.col("tot_s") * thr)
            & (F.col("bad_l") * m > F.col("tot_l") * thr)
        ).alias("fired"),
    )


def data_gaps(
    hourly: DataFrame,
    min_gap_hours: int,
    keys: tuple[str, ...] = ("conv_id",),
) -> DataFrame:
    """M75: per-series missing-data episodes — maximal runs of absent
    hourly buckets strictly inside the series' observed span, at least
    ``min_gap_hours`` long.

    One row per gap: the series keys plus ``gap_start`` / ``gap_end``
    (first/last MISSING hour bucket) and ``gap_hours``. Leading/trailing
    absence is not a gap (the series simply hadn't started / had ended —
    PromQL absent() territory, not a hole). One lead() over the observed
    hour index; exact integers throughout.
    """
    if min_gap_hours < 1:
        raise ValueError(f"min_gap_hours must be >= 1: {min_gap_hours}")
    h = observed_state(hourly).withColumn("_hidx", _hour_index())
    w = Window.partitionBy(*keys).orderBy("_hidx")
    nxt = h.select(
        *[F.col(k) for k in keys],
        F.col("bucket_start"),
        F.col("_hidx"),
        F.lead("_hidx").over(w).alias("_nh"),
        F.lead("bucket_start").over(w).alias("_nb"),
    )
    gap = F.col("_nh") - F.col("_hidx") - F.lit(1)
    return nxt.filter(gap >= F.lit(int(min_gap_hours))).select(
        *[F.col(k) for k in keys],
        (F.col("bucket_start") + F.expr("INTERVAL 1 HOUR")).alias("gap_start"),
        (F.col("_nb") - F.expr("INTERVAL 1 HOUR")).alias("gap_end"),
        gap.cast("long").alias("gap_hours"),
    )


def wilson_rate_rank(
    daily_state,
    col: str,
    value: str,
    lo,
    hi,
    z: float = 1.96,
    k: int = 20,
):
    """M87 uncertainty-aware rate ranking: conversations ordered by the
    WILSON score lower bound of their bad-turn rate over [lo, hi) — the
    "which series really have the worst error rate" ranking that does not
    let a 1-of-1 conversation outrank a 90-of-1000 one the raw ratio
    would (the Reddit/Evan-Miller ranking rule, served from tier state).

    x (bad turns) comes from the daily freq-map state's `value` entry and
    n from n_turns — both exact integer folds per conversation; the bound
    itself is one closed-form float expression over (x, n, z) built from
    correctly-rounded IEEE ops (+ − × ÷ sqrt), written with the identical
    tree in the DuckDB oracle so even the ranking float hash-matches.
    Top-k via orderBy().limit() compiles to TakeOrderedAndProject — the
    selection distributes, no single-reducer exchange."""
    from .rollup import observed_state

    obs = observed_state(daily_state).filter(
        (F.col("bucket_start") >= F.lit(lo)) & (F.col("bucket_start") < F.lit(hi))
    )
    fq = f"{col}_freq"
    if fq not in obs.columns:
        raise ValueError(f"daily tier has no {fq!r} state — configure freq_cols")
    per = obs.groupBy("conv_id").agg(
        F.sum("n_turns").alias("n"),
        F.sum(
            F.coalesce(F.element_at(F.col(fq), value), F.lit(0).cast("long"))
        ).alias("x"),
    )
    nd = F.col("n").cast("double")
    xd = F.col("x").cast("double")
    phat = xd / nd
    zz = F.lit(z) * F.lit(z)
    center = phat + zz / (F.lit(2.0) * nd)
    inner = (phat * (F.lit(1.0) - phat) + zz / (F.lit(4.0) * nd)) / nd
    low = (center - F.lit(z) * F.sqrt(inner)) / (F.lit(1.0) + zz / nd)
    return (
        per.select(
            "conv_id",
            "n",
            "x",
            phat.alias("rate"),
            low.alias("wilson_low"),
        )
        .orderBy(F.desc("wilson_low"), "conv_id")
        .limit(int(k))
    )
