"""Aggregate-rewrite tests (SURVEY §4.3): the tier-composed answer to an
arbitrary hour-aligned range must equal direct aggregation of raw turns,
and the range splitter must produce a disjoint, covering, tier-aligned,
maximally-coarse decomposition."""

import sys
from datetime import datetime, timedelta
from pathlib import Path

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.rewrite import rewrite_range_agg, split_range  # noqa: E402
from engine.rollup import build_tiers  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402

EPOCH = datetime(2026, 1, 1)


@st.composite
def hour_ranges(draw):
    a = draw(st.integers(0, 24 * 200))
    b = draw(st.integers(a + 1, 24 * 200 + 1))
    return EPOCH + timedelta(hours=a), EPOCH + timedelta(hours=b)


@settings(max_examples=200, deadline=None)
@given(hour_ranges())
def test_split_range_properties(rng):
    lo, hi = rng
    spans = split_range(lo, hi)
    # disjoint + covering, in order
    cur = lo
    for tier, a, b in spans:
        assert a == cur and b > a
        cur = b
        # alignment: span edges sit on the tier's calendar unit
        if tier == "daily":
            assert a.hour == 0 and b.hour == 0
        if tier == "monthly":
            assert (a.day, a.hour) == (1, 0) and (b.day, b.hour) == (1, 0)
    assert cur == hi
    # maximality: any full calendar month inside [lo, hi) is served monthly
    m = (
        datetime(lo.year, lo.month, 1)
        if lo == datetime(lo.year, lo.month, 1, 0)
        else (
            datetime(lo.year + (lo.month == 12), lo.month % 12 + 1, 1)
        )
    )
    nxt = datetime(m.year + (m.month == 12), m.month % 12 + 1, 1)
    if nxt <= hi.replace(hour=0) and m >= lo:
        assert any(t == "monthly" for t, _, _ in spans), spans


def test_split_range_rejects_unaligned():
    with pytest.raises(ValueError):
        split_range(EPOCH, EPOCH + timedelta(minutes=90))


def test_rewrite_equals_raw_aggregation_across_months(spark, tmp_path):
    """3-month synthetic data, a range using all five span kinds, tiers
    coming from the REAL pipeline output (including gap-filled rows, which
    must be transparently excluded)."""
    from engine.pipeline import TierPipeline

    t0 = synth_transcripts(spark, n_convs=50, hot_turns=300)
    pipe = TierPipeline(spark, str(tmp_path / "rw"))
    pipe.run(t0, stages=("hourly", "daily", "monthly"))
    tiers = {t: pipe.read_tier(t) for t in ("hourly", "daily", "monthly")}
    lo, hi = datetime(2026, 1, 5, 7), datetime(2026, 3, 18, 19)
    assert any(t == "monthly" for t, _, _ in split_range(lo, hi))

    got = (
        rewrite_range_agg(tiers, lo, hi)
        .toPandas()
        .sort_values("conv_id", ignore_index=True)
    )
    raw = (
        t0.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length("text").cast("long")).alias("token_sum"),
            F.min(F.length("text").cast("long")).alias("token_min"),
            F.max(F.length("text").cast("long")).alias("token_max"),
            F.sum(F.col("tool").isNotNull().cast("long")).alias("tool_sum"),
        )
        .toPandas()
        .sort_values("conv_id", ignore_index=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got[raw.columns], raw)


def test_rewrite_distinct_estimate_identical_to_raw_sketch(spark, tmp_path):
    """HLL range-rewrite: the union of span-matched tier sketches must be
    estimate-IDENTICAL to one sketch built over the raw rows of the range
    (register-max associativity — rewriting costs zero extra error), and
    within the lgK=12 rsd of exact distinct."""
    from engine.pipeline import TierPipeline
    from engine.rewrite import rewrite_range_distinct
    from engine.rollup import HLL_LGK

    t0 = synth_transcripts(spark, n_convs=50, hot_turns=300)
    pipe = TierPipeline(
        spark, str(tmp_path / "rwd"), sketch_cols=["tool"]
    )
    pipe.run(t0, stages=("hourly", "daily", "monthly"))
    tiers = {t: pipe.read_tier(t) for t in ("hourly", "daily", "monthly")}
    lo, hi = datetime(2026, 1, 5, 7), datetime(2026, 3, 18, 19)
    assert any(t == "monthly" for t, _, _ in split_range(lo, hi))

    got = {
        r["conv_id"]: r["tool_distinct_est"]
        for r in rewrite_range_distinct(tiers, lo, hi, "tool").collect()
    }
    in_range = t0.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
    direct = {
        r["conv_id"]: r["est"]
        for r in in_range.groupBy("conv_id")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("tool", F.lit(HLL_LGK))
            ).alias("est")
        )
        .collect()
    }
    assert got == direct  # estimate-identical, not merely close
    exact = {
        r["conv_id"]: r["n"]
        for r in in_range.groupBy("conv_id")
        .agg(F.count_distinct("tool").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, e in got.items():
        assert abs(e - exact[k]) <= max(1.0, 0.08 * exact[k]), (k, e, exact[k])


def test_rewrite_distinct_requires_sketch_column(spark, tmp_path):
    from engine.pipeline import TierPipeline
    from engine.rewrite import rewrite_range_distinct

    t0 = synth_transcripts(spark, n_convs=5, hot_turns=50)
    pipe = TierPipeline(spark, str(tmp_path / "nos"))
    pipe.run(t0, stages=("hourly",))
    tiers = {"hourly": pipe.read_tier("hourly")}
    with pytest.raises(ValueError, match="no sketch column"):
        rewrite_range_distinct(
            tiers, datetime(2026, 1, 5, 7), datetime(2026, 1, 5, 9), "tool"
        )


def test_range_variance_requires_sumsq_state(spark):
    """rewrite_range_variance refuses tiers built without the Σx² state
    instead of silently emitting nulls."""
    from datetime import datetime

    import pytest as _pytest

    from engine.rewrite import rewrite_range_variance
    from engine.rollup import build_tiers
    from engine.synth import synth_transcripts

    tiers = build_tiers(synth_transcripts(spark, n_convs=5, hot_turns=50))
    with _pytest.raises(ValueError, match="sumsq"):
        rewrite_range_variance(
            tiers, datetime(2024, 1, 1, 0), datetime(2024, 2, 1, 0)
        )


def test_realtime_rewrite_straddles_watermark(spark, tmp_path):
    """Tiers materialized only below the watermark + raw tail above ==
    direct raw aggregation over the whole range, for straddling, pure-tier,
    and pure-tail ranges; misaligned watermark refused; a materializer that
    ran AHEAD of the watermark is excluded (no double count)."""
    import pandas as pd

    from engine.pipeline import TierPipeline
    from engine.rewrite import rewrite_range_agg_realtime

    t0 = synth_transcripts(spark, n_convs=40, hot_turns=300)
    wm = datetime(2026, 2, 10)
    pipe = TierPipeline(spark, str(tmp_path / "rt"))
    pipe.run(
        t0.filter(F.col("ts").cast("timestamp_ntz") < F.lit(wm)),
        stages=("hourly", "daily", "monthly"),
    )
    tiers = {t: pipe.read_tier(t) for t in ("hourly", "daily", "monthly")}

    def raw_agg(lo, hi):
        return (
            t0.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
            .groupBy("conv_id")
            .agg(
                F.count("*").alias("n_turns"),
                F.sum(F.length("text").cast("long")).alias("token_sum"),
                F.min(F.length("text").cast("long")).alias("token_min"),
                F.max(F.length("text").cast("long")).alias("token_max"),
                F.sum(F.col("tool").isNotNull().cast("long")).alias("tool_sum"),
            )
            .toPandas()
            .sort_values("conv_id", ignore_index=True)
        )

    cases = [
        (datetime(2026, 1, 5, 7), datetime(2026, 2, 14, 19)),  # straddles
        (datetime(2026, 1, 5, 7), datetime(2026, 2, 1, 3)),  # pure tier
        (datetime(2026, 2, 10), datetime(2026, 2, 14, 19)),  # pure tail
        (datetime(2026, 2, 9, 23), datetime(2026, 2, 10, 1)),  # 1h each side
    ]
    for lo, hi in cases:
        got = (
            rewrite_range_agg_realtime(tiers, t0, lo, hi, wm)
            .toPandas()
            .sort_values("conv_id", ignore_index=True)
        )
        raw = raw_agg(lo, hi)
        pd.testing.assert_frame_equal(got[raw.columns], raw, obj=f"{lo}-{hi}")

    with pytest.raises(ValueError, match="hour-aligned"):
        rewrite_range_agg_realtime(
            tiers, t0, cases[0][0], cases[0][1], datetime(2026, 2, 10, 0, 30)
        )

    # ran-ahead materializer: tiers built over ALL data, watermark in the
    # middle — tier rows at/after the watermark must be ignored, the raw
    # tail used instead, and the answer unchanged
    tiers_ahead = {
        t: pipe.read_tier(t) for t in ("hourly", "daily", "monthly")
    }
    pipe2 = TierPipeline(spark, str(tmp_path / "rt2"))
    pipe2.run(t0, stages=("hourly", "daily", "monthly"))
    tiers_ahead = {t: pipe2.read_tier(t) for t in ("hourly", "daily", "monthly")}
    lo, hi = cases[0]
    got = (
        rewrite_range_agg_realtime(tiers_ahead, t0, lo, hi, wm)
        .toPandas()
        .sort_values("conv_id", ignore_index=True)
    )
    raw = raw_agg(lo, hi)
    pd.testing.assert_frame_equal(got[raw.columns], raw)


def test_rewrite_range_freq_multimonth_and_refusal(spark, tmp_path):
    """Top-k-from-tiers over a range using all five span kinds equals raw
    counting (full deterministic tiebreak); tiers without freq state are
    refused loudly."""
    import pandas as pd

    from engine.pipeline import TierPipeline
    from engine.rewrite import rewrite_range_freq

    t0 = synth_transcripts(spark, n_convs=30, hot_turns=200)
    pipe = TierPipeline(spark, str(tmp_path / "fq"), freq_cols=["tool"])
    pipe.run(t0, stages=("hourly", "daily", "monthly"))
    tiers = {t: pipe.read_tier(t) for t in ("hourly", "daily", "monthly")}
    lo, hi = datetime(2026, 1, 5, 7), datetime(2026, 3, 18, 19)
    assert any(t == "monthly" for t, _, _ in split_range(lo, hi))

    got = (
        rewrite_range_freq(tiers, lo, hi, "tool", k=2)
        .toPandas()
        .sort_values(["conv_id", "rank"], ignore_index=True)
    )
    from pyspark.sql import Window

    raw_counts = (
        t0.filter(
            (F.col("ts") >= F.lit(lo))
            & (F.col("ts") < F.lit(hi))
            & F.col("tool").isNotNull()
        )
        .groupBy("conv_id", F.col("tool").alias("value"))
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("conv_id").orderBy(F.desc("n"), "value")
    exp = (
        raw_counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 2)
        .select("conv_id", "rank", "value", "n")
        .toPandas()
        .sort_values(["conv_id", "rank"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp)

    plain = build_tiers(t0)
    with pytest.raises(ValueError, match="no freq column"):
        rewrite_range_freq(plain, lo, hi, "tool").collect()


def test_rewrite_range_hh_bounds_and_exact_regime(spark, tmp_path):
    """Bounded heavy hitters from tier state over a multi-span range:
    (a) truncating regime (cap=2): for every served value
    est ≤ true ≤ est + err_bound, n_total equals the raw non-null count,
    and every value with true count > n_total/(cap+1) is served within
    top-cap; (b) exact regime (cap ≥ cardinality): est == true, err == 0,
    ranking identical to rewrite_range_freq; (c) missing state refused."""
    from engine.pipeline import TierPipeline
    from engine.rewrite import rewrite_range_freq, rewrite_range_hh

    t0 = synth_transcripts(spark, n_convs=30, hot_turns=200)
    lo, hi = datetime(2026, 1, 5, 7), datetime(2026, 3, 18, 19)

    pipe = TierPipeline(
        spark, str(tmp_path / "hh"), hh_cols={"tool": 2, "role": 32}
    )
    pipe.run(t0, stages=("hourly", "daily", "monthly"))
    tiers = {t: pipe.read_tier(t) for t in ("hourly", "daily", "monthly")}

    raw = (
        t0.filter(
            (F.col("ts") >= F.lit(lo))
            & (F.col("ts") < F.lit(hi))
            & F.col("tool").isNotNull()
        )
        .groupBy("conv_id", "tool")
        .count()
        .collect()
    )
    truth: dict = {}
    for r in raw:
        truth.setdefault(r["conv_id"], {})[r["tool"]] = r["count"]

    served = rewrite_range_hh(tiers, lo, hi, "tool", cap=2, k=2).collect()
    assert served
    per_conv: dict = {}
    for r in served:
        per_conv.setdefault(r["conv_id"], []).append(r)
    for conv, rows in per_conv.items():
        t = truth[conv]
        n_total = rows[0]["n_total"]
        assert n_total == sum(t.values()), conv
        for r in rows:
            tv = t.get(r["value"], 0)
            assert r["est"] <= tv <= r["est"] + r["err_bound"], (conv, r)
        served_vals = {r["value"] for r in rows}
        for v, tv in t.items():
            if tv > n_total / 3.0:  # cap+1
                assert v in served_vals, (conv, v, "false dismissal")

    # exact regime on role (cardinality << 32): equals the freq rewrite
    pipe2 = TierPipeline(spark, str(tmp_path / "fr"), freq_cols=["role"])
    pipe2.run(t0, stages=("hourly", "daily", "monthly"))
    tiers2 = {t: pipe2.read_tier(t) for t in ("hourly", "daily", "monthly")}
    exact = {
        (r["conv_id"], r["rank"]): (r["value"], r["n"])
        for r in rewrite_range_freq(tiers2, lo, hi, "role", k=3).collect()
    }
    hh = rewrite_range_hh(tiers, lo, hi, "role", cap=32, k=3).collect()
    got = {(r["conv_id"], r["rank"]): (r["value"], r["est"]) for r in hh}
    assert got == exact
    assert all(r["err_bound"] == 0 for r in hh)

    with pytest.raises(ValueError, match="no hh column"):
        rewrite_range_hh(build_tiers(t0), lo, hi, "tool", cap=2).collect()
