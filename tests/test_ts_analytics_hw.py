"""M95 phase-decomposed Holt-Winters: the Spark output must equal the
literal per-phase Brown recurrence, and the next-period recombination must
carry each phase's final state forward by exactly one period."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datetime import datetime, timedelta  # noqa: E402

from engine.ts_analytics import (  # noqa: E402
    HOLT_ALPHA,
    HW_PERIOD,
    holtwinters_additive_hourly,
    hw_additive_phase,
    hw_next_period_forecast,
)

SF_DIR = "/root/testdata/sf0.001"


def _recurrence(vals):
    a = HOLT_ALPHA
    out = []
    s1 = s2 = None
    for v in vals:
        if s1 is None:
            s1 = s2 = v
        else:
            s1 = a * v + (1 - a) * s1
            s2 = a * s1 + (1 - a) * s2
        level = 2 * s1 - s2
        trend = a / (1 - a) * (s1 - s2)
        out.append((level, trend, level + trend))
    return out


def test_hw_matches_per_phase_recurrence(spark):
    got = holtwinters_additive_hourly(spark, SF_DIR).toPandas()
    assert len(got) > 0
    checked = 0
    for (_uid, _ph), g in got.groupby(["user_id", "phase"]):
        g = g.sort_values("bucket", ignore_index=True)
        want = _recurrence(g["v"].tolist())
        for i, (lv, tr, fc) in enumerate(want):
            assert abs(lv - g["level"][i]) < 1e-9
            assert abs(tr - g["trend"][i]) < 1e-9
            assert abs(fc - g["forecast_next"][i]) < 1e-9
        checked += 1
    assert checked >= 10


def test_hw_phase_is_hour_of_day(spark):
    got = holtwinters_additive_hourly(spark, SF_DIR).toPandas()
    assert (got["phase"] == got["bucket"].dt.hour).all()


def test_hw_seasonal_shape_tracked(spark):
    """A pure 24h-periodic series with per-phase linear drift is forecast
    (near-)exactly: each phase sees its own arithmetic progression, which
    Holt level+trend locks onto."""
    base = datetime(2024, 1, 1)
    rows = []
    for d in range(30):
        for h in range(24):
            # seasonal base 10*h, plus drift 2.0/day on every phase
            rows.append((1, base + timedelta(days=d, hours=h), 10.0 * h + 2.0 * d))
    df = spark.createDataFrame(rows, "user_id bigint, bucket timestamp, v double")
    dec = hw_additive_phase(df, ["user_id"], "bucket", "v")
    fc = {
        r["phase"]: (r["forecast"], r["forecast_bucket"])
        for r in hw_next_period_forecast(dec, ["user_id"], "bucket").collect()
    }
    assert len(fc) == 24
    for h in range(24):
        want = 10.0 * h + 2.0 * 30  # day-30 value of this phase
        got, when = fc[h]
        assert when == base + timedelta(days=30, hours=h)
        # the geometric ewm tail bias is bounded; trend captures the drift
        assert abs(got - want) < 0.2, (h, got, want)


def test_hw_next_period_rows_align_with_last_observation(spark):
    got = holtwinters_additive_hourly(spark, SF_DIR)
    fc = hw_next_period_forecast(got, ["user_id"], "bucket").toPandas()
    dec = got.toPandas()
    last = (
        dec.sort_values("bucket")
        .groupby(["user_id", "phase"])
        .tail(1)
        .set_index(["user_id", "phase"])
    )
    for row in fc.itertuples():
        lr = last.loc[(row.user_id, row.phase)]
        assert row.forecast == lr["forecast_next"]
        assert (row.forecast_bucket - lr["bucket"]).total_seconds() == 3600 * HW_PERIOD


def test_hw_next_period_bucket_tracks_custom_period(spark):
    """ADVICE r5: with period != 24 the forecast bucket must be the phase's
    NEXT occurrence (last + period hours), not a hardcoded 24h step."""
    from engine import io as eio

    e = eio.read_table(spark, SF_DIR, "events")
    from pyspark.sql import functions as F

    from engine.ts_analytics import cents, hw_additive_phase

    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("bucket")
    ).agg((F.sum(cents(F.col("value"))) / 100.0).alias("v"))
    period = 12
    dec = hw_additive_phase(hourly, ["user_id"], "bucket", "v", period=period)
    fc = hw_next_period_forecast(
        dec, ["user_id"], "bucket", period=period
    ).toPandas()
    last = (
        dec.toPandas()
        .sort_values("bucket")
        .groupby(["user_id", "phase"])
        .tail(1)
        .set_index(["user_id", "phase"])
    )
    assert len(fc)
    for row in fc.itertuples():
        lr = last.loc[(row.user_id, row.phase)]
        assert row.forecast == lr["forecast_next"]
        assert (row.forecast_bucket - lr["bucket"]).total_seconds() == 3600 * period
