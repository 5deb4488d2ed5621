"""M46 arbitrary-grain downsample serving (engine/rollup.py rollup_grain):
N-hour regrouping of tier state equals a direct aggregation of raw at that
grain — for the metric state AND every optional state family — and
whole-day grains regroup the daily tier without changing the answer."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.bucket import with_metrics  # noqa: E402
from engine.kmv import kmv_arrays, kmv_state_col  # noqa: E402
from engine.rollup import build_tiers, rollup_grain  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402


@pytest.fixture(scope="module")
def t0(spark):
    df = synth_transcripts(spark, n_convs=30, hot_turns=200)
    df.cache().count()
    return df


def _grain_bucket(grain_hours):
    span = grain_hours * 3_600_000_000
    micros = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    return F.timestamp_micros(micros - micros % span).cast("timestamp_ntz")


def _direct_from_raw(t0, grain_hours):
    df = with_metrics(t0)
    return {
        (r["conv_id"], r["bucket_start"]): (
            r["n_turns"],
            r["token_sum"],
            r["token_min"],
            r["token_max"],
            r["tool_sum"],
        )
        for r in df.groupBy(
            "conv_id", _grain_bucket(grain_hours).alias("bucket_start")
        )
        .agg(
            F.count("*").alias("n_turns"),
            F.sum("token_count").alias("token_sum"),
            F.min("token_count").alias("token_min"),
            F.max("token_count").alias("token_max"),
            F.sum("is_tool").alias("tool_sum"),
        )
        .collect()
    }


def _got(g):
    return {
        (r["conv_id"], r["bucket_start"]): (
            r["n_turns"],
            r["token_sum"],
            r["token_min"],
            r["token_max"],
            r["tool_sum"],
        )
        for r in g.collect()
    }


@pytest.mark.parametrize("grain", [2, 6, 7, 24, 48])
def test_grain_equals_direct_from_raw(spark, t0, grain):
    """Every grain — including the awkward 7h that never aligns with days
    and the 24h/48h that route through the DAILY tier — must reproduce a
    direct raw aggregation exactly."""
    tiers = build_tiers(t0)
    assert _got(rollup_grain(tiers, grain)) == _direct_from_raw(t0, grain)


def test_day_multiple_grain_uses_daily_tier(spark, t0):
    """24h grain from {hourly-only} vs {daily-only} tier dicts: the
    planner picks daily for day multiples (KeyError if it asked for
    hourly), and both sources give the same rows."""
    tiers = build_tiers(t0)
    from_daily = _got(rollup_grain({"daily": tiers["daily"]}, 24))
    from_hourly = _got(rollup_grain({"hourly": tiers["hourly"]}, 23))
    with pytest.raises(KeyError):
        rollup_grain({"hourly": tiers["hourly"]}, 24)
    assert from_daily == _direct_from_raw(t0, 24)
    assert from_hourly == _direct_from_raw(t0, 23)


def test_grain_carries_state_families(spark, t0):
    """Optional state (KMV here, the newest family) regroups through
    rollup_grain bit-identically to a direct leaf build at that grain."""
    k = 128
    tiers = build_tiers(t0, kmv_cols={"text": k})
    col = kmv_state_col("text", k)
    got = {
        (r["conv_id"], r["bucket_start"]): tuple(r[col])
        for r in rollup_grain(tiers, 6).select(
            "conv_id", "bucket_start", col
        ).collect()
    }
    df = with_metrics(t0).withColumn("bucket_start", _grain_bucket(6))
    want = {
        (r["conv_id"], r["bucket_start"]): tuple(r[col])
        for r in kmv_arrays(
            df, ["conv_id", "bucket_start"], {"text": k}
        ).collect()
    }
    assert got == want


def test_grain_excludes_filled_rows(spark, t0):
    """densified hourly input: copied gap rows must not inflate counts."""
    from engine.rollup import densify_hourly_locf, rollup_hourly

    dense = densify_hourly_locf(rollup_hourly(t0))
    if dense.filter("filled").count() == 0:
        pytest.skip("fixture has no intra-day gaps")
    got = _got(rollup_grain({"hourly": dense}, 6))
    assert got == _direct_from_raw(t0, 6)


def test_grain_validation(spark, t0):
    tiers = build_tiers(t0)
    with pytest.raises(ValueError, match="positive"):
        rollup_grain(tiers, 0)
    with pytest.raises(ValueError, match="positive"):
        rollup_grain(tiers, -6)
