"""Exact sum-of-squares tier state (`sumsq_cols`) through the FULL
TierPipeline: Σx² composes by long addition across tiers and salts, so it
must be bit-exact vs a direct unsalted build AND vs brute force from raw;
the LOCF densifier carries it; enabling it on an existing root is a
one-time fingerprint-gated migration (same story as hist_cols)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.pipeline import TierPipeline  # noqa: E402
from engine.rollup import build_tiers, observed_state  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402

COLS = ["token_count"]


@pytest.fixture(scope="module")
def t0(spark):
    df = synth_transcripts(spark, n_convs=30, hot_turns=200)
    df.cache().count()
    return df


def _state(df, col="token_count_sumsq"):
    return {
        (r["conv_id"], r["bucket_start"]): r[col]
        for r in df.select("conv_id", "bucket_start", col).collect()
    }


def test_sumsq_composition_and_salting_bit_exact(spark, t0, tmp_path):
    """Pipeline (salted) == direct build_tiers (unsalted) == brute force
    Σ(len(text)²) from raw, at every tier — long equality, no tolerance."""
    pipe = TierPipeline(
        spark, str(tmp_path / "q"), salted=True, sumsq_cols=COLS
    )
    pipe.run(t0)
    direct = build_tiers(t0, sumsq_cols=COLS)
    for tier in ("hourly", "daily", "monthly"):
        got = _state(observed_state(pipe.read_tier(tier)))
        assert got == _state(direct[tier]), tier

    raw = {
        (r["conv_id"], r["m"]): r["q"]
        for r in t0.groupBy(
            "conv_id",
            F.date_trunc("month", "ts").cast("timestamp_ntz").alias("m"),
        )
        .agg(
            F.sum(
                F.length("text").cast("long") * F.length("text").cast("long")
            ).alias("q")
        )
        .collect()
    }
    assert _state(observed_state(pipe.read_tier("monthly"))) == raw


def test_sumsq_locf_densify_carries_state(spark, t0, tmp_path):
    """Gap rows in the hourly tier copy the previous observed Σx² (state
    LOCF), flagged filled and excluded from upper tiers."""
    pipe = TierPipeline(spark, str(tmp_path / "f"), sumsq_cols=COLS)
    pipe.run(t0, stages=("hourly",))
    hourly = pipe.read_tier("hourly")
    if hourly.filter(F.col("filled")).isEmpty():
        pytest.skip("synth produced no intra-day gaps")
    rows = hourly.select(
        "conv_id", "bucket_start", "filled", "token_count_sumsq"
    ).collect()
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    checked = 0
    for rs in by_conv.values():
        rs.sort(key=lambda r: r["bucket_start"])
        last = None
        for r in rs:
            if not r["filled"]:
                last = r
            else:
                assert last is not None
                assert r["token_count_sumsq"] == last["token_count_sumsq"]
                checked += 1
    assert checked > 0


def test_sumsq_enable_is_one_time_migration(spark, t0, tmp_path):
    """Turning sumsq_cols on over an existing root re-rolls the tier
    cascade exactly once; a second run is a full no-op; pre-existing state
    is unchanged."""
    root = str(tmp_path / "m")
    plain = TierPipeline(spark, root)
    plain.run(t0)
    assert "token_count_sumsq" not in plain.read_tier("hourly").columns

    mig = TierPipeline(spark, root, sumsq_cols=COLS)
    res = mig.run(t0)
    assert res["stages"]["hourly"] > 0
    assert res["stages"]["daily"] > 0 and res["stages"]["monthly"] > 0
    for tier in ("hourly", "daily", "monthly"):
        assert "token_count_sumsq" in mig.read_tier(tier).columns, tier

    res2 = TierPipeline(spark, root, sumsq_cols=COLS).run(t0)
    assert all(v == 0 for v in res2["stages"].values()), res2
    direct = build_tiers(t0)
    got = {
        (r["conv_id"], r["bucket_start"]): r["n_turns"]
        for r in observed_state(mig.read_tier("monthly")).collect()
    }
    exp = {
        (r["conv_id"], r["bucket_start"]): r["n_turns"]
        for r in direct["monthly"].collect()
    }
    assert got == exp


def test_sumprod_composition_and_salting_bit_exact(spark, t0, tmp_path):
    """Cross-product state Σxy (token_count · is_tool): salted pipeline ==
    brute force from raw at the monthly tier — long equality."""
    pipe = TierPipeline(
        spark,
        str(tmp_path / "xp"),
        salted=True,
        sumprod_cols=[("token_count", "is_tool")],
        fill_tiers=False,
    )
    pipe.run(t0)
    got = _state(
        observed_state(pipe.read_tier("monthly")),
        col="token_count_x_is_tool_sumprod",
    )
    raw = {
        (r["conv_id"], r["m"]): r["q"]
        for r in t0.groupBy(
            "conv_id",
            F.date_trunc("month", "ts").cast("timestamp_ntz").alias("m"),
        )
        .agg(
            F.sum(
                F.length("text").cast("long")
                * F.col("tool").isNotNull().cast("long")
            ).alias("q")
        )
        .collect()
    }
    assert got == raw
