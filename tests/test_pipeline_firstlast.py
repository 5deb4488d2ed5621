"""Exact first/last (open/close) tier state (`firstlast_cols`) through the
FULL TierPipeline: bit-exact under salting and tier composition (carried
unique order keys, engine/rollup.py firstlast_partial_aggs), carried by the
LOCF densifier, and enabled on an existing root as a one-time
fingerprint-gated migration — the same schema-evolution story as hist_cols."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window  # noqa: E402
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


def _fl(df):
    return {
        (r["conv_id"], r["bucket_start"]): (
            r["token_count_first"],
            r["token_count_last"],
        )
        for r in df.select(
            "conv_id", "bucket_start", "token_count_first", "token_count_last"
        ).collect()
    }


def test_firstlast_composition_and_salting_bit_exact(spark, t0, tmp_path):
    """Pipeline (salted) == direct build_tiers (unsalted) == brute force
    window over raw, at every tier — values compared exactly."""
    pipe = TierPipeline(
        spark, str(tmp_path / "fl"), salted=True, firstlast_cols=COLS
    )
    pipe.run(t0)
    direct = build_tiers(t0, firstlast_cols=COLS)
    for tier in ("hourly", "daily", "monthly"):
        got = observed_state(pipe.read_tier(tier))
        assert _fl(got) == _fl(direct[tier]), tier

    # brute force from raw: value at the min/max (ts, turn_idx) per month
    w = Window.partitionBy(
        "conv_id", F.date_trunc("month", "ts").cast("timestamp_ntz")
    ).orderBy("ts", "turn_idx")
    wd = Window.partitionBy(
        "conv_id", F.date_trunc("month", "ts").cast("timestamp_ntz")
    ).orderBy(F.desc("ts"), F.desc("turn_idx"))
    raw = {
        (r["conv_id"], r["m"]): (r["f"], r["l"])
        for r in t0.withColumn("tc", F.length("text").cast("long"))
        .withColumn("rn_a", F.row_number().over(w))
        .withColumn("rn_d", F.row_number().over(wd))
        .groupBy(
            "conv_id",
            F.date_trunc("month", "ts").cast("timestamp_ntz").alias("m"),
        )
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("tc"))).alias("f"),
            F.max(F.when(F.col("rn_d") == 1, F.col("tc"))).alias("l"),
        )
        .collect()
    }
    assert _fl(pipe.read_tier("monthly")) == raw


def test_firstlast_locf_densify_carries_values(spark, t0, tmp_path):
    """Gap rows in the hourly tier copy the previous observed first/last
    values (state LOCF), flagged filled and excluded from upper tiers."""
    pipe = TierPipeline(spark, str(tmp_path / "f"), firstlast_cols=COLS)
    pipe.run(t0, stages=("hourly",))
    hourly = pipe.read_tier("hourly")
    filled = hourly.filter(F.col("filled"))
    if filled.isEmpty():
        pytest.skip("synth produced no intra-day gaps")
    rows = hourly.select(
        "conv_id", "bucket_start", "filled",
        "token_count_first", "token_count_last",
    ).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["conv_id"], []).append(r)
    checked = 0
    for conv, rs in by_key.items():
        rs.sort(key=lambda r: r["bucket_start"])
        last_obs = None
        for r in rs:
            if not r["filled"]:
                last_obs = r
            else:
                assert last_obs is not None
                assert r["token_count_first"] == last_obs["token_count_first"]
                assert r["token_count_last"] == last_obs["token_count_last"]
                checked += 1
    assert checked > 0


def test_firstlast_enable_is_one_time_migration(spark, t0, tmp_path):
    """Turning firstlast_cols on over an existing root re-rolls the tier
    cascade exactly once; a second run is a full no-op; pre-existing state
    is unchanged by the migration."""
    root = str(tmp_path / "m")
    plain = TierPipeline(spark, root)
    plain.run(t0)
    assert "token_count_first" not in plain.read_tier("hourly").columns

    mig = TierPipeline(spark, root, firstlast_cols=COLS)
    res = mig.run(t0)
    assert res["stages"]["hourly"] > 0
    assert res["stages"]["daily"] > 0 and res["stages"]["monthly"] > 0
    for tier in ("hourly", "daily", "monthly"):
        cols = mig.read_tier(tier).columns
        assert "token_count_first" in cols and "fl_k_last" in cols, tier

    res2 = TierPipeline(spark, root, firstlast_cols=COLS).run(t0)
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
