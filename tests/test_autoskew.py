"""Measurement-driven skew dispatch (engine/autoskew.py): the probe sees
Zipf heads and ignores uniform data; `TierPipeline(salted='auto')` routes
accordingly, reports its decision, and — because both paths are
bit-identical — produces exactly the forced-mode bytes either way."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.autoskew import choose_salted, skew_probe  # noqa: E402
from engine.pipeline import TierPipeline  # noqa: E402
from engine.rollup import observed_state  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402

#: toy-scale thresholds: the synth head conv holds ~200 sampled-up rows
TEST_OPTS = {"ratio_threshold": 8.0, "min_hot_rows": 300, "frac": 0.5}


@pytest.fixture(scope="module")
def hot(spark):
    # Zipf(1.1) conversation sizes: head conv ~400 turns, tail ~1
    df = synth_transcripts(spark, n_convs=100, hot_turns=400)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def uniform(spark):
    df = spark.range(0, 8000).select(
        F.concat(F.lit("c-"), (F.col("id") % 80).cast("string")).alias("conv_id"),
        (F.col("id") / 80).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("hello world").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 7).alias("ts"),
    )
    df.cache().count()
    return df


def test_probe_separates_zipf_from_uniform(hot, uniform):
    sh = skew_probe(hot, frac=0.5)
    su = skew_probe(uniform, frac=0.5)
    assert sh["ratio"] > 3 * su["ratio"]
    assert su["ratio"] < 3  # 100 rows/conv everywhere: max ≈ mean
    assert sh["sampled_rows"] > 0 and sh["groups"] > 0


def test_choose_salted_decisions(hot, uniform):
    dec_hot, st_hot = choose_salted(hot, **TEST_OPTS)
    dec_uni, st_uni = choose_salted(uniform, **TEST_OPTS)
    assert dec_hot and not dec_uni
    # absolute floor: relative skew alone must not trigger at toy volume
    dec_floor, _ = choose_salted(hot, ratio_threshold=8.0, min_hot_rows=10**9, frac=0.5)
    assert not dec_floor


def test_empty_input_stays_plain(spark):
    empty = spark.createDataFrame([], "conv_id string, ts timestamp")
    dec, st = choose_salted(empty, frac=0.5)
    assert not dec and st["hot_est"] == 0


def _tier_state(pipe, tier):
    df = observed_state(pipe.read_tier(tier))
    cols = sorted(df.columns)
    return sorted(map(tuple, df.select(*cols).collect()))


@pytest.mark.parametrize("case", ["hot", "uniform"])
def test_auto_pipeline_matches_forced_and_reports(
    spark, hot, uniform, tmp_path, case
):
    t0 = hot if case == "hot" else uniform
    auto = TierPipeline(
        spark, str(tmp_path / "auto"), salted="auto", auto_salt_opts=TEST_OPTS
    )
    rep = auto.run(t0)
    decision = rep["scans"]["salt_auto"]
    want_mode = "salted" if case == "hot" else "plain"
    assert decision.startswith(want_mode), decision

    forced = TierPipeline(
        spark, str(tmp_path / "forced"), salted=(case == "hot")
    )
    forced.run(t0)
    for tier in ("hourly", "daily", "monthly"):
        assert _tier_state(auto, tier) == _tier_state(forced, tier), tier


def test_bad_mode_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        TierPipeline(spark, str(tmp_path / "x"), salted="maybe")
