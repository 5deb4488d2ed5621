"""Salting correctness (SURVEY.md §5 / M8): salted two-phase rollup must be
bit-identical to the unsalted path (algebraic aggregates compose)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.rollup import STATE_COLS, rollup_hourly, tier_view  # noqa: E402
from engine.skew import hot_conversations, rollup_hourly_salted  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402

KEY = ["conv_id", "bucket_start"]


@pytest.fixture(scope="module")
def t0(spark):
    df = synth_transcripts(spark, n_convs=150, hot_turns=2000)  # strong skew
    df.cache().count()
    return df


def test_input_is_skewed(t0):
    hot = hot_conversations(t0, top_k=1).collect()[0]
    assert hot["share"] > 0.2  # hottest conversation >20% of all turns


@pytest.mark.parametrize("n_salts", [4, 16])
def test_salted_equals_unsalted(spark, t0, n_salts):
    plain = (
        rollup_hourly(t0)
        .select(*KEY, *STATE_COLS)
        .toPandas()
        .sort_values(KEY, ignore_index=True)
    )
    salted = (
        rollup_hourly_salted(t0, n_salts=n_salts)
        .select(*KEY, *STATE_COLS)
        .toPandas()
        .sort_values(KEY, ignore_index=True)
    )
    assert plain.equals(salted)


def test_salted_view_identical(spark, t0):
    a = tier_view(rollup_hourly(t0), "hourly").toPandas().sort_values(
        KEY, ignore_index=True
    )
    b = tier_view(rollup_hourly_salted(t0), "hourly").toPandas().sort_values(
        KEY, ignore_index=True
    )
    assert a.equals(b)


def test_salt_spreads_hot_key(spark, t0):
    """The phase-1 aggregate must actually split the hot conversation."""
    from engine.bucket import with_metrics

    hot_id = hot_conversations(t0, top_k=1).collect()[0]["conv_id"]
    df = with_metrics(t0).withColumn(
        "_salt", F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(16))
    )
    n_groups = (
        df.filter(F.col("conv_id") == hot_id).select("_salt").distinct().count()
    )
    assert n_groups == 16
