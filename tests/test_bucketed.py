"""Bucketed-table co-location (L5 scale path): the conv_id shuffle is paid
once at write time; joins and aggregations on the bucket key then plan with
zero Exchange operators. Results must equal the plain shuffled join."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.bucketed import cogroup_join, read_bucketed, write_bucketed  # noqa: E402
from engine.rollup import rollup_hourly  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    t0 = synth_transcripts(spark, n_convs=200, hot_turns=2000, partitions=4)
    hourly = rollup_hourly(t0)
    daily_keys = (
        hourly.groupBy("conv_id")
        .agg(F.count("*").alias("n_hours"), F.sum("n_turns").alias("n_turns"))
    )
    write_bucketed(
        hourly, "hourly_b", n_buckets=8,
        sort_cols=("conv_id", "bucket_start"),
        path=str(base / "hourly_b"),
    )
    write_bucketed(
        daily_keys, "convstats_b", n_buckets=8, sort_cols=("conv_id",),
        path=str(base / "convstats_b"),
    )
    yield hourly, daily_keys
    spark.sql("DROP TABLE IF EXISTS hourly_b")
    spark.sql("DROP TABLE IF EXISTS convstats_b")


def _executed(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # disable auto-broadcast so the planner faces the genuine large⨝large
    # case bucketing exists for (at 100 TB neither side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cogroup_join(spark, "hourly_b", "convstats_b", on=["conv_id"])
        plan = _executed(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan


def test_bucketed_join_matches_shuffled_join(spark, bucketed_tables):
    hourly, daily_keys = bucketed_tables
    expected = hourly.join(daily_keys, on=["conv_id"]).count()
    got = cogroup_join(spark, "hourly_b", "convstats_b", on=["conv_id"]).count()
    assert got == expected and got > 0


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    agg = (
        read_bucketed(spark, "hourly_b")
        .groupBy("conv_id")
        .agg(F.sum("n_turns").alias("n_turns"))
    )
    plan = _executed(agg)
    assert "Exchange" not in plan, plan


def test_bucketed_groupby_matches_shuffled(spark, bucketed_tables):
    hourly, _ = bucketed_tables
    expected = {
        r["conv_id"]: r["s"]
        for r in hourly.groupBy("conv_id")
        .agg(F.sum("n_turns").alias("s"))
        .collect()
    }
    got = {
        r["conv_id"]: r["s"]
        for r in read_bucketed(spark, "hourly_b")
        .groupBy("conv_id")
        .agg(F.sum("n_turns").alias("s"))
        .collect()
    }
    assert got == expected


def test_unbucketed_join_does_exchange(spark, bucketed_tables):
    """Control: the same join off plain DataFrames shuffles — proving the
    bucketed-plan assertion isn't vacuous (e.g. via a broadcast)."""
    hourly, daily_keys = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _executed(hourly.join(daily_keys, on=["conv_id"]))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "Exchange" in plan
