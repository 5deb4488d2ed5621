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


def _sessions_pdf(df):
    return (
        df.toPandas()
        .sort_values(["conv_id", "session_id"], ignore_index=True)
        .reindex(sorted(df.columns), axis=1)
    )


def _sessions_unsalted(df, key, ts_col, order_cols):
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(ts_col, *order_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    new_s = F.when(
        F.lag(ts_col).over(w).isNull()
        | (us - F.lag(us).over(w) > 30 * 60 * 1_000_000),
        1,
    ).otherwise(0)
    s = df.withColumn("new_s", new_s).withColumn(
        "session_id",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return s.groupBy(key, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    )


@pytest.mark.parametrize("slice_interval", ["6 hours", "1 day", "15 minutes"])
def test_session_islands_salted_parity(spark, t0, slice_interval):
    """Salted sessionization == unsalted on the Zipf-hot transcript table,
    including slices NARROWER than the 30-min gap (pass 2 re-merges across
    any number of empty slices)."""
    from engine.skew import session_islands_salted

    plain = _sessions_pdf(
        _sessions_unsalted(t0, "conv_id", "ts", ("turn_idx",))
    )
    salted = _sessions_pdf(
        session_islands_salted(
            t0, key="conv_id", ts_col="ts", order_cols=("turn_idx",),
            gap_minutes=30, slice_interval=slice_interval,
        )
    )
    assert plain.equals(salted), slice_interval


def test_session_islands_salted_plan_slices_event_window(spark, t0):
    """The event-level window must partition on (key, slice) — the hot
    key's events never funnel through one reducer — and the island-group
    aggregate must reuse that partitioning (no extra event-level exchange:
    exactly one exchange mentions _slice)."""
    from engine.skew import session_islands_salted

    p = (
        session_islands_salted(
            t0, key="conv_id", ts_col="ts", order_cols=("turn_idx",)
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "_slice" in p
    n_slice_exchanges = sum(
        1 for line in p.splitlines()
        if "Exchange" in line and "_slice" in line
    )
    assert n_slice_exchanges == 1, p
