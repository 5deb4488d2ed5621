"""Changelog-driven incremental consumer (engine/incremental.py): the
serving summary refreshes from ONLY the hourly partitions the snapshot
diff reports, stays equal to a full recompute under late-data re-rolls and
retention drops, and degrades to a full rebuild when GC expired its
consumed snapshot."""

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.incremental import IncrementalConvSummary  # noqa: E402
from engine.pipeline import TierPipeline  # noqa: E402
from engine.rollup import observed_state  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402


@pytest.fixture(scope="module")
def t0(spark):
    df = synth_transcripts(spark, n_convs=30, hot_turns=150)
    df.cache().count()
    return df


def _full_recompute(pipe):
    h = observed_state(pipe.read_tier("hourly"))
    return (
        h.groupBy("conv_id")
        .agg(
            F.sum("n_turns").alias("n_turns"),
            F.sum("token_sum").alias("token_sum"),
            F.min("token_min").alias("token_min"),
            F.max("token_max").alias("token_max"),
            F.max("bucket_start").alias("last_active"),
        )
        .toPandas()
        .sort_values("conv_id", ignore_index=True)
    )


def _got(cons):
    return cons.read().toPandas().sort_values("conv_id", ignore_index=True)


def test_incremental_refresh_tracks_full_recompute(spark, t0, tmp_path):
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0, stages=("hourly",))
    cons = IncrementalConvSummary(pipe, str(tmp_path / "serve"))
    assert cons.refresh()["mode"] == "full"
    pd.testing.assert_frame_equal(
        _got(cons)[_full_recompute(pipe).columns], _full_recompute(pipe)
    )
    assert cons.refresh()["mode"] == "noop"

    # late data touches exactly one conversation's days: the refresh must
    # consume only those days, and track the full recompute
    late = t0.filter("conv_id = 'conv-00000000'").selectExpr(
        "conv_id", "cast(turn_idx + 100000 as int) as turn_idx",
        "role", "text", "tool", "ts + interval 30 minutes as ts",
    )
    pipe.run(t0.unionByName(late), stages=("hourly",))
    r = cons.refresh()
    assert r["mode"] == "incremental"
    late_days = {
        str(x["d"])
        for x in late.selectExpr("to_date(ts) as d").distinct().collect()
    }
    assert set(r["days"]) <= late_days and r["days"]
    pd.testing.assert_frame_equal(
        _got(cons)[_full_recompute(pipe).columns], _full_recompute(pipe)
    )


def test_incremental_propagates_retention_and_survives_gc(spark, t0, tmp_path):
    from engine.retention import (
        drop_hourly_partitions,
        droppable_hourly_days,
        expire_snapshots,
    )

    pipe = TierPipeline(spark, str(tmp_path / "p2"), snapshots=True)
    pipe.run(t0)
    cons = IncrementalConvSummary(pipe, str(tmp_path / "serve2"))
    cons.refresh()
    days = droppable_hourly_days(pipe, "9999-12-31")
    drop_hourly_partitions(pipe, days[:2], run_id="ret")
    r = cons.refresh()
    assert r["mode"] == "incremental" and r["removed"] == 2
    pd.testing.assert_frame_equal(
        _got(cons)[_full_recompute(pipe).columns], _full_recompute(pipe)
    )
    # GC races the consumer: expire everything but the newest snapshot,
    # then change data -> refresh degrades to a correct full rebuild
    late = t0.filter("conv_id = 'conv-00000001'").selectExpr(
        "conv_id", "cast(turn_idx + 200000 as int) as turn_idx",
        "role", "text", "tool", "ts + interval 45 minutes as ts",
    )
    pipe.run(t0.unionByName(late))
    expire_snapshots(pipe, keep_last=1)
    r2 = cons.refresh()
    assert r2["mode"] == "full"
    pd.testing.assert_frame_equal(
        _got(cons)[_full_recompute(pipe).columns], _full_recompute(pipe)
    )
