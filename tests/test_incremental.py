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


def _sliding_full(pipe, w):
    from engine.sliding import sliding_state

    return (
        sliding_state(observed_state(pipe.read_tier("hourly")), w)
        .drop("bucket_date")
        .toPandas()
        .sort_values(["conv_id", "bucket_start"], ignore_index=True)
    )


def _sliding_got(view):
    df = view.read().toPandas()
    cols = [c for c in df.columns]
    return df.sort_values(["conv_id", "bucket_start"], ignore_index=True)[cols]


def test_sliding_view_midnight_spillover_and_parity(spark, tmp_path):
    """M88: a changed day D must also refresh early-next-day buckets whose
    trailing frames reach back into D — and stay bit-equal to a full
    sliding_state recompute."""
    from datetime import datetime

    from engine.incremental import IncrementalSlidingView

    def mk(rows):
        return spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string,"
            " tool string, ts timestamp_ntz",
        )

    base = mk([
        ("c", 0, "user", "xxxx", None, datetime(2024, 1, 1, 22, 0)),
        ("c", 1, "user", "yy", None, datetime(2024, 1, 2, 1, 0)),
        ("c", 2, "user", "z", None, datetime(2024, 1, 5, 12, 0)),
    ])
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(base, stages=("hourly",))
    view = IncrementalSlidingView(pipe, str(tmp_path / "sv"), window_hours=6)
    assert view.lookback_days == 1
    assert view.refresh()["mode"] == "full"
    import pandas as pd

    full = _sliding_full(pipe, 6)
    pd.testing.assert_frame_equal(_sliding_got(view)[full.columns], full)
    assert view.refresh()["mode"] == "noop"

    # late turn lands ONLY on Jan 1 hour 23 — Jan 2's 01:00 bucket has it
    # inside its 6h frame, so day 2 must be refreshed although unchanged
    late = mk([("c", 3, "user", "wwww", None, datetime(2024, 1, 1, 23, 0))])
    pipe.run(base.unionByName(late), stages=("hourly",))
    r = view.refresh()
    assert r["mode"] == "incremental"
    assert set(r["days"]) == {"2024-01-01", "2024-01-02"}
    full2 = _sliding_full(pipe, 6)
    pd.testing.assert_frame_equal(_sliding_got(view)[full2.columns], full2)
    # the midnight-crossing bucket really changed
    jan2 = full2[full2.bucket_start == datetime(2024, 1, 2, 1)]
    assert jan2.w_n_turns.iloc[0] == 3  # 22:00 + 23:00(late) + 01:00


def test_sliding_view_retention_drop_and_gc(spark, t0, tmp_path):
    """Removed input days drop their output partitions AND refresh their
    successors; an expired consumed snapshot degrades to a full rebuild."""
    import pandas as pd

    from engine.incremental import IncrementalSlidingView

    pipe = TierPipeline(spark, str(tmp_path / "p3"), snapshots=True)
    pipe.run(t0)
    view = IncrementalSlidingView(pipe, str(tmp_path / "sv3"), 24)
    view.refresh()
    days = sorted(
        str(r["d"])
        for r in observed_state(pipe.read_tier("hourly"))
        .selectExpr("cast(bucket_date as string) as d")
        .distinct()
        .collect()
    )
    cut = days[len(days) // 2]
    from engine.retention import drop_hourly_partitions, droppable_hourly_days

    dropped_days = droppable_hourly_days(pipe, cut)
    assert dropped_days, "retention precondition: droppable days exist"
    drop_hourly_partitions(pipe, dropped_days, run_id="ret-sv")
    r = view.refresh()
    assert r["mode"] == "incremental" and r["dropped"] > 0
    full = _sliding_full(pipe, 24)
    pd.testing.assert_frame_equal(_sliding_got(view)[full.columns], full)

    # GC the consumed snapshot -> full rebuild, still equal
    from engine.snapstore import SnapStore

    late = t0.limit(50).selectExpr(
        "conv_id", "cast(turn_idx + 500000 as int) as turn_idx",
        "role", "text", "tool", "ts + interval 10 minutes as ts",
    )
    pipe.run(
        t0.filter(f"to_date(ts) >= date'{cut}'").unionByName(late),
        stages=("hourly",),
    )
    SnapStore(pipe.tier_path("hourly")).expire(keep_last=1)
    r2 = view.refresh()
    assert r2["mode"] == "full"
    full3 = _sliding_full(pipe, 24)
    pd.testing.assert_frame_equal(_sliding_got(view)[full3.columns], full3)


def test_sliding_view_custom_series_fn(spark, tmp_path):
    """M89: the same invalidation machinery maintains OTHER trailing
    families — a sliding hist-percentile table refreshes incrementally
    and stays bit-equal to a full recompute."""
    from datetime import datetime

    import pandas as pd

    from engine.incremental import IncrementalSlidingView
    from engine.sliding import sliding_hist_percentile

    def mk(rows):
        return spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string,"
            " tool string, ts timestamp_ntz",
        )

    base = mk([
        ("c", 0, "user", "xxxx", None, datetime(2024, 1, 1, 22, 0)),
        ("c", 1, "user", "yy", None, datetime(2024, 1, 2, 1, 0)),
        ("c", 2, "user", "zzzzzz", None, datetime(2024, 1, 3, 9, 0)),
    ])
    pipe = TierPipeline(
        spark, str(tmp_path / "p9"), snapshots=True,
        hist_cols={"token_count": (0.0, 1.0, 16)},
    )
    pipe.run(base, stages=("hourly",))
    fn = lambda h: sliding_hist_percentile(h, "token_count_hist", 16, 6)  # noqa: E731
    view = IncrementalSlidingView(
        pipe, str(tmp_path / "sv9"), window_hours=6, series_fn=fn
    )
    assert view.refresh()["mode"] == "full"

    def full():
        return (
            fn(observed_state(pipe.read_tier("hourly")))
            .toPandas()
            .sort_values(["conv_id", "bucket_start"], ignore_index=True)
        )

    got = view.read().toPandas().sort_values(
        ["conv_id", "bucket_start"], ignore_index=True
    )
    pd.testing.assert_frame_equal(got[full().columns], full())

    late = mk([("c", 3, "user", "w" * 9, None, datetime(2024, 1, 1, 23, 0))])
    pipe.run(base.unionByName(late), stages=("hourly",))
    r = view.refresh()
    assert r["mode"] == "incremental"
    assert set(r["days"]) == {"2024-01-01", "2024-01-02"}
    f2 = full()
    got2 = view.read().toPandas().sort_values(
        ["conv_id", "bucket_start"], ignore_index=True
    )
    pd.testing.assert_frame_equal(got2[f2.columns], f2)
    # the spilled-over Jan 2 bucket saw the late 9-token turn in its frame
    jan2 = f2[f2.bucket_start == datetime(2024, 1, 2, 1)]
    assert jan2.p95_bin.iloc[0] == 9
