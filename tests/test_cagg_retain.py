"""Views outliving raw retention (engine/cagg.py retain_dropped):
retention-dropped upstream days FREEZE in the view (TimescaleDB: a cagg
outlives its hypertable's retention policy) while true deletions still
propagate; full-rebuild fallbacks carry frozen days forward when the spec
matches and report them lost when it can't; drop_days is the erasure
hatch for frozen days."""

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.cagg import ContinuousAggregate  # noqa: E402
from engine.pipeline import TierPipeline  # noqa: E402
from engine.retention import (  # noqa: E402
    drop_hourly_partitions,
    droppable_hourly_days,
    expire_snapshots,
)
from engine.rollup import observed_state  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402

KEYS = {"week": "date_trunc('week', bucket_start)",
        "cohort": "substr(conv_id, length(conv_id), 1)"}
AGGS = {
    "turns": ("sum", "n_turns"),
    "hours": ("count",),
    "min_tok": ("min", "token_min"),
    "avg_turns": ("avg", "n_turns"),
}


@pytest.fixture(scope="module")
def t0(spark):
    df = synth_transcripts(spark, n_convs=24, hot_turns=120)
    df.cache().count()
    return df


def _direct_pdf(pipe):
    h = observed_state(pipe.read_tier("hourly"))
    keyed = h.withColumns({k: F.expr(e) for k, e in KEYS.items()})
    got = keyed.groupBy(*KEYS).agg(
        F.sum("n_turns").alias("turns"),
        F.count(F.lit(1)).alias("hours"),
        F.min("token_min").alias("min_tok"),
        (F.sum("n_turns").cast("double") / F.count("n_turns").cast("double"))
        .alias("avg_turns"),
    )
    return got.toPandas().sort_values(list(KEYS), ignore_index=True)


def _got(cagg):
    return cagg.read().toPandas().sort_values(list(KEYS), ignore_index=True)


def test_retain_dropped_freezes_retention_days(spark, t0, tmp_path):
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0)
    keep = ContinuousAggregate(pipe, str(tmp_path / "keep"), keys=KEYS,
                               aggs=AGGS, retain_dropped=True)
    prop = ContinuousAggregate(pipe, str(tmp_path / "prop"), keys=KEYS,
                               aggs=AGGS)
    keep.refresh()
    prop.refresh()
    pre_drop = _direct_pdf(pipe)

    days = droppable_hourly_days(pipe, "9999-12-31")
    drop_hourly_partitions(pipe, days[:2], run_id="ret")
    rk = keep.refresh()
    assert rk["retained"] == 2 and rk["removed"] == 0
    rp = prop.refresh()
    assert rp["removed"] == 2

    # the retaining view still answers as if retention never happened...
    pd.testing.assert_frame_equal(_got(keep)[pre_drop.columns], pre_drop)
    # ...the propagating twin tracks the truncated tier
    pd.testing.assert_frame_equal(_got(prop)[pre_drop.columns], _direct_pdf(pipe))
    # and the live-serving path applies the same freeze
    rt = keep.read_realtime().toPandas().sort_values(list(KEYS), ignore_index=True)
    pd.testing.assert_frame_equal(rt[pre_drop.columns], pre_drop)


def test_retain_dropped_true_deletion_still_propagates(spark, t0, tmp_path):
    """A day whose INPUT vanished (stale drop — no retention record) must
    leave the view even under retain_dropped: erasure is never silently
    retained for days the raw could re-roll."""
    all_days = sorted(
        str(x["d"]) for x in t0.selectExpr("to_date(ts) as d").distinct().collect()
    )
    last = all_days[-1]
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True,
                        fill_tiers=False)
    pipe.run(t0, stages=("hourly",))
    keep = ContinuousAggregate(pipe, str(tmp_path / "v"), keys=KEYS,
                               aggs=AGGS, retain_dropped=True)
    keep.refresh()
    # the whole last day's input disappears: the pipeline stale-drops it
    pipe.run(t0.filter(F.to_date("ts") < F.lit(last)), stages=("hourly",))
    r = keep.refresh()
    assert r["removed"] >= 1 and r["retained"] == 0
    pd.testing.assert_frame_equal(_got(keep)[_direct_pdf(pipe).columns],
                                  _direct_pdf(pipe))


def test_retain_dropped_gc_full_rebuild_carries_frozen(spark, t0, tmp_path):
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0)
    a = ContinuousAggregate(pipe, str(tmp_path / "a"), keys=KEYS,
                            aggs=AGGS, retain_dropped=True)
    b = ContinuousAggregate(pipe, str(tmp_path / "b"), keys=KEYS,
                            aggs=AGGS, retain_dropped=True)
    a.refresh()
    b.refresh()
    days = droppable_hourly_days(pipe, "9999-12-31")
    drop_hourly_partitions(pipe, days[:2], run_id="ret")
    a.refresh()
    b.refresh()
    # late data, consumed incrementally by A only; then GC strands B's base
    late = t0.filter("conv_id = 'conv-00000001'").selectExpr(
        "conv_id", "cast(turn_idx + 200000 as int) as turn_idx",
        "role", "text", "tool", "ts + interval 45 minutes as ts",
    )
    pipe.run(t0.unionByName(late))
    assert a.refresh()["mode"] == "incremental"
    expire_snapshots(pipe, keep_last=1)
    rb = b.refresh()
    assert rb["mode"] == "full" and rb.get("retained") == 2
    # the full fallback carried the frozen days: B == the incremental twin
    pd.testing.assert_frame_equal(_got(b), _got(a))


def test_retain_dropped_spec_change_reports_lost_frozen(spark, t0, tmp_path):
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0)
    path = str(tmp_path / "v")
    v1 = ContinuousAggregate(pipe, path, keys=KEYS, aggs=AGGS,
                             retain_dropped=True)
    v1.refresh()
    days = droppable_hourly_days(pipe, "9999-12-31")
    drop_hourly_partitions(pipe, days[:2], run_id="ret")
    v1.refresh()
    v2 = ContinuousAggregate(pipe, path, keys=KEYS,
                             aggs={**AGGS, "peak": ("max", "n_turns")},
                             retain_dropped=True)
    r = v2.refresh()
    assert r["mode"] == "full"
    assert sorted(r["lost_frozen"]) == sorted(days[:2])
    # the rebuilt view matches the truncated tier under the NEW spec
    got = _got(v2)
    assert "peak" in got.columns
    pd.testing.assert_frame_equal(got[_direct_pdf(pipe).columns],
                                  _direct_pdf(pipe))


def test_drop_days_erases_frozen_days(spark, t0, tmp_path):
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0)
    keep = ContinuousAggregate(pipe, str(tmp_path / "v"), keys=KEYS,
                               aggs=AGGS, retain_dropped=True, versioned=True)
    keep.refresh()
    days = droppable_hourly_days(pipe, "9999-12-31")
    drop_hourly_partitions(pipe, days[:2], run_id="ret")
    keep.refresh()
    assert keep.drop_days(days[:2])["removed"] == 2
    pd.testing.assert_frame_equal(_got(keep)[_direct_pdf(pipe).columns],
                                  _direct_pdf(pipe))


def test_retain_dropped_hier_child_over_propagating_parent(spark, t0, tmp_path):
    """A retain_dropped CHILD freezes the days its propagating parent
    removed for retention — the coarse dashboard keeps history the finer
    view (and the raw tier) already gave up."""
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0)
    parent = ContinuousAggregate(pipe, str(tmp_path / "parent"), keys=KEYS,
                                 aggs=AGGS, versioned=True)
    parent.refresh()
    child = parent.child(
        str(tmp_path / "child"),
        keys={"cohort": "cohort"},
        aggs=["turns", "hours", "min_tok", "avg_turns"],
        retain_dropped=True,
    )
    child.refresh()
    pre = child.read().toPandas().sort_values("cohort", ignore_index=True)

    days = droppable_hourly_days(pipe, "9999-12-31")
    drop_hourly_partitions(pipe, days[:2], run_id="ret")
    assert parent.refresh()["removed"] == 2
    rc = child.refresh()
    assert rc["retained"] == 2 and rc["removed"] == 0
    got = child.read().toPandas().sort_values("cohort", ignore_index=True)
    pd.testing.assert_frame_equal(got, pre)
