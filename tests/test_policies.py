"""Maintenance policies (engine/policies.py): the ordered lifecycle cycle
— views refresh BEFORE retention drops (wrong order provably loses late
data from retain_dropped views), retention reconciles inside the run,
expiry pins every consumed snapshot (managed and lagging), and a second
apply is a no-op."""

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.cagg import ContinuousAggregate  # noqa: E402
from engine.pipeline import TierPipeline  # noqa: E402
from engine.policies import MaintenancePolicy  # noqa: E402
from engine.retention import (  # noqa: E402
    drop_hourly_partitions,
    droppable_hourly_days,
)
from engine.rollup import observed_state  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402

KEYS = {"week": "date_trunc('week', bucket_start)",
        "cohort": "substr(conv_id, length(conv_id), 1)"}
AGGS = {"turns": ("sum", "n_turns"), "hours": ("count",)}


@pytest.fixture(scope="module")
def t0(spark):
    df = synth_transcripts(spark, n_convs=24, hot_turns=120)
    df.cache().count()
    return df


def _days(t0):
    return sorted(
        str(x["d"]) for x in t0.selectExpr("to_date(ts) as d").distinct().collect()
    )


def _direct_pdf(pipe):
    h = observed_state(pipe.read_tier("hourly"))
    keyed = h.withColumns({k: F.expr(e) for k, e in KEYS.items()})
    got = keyed.groupBy(*KEYS).agg(
        F.sum("n_turns").alias("turns"), F.count(F.lit(1)).alias("hours")
    )
    return got.toPandas().sort_values(list(KEYS), ignore_index=True)


def _got(cagg):
    return cagg.read().toPandas().sort_values(list(KEYS), ignore_index=True)


def _late(t0):
    return t0.selectExpr(
        "conv_id", "cast(turn_idx + 500000 as int) as turn_idx",
        "role", "text", "tool", "ts + interval 31 minutes as ts",
    )


def test_policy_refreshes_views_before_retention_drops(spark, t0, tmp_path):
    """The ordering theorem: a lagging retain_dropped view refreshed by
    the policy BEFORE the drop freezes the days' FINAL state; the manual
    wrong order (drop first) freezes a stale partial and loses the late
    data forever."""
    days = _days(t0)
    horizon = days[2]  # first two days become droppable

    def build(root):
        pipe = TierPipeline(spark, str(root), snapshots=True)
        pipe.run(t0)
        view = ContinuousAggregate(pipe, str(root) + "-v", keys=KEYS,
                                   aggs=AGGS, retain_dropped=True)
        view.refresh()
        # late data lands everywhere — the view now LAGS the tier
        pipe.run(t0.unionByName(_late(t0)))
        return pipe, view

    pipe, view = build(tmp_path / "good")
    pre_drop = _direct_pdf(pipe)
    rep = MaintenancePolicy(
        caggs=[view], drop_hourly_older_than=horizon
    ).apply(pipe)
    assert rep["hourly_dropped"] == days[:2]
    assert rep["cagg_refresh"][view.path]["mode"] == "incremental"
    assert rep["cagg_reconcile"][view.path]["retained"] == 2
    # the view froze the days' FINAL (late-data-inclusive) state
    pd.testing.assert_frame_equal(_got(view)[pre_drop.columns], pre_drop)

    # counterfactual: drop first, refresh after — late data never reaches
    # the view's frozen partials
    pipe2, view2 = build(tmp_path / "bad")
    drop_hourly_partitions(pipe2, days[:2], run_id="ret")
    view2.refresh()
    lost = _got(view2)
    assert lost["turns"].sum() < pre_drop["turns"].sum()


def test_policy_idempotent_second_apply(spark, t0, tmp_path):
    days = _days(t0)
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0)
    view = ContinuousAggregate(pipe, str(tmp_path / "v"), keys=KEYS,
                               aggs=AGGS, retain_dropped=True)
    pol = MaintenancePolicy(
        caggs=[view],
        drop_hourly_older_than=days[2],
        compact_manifest=True,
        expire_keep_last=2,
    )
    r1 = pol.apply(pipe)
    assert r1["hourly_dropped"] == days[:2]
    r2 = pol.apply(pipe)
    assert r2["hourly_dropped"] == []
    assert r2["cagg_refresh"][view.path]["mode"] == "noop"
    assert all(not v for k, v in r2["expired"].items())
    pd.testing.assert_frame_equal(_got(view), _got(view))  # still serves


def test_policy_expiry_pins_lagging_consumer(spark, t0, tmp_path):
    """A lagging hierarchical child passed as a CONSUMER (not refreshed by
    the policy) keeps its parent-partials diff base across expiry — its
    later refresh stays incremental instead of degrading to full."""
    days = _days(t0)
    split = days[len(days) // 2]
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0.filter(F.to_date("ts") < F.lit(split)), stages=("hourly",))
    parent = ContinuousAggregate(pipe, str(tmp_path / "parent"), keys=KEYS,
                                 aggs=AGGS, versioned=True)
    parent.refresh()
    child = parent.child(str(tmp_path / "child"),
                         keys={"cohort": "cohort"}, aggs=["turns", "hours"])
    child.refresh()

    # new data; the policy refreshes the parent (child lags) and expires
    # aggressively — the child's consumed parent snapshot must survive
    pipe.run(t0, stages=("hourly",))
    pol = MaintenancePolicy(
        caggs=[parent], consumers=[child], expire_keep_last=1
    )
    rep = pol.apply(pipe)
    assert rep["cagg_refresh"][parent.path]["mode"] == "incremental"
    r = child.refresh()
    assert r["mode"] == "incremental" and r["days"]

    direct = ContinuousAggregate(
        pipe, str(tmp_path / "direct"),
        keys={"cohort": "substr(conv_id, length(conv_id), 1)"}, aggs=AGGS,
    )
    direct.refresh()
    pd.testing.assert_frame_equal(
        child.read().toPandas().sort_values("cohort", ignore_index=True),
        direct.read().toPandas().sort_values("cohort", ignore_index=True),
    )


def test_policy_full_cycle_report(spark, t0, tmp_path):
    days = _days(t0)
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0)
    parent = ContinuousAggregate(pipe, str(tmp_path / "parent"), keys=KEYS,
                                 aggs=AGGS, versioned=True,
                                 retain_dropped=True)
    child = parent.child(str(tmp_path / "child"),
                         keys={"cohort": "cohort"}, aggs=["turns", "hours"],
                         retain_dropped=True)
    pol = MaintenancePolicy(
        caggs=[child, parent],  # deliberately misordered — policy sorts
        drop_hourly_older_than=days[2],
        drop_daily_older_than=days[1],
        compact=[{"tier": "hourly", "n_files": 1}],
        compact_manifest=True,
        expire_keep_last=2,
    )
    pre = _direct_pdf(pipe)
    rep = pol.apply(pipe)
    assert list(rep["cagg_refresh"]) == [parent.path, child.path]
    assert rep["hourly_dropped"] == days[:2]
    assert rep["daily_dropped"] == days[:1]
    assert rep["compacted"] == [{"tier": "hourly", "n_files": 1}]
    assert "manifest_compact" in rep and "expired" in rep
    # retain_dropped at both levels: the view pyramid still answers pre-drop
    pd.testing.assert_frame_equal(_got(parent)[pre.columns], pre)
    want = (
        pre.groupby(pre["cohort"]).agg(turns=("turns", "sum"),
                                       hours=("hours", "sum"))
        .reset_index().sort_values("cohort", ignore_index=True)
    )
    got = child.read().toPandas().sort_values("cohort", ignore_index=True)
    pd.testing.assert_frame_equal(got[want.columns], want)
