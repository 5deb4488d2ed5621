"""User-defined continuous aggregates (engine/cagg.py): the declared view
tracks a full recompute under incremental refreshes, prunes to exactly the
changed days, propagates retention, rebuilds on spec evolution or an
expired diff base, and every algebra kind (sum/count/min/max/avg/
approx_distinct/first/last) matches a direct computation on the source."""

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.cagg import ContinuousAggregate  # noqa: E402
from engine.pipeline import TierPipeline  # noqa: E402
from engine.rollup import observed_state  # noqa: E402
from engine.snapstore import SnapStore  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402

KEYS = {"week": "date_trunc('week', bucket_start)",
        "cohort": "substr(conv_id, length(conv_id), 1)"}
AGGS = {
    "turns": ("sum", "n_turns"),
    "rows": ("count",),
    "tok_rows": ("count", "token_min"),
    "min_tok": ("min", "token_min"),
    "peak": ("max", "n_turns"),
    "avg_turns": ("avg", "n_turns"),
    "first_bucket": ("first", "bucket_start", "bucket_start"),
    "last_max": ("last", "token_max", "bucket_start"),
}


@pytest.fixture(scope="module")
def t0(spark):
    df = synth_transcripts(spark, n_convs=24, hot_turns=120)
    df.cache().count()
    return df


def _direct(pipe, filter_expr=None):
    """The same view computed directly on the hourly tier (no partials)."""
    h = observed_state(pipe.read_tier("hourly"))
    if filter_expr:
        h = h.filter(filter_expr)
    keyed = h.withColumns({k: F.expr(e) for k, e in KEYS.items()})
    got = keyed.groupBy(*KEYS).agg(
        F.sum("n_turns").alias("turns"),
        F.count(F.lit(1)).alias("rows"),
        F.count("token_min").alias("tok_rows"),
        F.min("token_min").alias("min_tok"),
        F.max("n_turns").alias("peak"),
        (F.sum("n_turns").cast("double") / F.count("n_turns").cast("double")).alias("avg_turns"),
        F.min(F.struct(F.col("bucket_start").alias("o"),
                       F.col("bucket_start").alias("v")))["v"].alias("first_bucket"),
        F.max(F.struct(F.col("bucket_start").alias("o"),
                       F.col("token_max").alias("v")))["v"].alias("last_max"),
    )
    return got.toPandas().sort_values(list(KEYS), ignore_index=True)


def _got(cagg):
    df = cagg.read().toPandas().sort_values(list(KEYS), ignore_index=True)
    return df


def test_cagg_tracks_full_recompute_and_prunes_days(spark, t0, tmp_path):
    all_days = sorted(
        str(x["d"]) for x in t0.selectExpr("to_date(ts) as d").distinct().collect()
    )
    assert len(all_days) >= 2, "fixture must span multiple days"
    split = all_days[len(all_days) // 2]

    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    early = t0.filter(F.to_date("ts") < F.lit(split))
    pipe.run(early, stages=("hourly",))
    cagg = ContinuousAggregate(pipe, str(tmp_path / "v"), keys=KEYS, aggs=AGGS)
    assert cagg.refresh()["mode"] == "full"
    pd.testing.assert_frame_equal(_got(cagg)[_direct(pipe).columns], _direct(pipe))
    assert cagg.refresh()["mode"] == "noop"

    # the rest of the data arrives: only the NEW days may be consumed —
    # never the whole history
    pipe.run(t0, stages=("hourly",))
    r = cagg.refresh()
    assert r["mode"] == "incremental" and r["days"]
    late_days = {d for d in all_days if d >= split}
    assert set(r["days"]) <= late_days
    assert len(r["days"]) < len(all_days)
    pd.testing.assert_frame_equal(_got(cagg)[_direct(pipe).columns], _direct(pipe))


def test_cagg_matches_fresh_full_rebuild(spark, t0, tmp_path):
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0, stages=("hourly",))
    inc = ContinuousAggregate(pipe, str(tmp_path / "inc"), keys=KEYS, aggs=AGGS)
    inc.refresh()
    fresh = ContinuousAggregate(pipe, str(tmp_path / "fresh"), keys=KEYS, aggs=AGGS)
    assert fresh.refresh()["mode"] == "full"
    pd.testing.assert_frame_equal(_got(inc), _got(fresh))


def test_cagg_filter_and_approx_distinct(spark, t0, tmp_path):
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0, stages=("hourly",))
    cagg = ContinuousAggregate(
        pipe, str(tmp_path / "v"),
        keys=["conv_id"],
        aggs={"utok": ("approx_distinct", "token_min"),
              "turns": ("sum", "n_turns")},
        filter="n_turns > 1",
    )
    cagg.refresh()
    got = _got_by(cagg, "conv_id")
    h = observed_state(pipe.read_tier("hourly")).filter("n_turns > 1")
    want = (
        h.groupBy("conv_id")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("token_min", F.lit(12))).alias("utok"),
            F.sum("n_turns").alias("turns"),
        )
        .toPandas().sort_values("conv_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


def _got_by(cagg, *keys):
    return cagg.read().toPandas().sort_values(list(keys), ignore_index=True)


def test_cagg_spec_evolution_forces_full_rebuild(spark, t0, tmp_path):
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0, stages=("hourly",))
    path = str(tmp_path / "v")
    v1 = ContinuousAggregate(pipe, path, keys=["conv_id"],
                             aggs={"turns": ("sum", "n_turns")})
    assert v1.refresh()["mode"] == "full"
    assert v1.refresh()["mode"] == "noop"
    # same path, evolved definition: the stored spec token mismatches and
    # the next refresh is a full rebuild under the new spec
    v2 = ContinuousAggregate(pipe, path, keys=["conv_id"],
                             aggs={"turns": ("sum", "n_turns"),
                                   "peak": ("max", "n_turns")})
    assert v2.refresh()["mode"] == "full"
    assert "peak" in _got_by(v2, "conv_id").columns
    assert v2.refresh()["mode"] == "noop"


def test_cagg_retention_propagates_and_gc_degrades_to_full(spark, t0, tmp_path):
    from engine.retention import (
        drop_hourly_partitions,
        droppable_hourly_days,
        expire_snapshots,
    )

    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0)
    cagg = ContinuousAggregate(pipe, str(tmp_path / "v"), keys=KEYS, aggs=AGGS)
    cagg.refresh()
    days = droppable_hourly_days(pipe, "9999-12-31")
    drop_hourly_partitions(pipe, days[:2], run_id="ret")
    r = cagg.refresh()
    assert r["mode"] == "incremental" and r["removed"] == 2
    pd.testing.assert_frame_equal(_got(cagg)[_direct(pipe).columns], _direct(pipe))

    late = t0.filter("conv_id = 'conv-00000001'").selectExpr(
        "conv_id", "cast(turn_idx + 200000 as int) as turn_idx",
        "role", "text", "tool", "ts + interval 45 minutes as ts",
    )
    pipe.run(t0.unionByName(late))
    expire_snapshots(pipe, keep_last=1)
    r2 = cagg.refresh()
    assert r2["mode"] == "full"
    pd.testing.assert_frame_equal(_got(cagg)[_direct(pipe).columns], _direct(pipe))


def test_cagg_validation():
    class _FakePipe:
        snapshots = True

    with pytest.raises(ValueError, match="reserved"):
        ContinuousAggregate(_FakePipe(), "/tmp/x", keys=["bucket_date"],
                            aggs={"n": ("count",)})
    with pytest.raises(ValueError, match="unknown agg kind"):
        ContinuousAggregate(_FakePipe(), "/tmp/x", keys=["conv_id"],
                            aggs={"n": ("median", "x")})
    with pytest.raises(ValueError, match="duplicate"):
        ContinuousAggregate(_FakePipe(), "/tmp/x", keys=["conv_id"],
                            aggs={"conv_id": ("count",)})
    with pytest.raises(ValueError, match="spec fields"):
        ContinuousAggregate(_FakePipe(), "/tmp/x", keys=["conv_id"],
                            aggs={"f": ("first", "v")})


def test_cagg_distinct_kmv_exact_and_incremental(spark, t0, tmp_path):
    """distinct_kmv: the mergeable COUNT DISTINCT stand-in that is EXACT
    below k (engine/kmv.py) — the view's value equals the true per-group
    distinct count, survives incremental day-by-day consumption
    (union-truncate across day partials == direct), and a small k
    saturates to the (k-1)/U_k estimate within bound."""
    all_days = sorted(
        str(x["d"]) for x in t0.selectExpr("to_date(ts) as d").distinct().collect()
    )
    split = all_days[len(all_days) // 2]
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0.filter(F.to_date("ts") < F.lit(split)), stages=("hourly",))
    cagg = ContinuousAggregate(
        pipe, str(tmp_path / "v"),
        keys=["conv_id"],
        aggs={"ubuckets": ("distinct_kmv", "bucket_start", 512),
              "turns": ("sum", "n_turns")},
    )
    assert cagg.refresh()["mode"] == "full"
    # second batch consumed incrementally, then compare vs exact distinct
    pipe.run(t0, stages=("hourly",))
    assert cagg.refresh()["mode"] == "incremental"
    got = _got_by(cagg, "conv_id")
    h = observed_state(pipe.read_tier("hourly"))
    want = (
        h.groupBy("conv_id")
        .agg(
            F.count_distinct("bucket_start").cast("double").alias("ubuckets"),
            F.sum("n_turns").alias("turns"),
        )
        .toPandas().sort_values("conv_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_cagg_distinct_kmv_saturated_estimate(spark, t0, tmp_path):
    import math

    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0, stages=("hourly",))
    k = 32
    cagg = ContinuousAggregate(
        pipe, str(tmp_path / "v"),
        keys={"one": "1"},
        aggs={"ub": ("distinct_kmv", "concat(conv_id, '|', bucket_start)", k)},
    )
    cagg.refresh()
    est = cagg.read().toPandas()["ub"][0]
    true = observed_state(pipe.read_tier("hourly")).count()  # key is unique per row
    assert true > k  # genuinely saturated
    assert abs(est - true) / true < 5 / math.sqrt(k - 2)


def test_cagg_distinct_kmv_validation():
    class _FakePipe:
        snapshots = True

    with pytest.raises(ValueError, match="spec fields"):
        ContinuousAggregate(_FakePipe(), "/tmp/x", keys=["conv_id"],
                            aggs={"x": ("distinct_kmv", "tool")})


def _files(root):
    import os

    out = []
    for dp, _, fns in os.walk(root):
        for fn in fns:
            p = os.path.join(dp, fn)
            out.append((p, os.path.getmtime(p)))
    return sorted(out)


def test_cagg_read_realtime_equals_refresh_then_read(spark, t0, tmp_path):
    """TimescaleDB real-time aggregates: read_realtime folds the
    not-yet-consumed changelog days in at serve time — bit-equal to
    refresh-then-read — while writing NOTHING (partials and pointers
    byte-untouched, so a read replica can serve it)."""
    all_days = sorted(
        str(x["d"]) for x in t0.selectExpr("to_date(ts) as d").distinct().collect()
    )
    split = all_days[len(all_days) // 2]
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0.filter(F.to_date("ts") < F.lit(split)), stages=("hourly",))
    cagg = ContinuousAggregate(pipe, str(tmp_path / "v"), keys=KEYS, aggs=AGGS)
    cagg.refresh()
    # consumed == current: realtime IS the stored view
    pd.testing.assert_frame_equal(
        cagg.read_realtime().toPandas().sort_values(list(KEYS), ignore_index=True),
        _got(cagg),
    )

    pipe.run(t0, stages=("hourly",))
    before = _files(str(tmp_path / "v"))
    rt = cagg.read_realtime().toPandas().sort_values(list(KEYS), ignore_index=True)
    assert _files(str(tmp_path / "v")) == before, "read_realtime must not write"
    # the live view equals the direct computation on the CURRENT tier...
    pd.testing.assert_frame_equal(rt[_direct(pipe).columns], _direct(pipe))
    # ...and equals what a refresh would persist
    assert cagg.refresh()["mode"] == "incremental"
    pd.testing.assert_frame_equal(rt, _got(cagg))


def test_cagg_read_realtime_fallbacks_and_retention(spark, t0, tmp_path):
    from engine.retention import drop_hourly_partitions, droppable_hourly_days

    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0)
    # never refreshed: full on-the-fly compute, still no writes
    virgin = ContinuousAggregate(pipe, str(tmp_path / "v0"), keys=KEYS, aggs=AGGS)
    rt0 = virgin.read_realtime().toPandas().sort_values(list(KEYS), ignore_index=True)
    pd.testing.assert_frame_equal(rt0[_direct(pipe).columns], _direct(pipe))
    assert virgin._pointer("_CONSUMED") is None

    cagg = ContinuousAggregate(pipe, str(tmp_path / "v"), keys=KEYS, aggs=AGGS)
    cagg.refresh()
    # retention drop surfaces in the live view before any refresh
    days = droppable_hourly_days(pipe, "9999-12-31")
    drop_hourly_partitions(pipe, days[:2], run_id="ret")
    rt = cagg.read_realtime().toPandas().sort_values(list(KEYS), ignore_index=True)
    pd.testing.assert_frame_equal(rt[_direct(pipe).columns], _direct(pipe))

    # spec change: the live view serves the NEW spec on the fly
    v2 = ContinuousAggregate(
        pipe, str(tmp_path / "v"), keys=KEYS,
        aggs={**AGGS, "tok_sum": ("sum", "token_sum")},
    )
    rt2 = v2.read_realtime().toPandas()
    assert "tok_sum" in rt2.columns
    v2.refresh()
    pd.testing.assert_frame_equal(
        rt2.sort_values(list(KEYS), ignore_index=True), _got(v2)
    )


def test_cagg_refresh_lease_refuses_concurrent_writer(spark, t0, tmp_path):
    """refresh()/drop_days are lease-serialized per view path: a held
    lease refuses a second writer (LeaseHeldError), release re-admits;
    readers never take the lease."""
    from engine.lease import LeaseHeldError, RunLease

    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0, stages=("hourly",))
    cagg = ContinuousAggregate(pipe, str(tmp_path / "v"),
                               keys=["conv_id"],
                               aggs={"turns": ("sum", "n_turns")})
    other = RunLease(str(tmp_path / "v"), owner="other").acquire()
    with pytest.raises(LeaseHeldError):
        cagg.refresh()
    # reads are lease-free — read_realtime serves even while a writer holds
    assert cagg.read_realtime().count() > 0
    other.release()
    assert cagg.refresh()["mode"] == "full"
    assert cagg.refresh()["mode"] == "noop"


def test_cagg_budgeted_refresh_drains_and_matches_unbudgeted(spark, t0, tmp_path):
    """refresh(budget=1) processes the single OLDEST pending day per call,
    records the rest in the deferral ledger, and STILL advances the
    consumed pointer (deferred days are recomputed wholesale from the
    then-current snapshot, so the ledger — not the pointer — is the
    memory); draining to an empty ledger equals one unbudgeted refresh
    bit-exactly, and read_realtime serves the fully-fresh view THROUGH
    the backlog."""
    all_days = sorted(
        str(x["d"]) for x in t0.selectExpr("to_date(ts) as d").distinct().collect()
    )
    split = all_days[1]
    early = t0.filter(F.to_date("ts") < F.lit(split))

    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(early, stages=("hourly",))
    budgeted = ContinuousAggregate(pipe, str(tmp_path / "b"), keys=KEYS, aggs=AGGS)
    budgeted.refresh()  # full build on the early slice
    plain = ContinuousAggregate(pipe, str(tmp_path / "u"), keys=KEYS, aggs=AGGS)
    plain.refresh()

    pipe.run(t0, stages=("hourly",))  # the backlog arrives
    plain.refresh()
    r = budgeted.refresh(budget=1)
    assert r["mode"] == "incremental" and len(r["days"]) == 1
    assert r["deferred"] and r["days"][0] < r["deferred"][0]  # oldest first
    assert budgeted.deferred_days() == r["deferred"]
    # pointer advanced past the deferral: the ledger is the memory
    assert budgeted.consumed_id() == SnapStore(
        pipe.tier_path("hourly")
    ).current_id()
    # mid-backlog: stored view is stale, realtime folds the ledger
    assert not _got(budgeted).equals(_got(plain))
    rt = (
        budgeted.read_realtime().toPandas()
        .sort_values(list(KEYS), ignore_index=True)
    )
    pd.testing.assert_frame_equal(rt[_got(plain).columns], _got(plain))

    rounds = 0
    while budgeted.deferred_days():
        out = budgeted.refresh(budget=1)
        assert len(out["days"]) <= 1
        rounds += 1
        assert rounds < 50
    assert rounds >= 1
    pd.testing.assert_frame_equal(_got(budgeted), _got(plain))
    assert budgeted.refresh()["mode"] == "noop"

    with pytest.raises(ValueError, match="budget"):
        budgeted.refresh(budget=0)


def test_cagg_deferred_day_overtaken_by_upstream_removal(spark, t0, tmp_path):
    """A deferred day the upstream then REMOVES (stale drop — the input
    day vanished) leaves the ledger through the removal handling: it is
    dropped from the view, never resurrected by a later drain."""
    all_days = sorted(
        str(x["d"]) for x in t0.selectExpr("to_date(ts) as d").distinct().collect()
    )
    assert len(all_days) >= 3
    # budget=1 will process all_days[1] (oldest pending) and defer the
    # rest — pick the SECOND-oldest as the victim so it stays deferred
    first, victim = all_days[0], all_days[2]

    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0.filter(F.to_date("ts") == F.lit(first)), stages=("hourly",))
    cagg = ContinuousAggregate(pipe, str(tmp_path / "v"), keys=KEYS, aggs=AGGS)
    cagg.refresh()

    pipe.run(t0, stages=("hourly",))
    r = cagg.refresh(budget=1)
    assert victim in r["deferred"] or victim in r["days"]
    # make sure the victim is STILL deferred (budget=1 took the oldest
    # new day; if that was the victim, defer again with a fresh view)
    assert victim in cagg.deferred_days() or r["days"] == [victim]
    if victim not in cagg.deferred_days():
        pytest.skip("victim was the oldest pending day; ordering covered above")

    # the victim day's input vanishes -> hourly stale-drops it
    pipe.run(t0.filter(F.to_date("ts") != F.lit(victim)), stages=("hourly",))
    out = cagg.refresh()
    assert victim not in out["days"]
    assert cagg.deferred_days() == []
    got_days = {
        str(x["d"])
        for x in cagg._read_partials()
        .selectExpr("cast(bucket_date as string) as d").distinct().collect()
    }
    assert victim not in got_days
    ref = ContinuousAggregate(pipe, str(tmp_path / "ref"), keys=KEYS, aggs=AGGS)
    ref.refresh()
    pd.testing.assert_frame_equal(_got(cagg), _got(ref))


def test_cagg_window_bounded_refresh(spark, t0, tmp_path):
    """refresh(window=(lo, hi)) — TimescaleDB refresh_continuous_aggregate
    (start, end) — recomputes only pending days inside [lo, hi); days
    outside go to the SAME deferral ledger, so they are reconciled (never
    silently skipped) by a later unbounded refresh."""
    all_days = sorted(
        str(x["d"]) for x in t0.selectExpr("to_date(ts) as d").distinct().collect()
    )
    assert len(all_days) >= 3
    lo, hi = all_days[1], all_days[2]  # exactly one pending day in-window

    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0.filter(F.to_date("ts") == F.lit(all_days[0])), stages=("hourly",))
    cagg = ContinuousAggregate(pipe, str(tmp_path / "v"), keys=KEYS, aggs=AGGS)
    cagg.refresh()
    pipe.run(t0, stages=("hourly",))

    r = cagg.refresh(window=(lo, hi))
    assert r["days"] == [lo]
    assert r["deferred"] == [d for d in all_days[2:]]
    # out-of-window days reconcile on the next unbounded refresh
    out = cagg.refresh()
    assert out["days"] == r["deferred"] and not out["deferred"]
    ref = ContinuousAggregate(pipe, str(tmp_path / "ref"), keys=KEYS, aggs=AGGS)
    ref.refresh()
    pd.testing.assert_frame_equal(_got(cagg), _got(ref))

    with pytest.raises(ValueError, match="empty refresh window"):
        cagg.refresh(window=(hi, lo))
