"""Versioned cagg partials + hierarchical continuous aggregates
(engine/cagg.py): a versioned=True view's partials table is itself a
SnapStore (pinned readers, emitted changelog); a HierarchicalAggregate
re-merges the parent's day-partial STATE — child-of-parent equals
child-of-raw bit-exactly for every algebra kind — and refreshes from the
parent partials' snapshot diff in O(the child's changed days)."""

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.cagg import ContinuousAggregate, HierarchicalAggregate  # noqa: E402
from engine.pipeline import TierPipeline  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402

P_KEYS = {"week": "date_trunc('week', bucket_start)",
          "cohort": "substr(conv_id, length(conv_id), 1)"}
P_AGGS = {
    "turns": ("sum", "n_turns"),
    "hours": ("count",),
    "min_tok": ("min", "token_min"),
    "peak": ("max", "n_turns"),
    "avg_turns": ("avg", "n_turns"),
    "first_bucket": ("first", "bucket_start", "bucket_start"),
    "last_max": ("last", "token_max", "bucket_start"),
    "utok": ("approx_distinct", "token_min"),
    "ubuckets": ("distinct_kmv", "bucket_start", 512),
}
C_KEYS = {"month": "date_trunc('month', week)", "cohort": "cohort"}
# adopt everything, two of them renamed (exercises the aliased select)
C_AGGS = {
    "turns": "turns",
    "hours": "hours",
    "min_tok": "min_tok",
    "peak_turns": "peak",
    "avg_turns": "avg_turns",
    "first_bucket": "first_bucket",
    "closing_max": "last_max",
    "utok": "utok",
    "ubuckets": "ubuckets",
}
# the same view computed DIRECTLY from the hourly tier (child ∘ parent keys)
D_KEYS = {"month": "date_trunc('month', date_trunc('week', bucket_start))",
          "cohort": "substr(conv_id, length(conv_id), 1)"}
D_AGGS = {
    "turns": ("sum", "n_turns"),
    "hours": ("count",),
    "min_tok": ("min", "token_min"),
    "peak_turns": ("max", "n_turns"),
    "avg_turns": ("avg", "n_turns"),
    "first_bucket": ("first", "bucket_start", "bucket_start"),
    "closing_max": ("last", "token_max", "bucket_start"),
    "utok": ("approx_distinct", "token_min"),
    "ubuckets": ("distinct_kmv", "bucket_start", 512),
}


@pytest.fixture(scope="module")
def t0(spark):
    df = synth_transcripts(spark, n_convs=24, hot_turns=120)
    df.cache().count()
    return df


def _days(t0):
    return sorted(
        str(x["d"]) for x in t0.selectExpr("to_date(ts) as d").distinct().collect()
    )


def _pdf(cagg, keys):
    return cagg.read().toPandas().sort_values(list(keys), ignore_index=True)


def _assert_same(a, b, keys):
    ga, gb = _pdf(a, keys), _pdf(b, keys)
    pd.testing.assert_frame_equal(ga[gb.columns], gb)


def test_versioned_partials_emit_changelog_and_pin_readers(spark, t0, tmp_path):
    days = _days(t0)
    split = days[len(days) // 2]
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0.filter(F.to_date("ts") < F.lit(split)), stages=("hourly",))
    v = ContinuousAggregate(pipe, str(tmp_path / "v"), keys=P_KEYS,
                            aggs=P_AGGS, versioned=True)
    assert v.refresh()["mode"] == "full"
    store = v.partials_store
    sid1 = store.current_id()
    assert sid1 is not None
    pinned = store.read(spark, as_of=sid1).toPandas().sort_values(
        ["week", "cohort", "bucket_date"], ignore_index=True)

    pipe.run(t0, stages=("hourly",))
    r = v.refresh()
    assert r["mode"] == "incremental"
    sid2 = store.current_id()
    assert sid2 != sid1

    # the emitted changelog names ONLY the late days
    d = store.diff(sid1, sid2)
    touched = {p.split("=", 1)[1] for p in d["added"] + d["rewritten"]}
    assert touched and touched <= {x for x in days if x >= split}

    # the pinned reader still sees the pre-refresh bytes
    again = store.read(spark, as_of=sid1).toPandas().sort_values(
        ["week", "cohort", "bucket_date"], ignore_index=True)
    pd.testing.assert_frame_equal(again, pinned)


def test_versioned_matches_plain_and_layout_flip_rebuilds(spark, t0, tmp_path):
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0, stages=("hourly",))
    plain = ContinuousAggregate(pipe, str(tmp_path / "plain"),
                                keys=P_KEYS, aggs=P_AGGS)
    plain.refresh()
    vers = ContinuousAggregate(pipe, str(tmp_path / "plain"),
                               keys=P_KEYS, aggs=P_AGGS, versioned=True)
    # same path, flipped storage layout: the spec token differs, so the
    # next refresh is ONE full rebuild into the snapshot store
    assert vers.refresh()["mode"] == "full"
    assert vers.refresh()["mode"] == "noop"
    fresh = ContinuousAggregate(pipe, str(tmp_path / "fresh"),
                                keys=P_KEYS, aggs=P_AGGS)
    fresh.refresh()
    _assert_same(vers, fresh, ["week", "cohort"])


def test_hier_matches_direct_every_kind(spark, t0, tmp_path):
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0, stages=("hourly",))
    parent = ContinuousAggregate(pipe, str(tmp_path / "parent"),
                                 keys=P_KEYS, aggs=P_AGGS, versioned=True)
    parent.refresh()
    child = parent.child(str(tmp_path / "child"), keys=C_KEYS, aggs=C_AGGS)
    assert child.refresh()["mode"] == "full"
    direct = ContinuousAggregate(pipe, str(tmp_path / "direct"),
                                 keys=D_KEYS, aggs=D_AGGS)
    direct.refresh()
    _assert_same(child, direct, ["month", "cohort"])
    assert child.refresh()["mode"] == "noop"


def test_hier_incremental_consumes_only_parent_changed_days(spark, t0, tmp_path):
    days = _days(t0)
    split = days[len(days) // 2]
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0.filter(F.to_date("ts") < F.lit(split)), stages=("hourly",))
    parent = ContinuousAggregate(pipe, str(tmp_path / "parent"),
                                 keys=P_KEYS, aggs=P_AGGS, versioned=True)
    parent.refresh()
    child = parent.child(str(tmp_path / "child"), keys=C_KEYS, aggs=C_AGGS)
    child.refresh()

    pipe.run(t0, stages=("hourly",))
    assert parent.refresh()["mode"] == "incremental"
    r = child.refresh()
    assert r["mode"] == "incremental" and r["days"]
    assert set(r["days"]) <= {x for x in days if x >= split}
    assert len(r["days"]) < len(days)

    direct = ContinuousAggregate(pipe, str(tmp_path / "direct"),
                                 keys=D_KEYS, aggs=D_AGGS)
    direct.refresh()
    _assert_same(child, direct, ["month", "cohort"])


def test_hier_shared_state_q_override_and_twa(spark, t0, tmp_path):
    """One parent qsk state serves TWO child quantiles (p50 adopted as-is,
    p99 finalized differently from the same sketch), and the twa
    ordered-monoid composes through the hierarchy — both bit-equal to the
    directly-built view."""
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True,
                        twa_cols=["token_count"], qsk_cols=["token_count"])
    pipe.run(t0, stages=("hourly",))
    parent = ContinuousAggregate(
        pipe, str(tmp_path / "parent"),
        keys={"week": "date_trunc('week', bucket_start)", "conv_id": "conv_id"},
        aggs={"p50_tok": ("percentile_qsk", "token_count_qsk", 0.5),
              "twa_tok": ("twa", "twa_token_count"),
              "turns": ("sum", "n_turns")},
        versioned=True,
    )
    parent.refresh()
    child = parent.child(
        str(tmp_path / "child"),
        keys={"conv_id": "conv_id"},
        aggs={"p50_tok": "p50_tok",
              "p99_tok": ("p50_tok", 0.99),
              "twa_tok": "twa_tok",
              "turns": "turns"},
    )
    child.refresh()
    direct = ContinuousAggregate(
        pipe, str(tmp_path / "direct"),
        keys=["conv_id"],
        aggs={"p50_tok": ("percentile_qsk", "token_count_qsk", 0.5),
              "p99_tok": ("percentile_qsk", "token_count_qsk", 0.99),
              "twa_tok": ("twa", "twa_token_count"),
              "turns": ("sum", "n_turns")},
    )
    direct.refresh()
    _assert_same(child, direct, ["conv_id"])


def test_hier_depth3_pyramid(spark, t0, tmp_path):
    """week→month→all-time chain: each level refreshes from the level
    below; the top equals the view built directly from the hourly tier."""
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0, stages=("hourly",))
    weekly = ContinuousAggregate(pipe, str(tmp_path / "w"), keys=P_KEYS,
                                 aggs=P_AGGS, versioned=True)
    weekly.refresh()
    monthly = weekly.child(str(tmp_path / "m"), keys=C_KEYS, aggs=C_AGGS,
                           versioned=True)
    monthly.refresh()
    alltime = monthly.child(
        str(tmp_path / "a"),
        keys={"cohort": "cohort"},
        aggs={"turns": "turns", "min_tok": "min_tok",
              "peak_turns": "peak_turns", "avg_turns": "avg_turns",
              "utok": "utok", "ubuckets": "ubuckets"},
    )
    alltime.refresh()
    direct = ContinuousAggregate(
        pipe, str(tmp_path / "d"),
        keys={"cohort": "substr(conv_id, length(conv_id), 1)"},
        aggs={"turns": ("sum", "n_turns"),
              "min_tok": ("min", "token_min"),
              "peak_turns": ("max", "n_turns"),
              "avg_turns": ("avg", "n_turns"),
              "utok": ("approx_distinct", "token_min"),
              "ubuckets": ("distinct_kmv", "bucket_start", 512)},
    )
    direct.refresh()
    _assert_same(alltime, direct, ["cohort"])


def test_hier_retention_propagates_down_the_chain(spark, t0, tmp_path):
    from engine.retention import drop_hourly_partitions, droppable_hourly_days

    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0)
    parent = ContinuousAggregate(pipe, str(tmp_path / "parent"),
                                 keys=P_KEYS, aggs=P_AGGS, versioned=True)
    parent.refresh()
    child = parent.child(str(tmp_path / "child"), keys=C_KEYS, aggs=C_AGGS)
    child.refresh()

    days = droppable_hourly_days(pipe, "9999-12-31")
    drop_hourly_partitions(pipe, days[:2], run_id="ret")
    rp = parent.refresh()
    assert rp["mode"] == "incremental" and rp["removed"] == 2
    rc = child.refresh()
    assert rc["mode"] == "incremental" and rc["removed"] == 2

    direct = ContinuousAggregate(pipe, str(tmp_path / "direct"),
                                 keys=D_KEYS, aggs=D_AGGS)
    direct.refresh()
    _assert_same(child, direct, ["month", "cohort"])


def test_hier_parent_spec_change_rebuilds_child(spark, t0, tmp_path):
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0, stages=("hourly",))
    p_path, c_path = str(tmp_path / "parent"), str(tmp_path / "child")
    p1 = ContinuousAggregate(pipe, p_path, keys=P_KEYS,
                             aggs={"turns": ("sum", "n_turns")}, versioned=True)
    p1.refresh()
    c1 = p1.child(c_path, keys=C_KEYS, aggs=["turns"])
    assert c1.refresh()["mode"] == "full"
    assert c1.refresh()["mode"] == "noop"
    # the parent evolves (filter added): its token changes, hence the
    # child's composite token changes too — one full rebuild each
    p2 = ContinuousAggregate(pipe, p_path, keys=P_KEYS,
                             aggs={"turns": ("sum", "n_turns")},
                             filter="n_turns > 1", versioned=True)
    assert p2.refresh()["mode"] == "full"
    c2 = p2.child(c_path, keys=C_KEYS, aggs=["turns"])
    assert c2.refresh()["mode"] == "full"
    direct = ContinuousAggregate(pipe, str(tmp_path / "direct"),
                                 keys=D_KEYS, aggs={"turns": ("sum", "n_turns")},
                                 filter="n_turns > 1")
    direct.refresh()
    _assert_same(c2, direct, ["month", "cohort"])


def test_hier_validation(spark, tmp_path):
    class _FakePipe:
        snapshots = True
        spark = None

    parent = ContinuousAggregate(
        _FakePipe(), str(tmp_path / "np"), keys=["conv_id"],
        aggs={"turns": ("sum", "n_turns"),
              "p50": ("percentile_qsk", "token_count_qsk", 0.5)},
    )
    with pytest.raises(ValueError, match="versioned=True parent"):
        HierarchicalAggregate(parent, str(tmp_path / "c"),
                              keys=["conv_id"], aggs=["turns"])
    vparent = ContinuousAggregate(
        _FakePipe(), str(tmp_path / "vp"), keys=["conv_id"],
        aggs={"turns": ("sum", "n_turns"),
              "p50": ("percentile_qsk", "token_count_qsk", 0.5)},
        versioned=True,
    )
    with pytest.raises(ValueError, match="no aggregate"):
        vparent.child(str(tmp_path / "c"), keys=["conv_id"], aggs=["nope"])
    with pytest.raises(ValueError, match="only valid for"):
        vparent.child(str(tmp_path / "c"), keys=["conv_id"],
                      aggs={"x": ("turns", 0.9)})
    with pytest.raises(ValueError, match="collides"):
        vparent.child(str(tmp_path / "c"), keys=["conv_id"],
                      aggs={"conv_id": "turns"})


def test_hier_read_realtime_folds_parent_changelog(spark, t0, tmp_path):
    """A child's read_realtime folds the parent partials' unconsumed
    changelog: after the parent refreshes (child stale), the child's live
    view equals its refresh-then-read — with nothing written under the
    child's path."""
    import os

    days = _days(t0)
    split = days[len(days) // 2]
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0.filter(F.to_date("ts") < F.lit(split)), stages=("hourly",))
    parent = ContinuousAggregate(pipe, str(tmp_path / "parent"),
                                 keys=P_KEYS, aggs=P_AGGS, versioned=True)
    parent.refresh()
    child = parent.child(str(tmp_path / "child"), keys=C_KEYS, aggs=C_AGGS)
    child.refresh()

    pipe.run(t0, stages=("hourly",))
    parent.refresh()

    def files(root):
        return sorted(
            (os.path.join(dp, fn), os.path.getmtime(os.path.join(dp, fn)))
            for dp, _, fns in os.walk(root) for fn in fns
        )

    before = files(str(tmp_path / "child"))
    rt = child.read_realtime().toPandas().sort_values(
        ["month", "cohort"], ignore_index=True)
    assert files(str(tmp_path / "child")) == before
    assert child.refresh()["mode"] == "incremental"
    pd.testing.assert_frame_equal(rt, _pdf(child, ["month", "cohort"]))
