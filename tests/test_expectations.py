"""Data-quality expectations (engine/expectations.py): compiled check
suites, null semantics (completeness vs validity), single-scan row-level
compilation, and the WAP publish gate integration."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.expectations import (  # noqa: E402
    ExpectationError,
    Suite,
    expect_expr,
    freshness,
    in_range,
    in_set,
    matches,
    not_null,
    ref_integrity,
    unique,
)


@pytest.fixture(scope="module")
def facts(spark):
    rows = [
        # id, status, price, prio, fk, ts
        (1, "O", 10.0, "1-URGENT", 100, "2026-01-01 00:00:00"),
        (1, "F", 20.0, "5-LOW", 101, "2026-01-01 06:00:00"),     # dup id
        (2, None, -5.0, "9-BAD", 999, "2026-01-01 07:00:00"),    # null status, range, regex, orphan
        (3, "X", None, None, None, "2025-12-25 00:00:00"),       # set, stale
        (None, "O", 30.0, "2-HIGH", 100, "2026-01-01 08:00:00"), # null id (not a dup)
    ]
    return spark.createDataFrame(
        rows,
        "id int, status string, price double, prio string, fk int, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame([(100,), (101,)], "k int")


def test_counts_and_null_semantics(spark, facts, dim):
    suite = Suite(
        [
            not_null("status"),
            in_range("price", 0, 100),
            in_set("status", ["O", "F"]),
            matches("prio", "^[1-5]-"),
            unique(["id"]),
            ref_integrity("fk", dim, "k"),
            freshness("ts", "2026-01-01 12:00:00", 24 * 3600),
        ]
    )
    rep = suite.check(facts)
    assert rep.rows_scanned == 5
    assert rep.violations == {
        "null_status": 1,      # row 2
        "range_price": 1,      # -5.0; NULL price skipped (validity)
        "set_status": 1,       # 'X'; NULL skipped
        "regex_prio": 1,       # '9-BAD'; NULL skipped
        "unique_id": 1,        # id=1 twice; NULL id is not a duplicate
        "ref_fk": 1,           # 999; NULL fk is not an orphan
        "fresh_ts": 1,         # 2025-12-25 is >24h before now
    }
    assert rep.failed == rep.violations and not rep.passed


def test_tolerances_and_pass(spark, facts, dim):
    suite = Suite(
        [
            not_null("status", max_violations=1),
            in_range("price", 0, 100, max_violations=5),
            expect_expr("neg_id", "id < 0"),
        ]
    )
    rep = suite.check(facts)
    assert rep.passed and rep.failed == {}
    assert rep.violations["neg_id"] == 0


def test_row_checks_compile_to_one_scan(spark, facts, tmp_path):
    """All row-level checks share a single pass: one scan, one partial+final
    conditional aggregation — no per-check jobs."""
    p = str(tmp_path / "facts")
    facts.write.parquet(p)
    df = spark.read.parquet(p)
    suite = Suite(
        [not_null("status"), in_range("price", 0, 100), matches("prio", "^[1-5]-")]
    )
    plan = suite.summary(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


def test_duplicate_check_names_rejected():
    with pytest.raises(ValueError):
        Suite([not_null("a"), not_null("a")])


def test_wap_audit_gates_publish(spark, tmp_path):
    """A failing suite vetoes the WAP seal (published tables + manifest
    untouched); the same run with a passing suite publishes and records the
    report."""
    from engine.pipeline import TierPipeline
    from engine.synth import synth_transcripts

    t0 = synth_transcripts(spark, n_convs=10, hot_turns=80).localCheckpoint()
    root = str(tmp_path / "dq")
    # impossible bar: every hourly bucket must hold >= 1000 turns
    bad = Suite([in_range("n_turns", 1000, 10**9)]).as_wap_audit("hourly")
    pipe = TierPipeline(spark, root, snapshots=True, wap=True, wap_audit=bad)
    with pytest.raises(ExpectationError):
        pipe.run(t0)
    assert pipe.manifest.read().count() == 0
    assert pipe._store(pipe.tier_path("hourly")).current_id() is None

    good = Suite(
        [in_range("n_turns", 1, 10**9), not_null("conv_id")]
    ).as_wap_audit("hourly")
    ok = TierPipeline(spark, root, snapshots=True, wap=True, wap_audit=good)
    res = ok.run(t0)
    assert res["stages"]["hourly"] > 0
    assert ok.read_tier("hourly").count() > 0


def test_streaming_triggers_gated_by_expectations(spark, tmp_path):
    """Streaming × WAP × DQ: each micro-batch trigger seals through the
    expectations audit. A suite the data satisfies publishes every
    trigger; an impossible suite vetoes the FIRST trigger, so nothing
    ever publishes."""
    from engine.pipeline import TierPipeline
    from engine.streaming import run_stream_into_pipeline
    from engine.synth import synth_transcripts

    t0 = synth_transcripts(spark, n_convs=10, hot_turns=80)
    src = str(tmp_path / "src")
    t0.orderBy("ts").coalesce(1).write.parquet(src + "_one")
    spark.read.parquet(src + "_one").repartitionByRange(10, "ts").write.parquet(src)

    good = Suite([not_null("conv_id"), in_range("n_turns", 1, 10**9)])
    ok = TierPipeline(
        spark, str(tmp_path / "ok"), snapshots=True, wap=True,
        wap_audit=good.as_wap_audit("hourly"),
    )
    out = run_stream_into_pipeline(spark, src, ok, raw_path=str(tmp_path / "r1"))
    assert out["batches"] >= 2
    assert ok.read_tier("hourly").count() > 0

    bad = Suite([in_range("n_turns", 10**6, 10**9)])
    veto = TierPipeline(
        spark, str(tmp_path / "veto"), snapshots=True, wap=True,
        wap_audit=bad.as_wap_audit("hourly"),
    )
    try:
        run_stream_into_pipeline(
            spark, src, veto, raw_path=str(tmp_path / "r2"), timeout_s=400
        )
        raised = ""
    except Exception as e:  # StreamingQueryException wraps the audit error
        raised = str(e)
    assert "expectations failed" in raised, raised[:500]
    assert veto.manifest.read().count() == 0
    assert veto._store(veto.tier_path("hourly")).current_id() is None
