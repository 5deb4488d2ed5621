"""Streaming tier tests (SURVEY.md §5 / M10): availableNow micro-batch
hourly aggregate equals the batch leaf rollup; stateful replay-dedup."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.rollup import rollup_hourly  # noqa: E402
from engine.streaming import (  # noqa: E402
    run_dedup_stream,
    run_hourly_stream,
    read_stream_tier,
)
from engine.synth import synth_transcripts  # noqa: E402

STATE = ["n_turns", "token_sum", "token_min", "token_max",
         "tool_sum", "tool_min", "tool_max"]
KEY = ["conv_id", "bucket_start"]


@pytest.fixture(scope="module")
def t0_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("stream") / "t0")
    t0 = synth_transcripts(spark, n_convs=40, hot_turns=300)
    # several files so availableNow takes multiple micro-batches
    t0.repartition(8).write.parquet(p)
    return p


def test_stream_hourly_equals_batch(spark, t0_path, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_hourly_stream(spark, t0_path, out, ckpt)
    got = (
        read_stream_tier(spark, out)
        .select(*KEY, *STATE)
        .toPandas()
        .sort_values(KEY, ignore_index=True)
    )
    exp = (
        rollup_hourly(spark.read.parquet(t0_path))
        .select(*KEY, *STATE)
        .toPandas()
        .sort_values(KEY, ignore_index=True)
    )
    assert got.equals(exp), (
        f"stream/batch divergence: {len(got)} vs {len(exp)} rows"
    )


def test_stream_resume_is_incremental(spark, t0_path, tmp_path):
    """Restarting the availableNow stream with an unchanged input is a no-op
    (checkpoint holds the file offsets)."""
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    run_hourly_stream(spark, t0_path, out, ckpt)
    n1 = spark.read.parquet(out).count()
    run_hourly_stream(spark, t0_path, out, ckpt)
    n2 = spark.read.parquet(out).count()
    assert n2 == n1


def test_dedup_stream_removes_replays(spark, tmp_path):
    src = str(tmp_path / "dupsrc")
    t0 = synth_transcripts(spark, n_convs=10, hot_turns=50)
    t0.unionByName(t0).repartition(4).write.parquet(src)  # exact replays
    out = str(tmp_path / "dupout")
    ckpt = str(tmp_path / "dupckpt")
    run_dedup_stream(spark, src, out, ckpt)
    got = spark.read.parquet(out)
    n_unique = t0.select("conv_id", "turn_idx").distinct().count()
    assert got.count() == n_unique
    assert got.groupBy("conv_id", "turn_idx").count().filter(
        F.col("count") > 1
    ).count() == 0


def test_running_totals_stateful_stream(spark, t0_path, tmp_path):
    """J6 applyInPandasWithState: state accumulates across micro-batches —
    the FINAL emitted running total per conv equals the batch aggregate, and
    multiple emissions per conv prove the state actually crossed batches."""
    from engine.streaming import run_running_totals_stream

    out = str(tmp_path / "rt_out")
    ckpt = str(tmp_path / "rt_ckpt")
    run_running_totals_stream(spark, t0_path, out, ckpt)
    emitted = spark.read.parquet(out)
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy(F.desc("batch_id"))
    final = (
        emitted.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("conv_id", "n_turns_total", "token_sum_total")
        .toPandas()
        .sort_values("conv_id", ignore_index=True)
    )
    exp = (
        spark.read.parquet(t0_path)
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns_total"),
            F.sum(F.length("text").cast("long")).alias("token_sum_total"),
        )
        .toPandas()
        .sort_values("conv_id", ignore_index=True)
    )
    assert final.equals(exp), "stateful stream totals != batch aggregate"
    # state must have been carried across >1 micro-batch for some conv
    multi = emitted.groupBy("conv_id").count().filter(F.col("count") > 1).count()
    assert multi > 0, "expected multiple micro-batch emissions per conv"


def test_sliding_stream_equals_batch(spark, t0_path, tmp_path):
    """C3 streaming: the sliding-window stream matches the same hopping
    aggregate computed in batch (explode the slide offsets)."""
    from pyspark.sql import Window

    from engine.streaming import run_sliding_stream

    out = str(tmp_path / "slide_out")
    ckpt = str(tmp_path / "slide_ckpt")
    run_sliding_stream(spark, t0_path, out, ckpt,
                       size="1 hour", slide="15 minutes")
    raw = spark.read.parquet(out)
    w = Window.partitionBy("conv_id", "win_start").orderBy(F.desc("batch_id"))
    got = (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("conv_id", "win_start", *STATE)
        .toPandas()
        .sort_values(["conv_id", "win_start"], ignore_index=True)
    )
    t0 = spark.read.parquet(t0_path).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    exp = (
        t0.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "conv_id"
        )
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length("text").cast("long")).alias("token_sum"),
            F.min(F.length("text").cast("long")).alias("token_min"),
            F.max(F.length("text").cast("long")).alias("token_max"),
            F.sum(F.col("tool").isNotNull().cast("long")).alias("tool_sum"),
            F.min(F.col("tool").isNotNull().cast("long")).alias("tool_min"),
            F.max(F.col("tool").isNotNull().cast("long")).alias("tool_max"),
        )
        .select(
            "conv_id",
            F.col("w.start").cast("timestamp_ntz").alias("win_start"),
            *STATE,
        )
        .toPandas()
        .sort_values(["conv_id", "win_start"], ignore_index=True)
    )
    assert len(got) == len(exp) > 0
    assert got.equals(exp), "sliding stream/batch divergence"


def test_stream_into_pipeline_end_to_end(spark, tmp_path):
    """EP1: micro-batch ingest feeding the resumable batch pipeline. Final
    tiers equal a one-shot batch run over the full data, and each trigger
    re-rolls only the partitions its batch touched (fingerprint diff), not
    the world."""
    import pandas as pd

    from engine.pipeline import TierPipeline
    from engine.rollup import tier_view
    from engine.streaming import run_stream_into_pipeline
    from engine.synth import synth_transcripts

    t0 = synth_transcripts(spark, n_convs=30, hot_turns=200)
    src = str(tmp_path / "src")
    # many small files -> several micro-batches (maxFilesPerTrigger=4),
    # ordered by time so later triggers touch mostly-new days
    t0.orderBy("ts").coalesce(1).write.parquet(src + "_one")
    spark.read.parquet(src + "_one").repartitionByRange(12, "ts").write.parquet(src)

    pipe = TierPipeline(spark, str(tmp_path / "sp"))
    out = run_stream_into_pipeline(
        spark, src, pipe, raw_path=str(tmp_path / "raw")
    )
    assert out["batches"] >= 2, out
    total_day_rolls = sum(r.get("hourly", 0) for r in out["stage_rolls"])
    n_days = pipe.manifest.committed_keys("hourly").count()
    # triggers re-roll a day only when it gains rows; file ranges overlap at
    # boundaries, so total rolls sit between n_days and n_days + batches
    assert n_days <= total_day_rolls <= n_days + out["batches"], (
        total_day_rolls, n_days, out
    )

    ref = TierPipeline(spark, str(tmp_path / "ref"))
    ref.run(t0)
    key = ["conv_id", "bucket_start"]
    got = (
        tier_view(pipe.read_tier("monthly"), "monthly")
        .toPandas().sort_values(key, ignore_index=True)
    )
    exp = (
        tier_view(ref.read_tier("monthly"), "monthly")
        .toPandas().sort_values(key, ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_stream_into_snapshot_pipeline_composes(spark, tmp_path):
    """Streaming ingest × snapshot-versioned storage: every trigger's
    pipeline run publishes CoW snapshots and seals a cross-table run
    barrier, so ANY past trigger's consistent view stays replayable while
    the stream keeps appending — and the final tiers still equal a one-shot
    batch run."""
    import pandas as pd

    from engine.pipeline import TierPipeline
    from engine.rollup import tier_view
    from engine.streaming import run_stream_into_pipeline
    from engine.synth import synth_transcripts

    t0 = synth_transcripts(spark, n_convs=30, hot_turns=200)
    src = str(tmp_path / "src")
    t0.orderBy("ts").coalesce(1).write.parquet(src + "_one")
    spark.read.parquet(src + "_one").repartitionByRange(12, "ts").write.parquet(src)

    pipe = TierPipeline(spark, str(tmp_path / "sp"), snapshots=True)
    out = run_stream_into_pipeline(
        spark, src, pipe, raw_path=str(tmp_path / "raw")
    )
    assert out["batches"] >= 2, out
    # the FIRST trigger's sealed view: a strict prefix of the final state,
    # still consistent and replayable after all later triggers
    first = pipe.read_consistent("stream-0")
    n_first = first["hourly"].count()
    n_final = pipe.read_tier("hourly").count()
    assert 0 < n_first < n_final
    # replayability: the sealed view is bit-stable — reading it again after
    # every later trigger (and comparing full frames) changes nothing. (A
    # subset-of-final claim would be false: the trigger-boundary hour is
    # legitimately rewritten when the next batch adds turns to it.)
    cols = sorted(first["hourly"].columns)
    p1 = (
        first["hourly"].toPandas().reindex(cols, axis=1)
        .sort_values(cols, ignore_index=True)
    )
    p2 = (
        pipe.read_consistent("stream-0")["hourly"].toPandas()
        .reindex(cols, axis=1).sort_values(cols, ignore_index=True)
    )
    pd.testing.assert_frame_equal(p2, p1)
    # final tiers equal the one-shot batch reference
    ref = TierPipeline(spark, str(tmp_path / "ref"))
    ref.run(t0)
    key = ["conv_id", "bucket_start"]
    got = (
        tier_view(pipe.read_tier("monthly"), "monthly")
        .toPandas().sort_values(key, ignore_index=True)
    )
    exp = (
        tier_view(ref.read_tier("monthly"), "monthly")
        .toPandas().sort_values(key, ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_stream_into_wap_pipeline_composes(spark, tmp_path):
    """WAP × streaming: every trigger stages its whole re-roll unpublished
    and seals atomically, so a reader polling the published tables between
    triggers only ever sees whole sealed runs; final tiers equal batch."""
    import pandas as pd

    from engine.pipeline import TierPipeline
    from engine.rollup import tier_view
    from engine.streaming import run_stream_into_pipeline
    from engine.synth import synth_transcripts

    t0 = synth_transcripts(spark, n_convs=20, hot_turns=150)
    src = str(tmp_path / "src")
    t0.orderBy("ts").coalesce(1).write.parquet(src + "_one")
    spark.read.parquet(src + "_one").repartitionByRange(8, "ts").write.parquet(src)

    pipe = TierPipeline(
        spark, str(tmp_path / "wp"), snapshots=True, wap=True
    )
    out = run_stream_into_pipeline(
        spark, src, pipe, raw_path=str(tmp_path / "raw")
    )
    assert out["batches"] >= 2, out
    # every published hourly snapshot came through a WAP seal
    from engine.snapstore import SnapStore

    store = SnapStore(pipe.tier_path("hourly"))
    assert all(
        store.meta(s).get("published") for s in store.snapshot_ids()
    )
    ref = TierPipeline(spark, str(tmp_path / "ref"))
    ref.run(t0)
    key = ["conv_id", "bucket_start"]
    got = (
        tier_view(pipe.read_tier("monthly"), "monthly")
        .toPandas().sort_values(key, ignore_index=True)
    )
    exp = (
        tier_view(ref.read_tier("monthly"), "monthly")
        .toPandas().sort_values(key, ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_stream_wap_trigger_veto_then_resume(spark, tmp_path):
    """WAP × streaming, the veto half (VERDICT r3 #5): a per-trigger audit
    veto must abort THAT trigger's staged snapshots and buffered manifest
    rows — published tables and manifest stay exactly at the last sealed
    trigger — and a later stream restart (same checkpoint) re-delivers the
    batch and converges to the one-shot batch reference."""
    import pandas as pd

    from engine.pipeline import TierPipeline
    from engine.rollup import tier_view
    from engine.snapstore import SnapStore
    from engine.streaming import run_stream_into_pipeline
    from engine.synth import synth_transcripts
    from pyspark.sql import functions as F

    t0 = synth_transcripts(spark, n_convs=20, hot_turns=150)
    src = str(tmp_path / "src")
    t0.orderBy("ts").coalesce(1).write.parquet(src + "_one")
    spark.read.parquet(src + "_one").repartitionByRange(8, "ts").write.parquet(src)
    root = str(tmp_path / "wp")
    raw = str(tmp_path / "raw")

    calls = {"n": 0}

    def audit(p):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("quality veto")

    vetoed = TierPipeline(spark, root, snapshots=True, wap=True, wap_audit=audit)
    try:
        # generous timeout: host CPU-steal bursts can stretch trigger 1
        # past the default 120s, which would end the stream before the
        # veto fires and fail the test for the wrong reason
        run_stream_into_pipeline(spark, src, vetoed, raw_path=raw, timeout_s=400)
        raised = False
    except Exception:
        raised = True
    assert raised and calls["n"] >= 2
    # published state is exactly the first sealed trigger: one snapshot per
    # table, all published, and no manifest row from the vetoed run
    probe = TierPipeline(spark, root, snapshots=True, wap=True)
    m = probe.manifest.read()
    assert m.filter(F.col("run_id") == "stream-1").count() == 0
    assert m.filter(F.col("run_id") == "stream-0").count() > 0
    for n in probe.TABLE_NAMES:
        store = SnapStore(probe.table_path(n))
        if store.current_id() is None:
            continue
        assert all(store.meta(s).get("published") for s in store.snapshot_ids()), n
    before = (
        tier_view(probe.read_tier("monthly"), "monthly")
        .toPandas().sort_values(["conv_id", "bucket_start"], ignore_index=True)
    )

    # resume: fresh pipe, no veto, same checkpoint — the failed batch is
    # re-delivered (its raw append re-applies; dedup_turns makes it
    # idempotent) and the stream drains to the batch-equivalent end state
    ok = TierPipeline(spark, root, snapshots=True, wap=True)
    out = run_stream_into_pipeline(spark, src, ok, raw_path=raw)
    assert out["batches"] >= 1
    ref = TierPipeline(spark, str(tmp_path / "ref"))
    ref.run(t0)
    key = ["conv_id", "bucket_start"]
    got = (
        tier_view(ok.read_tier("monthly"), "monthly")
        .toPandas().sort_values(key, ignore_index=True)
    )
    exp = (
        tier_view(ref.read_tier("monthly"), "monthly")
        .toPandas().sort_values(key, ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    assert not got.equals(before)  # the veto really had blocked progress


def test_cusum_stream_equals_batch_recurrence(spark, tmp_path):
    """Streaming CUSUM (applyInPandasWithState) fed in event-time order ==
    the literal batch recurrence per conversation; state provably crosses
    micro-batches (multiple emissions, monotone alert counts)."""
    import os
    import shutil

    import numpy as np

    from pyspark.sql import Window

    from engine.streaming import (
        STREAM_CUSUM_SLACK,
        STREAM_CUSUM_TARGET,
        STREAM_CUSUM_THRESH,
        run_cusum_stream,
    )
    from engine.synth import synth_transcripts

    t0 = synth_transcripts(spark, n_convs=8, hot_turns=120)
    inp = tmp_path / "cusum_in"
    inp.mkdir()
    days = [
        r["d"]
        for r in t0.select(F.to_date("ts").alias("d")).distinct().orderBy("d").collect()
    ]
    for i, d in enumerate(days):
        stage = str(tmp_path / f"stage_{i}")
        (
            t0.filter(F.to_date("ts") == F.lit(d))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        dst = str(inp / f"day_{i:03d}.parquet")
        shutil.move(os.path.join(stage, part), dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))  # mtime order

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_cusum_stream(spark, str(inp), out, ckpt)
    emitted = spark.read.parquet(out)
    w = Window.partitionBy("conv_id").orderBy(F.desc("batch_id"))
    final = (
        emitted.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .toPandas()
        .set_index("conv_id")
    )

    pdf = t0.select("conv_id", "ts", "turn_idx", F.length("text").alias("L")).toPandas()
    for cid, g in pdf.groupby("conv_id"):
        g = g.sort_values(["ts", "turn_idx"])
        s, alerts, mx = 0, 0, 0
        for L in g["L"]:
            s = max(0, s + int(L) - STREAM_CUSUM_TARGET - STREAM_CUSUM_SLACK)
            alerts += s > STREAM_CUSUM_THRESH
            mx = max(mx, s)
        assert final.loc[cid, "cusum"] == s, cid
        assert final.loc[cid, "n_alerts"] == alerts, cid
        assert final.loc[cid, "max_cusum"] == mx, cid

    # state crossed micro-batches, and per-conv alert counts never decrease
    per = emitted.groupBy("conv_id").count().toPandas()
    assert (per["count"] > 1).any()
    mono = emitted.toPandas().sort_values("batch_id")
    for cid, g in mono.groupby("conv_id"):
        assert (np.diff(g["n_alerts"].to_numpy()) >= 0).all(), cid


def test_stream_stream_interval_join_equals_batch(spark, t0_path, tmp_path):
    """J8: the stream-stream event-time interval join (tool invocations x
    preceding user turns, self-join of the transcript stream) must produce
    exactly the batch join's pairs across micro-batch boundaries."""
    from engine.streaming import batch_tool_context_join, run_tool_context_stream

    out = str(tmp_path / "ssj")
    ckpt = str(tmp_path / "ssj-ckpt")
    run_tool_context_stream(spark, t0_path, out, ckpt)
    cols = ["conv_id", "tool_turn", "user_turn", "tool", "user_chars"]
    got = (
        spark.read.parquet(out)
        .select(*cols)
        .toPandas()
        .sort_values(cols, ignore_index=True)
    )
    exp = (
        batch_tool_context_join(spark.read.parquet(t0_path))
        .select(*cols)
        .toPandas()
        .sort_values(cols, ignore_index=True)
    )
    assert len(exp) > 0, "fixture produced no tool/user pairs"
    assert got.equals(exp), f"stream {len(got)} rows vs batch {len(exp)}"


def test_stream_stream_left_outer_join_equals_batch(spark, t0_path, tmp_path):
    """J9: the LEFT OUTER stream-stream join must emit unmatched tool rows
    (null user columns) exactly once the watermark closes them. A flush
    row pair at far-future event time advances both sides' watermarks past
    all real data, so the availableNow result must equal the batch left
    join row-for-row — including every unmatched row."""
    import datetime

    from engine.streaming import batch_tool_context_join, run_tool_context_stream

    t0 = spark.read.parquet(t0_path)
    max_ts = t0.agg(F.max("ts")).collect()[0][0]
    flush_ts = max_ts + datetime.timedelta(hours=4)
    flush = spark.createDataFrame(
        [
            ("__flush__", 0, "user", "flush", None, flush_ts),
            ("__flush__", 1, "assistant", "flush", "__flush__", flush_ts),
        ],
        t0.schema,
    )
    inp = str(tmp_path / "ssj-left-in")
    t0.unionByName(flush).repartition(6).write.parquet(inp)

    out = str(tmp_path / "ssj-left")
    ckpt = str(tmp_path / "ssj-left-ckpt")
    lookback = 2  # minutes — small enough that some tool turns go unmatched
    run_tool_context_stream(
        spark, inp, out, ckpt, lookback_minutes=lookback, how="left_outer"
    )
    cols = ["conv_id", "tool_turn", "user_turn", "tool", "user_chars"]
    got = (
        spark.read.parquet(out)
        .filter(F.col("conv_id") != "__flush__")
        .select(*cols)
        .toPandas()
        .sort_values(cols, ignore_index=True)
    )
    exp = (
        batch_tool_context_join(t0, lookback_minutes=lookback, how="left_outer")
        .select(*cols)
        .toPandas()
        .sort_values(cols, ignore_index=True)
    )
    n_unmatched = int(exp["user_turn"].isna().sum())
    assert n_unmatched > 0, "lookback left no unmatched tool rows — weak test"
    assert n_unmatched < len(exp), "no matched pairs — weak test"
    assert got.equals(exp), (
        f"stream {len(got)} rows vs batch {len(exp)} "
        f"({n_unmatched} unmatched expected)"
    )


def test_stream_into_pipeline_carries_new_state_families(spark, tmp_path):
    """Streaming ingest × the M49/M50/M52 tier states: per-trigger
    fingerprint re-rolls must rebuild the ordered-monoid / sketch / top-N
    state of exactly the touched days, so the final monthly state equals
    a one-shot batch run bit-for-bit — a day split across triggers would
    expose any partial-state merge bug."""
    from engine.pipeline import TierPipeline
    from engine.streaming import run_stream_into_pipeline
    from engine.synth import synth_transcripts

    t0 = synth_transcripts(spark, n_convs=20, hot_turns=150)
    src = str(tmp_path / "src")
    t0.orderBy("ts").coalesce(1).write.parquet(src + "_one")
    spark.read.parquet(src + "_one").repartitionByRange(8, "ts").write.parquet(src)

    opts = dict(
        twa_cols=["token_count"],
        qsk_cols=["token_count"],
        topn_cols={"token_count": 3},
        fill_tiers=False,
    )
    pipe = TierPipeline(spark, str(tmp_path / "sp"), **opts)
    out = run_stream_into_pipeline(
        spark, src, pipe, raw_path=str(tmp_path / "raw")
    )
    assert out["batches"] >= 2, out
    ref = TierPipeline(spark, str(tmp_path / "ref"), **opts)
    ref.run(t0)

    def snap(df):
        return sorted(
            (
                r["conv_id"],
                str(r["bucket_start"]),
                tuple(r["twa_token_count"]),
                tuple(sorted(r["token_count_qsk"].items())),
                tuple(tuple(s) for s in r["token_count_top3"]),
            )
            for r in df.select(
                "conv_id", "bucket_start", "twa_token_count",
                "token_count_qsk", "token_count_top3",
            ).collect()
        )

    assert snap(pipe.read_tier("monthly")) == snap(ref.read_tier("monthly"))


def test_stream_refreshes_caggs_per_trigger(spark, tmp_path):
    """Streaming ingest × continuous aggregates: views passed to
    run_stream_into_pipeline refresh after EVERY trigger's pipeline run
    (parents before children), and the final hierarchy equals views built
    in one shot on a batch pipeline — the streaming materialized-view
    pattern with per-trigger changelog consumption."""
    import pandas as pd

    from engine.cagg import ContinuousAggregate
    from engine.pipeline import TierPipeline
    from engine.streaming import run_stream_into_pipeline
    from engine.synth import synth_transcripts

    t0 = synth_transcripts(spark, n_convs=30, hot_turns=200)
    src = str(tmp_path / "src")
    t0.orderBy("ts").coalesce(1).write.parquet(src + "_one")
    spark.read.parquet(src + "_one").repartitionByRange(12, "ts").write.parquet(src)

    keys = {"week": "date_trunc('week', bucket_start)",
            "cohort": "substr(conv_id, length(conv_id), 1)"}
    aggs = {"turns": ("sum", "n_turns"), "hours": ("count",)}
    pipe = TierPipeline(spark, str(tmp_path / "sp"), snapshots=True)
    parent = ContinuousAggregate(pipe, str(tmp_path / "vp"), keys=keys,
                                 aggs=aggs, versioned=True)
    child = parent.child(str(tmp_path / "vc"), keys={"cohort": "cohort"},
                         aggs=["turns", "hours"])
    out = run_stream_into_pipeline(
        spark, src, pipe, raw_path=str(tmp_path / "raw"),
        caggs=[child, parent],  # misordered on purpose — depth sort fixes
    )
    assert out["batches"] >= 2
    assert len(out["cagg_rolls"]) == out["batches"]
    assert out["cagg_rolls"][0][parent.path] == "full"
    assert all(
        r[parent.path] == "incremental" for r in out["cagg_rolls"][1:]
    )

    ref = TierPipeline(spark, str(tmp_path / "ref"), snapshots=True)
    ref.run(t0)
    rp = ContinuousAggregate(ref, str(tmp_path / "rp"), keys=keys,
                             aggs=aggs, versioned=True)
    rp.refresh()
    rc = rp.child(str(tmp_path / "rc"), keys={"cohort": "cohort"},
                  aggs=["turns", "hours"])
    rc.refresh()
    for got_v, exp_v, k in ((parent, rp, ["week", "cohort"]),
                            (child, rc, ["cohort"])):
        got = got_v.read().toPandas().sort_values(k, ignore_index=True)
        exp = exp_v.read().toPandas().sort_values(k, ignore_index=True)
        pd.testing.assert_frame_equal(got, exp)
