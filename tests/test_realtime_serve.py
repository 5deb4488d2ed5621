"""Real-time continuous-aggregate serving (engine/rewrite.py
serve_hourly_realtime): seam invariants the driver's hash gate can't
isolate — mid-bucket watermark refusal and the materializer-ran-ahead
overlap guard."""

import sys
from datetime import datetime
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.pipeline import TierPipeline  # noqa: E402
from engine.rewrite import serve_hourly_realtime  # noqa: E402
from engine.rollup import rollup_hourly  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402


@pytest.fixture(scope="module")
def t0(spark):
    df = synth_transcripts(spark, n_convs=20, hot_turns=200)
    df.cache().count()
    return df


def _key(df):
    return {
        (r["conv_id"], r["bucket_start"]): (r["n_turns"], r["token_sum"])
        for r in df.collect()
    }


def test_serve_equals_full_recompute(spark, t0, tmp_path):
    wm = t0.agg(
        F.date_trunc("day", F.max("ts")).cast("timestamp_ntz").alias("w")
    ).first()["w"]
    pipe = TierPipeline(spark, str(tmp_path / "rt"), fill_tiers=False)
    pipe.run(
        t0.filter(F.col("ts").cast("timestamp_ntz") < F.lit(wm)),
        stages=("hourly",),
    )
    served = serve_hourly_realtime(pipe.read_tier("hourly"), t0, wm)
    full = rollup_hourly(t0).select(*served.columns)
    assert _key(served) == _key(full)
    # the seam actually has rows on both sides
    assert served.filter(F.col("bucket_start") >= F.lit(wm)).count() > 0
    assert served.filter(F.col("bucket_start") < F.lit(wm)).count() > 0


def test_serve_drops_ran_ahead_tier_rows(spark, t0, tmp_path):
    """A materializer that ran PAST the watermark must not double-count
    against the raw tail: tier rows at/after the watermark are dropped."""
    wm = t0.agg(
        F.date_trunc("day", F.max("ts")).cast("timestamp_ntz").alias("w")
    ).first()["w"]
    pipe = TierPipeline(spark, str(tmp_path / "ahead"), fill_tiers=False)
    pipe.run(t0, stages=("hourly",))  # materialized EVERYTHING, incl. tail
    served = serve_hourly_realtime(pipe.read_tier("hourly"), t0, wm)
    full = rollup_hourly(t0).select(*served.columns)
    assert _key(served) == _key(full)


def test_serve_refuses_mid_bucket_watermark(spark, t0, tmp_path):
    pipe = TierPipeline(spark, str(tmp_path / "mid"), fill_tiers=False)
    pipe.run(t0, stages=("hourly",))
    with pytest.raises(ValueError, match="hour-aligned"):
        serve_hourly_realtime(
            pipe.read_tier("hourly"), t0, datetime(2026, 1, 5, 12, 30)
        )


def test_serve_over_stream_built_tiers(spark, tmp_path):
    """Composition: tiers built by micro-batch streaming ingest
    (run_stream_into_pipeline) serve a real-time view that equals a full
    recompute over everything streamed — the lambda seam closed from the
    streaming side too (the ran-ahead guard drops tier rows past the
    watermark, the raw tail comes from the stream's accumulated ingest
    table)."""
    from engine.streaming import run_stream_into_pipeline

    t0 = synth_transcripts(spark, n_convs=20, hot_turns=150)
    src = str(tmp_path / "src")
    t0.orderBy("ts").coalesce(1).write.parquet(src + "_one")
    spark.read.parquet(src + "_one").repartitionByRange(
        8, "ts"
    ).write.parquet(src)

    pipe = TierPipeline(spark, str(tmp_path / "sp"), fill_tiers=False)
    out = run_stream_into_pipeline(
        spark, src, pipe, raw_path=str(tmp_path / "raw")
    )
    assert out["batches"] >= 2, out

    raw = spark.read.parquet(str(tmp_path / "raw"))
    wm = raw.agg(
        F.date_trunc("day", F.max("ts")).cast("timestamp_ntz").alias("w")
    ).first()["w"]
    served = serve_hourly_realtime(pipe.read_tier("hourly"), raw, wm)
    full = rollup_hourly(raw).select(*served.columns)
    assert _key(served) == _key(full)
