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
