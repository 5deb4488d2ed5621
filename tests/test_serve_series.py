"""Series serving across retention drops (round-4 session 8):
serve_series_chunked must return the pre-drop hourly series bit-exactly,
routing present days to tier rows and dropped days to the pruned chunk
decode — nothing double-served at the boundary, metrics filter honored.
"""

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.api import TierEngine  # noqa: E402
from engine.gapfill import hourly_series  # noqa: E402
from engine.rollup import observed_state  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402

KEY = ["conv_id", "metric", "bucket_start"]


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("serve") / "root")
    eng = TierEngine(spark, root, lease=False)
    t0 = synth_transcripts(spark, n_convs=40, hot_turns=300)
    eng.run(t0)

    hourly = observed_state(eng.tier("hourly"))
    span = hourly.agg(
        F.min("bucket_start").alias("lo"), F.max("bucket_start").alias("hi")
    ).first()
    before = (
        hourly_series(hourly)
        .toPandas()
        .sort_values(KEY, ignore_index=True)
    )
    days = sorted(
        r["d"]
        for r in hourly.select(F.to_date("bucket_start").alias("d"))
        .distinct()
        .collect()
    )
    cutoff = str(days[len(days) // 2])
    dropped = eng.drop_hourly_before(cutoff)
    assert dropped, "retention must actually drop hourly days"
    return eng, before, span, cutoff


def _pdf(df):
    return (
        df.select(*KEY, "value").toPandas().sort_values(KEY, ignore_index=True)
    )


def test_full_span_equals_pre_drop(served):
    eng, before, span, _ = served
    lo = str(span["lo"])
    hi = str(span["hi"] + pd.Timedelta(hours=1))
    got = _pdf(eng.serve_series(lo, hi))
    pd.testing.assert_frame_equal(got, before[got.columns])


def test_dropped_only_window(served):
    """A window entirely inside the dropped region is served purely from
    chunk decode and still matches the pre-drop series."""
    eng, before, span, cutoff = served
    lo, hi = str(span["lo"]), f"{cutoff} 00:00:00"
    got = _pdf(eng.serve_series(lo, hi))
    exp = before[before["bucket_start"] < pd.Timestamp(hi)].reset_index(
        drop=True
    )
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got, exp[got.columns])
    # the tier genuinely has nothing there (the drop worked)
    assert (
        eng.tier("hourly")
        .filter(F.col("bucket_start") < F.lit(hi).cast("timestamp_ntz"))
        .count()
        == 0
    )


def test_metrics_filter(served):
    eng, before, span, _ = served
    lo = str(span["lo"])
    hi = str(span["hi"] + pd.Timedelta(hours=1))
    got = _pdf(eng.serve_series(lo, hi, metrics=["turn_rate"]))
    exp = before[before["metric"] == "turn_rate"].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp[got.columns])


def test_no_double_serving_at_boundary(served):
    eng, before, span, _ = served
    lo = str(span["lo"])
    hi = str(span["hi"] + pd.Timedelta(hours=1))
    got = eng.serve_series(lo, hi)
    assert got.groupBy(*KEY).count().filter(F.col("count") > 1).count() == 0
