"""Gap-fill tests (SURVEY.md §5.4): golden series with leading/interior/
trailing gaps + parity vs pandas ffill/interpolate on synthetic data."""

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from engine.gapfill import (  # noqa: E402
    bucket_spine,
    gapfill_linear,
    gapfill_locf,
    hourly_series,
)
from engine.rollup import rollup_hourly  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402

KEY = ["conv_id", "metric", "bucket_start"]


def _golden(spark):
    # conv A: observed hours 0, 3 (interior gap of 2), conv B: single point
    rows = [
        ("A", "2026-01-01 00:00:00", "m", 1.0),
        ("A", "2026-01-01 03:00:00", "m", 7.0),
        ("B", "2026-01-05 10:00:00", "m", 5.0),
    ]
    df = spark.createDataFrame(rows, "conv_id string, b string, metric string, value double")
    return df.select(
        "conv_id",
        df.b.cast("timestamp_ntz").alias("bucket_start"),
        "metric",
        "value",
    )


def test_spine_dense_and_bounded(spark):
    obs = _golden(spark)
    spine = bucket_spine(obs).toPandas()
    a = spine[spine.conv_id == "A"]["bucket_start"].sort_values()
    assert len(a) == 4  # hours 0,1,2,3
    assert (a.diff().dropna() == pd.Timedelta(hours=1)).all()
    assert len(spine[spine.conv_id == "B"]) == 1


def test_locf_golden(spark):
    out = (
        gapfill_locf(_golden(spark)).toPandas().sort_values(KEY, ignore_index=True)
    )
    a = out[out.conv_id == "A"].reset_index(drop=True)
    assert list(a["value"]) == [1.0, 1.0, 1.0, 7.0]
    assert list(a["filled"]) == [False, True, True, False]
    assert list(a["fill_method"].fillna("")) == ["", "locf", "locf", ""]


def test_linear_golden(spark):
    out = (
        gapfill_linear(_golden(spark)).toPandas().sort_values(KEY, ignore_index=True)
    )
    a = out[out.conv_id == "A"].reset_index(drop=True)
    assert list(a["value"]) == [1.0, 3.0, 5.0, 7.0]
    assert list(a["filled"]) == [False, True, True, False]
    assert list(a["fill_method"].fillna("")) == ["", "linear", "linear", ""]


@pytest.fixture(scope="module")
def observed(spark):
    t0 = synth_transcripts(spark, n_convs=60, hot_turns=400)
    obs = hourly_series(rollup_hourly(t0), metrics=["turn_rate"])
    obs.cache().count()
    return obs


def _pandas_fill(obs_pdf: pd.DataFrame, how: str) -> pd.DataFrame:
    outs = []
    for (cid, m), g in obs_pdf.groupby(["conv_id", "metric"]):
        g = g.set_index("bucket_start").sort_index()
        full = g.reindex(
            pd.date_range(g.index.min(), g.index.max(), freq="h"), method=None
        )
        if how == "locf":
            full["value"] = full["value"].ffill()
        else:
            full["value"] = full["value"].interpolate("linear", limit_area="inside")
        full["conv_id"], full["metric"] = cid, m
        outs.append(full.rename_axis("bucket_start").reset_index())
    return pd.concat(outs, ignore_index=True)


@pytest.mark.parametrize("how", ["locf", "linear"])
def test_parity_vs_pandas(spark, observed, how):
    fn = gapfill_locf if how == "locf" else gapfill_linear
    got = fn(observed).toPandas().sort_values(KEY, ignore_index=True)
    obs = observed.toPandas()
    exp = _pandas_fill(obs, how).sort_values(KEY, ignore_index=True)
    assert len(got) == len(exp)
    ok = (got["value"].to_numpy() == exp["value"].to_numpy()) | (
        got["value"].isna() & exp["value"].isna()
    ).to_numpy()
    assert ok.all(), f"{how}: {(~ok).sum()} mismatches"
    # filled marks exactly the spine holes (buckets absent from observed)
    obs_keys = set(zip(obs.conv_id, obs.metric, obs.bucket_start))
    expected_filled = [
        k not in obs_keys
        for k in zip(got.conv_id, got.metric, got.bucket_start)
    ]
    assert list(got["filled"]) == expected_filled, how
    # fill_method is stamped iff a fill VALUE was produced (both methods)
    has_method = got["fill_method"].notna()
    produced = got["filled"].to_numpy() & got["value"].notna().to_numpy()
    assert (has_method.to_numpy() == produced).all(), how
