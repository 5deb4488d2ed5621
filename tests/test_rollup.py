"""Tier-parity tests (SURVEY.md §5.2): every (conv_id, bucket, metric, agg)
at every tier equals the single-node pandas oracle BIT-EXACTLY, and
compose-from-lower-tier equals recompute-from-raw."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from engine.rollup import build_tiers, rollup_hourly, rollup_up, tier_view  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402
from tests import oracle_pandas as oracle  # noqa: E402

KEY = ["conv_id", "bucket_start"]


@pytest.fixture(scope="module")
def t0(spark):
    df = synth_transcripts(spark, n_convs=200, hot_turns=400)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def t0_pdf(t0):
    return t0.toPandas()


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(KEY, ignore_index=True)


def test_synth_spans_three_months(t0_pdf):
    months = t0_pdf["ts"].dt.to_period("M").unique()
    assert len(months) >= 3
    assert str(months.min()) == "2026-01"


def test_synth_has_hot_conversation(t0_pdf):
    counts = t0_pdf.groupby("conv_id").size().sort_values(ascending=False)
    assert counts.iloc[0] >= 50 * counts.iloc[len(counts) // 2]  # Zipf skew


@pytest.mark.parametrize("tier", ["hourly", "daily", "monthly"])
def test_tier_bitexact_vs_pandas(spark, t0, t0_pdf, tier):
    spark_state = build_tiers(t0)[tier]
    got = _sorted(tier_view(spark_state, tier).toPandas())
    exp = _sorted(oracle.tier_view(oracle.build_tiers(t0_pdf)[tier], tier))
    assert len(got) == len(exp)
    assert list(got.columns) == list(exp.columns)
    for c in got.columns:
        g, e = got[c], exp[c]
        if g.dtype.kind == "f":
            # bit-exact: no tolerance
            assert (
                (g.to_numpy() == e.to_numpy()) | (g.isna() & e.isna()).to_numpy()
            ).all(), f"{tier}.{c} not bit-exact"
        elif c in ("bucket_start",):
            assert (pd.to_datetime(g).to_numpy() == pd.to_datetime(e).to_numpy()).all()
        else:
            assert ((g == e) | (g.isna() & e.isna())).all(), f"{tier}.{c} differs"


def test_compose_equals_recompute(spark, t0):
    """D2 safety: monthly composed from daily == monthly composed straight
    from hourly == values derivable from raw (algebraic aggregates only)."""
    hourly = rollup_hourly(t0)
    monthly_via_daily = rollup_up(rollup_up(hourly, "daily"), "monthly")
    monthly_direct = rollup_up(hourly, "monthly")
    a = _sorted(tier_view(monthly_via_daily, "monthly").toPandas())
    b = _sorted(tier_view(monthly_direct, "monthly").toPandas())
    pd.testing.assert_frame_equal(a, b)


def test_mean_is_sum_over_count(spark, t0):
    v = tier_view(build_tiers(t0)["daily"], "daily").toPandas()
    np.testing.assert_array_equal(
        v["token_count_mean"].to_numpy(),
        v["token_count_sum"].to_numpy() / v["token_count_count"].to_numpy(np.float64),
    )
