"""Sequence analytics (engine/seqops.py): the DuckDB hash gate covers each
query via tests/test_driver_contract.py; these tests add INDEPENDENT
verification — literal-recurrence / brute-force pandas formulations that
share no SQL shape with either engine — plus the CUSUM prefix-form proof
on adversarial inputs."""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.seqops import (  # noqa: E402
    CUSUM_SLACK_C,
    CUSUM_TARGET_C,
    CUSUM_THRESH_C,
    activity_streaks_user,
    cusum_alerts_user,
    event_transitions_topk,
    funnel_conversion_steps,
)

SF_DIR = "/root/testdata/sf0.001"


def _events_pdf():
    pdf = pd.read_parquet(f"{SF_DIR}/events.parquet")
    pdf["us"] = pdf["ts"].astype("datetime64[us]").astype("int64")
    return pdf


def _cusum_recurrence(d: np.ndarray) -> np.ndarray:
    """The textbook stateful scan: s_t = max(0, s_{t-1} + d_t)."""
    s, out = 0, np.empty(len(d), dtype=np.int64)
    for i, x in enumerate(d):
        s = max(0, s + int(x))
        out[i] = s
    return out


def _cusum_prefix(d: np.ndarray) -> np.ndarray:
    """The closed form the engine computes: cs - min(0, running_min(cs))."""
    cs = np.cumsum(d.astype(np.int64))
    return cs - np.minimum.accumulate(np.minimum(cs, 0))


def test_cusum_prefix_identity_adversarial():
    """The prefix form equals the literal recurrence on inputs engineered to
    stress the reset: all-negative, all-positive, sawtooth, and random."""
    rng = np.random.default_rng(7)
    cases = [
        np.full(50, -3),
        np.full(50, 3),
        np.tile([10, -25], 100),
        rng.integers(-1000, 1000, size=5000),
        np.array([0]),
        np.array([-1, 1, -1, 1, 0, 0, 5, -100, 5]),
    ]
    for d in cases:
        np.testing.assert_array_equal(_cusum_prefix(d), _cusum_recurrence(d))


def test_cusum_query_matches_recurrence(spark):
    """Spark CUSUM output == the stateful per-user scan over sorted events."""
    got = (
        cusum_alerts_user(spark, SF_DIR).toPandas().set_index("user_id")
    )
    pdf = _events_pdf()
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        d = (g["value"] * 100).round().astype("int64") - CUSUM_TARGET_C - CUSUM_SLACK_C
        s = _cusum_recurrence(d.to_numpy())
        assert got.loc[uid, "n_alerts"] == int((s > CUSUM_THRESH_C).sum()), uid
        assert got.loc[uid, "max_cusum"] == int(s.max()), uid


def test_funnel_matches_bruteforce(spark):
    """Funnel step counts == a per-user python scan for the earliest
    strictly-ordered view -> click -> purchase chain."""
    got = {
        r["step"]: r["users"]
        for r in funnel_conversion_steps(spark, SF_DIR).collect()
    }
    pdf = _events_pdf()
    n1 = n2 = n3 = 0
    for _, g in pdf.groupby("user_id"):
        views = g.loc[g.event_type == "view", "us"]
        if views.empty:
            continue
        n1 += 1
        t1 = views.min()
        clicks = g.loc[(g.event_type == "click") & (g.us > t1), "us"]
        if clicks.empty:
            continue
        n2 += 1
        t2 = clicks.min()
        if ((g.event_type == "purchase") & (g.us > t2)).any():
            n3 += 1
    assert (got["1_view"], got["2_click"], got["3_purchase"]) == (n1, n2, n3)


def test_streaks_match_bruteforce(spark):
    """Longest-streak / island counts == a python scan over sorted distinct
    active days."""
    got = activity_streaks_user(spark, SF_DIR).toPandas().set_index("user_id")
    pdf = _events_pdf()
    pdf["dayno"] = pdf["us"] // 86_400_000_000
    for uid, g in pdf.groupby("user_id"):
        days = sorted(g["dayno"].unique())
        streaks, cur = [], 1
        for a, b in zip(days, days[1:]):
            if b == a + 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        assert got.loc[uid, "n_active_days"] == len(days), uid
        assert got.loc[uid, "n_streaks"] == len(streaks), uid
        assert got.loc[uid, "longest_streak"] == max(streaks), uid


def test_transitions_match_bruteforce(spark):
    """Top-20 bigrams == pandas shift-based counting with the same
    deterministic tiebreak."""
    got = event_transitions_topk(spark, SF_DIR).toPandas()
    pdf = _events_pdf().sort_values(["user_id", "us", "event_id"])
    pdf["prev_type"] = pdf.groupby("user_id")["event_type"].shift()
    counts = (
        pdf.dropna(subset=["prev_type"])
        .groupby(["prev_type", "event_type"])
        .size()
        .reset_index(name="n")
        .rename(columns={"event_type": "next_type"})
        .sort_values(
            ["n", "prev_type", "next_type"], ascending=[False, True, True]
        )
        .head(20)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True)[["prev_type", "next_type", "n"]],
        counts[["prev_type", "next_type", "n"]],
        check_dtype=False,
    )


def test_holt_matches_explicit_recurrence(spark):
    """Brown's double smoothing == the literal coupled recurrence on every
    series (level/trend/forecast all checked)."""
    from engine.ts_analytics import HOLT_ALPHA, holt_linear_user_values

    a = HOLT_ALPHA
    got = holt_linear_user_values(spark, SF_DIR).toPandas()
    for uid, g in got.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], ignore_index=True)
        s1 = s2 = None
        for row in g.itertuples():
            if s1 is None:
                s1 = s2 = row.value
            else:
                s1 = a * row.value + (1 - a) * s1
                s2 = a * s1 + (1 - a) * s2
            level = 2 * s1 - s2
            trend = a / (1 - a) * (s1 - s2)
            assert abs(level - row.level) < 1e-9, uid
            assert abs(trend - row.trend) < 1e-9, uid
            assert abs(level + trend - row.forecast_next) < 1e-9, uid


def test_pattern_match_vs_python_re(spark):
    """M78: symbol-string assembly + non-overlapping counts == Python re
    on a hand-ordered event list, including out-of-order input rows."""
    import re
    from datetime import datetime, timedelta

    from engine.seqops import pattern_match

    base = datetime(2024, 3, 1)
    syms = "vvcpevcccpeepp"
    rows = [
        ("u1", base + timedelta(minutes=i), i, s) for i, s in enumerate(syms)
    ]
    rows += [("u2", base + timedelta(minutes=i), i, s) for i, s in enumerate("eeee")]
    # shuffle input order: assembly must sort by (ts, event_id), not input
    rows = rows[::-1]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long, sym string"
    )
    pats = {"funnel": "vc+p", "recovery": "ep", "runs": "e{2,}"}
    got = {
        r.user_id: r.asDict()
        for r in pattern_match(df, "user_id", ["ts", "event_id"], "sym", pats).collect()
    }
    for uid, s in [("u1", syms), ("u2", "eeee")]:
        assert got[uid]["n_events"] == len(s)
        for name, p in pats.items():
            assert got[uid][name] == len(re.findall(p, s)), (uid, name)
