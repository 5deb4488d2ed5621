"""Single-node pandas re-implementation of the tier algebra (SURVEY.md K4).

BASELINE.json:6 requires "bit-exact rolled-up points at every retention tier
against a single-node pandas reference". The engine makes this achievable by
keeping tier state integer-backed (engine/rollup.py docstring); this oracle
mirrors that: integer sums/mins/maxes, floats only via single division.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

HOUR_S = 3600.0


def t0_metrics(t0: pd.DataFrame) -> pd.DataFrame:
    df = t0.copy()
    df["token_count"] = df["text"].str.len().astype("int64")
    df["is_tool"] = df["tool"].notna().astype("int64")
    return df


def rollup_hourly(t0: pd.DataFrame) -> pd.DataFrame:
    df = t0_metrics(t0)
    df["bucket_start"] = df["ts"].dt.floor("h")
    g = df.groupby(["conv_id", "bucket_start"], sort=False)
    out = g.agg(
        n_turns=("token_count", "size"),
        token_sum=("token_count", "sum"),
        token_min=("token_count", "min"),
        token_max=("token_count", "max"),
        tool_sum=("is_tool", "sum"),
        tool_min=("is_tool", "min"),
        tool_max=("is_tool", "max"),
    ).reset_index()
    out["hours_count"] = np.int64(1)
    out["hturns_min"] = out["n_turns"]
    out["hturns_max"] = out["n_turns"]
    return out


def rollup_up(lower: pd.DataFrame, unit: str) -> pd.DataFrame:
    df = lower.copy()
    if unit == "day":
        df["bucket_start"] = df["bucket_start"].dt.floor("d")
    elif unit == "month":
        df["bucket_start"] = df["bucket_start"].dt.to_period("M").dt.start_time
    else:
        raise ValueError(unit)
    g = df.groupby(["conv_id", "bucket_start"], sort=False)
    return g.agg(
        n_turns=("n_turns", "sum"),
        token_sum=("token_sum", "sum"),
        token_min=("token_min", "min"),
        token_max=("token_max", "max"),
        tool_sum=("tool_sum", "sum"),
        tool_min=("tool_min", "min"),
        tool_max=("tool_max", "max"),
        hours_count=("hours_count", "sum"),
        hturns_min=("hturns_min", "min"),
        hturns_max=("hturns_max", "max"),
    ).reset_index()


def build_tiers(t0: pd.DataFrame) -> dict[str, pd.DataFrame]:
    hourly = rollup_hourly(t0)
    daily = rollup_up(hourly, "day")
    monthly = rollup_up(daily, "month")
    return {"hourly": hourly, "daily": daily, "monthly": monthly}


def tier_view(state: pd.DataFrame, tier: str) -> pd.DataFrame:
    s = state
    n = s["n_turns"].to_numpy(np.float64)
    hrs = s["hours_count"].to_numpy(np.float64)
    tok = s["token_sum"].to_numpy(np.float64)
    tool = s["tool_sum"].to_numpy(np.float64)
    return pd.DataFrame(
        {
            "conv_id": s["conv_id"],
            "bucket_start": s["bucket_start"],
            "tier": tier,
            "turn_rate_sum": n / HOUR_S,
            "turn_rate_count": s["hours_count"].astype("int64"),
            "turn_rate_min": s["hturns_min"].to_numpy(np.float64) / HOUR_S,
            "turn_rate_max": s["hturns_max"].to_numpy(np.float64) / HOUR_S,
            "turn_rate_mean": (n / HOUR_S) / hrs,
            "token_count_sum": tok,
            "token_count_count": s["n_turns"].astype("int64"),
            "token_count_min": s["token_min"].to_numpy(np.float64),
            "token_count_max": s["token_max"].to_numpy(np.float64),
            "token_count_mean": tok / n,
            "tool_invocations_sum": tool,
            "tool_invocations_count": s["n_turns"].astype("int64"),
            "tool_invocations_min": s["tool_min"].to_numpy(np.float64),
            "tool_invocations_max": s["tool_max"].to_numpy(np.float64),
            "tool_invocations_mean": tool / n,
            "filled": False,
            "fill_method": pd.Series([None] * len(s), dtype="object"),
        }
    )
