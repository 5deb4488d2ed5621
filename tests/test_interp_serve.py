"""M51 interpolated bucket serving (engine/interp_serve.py): per-bucket
TWA / time-in-state covering the full bucket window via cross-bucket
boundary carry — verified against raw segment-overlap twins, edge
goldens (no prev/next, exact-midnight observation, missing middle
bucket), and calendar-width monthly buckets."""

import sys
from datetime import datetime
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.interp_serve import (  # noqa: E402
    interpolated_statedur,
    interpolated_twa,
)
from engine.rollup import build_tiers, with_metrics  # noqa: E402
from engine.statedur import NULL_STATE  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402

US_H = 3_600_000_000
US_D = 24 * US_H


@pytest.fixture(scope="module")
def t0(spark):
    df = synth_transcripts(spark, n_convs=25, hot_turns=150)
    df.cache().count()
    return df


def _day_us(dt):
    # naive UTC micros (bucket_start is TIMESTAMP_NTZ; avoid local-TZ
    # datetime.timestamp() semantics)
    return int((dt - datetime(1970, 1, 1)).total_seconds()) * 1_000_000


def _raw_rows(t0):
    """(conv_id, u_micros, v, state) ordered, from raw."""
    rows = (
        with_metrics(t0)
        .select(
            "conv_id",
            F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("u"),
            F.col("token_count").cast("long").alias("v"),
            F.coalesce(F.col("role"), F.lit(NULL_STATE)).alias("s"),
            "turn_idx",
        )
        .orderBy("conv_id", "u", "turn_idx")
        .collect()
    )
    out = {}
    for r in rows:
        out.setdefault(r["conv_id"], []).append((r["u"], r["v"], r["s"]))
    return out


def _twa_twin(turns, width_us):
    """Per observed bucket: clipped LOCF integral + covered span."""
    obs = [(u, v) for u, v, _s in turns if v is not None]
    if not obs:
        return {}
    days = sorted({(u // width_us) * width_us for u, _ in obs})
    lo, hi = obs[0][0], obs[-1][0]
    segs = [
        (obs[i][0], obs[i + 1][0], obs[i][1]) for i in range(len(obs) - 1)
    ]
    want = {}
    for d in days:
        d_end = d + width_us
        integral = sum(
            v * (min(e, d_end) - max(s, d))
            for s, e, v in segs
            if e > d and s < d_end
        )
        in_day = [u for u, _ in obs if d <= u < d_end]
        cs = d if lo < d else in_day[0]
        ce = d_end if hi >= d_end else in_day[-1]
        cov = ce - cs
        want[d] = (integral, cov, integral / cov if cov > 0 else None)
    return want


def _sd_twin(turns, width_us):
    days = sorted({(u // width_us) * width_us for u, _v, _s in turns})
    segs = [
        (turns[i][0], turns[i + 1][0], turns[i][2])
        for i in range(len(turns) - 1)
    ]
    want = {}
    for d in days:
        d_end = d + width_us
        per = {}
        for s, e, st in segs:
            ov = min(e, d_end) - max(s, d)
            if e > d and s < d_end and ov > 0:
                per[st] = per.get(st, 0) + ov
        want[d] = per
    return want


def test_interpolated_twa_daily_vs_raw_segments(spark, t0):
    tiers = build_tiers(t0, twa_cols=["token_count"])
    got = {}
    for r in interpolated_twa(tiers["daily"], "daily", "token_count").collect():
        got.setdefault(r["conv_id"], {})[_day_us(r["bucket_start"])] = (
            r["integral"], r["covered_us"], r["itwa"]
        )
    raw = _raw_rows(t0)
    for cid, turns in raw.items():
        assert got[cid] == _twa_twin(turns, US_D), cid
    assert set(got) == set(raw)


def test_interpolated_statedur_hourly_vs_raw_segments(spark, t0):
    tiers = build_tiers(t0, statedur_cols=["role"])
    got = {}
    for r in interpolated_statedur(
        tiers["hourly"], "hourly", "role"
    ).collect():
        got.setdefault(r["conv_id"], {}).setdefault(
            _day_us(r["bucket_start"]), {}
        )[r["state"]] = r["micros"]
    raw = _raw_rows(t0)
    for cid, turns in raw.items():
        want = {d: m for d, m in _sd_twin(turns, US_H).items() if m}
        assert got.get(cid, {}) == want, cid


def _literal(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )


def test_goldens_prev_next_midnight_and_gap(spark):
    t = _literal(spark, [
        # day 1: single turn at exact midnight (no zero-width carry-in row)
        ("c", 0, "user", "x" * 10, None, datetime(2026, 1, 1, 0, 0)),
        ("c", 1, "user", "x" * 20, None, datetime(2026, 1, 1, 18, 0)),
        # day 2 missing entirely; day 3 observed
        ("c", 2, "user", "x" * 40, None, datetime(2026, 1, 3, 6, 0)),
    ])
    tiers = build_tiers(t, twa_cols=["token_count"])
    rows = {
        r["bucket_start"]: (r["integral"], r["covered_us"], r["itwa"])
        for r in interpolated_twa(
            tiers["daily"], "daily", "token_count"
        ).collect()
    }
    d1, d3 = datetime(2026, 1, 1), datetime(2026, 1, 3)
    # day 1: no prev → covered from first obs (midnight); next exists →
    # extend 20 to midnight: 10·18h + 20·6h over 24h
    assert rows[d1] == (
        10 * 18 * US_H + 20 * 6 * US_H,
        US_D,
        (10 * 18 * US_H + 20 * 6 * US_H) / US_D,
    )
    # day 2: no tier row → no served row (unreported, not zero)
    assert len(rows) == 2
    # day 3: carry-in 20 over [00:00, 06:00); no next → covered ends at
    # the last (only) observation
    assert rows[d3] == (20 * 6 * US_H, 6 * US_H, 20.0)


def test_statedur_golden_carry_states(spark):
    t = _literal(spark, [
        ("c", 0, "assistant", "x", None, datetime(2026, 1, 1, 0, 30)),
        ("c", 1, "user", "x", None, datetime(2026, 1, 1, 0, 45)),
        ("c", 2, "tool", "x", None, datetime(2026, 1, 1, 2, 15)),
    ])
    tiers = build_tiers(t, statedur_cols=["role"])
    got = {}
    for r in interpolated_statedur(
        tiers["hourly"], "hourly", "role"
    ).collect():
        got.setdefault(r["bucket_start"], {})[r["state"]] = r["micros"]
    m = 60_000_000
    # hour 0: assistant 15m within; user carries out 15m to the hour edge
    assert got[datetime(2026, 1, 1, 0)] == {
        "assistant": 15 * m, "user": 15 * m
    }
    # hour 2: carry-in user over [2:00, 2:15); tool has no next → nothing
    assert got[datetime(2026, 1, 1, 2)] == {"user": 15 * m}
    assert set(got) == {datetime(2026, 1, 1, 0), datetime(2026, 1, 1, 2)}


def test_monthly_calendar_width_carry(spark):
    t = _literal(spark, [
        ("c", 0, "user", "x" * 10, None, datetime(2026, 1, 31, 12, 0)),
        ("c", 1, "user", "x" * 30, None, datetime(2026, 3, 1, 0, 0)),
    ])
    tiers = build_tiers(t, twa_cols=["token_count"])
    rows = {
        r["bucket_start"]: (r["integral"], r["covered_us"])
        for r in interpolated_twa(
            tiers["monthly"], "monthly", "token_count"
        ).collect()
    }
    # January: carry-out 10 from Jan 31 12:00 to Feb 1 00:00 (12h)
    assert rows[datetime(2026, 1, 1)] == (10 * 12 * US_H, 12 * US_H)
    # March: carry-in, but first obs is exactly on the month edge →
    # zero-width carry suppressed; single obs, no next → covered 0
    assert rows[datetime(2026, 3, 1)] == (0, 0)


def test_sentinel_buckets_skipped_with_locf_across(spark):
    t = _literal(spark, [
        ("c", 0, "user", "x" * 10, None, datetime(2026, 1, 1, 12, 0)),
        ("c", 1, "user", None, None, datetime(2026, 1, 2, 6, 0)),
        ("c", 2, "user", "x" * 30, None, datetime(2026, 1, 3, 18, 0)),
    ])
    tiers = build_tiers(t, twa_cols=["token_count"])
    rows = {
        r["bucket_start"]: (r["integral"], r["covered_us"])
        for r in interpolated_twa(
            tiers["daily"], "daily", "token_count"
        ).collect()
    }
    # day 2 (all-null values) serves nothing; day 3's carry-in is day 1's
    # value 10 over [Jan3 00:00, 18:00)
    assert set(rows) == {datetime(2026, 1, 1), datetime(2026, 1, 3)}
    assert rows[datetime(2026, 1, 3)] == (10 * 18 * US_H, 18 * US_H)
