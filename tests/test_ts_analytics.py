"""Timeseries analytics pack (engine/ts_analytics.py): oracle parity for
the SQL-expressible aggregates, invariants + brute-force parity for LTTB."""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.queries import ORACLE_SQL, QUERIES  # noqa: E402
from engine.ts_analytics import LTTB_N_OUT, lttb  # noqa: E402
from tests.oracle_utils import assert_frames_match, duck_run  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

ORACLE_QUERIES = [
    "twa_locf_daily",
    "counter_delta_hourly",
    "ohlc_daily",
    "ohlc_weekly_composed",
    "hist_tier_monthly",
    "topn_plus_others_daily",
    "heartbeat_uptime_daily",
    "rate_extrapolated_hourly",
    "hist_percentile_monthly",
    "outliers_mad_daily",
]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
    assert len(spark_pdf) > 0
    duck_pdf = duck_run(SF_DIR, ORACLE_SQL[name])
    assert_frames_match(spark_pdf, duck_pdf, name)


def test_twa_differs_from_plain_mean_under_irregular_sampling(spark):
    """The reason TWA exists: clustering samples must not move it. A series
    holding value 10 for an hour then 20 for an hour has TWA 15 no matter
    how many times each level was sampled."""
    import pandas as pd

    rows = []
    # value 10 sampled 100x in the first hour, 20 sampled once at hour 2,
    # observation window closed by a final sample at hour 3
    for i in range(100):
        rows.append((1, pd.Timestamp("2024-01-01 00:00:00") + pd.Timedelta(seconds=i), 10.0, i))
    rows.append((1, pd.Timestamp("2024-01-01 01:00:00"), 20.0, 1000))
    rows.append((1, pd.Timestamp("2024-01-01 02:00:00"), 20.0, 1001))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "value", "event_id"])
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="twa-")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = QUERIES["twa_locf_daily"](spark, d).toPandas()
    assert len(got) == 1
    # 10 held ~59:59 + a bit, 20 held 1h: TWA ~= (10*3600 + 20*3600) / 7200
    assert abs(got["twa"].iloc[0] - 15.0) < 0.01
    # the plain mean would be dragged to ~10 by the 100 clustered samples
    assert abs((100 * 10 + 2 * 20) / 102 - 10.2) < 0.01


def test_counter_reset_rule(spark):
    """A reset (drop) contributes the post-reset reading, not a negative."""
    import pandas as pd
    import tempfile

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        (1, t0, 100.0, 1),
        (1, t0 + pd.Timedelta(minutes=1), 150.0, 2),  # +50
        (1, t0 + pd.Timedelta(minutes=2), 30.0, 3),  # reset -> +30
        (1, t0 + pd.Timedelta(minutes=3), 90.0, 4),  # +60
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "value", "event_id"])
    )
    d = tempfile.mkdtemp(prefix="ctr-")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = QUERIES["counter_delta_hourly"](spark, d).toPandas()
    assert len(got) == 1
    assert int(got["delta_c"].iloc[0]) == (50 + 30 + 60) * 100
    assert int(got["n_resets"].iloc[0]) == 1


# ---------------------------------------------------------------------------
# LTTB
# ---------------------------------------------------------------------------


def _lttb_reference(ts, vals, n_out):
    """Straight-from-the-thesis scalar implementation (no vectorization)."""
    n = len(ts)
    if n_out >= n or n_out < 3:
        return list(range(n))
    edges = np.linspace(1, n - 1, n_out - 1).astype(int)
    sel = [0]
    a = 0
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        nlo, nhi = (hi, n) if i == n_out - 3 else (hi, edges[i + 2])
        cx = float(np.mean(ts[nlo:nhi]))
        cy = float(np.mean(vals[nlo:nhi]))
        best, best_area = lo, -1.0
        for j in range(lo, hi):
            area = abs(
                (ts[a] - cx) * (vals[j] - vals[a])
                - (ts[a] - ts[j]) * (cy - vals[a])
            )
            if area > best_area:
                best, best_area = j, area
        sel.append(best)
        a = best
    sel.append(n - 1)
    return sel


def test_lttb_matches_reference_and_invariants():
    rng = np.random.RandomState(42)
    for n, n_out in [(500, 24), (100, 10), (23, 24), (3, 3), (1000, 3)]:
        ts = np.sort(rng.uniform(0, 1e6, n)).astype(np.float64)
        vals = rng.normal(0, 1, n)
        got = lttb(ts, vals, n_out)
        ref = _lttb_reference(ts, vals, n_out)
        assert list(got) == list(ref), (n, n_out)
        if n_out < n and n_out >= 3:
            assert len(got) == n_out
            assert got[0] == 0 and got[-1] == n - 1
            assert np.all(np.diff(got) > 0)  # strictly increasing indices


def test_lttb_spark_query(spark):
    got = QUERIES["lttb_downsample"](spark, SF_DIR).toPandas()
    assert len(got) > 0
    per_user = got.groupby("user_id")
    import pandas as pd

    events = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    n_per_user = events.groupby("user_id").size()
    for uid, grp in per_user:
        n = int(n_per_user[uid])
        assert len(grp) == min(n, LTTB_N_OUT)
        grp = grp.sort_values("pt_rank")
        assert grp["ts"].is_monotonic_increasing
        # endpoints preserved
        src = events[events.user_id == uid].sort_values(["ts", "event_id"])
        assert grp["event_id"].iloc[0] == src["event_id"].iloc[0]
        assert grp["event_id"].iloc[-1] == src["event_id"].iloc[-1]


def test_ewma_matches_explicit_recurrence(spark):
    """EWMA output equals the hand-rolled s_t = a*v_t + (1-a)*s_{t-1}
    recurrence on every series (spot-checks the pandas kernel semantics:
    adjust=False, first value seeds the state)."""
    from engine.ts_analytics import EWMA_ALPHA, ewma_user_values

    got = ewma_user_values(spark, SF_DIR).toPandas()
    for uid, g in got.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], ignore_index=True)
        s = None
        for v, e in zip(g["value"], g["ewma"]):
            s = v if s is None else EWMA_ALPHA * v + (1 - EWMA_ALPHA) * s
            assert abs(s - e) < 1e-9, (uid, s, e)


def test_m4_anchor_invariants(spark):
    """M4 output per (user, bucket) is 1-4 rows and always contains the
    bucket's true first/last/min/max points; a dense bucket (1000 points)
    still yields <=4 rows."""
    import pandas as pd

    from engine.ts_analytics import m4_downsample_hourly

    base = pd.Timestamp("2024-03-01 05:00:00")
    rows = [
        (1, base + pd.Timedelta(seconds=i), float((i * 37) % 101), i)
        for i in range(1000)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "value", "event_id"])
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="m4-")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = m4_downsample_hourly(spark, d).toPandas()
    assert 1 <= len(out) <= 4
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value", "event_id"])
    vals = set(out["value"])
    assert pdf.loc[pdf["ts"].idxmin(), "value"] in vals  # first
    assert pdf.loc[pdf["ts"].idxmax(), "value"] in vals  # last
    assert pdf["value"].min() in vals and pdf["value"].max() in vals


def test_m4_and_wow_oracle_parity(spark):
    for name in ("m4_downsample_hourly", "wow_value_daily"):
        spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
        assert len(spark_pdf) > 0
        duck_pdf = duck_run(SF_DIR, ORACLE_SQL[name])
        assert_frames_match(spark_pdf, duck_pdf, name)


def test_lagged_cross_corr_finds_planted_lead(spark):
    """b(t) = a(t-2) exactly: the lag-2 correlation must be ~1.0 and
    dominate every other lag; n_pairs shrinks by the overlap."""
    from pyspark.sql import functions as F

    from engine.ts_analytics import lagged_cross_corr

    import hashlib

    rows = []
    for k in ("s1", "s2"):
        # md5 noise: negligible autocorrelation at every nonzero lag
        a = [
            int(hashlib.md5(f"{k}|{t}".encode()).hexdigest()[:6], 16) % 997
            for t in range(200)
        ]
        for t in range(200):
            rows.append((k, t, a[t], a[t - 2] if t >= 2 else 0))
    df = spark.createDataFrame(rows, "k string, hidx long, a long, b long")
    df = df.filter(F.col("hidx") >= 2)  # drop the undefined warm-up rows
    out = {
        r["lag"]: (r["n_pairs"], r["corr"])
        for r in lagged_cross_corr(df, ["k"], "hidx", "a", "b", [0, 1, 2, 3]).collect()
    }
    assert out[2][1] > 0.999
    assert all(abs(out[lag][1]) < 0.3 for lag in (0, 1, 3))
    # pair counts: lag L aligns (198-L) buckets per series
    assert out[0][0] == 2 * 198 and out[3][0] == 2 * 195

    # brute-force parity at lag 1 (numpy Pearson on the aligned vectors)
    import numpy as np

    pdf = df.toPandas()
    xs, ys = [], []
    for k in ("s1", "s2"):
        g = pdf[pdf.k == k].set_index("hidx").sort_index()
        for t in g.index:
            if t + 1 in g.index:
                xs.append(g.a[t]); ys.append(g.b[t + 1])
    want = np.corrcoef(xs, ys)[0, 1]
    assert abs(out[1][1] - want) < 1e-9


def test_acf_detects_planted_period(spark):
    """A period-3 series autocorrelates at lags 3 and 6, not 1/2."""
    from engine.ts_analytics import lagged_cross_corr

    rows = []
    for k in ("u1", "u2"):
        for t in range(300):
            # period-3 pattern + tiny per-t dither so variance is nonzero
            rows.append((k, t, [5, 90, 40][t % 3] + (t * 7) % 2))
    df = spark.createDataFrame(rows, "k string, hidx long, a long")
    out = {
        r["lag"]: r["corr"]
        for r in lagged_cross_corr(
            df, ["k"], "hidx", "a", "a", [1, 2, 3, 6]
        ).collect()
    }
    assert out[3] > 0.99 and out[6] > 0.99
    assert out[1] < 0 and out[2] < 0  # period-3 anti-correlates off-phase


def test_mad_anomaly_planted_outlier(spark, tmp_path):
    """One 100x day in an otherwise flat series is the ONLY flag; a
    mean/stddev detector's threshold would have been dragged by it."""
    import numpy as np

    rows = []
    base = np.datetime64("2024-01-01T06:00:00")
    for u in (1, 2):
        for d in range(30):
            # jittered base so MAD > 0 (a perfectly flat series has
            # MAD = 0 and the detector correctly refuses to score it)
            v = 10.0 + (d % 5) * 0.5 if d != 17 or u != 1 else 1000.0
            # two events per day so the daily sum path is exercised
            rows.append((int(u * 1000 + d * 2), base + np.timedelta64(d, "D"), u, "x", v / 2, "{}"))
            rows.append((int(u * 1000 + d * 2 + 1), base + np.timedelta64(d, "D") + np.timedelta64(1, "h"), u, "x", v / 2, "{}"))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = tmp_path / "mad"
    d.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(d / "events.parquet"))
    from engine.ts_analytics import mad_anomaly_daily

    out = mad_anomaly_daily(spark, str(d)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["user_id"] == 1 and r["value_cents"] == 100000
    assert r["mad"] > 0
    # user 2's jitter stays within 2 MADs -> no flags
    assert all(x["user_id"] != 2 for x in out)


def test_cohort_retention_planted_churn(spark, tmp_path):
    """3 customers joining month 0, one churning after month 0: the
    matrix reports exact per-offset counts and shares."""
    import numpy as np

    rows = []
    # custs 1,2,3 first order 1995-01; 1 and 2 order again in 1995-03;
    # cust 4 joins 1995-02 only.
    orders = [
        (1, "1995-01-10"), (2, "1995-01-20"), (3, "1995-01-05"),
        (1, "1995-03-02"), (2, "1995-03-30"), (4, "1995-02-14"),
        (1, "1995-01-11"),  # duplicate month must not double-count
    ]
    pdf = pd.DataFrame(
        [
            (i, c, np.datetime64(dt), "O", 1.0, 1, "p", "c", 0.0)
            for i, (c, dt) in enumerate(orders)
        ],
        columns=[
            "o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus",
            "o_totalprice", "o_shippriority", "o_orderpriority", "o_clerk",
            "o_tax",
        ],
    )
    d = tmp_path / "coh"
    d.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(d / "orders.parquet"))
    from engine.ts_analytics import cohort_retention_monthly

    out = {
        (r["cohort_year"], r["cohort_month"], r["month_offset"]): (
            r["active_custs"], r["cohort_size"], r["retention_pct"]
        )
        for r in cohort_retention_monthly(spark, str(d)).collect()
    }
    assert out[(1995, 1, 0)] == (3, 3, 1.0)
    assert out[(1995, 1, 2)][0] == 2 and abs(out[(1995, 1, 2)][2] - 2 / 3) < 1e-15
    assert out[(1995, 2, 0)] == (1, 1, 1.0)
    assert (1995, 1, 1) not in out  # nobody active in offset-1 month


def test_burstiness_fano_goldens(spark):
    """M81: bursty series >> 1, metronomic series == 0 variance ratio,
    single-bucket series fano 0; zeros inside the span enter the
    variance."""
    from datetime import datetime

    from engine.io import transcripts_from_events
    from engine.rollup import build_tiers
    from engine.ts_analytics import burstiness_fano

    rows = []
    # conv 1 (bursty): 10 turns in hour 0, then silence until hour 9 (1 turn)
    for i in range(10):
        rows.append((1, datetime(2024, 1, 1, 0, i), i))
    rows.append((1, datetime(2024, 1, 1, 9, 0), 99))
    # conv 2 (steady): 1 turn in each of hours 0..9
    for h in range(10):
        rows.append((2, datetime(2024, 1, 1, h, 30), 200 + h))
    # conv 3: single bucket
    rows.append((3, datetime(2024, 1, 2, 5, 0), 300))
    ev = spark.createDataFrame(
        [(eid, ts, u, "view", 0.0, "{}") for u, ts, eid in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    tiers = build_tiers(transcripts_from_events(ev))
    out = {r.conv_id[-1]: r for r in burstiness_fano(tiers["hourly"]).collect()}
    # conv 1: B=10, s1=11, s2=101 -> fano = (10*101 - 121)/(10*11)
    r1 = out["1"]
    assert (r1.n_obs, r1.span_buckets) == (2, 10)
    assert r1.fano == (10 * 101 - 121) / 110
    assert r1.fano > 5
    assert r1.zero_frac == 0.8
    # conv 2: constant 1/hour over a full span -> variance 0
    r2 = out["2"]
    assert (r2.n_obs, r2.span_buckets, r2.fano, r2.zero_frac) == (10, 10, 0.0, 0.0)
    assert r2.mean_per_bucket == 1.0
    # conv 3: one bucket, fano 0 by construction
    assert (out["3"].span_buckets, out["3"].fano) == (1, 0.0)
