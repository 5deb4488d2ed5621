"""M63/M64/M65 (engine/sliding.py, engine/ts_analytics.day_shape_sax):
sliding tier-state windows equal raw re-aggregation per window; the
linear trend matches numpy's least squares; rank-SAX words are exact
permutation fingerprints of the day's segment ordering."""

import sys
from datetime import datetime, timedelta
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.bucket import with_metrics  # noqa: E402
from engine.rollup import build_tiers  # noqa: E402
from engine.sliding import sliding_state, trend_linear  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402
from engine.ts_analytics import day_shape_sax  # noqa: E402


@pytest.fixture(scope="module")
def t0(spark):
    df = synth_transcripts(spark, n_convs=20, hot_turns=150)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def hourly(t0):
    h = build_tiers(t0)["hourly"]
    h.cache().count()
    return h


def test_sliding_equals_raw_window_reagg(spark, t0, hourly):
    """Every (conv, bucket) output row of the 6h sliding state must equal
    a direct raw aggregation over (bucket - 6h, bucket] — the RANGE frame
    over tier state loses nothing vs re-reading raw."""
    got = {
        (r["conv_id"], r["bucket_start"]): (
            r["w_n_turns"],
            r["w_token_sum"],
            r["w_token_min"],
            r["w_token_max"],
            r["w_tool_sum"],
        )
        for r in sliding_state(hourly, 6).collect()
    }
    raw = with_metrics(t0).select(
        "conv_id",
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("h"),
        "token_count",
        "is_tool",
    )
    rows = raw.collect()
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    assert got, "no sliding output"
    for (conv, bucket), state in got.items():
        lo = bucket - timedelta(hours=5)
        sel = [
            r for r in by_conv[conv] if lo <= r["h"] <= bucket
        ]
        toks = [r["token_count"] for r in sel]
        tools = [r["is_tool"] for r in sel]
        assert state == (
            len(sel),
            sum(toks),
            min(toks),
            max(toks),
            sum(tools),
        ), (conv, bucket)


def test_sliding_range_frame_skips_gaps(spark):
    """A series with a multi-hour hole: the trailing frame is bounded by
    TIME, so the bucket after the hole must NOT see pre-hole state (a
    ROWS frame would — the classic moving-aggregate bug)."""
    rows = [
        ("c", 0, "user", "xxxx", None, datetime(2024, 1, 1, 0, 30)),
        ("c", 1, "user", "yyyyyyyy", None, datetime(2024, 1, 1, 1, 30)),
        # 10-hour gap
        ("c", 2, "user", "zz", None, datetime(2024, 1, 1, 11, 30)),
    ]
    t0 = rows_df(spark, rows)
    h = build_tiers(t0)["hourly"]
    out = {
        r["bucket_start"].hour: (r["w_n_turns"], r["w_token_sum"])
        for r in sliding_state(h, 3).collect()
    }
    assert out[0] == (1, 4)
    assert out[1] == (2, 12)  # hours 0+1 inside the 3h frame
    assert out[11] == (1, 2)  # pre-gap hours 0/1 are outside (9..11]


def rows_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp_ntz",
    )


def test_trend_matches_numpy_least_squares(spark, t0, hourly):
    lo, hi = datetime(2026, 2, 1), datetime(2026, 5, 1)
    got = {
        r["conv_id"]: (r["n"], r["slope"], r["intercept"], r["predicted"])
        for r in trend_linear(hourly, lo, hi, horizon_hours=12).collect()
    }
    pts = (
        hourly.filter(
            (F.col("bucket_start") >= F.lit(lo))
            & (F.col("bucket_start") < F.lit(hi))
        )
        .select("conv_id", "bucket_start", "n_turns")
        .collect()
    )
    series = {}
    lo_h = int(lo.timestamp() * 1e6) // 3_600_000_000
    hi_h = int(hi.timestamp() * 1e6) // 3_600_000_000
    for r in pts:
        t = int(r["bucket_start"].timestamp() * 1e6) // 3_600_000_000 - lo_h
        series.setdefault(r["conv_id"], []).append((t, r["n_turns"]))
    checked = 0
    for conv, tv in series.items():
        if len(tv) < 2:
            assert conv not in got  # degenerate series excluded
            continue
        t = np.array([p[0] for p in tv], dtype=float)
        v = np.array([p[1] for p in tv], dtype=float)
        slope, intercept = np.polyfit(t, v, 1)
        n, g_slope, g_icept, g_pred = got[conv]
        assert n == len(tv)
        assert g_slope == pytest.approx(slope, rel=1e-9, abs=1e-12)
        assert g_icept == pytest.approx(intercept, rel=1e-9, abs=1e-9)
        t_pred = (hi_h - lo_h - 1) + 12
        assert g_pred == pytest.approx(
            intercept + slope * t_pred, rel=1e-9, abs=1e-9
        )
        checked += 1
    assert checked >= 5


def test_trend_validates_range(hourly):
    with pytest.raises(ValueError):
        trend_linear(
            hourly, datetime(2024, 2, 1), datetime(2024, 1, 1), 1
        )
    with pytest.raises(ValueError):
        sliding_state(hourly, 0)


def test_sax_words_are_rank_permutations(spark, hourly):
    rows = day_shape_sax(hourly, segments=4).collect()
    assert rows
    for r in rows:
        word = r["word"]
        assert sorted(word) == ["0", "1", "2", "3"], word
        segs = [r["s0"], r["s1"], r["s2"], r["s3"]]
        # rank semantics: stable argsort by (value, position)
        order = sorted(range(4), key=lambda i: (segs[i], i))
        expect = [0] * 4
        for rank, i in enumerate(order):
            expect[i] = rank
        assert word == "".join(str(x) for x in expect), (segs, word)


def test_sax_zero_fills_missing_segments(spark):
    """A day active only in the evening still yields a 4-symbol word:
    missing segments are PAA zeros, not absent rows."""
    rows = [
        ("c", 0, "user", "aaaa", None, datetime(2024, 1, 2, 19, 0)),
        ("c", 1, "user", "bb", None, datetime(2024, 1, 2, 21, 0)),
    ]
    h = build_tiers(rows_df(spark, rows))["hourly"]
    out = day_shape_sax(h, segments=4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["s0"], r["s1"], r["s2"], r["s3"]) == (0, 0, 0, 2)
    assert r["word"] == "0123"  # zeros rank by position, s3 largest


def test_sax_validates_segments(hourly):
    for bad in (0, 5, 48):
        with pytest.raises(ValueError):
            day_shape_sax(hourly, segments=bad)


def test_sliding_plan_single_exchange(spark, hourly):
    """The sliding window over tier state must shuffle ONCE (the window's
    conv_id hash partitioning) — no extra exchanges, no raw scan."""
    plan = (
        sliding_state(hourly, 24)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # count only the sliding op's own nodes — the cached hourly fixture's
    # build lineage sits below the InMemoryTableScan
    op = plan.split("InMemoryTableScan")[0]
    assert op.count("Exchange hashpartitioning") == 1, plan
    # all ten trailing merges fold into ONE Window node over one sort
    assert op.count("+- Window") == 1, plan
    assert op.count("+- Sort") == 1, plan


def test_sliding_hist_percentile_golden_and_gaps(spark):
    """M83: merged window bins honor the integer rank rule and the RANGE
    frame (post-gap bucket must not see pre-gap distribution)."""
    from engine.sliding import sliding_hist_percentile

    # token_count == len(text); hist spec (0, 1, 16) => bin = len(text)
    rows = [
        # hour 0: nine 1-token texts + one 9-token text -> p50=1, p95=9
        *[("c", i, "user", "x", None, datetime(2024, 1, 1, 0, i))
          for i in range(9)],
        ("c", 9, "user", "x" * 9, None, datetime(2024, 1, 1, 0, 55)),
        # hour 1: one 5-token text; window(2h) merges hour 0
        ("c", 10, "user", "xxxxx", None, datetime(2024, 1, 1, 1, 30)),
        # 10-hour gap; hour 11 must see ONLY its own row
        ("c", 11, "user", "xx", None, datetime(2024, 1, 1, 11, 0)),
    ]
    t0 = rows_df(spark, rows)
    h = build_tiers(t0, hist_cols={"token_count": (0.0, 1.0, 16)})["hourly"]
    out = {
        r["bucket_start"].hour: (r["w_n"], r["p50_bin"], r["p95_bin"])
        for r in sliding_hist_percentile(
            h, "token_count_hist", 16, 2
        ).collect()
    }
    assert out[0] == (10, 1, 9)   # cum rule: 9/10 < 95% so p95 lands on bin 9
    assert out[1] == (11, 1, 9)   # hour 0 state merged in
    assert out[11] == (1, 2, 2)   # gap-correct: pre-gap bins invisible
    with pytest.raises(ValueError, match="window_hours"):
        sliding_hist_percentile(h, "token_count_hist", 16, 0)
    with pytest.raises(ValueError, match="n_bins"):
        sliding_hist_percentile(h, "token_count_hist", 0, 2)


def test_sliding_hist_percentile_plan_single_exchange(spark):
    from engine.sliding import sliding_hist_percentile

    t0 = synth_transcripts(spark, n_convs=6, hot_turns=60)
    h = build_tiers(t0, hist_cols={"token_count": (0.0, 4.0, 16)})["hourly"]
    h.cache().count()
    plan = (
        sliding_hist_percentile(h, "token_count_hist", 16, 24)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    op = plan.split("Scan ExistingRDD")[0].split("InMemoryTableScan")[0]
    assert op.count("Exchange hashpartitioning") == 1, plan
    assert op.count("+- Window") == 1, plan


def test_theil_sen_robust_to_outlier_and_brute_parity(spark):
    """M84: a planted wild hour leaves the Theil-Sen slope at the true
    line (OLS chases it); lower-median selection matches a literal
    brute-force fit."""
    from engine.sliding import theil_sen_trend, trend_linear

    # conv c: v = 2*t + 3 for t=0..9, except t=5 spikes to 1000
    rows = []
    for t in range(10):
        v = 2 * t + 3 if t != 5 else 1000
        for i in range(v):
            rows.append(
                ("c", len(rows), "user", "x", None,
                 datetime(2024, 1, 1, t, min(i % 60, 59)))
            )
    t0 = rows_df(spark, rows)
    h = build_tiers(t0)["hourly"]
    lo, hi = datetime(2024, 1, 1), datetime(2024, 1, 1, 10)
    r = theil_sen_trend(h, lo, hi).collect()[0]
    assert (r.n_obs, r.n_pairs) == (10, 45)
    assert r.slope == 2.0                      # outlier shrugged off
    assert r.intercept == 3.0
    assert r.predicted == 3.0 + 2.0 * 10.0
    ols = trend_linear(h, lo, hi, 0).collect()[0]
    assert abs(ols.slope - 2.0) > 5            # OLS dragged by the spike

    # brute-force parity on the same series
    pts = [(t, 2 * t + 3 if t != 5 else 1000) for t in range(10)]
    slopes = sorted(
        (v2 - v1) / (t2 - t1)
        for i, (t1, v1) in enumerate(pts)
        for (t2, v2) in pts[i + 1:]
    )
    k = (len(slopes) - 1) // 2
    assert r.slope == slopes[k]
    resid = sorted(v - r.slope * t for t, v in pts)
    assert r.intercept == resid[(len(pts) - 1) // 2]


def test_theil_sen_validation(spark):
    from engine.sliding import theil_sen_trend

    t0 = rows_df(spark, [("c", 0, "user", "x", None, datetime(2024, 1, 1))])
    h = build_tiers(t0)["hourly"]
    with pytest.raises(ValueError, match="whole-hour"):
        theil_sen_trend(h, datetime(2024, 1, 1), datetime(2024, 1, 1, 0, 30))
    with pytest.raises(ValueError, match="max_hours"):
        theil_sen_trend(
            h, datetime(2024, 1, 1), datetime(2025, 1, 1), max_hours=100
        )
    # single-bucket series excluded
    assert theil_sen_trend(
        h, datetime(2024, 1, 1), datetime(2024, 1, 2)
    ).count() == 0


def test_sliding_kmv_window_fold_equals_direct_build(spark):
    """M85: the RANGE-frame sketch fold is bit-identical to building the
    KMV directly over each window's raw — in the SAMPLE regime (k=4,
    saturated), where the claim is strongest."""
    from engine.kmv import kmv_state_col
    from engine.sliding import sliding_kmv_distinct

    rows = []
    eid = 0
    # 6 hours; hour h carries texts {w0..w(h+3)} -> distinct grows past k=4
    for h in range(6):
        for t in range(h + 4):
            rows.append(("c", eid, "user", f"w{t}", None,
                         datetime(2024, 1, 1, h, min(t, 59))))
            eid += 1
    t0 = rows_df(spark, rows)
    h4 = build_tiers(t0, kmv_cols={"text": 4})["hourly"]
    col = kmv_state_col("text", 4)
    out = {
        r["bucket_start"].hour: r
        for r in sliding_kmv_distinct(h4, col, 3).collect()
    }
    # direct build per window: bottom-4 xxhash64 of the window's texts
    texts = {h: {f"w{t}" for t in range(h + 4)} for h in range(6)}
    for h in range(6):
        wtexts = set().union(*(texts[g] for g in range(max(0, h - 2), h + 1)))
        direct = spark.createDataFrame(
            [(x,) for x in sorted(wtexts)], "text string"
        ).select(F.xxhash64("text").alias("hh")).orderBy("hh").limit(4)
        expect = [r["hh"] for r in direct.collect()]
        assert list(out[h]["w_sketch"]) == expect, h
        assert out[h]["saturated"] is True
        assert out[h]["w_distinct"] is None


def test_sliding_kmv_exact_regime_counts(spark):
    """Below saturation the window sketch IS the distinct set: counts are
    exact and gap-correct."""
    from engine.sliding import sliding_kmv_distinct

    rows = [
        ("c", 0, "user", "a", None, datetime(2024, 1, 1, 0, 0)),
        ("c", 1, "user", "b", None, datetime(2024, 1, 1, 1, 0)),
        ("c", 2, "user", "a", None, datetime(2024, 1, 1, 1, 30)),
        # 10h gap: the window after it sees only its own texts
        ("c", 3, "user", "c", None, datetime(2024, 1, 1, 11, 0)),
    ]
    h = build_tiers(rows_df(spark, rows), kmv_cols={"text": 256})["hourly"]
    out = {
        r["bucket_start"].hour: (r["w_distinct"], r["saturated"])
        for r in sliding_kmv_distinct(h, "text_kmv256", 3).collect()
    }
    assert out[0] == (1, False)
    assert out[1] == (2, False)   # {a, b}; the repeat of 'a' counts once
    assert out[11] == (1, False)  # pre-gap texts invisible
    import pytest as _pt
    with _pt.raises(ValueError, match="kmv"):
        sliding_kmv_distinct(h, "n_turns", 3)
    with _pt.raises(ValueError, match="window_hours"):
        sliding_kmv_distinct(h, "text_kmv256", 0)


def test_sliding_hh_exact_and_truncating_regimes(spark):
    """M86: exact trailing counts below cap; above cap the MG guarantees
    hold per window (underestimates only, bounded undercount) and the
    fold is deterministic across partitioning."""
    from engine.sliding import sliding_hh

    rows = []
    eid = 0
    # hour 0: a,a,a,b ; hour 1: b,c ; gap ; hour 5: d
    for sym, h in [("a", 0), ("a", 0), ("a", 0), ("b", 0),
                   ("b", 1), ("c", 1), ("d", 5)]:
        rows.append(("c", eid, sym, "x", None,
                     datetime(2024, 1, 1, h, eid % 60)))
        eid += 1
    t0 = rows_df(spark, rows)
    h32 = build_tiers(t0, hh_cols={"role": 32})["hourly"]
    out = {
        r["bucket_start"].hour: (dict(r["w_hh"]), r["w_total"])
        for r in sliding_hh(h32, "role", 32, 3).collect()
    }
    assert out[0] == ({"a": 3, "b": 1}, 4)
    assert out[1] == ({"a": 3, "b": 2, "c": 1}, 6)   # union of hours 0-1
    assert out[5] == ({"d": 1}, 1)                   # gap-correct

    # truncating regime: cap=2 over 3 distinct values in the window
    h2 = build_tiers(t0, hh_cols={"role": 2})["hourly"]
    r1 = sliding_hh(h2, "role", 2, 3)
    win1 = {r["bucket_start"].hour: dict(r["w_hh"]) for r in r1.collect()}
    truth = {0: {"a": 3, "b": 1}, 1: {"a": 3, "b": 2, "c": 1}, 5: {"d": 1}}
    for h, est in win1.items():
        t = truth[h]
        n = sum(t.values())
        assert len(est) <= 2
        d_bound = (n - sum(est.values())) / 3
        for v, c in t.items():
            e = est.get(v, 0)
            assert e <= c                      # underestimates only
            assert c - e <= d_bound + 1e-9     # bounded undercount
    # determinism across a different partitioning
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        win2 = {
            r["bucket_start"].hour: dict(r["w_hh"])
            for r in sliding_hh(
                build_tiers(t0.repartition(7), hh_cols={"role": 2})["hourly"],
                "role", 2, 3,
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert win1 == win2
    with pytest.raises(ValueError, match="hh state"):
        sliding_hh(h2, "role", 99, 3)


def test_streamed_pipeline_serves_identical_sliding(spark, tmp_path):
    """Streaming ingest × sliding serving: trailing-window merges, hist
    percentiles and KMV distinct counts served from STREAM-built tiers
    are bit-identical to a one-shot batch build — per-bucket state split
    across micro-batch triggers must re-merge exactly before any window
    fold sees it."""
    from engine.pipeline import TierPipeline
    from engine.sliding import (
        sliding_hist_percentile,
        sliding_kmv_distinct,
        sliding_state,
    )
    from engine.streaming import run_stream_into_pipeline

    t0 = synth_transcripts(spark, n_convs=8, hot_turns=240)
    src = str(tmp_path / "ssrc")
    t0.orderBy("ts").coalesce(1).write.parquet(src + "_one")
    spark.read.parquet(src + "_one").repartitionByRange(6, "ts").write.parquet(src)

    pipe = TierPipeline(
        spark, str(tmp_path / "ssp"),
        hist_cols={"token_count": (0.0, 4.0, 16)},
        kmv_cols={"text": 64},
        fill_tiers=False,
    )
    out = run_stream_into_pipeline(
        spark, src, pipe, raw_path=str(tmp_path / "sraw")
    )
    assert out["batches"] >= 2, out

    ref = build_tiers(
        t0, hist_cols={"token_count": (0.0, 4.0, 16)}, kmv_cols={"text": 64}
    )["hourly"]
    streamed = pipe.read_tier("hourly")

    def rows(df, cols):
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    scols = ["conv_id", "bucket_start", "w_n_turns", "w_token_sum",
             "w_token_min", "w_token_max"]
    assert rows(sliding_state(streamed, 24), scols) == rows(
        sliding_state(ref, 24), scols
    )
    pcols = ["conv_id", "bucket_start", "w_n", "p50_bin", "p95_bin"]
    assert rows(
        sliding_hist_percentile(streamed, "token_count_hist", 16, 24), pcols
    ) == rows(sliding_hist_percentile(ref, "token_count_hist", 16, 24), pcols)
    kcols = ["conv_id", "bucket_start", "w_distinct", "w_distinct_est"]
    assert rows(sliding_kmv_distinct(streamed, "text_kmv64", 24), kcols) == rows(
        sliding_kmv_distinct(ref, "text_kmv64", 24), kcols
    )


def test_sliding_corr_golden_and_plan(spark):
    """M90: a window where b = 3a + 1 gives corr exactly 1.0 and beta 3;
    constant-a windows are excluded by the integer variance predicate;
    ONE Window node / one exchange."""
    from engine.sliding import sliding_corr

    rows = []
    eid = 0
    # conv c hours 0-3: a (turns) = 1,2,3,4 ; b (tokens) = 3a+1 via text len
    for h, a in enumerate([1, 2, 3, 4]):
        lens = [1] * (a - 1) + [3 * a + 1 - (a - 1)]  # sum of lens = 3a+1
        for ln in lens:
            rows.append(("c", eid, "user", "x" * ln, None,
                         datetime(2024, 1, 1, h, eid % 60)))
            eid += 1
    # conv d: constant a=1, b=2 over 3 hours -> zero variance, excluded
    for h in range(3):
        rows.append(("d", eid, "user", "yy", None, datetime(2024, 1, 2, h)))
        eid += 1
    h = build_tiers(rows_df(spark, rows))["hourly"]
    out = sliding_corr(h, "n_turns", "token_sum", 24)
    got = {
        (r["conv_id"], r["bucket_start"].hour): (r["w_n"], r["corr"], r["beta"])
        for r in out.collect()
    }
    assert got[("c", 1)] == (2, 1.0, 3.0)
    # perfect linearity up to sqrt rounding (sqrt(da)*sqrt(db) vs sqrt(da*db))
    n4, c4, b4 = got[("c", 3)]
    assert (n4, b4) == (4, 3.0) and abs(c4 - 1.0) < 1e-15
    assert ("c", 0) not in got           # single-bucket window
    assert not any(k[0] == "d" for k in got)  # zero variance excluded
    with pytest.raises(ValueError, match="window_hours"):
        sliding_corr(h, "n_turns", "token_sum", 0)

    h.cache().count()
    plan = (
        sliding_corr(h, "n_turns", "token_sum", 24)
        ._jdf.queryExecution().executedPlan().toString()
    )
    op = plan.split("InMemoryTableScan")[0]
    assert op.count("Exchange hashpartitioning") == 1, plan
    assert op.count("+- Window") == 1, plan
