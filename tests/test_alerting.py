"""M73–M75 (engine/alerting.py): hysteresis alert episodes, multi-window
SLO burn rate, and data-gap detection served from hourly tier state."""

import sys
from datetime import datetime
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.alerting import (  # noqa: E402
    burn_rate_alerts,
    data_gaps,
    hysteresis_alerts,
)
from engine.api import TierEngine  # noqa: E402
from engine.rollup import build_tiers  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402


def _hourly(spark, rows):
    """Minimal hourly-tier-shaped frame: (conv_id, hour offset, token_sum,
    n_turns). Buckets are 2024-03-01 00:00 + h hours, NTZ like the tier."""
    df = spark.createDataFrame(
        [(c, h, v, n) for (c, h, v, n) in rows],
        "conv_id string, h int, token_sum long, n_turns long",
    )
    return df.select(
        "conv_id",
        F.expr(
            "CAST(TIMESTAMP '2024-03-01 00:00:00' + make_interval(0,0,0,0,h) "
            "AS TIMESTAMP_NTZ)"
        ).alias("bucket_start"),
        "token_sum",
        "n_turns",
        (F.col("token_sum") % 3).alias("tool_sum"),
    )


GOLDEN = [
    ("c", 0, 12, 1),  # hold with no prior mark -> not in alert
    ("c", 1, 20, 1),  # enter (>= 18)
    ("c", 2, 12, 1),  # hold -> still in alert
    ("c", 5, 11, 1),  # hold ACROSS a 2h data gap -> still in alert
    ("c", 6, 9, 1),  # exit (<= 10)
    ("c", 7, 30, 1),  # enter
    ("c", 8, 19, 1),  # enter again -> same episode
    ("c", 9, 3, 1),  # exit
    ("c", 20, 25, 1),  # enter; series ends in alert
]


def test_hysteresis_golden_episodes(spark):
    h = _hourly(spark, GOLDEN)
    got = sorted(
        (
            r["conv_id"],
            r["alert_start"],
            r["alert_end"],
            r["n_buckets"],
            r["peak"],
        )
        for r in hysteresis_alerts(h, hi=18, lo=10).collect()
    )
    b = lambda k: datetime(2024, 3, 1, k)  # noqa: E731
    assert got == [
        ("c", b(1), b(5), 3, 20),  # held through the band AND the gap
        ("c", b(7), b(8), 2, 30),
        ("c", b(20), b(20), 1, 25),  # open episode at series end
    ]


def test_hysteresis_for_duration_gate(spark):
    """min_len is the Prometheus `for:` gate — short episodes don't fire."""
    h = _hourly(spark, GOLDEN)
    got = sorted(
        (r["alert_start"], r["n_buckets"])
        for r in hysteresis_alerts(h, hi=18, lo=10, min_len=2).collect()
    )
    assert got == [
        (datetime(2024, 3, 1, 1), 3),
        (datetime(2024, 3, 1, 7), 2),
    ]


def test_hysteresis_excludes_filled_rows(spark):
    """Gap-filled tier rows carry copied state and must not feed alerts."""
    h = _hourly(spark, GOLDEN).withColumn("filled", F.lit(False))
    spike = _hourly(spark, [("c", 3, 99, 1)]).withColumn(
        "filled", F.lit(True)
    )
    both = h.unionByName(spike)
    assert sorted(
        (r["alert_start"], r["peak"])
        for r in hysteresis_alerts(both, hi=18, lo=10).collect()
    ) == sorted(
        (r["alert_start"], r["peak"])
        for r in hysteresis_alerts(h, hi=18, lo=10).collect()
    )


def test_hysteresis_validation(spark):
    h = _hourly(spark, GOLDEN)
    with pytest.raises(ValueError):
        hysteresis_alerts(h, hi=10, lo=10)
    with pytest.raises(ValueError):
        hysteresis_alerts(h, hi=18, lo=10, min_len=0)


def test_burn_rate_brute_force_parity(spark):
    """Every output row's window sums, burn floats, and fired flag equal a
    per-series brute-force recount over the hourly rows."""
    t0 = synth_transcripts(spark, n_convs=12, hot_turns=200)
    hourly = build_tiers(t0)["hourly"]
    slo, mult, short_h, long_h = 300_000, 1, 3, 8
    got = burn_rate_alerts(
        hourly, short_h, long_h, slo, mult=mult, bad_col="tool_sum"
    ).collect()
    assert got, "no burn-rate output"
    rows = hourly.select(
        "conv_id", "bucket_start", "tool_sum", "n_turns"
    ).collect()
    by_conv = {}
    for r in rows:
        hidx = int(r["bucket_start"].timestamp() // 3600)
        by_conv.setdefault(r["conv_id"], {})[hidx] = (
            r["tool_sum"],
            r["n_turns"],
        )
    fired_seen = 0
    for r in got:
        hidx = int(r["bucket_start"].timestamp() // 3600)
        series = by_conv[r["conv_id"]]

        def wsum(width):
            sel = [
                series[k]
                for k in series
                if hidx - width + 1 <= k <= hidx
            ]
            return sum(x for x, _ in sel), sum(y for _, y in sel)

        bad_s, tot_s = wsum(short_h)
        bad_l, tot_l = wsum(long_h)
        assert (r["bad_s"], r["tot_s"], r["bad_l"], r["tot_l"]) == (
            bad_s,
            tot_s,
            bad_l,
            tot_l,
        ), (r["conv_id"], r["bucket_start"])
        assert r["burn_short"] == (bad_s * 1_000_000) / (tot_s * slo)
        assert r["burn_long"] == (bad_l * 1_000_000) / (tot_l * slo)
        want_fired = (
            bad_s * 1_000_000 > tot_s * slo * mult
            and bad_l * 1_000_000 > tot_l * slo * mult
        )
        assert r["fired"] == want_fired
        fired_seen += int(want_fired)
    assert 0 < fired_seen < len(got), "thresholds must split the output"


def test_burn_rate_validation(spark):
    h = _hourly(spark, GOLDEN)
    with pytest.raises(ValueError):
        burn_rate_alerts(h, 6, 6, 100_000)
    with pytest.raises(ValueError):
        burn_rate_alerts(h, 1, 6, 0)


def test_data_gaps_golden(spark):
    h = _hourly(
        spark, [("c", 0, 5, 1), ("c", 1, 5, 1), ("c", 5, 5, 1), ("c", 30, 5, 1)]
    )
    got = sorted(
        (r["gap_start"], r["gap_end"], r["gap_hours"])
        for r in data_gaps(h, min_gap_hours=3).collect()
    )
    assert got == [
        (datetime(2024, 3, 1, 2), datetime(2024, 3, 1, 4), 3),
        (datetime(2024, 3, 1, 6), datetime(2024, 3, 2, 5), 24),
    ]
    only_big = data_gaps(h, min_gap_hours=4).collect()
    assert [(r["gap_hours"]) for r in only_big] == [24]
    # leading/trailing absence is not a gap: a one-row series emits nothing
    assert data_gaps(_hourly(spark, [("d", 3, 5, 1)]), 1).count() == 0


def test_facade_front_door(spark, tmp_path):
    """TierEngine.serve_alerts/serve_burn_rate/serve_gaps read the
    pipeline-published hourly tier (densified: filled rows present) and
    match direct calls on its observed rows."""
    eng = TierEngine(spark, str(tmp_path / "alroot"))
    t0 = synth_transcripts(spark, n_convs=8, hot_turns=150)
    eng.run(t0)
    hourly = eng.pipeline.read_tier("hourly")
    assert hourly.filter("filled").count() > 0, "want filled rows in play"

    def key(df):
        return sorted(map(tuple, df.collect()))

    assert key(eng.serve_alerts(hi=40, lo=10)) == key(
        hysteresis_alerts(hourly, hi=40, lo=10)
    )
    assert key(eng.serve_burn_rate(3, 8, 300_000)) == key(
        burn_rate_alerts(hourly, 3, 8, 300_000)
    )
    assert key(eng.serve_gaps(2)) == key(data_gaps(hourly, 2))
    assert eng.serve_alerts(hi=40, lo=10).count() > 0


def test_streamed_pipeline_serves_identical_alerts(spark, tmp_path):
    """Streaming ingest × alerting: alert episodes, burn rates, and data
    gaps served from stream-built tiers are bit-identical to a one-shot
    batch build — an hour split across micro-batch triggers must re-merge
    its state before the alert recurrence sees it."""
    from engine.pipeline import TierPipeline
    from engine.streaming import run_stream_into_pipeline

    t0 = synth_transcripts(spark, n_convs=10, hot_turns=300)
    src = str(tmp_path / "src")
    t0.orderBy("ts").coalesce(1).write.parquet(src + "_one")
    spark.read.parquet(src + "_one").repartitionByRange(8, "ts").write.parquet(
        src
    )

    pipe = TierPipeline(spark, str(tmp_path / "sp"), fill_tiers=False)
    out = run_stream_into_pipeline(
        spark, src, pipe, raw_path=str(tmp_path / "raw")
    )
    assert out["batches"] >= 2, out

    streamed = pipe.read_tier("hourly")
    ref = build_tiers(t0)["hourly"]

    def rows(df):
        return sorted(map(tuple, df.collect()))

    assert rows(hysteresis_alerts(streamed, hi=40, lo=10)) == rows(
        hysteresis_alerts(ref, hi=40, lo=10)
    )
    assert rows(burn_rate_alerts(streamed, 3, 8, 300_000)) == rows(
        burn_rate_alerts(ref, 3, 8, 300_000)
    )
    assert rows(data_gaps(streamed, 2)) == rows(data_gaps(ref, 2))
    assert hysteresis_alerts(ref, hi=40, lo=10).count() > 0


def test_wilson_rate_rank_golden_and_uncertainty(spark):
    """M87: the bound matches the closed form; a 1-of-1 conv ranks BELOW
    a 90-of-1000 conv despite the higher raw ratio; freq_cols required."""
    import math
    from datetime import datetime

    from engine.alerting import wilson_rate_rank
    from engine.io import transcripts_from_events
    from engine.rollup import build_tiers

    rows = []
    eid = 0
    # conv 1: 1 error of 1 turn (rate 1.0); conv 2: 90 errors of 1000
    rows.append((1, "error"))
    rows += [(2, "error")] * 300 + [(2, "view")] * 700
    ev = spark.createDataFrame(
        [(i, datetime(2024, 1, 2 + (i % 20), i // 60 % 24, i % 60), u, et,
          0.0, "{}")
         for i, (u, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    tiers = build_tiers(transcripts_from_events(ev), freq_cols=["role"])
    out = wilson_rate_rank(
        tiers["daily"], "role", "error",
        datetime(2024, 1, 1), datetime(2024, 2, 1),
    ).collect()

    def wilson(x, n, z=1.96):
        p = x / n
        return (p + z * z / (2 * n)
                - z * math.sqrt((p * (1 - p) + z * z / (4 * n)) / n)) \
            / (1 + z * z / n)

    by = {r.conv_id[-1]: r for r in out}
    assert by["1"].rate == 1.0 and by["2"].rate == 0.3
    assert by["1"].wilson_low == pytest.approx(wilson(1, 1), rel=1e-12)
    assert by["2"].wilson_low == pytest.approx(wilson(300, 1000), rel=1e-12)
    # uncertainty flips the raw-ratio order
    assert by["2"].wilson_low > by["1"].wilson_low
    assert out[0].conv_id == by["2"].conv_id
    with pytest.raises(ValueError, match="freq_cols"):
        plain = build_tiers(transcripts_from_events(ev))
        wilson_rate_rank(
            plain["daily"], "role", "error",
            datetime(2024, 1, 1), datetime(2024, 2, 1),
        )
