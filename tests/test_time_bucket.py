"""Arbitrary-width origin-anchored buckets and timezone-local calendar
buckets (engine/bucket.py time_bucket / time_bucket_tz): integer-exact
floor on both sides of the origin, and DST-correct local days (23/24/25
UTC hours) matching Python's zoneinfo."""

import sys
from datetime import datetime, timedelta, timezone
from pathlib import Path
from zoneinfo import ZoneInfo

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.bucket import time_bucket, time_bucket_tz  # noqa: E402


def _df(spark, instants):
    return spark.createDataFrame(
        [(t,) for t in instants], "ts timestamp_ntz"
    )


def test_time_bucket_matches_integer_floor_both_sides_of_origin(spark):
    origin = datetime(2024, 6, 1, 0, 30)
    width_s = 90 * 60
    # instants straddling the origin, including exact edges and 1us-off
    instants = [
        origin + timedelta(seconds=s, microseconds=us)
        for s in (-200_000, -90 * 60, -1, 0, 1, 45 * 60, 90 * 60, 123_456)
        for us in (0, 1, 999_999)
    ]
    got = (
        _df(spark, instants)
        .select("ts", time_bucket("ts", width_s, "2024-06-01 00:30:00").alias("b"))
        .collect()
    )
    w_us = width_s * 1_000_000
    o_us = int(origin.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
    for r in got:
        t_us = int(r.ts.replace(tzinfo=timezone.utc).timestamp()) * 1_000_000 + r.ts.microsecond
        want_us = o_us + ((t_us - o_us) // w_us) * w_us  # Python // floors
        want = datetime.fromtimestamp(want_us / 1_000_000, tz=timezone.utc).replace(tzinfo=None)
        assert r.b == want, f"{r.ts}: {r.b} != {want}"
        assert r.b <= r.ts < r.b + timedelta(seconds=width_s)


def test_time_bucket_default_origin_is_monday(spark):
    # TimescaleDB/DuckDB anchor: 2000-01-03 is a Monday, so week-width
    # buckets start Mondays
    got = (
        _df(spark, [datetime(2024, 2, 15, 13, 7)])
        .select(time_bucket("ts", 7 * 86400).alias("b"))
        .first()
        .b
    )
    assert got.weekday() == 0 and got == datetime(2024, 2, 12)

    with pytest.raises(ValueError, match="positive"):
        time_bucket("ts", 0)


@pytest.mark.parametrize(
    "edge_utc, local_day_hours",
    [
        # US spring forward: 2024-03-10 has 23 wall-clock hours in NY
        (datetime(2024, 3, 10, 5), 23),
        # US fall back: 2024-11-03 has 25
        (datetime(2024, 11, 3, 5), 25),
    ],
)
def test_time_bucket_tz_dst_days(spark, edge_utc, local_day_hours):
    tz = ZoneInfo("America/New_York")
    start = edge_utc - timedelta(days=2)
    instants = [start + timedelta(hours=h) for h in range(24 * 4)]
    rows = (
        _df(spark, instants)
        .groupBy(time_bucket_tz("ts", "America/New_York").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = {r.d.date(): r.n for r in rows}
    want: dict = {}
    for t in instants:
        local = t.replace(tzinfo=timezone.utc).astimezone(tz).date()
        want[local] = want.get(local, 0) + 1
    assert got == want
    assert got[edge_utc.date()] == local_day_hours


def test_sql_functions_match_python_helpers(spark):
    """register_time_bucket_sql exposes the primitives to eng.sql / cagg
    DDL as pure-SQL scalar functions — results must equal the Python
    column helpers exactly, including the DEFAULT Monday origin."""
    from engine.bucket import register_time_bucket_sql

    register_time_bucket_sql(spark)
    register_time_bucket_sql(spark)  # idempotent
    instants = [
        datetime(2024, 3, 9, 12) + timedelta(hours=h, minutes=7) for h in range(60)
    ]
    df = _df(spark, instants)
    df.createOrReplaceTempView("tb_probe")
    got = spark.sql(
        "SELECT ts, time_bucket(ts, 5400, '2024-01-01 00:30:00') AS b,"
        " time_bucket(ts, 604800) AS wk,"
        " time_bucket_tz(ts, 'America/New_York') AS d"
        " FROM tb_probe"
    ).collect()
    want = {
        r.ts: r
        for r in df.select(
            "ts",
            time_bucket("ts", 5400, "2024-01-01 00:30:00").alias("b"),
            time_bucket("ts", 604800).alias("wk"),
            time_bucket_tz("ts", "America/New_York").alias("d"),
        ).collect()
    }
    assert len(got) == len(want)
    for r in got:
        w = want[r.ts]
        assert (r.b, r.wk, r.d) == (w.b, w.wk, w.d)
