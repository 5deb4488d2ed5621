"""Driver-contract parity: entry() smoke + every queries() entry vs its
DuckDB oracle at sf0.001 (the driver repeats this at sf0.01)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_utils import assert_frames_match, duck_run  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.count()
    assert rows > 0
    assert "turn_rate_mean" in df.columns


def _query_names():
    return sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_vs_oracle(spark, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        assert spark_pdf.shape[0] >= 0  # rows-only check, mirrors driver
        return
    duck_pdf = duck_run(SF_DIR, sql)
    assert_frames_match(spark_pdf, duck_pdf, name)


def test_approx_percentiles_within_sketch_rank_bound(spark):
    """percentile_approx's guarantee is a RANK bound (error ≤ n/accuracy),
    not a value bound — assert the returned value's rank in the sorted group
    sits within that bound of p·n. (Value-relative checks are meaningless in
    sparse tails: nearest-rank vs interpolated can differ by a few % while
    the sketch is rank-perfect.)"""
    import numpy as np

    import engine.io as eio

    approx = (
        entrymod.queries()["approx_percentiles"](spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    events = eio.read_table(spark, SF_DIR, "events").toPandas()
    events["cents"] = (events["value"] * 100).round().astype("int64")
    for etype, grp in events.groupby("event_type"):
        vals = np.sort(grp["cents"].to_numpy())
        n = len(vals)
        eps = max(2.0, n / 10000)  # sketch accuracy=10000
        for col, p in (("p50", 0.5), ("p95", 0.95)):
            got = approx.loc[etype, col] * 100
            lo = np.searchsorted(vals, got, side="left")
            hi = np.searchsorted(vals, got, side="right")
            target = p * n
            assert lo - eps <= target <= hi + eps, (
                f"{etype}.{col}: rank [{lo},{hi}] vs target {target:.0f}"
            )


def test_approx_distinct_within_tolerance(spark):
    """Both sketch-distinct queries must sit within their published error
    bounds of the exact distinct (approx_count_distinct rsd default 5%;
    HLL lgConfigK=12 ≈ 1.6% rsd — assert 3σ-ish envelopes)."""
    import engine.io as eio
    from pyspark.sql import functions as F

    events = eio.read_table(spark, SF_DIR, "events")
    approx = (
        entrymod.queries()["approx_distinct_users"](spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
        .iloc[:, -1]
    )
    exact = (
        events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .toPandas()
        .set_index("event_type")["exact"]
    )
    rel = ((approx - exact).abs() / exact).max()
    assert rel < 0.15, f"approx_count_distinct rel err {rel}"
    hll = entrymod.queries()["hll_sketch_distinct"](spark, SF_DIR).toPandas()
    exact_total = events.select("user_id").distinct().count()
    est = float(hll["approx_users"].iloc[0])
    assert abs(est - exact_total) / exact_total < 0.05, (est, exact_total)
