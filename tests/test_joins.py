"""asof_join vs pandas merge_asof (the semantics oracle) across directions
and exact-match policies, plus a plan assertion: one exchange, no range
(theta) join, no cartesian product."""

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.joins import asof_join  # noqa: E402


@pytest.fixture(scope="module")
def frames(spark):
    import random

    rng = random.Random(77)
    trades = []
    quotes = []
    for key in ("a", "b", "c"):
        # unique timestamps per key/side so last-tie order is well-defined
        tts = rng.sample(range(0, 20000), 300)
        qts = rng.sample(range(0, 20000), 400)
        trades += [(key, t, rng.randrange(1, 100)) for t in tts]
        quotes += [(key, t, round(rng.uniform(1, 2), 4)) for t in qts]
    tdf = pd.DataFrame(trades, columns=["sym", "ts", "qty"])
    qdf = pd.DataFrame(quotes, columns=["sym", "ts", "px"])
    return (
        spark.createDataFrame(tdf),
        spark.createDataFrame(qdf.rename(columns={"ts": "qts"})),
        tdf,
        qdf,
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("exact", [True, False])
def test_asof_matches_pandas(spark, frames, direction, exact):
    t, q, tdf, qdf = frames
    got = (
        asof_join(
            t, q, by=["sym"], left_on="ts", right_on="qts",
            direction=direction, allow_exact_matches=exact,
        )
        .toPandas()
        .sort_values(["sym", "ts", "qty"], ignore_index=True)
    )
    exp = (
        pd.merge_asof(
            tdf.sort_values("ts", kind="stable"),
            qdf.sort_values("ts", kind="stable"),
            on="ts",
            by="sym",
            direction=direction,
            allow_exact_matches=exact,
        )
        .sort_values(["sym", "ts", "qty"], ignore_index=True)
    )
    assert len(got) == len(exp) == len(tdf)
    pd.testing.assert_series_equal(got["px"], exp["px"], check_names=False)


def test_asof_no_match_is_null(spark, frames):
    t, q, *_ = frames
    # shift every quote after every trade: backward finds nothing
    q_late = q.withColumn("qts", F.col("qts") + F.lit(100000))
    out = asof_join(
        t, q_late, by=["sym"], left_on="ts", right_on="qts"
    ).toPandas()
    assert out["px"].isna().all()


def test_asof_plan_single_exchange_no_theta(spark, frames):
    t, q, *_ = frames
    df = asof_join(t, q, by=["sym"], left_on="ts", right_on="qts")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # union + one window: exactly one shuffle of the data on the key
    # (AQE prints the same node in initial+final plans — count unique ids)
    import re

    ids = set(
        re.findall(r"Exchange hashpartitioning.*?plan_id=(\d+)", plan)
    )
    assert len(ids) == 1, plan


def test_asof_value_column_collision_raises(spark, frames):
    t, q, *_ = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            t.withColumnRenamed("qty", "px"), q,
            by=["sym"], left_on="ts", right_on="qts",
        )


@pytest.fixture(scope="module")
def range_frames(spark):
    import datetime as dt
    import random

    rng = random.Random(5)
    base = dt.datetime(2024, 3, 1)
    pts, ivs = [], []
    for i in range(800):
        pts.append(
            ("k" + str(rng.randrange(3)), i,
             base + dt.timedelta(minutes=rng.randrange(0, 14 * 24 * 60)))
        )
    for j in range(200):
        s = base + dt.timedelta(minutes=rng.randrange(0, 14 * 24 * 60))
        e = s + dt.timedelta(minutes=rng.randrange(0, 12 * 60))
        ivs.append(("k" + str(rng.randrange(3)), j, s, e))
    p = spark.createDataFrame(pts, ["key", "pid", "ts"])
    iv = spark.createDataFrame(ivs, ["key", "iid", "ivs", "ive"])
    return p, iv


def test_point_interval_join_matches_bruteforce(spark, range_frames):
    from engine.joins import point_interval_join

    p, iv = range_frames
    got = (
        point_interval_join(p, iv, "ts", "ivs", "ive",
                            by=["key"], bucket="6 hours")
        .select("key", "pid", "iid")
        .toPandas()
        .sort_values(["key", "pid", "iid"], ignore_index=True)
    )
    brute = (
        p.join(iv, on="key")
        .filter((F.col("ts") >= F.col("ivs")) & (F.col("ts") < F.col("ive")))
        .select("key", "pid", "iid")
        .toPandas()
        .sort_values(["key", "pid", "iid"], ignore_index=True)
    )
    assert len(got) == len(brute) > 0
    assert got.equals(brute)


def test_point_interval_join_is_equi_join(spark, range_frames):
    from engine.joins import point_interval_join

    p, iv = range_frames
    df = point_interval_join(p, iv, "ts", "ivs", "ive",
                             by=["key"], bucket="6 hours")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_overlap_join_matches_bruteforce(spark, range_frames):
    import datetime as dt
    import random

    from engine.joins import interval_overlap_join

    rng = random.Random(9)
    base = dt.datetime(2024, 3, 1)
    ivs2 = []
    for j in range(150):
        s = base + dt.timedelta(minutes=rng.randrange(0, 14 * 24 * 60))
        e = s + dt.timedelta(minutes=rng.randrange(1, 36 * 60))
        ivs2.append(("k" + str(rng.randrange(3)), j, s, e))
    _, iv = range_frames
    iv2 = spark.createDataFrame(ivs2, ["key", "jid", "jvs", "jve"])
    got = (
        interval_overlap_join(
            iv, iv2, "ivs", "ive", "jvs", "jve",
            by=["key"], bucket="12 hours",
        )
        .select("key", "iid", "jid")
        .toPandas()
        .sort_values(["key", "iid", "jid"], ignore_index=True)
    )
    brute = (
        iv.join(iv2, on="key")
        .filter(
            (F.col("ivs") < F.col("jve")) & (F.col("jvs") < F.col("ive"))
        )
        .select("key", "iid", "jid")
        .toPandas()
        .sort_values(["key", "iid", "jid"], ignore_index=True)
    )
    assert len(got) == len(brute) > 0
    assert got.equals(brute)


@pytest.mark.parametrize("bucket", ["1 minute", "37 minutes", "1 day"])
def test_point_interval_join_bucket_width_invariant(spark, range_frames, bucket):
    """The result must not depend on the bucket width — boundary cases
    (interval ends on a bucket edge, point at exclusive end) included."""
    from engine.joins import point_interval_join

    p, iv = range_frames
    got = (
        point_interval_join(p, iv, "ts", "ivs", "ive", by=["key"], bucket=bucket)
        .select("key", "pid", "iid")
        .toPandas()
        .sort_values(["key", "pid", "iid"], ignore_index=True)
    )
    brute = (
        p.join(iv, on="key")
        .filter((F.col("ts") >= F.col("ivs")) & (F.col("ts") < F.col("ive")))
        .select("key", "pid", "iid")
        .toPandas()
        .sort_values(["key", "pid", "iid"], ignore_index=True)
    )
    assert got.equals(brute)


def test_point_interval_join_boundary_exact(spark):
    """Hand-picked edges: point exactly at start (included), exactly at end
    (excluded), interval spanning exactly one bucket edge, empty interval."""
    import datetime as dt

    from engine.joins import point_interval_join

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    h = dt.timedelta(hours=1)
    p = spark.createDataFrame(
        [("k", 1, t0), ("k", 2, t0 + h), ("k", 3, t0 + 2 * h)],
        ["key", "pid", "ts"],
    )
    iv = spark.createDataFrame(
        [
            ("k", 10, t0, t0 + h),          # [00:00, 01:00): pid 1 only
            ("k", 11, t0 + h, t0 + 3 * h),  # [01:00, 03:00): pids 2, 3
            ("k", 12, t0, t0),              # empty: nothing
        ],
        ["key", "iid", "ivs", "ive"],
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in point_interval_join(
            p, iv, "ts", "ivs", "ive", by=["key"], bucket="1 hour"
        ).collect()
    )
    assert got == [(1, 10), (2, 11), (3, 11)]


def test_interval_overlap_join_plan_and_zero_length(spark, range_frames):
    import datetime as dt

    from engine.joins import interval_overlap_join

    _, iv = range_frames
    # plan: equi join only, no nested loop / cartesian
    iv2 = iv.withColumnRenamed("iid", "jid").withColumnRenamed(
        "ivs", "jvs"
    ).withColumnRenamed("ive", "jve")
    df = interval_overlap_join(
        iv, iv2, "ivs", "ive", "jvs", "jve", by=["key"], bucket="12 hours"
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # zero-length intervals are the empty set: no match even when enclosed
    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    a = spark.createDataFrame([("k", 1, t0, t0 + 10 * h)],
                              ["key", "iid", "ivs", "ive"])
    b = spark.createDataFrame([("k", 2, t0 + 5 * h, t0 + 5 * h)],
                              ["key", "jid", "jvs", "jve"])
    assert interval_overlap_join(
        a, b, "ivs", "ive", "jvs", "jve", by=["key"], bucket="1 hour"
    ).count() == 0


# -- skew-safe salted as-of join ---------------------------------------------


@pytest.fixture(scope="module")
def zipf_frames(spark):
    """Zipf-hot events: one conversation carries ~80% of rows. Unique
    timestamps per (key, side) so match payloads are deterministic."""
    import random
    from datetime import datetime, timedelta

    rng = random.Random(41)
    base = datetime(2024, 3, 1)
    lrows, rrows = [], []
    keys = [("hot", 4000, 5000)] + [(f"cold{i}", 60, 80) for i in range(12)]
    for key, nl, nr in keys:
        # seconds over ~20 days; sample without replacement per side
        lts = rng.sample(range(0, 20 * 86400), nl)
        rts = rng.sample(range(0, 20 * 86400), nr)
        lrows += [(key, base + timedelta(seconds=s), s % 97) for s in lts]
        rrows += [
            (key, base + timedelta(seconds=s), round(s / 1000.0, 3))
            for s in rts
        ]
    ldf = pd.DataFrame(lrows, columns=["conv", "ts", "qty"])
    rdf = pd.DataFrame(rrows, columns=["conv", "rts", "px"])
    return spark.createDataFrame(ldf), spark.createDataFrame(rdf)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("exact", [True, False])
@pytest.mark.parametrize("slice_w", ["6 hours", "3 days"])
def test_asof_salted_matches_unsalted(spark, zipf_frames, direction, exact, slice_w):
    """Salted == unsalted bit-exact on a Zipf-hot table, across directions,
    exact policies and slice widths (including slices with no right rows,
    which exercise the cross-slice boundary carry)."""
    from engine.joins import asof_join_salted

    ldf, rdf = zipf_frames
    kw = dict(
        by=["conv"], left_on="ts", right_on="rts",
        direction=direction, allow_exact_matches=exact,
    )
    plain = (
        asof_join(ldf, rdf, **kw)
        .toPandas()
        .sort_values(["conv", "ts"], ignore_index=True)
    )
    salted = (
        asof_join_salted(ldf, rdf, slice=slice_w, **kw)
        .toPandas()
        .sort_values(["conv", "ts"], ignore_index=True)
    )
    assert len(salted) == len(plain)
    pd.testing.assert_frame_equal(salted, plain)


def test_asof_salted_plan_partitions_on_slice(spark, zipf_frames):
    """The big window must partition on (key, time slice) — the hot key's
    series spreads across slices instead of one reducer — and the only
    per-key-partitioned window runs over the slice-level summary (one row
    per slice), never the event rows."""
    from engine.joins import asof_join_salted

    ldf, rdf = zipf_frames
    df = asof_join_salted(
        ldf, rdf, by=["conv"], left_on="ts", right_on="rts", slice="6 hours"
    )
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(conv#" in p or "hashpartitioning(conv," in p, p
    # the event-level exchange carries the slice key
    assert "_asof_slice" in p, p
    # slice summary aggregates with partial+final combine (skew-free)
    assert "max_by" in p and p.count("HashAggregate") >= 2, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_gapfill_locf_salted_parity(spark):
    """gapfill_locf_salted is row-identical to the single-shuffle LOCF on a
    hot-conversation series (engine-level E5 parity under salting)."""
    from engine.gapfill import gapfill_locf, gapfill_locf_salted, hourly_series
    from engine.rollup import rollup_hourly
    from engine.synth import synth_transcripts

    t0 = synth_transcripts(spark, n_convs=25, hot_turns=900)
    series = hourly_series(rollup_hourly(t0))
    plain = (
        gapfill_locf(series)
        .toPandas()
        .sort_values(["conv_id", "metric", "bucket_start"], ignore_index=True)
    )
    salted = (
        gapfill_locf_salted(series, slice="3 days")
        .toPandas()
        .sort_values(["conv_id", "metric", "bucket_start"], ignore_index=True)
    )
    assert len(plain) > 0
    pd.testing.assert_frame_equal(salted[plain.columns], plain)


def test_asof_salted_property_random(spark):
    """Property sweep: salted == unsalted on randomized frames that stress
    the slice machinery — timestamps exactly ON slice boundaries, empty
    slices between observations, keys with no right rows at all, and both
    directions × exact policies. (hypothesis-style generation with a fixed
    seed; pandas merge_asof is the ground truth for the unsalted side,
    already covered above.)"""
    import random
    from datetime import datetime, timedelta

    from engine.joins import asof_join, asof_join_salted

    rng = random.Random(1234)
    base = datetime(2024, 5, 1)
    for round_i in range(4):
        lrows, rrows = [], []
        for key in ("a", "b", "c", "lonely"):
            n_l = rng.randrange(1, 40)
            n_r = 0 if key == "lonely" else rng.randrange(0, 30)
            # second-granularity offsets, biased toward exact hour marks
            # (slice boundaries for the "1 hour" slice below)
            def ts_offsets(n):
                out = set()
                while len(out) < n:
                    if rng.random() < 0.3:
                        out.add(rng.randrange(0, 96) * 3600)  # boundary
                    else:
                        out.add(rng.randrange(0, 96 * 3600))
                return sorted(out)

            lrows += [
                (key, base + timedelta(seconds=s), s) for s in ts_offsets(n_l)
            ]
            rrows += [
                (key, base + timedelta(seconds=s), float(s))
                for s in ts_offsets(n_r)
            ]
        ldf = spark.createDataFrame(
            pd.DataFrame(lrows, columns=["k", "ts", "payload"])
        )
        rdf = spark.createDataFrame(
            pd.DataFrame(rrows, columns=["k", "rts", "val"])
            if rrows
            else pd.DataFrame({"k": pd.Series(dtype="object"),
                               "rts": pd.Series(dtype="datetime64[us]"),
                               "val": pd.Series(dtype="float64")})
        )
        for direction in ("backward", "forward"):
            for exact in (True, False):
                kw = dict(by=["k"], left_on="ts", right_on="rts",
                          direction=direction, allow_exact_matches=exact)
                plain = (
                    asof_join(ldf, rdf, **kw)
                    .toPandas().sort_values(["k", "ts"], ignore_index=True)
                )
                salted = (
                    asof_join_salted(ldf, rdf, slice="1 hour", **kw)
                    .toPandas().sort_values(["k", "ts"], ignore_index=True)
                )
                pd.testing.assert_frame_equal(salted, plain), (
                    round_i, direction, exact
                )
